package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{VariantSchema, VariantsMetadata}

/** VCF ingestion/export re-expressed Spark-first
  * (reference: `variation6/in_out/vcf.py::read_vcf` → chunked parse →
  * dask arrays → zarr).
  *
  * Read path: `spark.read.text` (splittable, .gz transparently decoded)
  * + pure Catalyst expressions — the parse is map-only, shuffle-free, and
  * whole-stage-codegen'd; at cluster scale it parallelizes at file-split
  * granularity with zero driver involvement beyond one header-line read.
  * FORMAT is parsed per row (fields may differ across rows); missing
  * values follow the reference sentinels: GT `.` → -1, DP missing → -1,
  * GQ missing → NaN, absent AO/RO → null columns.
  *
  * `toParquet` persists partitioned by chrom (VariantSchema.save), after
  * which region queries hit partition + row-group pruning instead of a
  * full parse — the zarr-store analog.
  */
object Vcf {

  /** Driver-side: the sample list from the #CHROM header line. */
  def readSamples(spark: SparkSession, path: String): Seq[String] = {
    val header = spark.read.text(path)
      .filter(col("value").startsWith("#CHROM"))
      .head().getString(0)
    header.split("\t").drop(9).toSeq
  }

  /** Expression-only parse of a `value: string` lines DataFrame into
    * VariantSchema — shared by the batch reader AND the streaming ingest
    * (the transformations are stateless, so the identical plan runs
    * under readStream). */
  def parseLines(linesDf: DataFrame, nSamples: Int): DataFrame = {
    val n = nSamples
    val fields = split(col("value"), "\t")
    def f(i: Int): Column = element_at(fields, i)
    val fmt = split(f(9), ":")
    // 1-based position of a FORMAT key; null-safe lookup via 0-based `get`
    def fmtIdx(key: String): Column = array_position(fmt, key).cast("int")
    def sampleField(s: Column, idx: Column): Column =
      when(idx === 0, lit(null).cast("string")).otherwise(get(split(s, ":"), idx - 1))

    val gtIdx = fmtIdx("GT")
    val dpIdx = fmtIdx("DP")
    val gqIdx = fmtIdx("GQ")
    val aoIdx = fmtIdx("AO")
    val roIdx = fmtIdx("RO")

    val sampleStrs = slice(fields, 10, n)

    // GT token semantics: each [/|]-separated allele maps to its int code,
    // "." (and "") to -1 — so a bare "." is ONE missing allele ([-1]),
    // consistent with haploid neighbors in the same row (ploidy is not
    // knowable from the token alone). Only a FORMAT with no GT at all
    // falls back to the diploid missing default [-1,-1].
    val gtCol = transform(sampleStrs, s => {
      val g = sampleField(s, gtIdx)
      when(g.isNull, array(lit(-1), lit(-1)))
        .otherwise(transform(
          split(g, "[/|]"),
          a => when(a === "." || a === "", lit(-1))
            .otherwise(coalesce(a.try_cast("int"), lit(-1)))))
    })
    val dpCol = transform(sampleStrs, s => {
      val d = sampleField(s, dpIdx)
      when(d.isNull || d === ".", lit(-1))
        .otherwise(coalesce(d.try_cast("int"), lit(-1)))
    })
    val gqCol = transform(sampleStrs, s => {
      val q = sampleField(s, gqIdx)
      when(q.isNull || q === ".", lit(Double.NaN))
        .otherwise(coalesce(q.try_cast("double"), lit(Double.NaN)))
    })
    val aoCol = when(aoIdx === 0, lit(null).cast(ArrayType(ArrayType(IntegerType))))
      .otherwise(transform(sampleStrs, s => {
        val a = sampleField(s, aoIdx)
        when(a.isNull || a === ".", lit(null).cast(ArrayType(IntegerType)))
          .otherwise(transform(split(a, ","), x => coalesce(x.try_cast("int"), lit(-1))))
      }))
    val roCol = when(roIdx === 0, lit(null).cast(ArrayType(IntegerType)))
      .otherwise(transform(sampleStrs, s => {
        val r = sampleField(s, roIdx)
        when(r.isNull || r === ".", lit(-1))
          .otherwise(coalesce(r.try_cast("int"), lit(-1)))
      }))

    linesDf
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      // malformed-line tolerance (PERMISSIVE-style drop): a data line
      // must carry the FULL 9 + nSamples tab-separated fields (a
      // truncated line would yield ragged per-call arrays that
      // mis-index every kernel) with an integer POS; per-field casts
      // are try_cast so garbage in QUAL/GT/DP/GQ degrades that FIELD
      // (null/missing sentinel), never the job — under ANSI mode a
      // plain cast would kill the whole ingest
      .filter(size(split(col("value"), "\t")) >= 9 + n &&
        col("value").rlike("^[^\t]+\t[0-9]+\t"))
      .select(
        f(1).as("chrom"),
        f(2).try_cast("long").as("pos"),
        when(f(3) === ".", lit(null).cast("string")).otherwise(f(3)).as("id"),
        f(4).as("ref"),
        when(f(5) === ".", array().cast(ArrayType(StringType)))
          .otherwise(split(f(5), ",")).as("alt"),
        when(f(6) === ".", lit(null).cast("double"))
          .otherwise(f(6).try_cast("double")).as("qual"),
        gtCol.as("gt"), dpCol.as("dp"), gqCol.as("gq"), aoCol.as("ao"), roCol.as("ro"))
      // a POS too large for long (try_cast null) is a malformed line
      .filter(col("pos").isNotNull)
  }

  def read(spark: SparkSession, path: String): (DataFrame, VariantsMetadata) = {
    val samples = readSamples(spark, path)
    val df = parseLines(spark.read.text(path), samples.size)
    // probe MAX ploidy across the samples of the first rows — the
    // first cell alone reads 1 for a bare '.' missing call (one
    // sentinel allele) and would stamp a diploid cohort haploid
    val ploidy =
      df.limit(100)
        .select(max(array_max(transform(col("gt"), g => size(g)))).as("_p"))
        .collect().headOption.filterNot(_.isNullAt(0)).map(_.getInt(0)).getOrElse(2)
    (df, VariantsMetadata(samples, ploidy))
  }

  /** Streaming VCF ingest: watch a directory for new VCF files and parse
    * them with the SAME expression plan as the batch reader. Samples
    * must be known upfront (a growing cohort is a schema change, not a
    * stream). Typical sink: `.writeStream.partitionBy("chrom")
    * .format("parquet")` — a continuously-appending variant store. */
  def readStream(spark: SparkSession, dir: String, nSamples: Int): DataFrame =
    parseLines(spark.readStream.text(dir), nSamples)

  /** VCF → chrom-partitioned parquet + metadata sidecar, one shuffle-free
    * job (the reference's read_vcf → prepare_zarr_storage → compute). */
  def toParquet(spark: SparkSession, vcfPath: String, outPath: String): VariantsMetadata = {
    val (df, meta) = read(spark, vcfPath)
    VariantSchema.save(df, meta, outPath)
    meta
  }

  /** Export VariantSchema rows back to VCF text (FORMAT GT:DP:GQ).
    * `coalesce(1)` only orders within the single output file — callers
    * writing at scale should instead write per-chrom files. */
  def write(df: DataFrame, meta: VariantsMetadata, path: String): Unit = {
    val gtStr = transform(col("gt"), g =>
      array_join(transform(g, a => when(a === -1, lit(".")).otherwise(a.cast("string"))), "/"))
    val callStr = transform(
      sequence(lit(1), lit(meta.nSamples)),
      i => concat_ws(":",
        coalesce(element_at(gtStr, i), lit(".")),
        coalesce(when(element_at(col("dp"), i) === -1, lit("."))
          .otherwise(element_at(col("dp"), i).cast("string")), lit(".")),
        coalesce(when(isnan(element_at(col("gq"), i)), lit("."))
          .otherwise(element_at(col("gq"), i).cast("string")), lit("."))))
    // every field coalesces to '.': concat_ws SKIPS nulls, so one
    // null ref/alt/gt cell would shift every later column and emit a
    // silently corrupt VCF line
    val line = concat_ws("\t",
      col("chrom"), col("pos").cast("string"), coalesce(col("id"), lit(".")),
      coalesce(col("ref"), lit(".")),
      coalesce(
        when(size(col("alt")) === 0, lit(".")).otherwise(array_join(col("alt"), ",")),
        lit(".")),
      coalesce(col("qual").cast("string"), lit(".")), lit("."), lit("."),
      lit("GT:DP:GQ"), array_join(callStr, "\t"))

    val spark = df.sparkSession
    import spark.implicits._
    val header = Seq(
      (0, "", 1L, "##fileformat=VCFv4.3"),
      (0, "", 2L, "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + meta.samples.mkString("\t")))
      .toDF("ord", "chrom", "pos", "value")
    val body = df.select(lit(1).as("ord"), col("chrom"), col("pos"), line.as("value"))
    header.union(body)
      .coalesce(1).sortWithinPartitions(col("ord"), col("chrom"), col("pos"))
      .select("value").write.mode("overwrite").text(path)
  }
}
