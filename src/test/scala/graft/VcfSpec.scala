package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.VariantSchema
import graft.operators.Stats
import graft.sources.Vcf

/** VCF ingestion against the FIXTURES.md §B fixture VCF (tab-separated). */
class VcfSpec extends SparkTestBase {

  private val vcfText = Seq(
    "##fileformat=VCFv4.3",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1\ts2\ts3",
    "chr1\t100\tv1\tA\tT\t50\tPASS\t.\tGT:DP:GQ:RO:AO\t0/0:10:99:8:2\t0/1:3:20:2:1\t1/1:8:45:1:7\t0/0:20:99:15:5",
    "chr1\t200\tv2\tC\tG\t40\tPASS\t.\tGT:DP:GQ\t0/0:12:80\t./.:0:0\t0/0:9:60\t0/0:11:70",
    "chr1\t300\tv3\tG\tA,T\t60\tPASS\t.\tGT:DP:GQ\t0/1:7:50\t1/2:14:90\t2/2:6:40\t./.:1:5",
    "chr2\t50\tv4\tT\tC\t90\tPASS\t.\tGT:DP:GQ\t0/1:30:99\t0/1:25:99\t0/1:18:99\t0/1:22:99",
    "chr2\t150\tv5\tA\tC\t5\tPASS\t.\tGT:DP:GQ\t./.:0:0\t./.:0:0\t./.:0:0\t./.:0:0",
    "chr2\t250\tv6\tA\tG\t70\tPASS\t.\tGT:DP:GQ\t1/1:15:95\t1/1:16:96\t1/1:14:94\t0/1:9:33"
  ).mkString("\n")

  private lazy val vcfPath: String = {
    val dir = Files.createTempDirectory("v6vcf")
    val p = dir.resolve("fixture.vcf")
    Files.writeString(p, vcfText)
    p.toString
  }

  test("header sample list") {
    assert(Vcf.readSamples(spark, vcfPath) === Seq("s0", "s1", "s2", "s3"))
  }

  test("parse: schema, sentinels, multi-allelic, per-row FORMAT") {
    val (df, meta) = Vcf.read(spark, vcfPath)
    assert(meta.samples === Seq("s0", "s1", "s2", "s3"))
    assert(meta.ploidy === 2)
    assert(df.count() === 6)

    val v1 = df.filter(col("id") === "v1").head()
    assert(v1.getAs[Seq[Seq[Int]]]("gt") === Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(0, 0)))
    assert(v1.getAs[Seq[Int]]("dp") === Seq(10, 3, 8, 20))
    assert(v1.getAs[Seq[Int]]("ro") === Seq(8, 2, 1, 15))
    assert(v1.getAs[Seq[Seq[Int]]]("ao") === Seq(Seq(2), Seq(1), Seq(7), Seq(5)))

    val v2 = df.filter(col("id") === "v2").head()
    assert(v2.getAs[Seq[Seq[Int]]]("gt")(1) === Seq(-1, -1)) // ./. → sentinel
    assert(v2.isNullAt(v2.fieldIndex("ao"))) // AO absent from FORMAT → null

    val v3 = df.filter(col("id") === "v3").head()
    assert(v3.getAs[Seq[String]]("alt") === Seq("A", "T"))
    assert(v3.getAs[Seq[Seq[Int]]]("gt")(1) === Seq(1, 2))
  }

  test("parsed VCF reproduces the golden kernel values") {
    val (df, _) = Vcf.read(spark, vcfPath)
    val s = Stats.variantStats(df)
    val rate = GoldenFixture.byId[Double](s, "call_rate")
    assertNear(rate("v2"), 0.75); assertNear(rate("v5"), 0.0)
    val maf = GoldenFixture.byId[Double](s, "maf")
    assertNear(maf("v1"), 0.625); assertNear(maf("v6"), 0.875)
  }

  test("vcf → chrom-partitioned parquet → load round-trip with metadata") {
    val out = Files.createTempDirectory("v6pq").resolve("store").toString
    val meta = Vcf.toParquet(spark, vcfPath, out)
    val (df, meta2) = VariantSchema.load(spark, out)
    assert(meta2 === meta)
    assert(df.count() === 6)
    // chrom partition pruning works (region access path)
    val pruned = df.filter(col("chrom") === "chr2" && col("pos") <= 150)
    assert(pruned.select("id").collect().map(_.getString(0)).toSet === Set("v4", "v5"))
    // partition layout on disk = chrom directories
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("chrom="))
    assert(dirs.toSet === Set("chrom=chr1", "chrom=chr2"))
  }

  test("atomic variant store: versioned cohorts, crash debris invisible, time travel") {
    import graft.sources.AtomicCommit
    val root = Files.createTempDirectory("v6atomic").resolve("store").toString
    val (df, meta) = Vcf.read(spark, vcfPath)
    val v1 = VariantSchema.saveAtomic(df, meta, root)
    assert(v1 === 1L)
    val (l1, m1) = VariantSchema.loadLatest(spark, root)
    assert(l1.count() === 6 && m1 === meta)
    // crash debris: a writer died before committing v=2
    df.limit(1).write.parquet(AtomicCommit.versionDir(root, 2L) + "/chrom=chr1")
    assert(VariantSchema.loadLatest(spark, root)._1.count() === 6)
    // the next real write (a filtered reanalysis cohort) claims v=2
    val v2 = VariantSchema.saveAtomic(df.filter(col("chrom") === "chr1"), meta, root)
    assert(v2 === 2L)
    assert(VariantSchema.loadLatest(spark, root)._1.count() ===
      df.filter(col("chrom") === "chr1").count())
    // reproducibility: the original cohort stays loadable as of v=1
    val (at1, mAt1) = VariantSchema.loadAt(spark, root, 1L)
    assert(at1.count() === 6 && mAt1 === meta)
    // chrom pruning still works through the versioned path
    val pruned = at1.filter(col("chrom") === "chr2" && col("pos") <= 150)
    assert(pruned.select("id").collect().map(_.getString(0)).toSet === Set("v4", "v5"))
    intercept[IllegalArgumentException](VariantSchema.loadAt(spark, root, 7L))
  }

  test("malformed lines are dropped, not fatal (both readers)") {
    val dir = Files.createTempDirectory("v6bad")
    val p = dir.resolve("bad.vcf")
    Files.writeString(p, vcfText + "\ngarbage line without tabs\nchrX\tnotanumber\tv9\tA\tT\t1\tP\t.\tGT\t0/0\n")
    val (df, _) = Vcf.read(spark, p.toString)
    assert(df.count() === 6) // the 2 bad lines vanish, good ones survive
    val v2 = spark.read.format("vcf").load(p.toString)
    assert(v2.count() === 6)
  }

  test("field-level garbage degrades the field, truncated lines drop — never the job (ANSI)") {
    val dir = Files.createTempDirectory("v6field")
    val p = dir.resolve("field.vcf")
    // line 1: QUAL 'LOW', GT token '0/x', DP 'NA' — parses with
    // null/missing sentinels; line 2: truncated to 2 of 4 samples —
    // ragged arrays would mis-index every kernel, so it drops whole
    Files.writeString(p, vcfText +
      "\nchr3\t10\tvq\tA\tT\tLOW\tPASS\t.\tGT:DP:GQ\t0/x:NA:7\t0/0:5:8\t0/1:6:9\t1/1:7:9" +
      "\nchr3\t20\tvt\tA\tT\t5\tPASS\t.\tGT:DP:GQ\t0/0:1:2\t0/1:3:4\n")
    val (df, _) = Vcf.read(spark, p.toString)
    assert(df.count() === 7)
    val r = df.filter(col("id") === "vq").head()
    assert(r.isNullAt(r.fieldIndex("qual")))                 // LOW → null
    assert(r.getSeq[scala.collection.Seq[Int]](r.fieldIndex("gt"))(0).toSeq
      === Seq(0, -1))                                        // 0/x → allele missing
    assert(r.getSeq[Int](r.fieldIndex("dp"))(0) === -1)      // NA → sentinel
    assert(df.filter(col("id") === "vt").count() === 0)      // truncated dropped
  }

  test("ploidy probe: a missing first call does not stamp a diploid cohort haploid") {
    val dir = Files.createTempDirectory("v6ploidy")
    val p = dir.resolve("p.vcf")
    // the FIRST sample of the FIRST row is a bare '.' (one sentinel
    // allele) — the old first-cell probe read ploidy 1
    Files.writeString(p, Seq(
      "##fileformat=VCFv4.3",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1",
      "chr1\t5\tv1\tA\tT\t9\tPASS\t.\tGT\t.\t0/1",
      "chr1\t6\tv2\tA\tT\t9\tPASS\t.\tGT\t0/0\t1/1").mkString("\n"))
    val (_, meta) = Vcf.read(spark, p.toString)
    assert(meta.ploidy === 2)
  }

  test("streaming VCF ingest: files arriving across batches land in the store") {
    val watchDir = Files.createTempDirectory("vcfstream")
    val outDir = Files.createTempDirectory("vcfstream-out")
    val lines = vcfText.linesIterator.toSeq
    val (header, body) = lines.partition(_.startsWith("#"))
    Files.writeString(watchDir.resolve("chunk1.vcf"), (header ++ body.take(3)).mkString("\n"))

    val stream = graft.sources.Vcf.readStream(spark, watchDir.toString, nSamples = 4)
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir.resolve("store").toString)
      .option("checkpointLocation", outDir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    // second file arrives; a new AvailableNow pass picks up only the delta
    Files.writeString(watchDir.resolve("chunk2.vcf"), (header ++ body.drop(3)).mkString("\n"))
    val q2 = stream.writeStream
      .format("parquet")
      .option("path", outDir.resolve("store").toString)
      .option("checkpointLocation", outDir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)

    val stored = spark.read.parquet(outDir.resolve("store").toString)
    assert(stored.count() === 6)
    val maf = GoldenFixture.byId[Double](graft.operators.Stats.variantStats(stored), "maf")
    assertNear(maf("v1"), 0.625); assertNear(maf("v6"), 0.875)
  }

  test("phased / haploid / half-called genotypes parse in both readers") {
    val dir = Files.createTempDirectory("v6phased")
    val text = Seq(
      "##fileformat=VCFv4.3",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1\ts2",
      // phased (|), mixed phased/unphased, haploid call, half-call (./1)
      "chr1\t10\tp1\tA\tT\t50\tPASS\t.\tGT:DP\t0|1:10\t1|1:12\t0/1:9",
      "chr1\t20\tp2\tC\tG\t40\tPASS\t.\tGT:DP\t1:7\t0:8\t.:0",
      "chr1\t30\tp3\tG\tA\t60\tPASS\t.\tGT:DP\t./1:5\t0|0:6\t1/.:4"
    ).mkString("\n")
    Files.writeString(dir.resolve("phased.vcf"), text)

    val (df, _) = Vcf.read(spark, dir.resolve("phased.vcf").toString)
    val v2 = spark.read.format("vcf").load(dir.resolve("phased.vcf").toString)
    for ((d, which) <- Seq((df, "expr"), (v2, "dsv2"))) {
      val byId = d.collect().map(r => r.getAs[String]("id") -> r.getAs[Seq[Seq[Int]]]("gt")).toMap
      assert(byId("p1") === Seq(Seq(0, 1), Seq(1, 1), Seq(0, 1)), which)
      assert(byId("p2") === Seq(Seq(1), Seq(0), Seq(-1)), which)
      assert(byId("p3") === Seq(Seq(-1, 1), Seq(0, 0), Seq(1, -1)), which)
    }
  }

  test("vcf export round-trips back through the parser") {
    val (df, meta) = Vcf.read(spark, vcfPath)
    val out = Files.createTempDirectory("v6out").resolve("export").toString
    Vcf.write(df, meta, out)
    val (df2, meta2) = Vcf.read(spark, out + "/part-*")
    assert(meta2.samples === meta.samples)
    assert(df2.count() === 6)
    val s = Stats.variantStats(df2)
    assertNear(GoldenFixture.byId[Double](s, "maf")("v1"), 0.625)
    assertNear(GoldenFixture.byId[Double](s, "obs_het")("v4"), 1.0)
  }
}
