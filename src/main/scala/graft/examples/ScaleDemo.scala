package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Stats, VariantPipeline}

/** Scale rehearsal for the genetics kernels: generates a deterministic
  * synthetic variant store (default 200k variants × 50 samples ≈ 20M
  * genotype calls — the per-partition workload shape a 1000-executor
  * cluster would see per task at 100 TB) entirely ON EXECUTORS (no driver
  * collect), then times the stat kernels and the fused filter pipeline.
  * Run: sbt "runMain graft.examples.ScaleDemo [nVariants] [nSamples]". */
object ScaleDemo {

  /** Synthetic VariantSchema rows from spark.range — deterministic
    * arithmetic per (variant, sample), no RNG state, fully distributed. */
  def synthVariants(spark: SparkSession, nVariants: Long, nSamples: Int): DataFrame = {
    // rename the range column: aliasing a select item "id" while later
    // items reference col("id") trips Spark 4 lateral-column-alias
    // resolution into reading the NEW string column
    val i = col("_i")
    spark.range(nVariants).select(col("id").as("_i")).select(
      concat(lit("chr"), (i % 22 + 1).cast("string")).as("chrom"),
      (i * 37 % 248000000L).as("pos"),
      concat(lit("v"), i).as("id"),
      lit("A").as("ref"),
      when(i % 7 === 0, array(lit("T"), lit("G"))).otherwise(array(lit("T"))).as("alt"),
      (i % 100).cast("double").as("qual"),
      // gt: deterministic mix of hom-ref / het / hom-alt / missing
      transform(sequence(lit(0), lit(nSamples - 1)), s => {
        val h = pmod(i * 31 + s * 17, lit(100))
        when(h < 5, array(lit(-1), lit(-1)))                 // 5% missing
          .when(h < 55, array(lit(0), lit(0)))               // 50% hom-ref
          .when(h < 85, array(lit(0), lit(1)))               // 30% het
          .otherwise(array(lit(1), lit(1)))                  // 15% hom-alt
      }).as("gt"),
      transform(sequence(lit(0), lit(nSamples - 1)),
        s => pmod(i * 13 + s * 7, lit(60)).cast("int")).as("dp"),
      transform(sequence(lit(0), lit(nSamples - 1)),
        s => pmod(i * 11 + s * 3, lit(99)).cast("double")).as("gq"),
      lit(null).cast("array<array<int>>").as("ao"),
      lit(null).cast("array<int>").as("ro"))
  }

  def time[T](what: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"SCALE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val nVariants = args.headOption.map(_.toLong).getOrElse(200000L)
    val nSamples = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = java.nio.file.Files.createTempDirectory("v6scale").resolve("store").toString
    time(s"write ${nVariants}x$nSamples") {
      synthVariants(spark, nVariants, nSamples)
        .repartition(8)
        .write.mode("overwrite").parquet(store)
    }
    // Wide-cohort reader sizing: default 4096-row vectorized batches fail
    // outright at ≥10k samples (contiguous child-vector reservation) —
    // see VariantSchema.wideReaderBatchSize.
    val batch = graft.core.VariantSchema.wideReaderBatchSize(nSamples)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", batch.toString)
    println(s"SCALE   columnarReaderBatchSize=$batch for width $nSamples")
    val df = spark.read.parquet(store)

    time("variantStats (all kernels)") {
      Stats.variantStats(df).write.format("noop").mode("overwrite").save()
    }
    time("variantCallStatsLong") {
      Stats.variantCallStatsLong(df).write.format("noop").mode("overwrite").save()
    }
    time("pipeline mask+2 filters") {
      val r = VariantPipeline(df).maskByDepth(5).byCallRate(0.8).byMaf(max = 0.95).run()
      r.variations.write.format("noop").mode("overwrite").save()
      println(s"SCALE   stats: ${r.stats.map { case (n, s) => s"$n=${s.nKept}" }.mkString(" ")}")
    }
    time("sampleDepthStats (long view)") {
      Stats.sampleDepthStats(df).write.format("noop").mode("overwrite").save()
    }
    time("sampleDepthStatsFast (UDAF)") {
      Stats.sampleDepthStatsFast(df).write.format("noop").mode("overwrite").save()
    }
    // skewed aggregation: 22 chrom keys, chr1 ~4.5% hot at uniform — make
    // it hot by keying on a constant-heavy derivation
    time("salted agg over skewed key") {
      val skewed = df.select(
        when(col("pos") % 10 < 9, lit("hot")).otherwise(col("chrom")).as("key"),
        col("qual").as("v"))
      val out = graft.operators.Skew.saltedAgg(skewed, Seq("key"), "v", salt = 16)
      val direct = skewed.groupBy("key").agg(count(lit(1)).as("cnt"))
      val a = out.select("key", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b, s"salted != direct")
      println(s"SCALE   hot key rows: ${a.getOrElse("hot", 0L)}")
    }
    spark.stop()
  }
}
