package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.VariantSchema
import graft.operators.{Stats, VariantPipeline}
import graft.sources.Vcf

/** End-to-end demo of the genetics surface — the reference's canonical
  * pipeline (SURVEY.md §3.1) on this engine:
  * VCF → chrom-partitioned parquet → mask → filters (fused stats) → report.
  * Run: sbt "runMain graft.examples.GeneticsDemo [vcfPath]". */
object GeneticsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vcf = args.headOption.getOrElse {
      val p = Files.createTempDirectory("demo").resolve("demo.vcf")
      Files.writeString(p, Seq(
        "##fileformat=VCFv4.3",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1\ts2\ts3",
        "chr1\t100\tv1\tA\tT\t50\tPASS\t.\tGT:DP:GQ:RO:AO\t0/0:10:99:8:2\t0/1:3:20:2:1\t1/1:8:45:1:7\t0/0:20:99:15:5",
        "chr1\t200\tv2\tC\tG\t40\tPASS\t.\tGT:DP:GQ\t0/0:12:80\t./.:0:0\t0/0:9:60\t0/0:11:70",
        "chr1\t300\tv3\tG\tA,T\t60\tPASS\t.\tGT:DP:GQ\t0/1:7:50\t1/2:14:90\t2/2:6:40\t./.:1:5",
        "chr2\t50\tv4\tT\tC\t90\tPASS\t.\tGT:DP:GQ\t0/1:30:99\t0/1:25:99\t0/1:18:99\t0/1:22:99",
        "chr2\t150\tv5\tA\tC\t5\tPASS\t.\tGT:DP:GQ\t./.:0:0\t./.:0:0\t./.:0:0\t./.:0:0",
        "chr2\t250\tv6\tA\tG\t70\tPASS\t.\tGT:DP:GQ\t1/1:15:95\t1/1:16:96\t1/1:14:94\t0/1:9:33"
      ).mkString("\n"))
      p.toString
    }

    val store = Files.createTempDirectory("demo").resolve("store").toString
    val meta = Vcf.toParquet(spark, vcf, store)
    println(s"ingested: samples=${meta.samples.mkString(",")} ploidy=${meta.ploidy}")

    val (df, _) = VariantSchema.load(spark, store)
    println("\nper-variant stats:")
    Stats.variantStats(df).orderBy("chrom", "pos")
      .select("id", "call_rate", "maf", "mac", "obs_het", "exp_het")
      .show(false)

    val result = VariantPipeline(df)
      .maskByDepth(5)
      .byCallRate(0.8)
      .byMaf(max = 0.7)
      .run()
    println(s"pipeline on n=${result.nInput}:")
    result.stats.foreach { case (name, s) =>
      println(s"  $name: kept=${s.nKept} filtered_out=${s.nFilteredOut}")
    }
    println("survivors: " + result.variations.select("id").collect().map(_.getString(0)).mkString(","))

    println("\nper-sample depth stats:")
    Stats.sampleDepthStats(df).show(false)

    // DataSourceV2 path: format("vcf") with chrom/pos pushdown
    val v2 = spark.read.format("vcf").load(vcf)
      .filter(col("chrom") === "chr2" && col("pos") <= 150)
    println(s"format(\"vcf\") pushdown chr2/<=150: " +
      v2.select("id").collect().map(_.getString(0)).mkString(","))

    // population structure: GRM (one-pass gramian) + PCA + Nei/Tajima
    println("\nkinship (VanRaden GRM, upper triangle):")
    graft.operators.Kinship.grm(df, "gt").show(false)
    val (eig, proj) = graft.operators.Kinship.pca(df, "gt", k = 2)
    println(s"PCA eigenvalues: ${eig.map(v => f"$v%.3f").mkString(", ")}")
    proj.show(false)
    println(s"Tajima's D (complete sites): " +
      graft.operators.Stats.tajimaD(df, "gt").map(d => f"$d%.4f").getOrElse("undefined"))
    spark.stop()
  }
}
