package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** DataSourceV2 VCF reader: format("vcf"), gzip, filter pushdown. */
class VcfV2Spec extends SparkTestBase {

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

  private lazy val dir = {
    val d = Files.createTempDirectory("vcfv2")
    Files.writeString(d.resolve("fixture.vcf"), vcfText)
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(d.resolve("fixture2.vcf.gz")))
    gz.write(vcfText.getBytes("UTF-8")); gz.close()
    d
  }

  test("format(vcf): full parse matches the expression-based reader") {
    val v2 = spark.read.format("vcf").load(dir.resolve("fixture.vcf").toString)
    assert(v2.count() === 6)
    val stats = Stats.variantStats(v2)
    val maf = GoldenFixture.byId[Double](stats, "maf")
    assertNear(maf("v1"), 0.625); assertNear(maf("v6"), 0.875)
    val v1 = v2.filter(col("id") === "v1").head()
    assert(v1.getAs[Seq[Seq[Int]]]("gt") === Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(0, 0)))
    assert(v1.getAs[Seq[Int]]("ro") === Seq(8, 2, 1, 15))
    val v2row = v2.filter(col("id") === "v2").head()
    assert(v2row.isNullAt(v2row.fieldIndex("ao")))
  }

  test("gzip file + directory load: one partition per file") {
    val both = spark.read.format("vcf").load(dir.toString)
    assert(both.count() === 12) // both files
    assert(both.rdd.getNumPartitions === 2)
  }

  test("chrom/pos filters are pushed to the source and correct") {
    val df = spark.read.format("vcf").load(dir.resolve("fixture.vcf").toString)
      .filter(col("chrom") === "chr2" && col("pos") <= 150)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("pushed=") && plan.contains("chrom"), plan.take(600))
    assert(df.select("id").collect().map(_.getString(0)).toSet === Set("v4", "v5"))
  }

  test("PERMISSIVE covers the file: a zero-byte .vcf.gz reads as empty, not a fatal EOF") {
    val d = Files.createTempDirectory("vcfv2-empty")
    Files.writeString(d.resolve("good.vcf"), vcfText)
    Files.write(d.resolve("broken.vcf.gz"), Array.emptyByteArray)
    // the truncated drop contributes zero rows; the good file still reads
    val out = spark.read.format("vcf").load(d.toString)
    assert(out.count() === 6)
  }

  test("multi-path load fails with a clear message, not a null-Path error") {
    val e = intercept[Exception] {
      spark.read.format("vcf")
        .load(dir.resolve("fixture.vcf").toString,
          dir.resolve("fixture2.vcf.gz").toString)
        .count()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).contains("ONE path"), msgs(e))
  }
}
