package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage beyond parquet+VCF (SURVEY §2.4 scan row):
  * csv and json round-trips through the standard readers. */
class SourcesSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("csv round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("src-csv").resolve("docs").toString
    docs.select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() === docs.count())
    val a = back.agg(sum("n_chars")).head().getLong(0)
    val b = docs.agg(sum("n_chars")).head().getLong(0)
    assert(a === b)
  }

  test("json round-trip preserves nested text content") {
    val dir = java.nio.file.Files.createTempDirectory("src-json").resolve("docs").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === docs.count())
    val origFirst = docs.orderBy("doc_id").select("text").head().getString(0)
    val backFirst = back.orderBy("doc_id").select("text").head().getString(0)
    assert(origFirst === backFirst)
  }

  test("chrom-partitioned store prunes partitions on chrom predicates") {
    val out = java.nio.file.Files.createTempDirectory("prune").resolve("store").toString
    graft.core.VariantSchema.save(GoldenFixture.df(spark), GoldenFixture.meta, out)
    val pruned = spark.read.parquet(out).filter(col("chrom") === "chr2")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("chr2"), plan.take(800))
    assert(pruned.count() === 3)
  }
}
