package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, ShardStore}

/** Scale rehearsal for the versioned training-shard store: the full
  * lifecycle — atomic write, schema-adding rewrite, CDC diff between
  * versions, evolved read of the old version, manifest validation,
  * vacuum — at a row count where per-shard behavior matches what a
  * production store sees per bucket. Timings comparable WITHIN one run
  * only (shared box — README "Timing noise").
  * Run: sbt "runMain graft.examples.StoreScaleDemo [nDocs]". */
object StoreScaleDemo {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .appName("store-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("store-scale")
      .resolve("corpus").toString
    val docs = CorpusScaleDemo.synthDocs(spark, nDocs)
      .select(col("doc_id"), col("text")).localCheckpoint()

    ScaleDemo.time(s"writeShardsAtomic v1 (${nDocs / 1000}k rows, 64 shards)") {
      ShardStore.writeShardsAtomic(docs, "doc_id", numShards = 64, root)
    }
    // v2: drop 1%, rewrite 1%, add a quality column (schema evolution)
    val v2 = docs.filter(pmod(col("doc_id"), lit(100L)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(100L)) === 1, lit("rewritten")).otherwise(col("text")))
      .withColumn("quality", pmod(col("doc_id"), lit(7L)).cast("double"))
    ScaleDemo.time("writeShardsAtomic v2 (1% dropped, 1% rewritten, +quality)") {
      ShardStore.writeShardsAtomic(v2, "doc_id", numShards = 64, root)
    }
    ScaleDemo.time("diffVersions v1→v2 (CDC read)") {
      println(s"  changed rows: ${ShardStore.diffVersions(spark, root, 1L, 2L).count()}")
    }
    ScaleDemo.time("readShardsAtEvolved v1 (aligned to v2 schema)") {
      val ev = ShardStore.readShardsAtEvolved(spark, root, 1L)
      println(s"  rows: ${ev.count()}, cols: ${ev.columns.mkString(",")}")
    }
    ScaleDemo.time("validateShardsLatest (manifest audit)") {
      val bad = ShardStore.validateShardsLatest(spark, root)
        .filter(!col("ok")).count()
      println(s"  corrupt shards: $bad")
    }
    ScaleDemo.time("vacuum keep 1") {
      println(s"  removed: ${AtomicCommit.vacuum(spark, root, keepVersions = 1).size} paths")
    }
    spark.stop()
  }
}
