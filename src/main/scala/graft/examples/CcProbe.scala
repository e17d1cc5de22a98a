package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Round-count probe for [[Dedup.transitiveClusters]] on permuted-id
  * paths — measures the empirical rounds-vs-diameter law that the
  * 1M-diameter CcScaleDemo run falsified the old O(log d) claim with.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("cc-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val P = 1000000007L
    def v(c: org.apache.spark.sql.Column) = (c * 2654435761L) % P
    for (d <- Seq(1000L, 4000L, 16000L, 64000L)) {
      val edges = spark.range(d - 1)
        .select(v(col("id")).as("a"), v(col("id") + 1).as("b")).localCheckpoint()
      var rounds = -1
      val t0 = System.nanoTime()
      val n = Dedup.transitiveClusters(edges, "a", "b", maxIter = 500,
        onConverge = rounds = _)
        .agg(countDistinct("comp")).head().getLong(0)
      println(f"CC-PROBE d=$d%7d rounds=$rounds%4d comps=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      require(n == 1L)
    }
    spark.stop()
  }
}
