package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** One-off matrix probe for MIGRATION-DAY's fixture: candidate volume
  * of a 1.2k shared-vocab batch vs a 2k shared-vocab store, across
  * band geometries and vocabulary sizes — picks the (vocab, geometry)
  * pair where the occupancy rule FIRES at (8,4) and SETTLES after the
  * rebuild. Kept as the reproduction script for the numbers pinned in
  * OpsMonthDemo. */
object SvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (vocab <- Seq(200L, 400L, 800L)) {
      def svText(contentId: org.apache.spark.sql.Column) =
        array_join(transform(
          sequence(lit(0), pmod(xxhash64(contentId), lit(20L)).cast("int") + 14),
          w => concat(lit("sv"), pmod(xxhash64(contentId, w), lit(vocab)))), " ")
      val sv1 = spark.range(0L, 2000L)
        .select(col("id").as("doc_id"), svText(col("id")).as("text"))
      val sv2 = spark.range(2000L, 3200L)
        .select(col("id").as("doc_id"), svText(col("id")).as("text"))
      for ((k, b) <- Seq((8, 4), (16, 4), (16, 8), (32, 4))) {
        val store = DocPipeline.signatures(sv1, minhashK = k, bands = b,
          maxShingles = 64).localCheckpoint()
        val a = DocPipeline.adviseGeometryMigration(sv2, store,
          minWords = 5, minhashK = k, bands = b, tau = 0.8)
        println(f"SV-PROBE vocab=$vocab%4d k=$k%2d bands=$b%2d " +
          f"candidates=${a.candidates}%,10d perDoc=${a.candidatesPerDoc}%10.2f " +
          f"migrate=${a.migrate}")
      }
    }
    spark.stop()
  }
}
