package graft
import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: SparkEntry.entry must return
  * rows > 0 on sf0.001. Run: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(3)
    println(s"SMOKE entry rows=$n queries=${SparkEntry.queries.size} oracle=${SparkEntry.oracleSql.size}")
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
