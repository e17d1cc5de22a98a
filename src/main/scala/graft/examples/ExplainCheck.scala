package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_lateral", "q_pivot", "q_join_outer", "q_window_ntile")) {
      println(s"=== $q ===")
      val p = Queries.byName(q).build(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString()
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Cartesian") || l.contains("Window")).mkString("\n"))
    }
    spark.stop()
  }
}
