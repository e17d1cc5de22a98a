package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skew + bucketing: correctness of the salted two-phase ops, and the
  * plan-level proof that bucketed tables co-locate joins (no shuffle). */
class ScaleOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def skewed = {
    // key "hot" holds 90% of rows
    (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("key", "v")
  }

  test("salted aggregation ≡ direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sum"), min($"v").as("min"), max($"v").as("max"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("key"), "v", salt = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted === direct)
  }

  test("salted join ≡ direct join") {
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("key", "label")
    val direct = skewed.join(dim, "key").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "key", salt = 8).groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in plan") {
    val a = (1L to 5000L).map(i => (i % 97, s"a$i")).toDF("key", "av")
    val b = (1L to 3000L).map(i => (i % 97, s"b$i")).toDF("key", "bv")
    a.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bk_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "key")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      // and it still computes the right thing
      val n = joined.count()
      val expected = a.join(b, "key").count()
      assert(n === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
