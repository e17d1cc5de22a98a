package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profileColumns: counts, nulls, exact distincts in one pass") {
    val df = Seq(
      (Some(1), "a"), (Some(1), "b"), (Some(2), "b"), (None, "c"))
      .toDF("x", "y")
    val p = Profile.profileColumns(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p("x") === ((4L, 1L, 2L))) // null excluded from distinct
    assert(p("y") === ((4L, 0L, 3L)))
  }

  test("iqrBounds: exact interpolated quartiles and Tukey fences") {
    // values 1,2,3,4,100: q1 = 2 (pos .25*4 = 1), q3 = 4, IQR = 2
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val b = Profile.iqrBounds(df, "v").head()
    assert(b.getAs[Double]("q1") === 2.0)
    assert(b.getAs[Double]("q3") === 4.0)
    assert(b.getAs[Double]("lo") === -1.0)
    assert(b.getAs[Double]("hi") === 7.0)
  }

  test("filterOutliers drops fence violations; winsorize clamps them") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val kept = Profile.filterOutliers(df, "v").as[Double].collect().sorted
    assert(kept === Array(1.0, 2.0, 3.0, 4.0))
    val w = Profile.winsorize(df, "v").select(col("winsorized"))
      .as[Double].collect().sorted
    assert(w === Array(1.0, 2.0, 3.0, 4.0, 7.0)) // 100 clamped to hi
  }

  test("filterOutliers drops null values (no evidence of inlier-ness)") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    assert(Profile.filterOutliers(df, "v").count() === 3)
  }

  test("linearFit: exact line recovered; constant-x group is null") {
    val line = (1 to 5).map(i => ("a", i.toDouble, 2.0 * i + 1.0))
    val flat = Seq(("b", 3.0, 1.0), ("b", 3.0, 2.0)) // zero x-variance
    val df = (line ++ flat).toDF("g", "x", "y")
    val r = Profile.linearFit(df, "g", "x", "y")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("n") === 5L)
    assertNear(r("a").getAs[Double]("slope"), 2.0)
    assertNear(r("a").getAs[Double]("intercept"), 1.0)
    assertNear(r("a").getAs[Double]("r2"), 1.0)
    assert(r("b").isNullAt(2) && r("b").isNullAt(3) && r("b").isNullAt(4))
  }

  test("linearFit: negative slope, imperfect fit bounded by r2 < 1") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 8.0), ("a", 3.0, 7.0))
      .toDF("g", "x", "y")
    val r = Profile.linearFit(df, "g", "x", "y").head()
    assertNear(r.getAs[Double]("slope"), -1.5)
    assert(r.getAs[Double]("r2") < 1.0 && r.getAs[Double]("r2") > 0.9)
  }

  test("winsorize: nulls pass through; user lo/hi columns survive; small-magnitude fits stay exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(Some(1.0), Some(2.0), Some(100.0), None)
      .toDF("v").withColumn("lo", lit("user")).withColumn("hi", lit("keep"))
    val w = Profile.winsorize(d, "v").collect()
    // a null observation must NOT become the lower fence
    assert(w.count(_.isNullAt(0)) === 1)
    // the user's own lo/hi columns are untouched (collision-free fences)
    assert(w.forall(r => r.getString(1) == "user" && r.getString(2) == "keep"))
    val f = Profile.filterOutliers(d.na.drop(Seq("v")), "v")
    assert(f.columns.contains("lo") && f.columns.contains("hi"))
    // small-magnitude regression: products quantized at scale-4 used to
    // zero out Sxy entirely for rates ~1e-2 (slope garbage); operand
    // pinning keeps the full 2*scale product precision
    val rates = (1 to 50).map(i => ("g", i * 0.001, i * 0.002)).toDF("g", "x", "y")
    val fit = Profile.linearFit(rates, "g", "x", "y").head()
    assert(math.abs(fit.getAs[Double]("slope") - 2.0) < 1e-9,
      s"slope=${fit.getAs[Double]("slope")}")
  }
}
