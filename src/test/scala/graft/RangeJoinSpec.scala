package graft

import org.apache.spark.sql.functions._
import graft.operators.{Filters, RangeJoin}
import scala.util.Random

/** Bucketed interval join ≡ naive θ-join on random data, incl. intervals
  * spanning many bins and bin-boundary positions. */
class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def randomData(seed: Int) = {
    val rnd = new Random(seed)
    val points = (1 to 500).map { i =>
      (s"chr${1 + rnd.nextInt(3)}", rnd.nextInt(10000).toLong, s"p$i")
    }.toDF("chrom", "pos", "pid")
    val intervals = (1 to 60).map { i =>
      val s = rnd.nextInt(9000).toLong
      (s"chr${1 + rnd.nextInt(3)}", s, s + 1 + rnd.nextInt(3000), s"iv$i")
    }.toDF("chrom", "start", "end", "ivid")
    (points, intervals)
  }

  test("bucketed point-in-interval ≡ naive theta join (several bin sizes)") {
    for (seed <- 1 to 3; binSize <- Seq(128L, 1000L, 100000L)) {
      val (points, intervals) = randomData(seed)
      val naive = points.join(intervals, Seq("chrom"))
        .filter($"pos" > $"start" && $"pos" <= $"end")
        .select("pid", "ivid").collect().map(r => (r.getString(0), r.getString(1))).toSet
      val bucketed = RangeJoin.pointInInterval(points, intervals, binSize = binSize)
        .select("pid", "ivid").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(bucketed === naive, s"seed=$seed bin=$binSize")
    }
  }

  test("filterInRegions ≡ literal-predicate inRegions on the golden fixture") {
    val fixture = GoldenFixture.df(spark)
    val regions = Seq(("chr1", 150L, 400L), ("chr2", 0L, 60L)).toDF("chrom", "start", "end")
    val viaJoin = RangeJoin.filterInRegions(fixture, regions, binSize = 100L)
      .select("id").collect().map(_.getString(0)).toSet
    val viaPred = Filters(fixture,
      Filters.inRegions(Seq(("chr1", 150L, 400L), ("chr2", 0L, 60L)))).kept
      .select("id").collect().map(_.getString(0)).toSet
    assert(viaJoin === viaPred)
    assert(viaJoin === Set("v2", "v3", "v4"))
  }

  test("interval spanning many bins matches each contained point exactly once") {
    val points = Seq(("chr1", 500L, "a"), ("chr1", 1500L, "b"), ("chr1", 2500L, "c")).toDF("chrom", "pos", "pid")
    val intervals = Seq(("chr1", 0L, 3000L, "big")).toDF("chrom", "start", "end", "ivid")
    val out = RangeJoin.pointInInterval(points, intervals, binSize = 100L).collect()
    assert(out.length === 3) // no duplicate matches despite 30 bin copies
  }
}
