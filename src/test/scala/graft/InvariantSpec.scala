package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, TextHash}
import graft.functions.GenotypeKernels

/** Randomized-input invariants for the round-6 operators — one seeded
  * generation, one Spark job per property, all cases verified
  * driver-side (the GtStatsPropertySpec pattern: bulk-generate, assert
  * in Scala). */
class InvariantSpec extends SparkTestBase {

  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("chunkDocs rebuild invariant: drop-overlap stitching restores every doc (120 random cases)") {
    val cases = (0 until 120).map { i =>
      val n = 1 + rnd.nextInt(150)
      (i.toLong, (1 to n).map(t => s"x${rnd.nextInt(50)}").mkString(" "))
    }
    val df = cases.toDF("doc_id", "text")
    for ((maxT, ov) <- Seq((16, 0), (16, 5), (40, 8), (7, 6))) {
      val chunks = Corpus.chunkDocs(df, "doc_id", "text", maxT, ov)
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      cases.foreach { case (id, text) =>
        val want = text.split(" ").toSeq
        val got = chunks(id).zipWithIndex.flatMap { case ((_, _, c, nt), k) =>
          val ts = c.split(" ").toSeq
          assert(nt === ts.length, s"doc $id chunk $k n_tok")
          assert(ts.length <= maxT, s"doc $id chunk $k overflows maxTokens")
          if (k == 0) ts else ts.drop(ov)
        }
        assert(got === want, s"doc $id not rebuilt at ($maxT, $ov)")
      }
    }
  }

  test("containment bounds: jaccard <= min(c_ab, c_ba) <= 1; equality on identical sets") {
    val pairs = (0 until 60).map { i =>
      val a = (0 until 5 + rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
      val b = if (i % 10 == 0) a else (0 until 5 + rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
      (i.toLong, a, b)
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"),
        TextHash.containment(col("a"), col("b")).as("cab"),
        TextHash.containment(col("b"), col("a")).as("cba"),
        TextHash.jaccard(col("a"), col("b")).as("jac"))
      .as[(Long, Double, Double, Double)].collect()
    got.foreach { case (id, cab, cba, jac) =>
      assert(cab >= 0 && cab <= 1 && cba >= 0 && cba <= 1, s"pair $id out of bounds")
      assert(jac <= math.min(cab, cba) + 1e-12, s"pair $id: jaccard exceeds containment")
    }
    pairs.filter(p => p._2 == p._3).foreach { case (id, _, _) =>
      val (_, cab, cba, jac) = got.find(_._1 == id).get
      assert(cab === 1.0 && cba === 1.0 && jac === 1.0, s"identical pair $id")
    }
  }

  test("HWE chi2 >= 0 when defined; F in (-inf, 1]; both NaN exactly for degenerate variants") {
    val gts = (0 until 80).map { i =>
      val n = 2 + rnd.nextInt(12)
      (i.toLong, (0 until n).map { _ =>
        if (rnd.nextInt(10) == 0) Seq(-1, -1)
        else Seq(rnd.nextInt(2), rnd.nextInt(2))
      })
    }
    val got = gts.toDF("id", "gt")
      .select(col("id"),
        GenotypeKernels.hweChi2FromClasses(
          GenotypeKernels.genotypeClassCounts(col("gt"))).as("chi2"),
        GenotypeKernels.inbreedingF(col("gt"), lit(2)).as("f"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, chi2, f) =>
      assert(chi2.isNaN || chi2 >= 0, s"variant $id chi2 negative")
      assert(f.isNaN || f <= 1.0 + 1e-12, s"variant $id F > 1")
    }
    assert(got.exists(r => !r._2.isNaN), "no defined chi2 in 80 random variants")
  }

  test("LD r² in [0,1] when defined; self-consistent under input shuffling") {
    val variants = (0 until 60).map { i =>
      (i.toLong, (0 until 10).map { _ =>
        if (rnd.nextInt(8) == 0) Seq(-1, -1)
        else Seq(rnd.nextInt(2), rnd.nextInt(2))
      })
    }
    val df = variants.toDF("pos", "gt")
    val pairs = graft.operators.Stats.ldPairs(df, "gt", "pos", 4L)
      .select(col("pos_a"), col("pos_b"), col("r2"))
      .as[(Long, Long, Option[Double])].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, r2) =>
      assert(b > a && b - a <= 4, s"pair ($a,$b) outside the window")
      r2.foreach(v => assert(v >= -1e-12 && v <= 1.0 + 1e-12, s"pair ($a,$b) r2=$v"))
    }
    val shuffled = graft.operators.Stats
      .ldPairs(df.orderBy(rand(7)), "gt", "pos", 4L)
      .select(col("pos_a"), col("pos_b"), col("r2"))
      .as[(Long, Long, Option[Double])].collect()
    assert(shuffled.sortBy(p => (p._1, p._2)).toSeq ===
      pairs.sortBy(p => (p._1, p._2)).toSeq, "pair set depends on input order")
  }

  test("Hudson F_ST per-variant estimate is ≤ 1 and den ≥ 0 when defined") {
    val variants = (0 until 80).map { i =>
      (i.toLong, (0 until 12).map { _ =>
        if (rnd.nextInt(8) == 0) Seq(-1, -1)
        else Seq(rnd.nextInt(2), rnd.nextInt(2))
      })
    }
    val got = graft.operators.Stats
      .fstHudson(variants.toDF("vid", "gt"), "gt", 0 until 6, 6 until 12)
      .select(col("vid"), col("fst_den"), col("fst"))
      .as[(Long, Option[Double], Option[Double])].collect()
    got.foreach { case (id, den, fst) =>
      den.foreach(v => assert(v >= -1e-12, s"variant $id den=$v negative"))
      // Hudson fst can be negative (finite-sample), but never exceeds 1
      fst.foreach(v => assert(v <= 1.0 + 1e-12, s"variant $id fst=$v > 1"))
    }
    assert(got.exists(_._3.isDefined), "no defined fst in 80 random variants")
  }

  test("funnel monotonicity: reached counts never increase across stages (random events)") {
    val events = (0 until 400).map { _ =>
      (rnd.nextInt(25).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
        Seq("a", "b", "c")(rnd.nextInt(3)))
    }
    val df = events.toDF("user_id", "ts", "event_type")
    for (gap <- Seq(None, Some(3600L))) {
      val times = graft.operators.Funnel
        .funnelTimes(df, "user_id", "ts", "event_type", Seq("a", "b", "c"), gap)
        .select(col("t1"), col("t2"), col("t3"), col("reached")).collect()
      times.foreach { r =>
        // null-propagation: t_{k+1} defined ⇒ t_k defined and strictly earlier
        if (!r.isNullAt(1)) {
          assert(!r.isNullAt(0))
          assert(r.getTimestamp(1).after(r.getTimestamp(0)))
        }
        if (!r.isNullAt(2)) {
          assert(!r.isNullAt(1))
          assert(r.getTimestamp(2).after(r.getTimestamp(1)))
        }
        val expectReached = Seq(0, 1, 2).count(i => !r.isNullAt(i))
        assert(r.getAs[Long]("reached") === expectReached.toLong)
      }
    }
  }

  test("assignSplits: exhaustive labeling, deterministic, stable under corpus growth") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (0L until 300L).toDF("id")
    val big = (0L until 1000L).toDF("id")
    val s1 = Corpus.assignSplits(small, "id", fracs)
      .as[(Long, String)].collect().toMap
    val s2 = Corpus.assignSplits(big, "id", fracs)
      .as[(Long, String)].collect().toMap
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // growth stability: every id keeps its label when the corpus grows
    s1.foreach { case (id, lbl) => assert(s2(id) === lbl, s"id $id re-dealt") }
    val counts = s2.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("winsorize never widens the range; filterOutliers output within fences") {
    val vals = (0 until 300).map(_ => (rnd.nextGaussian() * 10 + 50))
    val df = vals.toDF("v")
    val w = graft.operators.Profile.winsorize(df, "v")
      .select(col("winsorized")).as[Double].collect()
    assert(w.min >= vals.min - 1e-9 && w.max <= vals.max + 1e-9)
    val b = graft.operators.Profile.iqrBounds(df, "v").head()
    val (lo, hi) = (b.getAs[Double]("lo"), b.getAs[Double]("hi"))
    val kept = graft.operators.Profile.filterOutliers(df, "v")
      .select(col("v")).as[Double].collect()
    kept.foreach(v => assert(v >= lo && v <= hi))
    assert(w.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9))
  }

  test("declared query names are unique and every query has an oracle") {
    val names = graft.Queries.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n })
    assert(graft.Queries.all.forall(_.oracle.nonEmpty))
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
