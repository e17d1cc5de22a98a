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
}
