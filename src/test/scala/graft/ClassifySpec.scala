package graft

import org.apache.spark.sql.functions._
import graft.ext.{Eval, LogReg}

/** LogReg (deterministic logistic-regression corpus gate) and
  * Eval.binaryAuc (exact midrank ROC-AUC). */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  // ── fast sigmoid ────────────────────────────────────────────────────

  test("fastSigmoid: σ(0)=0.5, bounds, monotone, decision rule z>=0") {
    val zs = Seq(-1e9, -5.0, -1.0, -0.25, 0.0, 0.25, 1.0, 5.0, 1e9)
    val vals = zs.map(LogReg.fastSigmoidRef)
    assert(LogReg.fastSigmoidRef(0.0) == 0.5)
    assert(vals.forall(v => v > 0.0 && v < 1.0))
    assert(vals.sliding(2).forall { case Seq(a, b) => a < b })
    zs.foreach { z =>
      assert((LogReg.fastSigmoidRef(z) >= 0.5) == (z >= 0.0))
    }
    // Column kernel agrees with the driver twin bit-for-bit
    val df = zs.toDF("z").select(LogReg.fastSigmoid(col("z")).as("s"))
    assert(df.collect().map(_.getDouble(0)).toSeq == vals)
  }

  // ── training ────────────────────────────────────────────────────────

  private def sepData = Seq(
    // y=1 cluster at x≈+2, y=0 cluster at x≈−2 (bias, x)
    (1.0, 1.8, 1.0), (1.0, 2.0, 1.0), (1.0, 2.2, 1.0), (1.0, 2.4, 1.0),
    (1.0, -1.8, 0.0), (1.0, -2.0, 0.0), (1.0, -2.2, 0.0), (1.0, -2.4, 0.0)
  ).toDF("b", "x", "y")

  test("train separates a linearly-separable toy set with full accuracy") {
    val m = LogReg.train(sepData, Seq(col("b"), col("x")), col("y"),
      lr = 1.0, iters = 10)
    assert(m.weights(1) > 0.0, "slope must point toward the positive cluster")
    assert(m.n == 8L)
    assert(m.nCorrect == 8L, s"accuracy ${m.accuracy}")
  }

  test("train matches the pure-Scala reference bit-for-bit") {
    // deterministic pseudo-random rows (LCG, no RNG APIs)
    val rows = (0 until 400).map { i =>
      val a = ((i * 2654435761L) % 1000) / 500.0 - 1.0
      val b = ((i * 40503L + 7) % 1000) / 500.0 - 1.0
      val y = if (a + 0.3 * b > 0.1) 1.0 else 0.0
      (1.0, a, b, y)
    }
    val df = rows.toDF("b0", "a", "bb", "y").repartition(7)
    val m = LogReg.train(df, Seq(col("b0"), col("a"), col("bb")), col("y"),
      lr = 0.5, iters = 3)
    val ref = LogReg.trainRef(
      rows.map { case (b0, a, bb, y) => (Array(b0, a, bb), y) },
      lr = 0.5, iters = 3)
    assert(m.weights.toSeq == ref.toSeq,
      s"spark=${m.weights.toSeq} ref=${ref.toSeq}")
  }

  test("trainHashed matches the driver reference bit-for-bit; scoreHashed " +
      "separates topics map-only") {
    // driver replica of Dsir.buckets: char-hash unigrams + bigram
    // shingles, mod m, unigrams first
    def chash(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % ext.TextHash.P)
    def bkts(text: String, m: Int): Seq[Long] = {
      val hs = text.split(" ", -1).map(chash).toSeq
      val bi = hs.zip(hs.drop(1)).map { case (a, b) => (a * 31 + b) % ext.TextHash.P }
      (hs ++ bi).map(_ % m)
    }
    val rows = (0 until 120).map { i =>
      if (i % 2 == 0) (s"good quality prose piece v$i", 1.0)
      else (s"spam click buy now v$i", 0.0)
    }
    val df = rows.toDF("text", "y").repartition(5)
    val m = LogReg.trainHashed(df, "text", col("y"), m = 32, lr = 0.5, iters = 3)
    val (refBias, refW) = LogReg.trainHashedRef(
      rows.map { case (t, y) => (bkts(t, 32), y) }, m = 32, lr = 0.5, iters = 3)
    assert(m.bias === refBias)
    assert(m.weights.toSeq === refW.toSeq)
    assert(m.n === 120L)
    // partition-invariance: same weights from a different layout
    val m2 = LogReg.trainHashed(rows.toDF("text", "y").repartition(13),
      "text", col("y"), m = 32, lr = 0.5, iters = 3)
    assert(m2.weights.toSeq === m.weights.toSeq && m2.bias === m.bias)
    // scoring separates the classes and is map-only over parquet
    val scored = LogReg.scoreHashed(
      Seq(("good quality prose piece v998", -1), ("spam click buy now v999", -1))
        .toDF("text", "tag"), "text", m)
    val preds = scored.select("text", "pred").collect()
      .map(r => r.getString(0).startsWith("good") -> r.getInt(1)).toMap
    assert(preds(true) === 1 && preds(false) === 0, s"got $preds")
    val dir = java.nio.file.Files.createTempDirectory("lrh").toString
    rows.toDF("text", "y").write.mode("overwrite").parquet(dir)
    val plan = LogReg.scoreHashed(spark.read.parquet(dir), "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoreHashed must be map-only:\n$plan")
  }

  test("bucket-dot codegen kernel ≡ HOF fold bit-for-bit (incl. ANSI out-of-range raise)") {
    val w = Array.tabulate(8)(i => (i * 37 % 11) / 7.0 - 0.6)
    val rows = Seq(
      Seq(0L, 3L, 3L, 7L), Seq(5L), Seq.empty[Long], Seq(2L, 2L, 2L, 2L, 1L))
    val df = rows.map(Tuple1(_)).toDF("b")
    val kernel = df.select(graft.ext.BucketExprs.dotDouble(col("b"), w, 0.125).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val hof = df.select(LogReg.zHashedHof(0.125, w, col("b")).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(kernel.toSeq === hof.toSeq)
    // identical left-fold SEQUENCE, not just identical sum
    assert(kernel(0) === Some(((0.125 + w(0)) + w(3)) + w(3) + w(7)))
    // an out-of-range bucket RAISES in both forms (ANSI element_at)
    val oob = Seq(Tuple1(Seq(1L, 99L))).toDF("b")
    assertThrows[Exception] {
      oob.select(graft.ext.BucketExprs.dotDouble(col("b"), w, 0.0)).collect()
    }
    assertThrows[Exception] {
      oob.select(LogReg.zHashedHof(0.0, w, col("b"))).collect()
    }
  }

  test("training is partition-invariant (fixed-point gradient sums)") {
    val base = (0 until 300).map { i =>
      (1.0, (i % 17) / 8.0 - 1.0, if (i % 3 == 0) 1.0 else 0.0)
    }
    def wAt(parts: Int) = LogReg.train(
      base.toDF("b", "x", "y").repartition(parts),
      Seq(col("b"), col("x")), col("y"), lr = 0.5, iters = 3).weights.toSeq
    assert(wAt(1) == wAt(13))
  }

  test("score appends prob/pred consistent with the decision rule") {
    val m = LogReg.train(sepData, Seq(col("b"), col("x")), col("y"),
      lr = 1.0, iters = 10)
    val scored = LogReg.score(sepData, Seq(col("b"), col("x")), m)
      .select(col("y"), col("prob"), col("pred")).collect()
    scored.foreach { r =>
      val (y, p, pred) = (r.getDouble(0), r.getDouble(1), r.getInt(2))
      assert((p >= 0.5) == (pred == 1))
      assert(pred.toDouble == y, s"misclassified y=$y prob=$p")
    }
  }

  test("train drops null-feature rows entirely (n and gradients agree)") {
    val withNulls = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(1.0), Some(-2.0), Some(0.0)),
      (None, Some(5.0), Some(1.0)),        // null feature
      (Some(1.0), Some(5.0), None))        // null label
      .toDF("b", "x", "y")
    val m = LogReg.train(withNulls, Seq(col("b"), col("x")), col("y"),
      lr = 0.5, iters = 2)
    val clean = LogReg.train(withNulls.na.drop(),
      Seq(col("b"), col("x")), col("y"), lr = 0.5, iters = 2)
    assert(m.n == 2L)
    assert(m.weights.toSeq == clean.weights.toSeq)
  }

  test("train rejects an empty frame") {
    val e = intercept[IllegalArgumentException] {
      LogReg.train(sepData.filter(col("y") > 5), Seq(col("x")), col("y"))
    }
    assert(e.getMessage.contains("empty training frame"))
  }

  // ── AUC ─────────────────────────────────────────────────────────────

  private def auc(rows: Seq[(Double, Long)]): Option[Double] = {
    val r = Eval.binaryAuc(rows.toDF("s", "y"), col("s"), col("y")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("binaryAuc: perfect ranking = 1, inverted = 0, random-ish = 0.5") {
    assert(auc(Seq((0.1, 0L), (0.2, 0L), (0.3, 1L), (0.4, 1L))).contains(1.0))
    assert(auc(Seq((0.4, 0L), (0.3, 0L), (0.2, 1L), (0.1, 1L))).contains(0.0))
    // fully tied scores → midranks → 0.5 regardless of labels
    assert(auc(Seq((1.0, 0L), (1.0, 1L), (1.0, 0L), (1.0, 1L))).contains(0.5))
  }

  test("binaryAuc hand case with ties matches the midrank formula") {
    // scores: 1,2,2,3 labels: 0,0,1,1
    // midranks: 1, 2.5, 2.5, 4 → Σpos = 6.5; AUC = (6.5 − 3)/(2·2) = 0.875
    assert(auc(Seq((1.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L))).contains(0.875))
  }

  test("binaryAuc equals the O(P·N) pairwise definition on a mixed set") {
    val rows = (0 until 60).map { i =>
      val s = ((i * 7919) % 23).toDouble / 23.0
      val y = if ((i * 104729) % 5 < 2) 1L else 0L
      (s, y)
    }
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val pairs = for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0
    val expected = pairs.sum / (pos.size * neg.size)
    assertNear(auc(rows).get, expected, 1e-12)
  }

  test("binaryAuc: single-class input yields NULL auc but real counts") {
    val r = Eval.binaryAuc(Seq((0.3, 1L), (0.7, 1L)).toDF("s", "y"),
      col("s"), col("y")).head()
    assert(r.isNullAt(0) && r.getLong(1) == 2L && r.getLong(2) == 0L)
  }

  test("binaryAuc is partition-invariant") {
    val rows = (0 until 200).map(i => (((i * 31) % 11).toDouble, (i % 2).toLong))
    val a = Eval.binaryAuc(rows.toDF("s", "y").repartition(9), col("s"), col("y"))
      .head().getDouble(0)
    assert(auc(rows).contains(a))
  }

  test("binaryAuc quantization: identity on ≤6dp scores, bounds distinct " +
      "cardinality on continuous scores (VERDICT r11 #1)") {
    // parity on the existing tie fixture: quantized (default) ≡ raw
    val tied = Seq((1.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L))
    val qv = Eval.binaryAuc(tied.toDF("s", "y"), col("s"), col("y"))
      .head().getDouble(0)
    val raw = Eval.binaryAuc(tied.toDF("s", "y"), col("s"), col("y"),
      quantizeDp = None).head().getDouble(0)
    assert(qv == raw && qv == 0.875)
    // continuous sigmoid-style scores: raw keeps every distinct double,
    // the default quantizer collapses sub-1e-6 differences — the
    // distinct-score window is bounded by construction
    val cont = (0 until 500).map(i =>
      (0.5 + (i % 7) * 1e-9, (i % 2).toLong)) // 7 raw values inside one 1e-6 cell
    val df = cont.toDF("s", "y")
    val nRaw = df.select(col("s")).distinct().count()
    assert(nRaw == 7L)
    val nQ = df.select((floor(col("s") * 1e6 + 0.5) / 1e6).as("q"))
      .distinct().count()
    assert(nQ == 1L, "one quantization cell must remain")
    // all-tied after quantization → midrank AUC exactly 0.5
    assert(Eval.binaryAuc(df, col("s"), col("y")).head().getDouble(0) == 0.5)
  }

  test("prCurve quantization parity and quantized threshold grid") {
    val rows = Seq((0.1, 0L), (0.2, 1L), (0.2, 0L), (0.5, 1L), (0.9, 1L))
    val q = Eval.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("threshold")).collect()
    val r = Eval.prCurve(rows.toDF("s", "y"), col("s"), col("y"),
      quantizeDp = None).orderBy(col("threshold")).collect()
    assert(q.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq,
      "≤6dp scores are fixed points: quantized ≡ raw row-for-row")
    // sub-resolution scores merge into one threshold row
    val fine = Seq((0.5000001234, 1L), (0.5000004321, 0L))
    val merged = Eval.prCurve(fine.toDF("s", "y"), col("s"), col("y"))
      .collect()
    assert(merged.length == 1 && merged(0).getDouble(0) == 0.5)
    assert(merged(0).getLong(1) == 1L && merged(0).getLong(2) == 1L)
  }

  // ── PR curve ────────────────────────────────────────────────────────

  test("prCurve counts match the brute-force threshold definition") {
    val rows = Seq((0.1, 0L), (0.2, 1L), (0.2, 0L), (0.5, 1L), (0.9, 1L))
    val got = Eval.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("threshold")).collect()
    val thresholds = rows.map(_._1).distinct.sorted
    assert(got.map(_.getDouble(0)).toSeq == thresholds)
    got.foreach { r =>
      val th = r.getDouble(0)
      val tp = rows.count { case (s0, y0) => s0 >= th && y0 == 1L }.toLong
      val fp = rows.count { case (s0, y0) => s0 >= th && y0 == 0L }.toLong
      val pos = rows.count(_._2 == 1L).toLong
      assert(r.getLong(1) == tp, s"tp at $th")
      assert(r.getLong(2) == fp, s"fp at $th")
      assert(r.getLong(3) == pos - tp, s"fn at $th")
      assertNear(r.getDouble(4), tp.toDouble / (tp + fp), 1e-12)
      assertNear(r.getDouble(5), tp.toDouble / pos, 1e-12)
    }
  }

  test("prCurve: recall is NULL with no positives; precision still real") {
    val r = Eval.prCurve(Seq((0.3, 0L), (0.7, 0L)).toDF("s", "y"),
      col("s"), col("y")).orderBy(col("threshold")).collect()
    assert(r.forall(_.isNullAt(5)))
    assert(r.forall(_.getDouble(4) == 0.0))
  }

  // ── calibration bins ────────────────────────────────────────────────

  test("reliabilityBins: bin edges, top bin closed, exact means/rates") {
    val rows = Seq(
      (0.05, 0L), (0.05, 1L),          // bin 0: mean .05, rate .5
      (0.55, 1L),                      // bin 5
      (0.95, 1L), (1.0, 1L), (0.99, 0L)) // bin 9 (1.0 clamps into 9)
    val got = Eval.reliabilityBins(rows.toDF("p", "y"), col("p"), col("y"))
      .orderBy(col("bin")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 5, 9))
    val b0 = got(0); val b9 = got(2)
    assert(b0.getLong(1) == 2L)
    assertNear(b0.getDouble(2), 0.05, 1e-9)
    assertNear(b0.getDouble(3), 0.5, 1e-12)
    assert(b9.getLong(1) == 3L)
    assertNear(b9.getDouble(2), (0.95 + 1.0 + 0.99) / 3, 1e-9)
    assertNear(b9.getDouble(3), 2.0 / 3, 1e-12)
  }

  test("reliabilityBins mean_pred is partition-invariant (e9 fixed point)") {
    val rows = (0 until 500).map(i => (((i * 37) % 100) / 100.0, (i % 3 == 0)))
      .map { case (p, y) => (p, if (y) 1L else 0L) }
    def at(parts: Int) = Eval.reliabilityBins(
      rows.toDF("p", "y").repartition(parts), col("p"), col("y"))
      .orderBy(col("bin")).collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    assert(at(1) == at(11))
  }

  // ── gate ────────────────────────────────────────────────────────────

  test("gate keeps exactly the rows scored >= minProb; rejects bad bounds") {
    val m = LogReg.train(sepData, Seq(col("b"), col("x")), col("y"),
      lr = 1.0, iters = 10)
    val kept = LogReg.gate(sepData, Seq(col("b"), col("x")), m, 0.5)
      .select(col("y")).collect().map(_.getDouble(0))
    assert(kept.forall(_ == 1.0) && kept.length == 4)
    intercept[IllegalArgumentException] {
      LogReg.gate(sepData, Seq(col("b"), col("x")), m, 1.0)
    }
  }

  test("gate composes with DocPipeline.prepare (train → gate → dedup)") {
    // corpus: short junk docs (y=0) + long real docs (y=1), one near-dup
    val mk = (id: Long, body: String) => (id, body)
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "alef bet gimel dalet he vav zayin het tet yod kaf"
    val docs = Seq(
      mk(1L, good), mk(2L, good), // exact dups — one must survive
      mk(3L, "uno dos tres cuatro cinco seis siete ocho nueve diez " +
        "once doce trece catorce quince dieciseis diecisiete dieciocho " +
        "diecinueve veinte veintiuno veintidos veintitres veinticuatro"),
      mk(10L, "spam spam"), mk(11L, "buy now"), mk(12L, "x")
    ).toDF("doc_id", "text")
    val nt = size(split(col("text"), " ", -1))
    val feats = Seq(lit(1.0), nt / lit(10.0))
    val label = when(nt >= 20, 1.0).otherwise(0.0)
    val m = LogReg.train(docs, feats, label, lr = 1.0, iters = 8)
    val gated = LogReg.gate(docs, feats, m, minProb = 0.5)
    assert(gated.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L), "gate keeps only the long docs")
    val surviving = graft.ext.DocPipeline.prepare(
      gated, minWords = 5, minhashK = 8, bands = 4, tau = 0.8)
    val ids = surviving.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L))
    assert((ids & Set(1L, 2L)).size == 1, "exact pair collapses to one")
  }

  // ── dedup-quality harness ───────────────────────────────────────────

  test("pairPrecisionRecall: direction/self/duplicate pairs canonicalized") {
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 3L), (4L, 5L), (4L, 5L))
      .toDF("a", "b") // canonical: {1-2, 4-5}
    val truth = Seq((2L, 1L), (5L, 6L)).toDF("a", "b") // {1-2, 5-6}
    val r = Eval.pairPrecisionRecall(pred, truth, "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assertNear(r.getDouble(3), 0.5, 1e-12)
    assertNear(r.getDouble(4), 0.5, 1e-12)
    assertNear(r.getDouble(5), 0.5, 1e-12) // 2·1/(2+2)
  }

  test("pairPrecisionRecall: empty prediction → NULL precision, 0 recall") {
    val pred = Seq.empty[(Long, Long)].toDF("a", "b")
    val truth = Seq((1L, 2L)).toDF("a", "b")
    val r = Eval.pairPrecisionRecall(pred, truth, "a", "b").head()
    assert(r.getLong(0) == 0L && r.isNullAt(3))
    assertNear(r.getDouble(4), 0.0, 1e-12)
  }

  test("pairPrecisionRecall scores simhash candidates vs planted truth") {
    // 3 identical docs {10,11,12} + 2 identical docs {20,21} + singles
    val docs = Seq(
      10L -> "alpha beta gamma delta epsilon zeta", // planted triple
      11L -> "alpha beta gamma delta epsilon zeta",
      12L -> "alpha beta gamma delta epsilon zeta",
      20L -> "one two three four five six seven",   // planted pair
      21L -> "one two three four five six seven",
      30L -> "completely different text right here",
      31L -> "another unrelated document entirely"
    ).toDF("doc_id", "text")
    val pred = graft.ext.Dedup.simhashNearDups(docs, "doc_id", "text",
      bits = 16, maxHamming = 0)
    val truth = Seq((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("a", "b")
    val r = Eval.pairPrecisionRecall(
      pred.select(col("doc_id").as("a"), col("dup_of").as("b")),
      truth, "a", "b").head()
    // identical texts ⇒ identical signatures ⇒ recall 1; at hamming 0
    // on this tiny distinct corpus precision is 1 too
    assert(r.getLong(1) == 4L)
    assertNear(r.getDouble(4), 1.0, 1e-12)
    assertNear(r.getDouble(3), 1.0, 1e-12)
  }

  test("L2 decay shrinks weights, stays bit-equal to the reference") {
    val rows = (0 until 120).map { i =>
      (Array(1.0, (i % 30) / 15.0 - 1.0), if (i % 30 > 16) 1.0 else 0.0)
    }
    val df = rows.map { case (x, y) => (x(0), x(1), y) }.toDF("b", "x", "y")
    val plain = LogReg.train(df, Seq(col("b"), col("x")), col("y"),
      lr = 0.5, iters = 4)
    val decayed = LogReg.train(df, Seq(col("b"), col("x")), col("y"),
      lr = 0.5, iters = 4, l2 = 0.2)
    assert(math.abs(decayed.weights(1)) < math.abs(plain.weights(1)),
      "decay must shrink the slope")
    val ref = LogReg.trainRef(rows, lr = 0.5, iters = 4, l2 = 0.2)
    assert(decayed.weights.toSeq == ref.toSeq)
  }

  test("L2 bounds weights on a SEPARABLE corpus; plain GD keeps growing " +
      "(VERDICT r11 #4 stability case)") {
    // perfectly separable with margin: the plain-GD residual never
    // reaches zero, so |w| grows with every iteration, without bound;
    // decoupled decay has a fixed point (lr·l2·w* balances the shrinking
    // gradient) so the decayed weights converge
    val rows = (0 until 60).map { i =>
      val x = if (i % 2 == 0) 1.0 else -1.0
      (Array(x), if (x > 0) 1.0 else 0.0)
    }
    def slope(iters: Int, l2: Double) =
      LogReg.trainRef(rows, lr = 1.0, iters = iters, l2 = l2)(0)
    assert(slope(48, 0.0) > slope(24, 0.0) + 1.0,
      "plain GD must keep growing the separating weight")
    val d24 = slope(24, 0.1); val d48 = slope(48, 0.1)
    assert(math.abs(d48 - d24) < 0.05,
      s"decayed weight must converge (got $d24 -> $d48)")
    // and the distributed trainer reproduces the stable reference weight
    val df = rows.map { case (x, y) => (x(0), y) }.toDF("x", "y")
    val m = LogReg.train(df, Seq(col("x")), col("y"),
      lr = 1.0, iters = 24, l2 = 0.1)
    assert(m.weights(0) === d24)
  }

  test("plattScale ≡ train on (bias, score); slope tracks the signal") {
    val rows = (0 until 200).map { i =>
      val s0 = (i % 40) / 20.0 - 1.0
      (s0, if (s0 > 0.1) 1.0 else 0.0)
    }
    val df = rows.toDF("s", "y")
    val m = LogReg.plattScale(df, col("s"), col("y"), lr = 1.0, iters = 5)
    val direct = LogReg.train(df, Seq(lit(1.0), col("s")), col("y"),
      lr = 1.0, iters = 5)
    assert(m.weights.toSeq == direct.weights.toSeq)
    assert(m.weights(1) > 0.0, "calibration slope must be positive")
  }

  // ── seeded-random differential properties (SURVEY §5.2(3) style) ────

  test("property: train ≡ pure-Scala reference on random frames") {
    val rnd = new scala.util.Random(0xC1A551F1)
    for (trial <- 0 until 5) {
      val d = 1 + rnd.nextInt(4)
      val n = 20 + rnd.nextInt(180)
      val iters = 1 + rnd.nextInt(4)
      val lr = Seq(0.25, 0.5, 1.0)(rnd.nextInt(3))
      val rows = (0 until n).map { _ =>
        (Array.fill(d)(math.floor(rnd.nextDouble() * 200 - 100) / 10.0),
          if (rnd.nextBoolean()) 1.0 else 0.0)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (x, y) =>
            org.apache.spark.sql.Row.fromSeq(x.toSeq :+ y)
          }, 1 + rnd.nextInt(7)),
        org.apache.spark.sql.types.StructType(
          (0 until d).map(j => org.apache.spark.sql.types.StructField(
            s"x$j", org.apache.spark.sql.types.DoubleType)) :+
            org.apache.spark.sql.types.StructField(
              "y", org.apache.spark.sql.types.DoubleType)))
      val got = LogReg.train(df, (0 until d).map(j => col(s"x$j")),
        col("y"), lr = lr, iters = iters).weights.toSeq
      val want = LogReg.trainRef(rows, lr = lr, iters = iters).toSeq
      assert(got == want, s"trial $trial d=$d n=$n iters=$iters lr=$lr")
    }
  }

  test("property: binaryAuc ≡ pairwise definition on random score/label sets") {
    val rnd = new scala.util.Random(0xA0C0FFEE)
    for (trial <- 0 until 5) {
      // small score domain forces heavy ties
      val rows = (0 until 30 + rnd.nextInt(120)).map { _ =>
        (rnd.nextInt(6).toDouble / 3.0, rnd.nextInt(2).toLong)
      }
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val got = auc(rows)
      if (pos.isEmpty || neg.isEmpty) assert(got.isEmpty, s"trial $trial")
      else {
        val pairs = for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0
        assertNear(got.get, pairs.sum / (pos.size * neg.size), 1e-12)
      }
    }
  }
}
