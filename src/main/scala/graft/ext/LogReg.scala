package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Distributed logistic-regression trainer for corpus quality filtering
  * — the fastText-style "train a small classifier, keep docs it scores
  * high" step of LLM data pipelines (Joulin et al. 2016, "Bag of Tricks
  * for Efficient Text Classification"; CCNet and LLaMA data curation
  * both gate on a linear classifier over surface features).
  *
  * Full-batch gradient descent, engineered so that training is
  * BIT-REPLICABLE across engines and across partitionings:
  *
  *  - the logistic link is the "fast sigmoid" σ(z) = 0.5 + z/(2(1+|z|)):
  *    only +, −, ×, ÷, abs — each IEEE-754 correctly rounded, so the
  *    value is bit-identical on any IEEE engine (an exp()-based link
  *    would differ in the last ulp between libm implementations);
  *  - per-row gradient contributions are rounded to fixed-point longs
  *    (`floor(c·scale + 0.5)`) and summed as integers — the sum is
  *    exact and associative, so the result is independent of partition
  *    count and combine order (same trick as the PageRank/kinship
  *    kernels);
  *  - the weight update `w − lr·((g/scale)/n)` is a fixed sequence of
  *    double ops on identical inputs.
  *
  * Scale shape: one narrow projection of the corpus (cached by the
  * caller if iterating many times), then per-iteration ONE partial+final
  * aggregate producing d+1 numbers — no shuffle of rows, no driver
  * collect beyond the d-element gradient envelope. At 100 TB the cost
  * is `iters` map-side passes; d and iters stay tiny.
  *
  * Overflow headroom: |per-row contribution| ≤ max|x|·scale. With the
  * default scale=1e9 a corpus of 1e12 rows and |x| ≤ 100 keeps the
  * long sum under 1e23 — too big. For trillion-row corpora pass
  * scale=1e6 (still six decimal digits of gradient precision) or
  * normalize features into [0,1]; the unit spec pins the envelope.
  */
object LogReg {

  /** σ(z) = 0.5 + z/(2(1+|z|)) — monotone, (0,1), σ(0)=0.5, and the
    * decision rule σ(z) ≥ 0.5 ⟺ z ≥ 0 is exact. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Driver-side twin of [[fastSigmoid]] for reference/spec use. */
  def fastSigmoidRef(z: Double): Double = 0.5 + z / (2.0 * (1.0 + math.abs(z)))

  /** Trained model: weights (aligned with the `features` argument),
    * corpus size, and training-set decision accuracy under the exact
    * rule z ≥ 0. */
  final case class Model(weights: Array[Double], n: Long,
                         nCorrect: Long) {
    def accuracy: Double = if (n == 0) 0.0 else nCorrect.toDouble / n
  }

  /** Linear predictor Σ wⱼ·xⱼ built LEFT-ASSOCIATIVELY — the oracle
    * twin must parenthesize the same way for bit equality. */
  private def zOf(weights: Array[Double], xs: Seq[Column]): Column =
    weights.zip(xs).map { case (w, x) => lit(w) * x }.reduceLeft(_ + _)

  /** Train on `features` (cast to double; include an explicit `lit(1.0)`
    * bias term if wanted) against binary `label` (1.0 / 0.0). Weights
    * start at zero. Rows with a NULL feature or label are dropped up
    * front — otherwise they would skip the gradient but still inflate
    * the 1/n step size. Each iteration runs one aggregate job over
    * `df`; cache `df` upstream when `iters` is large. */
  def train(df: DataFrame, features: Seq[Column], label: Column,
            lr: Double = 0.5, iters: Int = 3,
            scale: Double = 1e9, l2: Double = 0.0): Model = {
    require(features.nonEmpty, "at least one feature column")
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(l2 >= 0.0, s"l2=$l2 must be >= 0")
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, j) =>
      f.cast("double").as(s"_x$j")
    } :+ label.cast("double").as("_y")
    val feats = df.select(cols: _*).na.drop()
    val xs = (0 until d).map(j => col(s"_x$j"))

    val w = Array.fill(d)(0.0)
    var n = 0L
    for (_ <- 1 to iters) {
      val resid = fastSigmoid(zOf(w, xs)) - col("_y")
      val gradAggs = (0 until d).map { j =>
        sum(floor(resid * xs(j) * lit(scale) + lit(0.5)).cast("long"))
          .as(s"_g$j")
      }
      val row = feats.agg(count(lit(1L)).as("_n"), gradAggs: _*).head()
      n = row.getLong(0)
      require(n > 0, "empty training frame")
      var j = 0
      while (j < d) {
        val g = row.getLong(j + 1)
        // exact op order mirrored by the SQL twin: w − lr·((g/scale)/n),
        // with optional decoupled weight decay (L2) applied first —
        // also pure double arithmetic, so still bit-replicable
        val wd = if (l2 == 0.0) w(j) else w(j) * (1.0 - lr * l2)
        w(j) = wd - lr * ((g / scale) / n)
        j += 1
      }
    }

    val zFinal = zOf(w, xs)
    val correct = (zFinal >= 0.0) === (col("_y") === 1.0)
    val accRow = feats
      .agg(sum(when(correct, 1L).otherwise(0L)).as("_c"),
        count(lit(1L)).as("_n"))
      .head()
    Model(w, accRow.getLong(1), accRow.getLong(0))
  }

  /** Score `df` with a trained model: appends `prob` (fast-sigmoid
    * probability) and `pred` (exact z ≥ 0 decision). Map-only. */
  def score(df: DataFrame, features: Seq[Column], model: Model,
            probCol: String = "prob", predCol: String = "pred"): DataFrame = {
    require(features.size == model.weights.length,
      s"${features.size} features vs ${model.weights.length} weights")
    val z = zOf(model.weights, features.map(_.cast("double")))
    df.withColumn(probCol, fastSigmoid(z))
      .withColumn(predCol, (z >= 0.0).cast("int"))
  }

  /** Quality gate: keep rows the model scores at or above `minProb`.
    * Map-only — composes with [[DocPipeline.prepare]] as a pre- or
    * post-filter (score the raw corpus, then run the dedup pipeline on
    * survivors). Since the fast sigmoid is monotone, this compiles to
    * a single arithmetic predicate, no probability column in flight. */
  def gate(df: DataFrame, features: Seq[Column], model: Model,
           minProb: Double): DataFrame = {
    require(minProb > 0.0 && minProb < 1.0,
      s"minProb=$minProb must be in (0, 1)")
    val z = zOf(model.weights, features.map(_.cast("double")))
    df.filter(fastSigmoid(z) >= minProb)
  }

  /** Platt scaling (Platt 1999): calibrate a raw scorer into a
    * probability by fitting the 2-parameter logistic p = σ(a·s + b) —
    * exactly [[train]] on features (bias, score), sharing its
    * bit-replicability. Feed the result to [[score]] /
    * [[Eval.reliabilityBins]] to check the calibration it buys. */
  def plattScale(df: DataFrame, scoreCol: Column, label: Column,
                 lr: Double = 0.5, iters: Int = 3): Model =
    train(df, Seq(lit(1.0), scoreCol), label, lr = lr, iters = iters)

  /** Trained hashed-feature model: `bias` plus one weight per feature
    * bucket (aligned with [[Dsir.buckets]] ids 0..m−1). */
  final case class HashedModel(bias: Double, weights: Array[Double], n: Long)

  /** Sparse logistic regression over HASHED n-gram features — the
    * actual fastText shape (Joulin et al. 2016: bag of hashed
    * unigrams+bigrams → linear classifier), where [[train]]'s dense
    * `Seq[Column]` API stops scaling: features here are
    * [[Dsir.buckets]] ids (m buckets, e.g. 10k), the per-doc linear
    * predictor is a LEFT-FOLD over the doc's bucket array against the
    * weight vector as a codegen array literal (map-only, no join), and
    * the per-iteration gradient is ONE explode + groupBy(bucket) pass
    * whose shuffle key is the bucket id — the m+1-row result (a
    * sentinel bucket −1 carries the bias gradient and the row count in
    * the same pass) is a bounded driver envelope.
    *
    * Bit-replicability inherits [[train]]'s design: fast sigmoid,
    * per-occurrence fixed-point gradient quantization summed as
    * integers (partition-order independent), identical double update
    * sequence; the fold adds weights in bucket-ARRAY order, which the
    * oracle twin replays with list_reduce. Decoupled L2 decay applies
    * to every weight including the bias (same rule as [[train]] when a
    * bias column is passed). The (buckets, label) projection is
    * materialized ONCE before the loop ([[Checkpoints.cut]] — the
    * [[Dsir.resampleAt]] slim-checkpoint pattern): each gradient pass
    * re-reads slim int arrays from checkpoint storage instead of
    * re-tokenizing the corpus `iters` times. */
  def trainHashed(docs: DataFrame, textCol: String, label: Column, m: Int,
                  lr: Double = 0.5, iters: Int = 3, scale: Double = 1e9,
                  l2: Double = 0.0): HashedModel = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(l2 >= 0.0, s"l2=$l2 must be >= 0")
    val feats = Checkpoints.cut(docs.select(
      Dsir.buckets(TextHash.wordHashes(col(textCol)), m).as("_b"),
      label.cast("double").as("_y")).na.drop(Seq("_y")))
    var bias = 0.0
    val w = Array.fill(m)(0.0)
    var n = 0L
    for (_ <- 1 to iters) {
      val resid = fastSigmoid(zHashed(bias, w, col("_b"))) - col("_y")
      // TWO-STEP shape on purpose: `select(resid, explode(…))` would
      // plan the residual in the Project ABOVE the Generate — Spark
      // evaluates generator-sibling expressions once per EXPLODED row,
      // multiplying the whole sigmoid fold by tokens/doc (measured 4×
      // at sf0.1; unbounded on long documents). withColumn first keeps
      // `_r` in the Project below the Generate: once per document.
      val g = feats
        .withColumn("_r", resid)
        .select(col("_r"), explode(concat(col("_b"), array(lit(-1L)))).as("_bkt"))
        .groupBy(col("_bkt"))
        .agg(sum(floor(col("_r") * lit(scale) + lit(0.5)).cast("long")).as("_g"),
          count(lit(1)).as("_c"))
        .collect()
      val byBucket = g.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      n = byBucket.get(-1L).map(_._2).getOrElse(0L)
      require(n > 0, "empty training frame")
      // same update sequence as train(): decay first, then the step —
      // buckets with no occurrences decay but get zero gradient
      def step(cur: Double, grad: Long): Double = {
        val wd = if (l2 == 0.0) cur else cur * (1.0 - lr * l2)
        wd - lr * ((grad / scale) / n)
      }
      bias = step(bias, byBucket(-1L)._1)
      var j = 0
      while (j < m) {
        w(j) = step(w(j), byBucket.get(j.toLong).map(_._1).getOrElse(0L))
        j += 1
      }
    }
    HashedModel(bias, w, n)
  }

  /** Per-doc linear predictor for hashed models: bias + left-fold of
    * bucket weights in bucket-array order (the twin's list_reduce).
    * Codegen kernel ([[BucketExprs.dotDouble]]) — identical addition
    * sequence to [[zHashedHof]], which remains the differential spec
    * (lambda HOFs evaluate interpreted, a per-token megamorphic chain
    * on the map stage every document crosses). */
  private def zHashed(bias: Double, w: Array[Double], buckets: Column): Column =
    BucketExprs.dotDouble(buckets, w, bias)

  /** HOF spec form of [[zHashed]] (differential reference only). */
  private[graft] def zHashedHof(bias: Double, w: Array[Double], buckets: Column): Column =
    aggregate(buckets, lit(bias),
      (acc, b) => acc + element_at(typedlit(w.toSeq), b.cast("int") + 1))

  /** [[score]] for hashed models: appends `prob` and `pred`, map-only
    * against the weight table (no join, no shuffle). The predictor is
    * computed ONCE into a temp column — referencing `z` from both
    * output columns would tokenize and fold twice per document. */
  def scoreHashed(docs: DataFrame, textCol: String, model: HashedModel,
                  probCol: String = "prob", predCol: String = "pred"): DataFrame = {
    val z = zHashed(model.bias, model.weights,
      Dsir.buckets(TextHash.wordHashes(col(textCol)), model.weights.length))
    docs.withColumn("_z_lrh", z)
      .withColumn(probCol, fastSigmoid(col("_z_lrh")))
      .withColumn(predCol, (col("_z_lrh") >= 0.0).cast("int"))
      .drop("_z_lrh")
  }

  /** Driver-side reference of [[trainHashed]] (same arithmetic) for
    * differential testing: rows = (bucket ids, label). */
  def trainHashedRef(rows: Seq[(Seq[Long], Double)], m: Int,
                     lr: Double = 0.5, iters: Int = 3, scale: Double = 1e9,
                     l2: Double = 0.0): (Double, Array[Double]) = {
    require(rows.nonEmpty)
    var bias = 0.0
    val w = Array.fill(m)(0.0)
    for (_ <- 1 to iters) {
      var gb = 0L
      val g = Array.fill(m)(0L)
      rows.foreach { case (bs, y) =>
        var z = bias
        bs.foreach(b => z += w(b.toInt))
        val r = fastSigmoidRef(z) - y
        val q = math.floor(r * scale + 0.5).toLong
        bs.foreach(b => g(b.toInt) += q)
        gb += q
      }
      def step(cur: Double, grad: Long): Double = {
        val wd = if (l2 == 0.0) cur else cur * (1.0 - lr * l2)
        wd - lr * ((grad / scale) / rows.size)
      }
      bias = step(bias, gb)
      var j = 0
      while (j < m) { w(j) = step(w(j), g(j)); j += 1 }
    }
    (bias, w)
  }

  /** Pure-Scala reference trainer (same arithmetic, driver-side) for
    * differential testing: rows = (features, label). */
  def trainRef(rows: Seq[(Array[Double], Double)], lr: Double = 0.5,
               iters: Int = 3, scale: Double = 1e9,
               l2: Double = 0.0): Array[Double] = {
    require(rows.nonEmpty)
    val d = rows.head._1.length
    val w = Array.fill(d)(0.0)
    for (_ <- 1 to iters) {
      val g = Array.fill(d)(0L)
      rows.foreach { case (x, y) =>
        var z = 0.0
        var j = 0
        while (j < d) { z += w(j) * x(j); j += 1 }
        val r = fastSigmoidRef(z) - y
        j = 0
        while (j < d) {
          g(j) += math.floor(r * x(j) * scale + 0.5).toLong
          j += 1
        }
      }
      var j = 0
      while (j < d) {
        val wd = if (l2 == 0.0) w(j) else w(j) * (1.0 - lr * l2)
        w(j) = wd - lr * ((g(j) / scale) / rows.size)
        j += 1
      }
    }
    w
  }
}
