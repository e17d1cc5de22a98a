package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANN quality evaluation — recall@k of an approximate result set
  * against exact ground truth (VERDICT r6 #5: the first thing a user
  * tuning nprobe / bits / rerankFactor asks for, as a LIBRARY operator
  * rather than spec-internal assertions).
  *
  * Workflow: sample a probe set (small by construction — ground truth
  * is brute force, O(|probes|·|corpus|)), compute truth once with
  * [[Similarity.bruteForceTopKJoin]] (or pass any labeled set), then
  * score every candidate configuration against it. The probe SAMPLE is
  * the knob that keeps this tractable at 100 TB: truth cost scales
  * with probes, not with the index.
  *
  * Scale shape: two (probeId)-keyed aggregations and one semi join on
  * (probeId, id) scalars — no vectors move. */
object Eval {

  /** Per-probe recall@k: |approx ∩ truth| / min(|truth|, k). Probes
    * present in `truth` but absent from `approx` score 0 (an ANN path
    * that returns nothing for a probe is a miss, not a skip). Extra
    * approx rows beyond truth's probes are ignored. Duplicate
    * (probe, id) pairs count once. */
  def recallAtK(approx: DataFrame, truth: DataFrame,
                probeIdCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val a = approx.select(col(probeIdCol), col(idCol)).distinct()
    val t = truth.select(col(probeIdCol), col(idCol)).distinct()
    val hits = t.join(a, Seq(probeIdCol, idCol), "left_semi")
      .groupBy(col(probeIdCol)).agg(count(lit(1)).as("_n_hit"))
    t.groupBy(col(probeIdCol)).agg(count(lit(1)).as("_n_truth"))
      .join(hits, Seq(probeIdCol), "left")
      .select(col(probeIdCol),
        (coalesce(col("_n_hit"), lit(0L)).cast("double") /
          least(col("_n_truth"), lit(k.toLong)).cast("double")).as("recall"))
  }

  /** Mean recall@k over all probes — the single tuning number. */
  def meanRecallAtK(approx: DataFrame, truth: DataFrame,
                    probeIdCol: String, idCol: String, k: Int): Double =
    recallAtK(approx, truth, probeIdCol, idCol, k)
      .agg(avg(col("recall"))).head().getDouble(0)

  /** Shared (score, label) projection of the ranking metrics, with the
    * cardinality-bounding quantizer. `floor(s·10^dp + 0.5)/10^dp` is
    * monotone non-decreasing (order-preserving; only sub-resolution
    * ties merge), a fixed point on inputs already at ≤ dp decimals, and
    * replays bit-identically in the DuckDB twins (floor, ×, ÷ by a
    * power of ten — all correctly-rounded IEEE ops). */
  private def scorePrep(df: DataFrame, score: Column, label: Column,
                        quantizeDp: Option[Int]): DataFrame = {
    val raw = df.select(score.cast("double").as("_s"),
      label.cast("long").as("_y"))
    quantizeDp match {
      case None => raw
      case Some(dp) =>
        require(dp >= 0 && dp <= 15, s"quantizeDp=$dp must be in [0, 15]")
        val f = math.pow(10.0, dp)
        raw.select((floor(col("_s") * lit(f) + lit(0.5)) / lit(f)).as("_s"),
          col("_y"))
    }
  }

  /** Exact ROC-AUC of a scorer against a binary label — the acceptance
    * metric for any quality/language classifier gating a corpus
    * ([[LogReg]], the NB classifier, perplexity filters). Computed via
    * the Mann-Whitney U statistic with midrank tie handling:
    *
    *   AUC = (Σ_{positives} midrank − P(P+1)/2) / (P·N)
    *
    * Integer-exact until the final division: per distinct score value
    * we aggregate (count, positives); 2·midrank = 2·cumcount − ct + 1
    * is an integer, so the rank-sum is an exact long and the result is
    * independent of partitioning and combine order.
    *
    * Scale shape: ONE groupBy on the score value (shuffles d+1 scalars
    * per distinct score, never rows), then a window over the DISTINCT
    * SCORES ONLY — the single-partition sort is over score cardinality,
    * not corpus size. That cardinality is BOUNDED BY CONSTRUCTION: by
    * default the score is quantized to `quantizeDp` = 6 decimal places
    * (`floor(s·10⁶ + 0.5)/10⁶` — the repo's fixed-point convention,
    * bit-replicable cross-engine, monotone so the ranking order is
    * preserved and only sub-resolution ties merge), capping the window
    * at range·10⁶ rows no matter how continuous the scorer is — the
    * LogReg sigmoid in [0,1] sorts ≤ 1e6+1 rows at ANY corpus size.
    * Scores already at ≤ 6 dp (integer counts, quantized probabilities)
    * pass through EXACTLY (they are fixed points of the quantizer).
    * Pass `quantizeDp = None` for raw unbounded-cardinality scores
    * (exact on arbitrary doubles; single-partitions the distinct set —
    * opt-in only). Requires |score|·10^dp < 2^53 for exactness.
    *
    * Returns one row: `auc` (double, NULL when either class is absent),
    * `n_pos`, `n_neg`. */
  def binaryAuc(df: DataFrame, score: Column, label: Column,
                quantizeDp: Option[Int] = Some(6)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = scorePrep(df, score, label, quantizeDp)
    val per = s.groupBy(col("_s"))
      .agg(count(lit(1L)).as("_ct"), sum(col("_y")).as("_cp"))
    // inclusive running count in score order; frame = RANGE UNBOUNDED
    // PRECEDING .. CURRENT ROW (default) over distinct scores
    val cum = sum(col("_ct")).over(Window.orderBy(col("_s")))
    // totals derive from the SAME per-score aggregate (one corpus
    // scan total — a second s.agg would re-scan the row-level frame)
    val ranked = per.withColumn("_cum", cum)
      .select(
        // Σ over positives of 2·midrank, as an exact long
        sum(col("_cp") * (lit(2L) * col("_cum") - col("_ct") + lit(1L)))
          .as("_sr2"),
        sum(col("_cp")).as("_p"), sum(col("_ct")).as("_n"))
    ranked.select(
      when(col("_p") > 0L && col("_n") - col("_p") > 0L,
        (col("_sr2") - col("_p") * (col("_p") + lit(1L))).cast("double") /
          (lit(2.0) * col("_p").cast("double") *
            (col("_n") - col("_p")).cast("double")))
        .as("auc"),
      col("_p").as("n_pos"),
      (col("_n") - col("_p")).as("n_neg"))
  }

  /** Precision/recall sweep: one row per DISTINCT score value s,
    * treating s as the decision threshold (predict positive ⟺
    * score ≥ s). Counts are exact longs from reverse-cumulative sums
    * over per-score aggregates; precision/recall are derived doubles.
    * `recall` is NULL when the frame has no positives.
    *
    * Same scale shape as [[binaryAuc]], including the default
    * `quantizeDp = 6` quantization that bounds the distinct-score
    * window by construction — the threshold grid IS the (quantized)
    * distinct-score set. Thresholds are reported at the quantized
    * value; `None` opts into the raw unbounded grid. */
  def prCurve(df: DataFrame, score: Column, label: Column,
              quantizeDp: Option[Int] = Some(6)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = scorePrep(df, score, label, quantizeDp)
    val per = s.groupBy(col("_s"))
      .agg(count(lit(1L)).as("_ct"), sum(col("_y")).as("_cp"))
    // RANGE UNBOUNDED PRECEDING..CURRENT over DESC = all rows with
    // score >= this threshold
    val w = Window.orderBy(col("_s").desc)
    // total positives from the same per-score aggregate (one scan);
    // the 1-row total broadcasts back over the distinct-score frame
    val cum = per.select(col("_s"),
      sum(col("_cp")).over(w).as("_tp"),
      sum(col("_ct") - col("_cp")).over(w).as("_fp"))
    val tot = per.agg(sum(col("_cp")).as("_pos"))
    cum.crossJoin(broadcast(tot)).select(
      col("_s").as("threshold"),
      col("_tp").as("tp"), col("_fp").as("fp"),
      (col("_pos") - col("_tp")).as("fn"),
      (col("_tp").cast("double") /
        (col("_tp") + col("_fp")).cast("double")).as("precision"),
      when(col("_pos") > 0L,
        col("_tp").cast("double") / col("_pos").cast("double"))
        .as("recall"))
  }

  /** Dedup-quality evaluation: precision/recall/F1 of a predicted
    * duplicate-pair set against a ground-truth pair set — the tuning
    * number for MinHash band counts, SimHash radii, or n-gram τ the
    * same way [[recallAtK]] is for ANN (truth typically comes from a
    * planted-duplicate harness or an exact pass over a sample).
    *
    * Pairs are UNDIRECTED: (a,b) and (b,a) are the same pair; self
    * pairs are dropped; duplicates count once. Exact long counts via
    * canonical (least, greatest) keys + one semi join; shuffles only
    * id pairs. Returns one row: n_pred, n_truth, n_hit, precision,
    * recall, f1 (NULLs where a denominator is empty). */
  def pairPrecisionRecall(pred: DataFrame, truth: DataFrame,
                          aCol: String, bCol: String): DataFrame = {
    def canon(df: DataFrame) = df
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v"))
      .distinct()
    val p = canon(pred)
    val t = canon(truth)
    // n_pred and n_hit from ONE pass over the predicted pairs (a
    // left-semi + separate count would scan the canonicalized pred
    // set twice); n_truth from one pass over truth
    val withHit = p.join(t.withColumn("_hit", lit(1)), Seq("_u", "_v"), "left")
      .agg(count(lit(1L)).as("n_pred"), count(col("_hit")).as("n_hit"))
    val nt = t.agg(count(lit(1L)).as("n_truth"))
    withHit.crossJoin(broadcast(nt)).select(
      col("n_pred"), col("n_truth"), col("n_hit"),
      when(col("n_pred") > 0L,
        col("n_hit").cast("double") / col("n_pred").cast("double"))
        .as("precision"),
      when(col("n_truth") > 0L,
        col("n_hit").cast("double") / col("n_truth").cast("double"))
        .as("recall"),
      when(col("n_pred") > 0L && col("n_truth") > 0L &&
        col("n_hit") > 0L,
        lit(2.0) * col("n_hit").cast("double") /
          (col("n_pred") + col("n_truth")).cast("double"))
        .otherwise(when(col("n_pred") > 0L && col("n_truth") > 0L, lit(0.0)))
        .as("f1"))
  }

  /** Calibration reliability bins: partition [0,1] probabilities into
    * `bins` equal bins (the top edge closed), and per bin report count,
    * mean predicted probability, and empirical positive rate. The mean
    * prediction is computed from FIXED-POINT e9 long sums, so the
    * result is partition-order-independent and cross-engine exact.
    * Map-side agg on a tiny key domain — no row shuffle. */
  def reliabilityBins(df: DataFrame, prob: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins=$bins must be >= 1")
    val s = df.select(prob.cast("double").as("_p"),
      label.cast("long").as("_y"))
    val bin = least(floor(col("_p") * lit(bins.toDouble)),
      lit((bins - 1).toDouble)).cast("int")
    s.groupBy(bin.as("bin"))
      .agg(count(lit(1L)).as("n_rows"),
        sum(floor(col("_p") * lit(1000000000.0) + lit(0.5)).cast("long"))
          .as("_sp9"),
        sum(col("_y")).as("_np"))
      .select(col("bin"), col("n_rows"),
        ((col("_sp9") / lit(1000000000.0)) / col("n_rows"))
          .as("mean_pred"),
        (col("_np").cast("double") / col("n_rows").cast("double"))
          .as("rate"))
  }
}
