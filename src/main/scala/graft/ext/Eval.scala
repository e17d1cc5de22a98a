package graft.ext

import org.apache.spark.sql.DataFrame
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
}
