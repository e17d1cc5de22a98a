package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GenotypeKernels._

/** Case/control association screens — the GWAS primitives over a
  * biallelic cohort (reference surface: variation6's per-variant
  * statistics layer; tests follow Armitage 1955 / the standard 1-df
  * allelic contingency test as presented in Balding 2006, "A tutorial
  * on statistical methods for population association studies", Nat Rev
  * Genet 7:781).
  *
  * Both tests share the scale shape of every §2.3 kernel: map-only per
  * variant (sample-group projections through the one-pass allele-count
  * kernel / a single dosage transform, then integer contingency cells),
  * so a genome-wide screen is an embarrassingly parallel scan — no
  * shuffle at any cohort width. The contingency cells are emitted as
  * exact integer columns alongside the statistic: the counts are the
  * auditable part (and hash-stable across engines); the chi-square is
  * one float expression on top. */
object Assoc {

  /** Per-variant allelic 2×2 chi-square (1 df): allele counts over
    * CALLED samples (missing excluded) with a = case alt, b = case ref,
    * c = control alt, d = control ref and N = a+b+c+d:
    *
    *   chi2       = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *   odds_ratio = ad / bc
    *
    * `chi2` is NULL when any margin is 0 (a fully-missing group or a
    * monomorphic site carries no association information); `odds_ratio`
    * is NULL when bc = 0 (infinite / undefined OR — callers who want
    * the Haldane-Anscombe +½ correction can add it on the emitted
    * cells). Margin products are computed in doubles — a biobank cohort
    * (10⁶ samples) overflows int64 at (2n)⁴ — while the cells stay
    * exact integers. */
  def allelicTest(df: DataFrame, gtCol: String,
                  cases: Seq[Int], controls: Seq[Int]): DataFrame = {
    // counts arrays materialized ONCE per group (multiply-referenced
    // lambda HOFs re-evaluate at every reference — house rule)
    val base = df
      .withColumn("_cc", alleleCounts(selectSamples(col(gtCol), cases), lit(2)))
      .withColumn("_ct", alleleCounts(selectSamples(col(gtCol), controls), lit(2)))
      .withColumn("case_alt", element_at(col("_cc"), 2).cast("long"))
      .withColumn("case_ref", element_at(col("_cc"), 1).cast("long"))
      .withColumn("ctrl_alt", element_at(col("_ct"), 2).cast("long"))
      .withColumn("ctrl_ref", element_at(col("_ct"), 1).cast("long"))
    val a = col("case_alt"); val b = col("case_ref")
    val c = col("ctrl_alt"); val d = col("ctrl_ref")
    def dbl(x: Column) = x.cast("double")
    val n = a + b + c + d
    val det = dbl(a * d - b * c)
    val m = dbl(a + b) * dbl(c + d) * dbl(a + c) * dbl(b + d)
    base
      .withColumn("chi2",
        when((a + b) > 0 && (c + d) > 0 && (a + c) > 0 && (b + d) > 0,
          dbl(n) * det * det / m))
      .withColumn("odds_ratio",
        when(b * c > 0, dbl(a * d) / dbl(b * c)))
      .drop("_cc", "_ct")
  }

  /** Per-variant Cochran-Armitage trend test (1 df, additive weights
    * w = (0, 1, 2) over dosage classes): with r_g / s_g the CALLED
    * case / control sample counts at dosage g, R = Σr, S = Σs,
    * N = R + S, n_g = r_g + s_g, U = Σ w·r, W = Σ w·n:
    *
    *   T    = N·U − R·W
    *   chi2 = (N−1)·T² / (R·S·(N·Σw²n − W²))
    *
    * — the exact (hypergeometric-variance, N−1) form; NULL when either
    * group has no called samples or the variance term is 0 (site
    * monomorphic among called samples). The trend test is the standard
    * GWAS screen where allelic 2×2 is anti-conservative under
    * Hardy-Weinberg departure (Balding 2006 §genotype-based tests): it
    * conditions on genotype, not allele, counts. T and the variance
    * term stay exact in int64 up to ~10⁶-sample cohorts (T ≤ 2N²);
    * only the final ratio is float. */
  def trendTest(df: DataFrame, gtCol: String,
                cases: Seq[Int], controls: Seq[Int]): DataFrame = {
    val dosed = df.withColumn("_dos", transform(col(gtCol), s =>
      when(exists(s, a => a === -1), lit(-1))
        .otherwise(aggregate(s, lit(0), (acc, a) => acc + a))))
      .withColumn("_dc", selectSamples(col("_dos"), cases))
      .withColumn("_dt", selectSamples(col("_dos"), controls))
    def cnt(c: Column, g: Int) =
      size(filter(c, d => d === g)).cast("long")
    val base = dosed
      .withColumn("case_r0", cnt(col("_dc"), 0))
      .withColumn("case_r1", cnt(col("_dc"), 1))
      .withColumn("case_r2", cnt(col("_dc"), 2))
      .withColumn("ctrl_s0", cnt(col("_dt"), 0))
      .withColumn("ctrl_s1", cnt(col("_dt"), 1))
      .withColumn("ctrl_s2", cnt(col("_dt"), 2))
    val bigR = col("case_r0") + col("case_r1") + col("case_r2")
    val bigS = col("ctrl_s0") + col("ctrl_s1") + col("ctrl_s2")
    val n = bigR + bigS
    val n1 = col("case_r1") + col("ctrl_s1")
    val n2 = col("case_r2") + col("ctrl_s2")
    val u = col("case_r1") + lit(2L) * col("case_r2")
    val w = n1 + lit(2L) * n2
    val t = n * u - bigR * w
    val varTerm = n * (n1 + lit(4L) * n2) - w * w
    def dbl(x: Column) = x.cast("double")
    base
      .withColumn("chi2",
        when(bigR > 0 && bigS > 0 && varTerm > 0,
          dbl(n - 1) * dbl(t) * dbl(t) / (dbl(bigR) * dbl(bigS) * dbl(varTerm))))
      .drop("_dos", "_dc", "_dt")
  }
}
