package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl curation — ranking a web corpus's
  * pages by link structure is the classic crawl-prioritization /
  * quality-prior signal (PageRank; Page et al. 1999, "The PageRank
  * citation ranking", Stanford InfoLab — public report).
  *
  * House determinism contract: ranks live in int64 MICRO-UNITS (10⁹
  * per node of initial mass) and every per-iteration update is integer
  * arithmetic — floor-divided edge contributions, floor-divided
  * dangling redistribution, floor-divided damping — so partial-sum
  * order can't perturb a single bit and the result is replicable from
  * first principles in any engine (the q_pagerank oracle unrolls the
  * same iterations in DuckDB). Total mass decays by < N units per
  * iteration to the floors (documented, irrelevant at 10⁹ scale);
  * ranks are comparable within a run, not probabilities. */
object Graph {

  /** Integer-exact damped PageRank over an edge list, `iters` fixed
    * iterations (the standard fixed-budget formulation for batch
    * ranking — convergence checks cost a driver action per round and
    * batch pipelines want deterministic plans):
    *
    *   rank⁰(u)   = 10⁹
    *   contrib(e) = rank(src) div outdeg(src)          per edge
    *   share      = (Σ_{outdeg=0} rank) div N          dangling mass
    *   rankᵏ⁺¹(v) = (100−d)·10⁷ + ((Σ_in contrib + share)·d) div 100
    *
    * with `d = dampingPct` (default 85). All divisions are floor on
    * non-negatives — Spark's `div` and DuckDB's `//` agree exactly.
    *
    * Scale shape: per iteration ONE src-keyed equi-join (ranks onto
    * edges — the rank table is the small, N-row side; edges stay put)
    * and ONE dst-keyed partial+final integer sum; the dangling pool is
    * a scalar aggregate. Ranks `localCheckpoint` each round (the
    * iterative-plan house pattern — [[Dedup.transitiveClusters]]), so
    * the lineage stays one round deep. Self-loops and parallel edges
    * are honored as given; callers dedup upstream if unwanted. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val n = nodes.count()
    val teleport = (100L - dampingPct) * 10000000L
    var ranks = nodes.withColumn("rk", lit(1000000000L))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(deg, ranks("node") === deg("src"), "left")
      // dangling share stays IN the plan as a 1-row broadcast (a driver
      // action per round would double the iteration's job count)
      val share = withDeg.filter(col("d").isNull)
        .agg(expr(s"coalesce(sum(rk), 0L) div ${n}L").as("_share"))
      val in = withDeg.filter(col("d").isNotNull)
        .select(col("node"), expr("rk div d").as("c"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = ranks.join(in, ranks("node") === in("dst"), "left")
        .crossJoin(broadcast(share))
        .select(col("node"),
          (lit(teleport) +
            expr(s"(coalesce(m, 0L) + _share) * $dampingPct div 100")
          ).as("rk"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Integer-exact HITS hubs & authorities (Kleinberg 1999,
    * "Authoritative sources in a hyperlinked environment", JACM 46:5),
    * `iters` fixed iterations of the mutual recursion with MAX
    * rescaling in place of the float L2 norm:
    *
    *   auth'(v) = Σ_{u→v} hub(u)            then ·10⁶ div max(auth')
    *   hub'(u)  = Σ_{u→v} auth''(v)         then ·10⁶ div max(hub')
    *
    * Scores start at 10⁶ and stay in [0, 10⁶] micro-units after each
    * rescale — relative ranking is what HITS is for, and the integer
    * max-norm keeps every bit engine-replicable where an L2 norm
    * would compound float error. Nodes with no in-edges (resp.
    * out-edges) hold authority (resp. hub) 0. Intermediate sums are
    * ≤ N·10⁶ and the rescale product ≤ N·10¹² — int64-safe to
    * N ≈ 10⁶ nodes per connected region of the score mass; shard
    * wider graphs by component first.
    *
    * Scale shape per iteration: two edge-keyed integer sums + two
    * 1-row max broadcasts ([[pageRank]]'s in-plan scalar pattern),
    * `localCheckpoint` lineage cuts. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var scores = nodes
      .withColumn("hub", lit(1000000L))
      .withColumn("auth", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val aRaw = scores.join(e, scores("node") === e("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("_a"))
      val aMax = aRaw.agg(coalesce(max(col("_a")), lit(1L)).as("_am"))
      val withA = scores.select(col("node"), col("hub"))
        .join(aRaw, scores("node") === aRaw("dst"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("node"), col("hub"),
          expr("coalesce(_a, 0L) * 1000000L div _am").as("auth"))
        .localCheckpoint(true)
      val hRaw = withA.select(col("node").as("_v"), col("auth"))
        .join(e, col("_v") === e("dst"))
        .groupBy(col("src")).agg(sum(col("auth")).as("_h"))
      val hMax = hRaw.agg(coalesce(max(col("_h")), lit(1L)).as("_hm"))
      scores = withA.select(col("node"), col("auth"))
        .join(hRaw, withA("node") === hRaw("src"), "left")
        .crossJoin(broadcast(hMax))
        .select(col("node"),
          expr("coalesce(_h, 0L) * 1000000L div _hm").as("hub"),
          col("auth"))
        .localCheckpoint(true)
    }
    scores
  }
}
