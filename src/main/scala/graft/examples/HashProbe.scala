package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextHash

/** Calibration probes for the remaining deterministic-hash families
  * (§7.11 #10 — the EvProbe pattern, motivated by what it caught: the
  * pv=1 LSH plane family looked fine until its statistical behavior
  * was measured at scale). Three families, three measured properties,
  * loose asserted bounds so a regression is loud:
  *
  *   1. FP (charHash64, the 64-bit exact-dup fingerprint): collision
  *      census over 10M distinct strings — birthday expectation at
  *      2^64 is ~0.0000027 collisions, so the assert is exactly zero
  *      (the retired mod-P roll failed precisely this census at
  *      corpus scale — r14's corpus-eating find);
  *   2. MINHASH (the (a_i·x + b_i) mod P rehash family): signature
  *      agreement rate must be an unbiased Jaccard estimator —
  *      construct 5,000 pairs per level at EXACT set overlaps
  *      (J ≈ 0.509 / 0.818 / 0.905), measure mean per-component
  *      agreement at k=32, assert |bias| < 0.02. A structured rehash
  *      family (the plane-family failure mode) would show here as a
  *      level-dependent bias;
  *   3. SIMHASH (bit-majority sketch): per-bit ones-rate over 100k
  *      unique docs must sit near 0.5 (a stuck bit halves the
  *      effective hamming space) and adjacent-bit correlation must be
  *      small (correlated bits overcount agreement) — asserted
  *      [0.44, 0.56] and |r| < 0.12.
  *
  * Probe-found artifact, kept as a measured warning: the FIRST draft
  * built docs from SEQUENTIAL numeric suffixes ("t7_0".."t7_29") and
  * simhash bit 0 came out stuck at ZERO on every doc — not a kernel
  * bug but corpus structure meeting the tie convention exactly:
  * consecutive digit characters alternate parity, so 30 consecutive
  * suffixes balance bit-0 votes to a PERMANENT tie (tie → 0), and
  * bit 1 shows a structured 0.25 ones-rate. This is the documented
  * poly-roll clustering caveat (sequential names — the
  * StoreMigrationDemo vocabulary note) surfacing in SimHash: real
  * text is hash-scattered, synthetic corpora must be too. The SAME
  * sequential corpus also biased the minhash agreement −0.016 at
  * every J level (which first read as linear-family small-set bias);
  * scrambled vocabulary removes it entirely (measured |bias| ≤ 0.002
  * — the rehash family IS an unbiased Jaccard estimator on scattered
  * inputs). The probe now uses scrambled vocabulary and ODD doc
  * length (no ties), which is also the honest calibration target.
  *
  * Run: sbt "runMain graft.examples.HashProbe". */
object HashProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("hash-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ── 1. FP collision census at 10M distinct strings ──
    val nFp = 10000000L
    val fp = spark.range(nFp)
      .select(TextHash.fingerprint(concat(lit("w"),
        xxhash64(col("id")).cast("string"), lit("_"), col("id").cast("string"))).as("f"))
    val distinctFp = fp.select(col("f")).distinct().count()
    require(distinctFp == nFp,
      s"FP collision census: $distinctFp distinct of $nFp — " +
        s"${nFp - distinctFp} collisions where ~0 expected at 2^64")
    println(f"HASH-PROBE fp: $nFp%,d distinct strings -> $distinctFp%,d " +
      "distinct 64-bit fingerprints (0 collisions; birthday expectation " +
      "2.7e-6)")

    // ── 2. minhash agreement ≡ Jaccard, three exact-overlap levels ──
    // pair p: A = tokens [s, s+40), B = tokens [s+40-m, s+80-m) of a
    // pair-private vocabulary -> |A∩B| = m exactly, J = m/(80-m)
    val nPairs = 5000L
    val k = 32
    // scrambled token names — token identity is (pair, absolute index),
    // the NAME is hash-scattered (see the simhash artifact note above)
    def toks(p: Column, from: Column, n: Int) = array_join(
      transform(sequence(lit(0), lit(n - 1)),
        i => concat(lit("t"), xxhash64(p, from + i).cast("string"))), " ")
    for (m <- Seq(27, 36, 38)) {
      val j = m.toDouble / (80 - m)
      val pairs = spark.range(nPairs).select(
        TextHash.minhashSignature(
          TextHash.wordHashes(toks(col("id"), lit(0), 40)), k).as("sa"),
        TextHash.minhashSignature(
          TextHash.wordHashes(toks(col("id"), lit(40 - m), 40)), k).as("sb"))
      val agree = pairs.select(
        (aggregate(zip_with(col("sa"), col("sb"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k).as("agr"))
        .agg(avg(col("agr"))).head().getDouble(0)
      require(math.abs(agree - j) < 0.02,
        f"minhash bias at J=$j%.3f: mean agreement $agree%.4f")
      println(f"HASH-PROBE minhash: exact J=$j%.3f -> mean k=$k agreement " +
        f"$agree%.4f over $nPairs%,d pairs (bias ${agree - j}%+.4f)")
    }

    // ── 3. SimHash bit balance + adjacent-bit correlation ──
    val nDocs = 100000L
    val bits = 16
    // 31 words: ODD, so bit votes cannot tie (the tie convention sends
    // ties to 0, which would shave the ones-rate to ~0.43 at n=30
    // even on a perfectly scattered corpus)
    val sims = spark.range(nDocs)
      .select(TextHash.simhash(TextHash.wordHashes(
        toks(col("id"), lit(0), 31)), bits).as("s"))
      .select((0 until bits).map(b =>
        (shiftright(col("s"), b) % 2).cast("double").as(s"b$b")): _*)
      .cache()
    val means = sims.agg(avg(col("b0")),
        (1 until bits).map(b => avg(col(s"b$b"))): _*)
      .head().toSeq.map(_.asInstanceOf[Double])
    means.zipWithIndex.foreach { case (mu, b) =>
      require(mu > 0.44 && mu < 0.56,
        f"simhash bit $b ones-rate $mu%.4f outside [0.44, 0.56]")
    }
    val corrs = (0 until bits - 1).map { b =>
      sims.agg(corr(col(s"b$b"), col(s"b${b + 1}"))).head().getDouble(0)
    }
    corrs.zipWithIndex.foreach { case (r, b) =>
      require(math.abs(r) < 0.12,
        f"simhash bits $b,${b + 1} correlation $r%.4f outside |r|<0.12")
    }
    sims.unpersist()
    println(f"HASH-PROBE simhash: $bits bits over $nDocs%,d docs — ones-rate " +
      f"range [${means.min}%.4f, ${means.max}%.4f], adjacent-bit |corr| max " +
      f"${corrs.map(math.abs).max}%.4f")
    spark.stop()
  }
}
