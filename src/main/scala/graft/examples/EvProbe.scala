package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DocPipeline, Similarity}

/** Embedding-LSH calibration matrix under the pv=2 mixed plane family —
  * the [[SvProbe]] twin for vectors (§7.11 #5): for each (bits, bands)
  * geometry, against one store of pseudo-random unit-scale vectors,
  * measure
  *
  *   - OCCUPANCY: candidates/vector a fresh (unrelated) probe batch
  *     generates — the per-batch verify cost the
  *     [[DocPipeline.adviseEmbeddingMigration]] budget prices (each
  *     candidate costs one O(dim) cosine at serve); and
  *   - BLOCKING RECALL: the fraction of planted near-duplicate probes
  *     (constructed at several cosine levels by perturbing stored
  *     vectors) that share ≥ 1 (band, bucket) with their source — a
  *     pair that shares no bucket is INVISIBLE to the dedup stream no
  *     matter the tau, so this column is the recall ceiling.
  *
  * The sign-LSH model says a single plane separates a pair at angle θ
  * with probability θ/π, so a full band matches with (1 − θ/π)^bits
  * and recall is the union over bands — bits sharpen (occupancy AND
  * per-band recall down), bands recover recall at linear candidate
  * cost. The matrix verifies the pv=2 family actually TRACKS that
  * model (the retired pv=1 family did not — bits bought almost
  * nothing; §7.10 4b) and gives the advise default (64/vec) empirical
  * footing. Mean realized cosine per perturbation level is printed —
  * the levels are constructed, not assumed.
  *
  * Run: sbt "runMain graft.examples.EvProbe [storeVecs]". */
object EvProbe {

  def main(args: Array[String]): Unit = {
    val nStore = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = 16
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def vecOf(id: Column, salt: Long) =
      transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64(id, i, lit(salt)), lit(2000L)) - 1000L).cast("double") / 1000.0)
          .cast("float"))
    val store = spark.range(nStore)
      .select(col("id").as("vec_id"), vecOf(col("id"), 0L).as("embedding"))
      .localCheckpoint()
    // planted probes: source vector + lambda * an independent vector —
    // lambda sets the cosine level (realized mean printed, not assumed)
    val nPlant = 500L
    val lambdas = Seq(0.05, 0.15, 0.30, 0.50)
    def planted(lambda: Double) = spark.range(nPlant)
      .select(col("id").as("src_id"),
        zip_with(vecOf(col("id"), 0L), vecOf(col("id"), 99L),
          (a, b) => a + lit(lambda).cast("float") * b).as("embedding"))
      .localCheckpoint()
    val plantedByLambda = lambdas.map(l => l -> planted(l)).toMap
    val meanCos = lambdas.map { l =>
      val src = store.select(col("vec_id").as("src_id"), col("embedding").as("_v"))
      l -> plantedByLambda(l).join(src, "src_id")
        .agg(avg(Similarity.cosine(col("embedding"), col("_v")))).head().getDouble(0)
    }.toMap
    println(lambdas.map(l => f"lambda=$l%.2f -> mean cos=${meanCos(l)}%.4f")
      .mkString("EV-PROBE levels: ", ", ", ""))

    val freshProbe = spark.range(7000000L, 7000500L)
      .select(col("id").as("vec_id"), vecOf(col("id"), 7L).as("embedding"))
      .localCheckpoint()

    for ((bits, bands) <- Seq((8, 2), (10, 2), (12, 2), (14, 2), (8, 4), (10, 4))) {
      def buckets(df: org.apache.spark.sql.DataFrame, idCol: String) =
        df.select(col(idCol), posexplode(array((0 until bands).map(bd =>
            Similarity.lshBucket(col("embedding"), dim, bits, bd * bits)): _*))
          .as(Seq("band", "bucket")))
      val storeKeys = buckets(store, "vec_id")
        .select(col("vec_id").as("src_id"), col("band"), col("bucket"))
        .localCheckpoint()
      // occupancy: the advise probe itself (per-shard in a sharded
      // deployment — same function)
      val occ = DocPipeline.adviseEmbeddingMigration(
        freshProbe, storeKeys.select(col("band"), col("bucket"),
          col("src_id").as("id"), lit(null).cast("array<float>").as("vec")),
        dim, bits = bits, bands = bands)
      // blocking recall per level: planted probe shares >= 1 bucket
      // with ITS OWN source (band AND bucket equal)
      val recalls = lambdas.map { l =>
        val pKeys = buckets(plantedByLambda(l)
          .select(col("src_id").as("vec_id"), col("embedding")), "vec_id")
          .select(col("vec_id").as("src_id"), col("band"), col("bucket"))
        val hit = pKeys.join(storeKeys, Seq("src_id", "band", "bucket"))
          .select(col("src_id")).distinct().count()
        l -> hit.toDouble / nPlant
      }
      println(f"EV-PROBE bits=$bits%2d bands=$bands%d " +
        f"cand/vec=${occ.candidatesPerDoc}%10.2f " +
        recalls.map { case (l, r) =>
          f"recall@${meanCos(l)}%.3f=$r%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
