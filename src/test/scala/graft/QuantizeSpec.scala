package graft

import org.apache.spark.sql.functions._
import graft.ext.{Quantize, Similarity}

/** int8 quantization + random projection (round 6). q_quantize /
  * q_rand_proj prove the arithmetic cross-engine; these pin the
  * numeric CONTRACTS: reconstruction error bound, ranking fidelity of
  * quantized dot products, and plane-family consistency with the LSH
  * bucketer. */
class QuantizeSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 16

  /** Deterministic synthetic vectors, values in [-1, 1). */
  private def vecs(n: Int) =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => ((i * 131 + j * 17) % 97) / 48.5 - 1.0).toArray)
    }.toDF("vec_id", "vec")

  test("quantizeInt8: |q| <= 127, dequantize error <= scale/2 per element") {
    val q = Quantize.quantizeInt8(vecs(50), "vec", "qc")
      .withColumn("deq", Quantize.dequantize(col("qc")))
      .select(col("vec"), col("qc.scale"), col("qc.q"), col("deq"))
      .as[(Array[Double], Double, Array[Long], Array[Double])].collect()
    q.foreach { case (v, scale, ql, deq) =>
      assert(ql.forall(x => math.abs(x) <= 127))
      v.zip(deq).foreach { case (orig, rec) =>
        assert(math.abs(orig - rec) <= scale / 2 + 1e-12,
          s"reconstruction error ${math.abs(orig - rec)} > scale/2 = ${scale / 2}")
      }
    }
  }

  test("quantizeInt8: zero vector quantizes to scale 0, all-zero q (no NaN)") {
    val z = Seq((0L, Array.fill(dim)(0.0))).toDF("vec_id", "vec")
    val (scale, ql) = Quantize.quantizeInt8(z, "vec", "qc")
      .select(col("qc.scale"), col("qc.q")).as[(Double, Array[Long])].head()
    assert(scale === 0.0 && ql.forall(_ === 0L))
  }

  test("quantized dot preserves the exact top-k of 50 probes (planted corpus)") {
    val corpus = Quantize.quantizeInt8(vecs(200), "vec", "qc").localCheckpoint(true)
    val exact = corpus.as("a").crossJoin(corpus.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id") =!= 0)
      .select(col("b.vec_id").as("id"),
        Similarity.dot(col("a.vec"), col("b.vec")).as("s"))
      .orderBy(col("s").desc, col("id")).limit(5)
      .select("id").as[Long].collect().toSet
    val quant = corpus.as("a").crossJoin(corpus.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id") =!= 0)
      .select(col("b.vec_id").as("id"),
        Quantize.dotQ(col("a.qc"), col("b.qc")).as("s"))
      .orderBy(col("s").desc, col("id")).limit(5)
      .select("id").as[Long].collect().toSet
    // int8 on 16-dim [-1,1) vectors: quantized ranking recalls >= 4/5
    assert((exact & quant).size >= 4, s"exact=$exact quant=$quant")
  }

  test("fused DotQExpr ≡ HOF fold on byte×long, long×long, ragged, negative codes") {
    val corpus = Quantize.quantizeInt8(vecs(100), "vec", "qc")
      .select(col("vec_id"), col("qc.scale").as("s"),
        col("qc.q").as("ql"),
        transform(col("qc.q"), x => x.cast("byte")).as("qb"))
      .localCheckpoint(true)
    val probe = corpus.filter(col("vec_id") === 0)
      .select(col("ql").as("pq"), col("s").as("ps")).crossJoin(corpus)
    val rows = probe.select(
      Quantize.dotQParts(col("qb"), col("s"), col("pq"), col("ps")).as("fusedB"),
      Quantize.dotQParts(col("ql"), col("s"), col("pq"), col("ps")).as("fusedL"),
      Quantize.dotQPartsHof(col("ql"), col("s"), col("pq"), col("ps")).as("hof"))
      .collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(2), "byte-typed fused != HOF")
      assert(r.getDouble(1) === r.getDouble(2), "long-typed fused != HOF")
    }
    // codegen actually compiled (no silent fallback)
    import org.apache.spark.sql.execution.debug._
    val plan = codegenString(probe.select(
      Quantize.dotQParts(col("qb"), col("s"), col("pq"), col("ps"))).queryExecution.executedPlan)
    assert(!plan.contains("maxMethodCodeSize:-1"), "dotq codegen subtree failed to compile")
  }

  test("randomProject component signs reproduce lshBucketHof bits (same plane family)") {
    val d = vecs(30)
      .withColumn("p", Similarity.randomProject(col("vec"), dim, 4))
      .withColumn("bucket", Similarity.lshBucketHof(col("vec"), dim, bits = 4))
    val rows = d.select(col("p"), col("bucket")).as[(Array[Double], Long)].collect()
    rows.foreach { case (p, bucket) =>
      val fromProj = p.zipWithIndex.map { case (x, j) => if (x > 0) 1L << j else 0L }.sum
      assert(fromProj === bucket)
    }
  }
}
