package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE trainer engine shootout — the measurement behind
  * [[Bpe.trainAuto]]'s default: the distributed merge loop pays one
  * Spark round PER MERGE on state that never exceeds a few MB (the
  * (word, freq) vocabulary is corpus-size-independent after the single
  * corpus pass), so at production merge counts the scheduler
  * round-trips dominate; [[Bpe.trainLocal]] runs the same loop
  * driver-side with incremental pair counts and an inverted
  * pair→words index. Identical merges by construction (BpeSpec pins
  * the differential); this demo prints the wall-clock gap and asserts
  * the parity once more at full scale.
  *
  * Run: sbt "runMain graft.examples.BpeTrainDemo [nDocs] [nMerges]"
  */
object BpeTrainDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(400000L)
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder()
      .appName("bpe-train-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~60k distinct letter-words (hash-bucketed), 20 per doc — the
    // vocabulary is the training state, the corpus just weights it
    val word = (h: org.apache.spark.sql.Column) => concat(
      (0 until 4).map(i => chr(pmod(h * (2 * i + 3), lit(26L)) + lit(97))): _*)
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(20)),
          w => word(abs(xxhash64(col("id"), w)) % 60000L)), " ").as("text"))
      .localCheckpoint()
    ScaleDemo.time(s"generate ${nDocs / 1000}k docs")(docs.count())

    var local: Seq[(String, String)] = null
    ScaleDemo.time(s"trainLocal ($nMerges merges, driver incremental)") {
      local = Bpe.trainLocal(docs, "text", nMerges)
    }
    var dist: Seq[(String, String)] = null
    ScaleDemo.time(s"train ($nMerges merges, one Spark round each)") {
      dist = Bpe.train(docs, "text", nMerges)
    }
    require(local == dist,
      s"engine divergence: ${local.zip(dist).indexWhere(p => p._1 != p._2)}")
    println(s"BPE-TRAIN parity holds over $nMerges merges")
    spark.stop()
  }
}
