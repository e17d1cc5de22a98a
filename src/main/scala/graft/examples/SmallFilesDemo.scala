package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{AppendStore, AtomicCommit}

/** Small-files growth rehearsal for the streaming dedup stores: a
  * long-lived stream appends a version per micro-batch, and before the
  * r15 file-count discipline each append landed one near-empty part
  * file per upstream shuffle partition — after N batches the store
  * READ pays listing + parquet-footer metadata for N × partitions
  * files, a cost that grows with TRAFFIC while the data grows with
  * content. This demo drives the same append loop under both shapes
  * (rowsPerFile = 1 reproduces the legacy per-partition file count;
  * the default collapses each batch to its measured size) and prints
  * store file counts, cold-read wall, and the post-compact state.
  * Timings comparable WITHIN one run only (shared box).
  * Run: sbt "runMain graft.examples.SmallFilesDemo [nAppends] [rowsPerBatch]". */
object SmallFilesDemo {

  def main(args: Array[String]): Unit = {
    val nAppends = args.headOption.map(_.toInt).getOrElse(150)
    val rowsPerBatch = args.drop(1).headOption.map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder()
      .appName("small-files-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def countFiles(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }

    def drive(label: String, rowsPerFile: Long): Unit = {
      val root = java.nio.file.Files.createTempDirectory("smallfiles")
        .resolve("store").toString
      ScaleDemo.time(s"$label: $nAppends appends x $rowsPerBatch rows") {
        var i = 0
        while (i < nAppends) {
          // a micro-batch-shaped frame: multi-partition, batch-sized —
          // what a streaming store append sees after the batch shuffles
          val batch = spark.range(i * rowsPerBatch, (i + 1) * rowsPerBatch)
            .repartition(16).select(md5(col("id").cast("string")).as("h"))
          AppendStore.append(batch, root, rowsPerFile = rowsPerFile)
          i += 1
        }
      }
      println(s"  store part files: ${countFiles(root)}")
      def emptyH = spark.range(0).select(lit("x").as("h"))
      ScaleDemo.time(s"$label: cold full read (count)") {
        println(s"  rows: ${AppendStore.readOr(spark, root, emptyH).count()}")
      }
      ScaleDemo.time(s"$label: anti-join probe vs the store (one batch shape)") {
        val probe = spark.range(0, rowsPerBatch)
          .select(md5(col("id").cast("string")).as("h"))
        println("  fresh rows: " + probe.join(
          AppendStore.readOr(spark, root, emptyH), Seq("h"), "left_anti").count())
      }
      ScaleDemo.time(s"$label: compact + vacuum") {
        AppendStore.compact(spark, root)
      }
      println(s"  post-compact part files: ${countFiles(root)}")
      ScaleDemo.time(s"$label: read after compact") {
        println(s"  rows: ${AppendStore.readOr(spark, root, emptyH).count()}")
      }
    }

    drive("LEGACY shape (rowsPerFile=1: per-partition files)", 1L)
    drive("SIZED (r15 default)", 512L * 1024)

    // the IVF twin: partitionBy(cell) multiplies the hazard — every
    // writer task opens a file in every cell dir it sees rows for, so
    // file count ≈ upstream partitions × cells; the rebalance-by-cell
    // write (Ivf.byCell) clusters rows first
    import graft.ext.Ivf
    val nVec = 200000
    val dim = 16
    val vecs = spark.range(nVec).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000L)) / lit(1000.0))
          .cast("float")): _*)
        .as("embedding")).repartition(32).localCheckpoint()
    val centroids = Ivf.train(vecs, "vec_id", "embedding", k = 256, iters = 2)
    val legacyDir = java.nio.file.Files.createTempDirectory("ivf-legacy")
      .resolve("index").toString
    val sizedDir = java.nio.file.Files.createTempDirectory("ivf-sized")
      .resolve("index").toString
    ScaleDemo.time(s"IVF LEGACY layout (32 partitions x 256 cells)") {
      Ivf.withCell(vecs, "embedding", centroids)
        .write.mode("overwrite").partitionBy("ivf_cell").parquet(legacyDir)
    }
    println(s"  part files: ${countFiles(legacyDir)}")
    ScaleDemo.time(s"IVF SIZED layout (rebalance-by-cell saveIndex)") {
      Ivf.saveIndex(vecs, "embedding", centroids, sizedDir)
    }
    println(s"  part files: ${countFiles(sizedDir)}")
    val probe = Array.tabulate(dim)(j => (j % 7).toDouble / 7)
    for ((label, dir) <- Seq("legacy" -> legacyDir, "sized" -> sizedDir)) {
      ScaleDemo.time(s"IVF probe topK over $label layout (nprobe=8)") {
        val idx = spark.read.parquet(dir)
        println("  rows: " + Ivf.topKIndexed(idx, "embedding", centroids,
          probe, k = 10, nprobe = 8).count())
      }
    }
    spark.stop()
  }
}
