package graft.examples

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/r<N>/`. Bench session config (AQE on, shuffle partitions =
  * cores) so the captured shapes are the ones the bench times.
  *
  * Usage: runMain graft.examples.PlanDump <outDir> <tag> q_a q_b ...
  * writes <outDir>/<query>_<tag>.txt. Env: SPARK_GRAFT_SF_DIR (default
  * sf0.1), SPARK_GRAFT_CPUS. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      // capture the PRE-cut sub-plans too (r19 verdict #3/#5: an eager
      // checkpoint hides its upstream behind Scan ExistingRDD, so the
      // final-frame dump alone proves nothing for cut-based operators)
      spark.conf.set(graft.core.Checkpoints.DumpPlansConf,
        outDir.resolve(s"${q}_$tag").toString)
      val text =
        try graft.Queries.byName(q).build(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR building $q: ${e.getMessage}" }
      spark.conf.unset(graft.core.Checkpoints.DumpPlansConf)
      java.nio.file.Files.writeString(outDir.resolve(s"${q}_$tag.txt"), text)
      println(s"wrote ${q}_$tag.txt (${text.length} chars)")
    }
    spark.stop()
  }
}
