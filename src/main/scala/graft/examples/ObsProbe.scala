package graft.examples
import org.apache.spark.sql.{Observation}
import org.apache.spark.sql.functions._
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val df = spark.range(1000).observe(obs, count(lit(1)).as("n"), sum(col("id")).as("s"))
    val cp = df.localCheckpoint(true)
    println("OBS filled: " + obs.getAsJava)
    println("rows=" + cp.count())
    spark.stop()
  }
}
