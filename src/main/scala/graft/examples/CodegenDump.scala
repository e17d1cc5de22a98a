package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug helper: prints the whole-stage-generated Java for the mask +
  * filter pipeline fragment so custom-Expression codegen can be
  * eyeballed. Run: sbt "runMain graft.examples.CodegenDump". */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = ScaleDemo.synthVariants(spark, 100L, 4)
    val masked = graft.operators.Filters.maskByDepth(df, 5)
      .filter(graft.operators.Filters.byCallRate(0.8))
    import org.apache.spark.sql.execution.debug._
    masked.debugCodegen()
    spark.stop()
  }
}
