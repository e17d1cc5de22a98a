package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistent tables — the co-located-join primitive for the
  * 100 TB path: two stores bucketed (and sorted) the same way on the
  * join key sort-merge-join with NO exchange on either side (the shuffle
  * happened once, at write time, and is amortized over every subsequent
  * join — ScaleOpsSpec asserts the exchange-free plan).
  *
  * Spark constraint: bucketed data must live in the session catalog
  * (`saveAsTable`); a bare-path bucketed write is unsupported. Pass
  * `path` to keep the files at an external location while the catalog
  * tracks the bucket metadata.
  */
object BucketedStore {

  /** Write `df` as catalog table `name`, bucketed into `buckets` by
    * `keys` and sorted within buckets by `sortCols` (defaults to the
    * bucket keys — the layout SortMergeJoin wants). */
  def save(
      df: DataFrame,
      name: String,
      keys: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    val sort = if (sortCols.isEmpty) keys else sortCols
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  def load(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
