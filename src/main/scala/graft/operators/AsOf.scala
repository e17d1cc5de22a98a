package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.4: no native Spark operator) — for each left
  * row, attach the latest right row with right.ts < left.ts (strict) or
  * ≤ (non-strict) within the same key.
  *
  * Implementation is the sort-based union+window form, NOT a θ-join:
  * both sides are unioned with a side tag, one window pass per key in
  * event order carries the last-seen right timestamp forward. Cost is
  * one shuffle on the key + a per-key sort — O((|L|+|R|) log) — versus
  * the max-< join's O(|L|·|R_key|) intermediate, which explodes on keys
  * with long histories (exactly the hot users a 100 TB event log has).
  */
object AsOf {

  /** @param left      probe side (every row preserved)
    * @param right     reference side
    * @param key       join key column name present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param strict    true → right.ts strictly earlier than left.ts
    * @param outCol    name of the attached as-of timestamp column
    * @param maxGap    optional tolerance (pandas merge_asof style): the
    *                  match is nulled when `left.ts > asof + maxGap` —
    *                  pass any gap addable to the ts type (a numeric
    *                  delta, or `expr("INTERVAL 5 MINUTES")` for
    *                  timestamps); a stale quote is no quote
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      strict: Boolean = true,
      outCol: String = "asof_ts",
      maxGap: Option[Column] = None): DataFrame = {

    val leftCols = left.columns
    require(!leftCols.contains(outCol),
      s"joinAsOf: left already has a column named '$outCol' (outCol)")

    // Internal union-layout names must not collide with user columns —
    // a fixed "_k"/"_ts" would silently shadow same-named inputs.
    val taken = (leftCols ++ right.columns).toSet + outCol
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i").filterNot(taken).next()
    val (kC, tsC, sideC, rtsC, lpayC) =
      (fresh("_k"), fresh("_ts"), fresh("_side"), fresh("_rts"), fresh("_lpay"))

    val lpayType = org.apache.spark.sql.types.StructType(left.schema.fields)
    // union layout: key, ts, side (0 = right, 1 = left), right-ts payload,
    // left payload as a native struct (nullable on the right side)
    val r = right.select(
      col(key).as(kC), col(rightTs).as(tsC), lit(0).as(sideC),
      col(rightTs).as(rtsC), lit(null).cast(lpayType).as(lpayC))
    val l = left.select(
      col(key).as(kC), col(leftTs).as(tsC), lit(1).as(sideC),
      lit(null).cast(right.schema(rightTs).dataType).as(rtsC),
      struct(leftCols.map(col): _*).as(lpayC))

    // At equal timestamps: strict → the left row must NOT see the right
    // row, so left sorts first; non-strict → right sorts first.
    val sideOrder = if (strict) col(sideC).desc else col(sideC).asc
    val w = Window.partitionBy(col(kC))
      .orderBy(col(tsC), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = r.unionByName(l)
      .withColumn(outCol, last(col(rtsC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(leftCols.map(c => col(lpayC).getField(c).as(c)) :+ col(outCol): _*)
    maxGap.fold(joined)(g =>
      joined.withColumn(outCol, when(col(leftTs) <= col(outCol) + g, col(outCol))))
  }
}
