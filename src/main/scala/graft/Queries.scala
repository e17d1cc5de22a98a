package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared query: Spark builder + (optional) DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY.md §2.6 / FIXTURES.md §B.3):
  *   - every query ends in a total-order ORDER BY covering ALL output
  *     columns (the generator's (l_orderkey, l_linenumber) is NOT unique,
  *     verified at all sf — tied rows must be identical rows);
  *   - float aggregates: exact-decimal sums (2-dec money → DECIMAL(18,2),
  *     4/6-dec products → DECIMAL(18,4/6)) cast back to DOUBLE, or
  *     ROUND(x,4) where the true value is provably far from a rounding
  *     boundary; both engines then produce bit-identical doubles;
  *   - timestamps are never emitted raw (parquet ns vs µs): always
  *     date_trunc + format to 'yyyy-MM-dd HH:mm:ss' strings;
  *   - explicit NULLS FIRST on every nullable sort key (Spark default is
  *     NULLS FIRST, DuckDB's is NULLS LAST);
  *   - counts/ints cast to BIGINT on both engines.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as a long and truncate ns→µs with
    * exact integer division (double division would lose sub-µs bits at
    * 2024-epoch magnitudes). DuckDB keeps ns — all declared queries only
    * compare/emit at ≥second granularity or strict inequalities, where the
    * sub-µs difference is immaterial. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact money sum: 2-decimal doubles → DECIMAL(18,2) → exact sum → DOUBLE. */
  private def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a product that is a true k-decimal value. */
  private def decSum(c: Column, scale: Int): Column = sum(c.cast(DecimalType(18, scale))).cast("double")

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  // shared inputs for the set-operation queries (defined before `all` —
  // the oracle strings interpolate them at initialization time):
  // A = orderkeys of 'F'-status orders, B = orderkeys with any quantity>49 line
  private def setOpInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("okey")).distinct()
    val b = t(s, d, "lineitem").filter(col("l_quantity") > 49)
      .select(col("l_orderkey").as("okey")).distinct()
    (a, b)
  }
  private val setA = "SELECT DISTINCT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'"
  private val setB = "SELECT DISTINCT l_orderkey AS okey FROM lineitem WHERE l_quantity > 49"

  val all: Vector[QueryDef] = Vector(
    // ── 1. scan + projection ────────────────────────────────────────────
    QueryDef(
      "q_scan_project",
      (s, d) =>
        t(s, d, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("net"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber,
             |round(l_extendedprice * (1 - l_discount), 4) AS net
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, net LIMIT 100""".stripMargin)),

    // ── 2. filter / predicates ──────────────────────────────────────────
    QueryDef(
      "q_filter_predicate",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(
            col("l_quantity") > 30 && col("l_returnflag") === "R" &&
              col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_quantity > 30 AND l_returnflag = 'R'
             |AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ── 3. rate aggregation (call-rate analog) ─────────────────────────
    QueryDef(
      "q_filter_rate",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(avg(when(col("l_discount") > 0.05, 1.0).otherwise(0.0)), 4).as("rate"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |round(avg(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END), 4) AS rate
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── 4. conditional rewrite + count partition (depth→missing analog) ─
    QueryDef(
      "q_mask_update",
      (s, d) =>
        t(s, d, "lineitem")
          .withColumn("dm", when(col("l_discount") < 0.02, -1.0).otherwise(col("l_discount")))
          .groupBy(col("l_returnflag"))
          .agg(
            count(when(col("dm") === -1.0, 1)).as("n_masked"),
            count(when(col("dm") =!= -1.0, 1)).as("n_kept"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |CAST(count(*) FILTER (WHERE dm = -1.0) AS BIGINT) AS n_masked,
             |CAST(count(*) FILTER (WHERE dm <> -1.0) AS BIGINT) AS n_kept
             |FROM (SELECT l_returnflag,
             |  CASE WHEN l_discount < 0.02 THEN -1.0 ELSE l_discount END AS dm
             |  FROM lineitem)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── 5. projection to a subset (keep-samples analog) ────────────────
    QueryDef(
      "q_project_subset",
      (s, d) =>
        t(s, d, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
             |ORDER BY c_custkey, c_mktsegment""".stripMargin)),

    // ── 6. hash aggregation (TPC-H Q1 flagship) ────────────────────────
    QueryDef(
      "q_agg_hash",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base"),
            decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity), 4) AS sum_qty,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
             |round(avg(l_quantity), 4) AS avg_qty,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── 7. distinct aggregation ────────────────────────────────────────
    QueryDef(
      "q_agg_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nparts"),
            countDistinct(col("l_suppkey")).as("nsupps"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |CAST(count(DISTINCT l_partkey) AS BIGINT) AS nparts,
             |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nsupps
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── 8. rollup ──────────────────────────────────────────────────────
    QueryDef(
      "q_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("cnt"),
            round(sum(col("l_quantity")), 4).as("sum_qty"))
          .orderBy(
            col("gid"),
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |CAST(count(*) AS BIGINT) AS cnt,
             |round(sum(l_quantity), 4) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ── 9. cube ────────────────────────────────────────────────────────
    QueryDef(
      "q_cube",
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"))
          .orderBy(
            col("gid"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // ── 10. broadcast equi-join ────────────────────────────────────────
    QueryDef(
      "q_join_broadcast",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part").filter(col("p_brand") === "Brand#23")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_net"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand,
             |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_net
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand = 'Brand#23'
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ── 11. multi-way shuffle join ─────────────────────────────────────
    QueryDef(
      "q_join_shuffle",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // ── 12. semi join ──────────────────────────────────────────────────
    QueryDef(
      "q_join_semi",
      (s, d) => {
        val o = t(s, d, "orders")
        val li = t(s, d, "lineitem").filter(col("l_quantity") > 45)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .select(col("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |ORDER BY o_orderkey""".stripMargin)),

    // ── 13. anti join ──────────────────────────────────────────────────
    QueryDef(
      "q_join_anti",
      (s, d) => {
        val c = t(s, d, "customer")
        // "no URGENT orders" rather than "no orders" — every customer has
        // orders in this generator, which would make the anti join vacuous
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ── 14. equi-join + range residual ─────────────────────────────────
    QueryDef(
      "q_join_range",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey") && li("l_shipdate") >= o("o_orderdate"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem JOIN orders
             |ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── 15. as-of join (max-< emulation) ───────────────────────────────
    QueryDef(
      "q_join_asof",
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        val sg = ev.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
        p.join(sg, col("p_user") === col("s_user") && col("s_ts") < col("p_ts"), "left")
          .groupBy(col("event_id"))
          .agg(fmtTs(date_trunc("second", max(col("s_ts")))).as("asof_ts"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id,
             |strftime(date_trunc('second', max(s.ts)), '%Y-%m-%d %H:%M:%S') AS asof_ts
             |FROM events p LEFT JOIN events s
             |ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts < p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    // ── 16. ranking window ─────────────────────────────────────────────
    QueryDef(
      "q_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |SELECT o_custkey, o_orderkey,
             |CAST(row_number() OVER (PARTITION BY o_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             |FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn, o_orderkey""".stripMargin)),

    // ── 17. analytic window (lag) ──────────────────────────────────────
    QueryDef(
      "q_window_analytic",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .select(col("event_id"), col("prev_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── 18. window frame (moving sum; events has unique event_id) ──────
    QueryDef(
      "q_window_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-2, 0)
        events(s, d)
          .withColumn("msum", round(sum(col("value")).over(w), 4))
          .select(col("event_id"), col("msum"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS msum
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── 19. global top-k ───────────────────────────────────────────────
    QueryDef(
      "q_sort_limit_topk",
      (s, d) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin)),

    // ── 20-22. set operations ──────────────────────────────────────────
    QueryDef(
      "q_set_union",
      (s, d) => setOpInputs(s, d) match {
        case (a, b) => a.union(b).distinct().orderBy(col("okey"))
      },
      Some(s"""$setA UNION $setB ORDER BY okey""")),
    QueryDef(
      "q_set_intersect",
      (s, d) => setOpInputs(s, d) match {
        case (a, b) => a.intersect(b).orderBy(col("okey"))
      },
      Some(s"""$setA INTERSECT $setB ORDER BY okey""")),
    QueryDef(
      "q_set_except",
      (s, d) => setOpInputs(s, d) match {
        case (a, b) => a.except(b).orderBy(col("okey"))
      },
      Some(s"""$setA EXCEPT $setB ORDER BY okey""")),

    // ── 23. string functions ───────────────────────────────────────────
    QueryDef(
      "q_string_funcs",
      (s, d) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 10)).as("up10"),
            length(col("p_name")).cast("long").as("name_len"),
            col("p_name").like("%green%").as("has_green"),
            element_at(split(col("p_name"), " "), 1).as("first_word"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(substr(p_name, 1, 10)) AS up10,
             |CAST(length(p_name) AS BIGINT) AS name_len,
             |p_name LIKE '%green%' AS has_green,
             |string_split(p_name, ' ')[1] AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── 24. date functions ─────────────────────────────────────────────
    QueryDef(
      "q_date_funcs",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mon"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"),
            datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
              .cast("long").as("days_to"))
          .orderBy(col("o_orderkey"))
          .limit(200),
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS BIGINT) AS yr,
             |CAST(month(o_orderdate) AS BIGINT) AS mon,
             |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
             |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to
             |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin)),

    // ── 25. math functions ─────────────────────────────────────────────
    QueryDef(
      "q_math_funcs",
      (s, d) =>
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            round(abs(col("c_acctbal")), 2).as("ab"),
            round(sqrt(abs(col("c_acctbal"))), 4).as("sq"),
            round(log(abs(col("c_acctbal")) + 1), 4).as("lg"),
            round(col("c_acctbal") * col("c_acctbal"), 4).as("p2"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, round(abs(c_acctbal), 2) AS ab,
             |round(sqrt(abs(c_acctbal)), 4) AS sq,
             |round(ln(abs(c_acctbal) + 1), 4) AS lg,
             |round(c_acctbal * c_acctbal, 4) AS p2
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ── 26. array functions ────────────────────────────────────────────
    QueryDef(
      "q_array_funcs",
      (s, d) =>
        t(s, d, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
            round(
              aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")),
              4).as("esum"))
          .orderBy(col("vec_id"))
          .limit(100),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             |round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
             |round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS esum
             |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin)),

    // ── 27. json functions ─────────────────────────────────────────────
    QueryDef(
      "q_json_funcs",
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"))
          .agg(round(avg(get_json_object(col("props"), "$.k").cast("int")), 4).as("k_avg"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |round(avg(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER)), 4) AS k_avg
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── 28. explode / generator ────────────────────────────────────────
    QueryDef(
      "q_explode",
      (s, d) =>
        t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20),
      Some("""SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM
             |(SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin)),

    // ── 29. deterministic dedup ────────────────────────────────────────
    QueryDef(
      "q_dedup",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(min(col("doc_id")).as("first_doc"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, min(doc_id) AS first_doc
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // ── 30. groupwise ratio (MAF analog) ───────────────────────────────
    QueryDef(
      "q_groupwise_ratio",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("o_orderpriority"))
          .agg(round(max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"), 4)
            .as("max_ratio"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 4) AS max_ratio
             |FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
             |  FROM orders GROUP BY o_orderpriority, o_orderstatus)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── 31. histogram (fixed bins) ─────────────────────────────────────
    QueryDef(
      "q_histogram",
      (s, d) =>
        t(s, d, "orders")
          .select(least(floor(col("o_totalprice") / 50000), lit(9)).cast("long").as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("bin")),
      Some("""SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM orders GROUP BY bin ORDER BY bin""".stripMargin)),

    // ── 32. similarity top-k (brute-force cosine/dot baseline) ─────────
    QueryDef(
      "q_similarity_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("p_emb"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            round(
              aggregate(
                zip_with(col("embedding"), col("p_emb"),
                  (x, y) => x.cast("double") * y.cast("double")),
                lit(0.0), (acc, v) => acc + v),
              4).as("dot"))
          .orderBy(col("dot").desc, col("vec_id"))
          .limit(5)
      },
      Some("""SELECT v.vec_id,
             |round(list_sum(list_transform(range(1, len(v.embedding) + 1),
             |  i -> CAST(v.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE))), 4) AS dot
             |FROM embeddings v,
             |(SELECT embedding FROM embeddings WHERE vec_id = 0) p
             |WHERE v.vec_id <> 0
             |ORDER BY dot DESC, v.vec_id LIMIT 5""".stripMargin)),

    // ── 33. text stats ─────────────────────────────────────────────────
    QueryDef(
      "q_text_stats",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("cnt"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy(col("lang")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
             |round(avg(n_chars), 4) AS avg_chars,
             |CAST(count(DISTINCT source) AS BIGINT) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── 34. sessionization (gap > 30 min) ──────────────────────────────
    QueryDef(
      "q_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn(
            "new_sess",
            when(
              col("prev_ts").isNull ||
                (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L,
              1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).as("n_sessions"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(sum(CASE WHEN prev_ts IS NULL
             |  OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
             |FROM (SELECT user_id, ts, event_id,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── 35. tumbling window aggregation (batch form) ───────────────────
    QueryDef(
      "q_stream_tumbling",
      (s, d) =>
        events(s, d)
          .groupBy(
            fmtTs(date_trunc("hour", col("ts"))).as("hr"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
          .orderBy(col("hr"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
             |event_type, CAST(count(*) AS BIGINT) AS cnt,
             |round(sum(value), 4) AS sum_value
             |FROM events GROUP BY hr, event_type ORDER BY hr, event_type""".stripMargin))
  )

  val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
