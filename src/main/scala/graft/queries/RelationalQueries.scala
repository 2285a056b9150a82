package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.filter.FilterAst
import graft.filter.FilterAst._
import graft.functions.{TextFunctions => T}
import graft.model.Schemas

/**
 * Relational operator inventory (SURVEY.md §2.2, §2.4–§2.8) exercised over the
 * driver testdata, each with a DuckDB oracle.
 *
 * Determinism rules shared by every query here:
 *  - money math goes through exact DECIMAL casts (inputs are 2-dp),
 *  - every output has a total ORDER BY,
 *  - derived doubles are exact integer ratios or are rounded at a precision
 *    far above the float-error floor.
 */
object RelationalQueries {
  import Tables.t

  private val D = DecimalType(12, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 aggregation with decimal-exact sums (pushdown-friendly scan agg).
    // Money emitted as BIGINT cents (revenue at 1e-4 scale): decimal math is
    // exact internally, but DECIMAL output renders differently across engines.
    "q_agg_sums" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("l_quantity").cast(D)) * 100).cast("long").as("sum_qty_cents"),
          (sum(col("l_extendedprice").cast(D)) * 100).cast("long").as("sum_price_cents"),
          (sum(col("l_extendedprice").cast(D) *
            (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))))
            * 10000).cast("long").as("revenue_e4"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.2 metadata filter algebra: AST -> Column, nested AND/OR.
    "q_metadata_filter" -> ((s, dir) => {
      val f = Or.of(
        And.of(Pred("o_orderstatus", Eq, "O"), Pred("o_totalprice", Gt, 200000.0)),
        And.of(Pred("o_orderpriority", StartsWith, "1"),
          Pred("o_totalprice", Lte, 50000.0)))
      t(s, dir, "orders")
        .filter(FilterAst.compile(f))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.4 multi-hop join chain region->nation->customer->orders + agg.
    "q_join_chain" -> ((s, dir) => {
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast(D)) * 100).cast("long").as("total_cents"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // §4/ext. skew-resilient salted join: result must equal the plain
    // shuffle join row-for-row — the salt only scatters the hot key's rows
    // across tasks (ops.Skew.saltedJoin; big side lineitem, small side
    // orders projected to the join key's name).
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      val ord = t(s, dir, "orders").select(
        col("o_orderkey").as("l_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      graft.ops.Skew.saltedJoin(li, ord, "l_orderkey", 8)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))
    }),

    // §2.4 semi-join (id-set probe, as in `WHERE id IN $list`).
    "q_semi_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // §2.4/§2.7 anti-join (exclusion sets / visited frontiers).
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // extended: Bloom-pre-filtered anti-join — content-keyed decontamination
    // (drop every corpus doc whose normalized-text hash appears in the
    // exclusion set). The Bloom sketch routes definite-clean rows around
    // the shuffle; the exact anti-join runs only on might-contain
    // candidates, so the result is EXACTLY the plain NOT EXISTS.
    "q_bloom_anti_join" -> ((s, dir) => {
      val keyed = t(s, dir, "documents")
        .select(col("doc_id"), md5(T.searchStr(col("text"))).as("key"))
      val excl = keyed.filter(col("doc_id") % 7 === 0)
        .select(col("key").as("excl_key"))
      graft.ops.Joins.bloomAntiJoin(keyed, "key", excl, "excl_key",
        expectedItems = 10000)
        .orderBy(col("doc_id"))
    }),

    // §2.6 per-group top-n (TruncateStatements semantics).
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // §2.6 top-k per key, scale path: the same rows as a window rank but as
    // a heap-bounded hash aggregate (graft.functions.TopKAgg /
    // CollectTopK) — sort-free on both sides of the shuffle, where the
    // window plan sorts its full input map-side and re-sorts post-shuffle
    // (both pre-reduce to k rows/key/partition on Spark 4). The window
    // twin above (q_window_topn) stays as the §2.6 window-inventory gate.
    // (l_orderkey, l_linenumber) is not unique, so the sort key adds
    // partkey + price to stay total (same rule as q_window_lag_chain).
    "q_topk_per_key" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
      graft.functions.TopKAgg.topKPerKeyRanked(li, Seq("l_orderkey"),
        Seq(negate(col("l_extendedprice")), col("l_linenumber"),
          col("l_partkey")), 2, "rk")
        .orderBy(col("l_orderkey"), col("rk"))
    }),

    // §2.6 lag/lead linked-list construction (statement/chunk PREVIOUS/NEXT).
    // (l_orderkey, l_linenumber) is not unique in the data, so the window
    // order includes partkey + price to stay total.
    "q_window_lag_chain" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
        .withColumn("prev_part", lag(col("l_partkey"), 1).over(w))
        .withColumn("next_part", lead(col("l_partkey"), 1).over(w))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
    }),

    // §2.6 running-total budget truncation (TruncateByTokens semantics).
    "q_cumsum_budget" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"), col("l_quantity"))
        .withColumn("running_cents",
          (sum(col("l_quantity").cast(D)).over(w) * 100).cast("long"))
        .filter(col("running_cents") <= 10000)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
    }),

    // §2.5 nested collect (collect(distinct ...) -> sorted csv for stability).
    "q_nested_collect" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          concat_ws(",", transform(array_sort(collect_list(col("o_orderkey"))),
            x => x.cast("string"))).as("order_keys"))
        .orderBy(col("o_custkey"))
    }),

    // §2.6 threshold pruning vs per-group max (PruneStatements semantics).
    "q_prune_threshold" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .withColumn("max_price", max(col("l_extendedprice")).over(w))
        .filter(col("l_extendedprice") >= col("max_price") * 0.9)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.5 dedup-upsert (MERGE semantics): canonical row per natural key.
    "q_dedup_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), Tables.epochMs(col("o_orderdate")).as("order_date_ms"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("order_date_ms"))
    }),

    // §2.8 SCD-2 interval construction (VersionManager.close_intervals).
    "q_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          Tables.epochMs(col("o_orderdate")).as("valid_from"))
        .withColumn("valid_to",
          coalesce(lead(col("valid_from"), 1).over(w),
            lit(Schemas.TimestampUpperBound)))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // §2.8 as-of snapshot over the SCD-2 intervals.
    "q_asof_snapshot" -> ((s, dir) => {
      val asOfMs = 896659200000L // 1998-06-01T00:00:00Z
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          Tables.epochMs(col("o_orderdate")).as("valid_from"))
        .withColumn("valid_to",
          coalesce(lead(col("valid_from"), 1).over(w),
            lit(Schemas.TimestampUpperBound)))
        .filter(FilterAst.asOf(asOfMs))
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy(col("o_custkey"))
    }),

    // §2.7 set ops: union + distinct across two sources.
    "q_union_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    }),

    // §2.5 central materialization join + two-level nested aggregation:
    // statements(lineitems) -> topics(orders) -> sources(customers),
    // score = sum over topics of n_statements / n_chunks(parts).
    "q_central_materialization" -> ((s, dir) => {
      val perOrder = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("n_chunks"),
          count(lit(1)).as("n_statements"))
      val perCustomer = t(s, dir, "orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_topics"),
          sum(col("n_statements")).as("n_items"),
          round(sum(col("n_statements").cast("double") / col("n_chunks")), 6)
            .as("score"))
      perCustomer
        .orderBy(desc("score"), col("o_custkey"))
        .limit(10)
    }),

    // §2.5 graph summary: per-class sorted value listing.
    "q_graph_summary" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_type"))
        .agg(
          countDistinct(col("p_brand")).as("n_brands"),
          concat_ws(",", array_sort(collect_set(col("p_brand")))).as("brands"))
        .orderBy(col("p_type"))
    }),

    // §2.10 streaming-shaped windowed aggregation (tumbling day windows) —
    // same plan Structured Streaming produces for the events stream.
    // events.ts encoding varies by generator (LONG nanos vs timestamp[us]);
    // Tables.epochMicros branches on the resolved schema.
    "q_events_window" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev
        .withColumn("day", to_date(timestamp_micros(Tables.epochMicros(ev))))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("value").cast(D)) * 100).cast("long").as("total_value_cents"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type"))
    }))

  val oracles: Map[String, String] = Map(
    "q_agg_sums" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_qty_cents,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_price_cents,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS revenue_e4,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_metadata_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE (o_orderstatus = 'O' AND o_totalprice > 200000.0)
        |   OR (o_orderpriority LIKE '1%' AND o_totalprice <= 50000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_chain" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    // the Bloom routing is invisible to semantics: the oracle is the plain
    // content-keyed NOT EXISTS the operator must equal exactly
    "q_bloom_anti_join" -> {
      val norm = "lower(trim(regexp_replace(regexp_replace(text," +
        "'[[:punct:]]',' ','g'),'\\s+',' ','g')))"
      s"""WITH k AS (SELECT doc_id, md5($norm) AS key FROM documents),
         |e AS (SELECT DISTINCT key FROM k WHERE doc_id % 7 = 0)
         |SELECT doc_id, key FROM k
         |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.key = k.key)
         |ORDER BY doc_id""".stripMargin
    },

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_per_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice, CAST(rk AS INT) AS rk FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber, l_partkey) AS rk
        |  FROM lineitem) WHERE rk <= 2 ORDER BY l_orderkey, rk""".stripMargin,

    "q_window_lag_chain" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
        |  lag(l_partkey) OVER w AS prev_part,
        |  lead(l_partkey) OVER w AS next_part
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_extendedprice)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin,

    "q_cumsum_budget" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice, l_quantity, running_cents FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice, l_quantity,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS running_cents
        |  FROM lineitem)
        |WHERE running_cents <= 10000
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin,

    "q_nested_collect" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_prune_threshold" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    max(l_extendedprice) OVER (PARTITION BY l_orderkey) AS max_price
        |  FROM lineitem)
        |WHERE l_extendedprice >= max_price * 0.9
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_dedup_window" ->
      """SELECT o_custkey, epoch_ms(o_orderdate) AS order_date_ms, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey, order_date_ms""".stripMargin,

    "q_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS valid_from,
        |  coalesce(lead(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 32503680000000) AS valid_to
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "q_asof_snapshot" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS valid_from,
        |    coalesce(lead(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey), 32503680000000) AS valid_to
        |  FROM orders)
        |WHERE valid_from <= 896659200000 AND valid_to > 896659200000
        |ORDER BY o_custkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q_central_materialization" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, count(DISTINCT l_partkey) AS n_chunks, count(*) AS n_statements
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_custkey, count(*) AS n_topics, CAST(sum(n_statements) AS BIGINT) AS n_items,
        |  round(sum(CAST(n_statements AS DOUBLE) / n_chunks), 6) AS score
        |FROM orders JOIN per_order ON o_orderkey = l_orderkey
        |GROUP BY o_custkey
        |ORDER BY score DESC, o_custkey LIMIT 10""".stripMargin,

    "q_graph_summary" ->
      """SELECT p_type, count(DISTINCT p_brand) AS n_brands,
        |  array_to_string(list_sort(list(DISTINCT p_brand)), ',') AS brands
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,

    "q_events_window" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_value_cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
