package graft.queries

import graft.Tables
import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** The relational surface (SURVEY.md §2.2): scans, filters, projections,
  * every join flavor, aggregation flavors, window functions, sorts/limits,
  * set ops, scalar functions, time bucketing, as-of join.
  *
  * All plans are declarative DataFrame code — Catalyst supplies pushdown,
  * pruning, join strategy selection (broadcast for dims, sort-merge for
  * fact-fact), and AQE handles runtime skew. Explicit `broadcast()` hints are
  * placed only where the small side is a dimension table by construction.
  */
object Relational extends QueryPack {

  /** exact decimal sum of a double expr, emitted as a bit-stable double */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(28,4)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style full-scan aggregation: partial (map-side) agg then one shuffle
    // on the tiny (flag,status) key space.
    "q01_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Filter + narrow projection: both must reach the parquet scan
    // (PushedFilters + 3-column ReadSchema).
    "q02_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Snowflake join through two dimensions — both broadcast.
    "q03_join_broadcast" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("customers"), dsum($"c_acctbal").as("total_acctbal"))
        .orderBy($"r_name")
    }),

    // Fact-fact join: shuffles both sides on orderkey (sort-merge at scale).
    "q04_join_factfact" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(dsum($"l_extendedprice").as("revenue"), count(lit(1)).as("line_count"))
        .orderBy($"o_orderstatus")
    }),

    // Left-semi: customers with at least one order.
    "q05_semi_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Left-anti: customers with no orders.
    "q06_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Ranking window: top-3 orders per customer by price.
    "q07_window_rank" -> ((s, d) => {
      val w = W.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rnk")
        .orderBy($"o_custkey", $"rnk")
    }),

    // Running-total window with explicit frame.
    "q08_window_running_sum" -> ((s, d) => {
      val w = W.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum($"o_totalprice".cast("decimal(28,4)")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running_spend")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Analytic lag/lead over event time.
    "q09_window_lag" -> ((s, d) => {
      val w = W.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .select($"event_id", $"user_id", $"value", $"prev_value", $"next_type")
        .orderBy($"event_id")
    }),

    // ROLLUP hierarchy totals.
    "q10_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"sum_qty", $"cnt")
        .orderBy($"returnflag", $"linestatus")
    }),

    // CUBE over two order dims.
    "q11_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("orderstatus"),
          coalesce($"o_orderpriority", lit("ALL")).as("orderpriority"),
          $"cnt", $"total")
        .orderBy($"orderstatus", $"orderpriority")
    }),

    // GROUPING SETS via the Dataset API (no shared temp-view mutation).
    "q12_grouping_sets" -> ((s, d) => {
      Tables.events(s, d)
        .groupingSets(Seq(Seq($"event_type"), Seq($"user_id")), $"event_type", $"user_id")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce($"event_type", lit("ALL")).as("etype"),
          coalesce($"user_id".cast("string"), lit("ALL")).as("uid"),
          $"cnt")
        .orderBy($"etype", $"uid")
    }),

    // distinct aggregation (exact; shuffles on (flag, partkey) then re-aggs).
    "q13_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("distinct_parts"),
          countDistinct($"l_suppkey").as("distinct_supps"))
        .orderBy($"l_returnflag")
    }),

    // Global top-k: TakeOrderedAndProject, no full sort of the table.
    "q14_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(10)
    }),

    // PIVOT: long-to-wide with an explicit value list — the values are
    // DECLARED (not discovered), so the plan is one partial-agg shuffle
    // like any groupBy; an undeclared pivot would need a distinct-values
    // job first, a hidden extra pass at 100 TB. Sums (not counts) so an
    // absent cell is NULL in both engines.
    "q77_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum($"l_quantity"))
        .orderBy($"l_linestatus")),

    // UNPIVOT (melt): wide-to-long as a pure projection + generate — zero
    // shuffles; the inverse of q77's shape.
    "q78_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select($"p_partkey",
          $"p_size".cast("double").as("size"),
          $"p_retailprice".cast("double").as("retail"))
        .unpivot(Array($"p_partkey"), Array($"size", $"retail"), "metric", "value")
        .orderBy($"p_partkey", $"metric")),

    // FULL OUTER join: per-nation customer/supplier counts stitched with
    // both-sided null preservation — the one join flavor the pack lacked.
    // Aggregates run BEFORE the join (nation-count-sized inputs), so the
    // outer join is dimension-scale regardless of corpus size.
    "q80_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy($"c_nationkey".cast("int").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy($"s_nationkey".cast("int").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select($"nationkey",
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
        .orderBy($"nationkey")
    }),

    // Set operations: nations having customers but no suppliers, etc.
    "q15_set_ops" -> ((s, d) => {
      val custNations = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
      val suppNations = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"))
      custNations.intersect(suppNations)
        .union(custNations.except(suppNations))
        .orderBy($"nationkey")
    }),

    // Scalar string functions.
    "q16_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          $"p_partkey",
          upper($"p_brand").as("brand_upper"),
          length($"p_name").as("name_len"),
          substring($"p_type", 1, 5).as("type_prefix"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          ($"p_name".contains("spark")).cast("int").as("has_spark"))
        .orderBy($"p_partkey")
    }),

    // Date/time functions.
    "q17_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("order_year"),
          month($"o_orderdate").as("order_month"),
          dayofmonth($"o_orderdate").as("order_day"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month_start"))
        .orderBy($"o_orderkey")
    }),

    // Math + conditional expressions.
    "q18_math_case" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          $"l_orderkey", $"l_linenumber",
          when($"l_discount" > 0.05, "HI").otherwise("LO").as("disc_band"),
          round($"l_tax" * 100, 0).as("tax_pct"),
          floor($"l_extendedprice").as("price_floor"),
          ceil($"l_quantity").as("qty_ceil"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Array functions over tokenized text.
    "q19_array_funcs" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          $"doc_id",
          size(split($"text", " ")).as("token_count"),
          size(array_distinct(split($"text", " "))).as("distinct_tokens"),
          element_at(split($"text", " "), 1).as("first_token"))
        .orderBy($"doc_id")
    }),

    // JSON extraction from the events props column.
    "q20_json_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy($"event_type")
    }),

    // Tumbling-window time aggregation (batch shape of the streaming op).
    "q21_time_bucket" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour").getField("start").as("bucket"), $"event_type")
        .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
        .orderBy($"bucket", $"event_type")
    }),

    // Recursive CTE (Spark 4's UnionLoop): walk a planted management
    // hierarchy (manager = floor(custkey / 10); custkey < 10 are roots) to
    // each customer's root and depth — the iterative-closure SQL surface
    // (org charts, BOM explosion, graph reachability) that previously
    // required driver-side loops. Each recursion round is one distributed
    // join against the frontier; depth is log10(|customers|), so the loop
    // terminates in a handful of rounds at any scale.
    "q129_recursive_cte" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_rec")
      s.sql("""
        WITH RECURSIVE org(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_rec WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, o.root, o.depth + 1
          FROM customer_rec c JOIN org o ON c.c_custkey DIV 10 = o.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT custkey, root, depth FROM org ORDER BY custkey""")
    }),

    // RANGE window frame over event TIME (not rows): per event, how many
    // of the same user's events fall in the trailing hour — the sliding
    // time-window analytic (rate limiting, burst detection) that a
    // rows-frame cannot express when events are irregular. Partitioned by
    // user, so no global-window funnel.
    "q130_range_frame" -> ((s, d) => {
      Tables.events(s, d).select($"event_id", $"user_id", $"ts")
        .createOrReplaceTempView("events_rf")
      s.sql("""
        SELECT event_id, user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS events_last_hour
        FROM events_rf ORDER BY event_id""")
    }),

    // As-of join: each event matched to the user's latest order at or before
    // the event time. Right side deduped to one order per (custkey, date).
    "q22_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select($"event_id", $"user_id", $"ts")
      val ord = Tables.orders(s, d)
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(max($"o_orderkey").as("o_orderkey"))
      AsofJoin.leftAsof(
        left = ev, right = ord,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey"))
        .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"))
        .orderBy($"event_id")
    }),

    // Same as-of semantics through the hot-key-safe bucketed variant
    // (window partitions by (key, 7-day bucket), never by key alone) —
    // identical oracle as q22 proves the rewrite exact.
    "q34_asof_bucketed" -> ((s, d) => {
      val ev = Tables.events(s, d).select($"event_id", $"user_id", $"ts")
      val ord = Tables.orders(s, d)
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(max($"o_orderkey").as("o_orderkey"))
      AsofJoin.leftAsofBucketed(
        left = ev, right = ord,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey"),
        bucketMicros = 7L * 86400 * 1000000)
        .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"))
        .orderBy($"event_id")
    }),

    // Correlated LATERAL subquery (SQL:99 lateral derived table, Spark
    // 3.2+): top-2 orders by price PER customer — the per-row-subquery
    // form of a top-k-per-group, planned as a lateral join rather than a
    // window. Deterministic ties (price desc, orderkey).
    "q150_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 50
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),

    // SCD type-2 assembly from the event stream: consecutive equal
    // event_type runs per user collapse to validity rows with
    // [effective_from, effective_to) and a version counter — the
    // dimension-history primitive point-in-time joins consume.
    "q151_scd2" -> ((s, d) => {
      graft.operators.Scd.scd2(
        Tables.events(s, d).select($"user_id", $"ts", $"event_id", $"event_type"),
        "user_id", Seq("ts", "event_id"), "event_type")
        .orderBy($"user_id", $"version")
    })
  )

  def oracles: Map[String, String] = Map(
    "q150_lateral" -> """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey < 50
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""",

    "q151_scd2" -> """
      WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      changes AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
      SELECT user_id, event_type AS value, ts AS effective_from,
             lead(ts) OVER w2 AS effective_to,
             row_number() OVER w2 AS version
      FROM changes
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version""",

    "q01_agg_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_quantity > 45 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",

    "q03_join_broadcast" -> """
      SELECT r_name, count(*) AS customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",

    "q04_join_factfact" -> """
      SELECT o_orderstatus,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
             count(*) AS line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q05_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q06_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q07_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders) t
      WHERE rnk <= 3 ORDER BY o_custkey, rnk""",

    "q08_window_running_sum" -> """
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q09_window_lag" -> """
      SELECT event_id, user_id, value,
             lag(value, 1) OVER (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id) AS prev_value,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id) AS next_type
      FROM events ORDER BY event_id""",

    "q10_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",

    "q11_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
             coalesce(o_orderpriority, 'ALL') AS orderpriority,
             count(*) AS cnt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY orderstatus, orderpriority""",

    "q12_grouping_sets" -> """
      SELECT coalesce(event_type, 'ALL') AS etype,
             coalesce(CAST(user_id AS VARCHAR), 'ALL') AS uid,
             count(*) AS cnt
      FROM events GROUP BY GROUPING SETS ((event_type), (user_id))
      ORDER BY etype, uid""",

    "q13_count_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS distinct_parts,
             count(DISTINCT l_suppkey) AS distinct_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q14_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q80_full_outer" -> """
      WITH c AS (SELECT CAST(c_nationkey AS INTEGER) AS nationkey, count(*) AS n_cust
                 FROM customer GROUP BY 1),
           s AS (SELECT CAST(s_nationkey AS INTEGER) AS nationkey, count(*) AS n_supp
                 FROM supplier GROUP BY 1)
      SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
             CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
             CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
      FROM c FULL OUTER JOIN s ON s.nationkey = c.nationkey
      ORDER BY nationkey""",

    "q77_pivot" -> """
      SELECT l_linestatus,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS "A",
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS "N",
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS "R"
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q78_unpivot" -> """
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retail' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
      ORDER BY p_partkey, metric""",

    "q15_set_ops" -> """
      SELECT nationkey FROM (
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
        UNION
        (SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         EXCEPT
         SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier)
      ) t ORDER BY nationkey""",

    "q16_string_funcs" -> """
      SELECT p_partkey,
             upper(p_brand) AS brand_upper,
             length(p_name) AS name_len,
             substr(p_type, 1, 5) AS type_prefix,
             concat_ws('|', p_brand, p_type) AS brand_type,
             CAST(contains(p_name, 'spark') AS INTEGER) AS has_spark
      FROM part ORDER BY p_partkey""",

    "q17_date_funcs" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(month(o_orderdate) AS INTEGER) AS order_month,
             CAST(day(o_orderdate) AS INTEGER) AS order_day,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start
      FROM orders ORDER BY o_orderkey""",

    "q18_math_case" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band,
             round(l_tax * 100, 0) AS tax_pct,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q19_array_funcs" -> """
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS token_count,
             CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS distinct_tokens,
             string_split(text, ' ')[1] AS first_token
      FROM documents ORDER BY doc_id""",

    "q20_json_funcs" -> """
      SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(*) AS cnt
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q21_time_bucket" -> """
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
             count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""",

    "q129_recursive_cte" -> """
      WITH RECURSIVE org(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, o.root, o.depth + 1
        FROM customer c JOIN org o ON c.c_custkey // 10 = o.custkey
        WHERE c.c_custkey >= 10
      )
      SELECT custkey, root, CAST(depth AS INTEGER) AS depth
      FROM org ORDER BY custkey""",

    "q130_range_frame" -> """
      SELECT event_id, user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS events_last_hour
      FROM events ORDER BY event_id""",

    "q22_asof_join" -> """
      SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
      FROM events e ASOF LEFT JOIN
           (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate) o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY e.event_id""",

    "q34_asof_bucketed" -> """
      SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
      FROM events e ASOF LEFT JOIN
           (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate) o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY e.event_id"""
  )

  // $"..." interpolator without importing spark.implicits per closure
  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
