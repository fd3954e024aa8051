package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2B — the relational surface the reference delegates to its
  * host engine (Postgres/SQLite), provided natively by Spark SQL.
  *
  * Every query here has a DuckDB-equivalent `oracle` entry; results are
  * hash-compared by the driver. Output types are restricted to
  * bigint / string / date / double-derived-from-exact-decimal so the two
  * engines agree bit-for-bit:
  *   - sums over doubles go through decimal(25,2) (exact, order-independent)
  *     and are cast back to double (correctly rounded, deterministic);
  *   - ORDER BY keys are made unique so row order is total on both sides.
  *
  * Scale notes: dimension joins (region/nation/customer) use broadcast
  * hints; aggregations rely on partial (map-side) aggregation; window
  * functions partition on high-cardinality keys so the shuffle is even.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** exact, deterministic sum of a double column, returned as double */
  private def dsum(c: Column): Column = sum(c.cast("decimal(25,2)")).cast("double")

  val queries: Map[String, Q] = Map(
    // --- scan / projection / filters -------------------------------------
    "b_scan_project" -> ((s, d) =>
      table(s, d, "region").select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey")),

    "b_filter_eq" -> ((s, d) =>
      table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    "b_filter_in_notnull" -> ((s, d) =>
      table(s, d, "part")
        .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33") && col("p_size").isNotNull)
        .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("p_size"))
        .orderBy("p_partkey")),

    // predicates hit the synthetic vocabulary ('red widget', ECONOMY) so
    // the gate is non-vacuous: both the LIKE and the ILIKE branch match
    // rows, and a case-sensitivity or wildcard regression changes output
    "b_filter_like_ilike" -> ((s, d) =>
      table(s, d, "part")
        .filter(col("p_name").like("%red%") || col("p_type").ilike("%economy%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy("p_partkey")),

    // anchors + character class over names that DO match (NATION_10..19),
    // so anchoring/class regressions are visible in the hash
    "b_filter_regex" -> ((s, d) =>
      table(s, d, "nation")
        .filter(col("n_name").rlike("^NATION_1[0-9]$"))
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
        .orderBy("n_nationkey")),

    "b_case_cast" -> ((s, d) =>
      table(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000.0, "big")
            .when(col("o_totalprice") > 100000.0, "mid")
            .otherwise("small").as("bucket"),
          col("o_orderkey").cast("string").as("okstr"))
        .orderBy("o_orderkey")),

    // --- string / JSON functions ------------------------------------------
    "b_string_fns" -> ((s, d) =>
      table(s, d, "part")
        .select(
          col("p_partkey"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          split_part(col("p_type"), lit(" "), lit(-1)).as("type_tail"),
          upper(col("p_brand")).as("brand_up"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"))
        .orderBy("p_partkey")),

    "b_json_get" -> ((s, d) =>
      table(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // --- aggregation -------------------------------------------------------
    "b_agg_q1" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(25,4)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // n_part (round 19) is the DuckDB-verified exact anchor for
    // b_agg_approx's sketch: same column, same grouping, hash-gated —
    // RelationalSpec bounds the HLL estimate against it in integer
    // arithmetic, so the one rows-only row has a hard external anchor
    "b_agg_distinct_having" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 10)
        .orderBy("l_returnflag")),

    // HLL sketch count — rows-only check (sketch implementations differ
    // across engines by design); exact n_exact column anchors the rows
    "b_agg_approx" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("n_approx"),
          countDistinct(col("l_partkey")).as("n_exact"))
        .orderBy("l_returnflag")),

    "b_agg_rollup" -> ((s, d) =>
      table(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // explicit GROUPING SETS (beyond the rollup/cube shorthands): the
    // two named sets only — no grand total — so the result proves the
    // set list is honored, not just expanded to a cube
    "b_agg_grouping_sets" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // PIVOT: wide conditional aggregation (one shuffle; Catalyst compiles
    // the pivot to grouped CASE aggregates — the same plan the oracle SQL
    // states explicitly). Counts only, so cross-engine exact.
    "b_agg_pivot" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .select(col("l_linestatus"),
          coalesce(col("A"), lit(0L)).as("n_a"),
          coalesce(col("N"), lit(0L)).as("n_n"),
          coalesce(col("R"), lit(0L)).as("n_r"))
        .orderBy("l_linestatus")),

    // --- joins ---------------------------------------------------------------
    "b_join_broadcast_agg" -> ((s, d) => {
      val customer = table(s, d, "customer")
      val nation = broadcast(table(s, d, "nation"))
      val region = broadcast(table(s, d, "region"))
      customer
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
        .orderBy("n_name")
    }),

    "b_join_left_agg" -> ((s, d) => {
      val customer = table(s, d, "customer")
      val orders = table(s, d, "orders")
      customer
        .join(orders, col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "b_join_semi" -> ((s, d) => {
      val customer = table(s, d, "customer")
      val orders = table(s, d, "orders").select(col("o_custkey"))
      customer
        .join(orders, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // the build side is filtered (no customer lacks orders entirely in the
    // synthetic data) so the anti-join's output is a proper non-empty
    // subset — an anti-planned-as-semi or null-key regression shows up
    "b_join_anti" -> ((s, d) => {
      val customer = table(s, d, "customer")
      val bigOrders = table(s, d, "orders")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      customer
        .join(bigOrders, col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "b_join_multiway" -> ((s, d) => {
      val lineitem = table(s, d, "lineitem")
      val orders = table(s, d, "orders")
      val customer = table(s, d, "customer")
      val nation = broadcast(table(s, d, "nation"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(25,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // salted equi-join (graft.operators.SkewJoin): row-identical to the
    // plain join; the salt spreads hot keys over the shuffle
    "b_join_salted" -> ((s, d) => {
      val large = table(s, d, "lineitem")
        .select(col("l_suppkey").as("k"), col("l_quantity"))
      val small = table(s, d, "supplier")
        .select(col("s_suppkey").as("k"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedJoin(large, small, "k", salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(col("s_nationkey").cast("long").as("s_nationkey"), col("n"), col("qty"))
        .orderBy("s_nationkey")
    }),

    "b_join_full_outer" -> ((s, d) => {
      // orders per customer including unmatched on BOTH sides (full outer)
      val bal = table(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val big = table(s, d, "orders").filter(col("o_totalprice") > 300000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      bal.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_acctbal"), col("n_big"))
        .orderBy("k")
    }),

    "b_agg_cube" -> ((s, d) =>
      table(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // --- window functions ---------------------------------------------------
    "b_window_lead_rank" -> ((s, d) => {
      // ordering must be total up to output-identical rows: l_linenumber
      // alone is NOT unique in the synthetic data, so break ties with
      // l_quantity (remaining ties produce identical output rows — the
      // hash compare is over row multisets, so engine-internal order of
      // exact ties is irrelevant)
      val w = Window.partitionBy("l_orderkey").orderBy(col("l_linenumber").asc, col("l_quantity").asc)
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          lead("l_linenumber", 1).over(w).cast("long").as("next_line"),
          rank().over(Window.partitionBy("l_orderkey").orderBy(col("l_quantity").desc, col("l_linenumber").asc))
            .cast("long").as("qty_rank"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "b_window_topk" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // RANGE frame (value-based, peers included — distinct from the ROWS
    // frames above): per customer, the count and exact decimal sum of
    // orders within 500.0 of the current order's price
    "b_window_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(-500L, 0L)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_range"),
          sum(col("o_totalprice").cast("decimal(25,2)")).over(w)
            .cast("double").as("sum_in_range"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "b_window_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      table(s, d, "events")
        .select(
          col("user_id"), col("event_id"),
          lag("event_id", 1).over(w).as("prev_event"),
          sum(col("value").cast("decimal(25,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"))
        .orderBy("user_id", "event_id")
    }),

    // --- sort / limit / set ops ----------------------------------------------
    "b_sort_limit" -> ((s, d) =>
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    "b_setops" -> ((s, d) => {
      val n = table(s, d, "nation")
      val inR01 = n.filter(col("n_regionkey").isin(0, 1)).select(col("n_nationkey").cast("long").as("k"))
      val inR12 = n.filter(col("n_regionkey").isin(1, 2)).select(col("n_nationkey").cast("long").as("k"))
      val big = n.filter(col("n_nationkey") >= 10).select(col("n_nationkey").cast("long").as("k"))
      inR01.union(inR12).distinct().except(big.intersect(inR12)).orderBy("k")
    }),

    // --- subqueries ------------------------------------------------------------
    "b_subquery_scalar" -> ((s, d) => {
      val orders = table(s, d, "orders")
      val mx = orders.agg(max("o_totalprice").as("mx"))
      orders.join(broadcast(mx), col("o_totalprice") === col("mx"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "b_subquery_correlated" -> ((s, d) => {
      // customers whose balance beats every supplier in their nation
      val customer = table(s, d, "customer")
      val supMax = table(s, d, "supplier")
        .groupBy("s_nationkey").agg(max("s_acctbal").as("nation_max"))
      customer
        .join(broadcast(supMax), col("c_nationkey") === col("s_nationkey"), "inner")
        .filter(col("c_acctbal") > col("nation_max"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy("c_custkey")
    }),

    // --- lateral / explode -----------------------------------------------------
    "b_explode_wordcount" -> ((s, d) =>
      table(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)),

    // --- date functions ----------------------------------------------------------
    "b_date_fns" -> ((s, d) =>
      table(s, d, "orders")
        .select(
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mon"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .groupBy("mon", "yr")
        .agg(count(lit(1)).as("n"))
        .orderBy("mon")),

    // --- math functions -----------------------------------------------------------
    "b_math_fns" -> ((s, d) =>
      table(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          abs(col("l_discount") - 0.05).cast("decimal(18,4)").cast("double").as("adisc"),
          ceil(col("l_quantity")).cast("long").as("cq"),
          floor(col("l_quantity")).cast("long").as("fq"),
          round(col("l_extendedprice").cast("decimal(25,2)"), 1).cast("double").as("rp"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracle: Map[String, String] = Map(
    "b_scan_project" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "b_filter_eq" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    "b_filter_in_notnull" ->
      "SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_brand IN ('Brand#11','Brand#22','Brand#33') AND p_size IS NOT NULL ORDER BY p_partkey",
    "b_filter_like_ilike" ->
      "SELECT p_partkey, p_name, p_type FROM part WHERE p_name LIKE '%red%' OR p_type ILIKE '%economy%' ORDER BY p_partkey",
    "b_filter_regex" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE regexp_matches(n_name, '^NATION_1[0-9]$') ORDER BY n_nationkey",
    "b_case_cast" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice > 200000.0 THEN 'big' WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket, CAST(o_orderkey AS VARCHAR) AS okstr FROM orders ORDER BY o_orderkey",
    "b_string_fns" ->
      "SELECT p_partkey, split_part(p_type, ' ', 1) AS type_head, split_part(p_type, ' ', -1) AS type_tail, upper(p_brand) AS brand_up, substring(p_name, 1, 5) AS name_pfx, CAST(length(p_name) AS BIGINT) AS name_len, replace(p_brand, 'Brand#', 'B') AS brand_short, trim(' ' || p_name || ' ') AS name_trim FROM part ORDER BY p_partkey",
    "b_json_get" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id",
    "b_agg_q1" ->
      "SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty, CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS sum_disc_price, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "b_agg_distinct_having" ->
      "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows FROM lineitem GROUP BY l_returnflag HAVING count(*) > 10 ORDER BY l_returnflag",
    "b_agg_rollup" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST",
    "b_agg_grouping_sets" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus)) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST",
    "b_agg_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "b_join_broadcast_agg" ->
      "SELECT n_name, count(*) AS n_cust, CAST(sum(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS bal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name",
    "b_join_left_agg" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "b_join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    "b_join_anti" ->
      "SELECT c_custkey, c_acctbal FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) ORDER BY c_custkey",
    "b_join_multiway" ->
      "SELECT n_name, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "b_join_salted" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "b_join_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS k, c_acctbal, n_big
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
        |                 WHERE o_totalprice > 300000 GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey ORDER BY k""".stripMargin,
    "b_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "b_window_lead_rank" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(lead(l_linenumber, 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_quantity ASC) AS BIGINT) AS next_line,
        |  CAST(rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber ASC) AS BIGINT) AS qty_rank
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "b_window_topk" ->
      "SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn",
    "b_window_range" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, CAST(count(*) OVER w AS BIGINT) AS n_in_range, CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) OVER w AS DOUBLE) AS sum_in_range FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) ORDER BY o_custkey, o_orderkey",
    "b_window_running" ->
      "SELECT user_id, event_id, lag(event_id, 1) OVER w AS prev_event, CAST(sum(CAST(value AS DECIMAL(25,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id) ORDER BY user_id, event_id",
    "b_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    "b_setops" ->
      "SELECT k FROM ((SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_regionkey IN (0,1) UNION SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_regionkey IN (1,2)) EXCEPT (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_nationkey >= 10 INTERSECT SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_regionkey IN (1,2))) ORDER BY k",
    "b_subquery_scalar" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders) ORDER BY o_orderkey",
    "b_subquery_correlated" ->
      "SELECT c_custkey, c_acctbal FROM customer c WHERE c_acctbal > (SELECT max(s_acctbal) FROM supplier s WHERE s.s_nationkey = c.c_nationkey) ORDER BY c_custkey",
    "b_explode_wordcount" ->
      "SELECT word, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY word ORDER BY n DESC, word ASC LIMIT 20",
    "b_date_fns" ->
      "SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon, CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n FROM orders GROUP BY mon, yr ORDER BY mon",
    "b_math_fns" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(18,4)) AS DOUBLE) AS adisc, CAST(ceil(l_quantity) AS BIGINT) AS cq, CAST(floor(l_quantity) AS BIGINT) AS fq, CAST(round(CAST(l_extendedprice AS DECIMAL(25,2)), 1) AS DOUBLE) AS rp FROM lineitem ORDER BY l_orderkey, l_linenumber"
  )
}
