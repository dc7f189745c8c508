package graft

/** DuckDB-equivalent SQL for every gate query in SparkEntry.queries.
  *
  * Rules (see SURVEY.md §5):
  *  - output column names identical to the Spark side (driver sorts
  *    columns by name before hashing);
  *  - floats rounded identically on both sides;
  *  - duckdb 1.0.0 dialect: no initcap / conv; regexp_replace needs the
  *    'g' flag for global replace (Spark replaces all by default);
  *  - TRY_CAST where Spark's cast returns null on garbage.
  */
object OracleSql {

  /** DuckDB single-word title-case (no initcap in 1.0.0): matches Spark
    * initcap for inputs without internal whitespace.
    */
  private def title(e: String): String =
    s"upper(substr($e,1,1)) || lower(substr($e,2))"

  private def cleanTitle(e: String): String =
    s"""CASE WHEN $e IS NULL OR trim($e) IN ('','None','NaN','nan','NULL','null','N/A','n/a')
       |  OR lower(trim($e)) = 'nan' THEN 'NA' ELSE ${title(s"trim($e)")} END""".stripMargin

  val all: Map[String, String] = Map(
    "q_agg_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' AND l_quantity > 45""".stripMargin,

    "q_join_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_multi_join" ->
      """SELECT r_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_balance
        |FROM events""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q_rollup_report" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_clean_values" -> {
      val dirtyName =
        """CASE CAST(c_custkey % 7 AS INT)
          |  WHEN 0 THEN NULL WHEN 1 THEN '' WHEN 2 THEN 'None'
          |  WHEN 3 THEN '  ' || c_name || '  '
          |  WHEN 4 THEN lower(c_name) WHEN 5 THEN 'NaN'
          |  ELSE c_name END""".stripMargin
      val dirtyGender =
        """CASE CAST(c_custkey % 5 AS INT)
          |  WHEN 0 THEN 'm' WHEN 1 THEN 'F' WHEN 2 THEN 'male'
          |  WHEN 3 THEN 'FEMALE' ELSE 'x' END""".stripMargin
      s"""WITH d AS (SELECT c_custkey, c_mktsegment,
         |  ($dirtyName) AS dn, ($dirtyGender) AS dg FROM customer)
         |SELECT c_custkey,
         |  ${cleanTitle("dn")} AS clean_name,
         |  ${cleanTitle("c_mktsegment")} AS clean_segment,
         |  CASE WHEN lower(trim(dg)) IN ('m','male') THEN 'M'
         |       WHEN lower(trim(dg)) IN ('f','female') THEN 'F'
         |       ELSE 'N' END AS gender
         |FROM d""".stripMargin
    },

    "q_safe_date" ->
      """WITH raw AS (
        |  SELECT o_orderkey, CASE CAST(o_orderkey % 5 AS INT)
        |    WHEN 0 THEN strftime(o_orderdate, '%d-%m-%Y')
        |    WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
        |    WHEN 2 THEN strftime(o_orderdate, '%d.%m.%y')
        |    WHEN 3 THEN strftime(o_orderdate, '%m-%d-%y')
        |    ELSE 'not-a-date' END AS raw_str
        |  FROM orders),
        |p AS (
        |  SELECT o_orderkey, raw_str,
        |    regexp_extract(trim(raw_str), '^(\d{1,4})[-/.](\d{1,2})[-/.](\d{1,4})$', 1) AS s1,
        |    regexp_extract(trim(raw_str), '^(\d{1,4})[-/.](\d{1,2})[-/.](\d{1,4})$', 2) AS s2,
        |    regexp_extract(trim(raw_str), '^(\d{1,4})[-/.](\d{1,2})[-/.](\d{1,4})$', 3) AS s3
        |  FROM raw),
        |c AS (
        |  SELECT o_orderkey, raw_str,
        |    TRY_CAST(s1 AS INT) AS a, TRY_CAST(s2 AS INT) AS b, TRY_CAST(s3 AS INT) AS e,
        |    length(s1) AS l1, length(s3) AS l3
        |  FROM p),
        |c2 AS (
        |  SELECT *, CASE WHEN e > 26 THEN e + 1900 ELSE e + 2000 END AS y2 FROM c),
        |fin AS (SELECT o_orderkey, raw_str,
        |  CASE
        |    WHEN a IS NULL OR b IS NULL THEN NULL
        |    WHEN l1 = 4 THEN
        |      CASE WHEN a BETWEEN 1900 AND 2026 AND b BETWEEN 1 AND 12
        |             AND e BETWEEN 1 AND day(last_day(make_date(a, b, 1)))
        |           THEN make_date(a, b, e) END
        |    WHEN l3 = 4 THEN
        |      CASE WHEN a <= 12 THEN
        |        CASE WHEN e BETWEEN 1900 AND 2026 AND a BETWEEN 1 AND 12
        |               AND b BETWEEN 1 AND day(last_day(make_date(e, a, 1)))
        |             THEN make_date(e, a, b) END
        |      ELSE
        |        CASE WHEN e BETWEEN 1900 AND 2026 AND b BETWEEN 1 AND 12
        |               AND a BETWEEN 1 AND day(last_day(make_date(e, b, 1)))
        |             THEN make_date(e, b, a) END
        |      END
        |    WHEN l3 <= 2 THEN
        |      CASE WHEN b > 12 AND a <= 12 THEN
        |        CASE WHEN a BETWEEN 1 AND 12
        |               AND b BETWEEN 1 AND day(last_day(make_date(y2, a, 1)))
        |             THEN make_date(y2, a, b) END
        |      ELSE
        |        CASE WHEN b BETWEEN 1 AND 12
        |               AND a BETWEEN 1 AND day(last_day(make_date(y2, b, 1)))
        |             THEN make_date(y2, b, a) END
        |      END
        |    ELSE NULL END AS parsed_d
        |FROM c2)
        |SELECT o_orderkey, raw_str, CAST(parsed_d AS VARCHAR) AS parsed FROM fin""".stripMargin,

    "q_safe_num" ->
      """WITH f AS (
        |  SELECT o_orderkey,
        |    format('{:,}', CAST(floor(round(o_totalprice*100,0)/100) AS BIGINT))
        |      || '.' || lpad(CAST(CAST(round(o_totalprice*100,0) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS fm
        |  FROM orders),
        |raw AS (
        |  SELECT o_orderkey, CASE CAST(o_orderkey % 5 AS INT)
        |    WHEN 0 THEN '₹' || fm
        |    WHEN 1 THEN '$ ' || fm
        |    WHEN 2 THEN fm
        |    WHEN 3 THEN 'garbage' ELSE NULL END AS r
        |  FROM f),
        |s AS (SELECT o_orderkey, regexp_replace(trim(r), '[₹$, ]', '', 'g') AS cl FROM raw)
        |SELECT o_orderkey,
        |  coalesce(CASE WHEN regexp_matches(cl, '^-?\d+(\.\d+)?$')
        |                THEN CAST(cl AS DOUBLE) END, 0.0) AS amount
        |FROM s""".stripMargin,

    "q_age_segment" ->
      """WITH t AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |    greatest(coalesce(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-08-12'), 0), 0) AS tenure
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN d IS NULL OR d > DATE '2026-08-12' THEN 0
        |       ELSE 2026 - year(d)
        |         - CASE WHEN 8 < month(d) OR (8 = month(d) AND 12 < day(d)) THEN 1 ELSE 0 END
        |  END AS age,
        |  tenure AS tenure_days,
        |  CASE WHEN tenure >= 730 THEN 'VIP' WHEN tenure >= 180 THEN 'Regular'
        |       WHEN tenure > 0 THEN 'New' ELSE 'NA' END AS segment
        |FROM t""".stripMargin,

    "q_region_map" ->
      """WITH t AS (
        |  SELECT n_nationkey, CASE CAST(n_nationkey % 10 AS INT)
        |    WHEN 0 THEN 'Delhi' WHEN 1 THEN 'Punjab' WHEN 2 THEN 'UP'
        |    WHEN 3 THEN 'Maharashtra' WHEN 4 THEN 'Gujarat'
        |    WHEN 5 THEN 'Karnataka' WHEN 6 THEN 'Tamil Nadu'
        |    WHEN 7 THEN 'West Bengal' WHEN 8 THEN 'Bihar'
        |    ELSE 'Goa' END AS state
        |  FROM nation)
        |SELECT n_nationkey, state,
        |  CASE
        |    WHEN upper(state) LIKE '%DELHI%' OR upper(state) LIKE '%PUNJAB%'
        |      OR upper(state) LIKE '%UP%' THEN 'North'
        |    WHEN upper(state) LIKE '%MAHARASHTRA%' OR upper(state) LIKE '%GUJARAT%' THEN 'West'
        |    WHEN upper(state) LIKE '%KARNATAKA%' OR upper(state) LIKE '%TAMIL%' THEN 'South'
        |    WHEN upper(state) LIKE '%BENGAL%' OR upper(state) LIKE '%BIHAR%' THEN 'East'
        |    ELSE 'NA' END AS region
        |FROM t""".stripMargin,

    "q_risk_category" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice * 3 AS amount FROM orders)
        |SELECT CASE WHEN amount > 500000 THEN 'High'
        |            WHEN amount > 100000 THEN 'Medium' ELSE 'Low' END AS risk,
        |  count(*) AS n, round(sum(amount), 2) AS total
        |FROM t GROUP BY 1""".stripMargin,

    "q_txn_category" ->
      """WITH t AS (SELECT value * 100 AS amount FROM events)
        |SELECT CASE WHEN amount > 10000 THEN 'Large'
        |            WHEN amount > 1000 THEN 'Medium' ELSE 'Small' END AS category,
        |  count(*) AS n, round(sum(amount), 2) AS total
        |FROM t GROUP BY 1""".stripMargin,

    "q_bool_parse" ->
      """WITH t AS (
        |  SELECT event_id, CASE CAST(event_id % 8 AS INT)
        |    WHEN 0 THEN 'true' WHEN 1 THEN 'YES' WHEN 2 THEN 'y'
        |    WHEN 3 THEN '1' WHEN 4 THEN 'false' WHEN 5 THEN 'no'
        |    WHEN 6 THEN '0' ELSE '' END AS raw_flag
        |  FROM events)
        |SELECT event_id, raw_flag,
        |  lower(trim(raw_flag)) IN ('true', '1', 'yes', 'y') AS flag
        |FROM t""".stripMargin,

    "q_duration_months" ->
      """SELECT l_orderkey, l_linenumber,
        |  greatest(coalesce(
        |    (year(l_shipdate) - year(o_orderdate)) * 12
        |      + (month(l_shipdate) - month(o_orderdate)), 0), 0) AS duration_months
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "q_incremental_append" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,

    "q_upsert_merge" ->
      """SELECT o_orderkey,
        |  round(CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 100000
        |             ELSE o_totalprice END, 2) AS price,
        |  CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END AS version
        |FROM orders""".stripMargin,

    "q_count_verify" ->
      """SELECT 'customer' AS tbl, count(*) AS n_rows FROM customer
        |UNION ALL SELECT 'documents', count(*) FROM documents
        |UNION ALL SELECT 'events', count(*) FROM events
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'orders', count(*) FROM orders""".stripMargin,

    "q_stage_raw" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
        |  trim(c_name) AS name,
        |  CAST(c_nationkey AS VARCHAR) AS nation_id,
        |  trim(c_mktsegment) AS segment,
        |  TRY_CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS numeric_sort_key
        |FROM customer""".stripMargin)
}
