package graft

/** DuckDB-equivalent SQL for every gate query in SparkEntry.queries.
  *
  * Rules (see SURVEY.md §5):
  *  - output column names identical to the Spark side (driver sorts
  *    columns by name before hashing);
  *  - floats rounded identically on both sides — EXCEPT ratios of
  *    exact integers (e.g. q_robust_scale, q_skew_metrics,
  *    q_triangle_stats clustering), which are emitted as RAW doubles:
  *    the single IEEE division is bit-identical on both engines, while
  *    round(rational, k) can land exactly on a half-boundary where
  *    Spark's HALF_UP and DuckDB's HALF_EVEN disagree. Rounding IS safe
  *    when the pre-round value can't sit on a boundary (irrational
  *    factors like ln/sqrt, or k-decimal data rounded at k);
  *  - double accumulations avoided: sums run over integer cents /
  *    counts (decimal/bigint), floats enter once per output row;
  *  - duckdb 1.0.0 dialect: no initcap / conv (hex via strpos
  *    positional digits); no arg_min on struct keys (use a unique
  *    scalar order column); regexp_replace needs the 'g' flag for
  *    global replace (Spark replaces all by default); last_value
  *    IGNORE NULLS and QUALIFY are available;
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

  // ---- shared fragments for the text / dedup / similarity oracles ----

  /** Normalized text (mirror of TextFunctions.normalizeText). */
  private def normOf(c: String): String =
    s"trim(regexp_replace(lower($c), '[^a-z0-9]+', ' ', 'g'))"

  private def langScoreSql(w: String, words: Seq[String]): String =
    s"len(list_filter($w, x -> x IN (${words.map(x => s"'$x'").mkString(",")})))"

  private val enW = Seq("the", "and", "of", "to")
  private val esW = Seq("el", "la", "de", "los")
  private val deW = Seq("der", "die", "und", "das")
  private val frW = Seq("le", "les", "des", "et")

  /** Dup-seeded corpus (mirror of SparkEntry.dupCorpus). */
  private val corpusCte: String =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000,
       |    regexp_replace(${normOf("text")}, ' [a-z0-9]+$$', '')
       |    FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL SELECT doc_id + 2000000, text
       |    FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Distinct word-5-gram shingles per doc (mirror of Dedup.docShingles). */
  private val shCte: String =
    s"""sh AS (
       |  SELECT DISTINCT id,
       |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS sh
       |  FROM (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
       |        FROM corpus) t,
       |       unnest(generate_series(1, len(w) - 4)) AS u(i))""".stripMargin

  /** 48-bit integer from the first 12 hex digits of `h` — Horner over
    * positional digits (no conv in DuckDB 1.0). Mirror of
    * Dedup.shingleBase48; every intermediate ≤ 2^48, exact BIGINT.
    */
  private def hex48Sql(h: String): String = {
    val digits = (1 to 12).map(i =>
      s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1)")
    digits.tail.foldLeft(digits.head)((acc, d) => s"(16*$acc + $d)")
  }

  /** Per-seed minhash aggregates over a pre-computed `hb` base column
    * (mirror of Dedup.minhashAgg): min of (hb·(2s+1)) mod 2^48 — odd
    * multipliers are bijections mod 2^48; products ≤ 17·2^48 < 2^53
    * stay exact in BIGINT on both engines.
    */
  private def minhashMinsSql(k: Int): String =
    (0 until k).map(s =>
      s"CAST(min((hb * ${2 * s + 1}) % 281474976710656) AS BIGINT) AS mh$s")
      .mkString(",\n    ")

  /** Signature CTE over a (id, sh) source: one md5 per shingle, then
    * the k seed mixes (mirror of Dedup.minhashSignatures).
    */
  private def minhashSigCte(name: String, shSrc: String, k: Int): String =
    s"""$name AS (SELECT id, ${minhashMinsSql(k)}
       |  FROM (SELECT id, ${hex48Sql("h")} AS hb
       |        FROM (SELECT id, md5(sh) AS h FROM $shSrc))
       |  GROUP BY id)""".stripMargin

  /** Band-bucket rows from a signature CTE (mirror of
    * Dedup.minhashBands): bh = md5 of the '|'-joined decimal mins.
    */
  private def minhashBandRowsSql(sig: String, bands: Int,
                                 rowsPerBand: Int): String =
    (0 until bands).map { b =>
      val cat = (0 until rowsPerBand)
        .map(r => s"CAST(mh${b * rowsPerBand + r} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bh FROM $sig"
    }.mkString("\n  UNION ALL ")

  /** Left-fold dot/norm/cosine over double arrays (mirror of
    * Similarity.dot/l2Norm/cosine — list_reduce is a left fold, and
    * 0.0+x ≡ x, so the IEEE operation sequence is identical).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> x[1]*x[2]), (p,q) -> p+q)"

  private def vnormSql(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x*x), (p,q) -> p+q))"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${vnormSql(a)} * ${vnormSql(b)}))"

  /** Squared L2 (mirror of Similarity.sqDist — same left fold). */
  private def sqDistSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])), (p,q) -> p+q)"

  /** SRP bucket (mirror of Similarity.srpBucket): literal ±1 weights from
    * the same integer mix, same left-to-right accumulation.
    */
  private def srpSql(vec: String, planes: Int, dims: Int): String = {
    val projs = (0 until planes).map { p =>
      val terms = (0 until dims).map { d =>
        val sign = if ((d * 31 + p * 17) % 7 < 3) "+" else "-"
        s"$sign $vec[${d + 1}]"
      }.mkString(" ")
      s"CASE WHEN (0.0 $terms) > 0 THEN ${1L << p} ELSE 0 END"
    }
    projs.mkString("(", "\n + ", ")")
  }

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
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
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
        |FROM customer""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS regex_tokens
        |FROM documents""".stripMargin,

    "q_lang_id" ->
      s"""WITH w AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS w FROM documents),
         |sc AS (SELECT doc_id,
         |  ${langScoreSql("w", enW)} AS s_en,
         |  ${langScoreSql("w", esW)} AS s_es,
         |  ${langScoreSql("w", deW)} AS s_de,
         |  ${langScoreSql("w", frW)} AS s_fr
         |FROM w)
         |SELECT doc_id, s_en, s_es,
         |  CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |       WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_pred
         |FROM sc""".stripMargin,

    "q_quality_score" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         |    length(text) AS n_chars,
         |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         |    ${langScoreSql(s"string_split(${normOf("text")}, ' ')", enW)} AS s_en
         |  FROM documents)
         |SELECT doc_id, floor((
         |  least(n_tok / 100.0, 1.0) * 0.4
         |  + (CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END) * 0.3
         |  + (CASE WHEN n_tok > 0 THEN s_en / CAST(n_tok AS DOUBLE) ELSE 0.0 END) * 0.3
         |  ) * 10000.0 + 0.5) / 10000.0 AS quality
         |FROM t""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, md5(${normOf("text")}) AS fingerprint,
         |  CAST(length(${normOf("text")}) AS BIGINT) AS norm_len
         |FROM documents""".stripMargin,

    "q_dedup_exact" ->
      s"""WITH $corpusCte
         |SELECT md5(${normOf("text")}) AS fingerprint,
         |  min(doc_id) AS keeper, count(*) AS n_docs
         |FROM corpus GROUP BY 1""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  -- size-ratio prune mirrors the Spark self-join predicate
         |  -- (Dedup.ngramJaccardPairs): J >= t implies max_sz <= min_sz/t,
         |  -- in IEEE double arithmetic on BOTH engines
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT id_a, id_b,
         |    round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |  FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.6""".stripMargin,

    "q_sql_recursive" ->
      // near-identical recursive SQL on DuckDB: date+interval yields
      // TIMESTAMP there, so the recursion re-casts to DATE; cents via
      // floor(+0.5) (double→int rounding differs between engines)
      """WITH RECURSIVE spine(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
        |  WHERE m < DATE '2001-08-01'),
        |mo AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |    count(*) AS n,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT CAST(spine.m AS VARCHAR) AS month,
        |  coalesce(mo.n, 0) AS n_orders,
        |  CAST(coalesce(mo.cents, 0) AS BIGINT) AS sum_cents
        |FROM spine LEFT JOIN mo ON mo.m = spine.m""".stripMargin,

    "q_containment" ->
      // asymmetric acceptance den·|∩| ≥ num·min(|A|,|B|) over the
      // same shared-shingle pairs; containment is one exact-int
      // division (raw-double safe)
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(inter AS DOUBLE) /
         |    CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
         |FROM inter
         |JOIN sizes sa ON sa.id = doc_a
         |JOIN sizes sb ON sb.id = doc_b
         |WHERE 10 * inter >= 9 * least(sa.n, sb.n)""".stripMargin,

    "q_setsim_join" ->
      // brute-force ground truth: EVERY shared-token pair with the
      // exact integer acceptance test den·|∩| ≥ num·|∪| (τ = 3/5).
      // The Spark side computes the same relation through prefix
      // filtering, so hash-equality here is an end-to-end check of
      // the prefix-filter correctness theorem. jacc is one IEEE
      // division of exact integers — raw-double safe.
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jacc
         |FROM inter
         |JOIN sizes sa ON sa.id = doc_a
         |JOIN sizes sb ON sb.id = doc_b
         |WHERE 5 * inter >= 3 * (sa.n + sb.n - inter)""".stripMargin,

    "q_vocab_encode" ->
      // same (count desc, term asc) total order on both engines; the
      // ORDER BY inside the LIMIT subquery fixes the top-64 cut, the
      // row_number over the same keys fixes the ids. Spark posexplode
      // is 0-based, DuckDB range 1-based — only the ordering matters.
      s"""WITH w AS (
         |  SELECT doc_id, string_split(${normOf("text")}, ' ') AS w
         |  FROM documents),
         |tp AS (
         |  SELECT doc_id, unnest(w) AS tok,
         |    unnest(range(1, len(w) + 1)) AS pos
         |  FROM w),
         |cnt AS (SELECT tok, count(*) AS c FROM tp GROUP BY tok),
         |vocab AS (
         |  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS tid
         |  FROM (SELECT * FROM cnt ORDER BY c DESC, tok LIMIT 64)),
         |enc AS (
         |  SELECT t.doc_id, t.pos, coalesce(v.tid, 0) AS tid
         |  FROM tp t LEFT JOIN vocab v ON v.tok = t.tok)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids
         |FROM enc GROUP BY doc_id""".stripMargin,

    "q_minhash_incremental" -> {
      // store = band rows of the ORIGINAL docs, batch = the dup-seeded
      // extras; same one-digest minhash/band construction as
      // q_dedup_minhash, built independently for each side, then the
      // (band, bh) screen
      s"""WITH batch AS (
         |  SELECT doc_id + 1000000 AS id,
         |    regexp_replace(${normOf("text")}, ' [a-z0-9]+$$', '') AS text
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 2000000, text
         |  FROM documents WHERE doc_id % 7 = 0),
         |shb AS (
         |  SELECT DISTINCT id,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS sh
         |  FROM (SELECT id, string_split(${normOf("text")}, ' ') AS w
         |        FROM batch) t,
         |       unnest(generate_series(1, len(w) - 4)) AS u(i)),
         |shs AS (
         |  SELECT DISTINCT id,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS sh
         |  FROM (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
         |        FROM documents) t,
         |       unnest(generate_series(1, len(w) - 4)) AS u(i)),
         |${minhashSigCte("sigb", "shb", 9)},
         |${minhashSigCte("sigs", "shs", 9)},
         |bb AS (${minhashBandRowsSql("sigb", 3, 3)}),
         |bs AS (${minhashBandRowsSql("sigs", 3, 3)}),
         |hits AS (
         |  SELECT bb.id, count(DISTINCT bs.id) AS store_hits
         |  FROM bb JOIN bs ON bb.band = bs.band AND bb.bh = bs.bh
         |  GROUP BY 1)
         |SELECT b.id, coalesce(h.store_hits, 0) AS store_hits,
         |  coalesce(h.store_hits, 0) = 0 AS kept
         |FROM (SELECT DISTINCT id FROM batch) b
         |LEFT JOIN hits h ON h.id = b.id""".stripMargin
    },

    "q_minhash_est" -> {
      // same one-digest minhash construction; estimate = agreeing
      // mins / 9, exact = shingle-set Jaccard for the candidate pairs
      // — each one exact-int division (raw-double safe)
      val agree = (0 until 9).map(i =>
        s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $corpusCte,
         |$shCte,
         |shh AS MATERIALIZED (
         |  SELECT DISTINCT id, ${hex48Sql("h")} AS hb
         |  FROM (SELECT id, md5(sh) AS h FROM sh)),
         |sig AS MATERIALIZED (SELECT id, ${minhashMinsSql(9)}
         |  FROM shh GROUP BY id),
         |banded AS MATERIALIZED (
         |  ${minhashBandRowsSql("sig", 3, 3)}),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
         |agr AS (
         |  SELECT c.id_a, c.id_b, CAST($agree AS BIGINT) AS n_agree
         |  FROM cand c
         |  JOIN sig a ON a.id = c.id_a
         |  JOIN sig b ON b.id = c.id_b),
         |sizes AS MATERIALIZED (SELECT id, count(*) AS sz FROM shh GROUP BY id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS ic
         |  FROM cand c
         |  JOIN shh x ON x.id = c.id_a
         |  JOIN shh y ON y.id = c.id_b AND y.hb = x.hb
         |  GROUP BY 1, 2)
         |SELECT g.id_a, g.id_b, g.n_agree,
         |  CAST(g.n_agree AS DOUBLE) / CAST(9 AS DOUBLE) AS est_jaccard,
         |  coalesce(i.ic, 0) AS inter,
         |  CAST(coalesce(i.ic, 0) AS DOUBLE) /
         |    CAST(sa.sz + sb.sz - coalesce(i.ic, 0) AS DOUBLE) AS jaccard
         |FROM agr g
         |LEFT JOIN inter i ON i.id_a = g.id_a AND i.id_b = g.id_b
         |JOIN sizes sa ON sa.id = g.id_a
         |JOIN sizes sb ON sb.id = g.id_b""".stripMargin
    },

    "q_train_blocks" ->
      // q_vocab_encode's CTEs, then the token stream: doc offsets via
      // ONE ordered prefix sum (fine in DuckDB; the Spark side earns
      // its two-level form), EOS = −1 appended per doc, block = gpos
      // div 128 in integer arithmetic
      s"""WITH w AS (
         |  SELECT doc_id, string_split(${normOf("text")}, ' ') AS w
         |  FROM documents),
         |tp AS (
         |  SELECT doc_id, unnest(w) AS tok,
         |    unnest(range(1, len(w) + 1)) AS pos
         |  FROM w),
         |cnt AS (SELECT tok, count(*) AS c FROM tp GROUP BY tok),
         |vocab AS (
         |  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS tid
         |  FROM (SELECT * FROM cnt ORDER BY c DESC, tok LIMIT 64)),
         |enc AS (
         |  SELECT t.doc_id, t.pos, coalesce(v.tid, 0) AS tid
         |  FROM tp t LEFT JOIN vocab v ON v.tok = t.tok),
         |docn AS (SELECT doc_id, count(*) + 1 AS n FROM enc GROUP BY doc_id),
         |off AS (
         |  SELECT doc_id, n,
         |    coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM docn),
         |tok AS (
         |  SELECT e.doc_id, o.off + e.pos - 1 AS gpos, e.tid
         |  FROM enc e JOIN off o USING (doc_id)
         |  UNION ALL
         |  SELECT o.doc_id, o.off + o.n - 1, -1 FROM off o)
         |SELECT CAST(gpos // 128 AS BIGINT) AS block_id, count(*) AS n_ids,
         |  count(DISTINCT doc_id) AS n_docs,
         |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY gpos) AS ids
         |FROM tok GROUP BY 1""".stripMargin,

    "q_dedup_minhash" -> {
      s"""WITH $corpusCte,
         |$shCte,
         |${minhashSigCte("sig", "sh", 9)},
         |banded AS (
         |  ${minhashBandRowsSql("sig", 3, 3)})
         |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
         |GROUP BY 1, 2""".stripMargin
    },

    "q_dedup_eval" -> {
      // the q_dedup_minhash candidate relation scored against the
      // PLANTED ground truth (dupCorpus construction): exact integer
      // counts + micro-unit integral ratios
      s"""WITH $corpusCte,
         |$shCte,
         |${minhashSigCte("sig", "sh", 9)},
         |banded AS (
         |  ${minhashBandRowsSql("sig", 3, 3)}),
         |pred AS MATERIALIZED (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
         |  GROUP BY 1, 2),
         |truth AS MATERIALIZED (
         |  SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id, doc_id + 2000000
         |  FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL SELECT doc_id + 1000000, doc_id + 2000000
         |  FROM documents WHERE doc_id % 70 = 0),
         |tp AS (SELECT count(*) AS tp FROM pred p
         |       JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b),
         |np AS (SELECT count(*) AS n FROM pred),
         |nt AS (SELECT count(*) AS n FROM truth)
         |SELECT CAST(np.n AS BIGINT) AS n_pred,
         |  CAST(nt.n AS BIGINT) AS n_truth,
         |  CAST(tp.tp AS BIGINT) AS tp,
         |  CAST(np.n - tp.tp AS BIGINT) AS fp,
         |  CAST(nt.n - tp.tp AS BIGINT) AS fn,
         |  CAST((1000000 * tp.tp) // np.n AS BIGINT) AS precision_micro,
         |  CAST((1000000 * tp.tp) // nt.n AS BIGINT) AS recall_micro
         |FROM np, nt, tp""".stripMargin
    },

    "q_embed_dup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding, label
         |    FROM embeddings WHERE vec_id % 20 = 0),
         |v AS (SELECT vec_id AS id, label AS blk,
         |        CAST(embedding AS DOUBLE[]) AS v FROM e),
         |p AS (
         |  SELECT a.id AS id_a, b.id AS id_b, ${cosSql("a.v", "b.v")} AS c
         |  FROM v a JOIN v b ON a.blk = b.blk AND a.id < b.id)
         |SELECT id_a, id_b, round(c, 3) AS cos FROM p WHERE c >= 0.99""".stripMargin,

    "q_semantic_dedup" ->
      // q_embed_dup's cosine pairs, then the transitive closure (min
      // reachable id ≡ the Spark CC label) and the per-vector verdict:
      // keeper = cluster min id, singletons self-clustered with n=1
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding, label
         |    FROM embeddings WHERE vec_id % 20 = 0),
         |v AS (SELECT vec_id AS id, label AS blk,
         |        CAST(embedding AS DOUBLE[]) AS v FROM e),
         |p AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM v a JOIN v b ON a.blk = b.blk AND a.id < b.id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.99),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM p
         |          UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e2.src, rr.r FROM edges e2 JOIN reach rr ON e2.dst = rr.id),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |members AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1)
         |SELECT e.vec_id,
         |  coalesce(c.cluster_id, e.vec_id) AS cluster_id,
         |  coalesce(m.n, 1) AS n_members,
         |  (c.id IS NULL OR c.cluster_id = e.vec_id) AS keep
         |FROM e
         |LEFT JOIN comp c ON c.id = e.vec_id
         |LEFT JOIN members m ON m.cluster_id = c.cluster_id""".stripMargin,

    "q_ann_topk" ->
      s"""WITH c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id % 1000 = 0),
         |scored AS (
         |  SELECT q_id, nn_id, ${cosSql("qv", "cv")} AS c
         |  FROM c, q WHERE q_id <> nn_id),
         |r AS (SELECT q_id, nn_id, c,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nn_id) AS "rank"
         |  FROM scored)
         |SELECT q_id, nn_id, "rank", round(c, 4) AS cos FROM r WHERE "rank" <= 5""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |cb AS (SELECT nn_id, cv, ${srpSql("cv", 8, 64)} AS bucket FROM c),
         |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id % 1000 = 0),
         |qb AS (SELECT q_id, qv, ${srpSql("qv", 8, 64)} AS bucket FROM q),
         |scored AS (
         |  SELECT q_id, nn_id, ${cosSql("qv", "cv")} AS c
         |  FROM cb JOIN qb USING (bucket) WHERE q_id <> nn_id),
         |r AS (SELECT q_id, nn_id, c,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nn_id) AS "rank"
         |  FROM scored)
         |SELECT q_id, nn_id, "rank", round(c, 4) AS cos FROM r WHERE "rank" <= 5""".stripMargin,

    "q_ann_recall" ->
      // exact top-5 (q_ann_topk's CTEs) left-joined to the LSH top-5
      // (q_ann_lsh's): per-query hits are exact ints, recall ONE
      // division
      s"""WITH c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id % 1000 = 0),
         |ex AS (SELECT q_id, nn_id FROM (
         |  SELECT q_id, nn_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY ${cosSql("qv", "cv")} DESC, nn_id) AS rk
         |  FROM c, q WHERE q_id <> nn_id) t WHERE rk <= 5),
         |cb AS (SELECT nn_id, cv, ${srpSql("cv", 8, 64)} AS bucket FROM c),
         |qb AS (SELECT q_id, qv, ${srpSql("qv", 8, 64)} AS bucket FROM q),
         |ap AS (SELECT q_id, nn_id FROM (
         |  SELECT q_id, nn_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY ${cosSql("qv", "cv")} DESC, nn_id) AS rk
         |  FROM cb JOIN qb USING (bucket) WHERE q_id <> nn_id) t
         |  WHERE rk <= 5),
         |j AS (SELECT ex.q_id, ex.nn_id,
         |    CASE WHEN ap.q_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM ex LEFT JOIN ap ON ap.q_id = ex.q_id
         |    AND ap.nn_id = ex.nn_id)
         |SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(sum(hit) AS BIGINT) AS n_hit,
         |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM j GROUP BY 1""".stripMargin,

    "q_lateral" ->
      // DuckDB's LATERAL matches the SQL-standard form directly
      """SELECT c.c_custkey, o.o_orderkey, o.cents
        |FROM customer c,
        |LATERAL (SELECT o_orderkey,
        |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |         FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin,

    "q_variant" ->
      // GROUND-TRUTH: emits the values PLANTED into the JSON without
      // parsing any of it — hash equality proves the VARIANT path
      // extraction inverts the construction
      """SELECT event_id, CAST(user_id AS BIGINT) AS uid,
        |  event_type AS ty,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS v0
        |FROM events""".stripMargin,

    "q_ann_incremental" ->
      // FULL recompute over old ∪ batch — hash equality proves the
      // Spark side's top-k(store ∪ batch-top-k) merge is lossless
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding
         |    FROM embeddings WHERE vec_id % 20 = 0),
         |c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM e),
         |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id % 1000 = 0),
         |scored AS (
         |  SELECT q_id, nn_id, ${cosSql("qv", "cv")} AS c
         |  FROM c, q WHERE q_id <> nn_id),
         |r AS (SELECT q_id, nn_id, c,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nn_id) AS "rank"
         |  FROM scored)
         |SELECT q_id, nn_id, "rank", round(c, 4) AS cos FROM r
         |WHERE "rank" <= 5""".stripMargin,

    "q_intrinsic_dim" ->
      // two-NN MLE: per point the two smallest positive squared
      // distances within its label block; ln(sq2/sq1) ONE division +
      // ln, folded in id order; d = 2N/Σ at 6dp
      s"""WITH v AS (SELECT vec_id AS id, label AS blk,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |mq AS (SELECT greatest(1, (sum(n * n) + 19999999) // 20000000)
         |    AS md
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM v
         |    GROUP BY blk)),
         |va AS (SELECT v.* FROM v CROSS JOIN mq WHERE v.id % mq.md = 0),
         |p AS (SELECT a.id, ${sqDistSql("a.v", "b.v")} AS sq
         |  FROM va a JOIN v b ON a.blk = b.blk AND a.id <> b.id
         |  WHERE ${sqDistSql("a.v", "b.v")} > 0.0),
         |r AS (SELECT id, sq,
         |    row_number() OVER (PARTITION BY id ORDER BY sq) AS rn
         |  FROM p),
         |t AS (SELECT id,
         |    ln(max(CASE WHEN rn = 2 THEN sq END)
         |       / max(CASE WHEN rn = 1 THEN sq END)) AS lnmu
         |  FROM r WHERE rn <= 2 GROUP BY id
         |  HAVING count(*) = 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_points,
         |  round(2.0 * CAST(count(*) AS DOUBLE)
         |    / (SELECT list_reduce(list(lnmu ORDER BY id),
         |        (x, y) -> x + y) FROM t), 6) AS id_mle
         |FROM t""".stripMargin,

    "q_blocking_eval" ->
      // candidate pairs from block SIZES (never materialized);
      // completeness from the truth pairs' block agreement; micro
      // ratios by integral division — all exact longs
      """WITH base AS (SELECT c_custkey AS id,
        |    CAST(c_nationkey AS BIGINT) AS blk FROM customer),
        |vars AS (SELECT c_custkey + 1000000 AS id,
        |    CAST(CASE WHEN c_custkey % 30 = 0
        |      THEN (c_nationkey + 1) % 25 ELSE c_nationkey END
        |      AS BIGINT) AS blk
        |  FROM customer WHERE c_custkey % 10 = 0),
        |ents AS (SELECT * FROM base UNION ALL SELECT * FROM vars),
        |sizes AS (SELECT blk, CAST(count(*) AS BIGINT) AS n FROM ents
        |  GROUP BY 1),
        |bs AS (SELECT CAST(sum(n) AS BIGINT) AS n_entities,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(n * (n - 1)) AS BIGINT) // 2 AS cand_pairs
        |  FROM sizes),
        |tp AS (SELECT c_custkey AS id_a, c_custkey + 1000000 AS id_b
        |  FROM customer WHERE c_custkey % 10 = 0),
        |cov AS (SELECT CAST(count(*) AS BIGINT) AS n_truth,
        |    CAST(sum(CASE WHEN ea.blk = eb.blk THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_covered
        |  FROM tp JOIN ents ea ON ea.id = tp.id_a
        |    JOIN ents eb ON eb.id = tp.id_b)
        |SELECT n_entities, n_blocks, cand_pairs,
        |  n_entities * (n_entities - 1) // 2 AS total_pairs,
        |  ((n_entities * (n_entities - 1) // 2 - cand_pairs) * 1000000)
        |    // (n_entities * (n_entities - 1) // 2) AS reduction_micro,
        |  n_truth, n_covered,
        |  (1000000 * n_covered) // n_truth AS completeness_micro
        |FROM bs CROSS JOIN cov""".stripMargin,

    "q_scc" ->
      // SCC by definition: scc(v) = min over {v} ∪ {u : u ⇝ v ∧
      // v ⇝ u} via the recursive reachability closure; rr
      // MATERIALIZED so the mutual self-join doesn't recompute the
      // closure (the q_kcore inlining lesson)
      """WITH RECURSIVE li AS (
        |  SELECT * FROM lineitem
        |  WHERE l_orderkey % 200 = 1 AND l_partkey % 3 = 0),
        |e0 AS (SELECT l_partkey AS s, l_suppkey + 1000000 AS d FROM li
        |  UNION
        |  SELECT l_suppkey + 1000000, l_partkey FROM li
        |  WHERE l_linenumber % 2 = 1),
        |e2 AS MATERIALIZED (SELECT DISTINCT CAST(s AS BIGINT) AS s,
        |    CAST(d AS BIGINT) AS d FROM e0 WHERE s <> d),
        |n AS (SELECT s AS id FROM e2 UNION SELECT d FROM e2),
        |reach(s, d) AS (
        |  SELECT s, d FROM e2
        |  UNION
        |  SELECT r.s, e2.d FROM reach r JOIN e2 ON e2.s = r.d),
        |rr AS MATERIALIZED (SELECT s, d FROM reach),
        |mutual AS (SELECT a.s AS u, a.d AS v
        |  FROM rr a JOIN rr b ON a.s = b.d AND a.d = b.s)
        |SELECT n.id,
        |  CAST(least(n.id, coalesce(min(m.u), n.id)) AS BIGINT) AS scc
        |FROM n LEFT JOIN mutual m ON m.v = n.id
        |GROUP BY n.id""".stripMargin,

    "q_shortest_path" -> {
      // 6 UNROLLED Bellman–Ford relaxation rounds in exact integer
      // min-plus (the distributed loop's early fixpoint exit yields
      // the same values — costs are monotone); parallel edges
      // pre-collapsed to min weight, like the Spark side
      val rounds = (1 to 6).map { i =>
        s"""r$i AS (SELECT e.d AS id,
           |    CAST(min(d${i - 1}.cost + e.w) AS BIGINT) AS cand
           |  FROM e JOIN d${i - 1} ON d${i - 1}.id = e.s GROUP BY 1),
           |d$i AS MATERIALIZED (SELECT coalesce(d${i - 1}.id, r$i.id) AS id,
           |    CAST(least(coalesce(d${i - 1}.cost, r$i.cand),
           |      coalesce(r$i.cand, d${i - 1}.cost)) AS BIGINT) AS cost
           |  FROM d${i - 1} FULL OUTER JOIN r$i
           |    ON d${i - 1}.id = r$i.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT * FROM lineitem
         |  WHERE l_orderkey % 200 = 1 AND l_partkey % 3 = 0),
         |e0 AS (SELECT l_partkey AS s, l_suppkey + 1000000 AS d,
         |    CAST(l_quantity AS BIGINT) AS w FROM li
         |  UNION ALL
         |  SELECT l_suppkey + 1000000, l_partkey,
         |    CAST(l_quantity AS BIGINT) FROM li WHERE l_linenumber % 2 = 1),
         |e AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS s,
         |    CAST(d AS BIGINT) AS d, CAST(min(w) AS BIGINT) AS w
         |  FROM e0 WHERE s <> d GROUP BY 1, 2),
         |d0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS id,
         |    CAST(0 AS BIGINT) AS cost
         |  FROM li WHERE l_partkey % 30 = 0),
         |$rounds
         |SELECT id, cost FROM d6""".stripMargin
    },

    "q_psi" -> {
      val qs = (1 to 9).map(i =>
        s"min(CASE WHEN cum * 10 >= n * $i THEN cents END) AS q$i")
        .mkString(",\n         |    ")
      val ladder = (1 to 9).map(i =>
        s"(CASE WHEN cents > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      // baseline-decile boundaries by exact integer rank arithmetic
      // (cum·10 ≥ n·i ⟺ the discreteQuantiles test at p = i·1000bp);
      // add-one p's are exact-integer ratios; ln fold in bucket order
      s"""WITH av AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
         |    AS BIGINT) AS cents FROM orders
         |  WHERE o_orderdate < '1998-01-01'),
         |bv AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
         |    AS BIGINT) AS cents FROM orders
         |  WHERE o_orderdate >= '1998-01-01'),
         |v AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM av
         |  GROUP BY 1),
         |w AS (SELECT cents,
         |    CAST(sum(c) OVER (ORDER BY cents) AS BIGINT) AS cum,
         |    CAST((SELECT count(*) FROM av) AS BIGINT) AS n FROM v),
         |bnd AS (SELECT $qs
         |  FROM w),
         |ac AS (SELECT CAST(1 + $ladder AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS ca FROM av CROSS JOIN bnd
         |  GROUP BY 1),
         |bc AS (SELECT CAST(1 + $ladder AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS cb FROM bv CROSS JOIN bnd
         |  GROUP BY 1),
         |sp AS (SELECT CAST(u.b AS BIGINT) AS bucket
         |  FROM unnest(generate_series(1, 10)) AS u(b)),
         |byb AS (SELECT sp.bucket, coalesce(ac.ca, 0) AS ca,
         |    coalesce(bc.cb, 0) AS cb
         |  FROM sp LEFT JOIN ac USING (bucket) LEFT JOIN bc USING (bucket)),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(cb) AS BIGINT) AS n_b FROM byb),
         |terms AS (SELECT byb.bucket,
         |    (CAST(ca + 1 AS DOUBLE) / CAST(t.n_a + 10 AS DOUBLE)
         |     - CAST(cb + 1 AS DOUBLE) / CAST(t.n_b + 10 AS DOUBLE))
         |    * ln((CAST(ca + 1 AS DOUBLE) / CAST(t.n_a + 10 AS DOUBLE))
         |        / (CAST(cb + 1 AS DOUBLE) / CAST(t.n_b + 10 AS DOUBLE)))
         |      AS tm
         |  FROM byb CROSS JOIN t)
         |SELECT t.n_a, t.n_b,
         |  round((SELECT list_reduce(list(tm ORDER BY bucket),
         |    (x, y) -> x + y) FROM terms), 6) AS psi
         |FROM t""".stripMargin
    },

    "q_runs_test" ->
      // exact above/below-median runs (ties dropped); z in the same
      // fixed IEEE op order as the Spark side, 6dp
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |v AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM d
        |  GROUP BY 1),
        |w AS (SELECT cents,
        |    CAST(sum(c) OVER (ORDER BY cents) AS BIGINT) AS cum,
        |    CAST((SELECT count(*) FROM d) AS BIGINT) AS n FROM v),
        |med AS (SELECT min(CASE WHEN cum * 2 >= n THEN cents END) AS m
        |  FROM w),
        |sg AS (SELECT day, (cents > (SELECT m FROM med)) AS up
        |  FROM d WHERE cents <> (SELECT m FROM med)),
        |rn AS (SELECT up,
        |    CASE WHEN lag(up) OVER (ORDER BY day) IS NULL THEN 1
        |      WHEN lag(up) OVER (ORDER BY day) <> up THEN 1
        |      ELSE 0 END AS nw
        |  FROM sg),
        |agg AS (SELECT
        |    CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS b,
        |    CAST(sum(nw) AS BIGINT) AS r FROM rn)
        |SELECT a AS n_pos, b AS n_neg, r AS n_runs,
        |  round(CASE WHEN a > 0 AND b > 0 AND
        |      2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |        * (2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |           - CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |        / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |           * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |           * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) - 1.0)) > 0
        |    THEN (CAST(r AS DOUBLE)
        |      - (2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |         / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) + 1.0))
        |      / sqrt(2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |        * (2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |           - CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |        / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |           * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |           * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) - 1.0)))
        |    END, 6) AS z
        |FROM agg""".stripMargin,

    "q_burstiness" -> {
      val norm = normOf("text")
      // D = (N·S2 − S1²)/(N·S1): exact integer moments, zeros folded
      // in via the identity; ONE double division per term
      s"""WITH t AS (SELECT doc_id,
         |    unnest(string_split($norm, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM t GROUP BY 1, 2),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         |SELECT term, CAST(count(*) AS BIGINT) AS df,
         |  CAST(sum(tf) AS BIGINT) AS total_tf,
         |  CAST((SELECT n FROM nn) * sum(tf * tf)
         |      - sum(tf) * sum(tf) AS DOUBLE)
         |    / CAST((SELECT n FROM nn) * sum(tf) AS DOUBLE) AS dispersion
         |FROM tf GROUP BY 1
         |ORDER BY total_tf DESC, term LIMIT 20""".stripMargin
    },

    "q_image_dims" ->
      // GROUND-TRUTH oracle: emits the dimensions the Spark side
      // PLANTED into valid PNG/GIF/JPEG headers, without parsing
      // anything — hash equality proves imageDims' byte-level parse
      // exactly inverts each container layout (24-byte PNG prefix:
      // sig + IHDR len/tag + BE32 w/h; 10-byte GIF prefix: "GIF89a" +
      // LE16 w/h; 45-byte JPEG prefix: SOI + APP0 + COM + SOF0 with
      // BE16 h/w behind the variable-offset marker walk)
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 24 + octet_length(encode(text))
        |       WHEN doc_id % 4 = 1 THEN 10 + octet_length(encode(text))
        |       WHEN doc_id % 4 = 2 THEN 45 + octet_length(encode(text))
        |       ELSE octet_length(encode(text)) END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 4 = 0 THEN 'png'
        |       WHEN doc_id % 4 = 1 THEN 'gif'
        |       WHEN doc_id % 4 = 2 THEN 'jpeg'
        |       ELSE 'unknown' END AS kind,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id % 1024 + 16
        |       WHEN doc_id % 4 = 1 THEN doc_id % 500 + 1
        |       WHEN doc_id % 4 = 2 THEN doc_id % 2000 + 1 END AS BIGINT)
        |    AS width,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN (doc_id * 7) % 1024 + 16
        |       WHEN doc_id % 4 = 1 THEN (doc_id * 3) % 500 + 1
        |       WHEN doc_id % 4 = 2 THEN (doc_id * 5) % 2000 + 1
        |         END AS BIGINT)
        |    AS height
        |FROM documents""".stripMargin,

    "q_multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, CASE WHEN doc_id % 4 = 0
        |    THEN from_hex('89504E47') || encode(text)
        |    ELSE encode(text) END AS payload
        |  FROM documents),
        |m AS (SELECT doc_id AS media_id,
        |    CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        |    lower(substr(hex(payload), 1, 8)) AS magic
        |  FROM b)
        |SELECT media_id, n_bytes, magic,
        |  CASE WHEN magic LIKE '89504e47%' THEN 'png'
        |       WHEN magic LIKE 'ffd8ff%' THEN 'jpeg'
        |       WHEN magic LIKE '47494638%' THEN 'gif'
        |       WHEN magic LIKE '52494646%' THEN 'riff'
        |       WHEN magic LIKE '664c6143%' THEN 'flac'
        |       WHEN magic LIKE '1a45dfa3%' THEN 'mkv'
        |       ELSE 'unknown' END AS kind
        |FROM m""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
        |  FROM events),
        |y AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM x),
        |z AS (
        |  SELECT user_id, us, value,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM y)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
        |  round(sum(value), 2) AS total_value
        |FROM z GROUP BY 1, 2""".stripMargin,

    "q_windowed_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_set_ops" ->
      """SELECT key, 'with_orders' AS tag FROM
        |  (SELECT c_custkey AS key FROM customer
        |   INTERSECT SELECT o_custkey FROM orders) t
        |UNION ALL
        |SELECT key, 'no_orders' AS tag FROM
        |  (SELECT c_custkey AS key FROM customer
        |   EXCEPT SELECT o_custkey FROM orders) t""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_collect_agg" ->
      """WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders),
        |s AS (SELECT o_orderpriority,
        |    string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |  FROM d GROUP BY o_orderpriority)
        |SELECT s.o_orderpriority, s.statuses, c.n
        |FROM s JOIN (SELECT o_orderpriority, count(*) AS n FROM orders
        |             GROUP BY o_orderpriority) c USING (o_orderpriority)""".stripMargin,

    "q_window_funcs" ->
      """SELECT event_id, user_id,
        |  round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 2) AS prev_value,
        |  round(lead(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 2) AS next_value,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
        |FROM events""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  reverse(c_name) AS reversed,
        |  substr(c_name, 10, 5) AS sub,
        |  regexp_replace(c_mktsegment, 'A', '@', 'g') AS replaced,
        |  levenshtein(c_mktsegment, reverse(c_mktsegment)) AS edit_dist
        |FROM customer""".stripMargin,

    "q_date_funcs" ->
      // NB: on TIMESTAMP_NS-derived dates duckdb's `+ INTERVAL 1 MONTH`
      // silently degrades to +30 days — month arithmetic is therefore
      // spelled out via make_date with end-of-month clamping (the exact
      // semantics of Spark's add_months)
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders),
        |f AS (SELECT *, make_date(
        |    year(d) + CASE WHEN month(d) = 12 THEN 1 ELSE 0 END,
        |    CASE WHEN month(d) = 12 THEN 1 ELSE month(d) + 1 END, 1) AS m1
        |  FROM t)
        |SELECT o_orderkey,
        |  CAST(CAST(d + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus_30d,
        |  CAST(make_date(year(m1), month(m1),
        |    least(day(d), day(last_day(m1)))) AS VARCHAR) AS plus_1m,
        |  CAST(CAST(date_trunc('month', d) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        |  CAST(quarter(d) AS BIGINT) AS qtr
        |FROM f""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS centv
         |      FROM embeddings WHERE vec_id % 250 = 0),
         |corp AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |qry AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id % 1000 = 0),
         |asg AS (SELECT nn_id, arg_min(cid, ${sqDistSql("cv", "centv")}) AS cell
         |      FROM corp, cent GROUP BY nn_id),
         |pr AS (SELECT q_id, cell FROM (
         |    SELECT q_id, cid AS cell,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY ${sqDistSql("qv", "centv")}, cid) AS prn
         |    FROM qry, cent) t WHERE prn <= 2),
         |scored AS (
         |  SELECT p.q_id, a.nn_id, ${cosSql("q.qv", "c2.cv")} AS c
         |  FROM pr p JOIN asg a ON a.cell = p.cell
         |  JOIN qry q ON q.q_id = p.q_id
         |  JOIN corp c2 ON c2.nn_id = a.nn_id
         |  WHERE p.q_id <> a.nn_id),
         |r AS (SELECT q_id, nn_id, c,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nn_id) AS "rank"
         |  FROM scored)
         |SELECT q_id, nn_id, "rank", round(c, 4) AS cos FROM r WHERE "rank" <= 5""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT arg_max(c.event_id, c.ts_us) FROM c
        |   WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us) AS click_id,
        |  (SELECT round(arg_max(c.value, c.ts_us), 2) FROM c
        |   WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us) AS click_value
        |FROM p""".stripMargin,

    "q_range_window" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
        |SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS trailing_1h
        |FROM t""".stripMargin,

    "q_cube_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_split_assign" ->
      """WITH t AS (SELECT doc_id,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        |  FROM documents)
        |SELECT CASE WHEN h IN ('c','d') THEN 'val'
        |            WHEN h IN ('e','f') THEN 'test'
        |            ELSE 'train' END AS split, count(*) AS n
        |FROM t GROUP BY 1""".stripMargin,

    "q_validate" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |    count(CASE WHEN NOT (o_totalprice > 0) THEN 1 END) AS v1,
        |    count(CASE WHEN NOT (o_orderstatus IN ('F','O','P')) THEN 1 END) AS v2,
        |    count(CASE WHEN NOT (o_custkey IS NOT NULL) THEN 1 END) AS v3,
        |    count(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01') THEN 1 END) AS v4
        |  FROM orders)
        |SELECT 'totalprice_positive' AS rule, n_rows, v1 AS n_violations, v1 = 0 AS pass FROM a
        |UNION ALL SELECT 'status_known', n_rows, v2, v2 = 0 FROM a
        |UNION ALL SELECT 'custkey_not_null', n_rows, v3, v3 = 0 FROM a
        |UNION ALL SELECT 'date_in_range', n_rows, v4, v4 = 0 FROM a""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_pii_mask" ->
      """WITH t AS (SELECT doc_id,
        |    text || ' contact: user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS wp
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(wp,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+?\d[\d-]{7,}\d', '[PHONE]', 'g') AS masked
        |FROM t""".stripMargin,

    // PII detection with validation: same unrolled 16-position Luhn
    // as TextFunctions.luhn16 (integer arithmetic only), octet range
    // check via the same split+filter shape. RE2 and Java agree on
    // these ASCII patterns incl. \b.
    "q_pii_detect" -> {
      val luhn = (1 to 16).map { i =>
        val d = s"CAST(substring(x, $i, 1) AS INT)"
        if ((17 - i) % 2 == 0) s"(CASE WHEN $d*2 > 9 THEN $d*2 - 9 ELSE $d*2 END)"
        else d
      }.mkString("(", " + ", ") % 10 = 0")
      val ipOk = "len(list_filter(string_split(x, '.'), p -> CAST(p AS INT) > 255)) = 0"
      s"""WITH t AS (SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' card 4532015112830366 on file'
         |         WHEN doc_id % 3 = 1 THEN ' card 4532015112830367 on file'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 2 = 0 THEN ' from 10.1.2.3'
         |         ELSE ' from 999.1.2.300' END ||
         |    ' user' || CAST(doc_id AS VARCHAR) || '@example.com' AS txt
         |  FROM documents),
         |e AS (SELECT doc_id,
         |    regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS emails,
         |    regexp_extract_all(txt, '\\b\\d{16}\\b') AS cards,
         |    regexp_extract_all(txt, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b') AS ips
         |  FROM t)
         |SELECT doc_id,
         |  CAST(len(emails) AS BIGINT) AS n_email,
         |  CAST(len(cards) AS BIGINT) AS n_card_cand,
         |  CAST(len(list_filter(cards, x -> $luhn)) AS BIGINT) AS n_card_valid,
         |  CAST(len(ips) AS BIGINT) AS n_ip_cand,
         |  CAST(len(list_filter(ips, x -> $ipOk)) AS BIGINT) AS n_ip_valid,
         |  (len(emails) > 0 OR len(list_filter(cards, x -> $luhn)) > 0
         |    OR len(list_filter(ips, x -> $ipOk)) > 0) AS has_pii
         |FROM e""".stripMargin
    },

    "q_curate_corpus" ->
      s"""WITH $corpusCte,
         |enr AS (
         |  SELECT doc_id, text,
         |    floor((
         |      least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0) * 0.4
         |      + (CASE WHEN length(text) > 0
         |           THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |             / CAST(length(text) AS DOUBLE) ELSE 0.0 END) * 0.3
         |      + (CASE WHEN len(string_split_regex(trim(text), '\\s+')) > 0
         |           THEN ${langScoreSql(s"string_split(${normOf("text")}, ' ')", enW)}
         |             / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
         |           ELSE 0.0 END) * 0.3
         |      ) * 10000.0 + 0.5) / 10000.0 AS quality,
         |    ${langScoreSql(s"string_split(${normOf("text")}, ' ')", enW)} AS s_en,
         |    ${langScoreSql(s"string_split(${normOf("text")}, ' ')", esW)} AS s_es,
         |    ${langScoreSql(s"string_split(${normOf("text")}, ' ')", deW)} AS s_de,
         |    ${langScoreSql(s"string_split(${normOf("text")}, ' ')", frW)} AS s_fr
         |  FROM corpus),
         |filt AS (
         |  SELECT doc_id, text, quality FROM enr
         |  WHERE quality >= 0.3 AND s_en >= greatest(s_es, s_de, s_fr)),
         |dedup AS (
         |  SELECT doc_id, quality, row_number() OVER (
         |    PARTITION BY md5(${normOf("text")}) ORDER BY doc_id) AS rn
         |  FROM filt),
         |assigned AS (
         |  SELECT doc_id, quality,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
         |  FROM dedup WHERE rn = 1)
         |SELECT CASE WHEN h IN ('c','d') THEN 'val'
         |            WHEN h IN ('e','f') THEN 'test'
         |            ELSE 'train' END AS split,
         |  count(*) AS n_docs, round(avg(quality), 4) AS avg_quality
         |FROM assigned GROUP BY 1""".stripMargin,

    // identical semantics to q_asof_join — same oracle, different
    // physical implementation on the Spark side (native custom exec)
    "q_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT arg_max(c.event_id, c.ts_us) FROM c
        |   WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us) AS click_id,
        |  (SELECT round(arg_max(c.value, c.ts_us), 2) FROM c
        |   WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us) AS click_value
        |FROM p""".stripMargin,

    "q_repetition" ->
      s"""WITH shd AS (
         |  SELECT doc_id AS id, w[u.i] || ' ' || w[u.i+1] AS sh
         |  FROM (SELECT doc_id, string_split(${normOf("text")}, ' ') AS w
         |        FROM documents) t,
         |       unnest(generate_series(1, len(w) - 1)) AS u(i)),
         |bi AS (
         |  SELECT id AS doc_id, sh AS bg, count(*) AS c
         |  FROM shd GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, max(c) AS max_bg, sum(c) AS n_bg FROM bi GROUP BY doc_id),
         |wl AS (
         |  SELECT doc_id, round(avg(length(u.w)), 4) AS mean_word_len
         |  FROM (SELECT doc_id, string_split(${normOf("text")}, ' ') AS w FROM documents) t,
         |       unnest(w) AS u(w)
         |  GROUP BY doc_id)
         |SELECT agg.doc_id, CAST(max_bg AS BIGINT) AS max_bg,
         |  CAST(n_bg AS BIGINT) AS n_bg,
         |  round(max_bg / CAST(n_bg AS DOUBLE), 4) AS top_bigram_frac,
         |  mean_word_len
         |FROM agg JOIN wl ON agg.doc_id = wl.doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id
        |FROM c""".stripMargin,

    "q_shuffle_shards" ->
      // shuffleShards digit-by-digit: h = first-8-hex of md5('ep1'||id)
      // summed positionally (each term an exact power of 2 — the
      // q_weighted_sample technique, DuckDB 1.0 has no conv());
      // shard = h mod 8, pos = rank within shard by (h, id)
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      (strpos('0123456789abcdef',
        |         substr(md5('ep1' || CAST(doc_id AS VARCHAR)),
        |           CAST(i AS INT), 1)) - 1)
        |      * 2.0 ** (4 * (8 - i)))) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, h % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM s""".stripMargin,

    "q_sql_api" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,

    "q_minmax_by" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, o_totalprice * 1000000000.0 + o_orderkey) AS key_of_max_price,
        |  arg_min(o_orderkey, o_totalprice * 1000000000.0 + o_orderkey) AS key_of_min_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        |    count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        |    count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        |    count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        |    count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus AS status, priority, n
        |FROM wide UNPIVOT (n FOR priority IN
        |  ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))""".stripMargin,

    "q_explode_embeddings" ->
      """SELECT vec_id, CAST(u.i AS BIGINT) AS idx,
        |  round(CAST(embedding[u.i] AS DOUBLE), 6) AS value
        |FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)""".stripMargin,

    "q_quantize_int8" ->
      // codes via floor(+0.5) on identically-computed doubles — no
      // engine round() involved, so the integer output is bit-exact
      """WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
        |    CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i)),
        |s AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1)
        |SELECT vec_id, f.pos,
        |  CASE WHEN mx = mn THEN 0
        |    ELSE least(greatest(
        |      CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
        |      0), 255) END AS code
        |FROM f JOIN s USING(pos)""".stripMargin,

    "q_kmeans_fixed" -> {
      // integer k-means, 3 UNROLLED Lloyd rounds over the int8 codes
      // (the q_quantize_int8 fragment): distances are exact-integer
      // Σ(Δcode)², argmin ties to the lowest cid, centroid update is
      // per-dim sum // count (integer division), inertia an exact
      // integer sum — all order-free, hence a HARD hash gate on Lloyd
      // training (float q_kmeans cannot be: fp-order inertia). Init =
      // k lowest (md5(vec_id), vec_id), cids in vec_id order —
      // engine-portable, mirroring Similarity.kmeansFixedTrain.
      // DuckDB sum(BIGINT) widens to HUGEINT → re-cast per round.
      val k = 8
      val iters = 3
      val iterCtes = (1 to iters).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT f.vec_id, c.cid,
           |    CAST(sum((f.code - c.cv) * (f.code - c.cv)) AS BIGINT) AS d
           |  FROM codes f JOIN c${i - 1} c ON c.pos = f.pos
           |  GROUP BY 1, 2),
           |a$i AS MATERIALIZED (
           |  SELECT vec_id, min(cid) AS cid FROM (
           |    SELECT vec_id, cid, d, min(d) OVER (PARTITION BY vec_id) AS md
           |    FROM d$i) t
           |  WHERE d = md GROUP BY 1),
           |c$i AS MATERIALIZED (
           |  SELECT c.cid, c.pos, coalesce(u.v, c.cv) AS cv
           |  FROM c${i - 1} c LEFT JOIN (
           |    SELECT a.cid, f.pos,
           |      CAST(sum(f.code) // count(*) AS BIGINT) AS v
           |    FROM a$i a JOIN codes f USING (vec_id) GROUP BY 1, 2) u
           |    ON u.cid = c.cid AND u.pos = c.pos)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[u.i] AS DOUBLE) AS x
         |  FROM embeddings,
         |    unnest(generate_series(1, len(embedding))) AS u(i)),
         |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
         |codes AS MATERIALIZED (
         |  SELECT vec_id, f.pos,
         |    CASE WHEN mx = mn THEN 0
         |      ELSE least(greatest(
         |        CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
         |        0), 255) END AS code
         |  FROM f JOIN st USING (pos)),
         |pick AS MATERIALIZED (
         |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
         |  FROM (SELECT vec_id FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $k) p),
         |c0 AS MATERIALIZED (
         |  SELECT p.cid, f.pos, f.code AS cv
         |  FROM pick p JOIN codes f USING (vec_id)),
         |$iterCtes,
         |dF AS MATERIALIZED (
         |  SELECT f.vec_id, c.cid,
         |    CAST(sum((f.code - c.cv) * (f.code - c.cv)) AS BIGINT) AS d
         |  FROM codes f JOIN c$iters c ON c.pos = f.pos
         |  GROUP BY 1, 2),
         |aF AS MATERIALIZED (
         |  SELECT vec_id, min(cid) AS cid, min(md) AS d FROM (
         |    SELECT vec_id, cid, d, min(d) OVER (PARTITION BY vec_id) AS md
         |    FROM dF) t
         |  WHERE d = md GROUP BY 1),
         |cs AS (SELECT cid, CAST(sum(cv) AS BIGINT) AS centroid_sum
         |       FROM c$iters GROUP BY 1)
         |SELECT a.cid, count(*) AS n_assigned,
         |  CAST(sum(a.d) AS BIGINT) AS inertia, cs.centroid_sum
         |FROM aF a JOIN cs USING (cid)
         |GROUP BY a.cid, cs.centroid_sum""".stripMargin
    },

    "q_kcenter" -> {
      // Gonzalez farthest-first, k−1 UNROLLED rounds over the int8
      // codes: each round picks argmax of the running min-distance
      // (ties to the lowest id — ORDER BY mind DESC, vec_id LIMIT 1)
      // and folds the new center into the running min. All distances
      // exact integers; the final argmin assignment ties to the
      // lowest pick order. Mirrors Similarity.kCenterSelect.
      val k = 8
      // center lookup is an equi-join to the 1-row p$i CTE, NOT a
      // scalar subquery in the join predicate — DuckDB 1.0 plans the
      // scalar form as a re-evaluated filter and q_kcenter went from
      // 0.7s to unbounded (>45 min, 80 GB) at sf0.1; the join form is
      // the same rows (asserted identical at sf0.01 before switching)
      val rounds = (2 to k).map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT vec_id FROM m${i - 1}
           |  ORDER BY mind DESC, vec_id LIMIT 1),
           |m$i AS MATERIALIZED (
           |  SELECT m.vec_id, least(m.mind, d.d) AS mind
           |  FROM m${i - 1} m JOIN (
           |    SELECT f.vec_id,
           |      CAST(sum((f.code - c.code) * (f.code - c.code))
           |        AS BIGINT) AS d
           |    FROM p$i pp
           |    JOIN codes c ON c.vec_id = pp.vec_id
           |    JOIN codes f ON f.pos = c.pos
           |    GROUP BY 1) d ON d.vec_id = m.vec_id)""".stripMargin
      }.mkString(",\n")
      val centsUnion = (1 to k).map(i =>
        s"SELECT CAST(${i - 1} AS BIGINT) AS cid, vec_id FROM p$i")
        .mkString("\n  UNION ALL ")
      s"""WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[u.i] AS DOUBLE) AS x
         |  FROM embeddings,
         |    unnest(generate_series(1, len(embedding))) AS u(i)),
         |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
         |codes AS MATERIALIZED (
         |  SELECT vec_id, f.pos,
         |    CASE WHEN mx = mn THEN 0
         |      ELSE least(greatest(
         |        CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
         |        0), 255) END AS code
         |  FROM f JOIN st USING (pos)),
         |p1 AS MATERIALIZED (
         |  SELECT vec_id FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
         |m1 AS MATERIALIZED (
         |  SELECT f.vec_id,
         |    CAST(sum((f.code - c.code) * (f.code - c.code)) AS BIGINT) AS mind
         |  FROM p1 pp
         |  JOIN codes c ON c.vec_id = pp.vec_id
         |  JOIN codes f ON f.pos = c.pos
         |  GROUP BY 1),
         |$rounds,
         |cents AS MATERIALIZED (
         |  $centsUnion),
         |ad AS MATERIALIZED (
         |  SELECT f.vec_id, ct.cid,
         |    CAST(sum((f.code - c.code) * (f.code - c.code)) AS BIGINT) AS d
         |  FROM cents ct
         |  JOIN codes c ON c.vec_id = ct.vec_id
         |  JOIN codes f ON f.pos = c.pos
         |  GROUP BY 1, 2),
         |asg AS (SELECT vec_id, min(cid) AS cid, min(md) AS d FROM (
         |    SELECT vec_id, cid, d, min(d) OVER (PARTITION BY vec_id) AS md
         |    FROM ad) t
         |  WHERE d = md GROUP BY 1)
         |SELECT a.cid, ct.vec_id AS center_id,
         |  count(*) AS n_assigned, CAST(max(a.d) AS BIGINT) AS max_d
         |FROM asg a JOIN cents ct ON ct.cid = a.cid
         |GROUP BY 1, 2""".stripMargin
    },

    "q_pq_fixed" -> {
      // integer PQ: q_kmeans_fixed's unrolled Lloyd rounds with the
      // subspace id joined into every grouping key — all m=8 codebooks
      // train in the same relational steps. Distances/updates are
      // exact integers over the int8 codes (sb = pos // (dim/8) —
      // subspace width derived from the data, the testdata ships both
      // 32- and 64-dim embeddings); init = the SAME k=16 lowest-
      // (md5, id) docs seeding every subspace, mirroring
      // Similarity.pqFixedEncode.
      val k = 16
      val iters = 3
      val iterCtes = (1 to iters).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT s.vec_id, s.sb, c.cid,
           |    CAST(sum((s.code - c.cv) * (s.code - c.cv)) AS BIGINT) AS d
           |  FROM sub s JOIN c${i - 1} c ON c.sb = s.sb AND c.lp = s.lp
           |  GROUP BY 1, 2, 3),
           |a$i AS MATERIALIZED (
           |  SELECT vec_id, sb, min(cid) AS cid FROM (
           |    SELECT vec_id, sb, cid, d,
           |      min(d) OVER (PARTITION BY vec_id, sb) AS md
           |    FROM d$i) t
           |  WHERE d = md GROUP BY 1, 2),
           |c$i AS MATERIALIZED (
           |  SELECT c.sb, c.cid, c.lp, coalesce(u.v, c.cv) AS cv
           |  FROM c${i - 1} c LEFT JOIN (
           |    SELECT a.sb, a.cid, s.lp,
           |      CAST(sum(s.code) // count(*) AS BIGINT) AS v
           |    FROM a$i a JOIN sub s
           |      ON s.vec_id = a.vec_id AND s.sb = a.sb
           |    GROUP BY 1, 2, 3) u
           |    ON u.sb = c.sb AND u.cid = c.cid AND u.lp = c.lp)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[u.i] AS DOUBLE) AS x
         |  FROM embeddings,
         |    unnest(generate_series(1, len(embedding))) AS u(i)),
         |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
         |codes AS (
         |  SELECT vec_id, f.pos,
         |    CASE WHEN mx = mn THEN 0
         |      ELSE least(greatest(
         |        CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
         |        0), 255) END AS code
         |  FROM f JOIN st USING (pos)),
         |dims AS (SELECT CAST((max(pos) + 1) // 8 AS BIGINT) AS sd
         |         FROM codes),
         |sub AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(pos // (SELECT sd FROM dims) AS BIGINT) AS sb,
         |    CAST(pos % (SELECT sd FROM dims) AS BIGINT) AS lp, code
         |  FROM codes),
         |pick AS MATERIALIZED (
         |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
         |  FROM (SELECT vec_id FROM embeddings
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |        LIMIT $k) p),
         |c0 AS MATERIALIZED (
         |  SELECT p.cid, s.sb, s.lp, s.code AS cv
         |  FROM pick p JOIN sub s USING (vec_id)),
         |$iterCtes,
         |dF AS MATERIALIZED (
         |  SELECT s.vec_id, s.sb, c.cid,
         |    CAST(sum((s.code - c.cv) * (s.code - c.cv)) AS BIGINT) AS d
         |  FROM sub s JOIN c$iters c ON c.sb = s.sb AND c.lp = s.lp
         |  GROUP BY 1, 2, 3)
         |SELECT vec_id, sb, min(cid) AS code FROM (
         |  SELECT vec_id, sb, cid, d,
         |    min(d) OVER (PARTITION BY vec_id, sb) AS md
         |  FROM dF) t
         |WHERE d = md GROUP BY 1, 2""".stripMargin
    },

    "q_readability" ->
      // each ratio is ONE IEEE division of exact integers; the linear
      // Flesch forms evaluate left-assoc with identical literals on
      // both engines; floor(+0.5) half-up handles the negative scores
      // garbage text produces (engine round() never involved)
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS reading_ease,
        |  CASE WHEN n_words > 0 THEN
        |    floor((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59)
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS fk_grade
        |FROM t""".stripMargin,

    "q_mojibake" ->
      // artifacts planted identically (doc_id%5=0: 'e' -> 'Ã©'), then
      // counted with alternation + '.' — syntax Java regex and RE2
      // read the same over code points; \xNN class escapes likewise
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN replace(text, 'e', 'Ã©')
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '(Ã.|â€.|Â.|�)')) AS BIGINT) AS n_moji,
        |  CAST(len(regexp_extract_all(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_ctrl,
        |  len(regexp_extract_all(text, '(Ã.|â€.|Â.|�)')) > 0 AS flagged
        |FROM c""".stripMargin,

    "q_clustering_coeff" -> {
      // same pair fragments as q_dedup_ngram, then id-ordered triangle
      // enumeration (a<b<c, closing-edge inner join) credited to all
      // three corners; lcc = 2T/(d(d-1)) is one IEEE division of
      // exact integers — raw-double safe
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |deg AS (SELECT id, count(*) AS degree FROM (
         |    SELECT id_a AS id FROM pairs
         |    UNION ALL SELECT id_b FROM pairs) t GROUP BY 1),
         |tris AS MATERIALIZED (
         |  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         |  FROM pairs e1
         |  JOIN pairs e2 ON e2.id_a = e1.id_b
         |  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
         |tpn AS (SELECT id, count(*) AS n_tri FROM (
         |    SELECT a AS id FROM tris
         |    UNION ALL SELECT b FROM tris
         |    UNION ALL SELECT c FROM tris) t GROUP BY 1)
         |SELECT d.id AS doc_id, d.degree,
         |  coalesce(t.n_tri, 0) AS n_tri,
         |  CASE WHEN d.degree >= 2 THEN
         |    CAST(coalesce(t.n_tri, 0) * 2 AS DOUBLE)
         |      / (d.degree * (d.degree - 1))
         |  ELSE 0.0 END AS lcc
         |FROM deg d LEFT JOIN tpn t ON t.id = d.id""".stripMargin
    },

    "q_seq_patterns" ->
      // skip-gram pairs at positional gap 1..3 under the total
      // (ts, event_id) per-user order; exact counts
      """WITH p AS (SELECT user_id AS u, event_type AS t,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT a.t AS e_a, b.t AS e_b, count(*) AS n_pairs,
        |  count(DISTINCT a.u) AS n_users
        |FROM p a JOIN p b ON a.u = b.u
        |  AND b.rn - a.rn BETWEEN 1 AND 3
        |GROUP BY 1, 2""".stripMargin,

    "q_temperature_mix" ->
      // w = floor(sqrt(n)·1e6): IEEE sqrt is correctly rounded, the
      // product and floor deterministic; Σw and the takes are integer
      // arithmetic — no Σ√n double-sum fold-order exposure
      """WITH c AS (SELECT source, count(*) AS n_avail
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_avail,
        |    CAST(floor(sqrt(CAST(n_avail AS DOUBLE)) * 1000000.0)
        |      AS BIGINT) AS w_micro
        |  FROM c),
        |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wt FROM w)
        |SELECT source, n_avail, w_micro,
        |  least(n_avail, (300 * w_micro) // (SELECT wt FROM t)) AS n_take
        |FROM w""".stripMargin,

    "q_k_anonymize" ->
      // suppression: windowed group count ≥ k
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |  FROM customer),
        |w AS (SELECT *, count(*) OVER (
        |    PARTITION BY c_mktsegment, nation) AS n FROM c)
        |SELECT c_custkey, c_mktsegment, nation, bal_band
        |FROM w WHERE n >= 3""".stripMargin,

    "q_l_diversify" ->
      // suppress quasi groups with < 2 distinct sensitive values
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(c_nationkey AS BIGINT) AS nation,
        |    CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign
        |  FROM customer),
        |ok AS (SELECT c_mktsegment, nation
        |  FROM c GROUP BY 1, 2
        |  HAVING count(DISTINCT bal_sign) >= 2)
        |SELECT c.c_custkey, c.c_mktsegment, c.nation, c.bal_sign
        |FROM c JOIN ok USING (c_mktsegment, nation)""".stripMargin,

    "q_qq_table" ->
      // per-group exact discrete quantile values at rank ⌈q·ng/10⌉,
      // pure integer rank arithmetic
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |r AS (SELECT c_mktsegment, cents,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, c_custkey) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ng
        |  FROM c),
        |q AS (SELECT CAST(u.q AS BIGINT) AS q
        |      FROM unnest(generate_series(1, 9)) AS u(q))
        |SELECT q.q,
        |  max(CASE WHEN c_mktsegment = 'BUILDING' THEN cents END) AS v_a,
        |  max(CASE WHEN c_mktsegment = 'MACHINERY' THEN cents END) AS v_b
        |FROM r JOIN q ON r.r = (q.q * r.ng + 9) // 10
        |GROUP BY 1""".stripMargin,

    "q_ks_test" ->
      // max CDF gap carried as the integral numerator
      // |cumA·n_b − cumB·n_a|; d is ONE double division of exact ints
      """WITH c AS (SELECT c_mktsegment AS g,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |v AS (SELECT cents,
        |    CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM c GROUP BY 1),
        |w AS (SELECT CAST(sum(ca) OVER (ORDER BY cents) AS BIGINT) AS cuma,
        |             CAST(sum(cb) OVER (ORDER BY cents) AS BIGINT) AS cumb
        |      FROM v),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |             CAST(sum(cb) AS BIGINT) AS n_b FROM v)
        |SELECT t.n_a, t.n_b,
        |  CAST(max(abs(w.cuma * t.n_b - w.cumb * t.n_a)) AS BIGINT)
        |    AS d_num,
        |  CAST(max(abs(w.cuma * t.n_b - w.cumb * t.n_a)) AS DOUBLE)
        |    / CAST(t.n_a * t.n_b AS DOUBLE) AS d
        |FROM w CROSS JOIN t GROUP BY t.n_a, t.n_b""".stripMargin,

    "q_auc" ->
      // exact ROC AUC ≡ Mann–Whitney: ties at ½ via the integral
      // 2U = Σ p·(2·negBelow + q); auc ONE double division
      """WITH e AS (SELECT (event_type = 'purchase') AS pos,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |v AS (SELECT cents,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS q
        |  FROM e GROUP BY 1),
        |w AS (SELECT p, q,
        |    CAST(coalesce(sum(q) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS qb
        |  FROM v)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(q) AS BIGINT) AS n_neg,
        |  CAST(sum(p * (qb * 2 + q)) AS BIGINT) AS u2,
        |  CAST(sum(p * (qb * 2 + q)) AS DOUBLE)
        |    / CAST(sum(p) * sum(q) * 2 AS DOUBLE) AS auc
        |FROM w""".stripMargin,

    "q_chi_square" ->
      // chi² term (o·N − r·c)²/(N·r·c) with integer deviation, MI term
      // (o/N)·ln(o·N/(r·c)) dividing exact integer products; sums fold
      // in sorted (a,b) cell order (list_reduce seeds with the first
      // element — identical to the 0.0-seeded left fold), 6dp
      """WITH c AS (SELECT c_mktsegment AS a,
        |    CAST(c_nationkey AS BIGINT) AS b FROM customer),
        |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS rr FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cc FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ra,
        |    CAST(count(DISTINCT b) AS BIGINT) AS cb FROM cells),
        |terms AS (SELECT cells.a, cells.b,
        |    CAST(cells.o * t.n - r.rr * ct.cc AS DOUBLE) AS dev,
        |    CAST(t.n AS DOUBLE) * CAST(r.rr AS DOUBLE)
        |      * CAST(ct.cc AS DOUBLE) AS den,
        |    CAST(cells.o AS DOUBLE) / CAST(t.n AS DOUBLE)
        |      * ln(CAST(cells.o * t.n AS DOUBLE)
        |            / CAST(r.rr * ct.cc AS DOUBLE)) AS mi
        |  FROM cells JOIN r USING (a) JOIN ct USING (b) CROSS JOIN t),
        |rc AS (SELECT CAST(sum(r.rr * ct.cc) AS BIGINT) AS src
        |  FROM cells JOIN r USING (a) JOIN ct USING (b)),
        |f AS (SELECT
        |    list_reduce(list(dev * dev / den ORDER BY a, b),
        |      (x, y) -> x + y)
        |    + CAST((SELECT t.n * t.n FROM t) - (SELECT src FROM rc)
        |        AS DOUBLE) / CAST((SELECT t.n FROM t) AS DOUBLE) AS chi2,
        |    list_reduce(list(mi ORDER BY a, b), (x, y) -> x + y) AS mi2
        |  FROM terms)
        |SELECT t.n, t.ra AS n_rows, t.cb AS n_cols,
        |  (t.ra - 1) * (t.cb - 1) AS dof,
        |  round(f.chi2, 6) AS chi2,
        |  round(CASE WHEN least(t.ra - 1, t.cb - 1) > 0
        |    THEN sqrt(f.chi2 /
        |      CAST(t.n * least(t.ra - 1, t.cb - 1) AS DOUBLE)) END, 6)
        |    AS cramers_v,
        |  round(f.mi2, 6) AS mi_nats
        |FROM f CROSS JOIN t""".stripMargin,

    "q_naive_bayes" -> {
      val norm = normOf("text")
      // model state is exact integer counts; each likelihood divides
      // exact ints inside one ln; per-(doc,class) scores fold in
      // sorted-term order (list_reduce seeding ≡ 0.0-seeded fold);
      // argmax by (score desc, class asc) — class gaps are O(1),
      // far above ln ulp noise; 6dp at output
      s"""WITH toks AS (SELECT doc_id, lang,
         |    unnest(string_split($norm, ' ')) AS term FROM documents),
         |ctk AS (SELECT lang AS k, term, CAST(count(*) AS BIGINT) AS ctk
         |  FROM toks GROUP BY 1, 2),
         |nk AS (SELECT k, CAST(sum(ctk) AS BIGINT) AS nk FROM ctk
         |  GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ctk),
         |pri AS (SELECT lang AS k, CAST(count(*) AS BIGINT) AS dk
         |  FROM documents GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |con AS (SELECT tf.doc_id, nk.k, tf.term,
         |    CAST(tf.tf AS DOUBLE)
         |      * ln(CAST(coalesce(ctk.ctk, 0) + 1 AS DOUBLE)
         |            / CAST(nk.nk + vv.v AS DOUBLE)) AS c
         |  FROM tf CROSS JOIN nk CROSS JOIN vv
         |  LEFT JOIN ctk ON ctk.k = nk.k AND ctk.term = tf.term),
         |sc AS (SELECT con.doc_id, con.k,
         |    ln(CAST(pri.dk AS DOUBLE) / CAST(nd.nd AS DOUBLE))
         |      + list_reduce(list(c ORDER BY term), (x, y) -> x + y) AS s
         |  FROM con JOIN pri ON pri.k = con.k CROSS JOIN nd
         |  GROUP BY con.doc_id, con.k, pri.dk, nd.nd),
         |r AS (SELECT doc_id, k, s,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY s DESC, k) AS rn FROM sc)
         |SELECT d.doc_id, d.lang, r.k AS pred, round(r.s, 6) AS score
         |FROM r JOIN documents d USING (doc_id) WHERE r.rn = 1""".stripMargin
    },

    "q_perceptron" -> {
      val norm = normOf("text")
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      // 3 UNROLLED batch-perceptron rounds in exact integer
      // arithmetic: round 1 starts from w=0 (every margin 0, every
      // doc misclassified), each later round adds Σ_mis y·tf per
      // bucket and Σ_mis y to the bias; final row set = per-bucket
      // weights + (−1, bias) + (−2, error count under the final
      // weights). Integer sums are order-free ⇒ hard hash gate on
      // supervised TRAINING. MATERIALIZED: each round reads the
      // previous twice (the q_kcore inlining lesson).
      s"""WITH t AS (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |    unnest(string_split($norm, ' ')) AS term FROM documents),
         |x AS (SELECT doc_id, y, md5(term) AS h FROM t),
         |f AS MATERIALIZED (SELECT doc_id, y,
         |    CAST((16 * ${hv(7)} + ${hv(8)}) % 64 AS BIGINT) AS b,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM x GROUP BY 1, 2, 3),
         |w1 AS MATERIALIZED (SELECT b, CAST(sum(y * tf) AS BIGINT) AS w
         |  FROM f GROUP BY 1),
         |bias1 AS (SELECT CAST(sum(y) AS BIGINT) AS v
         |  FROM (SELECT DISTINCT doc_id, y FROM f)),
         |m2 AS MATERIALIZED (SELECT f.doc_id, f.y,
         |    CAST(sum(f.tf * coalesce(w1.w, 0)) AS BIGINT)
         |      + (SELECT v FROM bias1) AS m
         |  FROM f LEFT JOIN w1 USING (b) GROUP BY 1, 2),
         |mis2 AS MATERIALIZED (SELECT doc_id, y FROM m2 WHERE y * m <= 0),
         |d2 AS (SELECT f.b, CAST(sum(f.y * f.tf) AS BIGINT) AS d
         |  FROM f JOIN (SELECT doc_id FROM mis2) q USING (doc_id)
         |  GROUP BY 1),
         |w2 AS MATERIALIZED (SELECT coalesce(w1.b, d2.b) AS b,
         |    CAST(coalesce(w1.w, 0) + coalesce(d2.d, 0) AS BIGINT) AS w
         |  FROM w1 FULL OUTER JOIN d2 ON w1.b = d2.b),
         |bias2 AS (SELECT (SELECT v FROM bias1)
         |    + CAST(coalesce((SELECT sum(y) FROM mis2), 0) AS BIGINT) AS v),
         |m3 AS MATERIALIZED (SELECT f.doc_id, f.y,
         |    CAST(sum(f.tf * coalesce(w2.w, 0)) AS BIGINT)
         |      + (SELECT v FROM bias2) AS m
         |  FROM f LEFT JOIN w2 USING (b) GROUP BY 1, 2),
         |mis3 AS MATERIALIZED (SELECT doc_id, y FROM m3 WHERE y * m <= 0),
         |d3 AS (SELECT f.b, CAST(sum(f.y * f.tf) AS BIGINT) AS d
         |  FROM f JOIN (SELECT doc_id FROM mis3) q USING (doc_id)
         |  GROUP BY 1),
         |w3 AS MATERIALIZED (SELECT coalesce(w2.b, d3.b) AS b,
         |    CAST(coalesce(w2.w, 0) + coalesce(d3.d, 0) AS BIGINT) AS w
         |  FROM w2 FULL OUTER JOIN d3 ON w2.b = d3.b),
         |bias3 AS (SELECT (SELECT v FROM bias2)
         |    + CAST(coalesce((SELECT sum(y) FROM mis3), 0) AS BIGINT) AS v),
         |mf AS (SELECT f.doc_id, f.y,
         |    CAST(sum(f.tf * coalesce(w3.w, 0)) AS BIGINT)
         |      + (SELECT v FROM bias3) AS m
         |  FROM f LEFT JOIN w3 USING (b) GROUP BY 1, 2),
         |errs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM mf
         |  WHERE y * m <= 0)
         |SELECT bk.b AS bucket, CAST(coalesce(w3.w, 0) AS BIGINT) AS weight
         |FROM (SELECT DISTINCT b FROM f) bk LEFT JOIN w3 USING (b)
         |UNION ALL SELECT -1, (SELECT v FROM bias3)
         |UNION ALL SELECT -2, (SELECT v FROM errs)""".stripMargin
    },

    "q_ece" ->
      // Stats.expectedCalibrationError mirror: exact micro integers
      // end to end — equal-width bins via integer floor div, per-bin
      // floor-div acc/conf, weighted-gap sum, one final floor div
      """WITH e AS (SELECT (event_type = 'purchase') AS y,
        |    least(CAST(floor(value * 1000 + 0.5) AS BIGINT), 1000000)
        |      AS conf
        |  FROM events),
        |b AS (SELECT least(conf * 10 // 1000000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(conf) AS BIGINT) AS sconf
        |  FROM e GROUP BY 1),
        |g AS (SELECT bin, n,
        |    abs(pos * 1000000 // n - sconf // n) AS gap FROM b)
        |SELECT CAST(sum(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  CAST(sum(n * gap) // sum(n) AS BIGINT) AS ece_micro,
        |  CAST(max(gap) AS BIGINT) AS mce_micro
        |FROM g""".stripMargin,

    "q_fleiss_kappa" ->
      // Stats.fleissKappa mirror: exact HUGEINT count sums; pbar/pe
      // each ONE double division of exact ints; kappa the same fixed
      // tree on the two results; items without exactly 4 ratings drop
      """WITH r AS (SELECT l_orderkey AS i,
        |    CASE WHEN l_extendedprice >= 40000.0 THEN 'L'
        |      WHEN l_extendedprice >= 20000.0 THEN 'M'
        |      ELSE 'S' END AS cat
        |  FROM lineitem),
        |counts AS (SELECT i, cat, CAST(count(*) AS BIGINT) AS nic
        |  FROM r GROUP BY 1, 2),
        |pi AS (SELECT i, CAST(sum(nic) AS BIGINT) AS n,
        |    sum(CAST(nic AS HUGEINT) * nic) AS sq
        |  FROM counts GROUP BY 1),
        |st AS (SELECT
        |    CAST(sum(CASE WHEN n = 4 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ni,
        |    CAST(sum(CASE WHEN n <> 4 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nd,
        |    sum(CASE WHEN n = 4 THEN sq END) AS ssq
        |  FROM pi),
        |ct AS (SELECT cat, CAST(sum(nic) AS BIGINT) AS tc
        |  FROM counts JOIN (SELECT i FROM pi WHERE n = 4) kept
        |    USING (i)
        |  GROUP BY 1),
        |ca AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(tc AS HUGEINT) * tc) AS stc2 FROM ct),
        |m AS (SELECT ni, nd, k,
        |    CAST(ssq - ni * 4 AS DOUBLE)
        |      / CAST(ni * 4 * 3 AS DOUBLE) AS pbar,
        |    CAST(stc2 AS DOUBLE)
        |      / CAST(CAST(ni AS HUGEINT) * 4 * ni * 4 AS DOUBLE) AS pe
        |  FROM st CROSS JOIN ca)
        |SELECT ni AS n_items, nd AS n_dropped_items,
        |  CAST(4 AS BIGINT) AS n_raters, k AS n_categories,
        |  round(pbar, 6) AS pbar_6, round(pe, 6) AS pe_6,
        |  CASE WHEN pe >= 1.0 THEN NULL
        |    ELSE round((pbar - pe) / (1.0 - pe), 6) END AS kappa_6
        |FROM m""".stripMargin,

    "q_bleu2" ->
      // Corpus.bleu2 mirror: canonical tokens, 1/2-gram clipped
      // matches pooled corpus-wide; p_n one double division each,
      // geometric mean as sqrt(p1*p2) (correctly-rounded IEEE on both
      // engines), BP = exp of one exact ratio, 6dp
      s"""WITH pr AS (SELECT a.doc_id AS pid,
         |    list_filter(string_split(${normOf("a.text")}, ' '),
         |      t -> len(t) > 0) AS pt,
         |    list_filter(string_split(${normOf("b.text")}, ' '),
         |      t -> len(t) > 0) AS rt
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |lens AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(coalesce(sum(len(pt)), 0) AS BIGINT) AS c,
         |    CAST(coalesce(sum(len(rt)), 0) AS BIGINT) AS r FROM pr),
         |p1t AS (SELECT pid, unnest(pt) AS g FROM pr),
         |r1t AS (SELECT pid, unnest(rt) AS g FROM pr),
         |p2t AS (SELECT pid, unnest(list_transform(
         |    generate_series(1, len(pt) - 1),
         |    i -> pt[i] || ' ' || pt[i + 1])) AS g FROM pr),
         |r2t AS (SELECT pid, unnest(list_transform(
         |    generate_series(1, len(rt) - 1),
         |    i -> rt[i] || ' ' || rt[i + 1])) AS g FROM pr),
         |c1 AS (SELECT
         |    CAST(coalesce((SELECT sum(least(p.np, r.nr)) FROM
         |      (SELECT pid, g, count(*) AS np FROM p1t GROUP BY 1, 2) p
         |      JOIN (SELECT pid, g, count(*) AS nr FROM r1t
         |        GROUP BY 1, 2) r USING (pid, g)), 0) AS BIGINT) AS m1,
         |    CAST(coalesce((SELECT count(*) FROM p1t), 0) AS BIGINT)
         |      AS t1),
         |c2 AS (SELECT
         |    CAST(coalesce((SELECT sum(least(p.np, r.nr)) FROM
         |      (SELECT pid, g, count(*) AS np FROM p2t GROUP BY 1, 2) p
         |      JOIN (SELECT pid, g, count(*) AS nr FROM r2t
         |        GROUP BY 1, 2) r USING (pid, g)), 0) AS BIGINT) AS m2,
         |    CAST(coalesce((SELECT count(*) FROM p2t), 0) AS BIGINT)
         |      AS t2),
         |f AS (SELECT lens.*, c1.*, c2.*,
         |    CAST(c1.m1 AS DOUBLE) / c1.t1 AS p1,
         |    CAST(c2.m2 AS DOUBLE) / c2.t2 AS p2,
         |    CASE WHEN lens.c >= lens.r THEN 1.0
         |      ELSE exp(1.0 - CAST(lens.r AS DOUBLE)
         |        / CAST(lens.c AS DOUBLE)) END AS bp
         |  FROM lens CROSS JOIN c1 CROSS JOIN c2)
         |SELECT n_pairs, c AS c_len, r AS r_len, m1, t1, m2, t2,
         |  CASE WHEN t1 = 0 OR t2 = 0 OR c = 0 THEN NULL
         |    ELSE round(p1, 6) END AS p1_6,
         |  CASE WHEN t1 = 0 OR t2 = 0 OR c = 0 THEN NULL
         |    ELSE round(p2, 6) END AS p2_6,
         |  CASE WHEN t1 = 0 OR t2 = 0 OR c = 0 THEN NULL
         |    ELSE round(bp, 6) END AS bp_6,
         |  CASE WHEN t1 = 0 OR t2 = 0 OR c = 0 THEN NULL
         |    ELSE round(bp * sqrt(p1 * p2), 6) END AS bleu2_6
         |FROM f""".stripMargin,

    "q_rouge_l" ->
      // Corpus.rougeL mirror: the LCS DP replayed as a recursive CTE
      // over pred positions, each row built by a list-accumulator
      // fold over ref positions (init row prepended — DuckDB
      // list_reduce seeds from the first element); 32-token caps via
      // list slicing; P/R/F exact floor-div micros (nonneg, // ≡ div)
      s"""WITH RECURSIVE pr AS (SELECT a.doc_id AS pid,
         |    (list_filter(string_split(${normOf("a.text")}, ' '),
         |      t -> len(t) > 0))[1:32] AS pt,
         |    (list_filter(string_split(${normOf("b.text")}, ' '),
         |      t -> len(t) > 0))[1:32] AS rt
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id % 10 = 0),
         |dp AS (
         |  SELECT pid, pt, rt, 0 AS i,
         |    list_transform(generate_series(0, len(rt)),
         |      x -> CAST(0 AS BIGINT)) AS row
         |  FROM pr
         |  UNION ALL
         |  SELECT pid, pt, rt, i + 1,
         |    list_reduce(
         |      list_prepend([CAST(0 AS BIGINT)],
         |        list_transform(generate_series(1, len(rt)), j -> [j])),
         |      (acc, x) -> list_append(acc,
         |        CASE WHEN pt[i + 1] = rt[x[1]] THEN row[x[1]] + 1
         |          ELSE greatest(row[x[1] + 1], acc[len(acc)]) END))
         |  FROM dp WHERE i < len(pt)),
         |fin AS (SELECT pid, CAST(len(pt) AS BIGINT) AS m,
         |    CAST(len(rt) AS BIGINT) AS n,
         |    CAST(row[len(rt) + 1] AS BIGINT) AS l
         |  FROM dp WHERE i = len(pt))
         |SELECT pid AS pair_id, m AS len_pred, n AS len_ref, l AS lcs,
         |  CASE WHEN m > 0 THEN l * 1000000 // m END AS p_micro,
         |  CASE WHEN n > 0 THEN l * 1000000 // n END AS r_micro,
         |  CASE WHEN m + n > 0 THEN 2000000 * l // (m + n) END
         |    AS f_micro
         |FROM fin""".stripMargin,

    "q_friedman_posthoc" ->
      // Stats.friedmanPosthoc mirror: the q_friedman midrank machinery,
      // mean ranks as ⌊10⁶·R2/(2n)⌋ micro units (nonneg → // ≡ div),
      // pairwise exact diffs vs the 352000-micro critical difference
      """WITH obs AS (SELECT o_orderkey % 311 AS task,
        |    o_orderpriority AS sys,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT sys) AS BIGINT) AS k FROM obs),
        |tc AS (SELECT task, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(DISTINCT sys) AS BIGINT) AS ds
        |  FROM obs GROUP BY 1),
        |kept AS (SELECT task FROM tc CROSS JOIN kk
        |  WHERE cnt = k AND ds = k),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept),
        |ranked AS (SELECT sys,
        |    2 * CAST(rank() OVER (PARTITION BY task ORDER BY v)
        |      AS BIGINT)
        |      + CAST(count(*) OVER (PARTITION BY task, v) AS BIGINT)
        |      - 1 AS m2
        |  FROM obs JOIN kept USING (task)),
        |r2 AS (SELECT sys,
        |    CAST(sum(m2) AS BIGINT) * 1000000 // (2 * nn.n) AS mr
        |  FROM ranked CROSS JOIN nn GROUP BY sys, nn.n)
        |SELECT a.sys AS sys_a, b.sys AS sys_b,
        |  a.mr AS mr_a_micro, b.mr AS mr_b_micro,
        |  abs(a.mr - b.mr) AS diff_micro,
        |  abs(a.mr - b.mr) > 352000 AS significant
        |FROM r2 a JOIN r2 b ON a.sys < b.sys""".stripMargin,

    "q_cmh" ->
      // Stats.cmh mirror: per-stratum exact 2×2 cells; per-stratum
      // terms each ONE double division of exact integer products;
      // cross-strata sums via the 0.0-prepend stratum-ordered fold;
      // χ² with the clamped ½ continuity correction; OR_MH ratio
      """WITH src AS (SELECT o_orderpriority AS s,
        |    (o_orderkey % 2 = 0) AS e, (o_orderstatus = 'F') AS y
        |  FROM orders),
        |cells AS (SELECT s,
        |    CAST(sum(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM src GROUP BY 1),
        |cn AS (SELECT s, a, b, c, d, a + b + c + d AS n FROM cells
        |  WHERE a + b + c + d >= 2),
        |terms AS (SELECT s, n,
        |    CAST(a * d - b * c AS DOUBLE) / CAST(n AS DOUBLE) AS td,
        |    CAST(CAST((a + b) * (c + d) AS HUGEINT)
        |        * ((a + c) * (b + d)) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n * (n - 1) AS DOUBLE) AS tv,
        |    CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE) AS tad,
        |    CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE) AS tbc
        |  FROM cn),
        |f AS (SELECT CAST(sum(n) AS BIGINT) AS nall,
        |    CAST(count(*) AS BIGINT) AS k,
        |    (SELECT list_reduce(list_prepend(0.0, list(td ORDER BY s)),
        |      (x, y) -> x + y) FROM terms) AS sd,
        |    (SELECT list_reduce(list_prepend(0.0, list(tv ORDER BY s)),
        |      (x, y) -> x + y) FROM terms) AS sv,
        |    (SELECT list_reduce(list_prepend(0.0, list(tad ORDER BY s)),
        |      (x, y) -> x + y) FROM terms) AS sad,
        |    (SELECT list_reduce(list_prepend(0.0, list(tbc ORDER BY s)),
        |      (x, y) -> x + y) FROM terms) AS sbc
        |  FROM terms)
        |SELECT k AS n_strata, nall AS n, round(sd, 6) AS sum_d_6,
        |  round(sv, 6) AS sum_v_6,
        |  CASE WHEN sv > 0 THEN round(greatest(abs(sd) - 0.5, 0.0)
        |    * greatest(abs(sd) - 0.5, 0.0) / sv, 6) END AS chi2_6,
        |  CASE WHEN sbc > 0 THEN round(sad / sbc, 6) END AS or_mh_6
        |FROM f""".stripMargin,

    "q_count_min" ->
      // Sketch.countMin mirror: bucket_i = first-12-hex md5 of
      // "cm<i>|<key>" mod 64; cell table = keyed counts; estimate =
      // min over the 4 rows' cells; truth joined for the gate
      """WITH e AS (SELECT user_id FROM events),
        |cells AS (SELECT u.i AS row_i,
        |    CAST('0x' || substring(md5('cm' || CAST(u.i AS VARCHAR)
        |      || '|' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
        |      % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM e CROSS JOIN unnest([0, 1, 2, 3]) AS u(i)
        |  GROUP BY 1, 2),
        |qk AS (SELECT DISTINCT user_id AS key FROM e),
        |qc AS (SELECT key, u.i AS row_i,
        |    CAST('0x' || substring(md5('cm' || CAST(u.i AS VARCHAR)
        |      || '|' || CAST(key AS VARCHAR)), 1, 12) AS BIGINT)
        |      % 64 AS bucket
        |  FROM qk CROSS JOIN unnest([0, 1, 2, 3]) AS u(i)),
        |est AS (SELECT key,
        |    CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
        |  FROM qc LEFT JOIN cells USING (row_i, bucket)
        |  GROUP BY 1),
        |truth AS (SELECT user_id AS key, CAST(count(*) AS BIGINT)
        |    AS true_cnt
        |  FROM e GROUP BY 1)
        |SELECT est.key AS user_id, est.est, truth.true_cnt
        |FROM est JOIN truth USING (key)""".stripMargin,

    "q_brown_forsythe" ->
      // Stats.brownForsythe mirror: exact per-group median (cum·10⁴ ≥
      // p·n rule), z = |x − med|, micro-quantized means (z ≥ 0 → //
      // ≡ div), SSB/SSW exact HUGEINT, W one double division, 6dp
      """WITH src AS (SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |vc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM src GROUP BY 1, 2),
        |wc AS (SELECT g, v,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM vc),
        |med AS (SELECT g, min(CASE WHEN cum * 10000 >= n * 5000
        |    THEN v END) AS med
        |  FROM wc GROUP BY 1),
        |z AS (SELECT src.g, abs(src.v - med.med) AS z
        |  FROM src JOIN med USING (g)),
        |grp AS (SELECT g, CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS BIGINT) * 1000000 // count(*) AS zbar
        |  FROM z GROUP BY 1),
        |gl AS (SELECT CAST(sum(sz) AS BIGINT) AS szall,
        |    CAST(sum(n) AS BIGINT) AS nall,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(sz) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT)
        |      AS zbarall
        |  FROM grp),
        |ssb AS (SELECT sum(CAST(grp.zbar - gl.zbarall AS HUGEINT)
        |    * (grp.zbar - gl.zbarall) * grp.n) AS ssb
        |  FROM grp CROSS JOIN gl),
        |ssw AS (SELECT sum(CAST(z.z * 1000000 - grp.zbar AS HUGEINT)
        |    * (z.z * 1000000 - grp.zbar)) AS ssw
        |  FROM z JOIN grp USING (g))
        |SELECT gl.nall AS n, gl.k AS k_groups,
        |  CASE WHEN ssw.ssw = 0 OR gl.k < 2 THEN NULL
        |    ELSE round(CAST((gl.nall - gl.k) * ssb.ssb AS DOUBLE)
        |      / CAST((gl.k - 1) * ssw.ssw AS DOUBLE), 6) END AS w_6
        |FROM gl CROSS JOIN ssb CROSS JOIN ssw""".stripMargin,

    "q_friedman" ->
      // Stats.friedman mirror: per-(bucket, priority) cents sums, 2×
      // midranks as exact integers (2·min_rank + ties − 1), rank sums
      // over complete tasks only; χ²_F = 3·ΣR2²/(nk(k+1)) − 3n(k+1)
      // with the identical double cast points, 6dp
      """WITH obs AS (SELECT o_orderkey % 311 AS task,
        |    o_orderpriority AS sys,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT sys) AS BIGINT) AS k FROM obs),
        |tc AS (SELECT task, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(DISTINCT sys) AS BIGINT) AS ds
        |  FROM obs GROUP BY 1),
        |meta AS (SELECT
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 0 ELSE 1 END)
        |      AS BIGINT) AS nd
        |  FROM tc CROSS JOIN kk),
        |kept AS (SELECT task FROM tc CROSS JOIN kk
        |  WHERE cnt = k AND ds = k),
        |ranked AS (SELECT sys,
        |    2 * CAST(rank() OVER (PARTITION BY task ORDER BY v)
        |      AS BIGINT)
        |      + CAST(count(*) OVER (PARTITION BY task, v) AS BIGINT)
        |      - 1 AS m2
        |  FROM obs JOIN kept USING (task)),
        |r2 AS (SELECT sys, CAST(sum(m2) AS BIGINT) AS r2_sum
        |  FROM ranked GROUP BY 1),
        |sq AS (SELECT sum(CAST(r2_sum AS HUGEINT) * r2_sum) AS sr2
        |  FROM r2)
        |SELECT r2.sys AS system, r2.r2_sum, meta.nn AS n_tasks,
        |  kk.k AS k_systems, meta.nd AS n_dropped_tasks,
        |  round(CAST(3 * sq.sr2 AS DOUBLE)
        |      / CAST(meta.nn * kk.k * (kk.k + 1) AS DOUBLE)
        |    - CAST(3 * meta.nn * (kk.k + 1) AS DOUBLE), 6) AS chi2_6
        |FROM r2 CROSS JOIN meta CROSS JOIN kk CROSS JOIN sq""".stripMargin,

    "q_cochran_q" ->
      // Stats.cochranQ mirror: per-cell pass = cents-sum parity; exact
      // T_j / u_i sums in HUGEINT; Q = (k−1)(kΣT² − N²)/(kN − Σu²),
      // ONE double division, unanimous denominator → null, 6dp
      """WITH cells AS (SELECT o_orderkey % 449 AS item,
        |    o_orderpriority AS sys,
        |    (CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) % 2) = 1 AS pass
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT sys) AS BIGINT) AS k
        |  FROM cells),
        |pi AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(DISTINCT sys) AS BIGINT) AS ds,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS u
        |  FROM cells GROUP BY 1),
        |st AS (SELECT
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ni,
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 0 ELSE 1 END)
        |      AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN u ELSE 0 END)
        |      AS BIGINT) AS bign,
        |    sum(CASE WHEN cnt = k AND ds = k
        |      THEN CAST(u AS HUGEINT) * u END) AS su2
        |  FROM pi CROSS JOIN kk),
        |tj AS (SELECT sys,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS t
        |  FROM cells JOIN (SELECT item FROM pi CROSS JOIN kk
        |    WHERE cnt = k AND ds = k) kept USING (item)
        |  GROUP BY 1),
        |tsq AS (SELECT sum(CAST(t AS HUGEINT) * t) AS st2 FROM tj)
        |SELECT st.ni AS n_items, st.nd AS n_dropped_items,
        |  kk.k AS k_systems, st.bign AS n_pass,
        |  CASE WHEN kk.k * st.bign - st.su2 = 0 THEN NULL
        |    ELSE round(CAST((kk.k - 1) * (kk.k * tsq.st2
        |        - CAST(st.bign AS HUGEINT) * st.bign) AS DOUBLE)
        |      / CAST(kk.k * st.bign - st.su2 AS DOUBLE), 6)
        |  END AS q_6
        |FROM st CROSS JOIN kk CROSS JOIN tsq""".stripMargin,

    "q_kripp_alpha" ->
      // Stats.krippendorffAlpha mirror: per-unit disagreement floor-
      // quantized to micros (nonneg numerator, so // ≡ Spark div),
      // exact De; α = 1 − Do·(n−1)/(10⁶·ΣnC(n−nC)), one division, 6dp
      """WITH r AS (SELECT event_id % 1700 AS unit, event_type AS c
        |  FROM events),
        |counts AS (SELECT unit, c, CAST(count(*) AS BIGINT) AS nuc
        |  FROM r GROUP BY 1, 2),
        |pu AS (SELECT unit, CAST(sum(nuc) AS BIGINT) AS m,
        |    CAST(sum(nuc * (nuc - 1)) AS BIGINT) AS agr
        |  FROM counts GROUP BY 1),
        |st AS (SELECT
        |    CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nu,
        |    CAST(sum(CASE WHEN m >= 2 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS nd,
        |    CAST(sum(CASE WHEN m >= 2 THEN m ELSE 0 END) AS BIGINT)
        |      AS n,
        |    sum(CASE WHEN m >= 2 THEN CAST((m * (m - 1) - agr)
        |      * 1000000 // (m - 1) AS HUGEINT)
        |      ELSE CAST(0 AS HUGEINT) END) AS dosum
        |  FROM pu),
        |ct AS (SELECT c, CAST(sum(nuc) AS BIGINT) AS nc
        |  FROM counts JOIN (SELECT unit FROM pu WHERE m >= 2) kept
        |    USING (unit)
        |  GROUP BY 1),
        |de AS (SELECT CAST(count(*) AS BIGINT) AS kcat,
        |    sum(CAST(nc AS HUGEINT) * (st.n - nc)) AS desum
        |  FROM ct CROSS JOIN st)
        |SELECT st.nu AS n_units, st.nd AS n_dropped_units,
        |  st.n AS n_ratings, de.kcat AS n_categories,
        |  CASE WHEN de.desum = 0 THEN NULL
        |    ELSE round(1.0 - CAST(st.dosum * (st.n - 1) AS DOUBLE)
        |      / CAST(1000000 * de.desum AS DOUBLE), 6)
        |  END AS alpha_6
        |FROM st CROSS JOIN de""".stripMargin,

    "q_changepoint" ->
      // TimeSeries.changePoint mirror: exact prefix sums, s = |n·Pk −
      // k·Pn| in HUGEINT, argmax via the identical packed key
      // s·2²¹ + (2²¹−k) (ties → smallest k), exact unpack via
      // subtract-mod floor; means in floor-div micros (nonneg values,
      // // ≡ div); n < 2 keys carried with null cp fields
      """WITH e AS (SELECT user_id % 97 AS key, event_id AS ord,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        |pref AS (SELECT key, ord, v,
        |    CAST(row_number() OVER (PARTITION BY key ORDER BY ord)
        |      AS BIGINT) AS k,
        |    CAST(sum(v) OVER (PARTITION BY key ORDER BY ord)
        |      AS BIGINT) AS pk,
        |    CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
        |    CAST(sum(v) OVER (PARTITION BY key) AS BIGINT) AS pn
        |  FROM e),
        |splits AS (SELECT key, n, pn, k, pk,
        |    abs(CAST(n AS HUGEINT) * pk - CAST(k AS HUGEINT) * pn) AS s
        |  FROM pref WHERE k < n),
        |best AS (SELECT key, max(n) AS n, max(pn) AS pn,
        |    max(s * 2097152 + (2097152 - k)) AS bp
        |  FROM splits GROUP BY 1),
        |res AS (SELECT key, n,
        |    CAST(2097152 - (bp % 2097152) AS BIGINT) AS cp_k,
        |    (bp - (bp % 2097152)) // 2097152 AS s_max, pn
        |  FROM best),
        |out1 AS (SELECT res.key, res.n, res.cp_k,
        |    CAST(res.s_max AS VARCHAR) AS s_max,
        |    p.pk * 1000000 // res.cp_k AS mean_left_micro,
        |    (res.pn - p.pk) * 1000000 // (res.n - res.cp_k)
        |      AS mean_right_micro
        |  FROM res JOIN pref p ON p.key = res.key AND p.k = res.cp_k),
        |single AS (SELECT key, n, CAST(NULL AS BIGINT) AS cp_k,
        |    CAST(NULL AS VARCHAR) AS s_max,
        |    CAST(NULL AS BIGINT) AS mean_left_micro,
        |    CAST(NULL AS BIGINT) AS mean_right_micro
        |  FROM (SELECT key, CAST(count(*) AS BIGINT) AS n FROM e
        |    GROUP BY 1) t
        |  WHERE n < 2)
        |SELECT * FROM out1 UNION ALL SELECT * FROM single""".stripMargin,

    "q_mcnemar" ->
      // Stats.mcnemar mirror: 2x2 concordance from one agg; Edwards'
      // continuity correction clamped at 0; one exact-int division
      """WITH p AS (SELECT
        |    ((l_discount > 0.05) = (l_returnflag = 'R')) AS a,
        |    ((l_tax > 0.04) = (l_returnflag = 'R')) AS b
        |  FROM lineitem),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11
        |  FROM p)
        |SELECT n00, n01, n10, n11,
        |  CASE WHEN n01 + n10 > 0 THEN
        |    round(CAST(greatest(abs(n01 - n10) - 1, 0) *
        |      greatest(abs(n01 - n10) - 1, 0) AS DOUBLE)
        |      / CAST(n01 + n10 AS DOUBLE), 6) END AS chi2_6
        |FROM t""".stripMargin,

    "q_pass_at_k" ->
      // Corpus.passAtK mirror, k = 3: pass@k = 1 - C(n-c,k)/C(n,k) as
      // pure integer products + one floor division in micro-units
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    (value >= 500.0) AS pass FROM events),
        |bt AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type, day, n, c,
        |  CAST(1000000 - (1000000 * greatest(n - c - 0, 0)
        |      * greatest(n - c - 1, 0) * greatest(n - c - 2, 0))
        |    // ((n - 0) * (n - 1) * (n - 2)) AS BIGINT)
        |    AS pass_at_k_micro
        |FROM bt WHERE n >= 3""".stripMargin,

    "q_corpus_card" ->
      // qCorpusCard mirror: every metric an exact integer — counts or
      // 1e6 floor-div micro-rates; ws token count = the proven
      // string_split_regex parity form
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS toks,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS en,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq,
        |    CAST(sum(length(text)) AS BIGINT) AS chars
        |  FROM documents)
        |SELECT 'docs' AS metric, docs AS value FROM s
        |UNION ALL SELECT 'whitespace_tokens', toks FROM s
        |UNION ALL SELECT 'languages', langs FROM s
        |UNION ALL SELECT 'en_rate_micro', en * 1000000 // docs FROM s
        |UNION ALL SELECT 'exact_dup_rate_micro',
        |  (docs - uniq) * 1000000 // docs FROM s
        |UNION ALL SELECT 'mean_chars_micro',
        |  chars * 1000000 // docs FROM s""".stripMargin,

    "q_log_rank" ->
      // TimeSeries.logRank mirror: q_kaplan_meier's at-risk frame per
      // group, E/V terms as fixed double expressions of exact ints,
      // folds in event-time order with the 0.0-prepend seeding, z/χ²
      // the identical IEEE trees, 6dp
      """WITH u AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd,
        |    max(CAST(o_orderdate AS DATE)) AS ld FROM orders GROUP BY 1),
        |cut AS (SELECT max(CAST(o_orderdate AS DATE)) AS cd FROM orders),
        |subj AS (SELECT o_custkey % 2 AS grp,
        |    CAST(ld - fd AS BIGINT) // 7 AS dur,
        |    (cd - ld) > 365 AS ev FROM u CROSS JOIN cut),
        |byt AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN ev AND grp = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt,
        |    CAST(sum(c1) AS BIGINT) AS n1t FROM byt),
        |rk AS (SELECT t, d, d1, nt, n1t,
        |    CAST(nt - sum(c) OVER (ORDER BY t) + c AS BIGINT) AS n,
        |    CAST(n1t - sum(c1) OVER (ORDER BY t) + c1 AS BIGINT) AS n1
        |  FROM byt CROSS JOIN tot),
        |terms AS (SELECT t, d1, nt, n1t,
        |    CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS e,
        |    CASE WHEN n > 1 THEN
        |      (CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
        |    ELSE 0.0 END AS v
        |  FROM rk WHERE d >= 1),
        |agg AS (SELECT max(nt) AS n_total, max(n1t) AS n_group1,
        |    CAST(coalesce(sum(d1), 0) AS BIGINT) AS o1,
        |    (SELECT list_reduce(list_prepend(0.0, list(e ORDER BY t)),
        |      (x, y) -> x + y) FROM terms) AS e1,
        |    (SELECT list_reduce(list_prepend(0.0, list(v ORDER BY t)),
        |      (x, y) -> x + y) FROM terms) AS vv
        |  FROM terms)
        |SELECT n_total, n_group1, o1,
        |  round(e1, 6) AS e1_6, round(vv, 6) AS v_6,
        |  CASE WHEN vv > 0
        |    THEN round((CAST(o1 AS DOUBLE) - e1) / sqrt(vv), 6) END AS z_6,
        |  CASE WHEN vv > 0
        |    THEN round(((CAST(o1 AS DOUBLE) - e1) / sqrt(vv))
        |      * ((CAST(o1 AS DOUBLE) - e1) / sqrt(vv)), 6) END AS chi2_6
        |FROM agg""".stripMargin,

    "q_kaplan_meier" ->
      // KM: n_risk = N − cum(<t); factor = (n_risk − d)/n_risk ONE
      // exact division; S(t) = slice-fold product in ascending t
      // (list_reduce seeding ≡ the 1.0-seeded fold), 6dp
      """WITH u AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd,
        |    max(CAST(o_orderdate AS DATE)) AS ld FROM orders GROUP BY 1),
        |cut AS (SELECT max(CAST(o_orderdate AS DATE)) AS cd FROM orders),
        |subj AS (SELECT CAST(ld - fd AS BIGINT) // 7 AS dur,
        |    (cd - ld) > 365 AS ev FROM u CROSS JOIN cut),
        |byt AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM byt),
        |ar AS (SELECT t,
        |    CAST((SELECT n FROM tot) - sum(c) OVER (ORDER BY t) + c
        |      AS BIGINT) AS n_risk, d FROM byt),
        |ev AS (SELECT t, n_risk, d,
        |    CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f,
        |    CAST(row_number() OVER (ORDER BY t) AS INTEGER) AS i
        |  FROM ar WHERE d >= 1),
        |l AS (SELECT list(f ORDER BY t) AS fl FROM ev)
        |SELECT ev.t, ev.n_risk, ev.d,
        |  round(list_reduce(fl[1:i], (x, y) -> x * y), 6) AS s
        |FROM ev CROSS JOIN l""".stripMargin,

    "q_jl_project" ->
      // int8 codes exactly as q_quantize_int8, centered to code−128;
      // ±1 sign from the FIRST md5 hex digit of "jl<j>_<pos>" parity;
      // y is a pure integer dot product — bit-exact
      """WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
        |    CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i)),
        |s AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
        |codes AS (SELECT vec_id, f.pos,
        |  CASE WHEN mx = mn THEN 0
        |    ELSE least(greatest(
        |      CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
        |      0), 255) END AS code
        |  FROM f JOIN s USING(pos)),
        |signs AS (SELECT j.j, p.pos,
        |    CAST((strpos('0123456789abcdef', substring(
        |      md5('jl' || CAST(j.j AS VARCHAR) || '_'
        |        || CAST(p.pos AS VARCHAR)), 1, 1)) - 1) % 2 * 2 - 1
        |      AS BIGINT) AS sgn
        |  FROM (SELECT CAST(u.j AS BIGINT) AS j
        |        FROM unnest(generate_series(0, 15)) AS u(j)) j
        |  CROSS JOIN (SELECT DISTINCT pos FROM codes) p)
        |SELECT c.vec_id, g.j, CAST(sum(g.sgn * (c.code - 128)) AS BIGINT) AS y
        |FROM codes c JOIN signs g USING (pos)
        |GROUP BY 1, 2""".stripMargin,

    "q_gains" ->
      // rank by (score desc, event_id), equal-count buckets by
      // integer rank arithmetic, capture/precision in basis points
      // by integral division — all exact
      """WITH e AS (SELECT (event_type = 'purchase') AS pos,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
        |  FROM events),
        |r AS (SELECT pos, CAST(row_number() OVER
        |    (ORDER BY -cents, event_id) AS BIGINT) AS rk FROM e),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM e),
        |b AS (SELECT CAST(least(9, (rk - 1) * 10 // (SELECT n FROM t))
        |    + 1 AS BIGINT) AS bucket, pos FROM r),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM b GROUP BY 1),
        |c AS (SELECT bucket, n, n_pos,
        |    CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos
        |  FROM g)
        |SELECT bucket, n, n_pos, cum_n, cum_pos,
        |  CASE WHEN (SELECT np FROM t) > 0
        |    THEN cum_pos * 10000 // (SELECT np FROM t) END AS capture_bp,
        |  cum_pos * 10000 // cum_n AS precision_bp
        |FROM c""".stripMargin,

    "q_power_iteration" -> {
      // 5 UNROLLED power-iteration rounds in exact integer
      // arithmetic over the int8 scatter matrix: matvec sums in
      // HUGEINT, renormalization v ← sign(u)·(|u|·10⁶ // max|u|)
      // (operands positive after abs — truncating ≡ BigInt
      // division). MATERIALIZED per round (each referenced twice:
      // matvec + max). Codes mirror q_quantize_int8 exactly.
      val rounds = (1 to 5).map { i =>
        s"""u$i AS MATERIALIZED (SELECT sm.q AS pos,
           |    CAST(sum(sm.s * v${i - 1}.v) AS HUGEINT) AS u
           |  FROM sm JOIN v${i - 1} ON v${i - 1}.pos = sm.p GROUP BY 1),
           |m$i AS (SELECT max(abs(u)) AS m FROM u$i),
           |v$i AS MATERIALIZED (SELECT pos,
           |    CAST(CASE WHEN (SELECT m FROM m$i) = 0 THEN u
           |      WHEN u < 0
           |        THEN -((abs(u) * 1000000) // (SELECT m FROM m$i))
           |      ELSE (abs(u) * 1000000) // (SELECT m FROM m$i) END
           |      AS BIGINT) AS v
           |  FROM u$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[u.i] AS DOUBLE) AS x
         |  FROM embeddings,
         |    unnest(generate_series(1, len(embedding))) AS u(i)),
         |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
         |cc AS (SELECT vec_id, f.pos,
         |    CAST(CASE WHEN mx = mn THEN 0
         |      ELSE least(greatest(
         |        CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT),
         |        0), 255) END - 128 AS BIGINT) AS c
         |  FROM f JOIN st USING(pos)),
         |sm AS MATERIALIZED (SELECT a.pos AS p, b.pos AS q,
         |    CAST(sum(a.c * b.c) AS BIGINT) AS s
         |  FROM cc a JOIN cc b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |v0 AS (SELECT DISTINCT pos, CAST(1000000 AS BIGINT) AS v FROM cc),
         |$rounds
         |SELECT pos, v FROM v5""".stripMargin
    },

    "q_isotonic" ->
      // PAV via the minimax identity fitted(i) = max_{j≤i} min_{k≥i}
      // mean(j..k): every candidate mean ONE division of exact ints,
      // max/min select among identical IEEE values on both engines
      """WITH e AS (SELECT (event_type = 'purchase') AS pos,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 500 AS bin
        |  FROM events),
        |b AS (SELECT bin AS i, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM e GROUP BY 1),
        |c AS (SELECT i, n, pos,
        |    CAST(sum(n) OVER (ORDER BY i) AS BIGINT) AS cn,
        |    CAST(sum(pos) OVER (ORDER BY i) AS BIGINT) AS cp FROM b),
        |jk AS (SELECT s.i, s.n, s.pos, j.i AS j,
        |    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
        |      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
        |  FROM c s JOIN c j ON j.i <= s.i JOIN c k ON k.i >= s.i),
        |inner_min AS (SELECT i, n, pos, j, min(m) AS mn
        |  FROM jk GROUP BY 1, 2, 3, 4)
        |SELECT i AS bin, n, pos AS n_pos,
        |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |  max(mn) AS iso
        |FROM inner_min GROUP BY 1, 2, 3""".stripMargin,

    "q_zipf" -> {
      val norm = normOf("text")
      // rank by (count desc, term asc) capped at 500; the four OLS
      // sums fold in rank order (list_reduce seeding ≡ 0.0-seeded
      // fold); slope/intercept fixed-order IEEE, 6dp (ln rule)
      s"""WITH t AS (SELECT unnest(string_split($norm, ' ')) AS term
         |  FROM documents),
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t
         |  GROUP BY 1 ORDER BY n DESC, term LIMIT 500),
         |r AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, term)
         |    AS BIGINT) AS rank, n FROM c),
         |x AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
         |    ln(CAST(n AS DOUBLE)) AS y FROM r),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    list_reduce(list(x ORDER BY rank), (a, b) -> a + b) AS sx,
         |    list_reduce(list(y ORDER BY rank), (a, b) -> a + b) AS sy,
         |    list_reduce(list(x * y ORDER BY rank), (a, b) -> a + b) AS sxy,
         |    list_reduce(list(x * x ORDER BY rank), (a, b) -> a + b) AS sxx
         |  FROM x)
         |SELECT k AS n_terms,
         |  round((CAST(k AS DOUBLE) * sxy - sx * sy)
         |    / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS slope,
         |  round((sy - (CAST(k AS DOUBLE) * sxy - sx * sy)
         |      / (CAST(k AS DOUBLE) * sxx - sx * sx) * sx)
         |    / CAST(k AS DOUBLE), 6) AS intercept
         |FROM f""".stripMargin
    },

    "q_theil_sen" ->
      // median of pairwise slopes: each ONE division of exact ints,
      // lower-median picked by integer rank under (slope, xi, xj)
      """WITH d AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |p AS (SELECT a.day AS xi, b.day AS xj,
        |    CAST(b.cents - a.cents AS DOUBLE)
        |      / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM d a JOIN d b ON a.day < b.day),
        |r AS (SELECT slope,
        |    CAST(row_number() OVER (ORDER BY slope, xi, xj) AS BIGINT)
        |      AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM p)
        |SELECT m AS n_pairs, slope FROM r
        |WHERE rk * 2 = m OR rk * 2 = m + 1""".stripMargin,

    "q_mann_kendall" ->
      // S = Σ sign over day² pairs (exact integer), tie-corrected
      // variance from integer carriers, ±1 continuity z in the Spark
      // fixed IEEE op order (6dp)
      """WITH d AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CAST(sign(CAST(b.cents - a.cents AS DOUBLE))
        |      AS BIGINT)) AS BIGINT) AS s_stat
        |  FROM d a JOIN d b ON a.day < b.day),
        |t AS (SELECT CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tsum
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d
        |    GROUP BY cents) g)
        |SELECT t.n, s.s_stat, s.n_pairs,
        |  round(CASE WHEN (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE)
        |        - 1.0) * (CAST(t.n AS DOUBLE) * 2 + 5.0)
        |      - CAST(t.tsum AS DOUBLE)) / 18.0 > 0
        |    THEN CASE WHEN s.s_stat > 0
        |      THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
        |        / sqrt((CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE)
        |          - 1.0) * (CAST(t.n AS DOUBLE) * 2 + 5.0)
        |          - CAST(t.tsum AS DOUBLE)) / 18.0)
        |      WHEN s.s_stat < 0
        |      THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
        |        / sqrt((CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE)
        |          - 1.0) * (CAST(t.n AS DOUBLE) * 2 + 5.0)
        |          - CAST(t.tsum AS DOUBLE)) / 18.0)
        |      ELSE 0.0 END
        |    END, 6) AS z
        |FROM s CROSS JOIN t""".stripMargin,

    "q_quantile_normalize" ->
      // within-group rank r, group size ng, global rank t =
      // ceil(r·N/ng) in integer arithmetic; the normalized value is
      // the global value at rank t — one rank-keyed join, all exact
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |r AS (SELECT c_custkey, c_mktsegment, cents,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, c_custkey) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ng
        |  FROM c),
        |g AS (SELECT cents AS q_cents,
        |    CAST(row_number() OVER (ORDER BY cents, c_custkey)
        |      AS BIGINT) AS t
        |  FROM c),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
        |SELECT r.c_custkey, r.c_mktsegment, r.cents, g.q_cents
        |FROM r JOIN g
        |  ON g.t = (r.r * (SELECT n FROM nn) + r.ng - 1) // r.ng""".stripMargin,

    "q_record_linkage" ->
      // Fellegi–Sunter with EXACT-RATIONAL likelihood ratios: u_i are
      // integer collision counts over the field distribution, the per-
      // pair LR is a ratio of integer products (HUGEINT here, Spark
      // DECIMAL(38,0)), emitted as lr_micro via integral division —
      // no transcendental weight sums, hence hash-gateable
      """WITH c AS (SELECT c_custkey AS id, c_nationkey AS blk,
        |    c_mktsegment AS f1,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS f2,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 10 AS f3
        |  FROM customer),
        |nn AS (SELECT count(*) AS n FROM c),
        |ud AS (SELECT CAST(n * (n - 1) AS BIGINT) AS v FROM nn),
        |u1 AS (SELECT CAST(sum(cc * (cc - 1)) AS BIGINT) AS v
        |       FROM (SELECT count(*) AS cc FROM c GROUP BY f1) t),
        |u2 AS (SELECT CAST(sum(cc * (cc - 1)) AS BIGINT) AS v
        |       FROM (SELECT count(*) AS cc FROM c GROUP BY f2) t),
        |u3 AS (SELECT CAST(sum(cc * (cc - 1)) AS BIGINT) AS v
        |       FROM (SELECT count(*) AS cc FROM c GROUP BY f3) t),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    (CASE WHEN a.f1 = b.f1 THEN 1 ELSE 0 END
        |     + CASE WHEN a.f2 = b.f2 THEN 1 ELSE 0 END
        |     + CASE WHEN a.f3 = b.f3 THEN 1 ELSE 0 END) AS n_agree,
        |    CAST((CAST(1000000 AS HUGEINT)
        |      * CASE WHEN a.f1 = b.f1 THEN 9 * (SELECT v FROM ud)
        |             ELSE 1 * (SELECT v FROM ud) END
        |      * CASE WHEN a.f2 = b.f2 THEN 9 * (SELECT v FROM ud)
        |             ELSE 1 * (SELECT v FROM ud) END
        |      * CASE WHEN a.f3 = b.f3 THEN 9 * (SELECT v FROM ud)
        |             ELSE 1 * (SELECT v FROM ud) END)
        |      // (CAST(CASE WHEN a.f1 = b.f1 THEN 10 * (SELECT v FROM u1)
        |             ELSE 10 * ((SELECT v FROM ud) - (SELECT v FROM u1)) END AS HUGEINT)
        |        * CASE WHEN a.f2 = b.f2 THEN 10 * (SELECT v FROM u2)
        |             ELSE 10 * ((SELECT v FROM ud) - (SELECT v FROM u2)) END
        |        * CASE WHEN a.f3 = b.f3 THEN 10 * (SELECT v FROM u3)
        |             ELSE 10 * ((SELECT v FROM ud) - (SELECT v FROM u3)) END)
        |      AS BIGINT) AS lr_micro
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id)
        |SELECT id_a, id_b, CAST(n_agree AS BIGINT) AS n_agree, lr_micro
        |FROM pairs WHERE lr_micro >= 4000000""".stripMargin,

    "q_drawdown" ->
      // exact integer cents under the total (ts, event_id) per-key
      // order; DuckDB window/plain sums widen to HUGEINT -> re-cast
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |cumt AS (SELECT event_type, ts, event_id, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM e),
        |pk AS (SELECT event_type, c, cum,
        |    CAST(max(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
        |  FROM cumt)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(c) AS BIGINT) AS final_cents,
        |  CAST(max(cum) AS BIGINT) AS peak_cents,
        |  CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents
        |FROM pk GROUP BY 1""".stripMargin,

    "q_null_semantics" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |    CASE CAST(c_custkey % 3 AS INT)
        |      WHEN 0 THEN NULL WHEN 1 THEN 'x' ELSE '' END AS v
        |  FROM customer)
        |SELECT c_custkey,
        |  coalesce(v, 'dflt') AS coalesced,
        |  nullif(v, 'x') AS nullified,
        |  ifnull(nullif(c_mktsegment, 'FURNITURE'), 'was-furniture') AS ifnulled
        |FROM t""".stripMargin,

    "q_curate_neardup" -> {
      s"""WITH $corpusCte,
         |surv AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, row_number() OVER (
         |      PARTITION BY md5(${normOf("text")}) ORDER BY doc_id) AS rn
         |    FROM corpus) t WHERE rn = 1),
         |sh AS (
         |  SELECT DISTINCT id,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS sh
         |  FROM (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
         |        FROM surv) t,
         |       unnest(generate_series(1, len(w) - 4)) AS u(i)),
         |${minhashSigCte("sig", "sh", 9)},
         |banded AS (
         |  ${minhashBandRowsSql("sig", 3, 3)}),
         |dropped AS (
         |  SELECT DISTINCT b.id AS doc_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id)
         |SELECT (SELECT count(*) FROM corpus) AS n_input,
         |  (SELECT count(*) FROM surv) AS n_after_exact,
         |  (SELECT count(*) FROM surv WHERE doc_id NOT IN
         |     (SELECT doc_id FROM dropped)) AS n_after_near""".stripMargin
    },

    "q_rank_suite" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q_simhash_portable" -> {
      val votes = (0 until 60).map { b =>
        s"list_sum(list_transform(w, x -> CASE WHEN ((('0x' || substr(md5(x), 1, 15))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END)) AS v$b"
      }.mkString(",\n    ")
      val sig = (0 until 60).map { b =>
        s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END"
      }.mkString("(", "\n + ", ")")
      s"""WITH w AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS w FROM documents),
         |v AS (SELECT doc_id,
         |    $votes
         |  FROM w)
         |SELECT doc_id, CAST($sig AS BIGINT) AS sig FROM v""".stripMargin
    },

    "q_range_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_us, value AS c_value
        |      FROM events WHERE event_type = 'click')
        |SELECT p.p_id, p.user_id, count(*) AS n_nearby_clicks,
        |  round(sum(c.c_value), 2) AS nearby_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND abs(p.p_us - c.c_us) <= 1800000000
        |GROUP BY p.p_id, p.user_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, price, cust_orders FROM (
        |  SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price,
        |    (SELECT count(*) FROM orders o2
        |     WHERE o2.o_custkey = o.o_custkey) AS cust_orders
        |  FROM orders o) t
        |WHERE cust_orders >= 8""".stripMargin,

    "q_window_frames" ->
      """SELECT event_id, user_id,
        |  round(first_value(value) OVER w, 2) AS first_in_frame,
        |  round(last_value(value) OVER w, 2) AS last_in_frame,
        |  round(nth_value(value, 2) OVER w, 2) AS second_in_frame
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_conditional_agg" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
        |  round(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                 THEN o_totalprice ELSE 0 END), 2) AS urgent_total,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_totalprice > 400000) AS any_huge
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_gapfill" ->
      """WITH b AS (SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS mn,
        |    CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS mx FROM events),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        |  FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |agg AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |    event_type, count(*) AS cnt, round(sum(value), 2) AS sum_v
        |  FROM events GROUP BY 1, 2)
        |SELECT epoch_us(s.h) AS hour_us, t.event_type,
        |  coalesce(a.cnt, 0) AS n, coalesce(a.sum_v, 0.0) AS total
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type""".stripMargin,

    "q_temporal_join" ->
      // same SCD2-from-µs-versions construction, same validity
      // predicate on the equi-key join; LEFT so facts predating the
      // first version null-fill on both engines
      """WITH c AS (
        |  SELECT c_custkey AS k,
        |    CAST(floor(floor(c_acctbal * 100 + 0.5) / 200000.0) AS BIGINT)
        |      AS band
        |  FROM customer),
        |h AS (
        |  SELECT k, band, epoch_us(TIMESTAMP '2023-12-01') AS vts FROM c
        |  UNION ALL
        |  SELECT k, band + 1, epoch_us(TIMESTAMP '2024-01-15') FROM c
        |  WHERE k % 3 = 0),
        |d AS (
        |  SELECT k, band, vts AS valid_from,
        |    lead(vts) OVER (PARTITION BY k ORDER BY vts) AS valid_to
        |  FROM h),
        |e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
        |SELECT e.event_id, e.user_id, d.band, d.valid_from,
        |  CASE WHEN d.k IS NULL THEN NULL
        |       ELSE d.valid_to IS NULL END AS is_current
        |FROM e LEFT JOIN d
        |  ON d.k = e.user_id AND d.valid_from <= e.us
        |  AND (d.valid_to IS NULL OR e.us < d.valid_to)""".stripMargin,

    "q_kcore" -> {
      // same pair fragments as q_dedup_cluster, then 6 UNROLLED peel
      // rounds (degree-over-survivors → keep deg ≥ 2); the Spark
      // operator peels to FIXPOINT, so hash-equality also certifies
      // that 6 rounds converge on this data. Output = degrees over
      // the fixpoint-induced subgraph.
      // every CTE below is MATERIALIZED: DuckDB inlines plain CTEs,
      // and each peel round references the previous one twice — the
      // inlined expansion is EXPONENTIAL in rounds (2^6 copies of the
      // shingle self-join; measured: >300s at sf0.001 inlined, <1s
      // materialized)
      val rounds = 6
      val peel = (1 to rounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT p, count(*) AS c FROM (
           |    SELECT id_a AS p, id_b AS q FROM pairs
           |    UNION ALL SELECT id_b, id_a FROM pairs) t
           |  WHERE p IN (SELECT id FROM n${i - 1})
           |    AND q IN (SELECT id FROM n${i - 1})
           |  GROUP BY p),
           |n$i AS MATERIALIZED (SELECT p AS id FROM d$i WHERE c >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |n0 AS MATERIALIZED (SELECT id_a AS id FROM pairs
         |       UNION SELECT id_b FROM pairs),
         |$peel,
         |fin AS (
         |  SELECT p, count(*) AS c FROM (
         |    SELECT id_a AS p, id_b AS q FROM pairs
         |    UNION ALL SELECT id_b, id_a FROM pairs) t
         |  WHERE p IN (SELECT id FROM n$rounds)
         |    AND q IN (SELECT id FROM n$rounds)
         |  GROUP BY p)
         |SELECT p AS id, c AS core_deg FROM fin""".stripMargin
    },

    "q_ktruss" -> {
      // Graph.kTruss mirror: same pair fragments as q_kcore, then 5
      // UNROLLED truss-peel rounds — oriented triangle enumeration
      // (x<y<z once each), per-edge support via the 3-way UNION ALL,
      // keep support ≥ k−2 (= 1 at k = 3). The Spark operator peels to
      // FIXPOINT, so hash-equality certifies 5 rounds converge on this
      // data. MATERIALIZED per the q_kcore lesson (each round
      // references the previous twice — plain CTEs inline
      // exponentially).
      val rounds = 5
      val peel = (1 to rounds).map { i =>
        s"""tri$i AS MATERIALIZED (
           |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e2.a = e1.b
           |  JOIN e${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
           |sup$i AS MATERIALIZED (
           |  SELECT a, b, CAST(count(*) AS BIGINT) AS sup FROM (
           |    SELECT x AS a, y AS b FROM tri$i
           |    UNION ALL SELECT y AS a, z AS b FROM tri$i
           |    UNION ALL SELECT x AS a, z AS b FROM tri$i) t
           |  GROUP BY 1, 2),
           |e$i AS MATERIALIZED (SELECT a, b FROM sup$i WHERE sup >= 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs),
         |$peel,
         |trif AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e$rounds e1 JOIN e$rounds e2 ON e2.a = e1.b
         |  JOIN e$rounds e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT a AS id_a, b AS id_b, CAST(count(*) AS BIGINT) AS support
         |FROM (
         |  SELECT x AS a, y AS b FROM trif
         |  UNION ALL SELECT y AS a, z AS b FROM trif
         |  UNION ALL SELECT x AS a, z AS b FROM trif) t
         |GROUP BY 1, 2""".stripMargin
    },

    "q_pagerank_fixed" -> {
      // same pair fragments as q_dedup_ngram, then 5 UNROLLED
      // fixed-point PageRank rounds in exact integer arithmetic —
      // rank in 1e12-units, per-edge contribution rk // deg, damping
      // 85/100 as integer mul+div. Integer sums are order-free, so
      // this is a HARD hash gate on an iterative graph algorithm
      // (the float q_pagerank cannot be: IEEE adds in partition
      // order). DuckDB's sum(BIGINT) widens to HUGEINT → every
      // round re-casts rk to BIGINT (lossless: mass ≤ 1e12).
      // MATERIALIZED for the same exponential-inlining reason as
      // q_kcore: each round references the previous twice.
      val rounds = 5
      val scale = "1000000000000"
      val base = s"((15 * $scale) // (100 * (SELECT n FROM nn)))"
      val iters = (1 to rounds).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT nd.id, CAST($base
           |      + (85 * coalesce(s.inflow, 0)) // 100 AS BIGINT) AS rk
           |  FROM nodes nd LEFT JOIN (
           |    SELECT p.id_b AS id, sum(r.rk // d.deg) AS inflow
           |    FROM pairs p
           |    JOIN r${i - 1} r ON r.id = p.id_a
           |    JOIN outdeg d ON d.src = p.id_a
           |    GROUP BY 1) s ON s.id = nd.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |nodes AS MATERIALIZED (SELECT id_a AS id FROM pairs
         |         UNION SELECT id_b FROM pairs),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |outdeg AS MATERIALIZED (
         |  SELECT id_a AS src, count(*) AS deg FROM pairs GROUP BY 1),
         |r0 AS MATERIALIZED (
         |  SELECT id, CAST($scale // (SELECT n FROM nn) AS BIGINT) AS rk
         |  FROM nodes),
         |$iters
         |SELECT id AS doc_id, rk AS rank_fp FROM r$rounds""".stripMargin
    },

    "q_ppr" -> {
      // Graph.pprFixed mirror on the same near-dup pair graph as
      // q_pagerank_fixed: identical integer-round algebra, but the
      // teleport mass lands ONLY on the seed (min node id, |S| = 1) —
      // base and the r0 init are seed-conditional, everything else is
      // the q_pagerank_fixed unroll verbatim.
      val rounds = 5
      val scale = "1000000000000"
      val base = s"((15 * $scale) // 100)"
      val iters = (1 to rounds).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT nd.id, CAST(
           |      (CASE WHEN nd.id = (SELECT sid FROM seed)
           |            THEN $base ELSE 0 END)
           |      + (85 * coalesce(s.inflow, 0)) // 100 AS BIGINT) AS rk
           |  FROM nodes nd LEFT JOIN (
           |    SELECT p.id_b AS id, sum(r.rk // d.deg) AS inflow
           |    FROM pairs p
           |    JOIN r${i - 1} r ON r.id = p.id_a
           |    JOIN outdeg d ON d.src = p.id_a
           |    GROUP BY 1) s ON s.id = nd.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |nodes AS MATERIALIZED (SELECT id_a AS id FROM pairs
         |         UNION SELECT id_b FROM pairs),
         |seed AS MATERIALIZED (SELECT min(id) AS sid FROM nodes),
         |outdeg AS MATERIALIZED (
         |  SELECT id_a AS src, count(*) AS deg FROM pairs GROUP BY 1),
         |r0 AS MATERIALIZED (
         |  SELECT id, CAST(CASE WHEN id = (SELECT sid FROM seed)
         |      THEN $scale ELSE 0 END AS BIGINT) AS rk
         |  FROM nodes),
         |$iters
         |SELECT id AS doc_id, rk AS rank_fp FROM r$rounds""".stripMargin
    },

    "q_link_predict" ->
      // Graph.linkPrediction mirror on the support-2 co-purchase
      // graph: wedge join through degree-capped hubs, exact integer
      // common-neighbor counts + Σ⌊10⁶/deg⌋ resource-allocation
      // micro-units, existing edges anti-joined away, top-100 under
      // the total (cn desc, ra_micro desc, a, b) order
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.pk AS a, b.pk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1 HAVING count(*) <= 1000),
        |hop AS MATERIALIZED (
        |  SELECT s.b AS z, s.a AS a, d.deg
        |  FROM sym s JOIN deg d ON d.z = s.b),
        |w AS (SELECT h1.a AS a, h2.a AS b, h1.deg AS deg
        |  FROM hop h1 JOIN hop h2 ON h1.z = h2.z AND h1.a < h2.a),
        |sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
        |  FROM w GROUP BY 1, 2),
        |cand AS (SELECT sc.a, sc.b, sc.cn, sc.ra_micro FROM sc
        |  LEFT JOIN e ON e.a = sc.a AND e.b = sc.b WHERE e.a IS NULL)
        |SELECT a AS id_a, b AS id_b, cn, ra_micro FROM cand
        |ORDER BY cn DESC, ra_micro DESC, a, b LIMIT 100""".stripMargin,

    "q_bradley_terry" -> {
      // Prefs.bradleyTerryFixed mirror: implicit judgments from
      // consecutive same-user events (higher value wins), then 5
      // exact-integer MM rounds unrolled — every division a positive
      // floor div, clamps LEAST/GREATEST mirrored, MATERIALIZED per
      // round against exponential CTE inlining (the q_kcore lesson)
      val rounds = 5
      val s2 = "1000000 * 1000000"
      val iters = (1 to rounds).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT it.i, CAST(LEAST(1000000000000, GREATEST(1,
           |      (it.wins * $s2) // GREATEST(d.den, 1))) AS BIGINT) AS p
           |  FROM items it JOIN (
           |    SELECT pr.i, sum((pr.nij * $s2) // (p1.p + p2.p)) AS den
           |    FROM pairs pr
           |    JOIN r${i - 1} p1 ON p1.i = pr.i
           |    JOIN r${i - 1} p2 ON p2.i = pr.j
           |    GROUP BY 1) d ON d.i = it.i)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT event_type, value,
         |    lead(event_type) OVER w AS nt, lead(value) OVER w AS nv
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |cmp AS (
         |  SELECT CASE WHEN value > nv THEN event_type ELSE nt END
         |      AS win,
         |    CASE WHEN value > nv THEN nt ELSE event_type END AS lose
         |  FROM seq
         |  WHERE nt IS NOT NULL AND nt <> event_type AND value <> nv),
         |w AS MATERIALIZED (
         |  SELECT win, lose, CAST(count(*) AS BIGINT) AS c
         |  FROM cmp GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT i, j, CAST(sum(c) AS BIGINT) AS nij FROM (
         |    SELECT win AS i, lose AS j, c FROM w
         |    UNION ALL SELECT lose, win, c FROM w)
         |  GROUP BY 1, 2),
         |items AS MATERIALIZED (
         |  SELECT p.i, CAST(sum(p.nij) AS BIGINT) AS games,
         |    CAST(coalesce(ww.wsum, 0) AS BIGINT) AS wins
         |  FROM pairs p LEFT JOIN (
         |    SELECT win, sum(c) AS wsum FROM w GROUP BY 1) ww
         |    ON ww.win = p.i
         |  GROUP BY 1, ww.wsum),
         |r0 AS MATERIALIZED (
         |  SELECT i, CAST(1000000 AS BIGINT) AS p FROM items),
         |$iters
         |SELECT it.i AS item, it.games AS n_games, it.wins AS n_wins,
         |  r.p AS rating_fp
         |FROM items it JOIN r$rounds r ON r.i = it.i""".stripMargin
    },

    "q_distinct_ngrams" ->
      // Corpus.distinctNgrams mirror: per language the exact unigram/
      // bigram totals and distincts, micro-unit floor-div ratios;
      // bigram assembly identical to the Spark concat_ws(' ', a, b)
      s"""WITH wd AS (
         |  SELECT lang, string_split(${normOf("text")}, ' ') AS ws
         |  FROM documents),
         |uni AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_uni,
         |    CAST(count(DISTINCT x) AS BIGINT) AS d_uni
         |  FROM (SELECT lang, unnest(ws) AS x FROM wd) GROUP BY 1),
         |big AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_big,
         |    CAST(count(DISTINCT b) AS BIGINT) AS d_big
         |  FROM (SELECT lang, ws[u.i] || ' ' || ws[u.i + 1] AS b
         |    FROM wd, unnest(generate_series(1, len(ws) - 1)) AS u(i))
         |  GROUP BY 1)
         |SELECT u.lang, n_uni, d_uni,
         |  CAST(coalesce(b.n_big, 0) AS BIGINT) AS n_big,
         |  CAST(coalesce(b.d_big, 0) AS BIGINT) AS d_big,
         |  d_uni * 1000000 // n_uni AS distinct1_micro,
         |  CASE WHEN coalesce(b.n_big, 0) = 0 THEN NULL
         |    ELSE d_big * 1000000 // n_big END AS distinct2_micro
         |FROM uni u LEFT JOIN big b USING (lang)""".stripMargin,

    "q_eb_shrinkage" ->
      // Stats.ebShrinkage mirror: the (μ, σ², α, β) doubles come from
      // ONE fixed expression tree over exact integer moments —
      // parenthesization matches the Scala driver computation exactly
      // (IEEE ops are exactly rounded; only fold ORDER is hazardous,
      // and there is none); degenerate corpora (k<2, σ²≤0, common≤0)
      // fall back to the raw rate with null prior, same branch both
      // engines
      """WITH seg AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM documents GROUP BY 1, 2),
        |sg AS (SELECT lang, source, n, x,
        |    x * 1000000 // n AS rate_micro FROM seg),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(rate_micro) AS BIGINT) AS sr,
        |    CAST(sum(rate_micro * rate_micro) AS BIGINT) AS srr
        |  FROM sg),
        |p AS (SELECT k,
        |    CAST(sr AS DOUBLE) / (CAST(k AS DOUBLE) * 1e6) AS mu,
        |    (CAST(k AS DOUBLE) * CAST(srr AS DOUBLE)
        |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
        |      / (CAST(k AS DOUBLE) * CAST(k - 1 AS DOUBLE) * 1e12) AS v
        |  FROM m),
        |ab AS (SELECT
        |    CASE WHEN k < 2 OR v <= 0
        |        OR mu * (1 - mu) / v - 1 <= 0 THEN NULL
        |      ELSE mu * (mu * (1 - mu) / v - 1) END AS alpha,
        |    CASE WHEN k < 2 OR v <= 0
        |        OR mu * (1 - mu) / v - 1 <= 0 THEN NULL
        |      ELSE (1 - mu) * (mu * (1 - mu) / v - 1) END AS beta
        |  FROM p)
        |SELECT lang, source, n, x, rate_micro,
        |  CASE WHEN alpha IS NULL THEN round(CAST(x AS DOUBLE) / n, 6)
        |    ELSE round((x + alpha) / (n + (alpha + beta)), 6)
        |  END AS shrunk_6,
        |  round(alpha, 6) AS alpha_6, round(beta, 6) AS beta_6
        |FROM sg CROSS JOIN ab""".stripMargin,

    "q_token_f1" ->
      // Corpus.tokenF1 mirror: canonical normOf tokens, multiset
      // intersection Σ least(tf_p, tf_r), F1 = 2·ov/(lp+lr) as one
      // exact BIGINT floor division in micro-units
      s"""WITH pr AS (SELECT a.doc_id AS pid, a.text AS p, b.text AS r
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |pt AS (SELECT pid, tok, CAST(count(*) AS BIGINT) AS np
         |  FROM (SELECT pid,
         |      unnest(string_split(${normOf("p")}, ' ')) AS tok FROM pr)
         |  WHERE len(tok) > 0 GROUP BY 1, 2),
         |rt AS (SELECT pid, tok, CAST(count(*) AS BIGINT) AS nr
         |  FROM (SELECT pid,
         |      unnest(string_split(${normOf("r")}, ' ')) AS tok FROM pr)
         |  WHERE len(tok) > 0 GROUP BY 1, 2),
         |lp AS (SELECT pid, CAST(sum(np) AS BIGINT) AS len_pred
         |  FROM pt GROUP BY 1),
         |lr AS (SELECT pid, CAST(sum(nr) AS BIGINT) AS len_ref
         |  FROM rt GROUP BY 1),
         |ov AS (SELECT pt.pid, CAST(sum(least(np, nr)) AS BIGINT) AS ov
         |  FROM pt JOIN rt ON pt.pid = rt.pid AND pt.tok = rt.tok
         |  GROUP BY 1)
         |SELECT pr.pid AS pair_id,
         |  CAST(coalesce(lp.len_pred, 0) AS BIGINT) AS len_pred,
         |  CAST(coalesce(lr.len_ref, 0) AS BIGINT) AS len_ref,
         |  CAST(coalesce(ov.ov, 0) AS BIGINT) AS overlap,
         |  CASE WHEN coalesce(lp.len_pred, 0) + coalesce(lr.len_ref, 0) = 0
         |    THEN NULL
         |    ELSE CAST(2000000 * coalesce(ov.ov, 0)
         |      // (coalesce(lp.len_pred, 0) + coalesce(lr.len_ref, 0))
         |      AS BIGINT) END AS f1_micro
         |FROM pr
         |LEFT JOIN lp ON lp.pid = pr.pid
         |LEFT JOIN lr ON lr.pid = pr.pid
         |LEFT JOIN ov ON ov.pid = pr.pid""".stripMargin,

    "q_merge_full" ->
      // Loads.mergeInto mirror: one FULL OUTER key join carries all
      // four MERGE outcomes; matched+negative-target-balance rows are
      // deleted, matched take source values, unmatched-source insert,
      // unmatched-target pass through
      """WITH cust AS (SELECT c_custkey, c_name,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |src AS (
        |  SELECT c_custkey, c_name, bal_cents + 10000 AS bal_cents
        |  FROM cust WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 100000000 AS c_custkey,
        |    'NEW ' || c_name AS c_name, CAST(0 AS BIGINT) AS bal_cents
        |  FROM cust WHERE c_custkey % 11 = 3)
        |SELECT coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
        |    ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.bal_cents
        |    ELSE t.bal_cents END AS bal_cents
        |FROM cust t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        |WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
        |  AND t.bal_cents < 0)""".stripMargin,

    "q_cuped" ->
      // Stats.cuped mirror: exact HUGEINT moment sums, θ = ONE double
      // division of exactly-computed integers, adjusted mean the same
      // fixed IEEE expression tree ȳ_a − θ·(x̄_a − x̄), floor(·10⁶+0.5)
      """WITH per AS (SELECT o_custkey % 2 AS arm,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01'
        |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01' THEN 0
        |      ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      END) AS BIGINT) AS y
        |  FROM orders GROUP BY o_custkey),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM per),
        |th AS (SELECT
        |    CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
        |      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
        |        / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM g),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
        |    sum(CAST(x AS HUGEINT)) AS sxa, sum(CAST(y AS HUGEINT)) AS sya
        |  FROM per GROUP BY arm)
        |SELECT a.arm,
        |  a.n_units,
        |  CAST(floor(CAST(sya AS DOUBLE) / CAST(n_units AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS mean_y_micro,
        |  CAST(floor((CAST(sya AS DOUBLE) / CAST(n_units AS DOUBLE)
        |    - th.theta * (CAST(sxa AS DOUBLE) / CAST(n_units AS DOUBLE)
        |      - th.xbar)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS mean_cuped_micro,
        |  CAST(floor(th.theta * 1000000.0 + 0.5) AS BIGINT) AS theta_micro
        |FROM a CROSS JOIN th""".stripMargin,

    "q_dsir" ->
      // Corpus.dsirSelect mirror: hashed-unigram buckets (same 48-bit
      // md5-prefix integers), add-one log ratios as ONE ln of an
      // exact-integer rational, per-doc position-ordered ln fold with
      // a prepended 0.0 (matches Spark's aggregate init), 6dp; greedy
      // top-100 under (logw_6 desc, id)
      s"""WITH srct AS (
         |  SELECT id, u.i - 1 AS pos,
         |    CAST('0x' || substring(md5(ws[u.i]), 1, 12) AS BIGINT)
         |      % 4096 AS b
         |  FROM (SELECT doc_id AS id,
         |      string_split(${normOf("text")}, ' ') AS ws
         |    FROM documents) t,
         |    unnest(generate_series(1, len(ws))) AS u(i)),
         |tgtt AS (
         |  SELECT CAST('0x' || substring(md5(ws[u.i]), 1, 12) AS BIGINT)
         |      % 4096 AS b
         |  FROM (SELECT string_split(${normOf("text")}, ' ') AS ws
         |    FROM documents WHERE lang = 'en') t,
         |    unnest(generate_series(1, len(ws))) AS u(i)),
         |sc AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM srct
         |  GROUP BY 1),
         |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tgtt
         |  GROUP BY 1),
         |tot AS (SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM srct) AS ts,
         |    (SELECT CAST(count(*) AS BIGINT) FROM tgtt) AS tt),
         |lnrt AS MATERIALIZED (SELECT sc.b,
         |    ln(CAST((coalesce(tc.ct, 0) + 1) * (ts + 4096) AS DOUBLE)
         |      / CAST((sc.cs + 1) * (tt + 4096) AS DOUBLE)) AS lnr
         |  FROM sc LEFT JOIN tc ON tc.b = sc.b CROSS JOIN tot),
         |pd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(l.lnr ORDER BY pos)), (a, x) -> a + x), 6) AS logw_6
         |  FROM srct JOIN lnrt l USING (b) GROUP BY 1)
         |SELECT id AS doc_id, n_tokens, logw_6,
         |  CAST(row_number() OVER (ORDER BY logw_6 DESC, id) AS BIGINT)
         |    AS rank
         |FROM pd ORDER BY logw_6 DESC, id LIMIT 100""".stripMargin,

    "q_fertility" ->
      // Corpus.tokenizerFertility mirror: E10's two tokenizations per
      // doc, corpus totals per language, micro floor-div ratios
      """WITH t AS (SELECT lang, CAST(len(text) AS BIGINT) AS c,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS w,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS t
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(c) AS BIGINT) AS n_chars,
        |  CAST(sum(w) AS BIGINT) AS n_words,
        |  CAST(sum(t) AS BIGINT) AS n_tokens,
        |  CASE WHEN sum(w) = 0 THEN NULL
        |    ELSE CAST(sum(t) * 1000000 // sum(w) AS BIGINT)
        |  END AS fertility_micro,
        |  CASE WHEN sum(t) = 0 THEN NULL
        |    ELSE CAST(sum(c) * 1000000 // sum(t) AS BIGINT)
        |  END AS chars_per_token_micro
        |FROM t GROUP BY 1""".stripMargin,

    "q_fdr_battery" -> {
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      val h12 = (2 to 12).foldLeft(hv(1))((acc, i) =>
        s"(16*$acc + ${hv(i)})")
      // Stats.permutationBatteryFdr mirror: the q_perm_test machinery
      // with the segment threaded through every stage, then the BH
      // step-up by exact integer cross-multiplication (p·m ≤ rank·q)
      s"""WITH d AS (SELECT event_type AS seg,
         |    extract(day FROM ts) <= 15 AS isa,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         |    md5(CAST(event_id AS VARCHAR)) AS h
         |  FROM events),
         |ds AS (SELECT seg, isa, v, CAST($h12 AS BIGINT) AS seed FROM d),
         |ob AS (SELECT seg,
         |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN isa THEN v ELSE 0 END) AS BIGINT) AS sa,
         |    CAST(sum(CASE WHEN isa THEN 0 ELSE v END) AS BIGINT) AS sb
         |  FROM ds GROUP BY 1),
         |obs AS (SELECT seg, n_a, n_b,
         |    CAST(sa * 1000000 // n_a - sb * 1000000 // n_b AS BIGINT)
         |      AS diff_obs_micro,
         |    CAST(n_a * 10000 // (n_a + n_b) AS BIGINT) AS pa_bp
         |  FROM ob WHERE n_a > 0 AND n_b > 0),
         |fl AS (SELECT ds.seg, ds.v, CAST(u.r AS BIGINT) AS r,
         |    (ds.seed * (CAST(u.r AS BIGINT) * 2 + 1)
         |      + CAST(u.r AS BIGINT)) % 10000 < obs.pa_bp AS toa
         |  FROM ds JOIN obs USING (seg),
         |    unnest(generate_series(1, 60)) AS u(r)),
         |rd AS (SELECT seg, r,
         |    CAST(sum(CASE WHEN toa THEN 1 ELSE 0 END) AS BIGINT) AS ma,
         |    CAST(sum(CASE WHEN toa THEN 0 ELSE 1 END) AS BIGINT) AS mb,
         |    CAST(sum(CASE WHEN toa THEN v ELSE 0 END) AS BIGINT) AS ra,
         |    CAST(sum(CASE WHEN toa THEN 0 ELSE v END) AS BIGINT) AS rb
         |  FROM fl GROUP BY 1, 2),
         |df2 AS (SELECT seg,
         |    CAST(ra * 1000000 // ma - rb * 1000000 // mb AS BIGINT)
         |      AS diff_r
         |  FROM rd WHERE ma > 0 AND mb > 0),
         |tl AS (SELECT df2.seg, CAST(count(*) AS BIGINT) AS n_reps,
         |    CAST(sum(CASE WHEN abs(diff_r) >= abs(obs.diff_obs_micro)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
         |  FROM df2 JOIN obs USING (seg) GROUP BY 1),
         |pv AS (SELECT obs.seg, obs.n_a, obs.n_b, obs.diff_obs_micro,
         |    CAST((1 + coalesce(tl.n_ge, 0)) * 1000000
         |      // (coalesce(tl.n_reps, 0) + 1) AS BIGINT) AS p_micro
         |  FROM obs LEFT JOIN tl USING (seg)),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
         |rk AS (SELECT pv.*, m,
         |    CAST(row_number() OVER (ORDER BY p_micro, seg) AS BIGINT)
         |      AS "rank"
         |  FROM pv CROSS JOIN mm),
         |ks AS (SELECT coalesce(max(CASE
         |    WHEN p_micro * m <= "rank" * 100000 THEN "rank" END), 0)
         |    AS kstar FROM rk)
         |SELECT seg AS event_type, n_a, n_b, diff_obs_micro, p_micro,
         |  "rank", "rank" <= kstar AS rejected
         |FROM rk CROSS JOIN ks""".stripMargin
    },

    "q_woe_iv" -> {
      val qs = (1 to 9).map(i =>
        s"min(CASE WHEN cum * 10 >= n * $i THEN cents END) AS q$i")
        .mkString(",\n         |    ")
      val ladder = (1 to 9).map(i =>
        s"(CASE WHEN cents > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      // Stats.woeIv mirror: decile bounds by the exact integer rank
      // test; per-bin WOE = ONE ln of ONE division of two exact
      // integer cross products (add-one smoothing keeps empty bins
      // finite); IV folds its 10 terms in bin order
      s"""WITH av AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
         |    AS BIGINT) AS cents,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |v AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM av
         |  GROUP BY 1),
         |w AS (SELECT cents,
         |    CAST(sum(c) OVER (ORDER BY cents) AS BIGINT) AS cum,
         |    CAST((SELECT count(*) FROM av) AS BIGINT) AS n FROM v),
         |bnd AS (SELECT $qs
         |  FROM w),
         |bc AS (SELECT CAST(1 + $ladder AS BIGINT) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_bad
         |  FROM av CROSS JOIN bnd GROUP BY 1),
         |sp AS (SELECT CAST(u.b AS BIGINT) AS bin
         |  FROM unnest(generate_series(1, 10)) AS u(b)),
         |full0 AS (SELECT sp.bin, coalesce(bc.n, 0) AS n,
         |    coalesce(bc.n - bc.n_bad, 0) AS n_good,
         |    coalesce(bc.n_bad, 0) AS n_bad
         |  FROM sp LEFT JOIN bc USING (bin)),
         |t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
         |    CAST(sum(n_bad) AS BIGINT) AS tb FROM full0),
         |terms AS (SELECT f.bin, f.n, f.n_good, f.n_bad,
         |    ln(CAST((f.n_good + 1) * (t.tb + 10) AS DOUBLE)
         |      / CAST((f.n_bad + 1) * (t.tg + 10) AS DOUBLE)) AS woe,
         |    (CAST(f.n_good + 1 AS DOUBLE) / CAST(t.tg + 10 AS DOUBLE)
         |     - CAST(f.n_bad + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE))
         |    * ln(CAST((f.n_good + 1) * (t.tb + 10) AS DOUBLE)
         |      / CAST((f.n_bad + 1) * (t.tg + 10) AS DOUBLE)) AS tm
         |  FROM full0 f CROSS JOIN t),
         |iv AS (SELECT round((SELECT list_reduce(
         |    list_prepend(0.0, list(tm ORDER BY bin)),
         |    (x, y) -> x + y) FROM terms), 6) AS iv_6)
         |SELECT terms.bin, terms.n, terms.n_good, terms.n_bad,
         |  round(terms.woe, 6) AS woe_6, iv.iv_6
         |FROM terms CROSS JOIN iv""".stripMargin
    },

    "q_jonckheere" ->
      // Stats.jonckheere mirror: (group, value) counts, value-spine ×
      // groups grid, per-group running sum, 2J = Σ cnt_j·(2cum_i −
      // cnt_i) over ordered group pairs at each value — exact HUGEINT;
      // z from the no-tie moments with the identical IEEE tree, 6dp
      """WITH src AS (SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM src GROUP BY 1, 2),
        |grid AS (SELECT x.g, x.v, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |  FROM (SELECT g, v FROM (SELECT DISTINCT v FROM c)
        |        CROSS JOIN (SELECT DISTINCT g FROM c)) x
        |  LEFT JOIN c ON c.g = x.g AND c.v = x.v),
        |cum AS (SELECT g, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cum
        |  FROM grid),
        |j AS (SELECT coalesce(sum(
        |    CAST(b.cnt AS HUGEINT) * (2 * a.cum - a.cnt)),
        |    CAST(0 AS HUGEINT)) AS j2
        |  FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g),
        |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |  FROM src GROUP BY g),
        |tot AS (SELECT sum(CAST(n AS HUGEINT)) AS nt,
        |    sum(CAST(n AS HUGEINT) * n) AS sn2,
        |    sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS sn23,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM sizes)
        |SELECT CAST(nt AS BIGINT) AS n_total, k AS k_groups,
        |  CAST(j2 AS BIGINT) AS j2,
        |  round(CASE WHEN nt * nt * (2 * nt + 3) - sn23 = 0 THEN 0.0
        |    ELSE CAST(j2 - (nt * nt - sn2) // 2 AS DOUBLE)
        |      / (2.0 * sqrt(CAST(nt * nt * (2 * nt + 3) - sn23 AS DOUBLE)
        |        / 72.0)) END, 6) AS z_6
        |FROM j CROSS JOIN tot""".stripMargin,

    "q_kruskal_wallis" ->
      // Stats.kruskalWallis mirror: 2·midrank = 2·cum + t + 1 exact
      // BIGINT carriers from value-cardinality tie counts; the per-
      // group (2R)²/(4n) doubles folded in group-key order with a
      // prepended 0.0 so the fold tree matches Spark's aggregate(init
      // 0.0) exactly; fixed H / tie-correction expression trees, 6dp
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM d
        |  GROUP BY 1),
        |ranked AS (SELECT v, t,
        |    2 * coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS mr2
        |  FROM vals),
        |rg AS (SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
        |    CAST(sum(n_gv * mr2) AS BIGINT) AS r2_g
        |  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS n_gv
        |    FROM d GROUP BY 1, 2) gv
        |  JOIN ranked USING (v) GROUP BY 1),
        |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie FROM ranked),
        |fold AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
        |        / (4.0 * CAST(n_g AS DOUBLE)) ORDER BY g)),
        |      (a, b) -> a + b) AS s
        |  FROM rg)
        |SELECT nn AS n_total, k AS n_groups,
        |  round(12.0 * s / (CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) + 1.0))
        |    - 3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) AS h_6,
        |  CASE WHEN CAST(tie AS DOUBLE) = CAST(nn AS DOUBLE)
        |      * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |      - CAST(nn AS DOUBLE) THEN NULL
        |    ELSE round((12.0 * s / (CAST(nn AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) + 1.0))
        |      - 3.0 * (CAST(nn AS DOUBLE) + 1.0))
        |      / (1.0 - CAST(tie AS DOUBLE) / (CAST(nn AS DOUBLE)
        |        * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |        - CAST(nn AS DOUBLE))), 6)
        |  END AS h_tie_6
        |FROM fold CROSS JOIN tot""".stripMargin,

    "q_anova" ->
      // Stats.anovaF mirror: exact HUGEINT (n, Σv, Σv²) per group
      // (≡ Spark's DECIMAL(38,0)); SSB folds S_g²/n_g doubles in
      // group-key order with the 0.0 prepend; SST/SSW/F are the same
      // fixed IEEE trees — note ssw is written (q−s²/nn)−(ssbf−s²/nn),
      // NOT algebraically simplified, to match Spark's float tree
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    sum(CAST(v AS HUGEINT)) AS s_g,
        |    sum(CAST(v AS HUGEINT) * v) AS q_g
        |  FROM d GROUP BY 1),
        |fold AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_g) AS BIGINT) AS nn,
        |    CAST(sum(s_g) AS DOUBLE) AS s,
        |    CAST(sum(q_g) AS DOUBLE) AS q,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |        / CAST(n_g AS DOUBLE) ORDER BY g)),
        |      (a, b) -> a + b) AS ssbf
        |  FROM grp)
        |SELECT nn AS n_total, k AS n_groups,
        |  round(ssbf - s * s / CAST(nn AS DOUBLE), 6) AS ssb_6,
        |  round((q - s * s / CAST(nn AS DOUBLE))
        |    - (ssbf - s * s / CAST(nn AS DOUBLE)), 6) AS ssw_6,
        |  CASE WHEN k >= 2 AND nn > k
        |      AND (q - s * s / CAST(nn AS DOUBLE))
        |        - (ssbf - s * s / CAST(nn AS DOUBLE)) > 0
        |    THEN round(((ssbf - s * s / CAST(nn AS DOUBLE))
        |        / CAST(k - 1 AS DOUBLE))
        |      / (((q - s * s / CAST(nn AS DOUBLE))
        |        - (ssbf - s * s / CAST(nn AS DOUBLE)))
        |        / CAST(nn - k AS DOUBLE)), 6)
        |  END AS f_6
        |FROM fold""".stripMargin,

    "q_cliffs_delta" ->
      // Stats.cliffsDelta mirror: value-cardinality (ta, tb) counts,
      // two prefix windows give #B-below / #B-above each value, pair
      // counts as exact BIGINT sums, δ = one IEEE division, 6dp
      """WITH d AS (SELECT (event_type = 'purchase') AS isa,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |    AND value IS NOT NULL),
        |g AS (SELECT v,
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ta,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS tb
        |  FROM d GROUP BY 1),
        |r AS (SELECT ta, tb,
        |    coalesce(sum(tb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS b_lt,
        |    coalesce(sum(tb) OVER (ORDER BY v
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS b_gt
        |  FROM g)
        |SELECT CAST(sum(ta) AS BIGINT) AS n_a,
        |  CAST(sum(tb) AS BIGINT) AS n_b,
        |  CAST(sum(ta * b_lt) AS BIGINT) AS n_gt,
        |  CAST(sum(ta * b_gt) AS BIGINT) AS n_lt,
        |  CASE WHEN sum(ta) > 0 AND sum(tb) > 0 THEN
        |    round(CAST(sum(ta * b_lt) - sum(ta * b_gt) AS DOUBLE)
        |      / CAST(sum(ta) * sum(tb) AS DOUBLE), 6)
        |  END AS delta_6
        |FROM r""".stripMargin,

    "q_mood_median" ->
      // Stats.moodMedian mirror: pooled exact discrete q5000 median
      // (smallest value with 2·cum ≥ nn + nn%2), k×2 observed cells
      // exact, chi² terms folded in group-key order with 0.0 prepend
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM d
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn FROM vals),
        |med AS (SELECT min(v) AS med, min(nn) AS nn FROM (
        |    SELECT v, nn, sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM vals CROSS JOIN tot) x
        |  WHERE cum * 2 >= nn + (nn % 2)),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a_g,
        |    min(med) AS med, min(nn) AS nn
        |  FROM d CROSS JOIN med GROUP BY 1),
        |margins AS (SELECT CAST(sum(a_g) AS BIGINT) AS aa,
        |    min(nn) AS nn2, min(med) AS med2 FROM grp),
        |fold AS (SELECT CAST(count(*) AS BIGINT) AS k, aa, nn2, med2,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(
        |        (CAST(a_g AS DOUBLE) - CAST(n_g AS DOUBLE)
        |          * CAST(aa AS DOUBLE) / CAST(nn2 AS DOUBLE))
        |        * (CAST(a_g AS DOUBLE) - CAST(n_g AS DOUBLE)
        |          * CAST(aa AS DOUBLE) / CAST(nn2 AS DOUBLE))
        |        / (CAST(n_g AS DOUBLE) * CAST(aa AS DOUBLE)
        |          / CAST(nn2 AS DOUBLE))
        |        + (CAST(n_g - a_g AS DOUBLE) - CAST(n_g AS DOUBLE)
        |          * CAST(nn2 - aa AS DOUBLE) / CAST(nn2 AS DOUBLE))
        |        * (CAST(n_g - a_g AS DOUBLE) - CAST(n_g AS DOUBLE)
        |          * CAST(nn2 - aa AS DOUBLE) / CAST(nn2 AS DOUBLE))
        |        / (CAST(n_g AS DOUBLE) * CAST(nn2 - aa AS DOUBLE)
        |          / CAST(nn2 AS DOUBLE))
        |        ORDER BY g)),
        |      (a, b) -> a + b) AS chi
        |  FROM grp CROSS JOIN margins GROUP BY aa, nn2, med2)
        |SELECT nn2 AS n_total, k AS n_groups, med2 AS pooled_median,
        |  aa AS n_above,
        |  CASE WHEN aa > 0 AND aa < nn2 THEN round(chi, 6)
        |  END AS chi2_6
        |FROM fold""".stripMargin,

    "q_effect_size" ->
      // Stats.effectSize mirror: one conditional agg of exact HUGEINT
      // moments; d/g are fixed IEEE trees over single casts, 6dp
      """WITH d AS (SELECT (event_type = 'purchase') AS isa,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |    AND value IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN isa THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_a,
        |    sum(CASE WHEN NOT isa THEN CAST(v AS HUGEINT) ELSE 0 END)
        |      AS s_b,
        |    sum(CASE WHEN isa THEN CAST(v AS HUGEINT) * v ELSE 0 END)
        |      AS q_a,
        |    sum(CASE WHEN NOT isa THEN CAST(v AS HUGEINT) * v ELSE 0 END)
        |      AS q_b
        |  FROM d)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN
        |    round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |  END AS mean_a_6,
        |  CASE WHEN n_b > 0 THEN
        |    round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |  END AS mean_b_6,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b >= 3
        |      AND ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |          * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |          * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |        / CAST(n_a + n_b - 2 AS DOUBLE) > 0 THEN
        |    round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |          * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |          * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |        / CAST(n_a + n_b - 2 AS DOUBLE)), 6)
        |  END AS d_6,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b >= 3
        |      AND ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |          * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |          * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |        / CAST(n_a + n_b - 2 AS DOUBLE) > 0 THEN
        |    round(((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |          * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |          * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |        / CAST(n_a + n_b - 2 AS DOUBLE)))
        |      * (1.0 - 3.0 / (4.0 * CAST(n_a + n_b AS DOUBLE) - 9.0)),
        |      6)
        |  END AS g_6
        |FROM a""".stripMargin,

    "q_pettitt" ->
      // TimeSeries.pettitt mirror: per-key value-cardinality midrank
      // carriers r2 = 2·hi − t + 1, ordered cumsum → exact U_t, K and
      // the earliest argmax via the packed |U|·10⁹ − t key; p is one
      // transcendental of the same exact ratio, clamped at 1, 6dp
      """WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS k,
        |    CAST(ts AS DATE) AS o,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT * FROM daily WHERE k IS NOT NULL AND v IS NOT NULL
        |  AND o IS NOT NULL),
        |vals AS (SELECT k, v, CAST(count(*) AS BIGINT) AS t FROM d
        |  GROUP BY 1, 2),
        |ranked AS (SELECT k, v,
        |    2 * sum(t) OVER (PARTITION BY k ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - t + 1 AS r2
        |  FROM vals),
        |ser AS (SELECT d.k, d.o,
        |    sum(r.r2) OVER (PARTITION BY d.k ORDER BY d.o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v2,
        |    row_number() OVER (PARTITION BY d.k ORDER BY d.o) AS tt,
        |    count(*) OVER (PARTITION BY d.k) AS n
        |  FROM d JOIN ranked r ON d.k = r.k AND d.v = r.v),
        |u AS (SELECT k, o, v2 - tt * (n + 1) AS u, tt, n FROM ser
        |  WHERE tt <= n - 1)
        |SELECT k AS event_type, CAST(max(n) AS BIGINT) AS n_points,
        |  CAST(max(abs(u)) AS BIGINT) AS k_stat,
        |  CAST(arg_max(o, abs(u) * 1000000000 - tt) AS VARCHAR)
        |    AS t_star,
        |  round(least(1.0, 2.0 * exp(-6.0
        |    * CAST(max(abs(u)) * max(abs(u)) AS DOUBLE)
        |    / (CAST(max(n) AS DOUBLE) * CAST(max(n) AS DOUBLE)
        |        * CAST(max(n) AS DOUBLE)
        |      + CAST(max(n) AS DOUBLE) * CAST(max(n) AS DOUBLE)))), 6)
        |    AS p_6
        |FROM u GROUP BY 1""".stripMargin,

    "q_scd4" ->
      // Loads.scd4 mirror: the q_scd2 version stream; current = the
      // lead-less version per key (validity columns null), history =
      // the rest with (valid_from, valid_to) from the version order
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice AS price, 0 AS version
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 100000, 1 FROM orders
        |  WHERE o_orderkey % 4 = 0),
        |v AS (SELECT o_orderkey, price, version,
        |    lead(version) OVER (PARTITION BY o_orderkey
        |      ORDER BY version) AS nxt
        |  FROM base)
        |SELECT o_orderkey, round(price, 2) AS price,
        |  CAST(version AS BIGINT) AS version,
        |  CAST(NULL AS BIGINT) AS valid_from,
        |  CAST(NULL AS BIGINT) AS valid_to, 'current' AS tbl
        |FROM v WHERE nxt IS NULL
        |UNION ALL
        |SELECT o_orderkey, round(price, 2), CAST(version AS BIGINT),
        |  CAST(version AS BIGINT), CAST(nxt AS BIGINT), 'history'
        |FROM v WHERE nxt IS NOT NULL""".stripMargin,

    "q_quarantine" ->
      // Validate.quarantine mirror: declaration-ordered reason codes,
      // null rule results don't flag; concat_ws skips the NULL CASE
      // arms exactly like array_join over the filtered array
      """SELECT c_custkey, reasons FROM (
        |  SELECT c_custkey, concat_ws(',',
        |    CASE WHEN NOT coalesce(c_acctbal >= 0, TRUE)
        |      THEN 'balance_nonneg' END,
        |    CASE WHEN NOT coalesce(c_acctbal < 9000, TRUE)
        |      THEN 'balance_lt_9000' END,
        |    CASE WHEN NOT coalesce(c_mktsegment IN ('BUILDING',
        |        'MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD', 'FURNITURE'),
        |        TRUE)
        |      THEN 'known_segment' END) AS reasons
        |  FROM customer) q
        |WHERE length(reasons) > 0""".stripMargin,

    "q_chat_turns" ->
      // Sessions.conversationStats mirror: per-user lag over (ts,
      // event_id), exact counts/lengths, floor-div micro alternation
      // rate and integer-µs mean gap (operands non-negative, so
      // DuckDB // ≡ Spark div)
      """WITH t AS (SELECT user_id, event_type AS role,
        |    CAST(coalesce(length(props), 0) AS BIGINT) AS plen,
        |    epoch_us(ts) AS us,
        |    lag(event_type) OVER w AS prev_role,
        |    lag(epoch_us(ts)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
        |  CAST(sum(plen) AS BIGINT) AS payload_chars,
        |  CAST(sum(CASE WHEN prev_role IS NOT NULL
        |    AND role <> prev_role THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alternations,
        |  CASE WHEN count(*) > 1 THEN
        |    CAST(sum(CASE WHEN prev_role IS NOT NULL
        |      AND role <> prev_role THEN 1 ELSE 0 END) * 1000000
        |      // (count(*) - 1) AS BIGINT)
        |  END AS alternation_micro,
        |  CASE WHEN count(*) > 1 THEN
        |    CAST(sum(CASE WHEN prev_us IS NOT NULL
        |      THEN us - prev_us ELSE 0 END)
        |      // (count(*) - 1) AS BIGINT)
        |  END AS mean_gap_us
        |FROM t GROUP BY 1""".stripMargin,

    "q_gamma_somers" ->
      // Stats.ordinalAssociation mirror: contingency cells, C/D from
      // the cell-pair join (xa < xb) as exact BIGINT Σ n₁·n₂, T_x
      // from the x-margin; gamma and Somers' d_yx ONE IEEE division
      // each, 6dp
      """WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(least(floor(l_extendedprice / 5000), 20) AS BIGINT)
        |      AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn FROM d
        |  GROUP BY 1, 2),
        |cd AS (SELECT
        |    coalesce(CAST(sum(CASE WHEN b.y > a.y THEN a.cn * b.cn
        |      ELSE 0 END) AS BIGINT), 0) AS c,
        |    coalesce(CAST(sum(CASE WHEN b.y < a.y THEN a.cn * b.cn
        |      ELSE 0 END) AS BIGINT), 0) AS dd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |marg AS (SELECT CAST(sum(tx) AS BIGINT) AS nn,
        |    CAST(sum(tx * (tx - 1)) AS BIGINT) AS tx2
        |  FROM (SELECT CAST(sum(cn) AS BIGINT) AS tx FROM cells
        |    GROUP BY x) m)
        |SELECT nn AS n_rows, c AS c_pairs, dd AS d_pairs,
        |  CASE WHEN c + dd > 0 THEN
        |    round(CAST(c - dd AS DOUBLE) / CAST(c + dd AS DOUBLE), 6)
        |  END AS gamma_6,
        |  CASE WHEN nn * (nn - 1) - tx2 > 0 THEN
        |    round(CAST(2 * (c - dd) AS DOUBLE)
        |      / CAST(nn * (nn - 1) - tx2 AS DOUBLE), 6)
        |  END AS somers_d_6
        |FROM cd CROSS JOIN marg""".stripMargin,

    "q_page_trend" ->
      // Stats.pageTrend mirror: the q_friedman rank machinery with
      // j = lexicographic system index; 2L exact BIGINT, E[2L] an
      // exact integer half (k(k+1) even), Var[2L] ONE double
      // division by 36.0 — identical cast points, 6dp
      """WITH obs AS (SELECT o_orderkey % 311 AS task,
        |    o_orderpriority AS sys,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT sys) AS BIGINT) AS k FROM obs),
        |tc AS (SELECT task, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(DISTINCT sys) AS BIGINT) AS ds
        |  FROM obs GROUP BY 1),
        |meta AS (SELECT
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN cnt = k AND ds = k THEN 0 ELSE 1 END)
        |      AS BIGINT) AS nd
        |  FROM tc CROSS JOIN kk),
        |kept AS (SELECT task FROM tc CROSS JOIN kk
        |  WHERE cnt = k AND ds = k),
        |ranked AS (SELECT sys,
        |    2 * CAST(rank() OVER (PARTITION BY task ORDER BY v)
        |      AS BIGINT)
        |      + CAST(count(*) OVER (PARTITION BY task, v) AS BIGINT)
        |      - 1 AS m2
        |  FROM obs JOIN kept USING (task)),
        |r2 AS (SELECT sys, CAST(sum(m2) AS BIGINT) AS r2_sum
        |  FROM ranked GROUP BY 1),
        |jw AS (SELECT r2_sum,
        |    CAST(row_number() OVER (ORDER BY sys) AS BIGINT) AS j
        |  FROM r2),
        |l AS (SELECT CAST(sum(j * r2_sum) AS BIGINT) AS l2 FROM jw)
        |SELECT nn AS n_tasks, k AS k_systems, nd AS n_dropped_tasks,
        |  l2 AS l2_stat,
        |  CASE WHEN nn * k * k * (k + 1) * (k + 1) * (k - 1) > 0 THEN
        |    round((CAST(l2 AS DOUBLE)
        |      - CAST(nn * k * (k + 1) * (k + 1) // 2 AS DOUBLE))
        |      / sqrt(CAST(nn * k * k * (k + 1) * (k + 1) * (k - 1)
        |        AS DOUBLE) / 36.0), 6)
        |  END AS z_6
        |FROM l CROSS JOIN meta CROSS JOIN kk""".stripMargin,

    "q_wilcoxon" ->
      // Stats.wilcoxonSignedRank mirror: per-user purchase−view cents
      // diffs (both-type users), zeros dropped, |d|-cardinality
      // midrank carriers, exact 2W⁺, tie-corrected z in the identical
      // 2×-carrier IEEE tree, 6dp
      """WITH per AS (SELECT
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END) AS p,
        |    sum(CASE WHEN event_type = 'view'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END) AS v
        |  FROM events GROUP BY user_id),
        |d AS (SELECT CAST(p - v AS BIGINT) AS d FROM per
        |  WHERE p IS NOT NULL AND v IS NOT NULL AND p - v <> 0),
        |g AS (SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp
        |  FROM d GROUP BY 1),
        |ranked AS (SELECT t, tp,
        |    2 * sum(t) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - t + 1 AS r2,
        |    t * t * t - t AS tc
        |  FROM g),
        |a AS (SELECT coalesce(CAST(sum(t) AS BIGINT), 0) AS n,
        |    coalesce(CAST(sum(tp * r2) AS BIGINT), 0) AS w2p,
        |    coalesce(CAST(sum(tc) AS BIGINT), 0) AS tie
        |  FROM ranked)
        |SELECT n AS n_nonzero, w2p AS w_plus2, tie AS tie_sum,
        |  CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
        |      - CAST(tie AS DOUBLE) / 12.0 > 0 THEN
        |    round((CAST(w2p AS DOUBLE) - CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) + 1.0) / 2.0)
        |      / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
        |        - CAST(tie AS DOUBLE) / 12.0), 6)
        |  END AS z_6
        |FROM a""".stripMargin,

    "q_croston" ->
      // TimeSeries.crostonPerKey mirror: periods = the user's event
      // sequence, demand rows only enter the recursion; the SAME IEEE
      // op sequence per step with (1−α) computed as 1 − CAST(0.3 AS
      // DOUBLE) at runtime (the q_holt_trend literal-folding rule);
      // zero-demand users naturally absent
      """WITH RECURSIVE seq AS (SELECT user_id AS k,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn,
        |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END AS v
        |  FROM events),
        |np AS (SELECT k, CAST(max(rn) AS BIGINT) AS n_periods FROM seq
        |  GROUP BY k),
        |dem AS (SELECT k, rn, v,
        |    row_number() OVER (PARTITION BY k ORDER BY rn) AS dn,
        |    rn - coalesce(lag(rn) OVER (PARTITION BY k ORDER BY rn), 0)
        |      AS q
        |  FROM seq WHERE v <> 0),
        |c AS (
        |  SELECT k, dn, v AS z, CAST(q AS DOUBLE) AS p FROM dem
        |  WHERE dn = 1
        |  UNION ALL
        |  SELECT d.k, d.dn,
        |    d.v * CAST(0.3 AS DOUBLE)
        |      + s.z * (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) AS z,
        |    CAST(d.q AS DOUBLE) * CAST(0.3 AS DOUBLE)
        |      + s.p * (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) AS p
        |  FROM c s JOIN dem d ON d.k = s.k AND d.dn = s.dn + 1),
        |fin AS (SELECT k, CAST(max(dn) AS BIGINT) AS nd FROM c
        |  GROUP BY k)
        |SELECT c.k AS user_id, np.n_periods, fin.nd AS n_demands,
        |  round(c.z, 6) AS z_level, round(c.p, 6) AS p_interval,
        |  round(c.z / c.p, 6) AS forecast
        |FROM c JOIN fin ON c.k = fin.k AND c.dn = fin.nd
        |JOIN np ON np.k = c.k""".stripMargin,

    "q_mase" ->
      // TimeSeries.maseBaseline mirror: daily integer-cents series per
      // event type, naive-1 and seasonal-naive-7 absolute lag errors,
      // floor-div micro-unit MAEs and their ratio — integers end to
      // end; keys with no seasonal lag (or a flat seasonal pattern)
      // emit null mase
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |lagd AS (SELECT event_type,
        |    abs(cents - lag(cents, 1) OVER w) AS e1,
        |    abs(cents - lag(cents, 7) OVER w) AS es
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(count(e1) AS BIGINT) AS n1,
        |    CAST(sum(e1) AS BIGINT) AS s1,
        |    CAST(count(es) AS BIGINT) AS ns,
        |    CAST(sum(es) AS BIGINT) AS ss
        |  FROM lagd GROUP BY 1)
        |SELECT event_type, n_points,
        |  CASE WHEN n1 = 0 THEN NULL
        |    ELSE s1 * 1000000 // n1 END AS mae1_micro,
        |  CASE WHEN ns = 0 THEN NULL
        |    ELSE ss * 1000000 // ns END AS mae_season_micro,
        |  CASE WHEN ns = 0 OR ss = 0 OR n1 = 0 THEN NULL
        |    ELSE (s1 * 1000000 // n1) * 1000000
        |      // (ss * 1000000 // ns) END AS mase_micro
        |FROM a""".stripMargin,

    "q_dedup_cluster" -> {
      // same corpus/shingle/pair fragments as q_dedup_ngram, then the
      // transitive closure: min reachable id over symmetrized pairs ≡
      // the Spark hash-to-min fixpoint label
      s"""WITH RECURSIVE $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id)
         |SELECT id AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY id""".stripMargin
    },

    "q_leakage_split" -> {
      // the q_dedup_cluster closure, then singleton fallback (docs in
      // no pair cluster as themselves) and E22's md5 split arithmetic
      // applied to the CLUSTER label — same-cluster ⇒ same-split
      s"""WITH RECURSIVE $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |alld AS (SELECT c.doc_id,
         |    coalesce(cl.cluster_id, c.doc_id) AS cluster_id
         |  FROM corpus c LEFT JOIN cl ON cl.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
         |         IN ('c','d') THEN 'val'
         |       WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
         |         IN ('e','f') THEN 'test'
         |       ELSE 'train' END AS split
         |FROM alld""".stripMargin
    },

    // Deterministic LPA: same near-dup pair fragments, then 3
    // synchronized rounds unrolled — per round: neighbor labels,
    // (node, label) counts, argmax with (count DESC, label ASC)
    // tie-break (≡ Spark's max of the (count, −label) struct).
    "q_communities" -> {
      val rounds = (1 to 3).map { k =>
        s"""nb$k AS (SELECT e.src AS v, l.lab FROM edges e
           |  JOIN lab${k - 1} l ON l.v = e.dst),
           |cnt$k AS (SELECT v, lab, count(*) AS c FROM nb$k GROUP BY v, lab),
           |lab$k AS (SELECT v, lab FROM (
           |    SELECT v, lab, row_number() OVER (PARTITION BY v
           |      ORDER BY c DESC, lab ASC) AS rn
           |    FROM cnt$k) t WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |lab0 AS (SELECT DISTINCT src AS v, src AS lab FROM edges),
         |$rounds
         |SELECT v AS id, lab AS community FROM lab3""".stripMargin
    },

    "q_vwap" ->
      // notional = cents·qty summed exactly; vwap is ONE double
      // division (numerator/denominator both exact integers)
      """WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS q
        |  FROM events)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(sum(q) AS BIGINT) AS total_qty,
        |  CAST(sum(c * q) AS BIGINT) AS notional_cents,
        |  CASE WHEN sum(q) > 0 THEN CAST(sum(c * q) AS DOUBLE) /
        |    (CAST(100 AS DOUBLE) * CAST(sum(q) AS DOUBLE)) END AS vwap
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q_ref_integrity" ->
      // orphans via NOT EXISTS (null-safe, ≡ left_anti)
      """SELECT 'lineitem->orders' AS relationship,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_orphans
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |UNION ALL
        |SELECT 'events->customer',
        |  (SELECT count(*) FROM events),
        |  (SELECT count(*) FROM events e WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))""".stripMargin,

    // Basket lift: exact-integer supports; confidence and lift are
    // each ONE double division of exactly-representable integers
    // (raw doubles — same parity rule as q_skew_metrics).
    "q_basket_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
        |supp AS (SELECT it, count(*) AS supp FROM b GROUP BY it
        |  HAVING count(*) >= 20),
        |freq AS (SELECT b.bk, b.it, s.supp FROM b JOIN supp s USING (it)),
        |pairs AS (SELECT a.it AS item_a, bb.it AS item_b,
        |    count(*) AS supp_ab, min(a.supp) AS supp_a,
        |    min(bb.supp) AS supp_b
        |  FROM freq a JOIN freq bb ON a.bk = bb.bk AND a.it < bb.it
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT item_a, item_b, supp_a, supp_b, supp_ab,
        |  CAST(supp_ab AS DOUBLE) / CAST(supp_a AS DOUBLE) AS confidence,
        |  CAST(n_baskets * supp_ab AS DOUBLE) /
        |    CAST(supp_a * supp_b AS DOUBLE) AS lift
        |FROM pairs, n""".stripMargin,

    "q_latency_bands" ->
      // exact discrete quantiles per (event_type, hour-of-day):
      // cum·10000 ≥ p·n over distinct cents (Stats.discreteQuantiles)
      """WITH e AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |d AS (SELECT event_type, hod, c, count(*) AS cnt
        |  FROM e GROUP BY 1, 2, 3),
        |w AS (SELECT event_type, hod, c,
        |    sum(cnt) OVER (PARTITION BY event_type, hod ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type, hod) AS n
        |  FROM d)
        |SELECT event_type, hod,
        |  min(CASE WHEN cum * 10000 >= n * 5000 THEN c END) AS p50_c,
        |  min(CASE WHEN cum * 10000 >= n * 9000 THEN c END) AS p90_c,
        |  min(CASE WHEN cum * 10000 >= n * 9900 THEN c END) AS p99_c
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_triangle_stats" -> {
      // near-dup pairs (same fragments as q_dedup_ngram), then the
      // canonical-orientation triangle join (a<b<c counted once) and
      // integral wedge sum; clustering = one double division
      s"""WITH $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a AS a, id_b AS b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |deg AS (SELECT p, count(*) AS d FROM (
         |    SELECT a AS p FROM pairs UNION ALL SELECT b FROM pairs) u
         |  GROUP BY 1),
         |ns AS (SELECT count(*) AS n_nodes,
         |    CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges FROM deg),
         |es AS (SELECT count(*) AS n_edges FROM pairs),
         |tri AS (SELECT count(*) AS n_triangles
         |  FROM pairs e1
         |  JOIN pairs e2 ON e2.a = e1.b
         |  WHERE EXISTS (SELECT 1 FROM pairs e3
         |                WHERE e3.a = e1.a AND e3.b = e2.b))
         |SELECT n_nodes, n_edges, n_triangles,
         |  CASE WHEN wedges > 0 THEN
         |    CAST(n_triangles * 3 AS DOUBLE) / CAST(wedges AS DOUBLE) END
         |    AS clustering
         |FROM ns, es, tri""".stripMargin
    },

    "q_edit_join" ->
      """WITH d AS (SELECT doc_id AS key, lang,
        |    substring(text, 1, 40) AS name FROM documents),
        |v AS (SELECT key + 1000000 AS key, lang,
        |    'x' || substring(name, 2, 39) AS name FROM d WHERE key % 5 = 0),
        |a AS (SELECT * FROM d UNION ALL SELECT * FROM v)
        |SELECT x.lang, x.key AS key_a, y.key AS key_b,
        |  CAST(levenshtein(x.name, y.name) AS BIGINT) AS dist
        |FROM a x JOIN a y ON x.lang = y.lang AND x.key < y.key
        |WHERE levenshtein(x.name, y.name) <= 2""".stripMargin,

    "q_golden_record" -> {
      // near-dup clusters (q_dedup_cluster's recursive closure) +
      // survivorship: keeper = max length, ties to min id
      s"""WITH RECURSIVE $corpusCte,
         |$shCte,
         |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ic
         |  FROM sh a
         |  JOIN sizes sa ON sa.id = a.id
         |  JOIN sh b ON a.sh = b.sh AND a.id < b.id
         |  JOIN sizes sb ON sb.id = b.id
         |  WHERE CAST(sa.sz AS DOUBLE) <= sb.sz / CAST(0.6 AS DOUBLE)
         |    AND CAST(sb.sz AS DOUBLE) <= sa.sz / CAST(0.6 AS DOUBLE)
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 4) AS jaccard
         |    FROM inter
         |    JOIN sizes sa ON sa.id = id_a
         |    JOIN sizes sb ON sb.id = id_b) j
         |  WHERE jaccard >= 0.6),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |labeled AS (
         |  SELECT c.doc_id, coalesce(k.comp, c.doc_id) AS cluster_id,
         |    CAST(length(c.text) AS BIGINT) AS len
         |  FROM corpus c LEFT JOIN comp k ON k.id = c.doc_id),
         |g AS (SELECT cluster_id, count(*) AS n_members, max(len) AS max_len,
         |    CAST(sum(len) AS BIGINT) AS total_len
         |  FROM labeled GROUP BY 1),
         |k AS (SELECT l.cluster_id, min(l.doc_id) AS keeper_id
         |  FROM labeled l JOIN g USING(cluster_id)
         |  WHERE l.len = g.max_len GROUP BY 1)
         |SELECT cluster_id, n_members, keeper_id, max_len, total_len
         |FROM g JOIN k USING(cluster_id) WHERE n_members > 1""".stripMargin
    },

    "q_ohlc_resample" ->
      // µs timestamps are unique (asserted in data), so arg_min/arg_max
      // on us are deterministic; cents keep the volume sum exact
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events)
        |SELECT event_type, us - us % 3600000000 AS bucket_us,
        |  arg_min(c, us) AS open, max(c) AS high, min(c) AS low,
        |  arg_max(c, us) AS close, count(*) AS n,
        |  CAST(sum(c) AS BIGINT) AS volume
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q_decontaminate" -> {
      val gram8 = (0 until 8).map(k => s"w[u.i+$k]").mkString("||' '||")
      s"""WITH $corpusCte,
         |bench AS (SELECT doc_id, text FROM corpus
         |          WHERE doc_id % 10 = 0 AND doc_id < 1000000),
         |corp AS (SELECT doc_id, text FROM corpus
         |         WHERE NOT (doc_id % 10 = 0 AND doc_id < 1000000)),
         |cs AS (SELECT DISTINCT id, $gram8 AS sh
         |  FROM (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
         |        FROM corp) t,
         |       unnest(generate_series(1, len(w) - 7)) AS u(i)),
         |bs AS (SELECT DISTINCT $gram8 AS sh
         |  FROM (SELECT string_split(${normOf("text")}, ' ') AS w
         |        FROM bench) t,
         |       unnest(generate_series(1, len(w) - 7)) AS u(i))
         |SELECT cs.id AS doc_id, count(*) AS n_shared
         |FROM cs JOIN bs ON cs.sh = bs.sh
         |GROUP BY cs.id""".stripMargin
    },

    "q_stratified_sample" ->
      """WITH h AS (
        |  SELECT c_mktsegment, md5(CAST(c_custkey AS VARCHAR)) AS hx
        |  FROM customer),
        |tot AS (SELECT c_mktsegment, count(*) AS n_total
        |        FROM customer GROUP BY 1),
        |kept AS (
        |  SELECT c_mktsegment, count(*) AS n_sampled FROM h
        |  WHERE (c_mktsegment = 'BUILDING'   AND substr(hx,1,4) < '8000')
        |     OR (c_mktsegment = 'AUTOMOBILE' AND substr(hx,1,4) < '4000')
        |     OR (c_mktsegment = 'MACHINERY'  AND substr(hx,1,4) < '2000')
        |     OR (c_mktsegment = 'HOUSEHOLD'  AND substr(hx,1,4) < '1000')
        |     OR  c_mktsegment = 'FURNITURE'
        |  GROUP BY 1)
        |SELECT t.c_mktsegment AS segment, t.n_total, k.n_sampled
        |FROM tot t JOIN kept k ON t.c_mktsegment = k.c_mktsegment""".stripMargin,

    "q_weighted_mix" ->
      """WITH counts AS (
        |  SELECT o_orderpriority, count(*) AS n_avail,
        |    CAST(CASE o_orderpriority
        |      WHEN '1-URGENT' THEN 0.4 WHEN '2-HIGH' THEN 0.3
        |      WHEN '3-MEDIUM' THEN 0.15 WHEN '4-NOT SPECIFIED' THEN 0.1
        |      WHEN '5-LOW' THEN 0.05 END AS DOUBLE) AS weight
        |  FROM orders GROUP BY 1),
        |m AS (SELECT min(floor(CAST(n_avail AS DOUBLE) / weight)) AS m_total
        |      FROM counts)
        |SELECT o_orderpriority AS priority, n_avail, weight,
        |  CAST(floor(weight * m_total) AS BIGINT) AS n_take
        |FROM counts, m""".stripMargin,

    "q_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS aw FROM events),
        |coh AS (SELECT user_id, min(aw) AS cw FROM ev GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST((e.aw - c.cw) / 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN coh c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS n_users, count(v) AS n_view,
        |  count(CASE WHEN c > v THEN 1 END) AS n_click_after_view,
        |  count(CASE WHEN p > c AND c > v THEN 1 END)
        |    AS n_purchase_after_click
        |FROM u""".stripMargin,

    "q_quantile_bucket" -> {
      val cases = (1 to 9).map(i =>
        s"(CASE WHEN o_totalprice > bs[$i] THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b AS (SELECT quantile_cont(o_totalprice,
         |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM orders)
         |SELECT CAST($cases + 1 AS BIGINT) AS bucket,
         |  count(*) AS n,
         |  round(min(o_totalprice), 2) AS lo,
         |  round(max(o_totalprice), 2) AS hi
         |FROM orders, b GROUP BY 1""".stripMargin
    },

    "q_corr_stats" -> {
      val cents = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
      val qty = "CAST(l_quantity AS BIGINT)"
      s"""WITH m AS (
         |  SELECT l_returnflag, count(*) AS n,
         |    sum($qty) AS sx, sum($cents) AS sy,
         |    sum($qty * $qty) AS sxx, sum($cents * $cents) AS syy,
         |    sum($qty * $cents) AS sxy
         |  FROM lineitem GROUP BY 1),
         |d AS (
         |  SELECT l_returnflag, n,
         |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
         |    CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
         |  FROM m)
         |SELECT l_returnflag, n,
         |  round(sxd / nd, 6) AS mean_qty,
         |  round((nd * sxyd - sxd * syd) /
         |    sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
         |    AS corr_qty_price,
         |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6)
         |    AS slope_cents_per_unit
         |FROM d""".stripMargin
    },

    "q_scd2" ->
      """WITH hist AS (
        |  SELECT o_orderkey, o_totalprice AS price, 0 AS version
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 100000, 1
        |  FROM orders WHERE o_orderkey % 4 = 0)
        |SELECT o_orderkey, round(price, 2) AS price,
        |  version AS valid_from,
        |  lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
        |    AS valid_to,
        |  lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
        |    IS NULL AS is_current
        |FROM hist""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_ewma" ->
      // same total-ordered left fold as the Spark mapPartitions scan:
      // init = first value, then v*0.3 + acc*0.7 — identical IEEE ops
      """SELECT user_id, count(*) AS n_events,
        |  round(list_reduce(
        |    list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id),
        |    (acc, v) -> v * CAST(0.3 AS DOUBLE) + acc * CAST(0.7 AS DOUBLE)),
        |    6) AS ewma
        |FROM events GROUP BY user_id""".stripMargin,

    "q_holt_trend" ->
      // same total-ordered fold as the Spark mapPartitions scan, one
      // recursion step per event: l' = v·α + (l+t)·(1−α),
      // t' = (l'−l)·β + t·(1−β). The (1−α) factors are computed as
      // 1 − CAST(α AS DOUBLE) — NOT a folded literal — because
      // 1.0-0.4 ≠ 0.6 in IEEE doubles and Spark computes at runtime.
      """WITH RECURSIVE seq AS (
        |  SELECT user_id AS k,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events),
        |h AS (
        |  SELECT k, rn, v AS l, CAST(0 AS DOUBLE) AS t FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT x.k, x.rn, x.l2 AS l,
        |    (x.l2 - x.l) * CAST(0.2 AS DOUBLE)
        |      + x.t * (CAST(1 AS DOUBLE) - CAST(0.2 AS DOUBLE)) AS t
        |  FROM (SELECT q.k, q.rn, s.l, s.t,
        |          q.v * CAST(0.4 AS DOUBLE)
        |            + (s.l + s.t) * (CAST(1 AS DOUBLE) - CAST(0.4 AS DOUBLE)) AS l2
        |        FROM h s JOIN seq q ON q.k = s.k AND q.rn = s.rn + 1) x),
        |fin AS (SELECT k, max(rn) AS n FROM h GROUP BY k)
        |SELECT h.k AS user_id, fin.n AS n_events, round(h.l, 6) AS level,
        |  round(h.t, 6) AS trend, round(h.l + h.t, 6) AS forecast
        |FROM h JOIN fin ON h.k = fin.k AND h.rn = fin.n""".stripMargin,

    "q_interval_merge" ->
      // same two-window island algebra as Intervals.coalesceIntervals;
      // explicit ROWS frames (the (start_us, event_id) key is unique,
      // but the 1-PRECEDING upper bound must be ROWS regardless);
      // integer µs end to end
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS start_us, event_id,
        |    epoch_us(ts) + CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      * 1000000 AS end_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, start_us, event_id, end_us,
        |    CASE WHEN max(end_us) OVER (PARTITION BY user_id
        |        ORDER BY start_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start_us > max(end_us) OVER (PARTITION BY user_id
        |        ORDER BY start_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM iv),
        |g AS (
        |  SELECT user_id, start_us, end_us,
        |    CAST(sum(new_island) OVER (PARTITION BY user_id
        |      ORDER BY start_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM f)
        |SELECT user_id, island, min(start_us) AS island_start,
        |  max(end_us) AS island_end, count(*) AS n_intervals
        |FROM g GROUP BY 1, 2""".stripMargin,

    "q_seasonal_anomaly" ->
      // q_latency_bands' exact-quantile arithmetic as the per-(type,
      // hour) baseline, then a pure integer anomaly test c > 3·median
      """WITH e AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |d AS (SELECT event_type, hod, c, count(*) AS cnt
        |  FROM e GROUP BY 1, 2, 3),
        |w AS (SELECT event_type, hod, c,
        |    sum(cnt) OVER (PARTITION BY event_type, hod ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type, hod) AS n
        |  FROM d),
        |med AS (SELECT event_type, hod,
        |    min(CASE WHEN cum * 10000 >= n * 5000 THEN c END) AS med_c
        |  FROM w GROUP BY 1, 2)
        |SELECT e.event_type, e.hod, count(*) AS n,
        |  CAST(min(m.med_c) AS BIGINT) AS med_c,
        |  CAST(sum(CASE WHEN e.c > m.med_c * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM e JOIN med m ON m.event_type = e.event_type AND m.hod = e.hod
        |GROUP BY 1, 2""".stripMargin,

    "q_session_native" ->
      // gaps-and-islands form of session_window: a session merges the
      // next event only if it lands STRICTLY before start+gap, so the
      // boundary is gap ≥ 30 min; end = last event + 30 min
      // (exclusive), matching the Catalyst operator's contract
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |f AS (
        |  SELECT user_id, us, cents,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |           >= 1800000000 OR
        |         lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (
        |  SELECT user_id, us, cents,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(us) AS start_us,
        |  max(us) + 1800000000 AS end_us,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "q_topk_agg" ->
      // the window-ranking form of the bounded-heap aggregate, same
      // (cents desc, event_id asc) tie-break
      """SELECT event_type, event_id, rnk, cents FROM (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY floor(value * 100 + 0.5) DESC, event_id) AS rnk
        |  FROM events) t
        |WHERE rnk <= 3""".stripMargin,

    "q_cusum" ->
      // same de-recursed CUSUM algebra as TimeSeries.cusumPerKey:
      // s_t = C_t − min(0, prefix-min C) over (us, event_id) order —
      // exact integer cents end to end. The (us, event_id) ordering
      // key is unique, so DuckDB's default RANGE frame ≡ Spark's
      // explicit ROWS frame.
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |cum AS (
        |  SELECT user_id, us, event_id,
        |    sum(c - 5500) OVER (PARTITION BY user_id ORDER BY us, event_id) AS cu,
        |    sum(4500 - c) OVER (PARTITION BY user_id ORDER BY us, event_id) AS cd
        |  FROM e),
        |s AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rd,
        |    cu - least(0, min(cu) OVER (PARTITION BY user_id ORDER BY us, event_id)) AS s_up,
        |    cd - least(0, min(cd) OVER (PARTITION BY user_id ORDER BY us, event_id)) AS s_dn
        |  FROM cum)
        |SELECT user_id, count(*) AS n,
        |  CAST(max(CASE WHEN rd = 1 THEN s_up END) AS BIGINT) AS final_up,
        |  CAST(max(s_up) AS BIGINT) AS max_up,
        |  CAST(sum(CASE WHEN s_up > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_up,
        |  CAST(max(CASE WHEN rd = 1 THEN s_dn END) AS BIGINT) AS final_dn,
        |  CAST(max(s_dn) AS BIGINT) AS max_dn,
        |  CAST(sum(CASE WHEN s_dn > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_dn
        |FROM s GROUP BY user_id""".stripMargin,

    "q_ab_test" ->
      // mirrors Analytics.abTest op-for-op: exact HUGEINT moments
      // (≡ Spark decimal(38,0)), then the identical IEEE expression
      // trees for mean/var/Wilson/Welch — incl. 3.8416 written as a
      // decimal literal cast to double on both engines
      """WITH o AS (
        |  SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '8'
        |           THEN 'A' ELSE 'B' END AS variant,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |    (o_orderstatus = 'F') AS conv
        |  FROM orders),
        |m AS (
        |  SELECT variant, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(c) AS HUGEINT) AS sx,
        |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sxx,
        |    CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS HUGEINT) AS cv
        |  FROM o GROUP BY 1),
        |st AS (
        |  SELECT variant, CAST(n AS BIGINT) AS n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS metric_mean,
        |    CAST(n * sxx - sx * sx AS DOUBLE) /
        |      CAST(n * (n - 1) AS DOUBLE) AS metric_var,
        |    CAST(cv AS DOUBLE) / CAST(n AS DOUBLE) AS conv_rate,
        |    CAST(cv AS BIGINT) AS n_conv
        |  FROM m),
        |w AS (
        |  SELECT *,
        |    (conv_rate + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |       / (2.0 * CAST(n AS DOUBLE))
        |     - sqrt(conv_rate * (1.0 - conv_rate) / CAST(n AS DOUBLE)
        |         + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |           / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1.96)
        |    / (1.0 + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |         / CAST(n AS DOUBLE)) AS wilson_lo,
        |    (conv_rate + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |       / (2.0 * CAST(n AS DOUBLE))
        |     + sqrt(conv_rate * (1.0 - conv_rate) / CAST(n AS DOUBLE)
        |         + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |           / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1.96)
        |    / (1.0 + CAST(CAST(3.8416 AS DECIMAL(5,4)) AS DOUBLE)
        |         / CAST(n AS DOUBLE)) AS wilson_hi
        |  FROM st),
        |b AS (SELECT n AS bn, metric_mean AS bmean, metric_var AS bvar,
        |        variant AS bvariant
        |      FROM w ORDER BY variant LIMIT 1)
        |SELECT w.variant, w.n, metric_mean, metric_var, conv_rate, n_conv,
        |  wilson_lo, wilson_hi,
        |  CASE WHEN w.variant = bvariant THEN NULL
        |       ELSE (metric_mean - bmean) /
        |         sqrt(metric_var / CAST(w.n AS DOUBLE)
        |            + bvar / CAST(bn AS DOUBLE)) END AS z_vs_first
        |FROM w, b""".stripMargin,

    "q_assortativity" ->
      // same moment algebra as Graph.degreeAssortativity: exact
      // HUGEINT sums (≡ Spark decimal(38,0) — both cast the exact
      // integer to the nearest double), r = A/(√B·√C) in the same
      // five-op order; degenerate variance → NULL
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT p, count(*) AS deg
        |  FROM (SELECT pa AS p FROM e0 UNION ALL SELECT pb FROM e0) t
        |  GROUP BY p),
        |pr AS (
        |  SELECT da.deg AS x, db.deg AS y
        |  FROM e0 JOIN deg da ON da.p = e0.pa JOIN deg db ON db.p = e0.pb
        |  UNION ALL
        |  SELECT db.deg AS x, da.deg AS y
        |  FROM e0 JOIN deg da ON da.p = e0.pa JOIN deg db ON db.p = e0.pb),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        |  FROM pr)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM e0) AS n_edges,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |  END AS assortativity
        |FROM m""".stripMargin,

    "q_bfs" ->
      // min hop distance from the Brand#13 seed set as a recursive
      // CTE: UNION (not ALL) dedups (id, hop) states, the hop < 3
      // guard bounds the recursion, min(hop) per id ≡ the operator's
      // first-reach labeling. Edge set = the same distinct co-purchase
      // pairs as q_assortativity's e0 (self-join form; the Spark side
      // generates them order-locally — same set either way).
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |e0 AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT pa AS src, pb AS dst FROM e0
        |        UNION ALL SELECT pb, pa FROM e0),
        |seeds AS (SELECT DISTINCT p_partkey AS id FROM part
        |          WHERE p_brand = 'Brand#13'),
        |walk(id, hop) AS (
        |  SELECT id, 0 AS hop FROM seeds
        |  UNION
        |  SELECT s.dst AS id, walk.hop + 1 AS hop
        |  FROM walk JOIN sym s ON s.src = walk.id
        |  WHERE walk.hop < 4)
        |SELECT id, CAST(min(hop) AS BIGINT) AS hop
        |FROM walk GROUP BY id""".stripMargin,

    "q_event_paths" ->
      // same gaps-and-islands sessionization as q_sessionize, then the
      // path per session via ORDERED string_agg — the (us, event_type)
      // sort key mirrors the Spark side's in-row struct sort; top-20
      // with the same strict (count desc, path asc) tie-break
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts)) AS prev
        |  FROM events),
        |y AS (
        |  SELECT user_id, us, event_type,
        |    CASE WHEN prev IS NULL OR us - prev > 1800000000
        |      THEN 1 ELSE 0 END AS nw
        |  FROM x),
        |z AS (
        |  SELECT user_id, us, event_type,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y),
        |p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY us, event_type) AS path
        |  FROM z GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin,

    "q_cross_corr" ->
      // q_acf's exact-moment discipline for the cross-series case:
      // dev = n·x − S as HUGEINT, numerators exact; the denominators'
      // PRODUCT would overflow, so each is cast-to-double (correctly
      // rounded) and sqrt'd (IEEE-correct) in the same op order
      """WITH d AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS HUGEINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS HUGEINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(x) AS HUGEINT) AS sx,
        |             CAST(sum(y) AS HUGEINT) AS sy FROM d),
        |v AS (SELECT day, n * x - sx AS dx, n * y - sy AS dy FROM d, t),
        |w AS (
        |  SELECT dx, dy,
        |    lead(dy, 0) OVER (ORDER BY day) AS y0,
        |    lead(dy, 1) OVER (ORDER BY day) AS y1,
        |    lead(dy, 2) OVER (ORDER BY day) AS y2,
        |    lead(dy, 3) OVER (ORDER BY day) AS y3
        |  FROM v),
        |m AS (
        |  SELECT count(*) AS nd, sum(dx * dx) AS dx2, sum(dy * dy) AS dy2,
        |    sum(dx * y0) AS n0, sum(dx * y1) AS n1,
        |    sum(dx * y2) AS n2, sum(dx * y3) AS n3
        |  FROM w)
        |SELECT CAST(lag AS BIGINT) AS lag,
        |  CAST(n_pairs AS BIGINT) AS n_pairs, ccf
        |FROM (
        |  SELECT 0 AS lag, nd - 0 AS n_pairs,
        |    CASE WHEN dx2 <> 0 AND dy2 <> 0 THEN CAST(n0 AS DOUBLE)
        |      / (sqrt(CAST(dx2 AS DOUBLE)) * sqrt(CAST(dy2 AS DOUBLE))) END
        |      AS ccf FROM m
        |  UNION ALL SELECT 1, nd - 1,
        |    CASE WHEN dx2 <> 0 AND dy2 <> 0 THEN CAST(n1 AS DOUBLE)
        |      / (sqrt(CAST(dx2 AS DOUBLE)) * sqrt(CAST(dy2 AS DOUBLE))) END
        |    FROM m
        |  UNION ALL SELECT 2, nd - 2,
        |    CASE WHEN dx2 <> 0 AND dy2 <> 0 THEN CAST(n2 AS DOUBLE)
        |      / (sqrt(CAST(dx2 AS DOUBLE)) * sqrt(CAST(dy2 AS DOUBLE))) END
        |    FROM m
        |  UNION ALL SELECT 3, nd - 3,
        |    CASE WHEN dx2 <> 0 AND dy2 <> 0 THEN CAST(n3 AS DOUBLE)
        |      / (sqrt(CAST(dx2 AS DOUBLE)) * sqrt(CAST(dy2 AS DOUBLE))) END
        |    FROM m) u""".stripMargin,

    "q_acf" ->
      // exact-moment ACF: dev_t = n·x_t − S as HUGEINT (≡ Spark
      // decimal(38,0)); numerators/denominator are exact integer sums,
      // each acf ONE cast-to-double division in the same op order
      """WITH d AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS HUGEINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(x) AS HUGEINT) AS s FROM d),
        |v AS (SELECT day, n * x - s AS dev FROM d, t),
        |w AS (
        |  SELECT dev,
        |    lead(dev, 1) OVER (ORDER BY day) AS d1,
        |    lead(dev, 2) OVER (ORDER BY day) AS d2,
        |    lead(dev, 3) OVER (ORDER BY day) AS d3,
        |    lead(dev, 7) OVER (ORDER BY day) AS d7
        |  FROM v),
        |m AS (
        |  SELECT count(*) AS nd, sum(dev * dev) AS den,
        |    sum(dev * d1) AS n1, sum(dev * d2) AS n2,
        |    sum(dev * d3) AS n3, sum(dev * d7) AS n7
        |  FROM w)
        |SELECT CAST(lag AS BIGINT) AS lag,
        |  CAST(n_pairs AS BIGINT) AS n_pairs, acf
        |FROM (
        |  SELECT 1 AS lag, nd - 1 AS n_pairs,
        |    CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM m
        |  UNION ALL SELECT 2, nd - 2,
        |    CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) FROM m
        |  UNION ALL SELECT 3, nd - 3,
        |    CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) FROM m
        |  UNION ALL SELECT 7, nd - 7,
        |    CAST(n7 AS DOUBLE) / CAST(den AS DOUBLE) FROM m) u""".stripMargin,

    "q_weighted_quantiles" ->
      // same integer rank arithmetic as the unweighted discrete
      // quantiles: q_p = min value with cum·10⁴ ≥ p·W over exact cents
      // weights
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
        |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |x AS (
        |  SELECT l_returnflag, v,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS n
        |  FROM c)
        |SELECT l_returnflag,
        |  min(CASE WHEN cum * 10000 >= n * 5000 THEN v END) AS q5000,
        |  min(CASE WHEN cum * 10000 >= n * 9000 THEN v END) AS q9000,
        |  min(CASE WHEN cum * 10000 >= n * 9900 THEN v END) AS q9900
        |FROM x GROUP BY 1""".stripMargin,

    "q_collocations" ->
      // PMI argument assembled as one exact-integer rational
      // (HUGEINT ≡ decimal(38,0)), then ONE division + ONE ln,
      // rounded 6dp; top-30 under the strict (count desc, a, b) order
      s"""WITH w AS (
         |  SELECT string_split(${normOf("text")}, ' ') AS ws
         |  FROM documents),
         |big AS (
         |  SELECT ws[u.i] AS a, ws[u.i + 1] AS b
         |  FROM w, unnest(generate_series(1, len(ws) - 1)) AS u(i)),
         |c2 AS (SELECT a, b, count(*) AS c_ab FROM big GROUP BY 1, 2),
         |uni AS (
         |  SELECT x, count(*) AS c1
         |  FROM (SELECT unnest(ws) AS x FROM w) GROUP BY 1),
         |t AS (SELECT CAST((SELECT sum(c1) FROM uni) AS HUGEINT) AS t1,
         |             CAST((SELECT sum(c_ab) FROM c2) AS HUGEINT) AS t2)
         |SELECT a, b, c_ab,
         |  round(ln(CAST(CAST(c_ab AS HUGEINT) * t1 * t1 AS DOUBLE) /
         |           CAST(t2 * CAST(ca.c1 AS HUGEINT) *
         |                CAST(cb.c1 AS HUGEINT) AS DOUBLE)), 6) AS pmi
         |FROM c2
         |JOIN uni ca ON ca.x = c2.a
         |JOIN uni cb ON cb.x = c2.b, t
         |ORDER BY c_ab DESC, a ASC, b ASC LIMIT 30""".stripMargin,

    "q_winnow" ->
      // the declarative winnowing spec: md5-hex per char 8-gram,
      // 5-hash window minimum (full windows only; short docs collapse
      // to one window via greatest(1, m−4)), DISTINCT minima; the
      // md5-of-ordered-concat digest certifies the exact fingerprint
      // set the native expression emits
      s"""WITH n AS (SELECT doc_id, ${normOf("text")} AS s FROM documents),
         |g AS (
         |  SELECT doc_id, u.i AS i, md5(substr(s, u.i, 8)) AS h
         |  FROM n, unnest(generate_series(1, len(s) - 7)) AS u(i)),
         |c AS (SELECT doc_id, count(*) AS m FROM g GROUP BY 1),
         |mins AS (
         |  SELECT g.doc_id, i, m,
         |    min(h) OVER (PARTITION BY g.doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mh
         |  FROM g JOIN c ON c.doc_id = g.doc_id),
         |fp AS (SELECT DISTINCT doc_id, mh FROM mins
         |       WHERE i <= greatest(1, m - 4))
         |SELECT doc_id, count(*) AS n_fps,
         |  md5(string_agg(mh, '' ORDER BY mh)) AS fps_md5
         |FROM fp GROUP BY doc_id""".stripMargin,

    "q_winnow_pairs" ->
      // q_winnow's fingerprint CTE over the dup-seeded corpus, then
      // candidate pairs by fingerprint equi-join with exact-integer
      // acceptance 2·|∩| ≥ min(|F_a|,|F_b|); containment is one
      // cast-to-double division of exact ints. Sizes/pairs run over
      // DISCRIMINATIVE fingerprints only (doc frequency ≤ 20 —
      // winnowPairs' maxDf common-code elimination)
      s"""WITH $corpusCte,
         |n AS (SELECT doc_id AS id, ${normOf("text")} AS s FROM corpus),
         |g AS (
         |  SELECT id, u.i AS i, md5(substr(s, u.i, 8)) AS h
         |  FROM n, unnest(generate_series(1, len(s) - 7)) AS u(i)),
         |c AS (SELECT id, count(*) AS m FROM g GROUP BY 1),
         |mins AS (
         |  SELECT g.id, i, m,
         |    min(h) OVER (PARTITION BY g.id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mh
         |  FROM g JOIN c ON c.id = g.id),
         |fp0 AS (SELECT DISTINCT id, mh FROM mins
         |        WHERE i <= greatest(1, m - 4)),
         |dfc AS (SELECT mh, count(*) AS df FROM fp0 GROUP BY 1),
         |fp AS (SELECT id, fp0.mh FROM fp0
         |       JOIN dfc ON dfc.mh = fp0.mh WHERE df <= 20),
         |sz AS (SELECT id, count(*) AS sz FROM fp GROUP BY 1),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
         |  FROM fp a JOIN fp b ON a.mh = b.mh AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared, sa.sz AS sz_a, sb.sz AS sz_b,
         |  CAST(n_shared AS DOUBLE) /
         |    CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
         |FROM inter
         |JOIN sz sa ON sa.id = id_a
         |JOIN sz sb ON sb.id = id_b
         |WHERE n_shared * 2 >= least(sa.sz, sb.sz)""".stripMargin,

    "q_domain_cap" ->
      // same synthesized URL, same anchored-regex domain, same
      // md5-of-id rank order — keep = rank ≤ 15
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' ||
        |      CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM u)
        |SELECT doc_id, domain,
        |  CAST(row_number() OVER (PARTITION BY domain ORDER BY h, doc_id)
        |    AS BIGINT) AS rnk,
        |  (row_number() OVER (PARTITION BY domain ORDER BY h, doc_id)) <= 15
        |    AS keep
        |FROM d""".stripMargin,

    "q_blocklist" ->
      // token stream joined to the VALUES blocklist; distinct matched
      // terms sorted then joined (≡ Spark array_sort(collect_set)),
      // clean docs surface via the LEFT join with 0 hits
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(string_split(${normOf("text")}, ' ')) AS term
         |  FROM documents),
         |bl(term) AS (VALUES ('dup'), ('slow'), ('big')),
         |h AS (
         |  SELECT doc_id, count(*) AS n_hits,
         |    array_to_string(list_sort(list(DISTINCT term)), ',')
         |      AS blocked_terms
         |  FROM tok JOIN bl USING (term)
         |  GROUP BY doc_id)
         |SELECT d.doc_id AS id,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  coalesce(h.blocked_terms, '') AS blocked_terms,
         |  coalesce(h.n_hits, 0) = 0 AS keep
         |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin,

    "q_l_diversity" ->
      // exact cents → double → floor: identical banding on both
      // engines incl. negative balances (floor ≠ int div there)
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
        |  count(DISTINCT CAST(floor(floor(c_acctbal * 100 + 0.5) / 200000.0)
        |    AS BIGINT)) AS l_distinct,
        |  count(DISTINCT CAST(floor(floor(c_acctbal * 100 + 0.5) / 200000.0)
        |    AS BIGINT)) >= 3 AS diverse
        |FROM customer
        |GROUP BY 1, 2""".stripMargin,

    "q_benford" ->
      // leading digit of exact integer cents (invariant under ×100);
      // share is one exact-int division (raw-double safe); the
      // Benford expectation is transcendental → 6dp (lm_score rule)
      """WITH c0 AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |c AS (SELECT c FROM c0 WHERE c > 0),
        |n AS (SELECT count(*) AS n_total FROM c),
        |d AS (
        |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
        |    count(*) AS n
        |  FROM c GROUP BY 1)
        |SELECT digit, d.n,
        |  CAST(d.n AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
        |  round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS expected
        |FROM d, n""".stripMargin,

    "q_bpe_pairs" ->
      // same (n desc, pair asc) total order fixes the top-30 cut and
      // the ranks on both engines; len≥2 filter mirrors the guard
      // against Spark's descending sequence(1,0)
      s"""WITH w AS (
         |  SELECT unnest(string_split(${normOf("text")}, ' ')) AS w
         |  FROM documents),
         |p AS (
         |  SELECT substr(w, u.i, 2) AS pair
         |  FROM w, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |  WHERE len(w) >= 2),
         |c AS (SELECT pair, count(*) AS n FROM p GROUP BY 1)
         |SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rnk
         |FROM (SELECT * FROM c ORDER BY n DESC, pair LIMIT 30)""".stripMargin,

    "q_holt_winters" ->
      // the holt oracle's recursion with the seasonal ring carried as
      // a LIST column: phase p = ((rn−1) mod 4)+1 (1-based slot),
      // element p replaced via slice-concat-slice. Every (1−c) factor
      // computed as 1 − CAST(c AS DOUBLE), never a folded literal.
      """WITH RECURSIVE seq AS (
        |  SELECT user_id AS k,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events),
        |h AS (
        |  SELECT k, rn, v AS l, CAST(0 AS DOUBLE) AS t,
        |    [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
        |     CAST(0 AS DOUBLE)] AS s
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT x.k, x.rn, x.l2 AS l,
        |    (x.l2 - x.l) * CAST(0.2 AS DOUBLE)
        |      + x.t * (CAST(1 AS DOUBLE) - CAST(0.2 AS DOUBLE)) AS t,
        |    x.s[1:x.p - 1]
        |      || [(x.v - x.lb) * CAST(0.3 AS DOUBLE)
        |          + x.sp * (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE))]
        |      || x.s[x.p + 1:4] AS s
        |  FROM (
        |    SELECT q.k, q.rn, q.v, s.l, s.t, s.s,
        |      CAST(((q.rn - 1) % 4) + 1 AS INT) AS p,
        |      s.s[CAST(((q.rn - 1) % 4) + 1 AS INT)] AS sp,
        |      s.l + s.t AS lb,
        |      (q.v - s.s[CAST(((q.rn - 1) % 4) + 1 AS INT)])
        |        * CAST(0.4 AS DOUBLE)
        |        + (s.l + s.t)
        |          * (CAST(1 AS DOUBLE) - CAST(0.4 AS DOUBLE)) AS l2
        |    FROM h s JOIN seq q ON q.k = s.k AND q.rn = s.rn + 1) x),
        |fin AS (SELECT k, max(rn) AS n FROM h GROUP BY k)
        |SELECT h.k AS user_id, fin.n AS n_events, round(h.l, 6) AS level,
        |  round(h.t, 6) AS trend,
        |  round(h.s[CAST((fin.n % 4) + 1 AS INT)], 6) AS season_next,
        |  round(h.l + h.t + h.s[CAST((fin.n % 4) + 1 AS INT)], 6)
        |    AS forecast
        |FROM h JOIN fin ON h.k = fin.k AND h.rn = fin.n""".stripMargin,

    "q_bloom_prune" ->
      // the bloom layer is pruning-only; semantics are a plain anti
      // join — mirrored as NOT EXISTS (null-safe, same as left_anti),
      // NOT "NOT IN" whose three-valued NULL semantics diverge
      """SELECT o_orderpriority AS priority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders o
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c
        |   WHERE c.c_acctbal < -700 AND c.c_custkey = o.o_custkey)
        |GROUP BY 1""".stripMargin,

    "q_weighted_sample" ->
      // same arithmetic as Sampling.weightedSample, digit-by-digit:
      // u = (first-8-hex-of-md5 + 1) / 2^32 (dyadic-exact), then ONE
      // correctly-rounded division by the weight — bit-identical
      // doubles on both engines. DuckDB 1.0 lacks conv(), so the hex
      // prefix is summed positionally (each term an exact power of 2).
      """WITH s AS (
        |  SELECT o_orderkey, o_totalprice,
        |    (list_sum(list_transform(range(1, 9), i ->
        |       (strpos('0123456789abcdef',
        |          substr(md5(o_orderkey::VARCHAR), CAST(i AS INT), 1)) - 1)
        |       * 2.0 ** (4 * (8 - i)))) + 1) / 4294967296.0 AS u
        |  FROM orders WHERE o_totalprice > 0)
        |SELECT o_orderkey, u / o_totalprice AS priority
        |FROM s ORDER BY priority, o_orderkey LIMIT 500""".stripMargin,

    "q_zorder" ->
      // bitwise Morton interleave of the two 8-bit bucket ranks
      """WITH m AS (
        |  SELECT CAST(list_sum(list_transform(range(0, 8), i ->
        |      (((o_orderkey % 256) >> i) & 1) * (1 << (2 * CAST(i AS INT)))
        |    + (((o_custkey  % 256) >> i) & 1) * (1 << (2 * CAST(i AS INT) + 1))
        |    )) AS BIGINT) AS z
        |  FROM orders)
        |SELECT z >> 8 AS z_bucket, count(*) AS n,
        |  min(z) AS z_min, max(z) AS z_max
        |FROM m GROUP BY 1""".stripMargin,

    "q_text_clean" ->
      // the appended literal is DECOMPOSED (e+U+0301 etc.); both
      // engines NFC-normalize to the composed form
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 40) || ' Café niño Å' AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw) AS len_raw,
        |  nfc_normalize(regexp_replace(trim(raw), '\s+', ' ', 'g')) AS clean,
        |  length(nfc_normalize(regexp_replace(trim(raw), '\s+', ' ', 'g')))
        |    AS len_clean
        |FROM d""".stripMargin,

    "q_interval_overlap" ->
      // textbook θ-join over the same session intervals (closed ends)
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
        |  FROM events),
        |y AS (
        |  SELECT user_id, us,
        |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM x),
        |z AS (
        |  SELECT user_id, us,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM y),
        |sess AS (
        |  SELECT user_id, session_idx, min(us) AS start_us, max(us) AS end_us
        |  FROM z GROUP BY 1, 2)
        |SELECT a.user_id AS user_id, count(*) AS n_overlaps
        |FROM sess a JOIN sess b
        |  ON a.start_us <= b.end_us AND b.start_us <= a.end_us
        |  AND a.user_id < b.user_id
        |GROUP BY 1""".stripMargin,

    "q_char_entropy" ->
      // ln over exact integer counts; round(6) absorbs libm's last ulp
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
        |  FROM documents),
        |f AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY 1, 2),
        |e AS (
        |  SELECT doc_id, sum(cnt) AS n, sum(cnt * ln(cnt)) AS clnc
        |  FROM f GROUP BY 1)
        |SELECT doc_id, round(ln(n) - clnc / n, 6) AS entropy,
        |  CAST(n AS BIGINT) AS n_chars
        |FROM e""".stripMargin,

    "q_fuzzy_match" ->
      """SELECT a.p_brand AS brand, a.p_partkey AS key_a,
        |  b.p_partkey AS key_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    "q_hop_agg" ->
      // 1h/15min hop: each event belongs to the 4 epoch-aligned
      // windows starting at floor15(ts) - j*15min — integer arithmetic
      """WITH h AS (
        |  SELECT epoch_us(ts) // 900000000 * 900000000
        |           - j * CAST(900000000 AS BIGINT) AS start_us,
        |    event_type, value
        |  FROM events, unnest([0, 1, 2, 3]) AS t(j))
        |SELECT start_us, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total
        |FROM h GROUP BY 1, 2""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 103 = 0),
        |d AS (
        |  SELECT
        |    CASE WHEN o.o_orderkey IS NULL THEN 'I'
        |         WHEN n.o_orderkey IS NULL THEN 'D'
        |         WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
        |           THEN 'U'
        |         ELSE 'N' END AS change,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
        |         ELSE n.o_totalprice END AS price
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT change, count(*) AS n, round(sum(price), 2) AS sum_price
        |FROM d WHERE change <> 'N' GROUP BY 1""".stripMargin,

    "q_incr_agg" ->
      // the merged partial states must equal the direct aggregate
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice) / count(*), 4) AS avg_price
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_chunk_docs" ->
      // chunk starts 0, 80, 160, … (size 100, overlap 20) — chunk_id
      // recovered as start/step since starts are exact multiples
      """SELECT doc_id, CAST(s / 80 AS BIGINT) AS chunk_id,
        |  substr(text, CAST(s AS INT) + 1, 100) AS chunk,
        |  CAST(length(substr(text, CAST(s AS INT) + 1, 100)) AS BIGINT)
        |    AS chunk_len
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, greatest(length(text) - 1, 0), 80))
        |          AS s
        |      FROM documents) t""".stripMargin,

    "q_line_dedup" -> {
      val norm = normOf("text")
      s"""WITH $corpusCte,
         |w AS (SELECT doc_id, string_split($norm, ' ') AS w FROM corpus),
         |ln AS (SELECT doc_id, i AS pos,
         |    array_to_string(list_slice(w, i*8 + 1, i*8 + 8), ' ') AS line
         |  FROM w, unnest(generate_series(0,
         |    CAST(ceil(len(w) / 8.0) AS INT) - 1)) u(i)),
         |r AS (SELECT doc_id, pos, line,
         |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
         |      AS rn
         |  FROM ln)
         |SELECT doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
         |    chr(10) ORDER BY pos), '')) AS kept_fp
         |FROM r GROUP BY doc_id""".stripMargin
    },

    // Bigram LM scoring: P(b|a) = (c2+1)/(c1+V) — exact-int counts,
    // one division + ln per bigram, then the SAME position-ordered
    // left fold as the Spark sorted-array aggregate (0.0+x ≡ x).
    "q_lm_score" -> {
      val norm = normOf("text")
      s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws
         |  FROM documents),
         |big AS (SELECT doc_id, u.i AS pos, ws[u.i] AS a, ws[u.i+1] AS b
         |  FROM w, unnest(generate_series(1, len(ws) - 1)) u(i)),
         |c2 AS (SELECT a, b, count(*) AS c2 FROM big GROUP BY 1, 2),
         |c1 AS (SELECT a, count(*) AS c1 FROM big GROUP BY 1),
         |v AS (SELECT count(DISTINCT x) AS v FROM
         |  (SELECT unnest(ws) AS x FROM w)),
         |sc AS (SELECT big.doc_id, big.pos,
         |    ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))
         |      AS lnp
         |  FROM big JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(list_reduce(list(lnp ORDER BY pos), (p, q) -> p + q)
         |    / CAST(count(*) AS DOUBLE), 6) AS avg_lnp
         |FROM sc GROUP BY doc_id""".stripMargin
    },

    // Duplicated-span detection: span doc-frequency from the same
    // distinct (id, 5-gram) table as q_dedup_ngram; dup_frac is ONE
    // IEEE division of exact integers (raw-double parity rule —
    // rounding a rational could land on a HALF_UP≠HALF_EVEN boundary).
    "q_span_dedup" ->
      s"""WITH $corpusCte,
         |$shCte,
         |sdf AS (SELECT sh, count(*) AS span_docs FROM sh GROUP BY sh)
         |SELECT s.id AS doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN d.span_docs >= 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_spans,
         |  CAST(sum(CASE WHEN d.span_docs >= 2 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*) AS dup_frac,
         |  (CAST(sum(CASE WHEN d.span_docs >= 2 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*)) >= 0.5 AS flagged
         |FROM sh s JOIN sdf d USING (sh)
         |GROUP BY s.id""".stripMargin,

    "q_tfidf" -> {
      val norm = normOf("text")
      s"""WITH dt AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |        FROM documents) x
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, df,
         |  round(CAST(tf AS DOUBLE) *
         |    ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS tfidf
         |FROM dt JOIN dfreq USING(term) CROSS JOIN n""".stripMargin
    },

    "q_bm25" -> {
      val norm = normOf("text")
      // k1+1 embedded via Scala's round-trip double formatting so the
      // literal parses to the IDENTICAL double Spark folded at plan time
      val k1p1 = (1.2 + 1.0).toString
      s"""WITH t AS (SELECT doc_id, string_split($norm, ' ') AS w
         |  FROM documents),
         |dt AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM t),
         |g AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |  FROM dt GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM g GROUP BY 1),
         |s AS (SELECT count(*) AS n_docs,
         |  CAST(sum(len(w)) AS BIGINT) AS tot_len FROM t)
         |SELECT doc_id, term, tf, df,
         |  round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
         |      (CAST(df AS DOUBLE) + 0.5))
         |    * (CAST(tf AS DOUBLE) * $k1p1) /
         |    (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
         |      0.75 * CAST(dl AS DOUBLE) /
         |        (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))), 4)
         |    AS bm25
         |FROM g JOIN dfreq USING(term) CROSS JOIN s""".stripMargin
    },

    "q_inverted_index" -> {
      val norm = normOf("text")
      s"""WITH dt AS (SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |    FROM documents) x)
         |SELECT term, count(*) AS df,
         |  array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',')
         |    AS postings
         |FROM dt GROUP BY 1""".stripMargin
    },

    "q_profile" -> {
      def strRow(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS vmin_str,
           |  CAST(max($c) AS VARCHAR) AS vmax_str,
           |  CAST(NULL AS DOUBLE) AS vmin_num, CAST(NULL AS DOUBLE) AS vmax_num
           |FROM customer""".stripMargin
      def numRow(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS VARCHAR) AS vmin_str, CAST(NULL AS VARCHAR) AS vmax_str,
           |  CAST(min($c) AS DOUBLE) AS vmin_num,
           |  CAST(max($c) AS DOUBLE) AS vmax_num
           |FROM customer""".stripMargin
      Seq(strRow("c_name"), strRow("c_mktsegment"),
        numRow("c_acctbal"), numRow("c_nationkey"))
        .mkString("\nUNION ALL\n")
    },

    // Profile drift: both per-column profiles inlined (same decorated
    // slices as the Spark side), drift tests in exact integer
    // arithmetic (cross-multiplied rates — no float rounding).
    "q_profile_drift" -> {
      def prof(src: String, alias: String) = {
        def strRow(c: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(NULL AS DOUBLE) AS vmin_num, CAST(NULL AS DOUBLE) AS vmax_num
             |FROM $src""".stripMargin
        def numRow(c: String) =
          s"""SELECT '$c', count(*),
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  count(DISTINCT $c),
             |  CAST(min($c) AS DOUBLE), CAST(max($c) AS DOUBLE)
             |FROM $src""".stripMargin
        s"""$alias AS (${Seq(strRow("o_orderstatus"), strRow("o_orderpriority"),
             numRow("o_totalprice"), numRow("o_custkey"))
             .mkString("\nUNION ALL\n")})"""
      }
      s"""WITH refsrc AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         |cursrc AS (SELECT o_orderstatus, o_orderpriority, o_custkey,
         |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
         |         ELSE o_totalprice + 600000.0 END AS o_totalprice
         |  FROM orders WHERE o_orderkey % 2 = 1),
         |${prof("refsrc", "pref")},
         |${prof("cursrc", "pcur")}
         |SELECT r.col_name, r.n AS n_ref, c.n AS n_cur,
         |  r.n_null AS null_ref, c.n_null AS null_cur,
         |  r.n_distinct AS nd_ref, c.n_distinct AS nd_cur,
         |  abs(c.n_null * r.n - r.n_null * c.n) * 10000 > 100 * c.n * r.n
         |    AS null_drift,
         |  abs(c.n_distinct - r.n_distinct) * 10000 > 2000 * r.n_distinct
         |    AS nd_drift,
         |  coalesce(c.vmin_num < r.vmin_num OR c.vmax_num > r.vmax_num,
         |    FALSE) AS range_escape,
         |  ((abs(c.n_null * r.n - r.n_null * c.n) * 10000 > 100 * c.n * r.n)
         |   OR (abs(c.n_distinct - r.n_distinct) * 10000
         |       > 2000 * r.n_distinct)
         |   OR coalesce(c.vmin_num < r.vmin_num OR c.vmax_num > r.vmax_num,
         |        FALSE)) AS any_drift
         |FROM pref r JOIN pcur c USING (col_name)""".stripMargin
    },

    // Incremental exact dedup: in-batch keep-first per fingerprint,
    // then NOT EXISTS against the historical store (≡ left_anti).
    "q_dedup_incremental" ->
      s"""WITH $corpusCte,
         |f AS (SELECT doc_id, md5(${normOf("text")}) AS fp FROM corpus),
         |seen AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0),
         |batch AS (SELECT doc_id, fp,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM f WHERE doc_id % 3 <> 0)
         |SELECT doc_id, fp FROM batch b
         |WHERE rn = 1 AND NOT EXISTS
         |  (SELECT 1 FROM seen s WHERE s.fp = b.fp)""".stripMargin,

    "q_winsorize" ->
      // exact discrete quantiles: cum·10000 ≥ p·n over distinct cents —
      // pure integer rank arithmetic, mirrored from Stats.winsorize
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |d AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, c,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |b AS (SELECT event_type,
        |    min(CASE WHEN cum * 10000 >= n * 500 THEN c END) AS lo,
        |    min(CASE WHEN cum * 10000 >= n * 9500 THEN c END) AS hi
        |  FROM w GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(least(greatest(c, lo), hi)) AS BIGINT) AS sum_cw,
        |  min(least(greatest(c, lo), hi)) AS lo_c,
        |  max(least(greatest(c, lo), hi)) AS hi_c
        |FROM e JOIN b USING(event_type) GROUP BY 1""".stripMargin,

    "q_heavy_hitters" -> {
      val norm = normOf("text")
      s"""WITH t AS (SELECT unnest(string_split($norm, ' ')) AS term
         |  FROM documents),
         |c AS (SELECT term, count(*) AS n FROM t GROUP BY 1),
         |s AS (SELECT count(*) AS total FROM t)
         |SELECT term, n,
         |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 4) AS share
         |FROM c CROSS JOIN s WHERE n * 10000 >= total * 200""".stripMargin
    },

    "q_jaro_winkler" ->
      """SELECT a.p_brand AS brand, a.p_partkey AS key_a,
        |  b.p_partkey AS key_b,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.88""".stripMargin,

    "q_attribution" ->
      // value totals accumulate as exact integer cents; /100.0 can't
      // hit a round-2 half-boundary (x·100 is integral by construction)
      """WITH x AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
        |  FROM events)
        |SELECT coalesce(ch, 'none') AS channel, count(*) AS n_conversions,
        |  round(sum(cents) / 100.0, 2) AS attributed_value
        |FROM x WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "q_seq_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    event_type FROM events),
        |a AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last1
        |  FROM e),
        |b AS (SELECT *, CASE WHEN event_type = 'click'
        |    AND last1 >= us - 86400000000 THEN us END AS q2 FROM a),
        |c AS (SELECT *, max(q2)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastq2
        |  FROM b)
        |SELECT user_id, count(*) AS n_conversions
        |FROM c WHERE event_type = 'purchase' AND lastq2 >= us - 86400000000
        |GROUP BY 1""".stripMargin,

    "q_mad_outliers" ->
      // median and MAD as exact discrete quantiles (cum·10⁴ ≥ p·n over
      // distinct values) — mirrors Stats.madOutliers integer-for-integer
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |d AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, c,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM d),
        |m AS (SELECT event_type,
        |    min(CASE WHEN cum * 10000 >= n * 5000 THEN c END) AS med
        |  FROM w GROUP BY 1),
        |e2 AS (SELECT e.event_type, c, med, abs(c - med) AS dev
        |  FROM e JOIN m USING(event_type)),
        |d2 AS (SELECT event_type, dev, count(*) AS cnt FROM e2 GROUP BY 1, 2),
        |w2 AS (SELECT event_type, dev,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM d2),
        |m2 AS (SELECT event_type,
        |    min(CASE WHEN cum * 10000 >= n * 5000 THEN dev END) AS mad
        |  FROM w2 GROUP BY 1)
        |SELECT e2.event_type, count(*) AS n,
        |  count(CASE WHEN dev > mad * 3 THEN 1 END) AS n_outliers,
        |  min(med) AS med_c, min(mad) AS mad_c
        |FROM e2 JOIN m2 USING(event_type) GROUP BY 1""".stripMargin,

    "q_robust_scale" ->
      // rs is a RAW double: one division of exact integers is
      // bit-identical on both engines; rounding a rational could land
      // on a half-boundary where HALF_UP (Spark) ≠ HALF_EVEN (DuckDB)
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |d AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, c,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM d),
        |q AS (SELECT event_type,
        |    min(CASE WHEN cum * 10000 >= n * 2500 THEN c END) AS q25,
        |    min(CASE WHEN cum * 10000 >= n * 5000 THEN c END) AS q50,
        |    min(CASE WHEN cum * 10000 >= n * 7500 THEN c END) AS q75
        |  FROM w GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  CASE WHEN q75 <> q25 THEN
        |    CAST(c - q50 AS DOUBLE) / CAST(q75 - q25 AS DOUBLE) END AS rs
        |FROM e JOIN q USING(event_type)""".stripMargin,

    "q_rfm" -> {
      def qCte(src: String, v: String, tag: String) =
        s"""d$tag AS (SELECT $v AS v, count(*) AS cnt FROM $src GROUP BY 1),
           |w$tag AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
           |    sum(cnt) OVER () AS n FROM d$tag),
           |q$tag AS (SELECT
           |    min(CASE WHEN cum * 10000 >= n * 2000 THEN v END) AS b1,
           |    min(CASE WHEN cum * 10000 >= n * 4000 THEN v END) AS b2,
           |    min(CASE WHEN cum * 10000 >= n * 6000 THEN v END) AS b3,
           |    min(CASE WHEN cum * 10000 >= n * 8000 THEN v END) AS b4
           |  FROM w$tag)""".stripMargin
      def bucket(v: String, tag: String) =
        s"((CASE WHEN $v > q$tag.b1 THEN 1 ELSE 0 END) + " +
          s"(CASE WHEN $v > q$tag.b2 THEN 1 ELSE 0 END) + " +
          s"(CASE WHEN $v > q$tag.b3 THEN 1 ELSE 0 END) + " +
          s"(CASE WHEN $v > q$tag.b4 THEN 1 ELSE 0 END) + 1)"
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', max(o_orderdate), DATE '2026-08-12')
         |      AS BIGINT) AS rec,
         |    count(*) AS freq,
         |    CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS mon
         |  FROM orders GROUP BY 1),
         |${qCte("per", "rec", "r")},
         |${qCte("per", "freq", "f")},
         |${qCte("per", "mon", "m")}
         |SELECT CAST(6 - ${bucket("rec", "r")} AS BIGINT) AS r,
         |  CAST(${bucket("freq", "f")} AS BIGINT) AS f,
         |  CAST(${bucket("mon", "m")} AS BIGINT) AS m,
         |  count(*) AS n_customers
         |FROM per, qr, qf, qm
         |GROUP BY 1, 2, 3""".stripMargin
    },

    "q_skew_metrics" ->
      // max_over_mean is a RAW double ((max·keys)/rows of exact ints —
      // bit-identical); see q_robust_scale for why no rounding
      """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |d AS (SELECT n AS v, count(*) AS cnt FROM c GROUP BY 1),
        |w AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
        |    sum(cnt) OVER () AS nn FROM d),
        |q AS (SELECT
        |    min(CASE WHEN cum * 10000 >= nn * 5000 THEN v END) AS p50,
        |    min(CASE WHEN cum * 10000 >= nn * 9900 THEN v END) AS p99
        |  FROM w),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
        |    max(n) AS max_key_rows FROM c)
        |SELECT n_keys, n_rows, max_key_rows,
        |  CAST(max_key_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) AS max_over_mean,
        |  p50 AS p50_key_rows, p99 AS p99_key_rows
        |FROM s, q""".stripMargin,

    "q_keyword_topk" -> {
      val norm = normOf("text")
      s"""WITH dt AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |        FROM documents) x
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, term,
         |    round(CAST(tf AS DOUBLE) *
         |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS tfidf
         |  FROM dt JOIN dfreq USING(term) CROSS JOIN n)
         |SELECT doc_id, term, tfidf,
         |  CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) AS BIGINT) AS rank
         |FROM scored
         |QUALIFY rank <= 3""".stripMargin
    },

    "q_feature_hash" -> {
      val norm = normOf("text")
      // bucket = (two md5 hex digits) mod 64; 16² ≡ 0 (mod 64), so the
      // last two digits of the 8-hex prefix carry the full residue —
      // engine-portable without conv() (DuckDB lacks it)
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      s"""WITH t AS (SELECT doc_id,
         |    unnest(string_split($norm, ' ')) AS term FROM documents),
         |x AS (SELECT doc_id, md5(term) AS h FROM t)
         |SELECT doc_id,
         |  CAST((16 * ${hv(7)} + ${hv(8)}) % 64 AS BIGINT) AS bucket,
         |  count(*) AS n
         |FROM x GROUP BY 1, 2""".stripMargin
    },

    "q_copurchase_degree" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT p, count(*) AS degree FROM (
        |    SELECT pa AS p, pb AS q FROM pairs
        |    UNION ALL SELECT pb AS p, pa AS q FROM pairs) u
        |  GROUP BY 1)
        |SELECT degree, count(*) AS n_parts FROM deg GROUP BY 1""".stripMargin,

    "q_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 4)
        |    AS p_next
        |FROM c""".stripMargin,

    "q_locf" ->
      """SELECT event_id, user_id, event_type,
        |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS last_purchase_value
        |FROM events""".stripMargin,

    "q_k_anonymity" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nation,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  count(*) AS n
        |FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 5""".stripMargin,

    "q_zscore" ->
      // exact integer moments (hugeint ≡ Spark decimal(38,0)); the only
      // float ops are the final divide + sqrt, in identical order
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |m AS (SELECT event_type,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(c) AS HUGEINT) AS sx,
        |    CAST(sum(c * c) AS HUGEINT) AS sxx
        |  FROM e GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  round(CAST(n * c - sx AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)), 4) AS z
        |FROM e JOIN m USING(event_type)""".stripMargin,

    "q_gopher_quality" -> {
      val norm = normOf("text")
      s"""WITH x AS (SELECT doc_id,
         |    len(string_split($norm, ' ')) AS nw,
         |    length($norm) AS nl,
         |    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS nsym,
         |    length(text) AS nc,
         |    ${langScoreSql(s"string_split($norm, ' ')", enW)} AS stops
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(nw AS BIGINT) AS n_words,
         |  round((nl - (nw - 1)) / CAST(nw AS DOUBLE), 4) AS mean_word_len,
         |  round(CASE WHEN nc > 0 THEN nsym / CAST(nc AS DOUBLE)
         |             ELSE 0.0 END, 4) AS symbol_ratio,
         |  CAST(stops AS BIGINT) AS n_stopwords,
         |  (nw >= 50 AND nw <= 100000
         |   AND (nl - (nw - 1)) / CAST(nw AS DOUBLE) >= 3.0
         |   AND (nl - (nw - 1)) / CAST(nw AS DOUBLE) <= 10.0
         |   AND (CASE WHEN nc > 0 THEN nsym / CAST(nc AS DOUBLE)
         |             ELSE 0.0 END) <= 0.1
         |   AND stops >= 2) AS keep
         |FROM x""".stripMargin
    },

    "q_html_strip" ->
      // the IDENTICAL pattern strings as TextFunctions.stripHtml (the
      // RE2 ∩ Java dialect: inline (?is), lazy .*?, no backrefs);
      // entity decode is a literal replace chain, &amp; LAST so
      // &amp;lt; single-decodes to the text '&lt;'
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style type="text/css">body { color: #c00; }</style>' ||
        |  '<script>if (1 < 2 && 0 > -1) { var s = "</div>"; }</script>' ||
        |  '</head>' || chr(10) || '<body>' || chr(10) || '<!-- crawl:' ||
        |  source || chr(10) || '  snapshot -->' || chr(10) ||
        |  '<h1 class="t">' || source || '</h1>' || chr(10) || '<p>' ||
        |  text ||
        |  ' &amp;lt;tail&amp;gt; A &amp; B &lt;ok&gt; &quot;q&#39;s&quot;&nbsp;end</p>' ||
        |  chr(10) || '<br/></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        html,
        |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |        '(?s)<[^>]+>', ' ', 'g'),
        |      '&nbsp;', ' '), '&quot;', '"'), '&#39;', ''''),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean,
        |  CAST(length(trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        html,
        |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |        '(?s)<[^>]+>', ' ', 'g'),
        |      '&nbsp;', ' '), '&quot;', '"'), '&#39;', ''''),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
        |    '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
        |FROM h""".stripMargin,

    "q_corpus_divergence" -> {
      val norm = normOf("text")
      // counts/denominators exact ints; p, q, each term's
      // contribution in the IDENTICAL op order as the Spark plan; the
      // ln sums fold in sorted-term order (list_reduce seeds with the
      // first element, Spark's aggregate seeds 0.0 — 0.0+x ≡ x);
      // 6dp for the ln-ulp rule
      s"""WITH ca AS (SELECT term, count(*) AS ca FROM (
         |    SELECT unnest(string_split($norm, ' ')) AS term
         |    FROM documents WHERE doc_id % 2 = 0) x GROUP BY 1),
         |cb AS (SELECT term, count(*) AS cb FROM (
         |    SELECT unnest(string_split($norm, ' ')) AS term
         |    FROM documents WHERE doc_id % 2 = 1) x GROUP BY 1),
         |j AS (SELECT coalesce(ca.term, cb.term) AS term,
         |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
         |  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
         |t AS (SELECT sum(ca) AS ta, sum(cb) AS tb, count(*) AS v FROM j),
         |c AS (SELECT term,
         |    CAST(ca + 1 AS DOUBLE) / CAST(ta + v AS DOUBLE) AS p,
         |    CAST(cb + 1 AS DOUBLE) / CAST(tb + v AS DOUBLE) AS q
         |  FROM j CROSS JOIN t),
         |x AS (SELECT term, p * ln(p / q) AS kab, q * ln(q / p) AS kba,
         |    p * ln(p / ((p + q) / 2.0)) + q * ln(q / ((p + q) / 2.0)) AS jst
         |  FROM c)
         |SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST((SELECT ta FROM t) AS BIGINT) AS tot_a,
         |  CAST((SELECT tb FROM t) AS BIGINT) AS tot_b,
         |  round(list_reduce(list(kab ORDER BY term), (a, b) -> a + b), 6)
         |    AS kl_ab,
         |  round(list_reduce(list(kba ORDER BY term), (a, b) -> a + b), 6)
         |    AS kl_ba,
         |  round(list_reduce(list(jst ORDER BY term), (a, b) -> a + b)
         |    * 0.5, 6) AS js
         |FROM x""".stripMargin
    },

    "q_extract_links" ->
      // extractLinks + normalizeUrl replayed verbatim: same anchor
      // pattern (group 1), same absolute-http(s) filter, then the
      // q_url_normalize canonical pipeline applied per link
      """WITH h AS (SELECT doc_id, '<html><body><p>' || text || '</p>'
        |  || chr(10) || '<a class="m" HREF="HTTP://WWW.' || source
        |  || '.Example.COM:80/Docs/p' || CAST(doc_id % 8 AS VARCHAR)
        |  || '?utm_source=f&b=' || CAST(doc_id % 3 AS VARCHAR)
        |  || '#s">x</a>' || chr(10) || '<a href="/relative/skip">r</a>'
        |  || chr(10) || '<a href=''https://cdn.example.net:443/a/'
        |  || CAST(doc_id % 5 AS VARCHAR) || '/''>y</a></body></html>' AS html
        |  FROM documents),
        |l AS (SELECT doc_id, list_filter(regexp_extract_all(html,
        |    '(?is)<a\s[^>]*href\s*=\s*["'']([^"'']+)["'']', 1),
        |    x -> regexp_matches(x, '(?i)^https?://')) AS ls FROM h),
        |e AS (SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, ls[u.i] AS href
        |  FROM l, unnest(generate_series(1, len(ls))) AS u(i)),
        |p AS (SELECT doc_id, pos,
        |    lower(regexp_extract(regexp_replace(href, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_replace(href, '#.*$', ''),
        |      '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(regexp_replace(href, '#.*$', ''),
        |      '^[^:/?#]+://[^/?#]*(.*)$', 1) AS rest
        |  FROM e)
        |SELECT doc_id, pos, scheme || '://' ||
        |  (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |        ELSE hostport END) ||
        |  (CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |      '/+$', '') = '' THEN '/'
        |    ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |      '/+$', '') END) ||
        |  (CASE WHEN coalesce(list_aggregate(list_sort(list_filter(
        |      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |        AND x <> '')), 'string_agg', '&'), '') = '' THEN ''
        |    ELSE '?' || list_aggregate(list_sort(list_filter(
        |      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |        AND x <> '')), 'string_agg', '&') END) AS link
        |FROM p""".stripMargin,

    "q_url_normalize" ->
      // mirror of TextFunctions.normalizeUrl step for step (identical
      // pattern strings); empty-list string_agg is NULL in DuckDB →
      // coalesce '' to match Spark's array_join on an empty array
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'https://www.' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
        |  || '/Docs/p' || CAST(doc_id % 8 AS VARCHAR)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
        |  || '?b=' || CAST(doc_id % 3 AS VARCHAR)
        |  || '&utm_source=feed'
        |  || (CASE WHEN doc_id % 4 = 0 THEN '&a=1' ELSE '' END)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '#top' ELSE '' END) AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[^:/?#]+://[^/?#]*(.*)$', 1) AS rest
        |  FROM u),
        |c AS (SELECT doc_id, scheme ||  '://' ||
        |    (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |          WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |          ELSE hostport END) ||
        |    (CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |        '/+$', '') = '' THEN '/'
        |      ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |        '/+$', '') END) ||
        |    (CASE WHEN coalesce(list_aggregate(list_sort(list_filter(
        |        string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |          AND x <> '')), 'string_agg', '&'), '') = '' THEN ''
        |      ELSE '?' || list_aggregate(list_sort(list_filter(
        |        string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |          AND x <> '')), 'string_agg', '&') END) AS canon
        |  FROM p)
        |SELECT doc_id, canon,
        |  count(*) OVER (PARTITION BY canon) AS n_same,
        |  count(*) OVER (PARTITION BY canon) > 1 AS is_dup
        |FROM c""".stripMargin,

    "q_skyline_global" ->
      """SELECT a.p_partkey, CAST(a.p_size AS BIGINT) AS p_size,
        |  a.p_retailprice
        |FROM part a
        |WHERE a.p_size IS NOT NULL AND a.p_retailprice IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part b
        |    WHERE b.p_size IS NOT NULL AND b.p_retailprice IS NOT NULL
        |      AND b.p_size >= a.p_size
        |      AND b.p_retailprice <= a.p_retailprice
        |      AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice))""".stripMargin,

    "q_skyline" ->
      // per-brand Pareto frontier as the textbook NOT EXISTS dominance
      // test (quadratic — fine for the oracle, not the engine);
      // dominance strict on at least one dim, so duplicate Pareto
      // points all survive, matching the buffer's never-dominates-
      // equal rule; null-dim rows excluded on both sides
      """SELECT a.p_brand, a.p_partkey, CAST(a.p_size AS BIGINT) AS p_size,
        |  a.p_retailprice
        |FROM part a
        |WHERE a.p_size IS NOT NULL AND a.p_retailprice IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part b
        |    WHERE b.p_brand = a.p_brand
        |      AND b.p_size IS NOT NULL AND b.p_retailprice IS NOT NULL
        |      AND b.p_size >= a.p_size
        |      AND b.p_retailprice <= a.p_retailprice
        |      AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice))""".stripMargin,

    "q_lorenz" ->
      // decile by explicit integer arithmetic (ntile remainder
      // placement is engine-defined); cum sums exact ints, shares one
      // division each
      """WITH r AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS n, sum(cents) AS tot FROM r),
        |s AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS i FROM r),
        |d AS (SELECT least(9, (i - 1) * 10 // t.n) AS decile,
        |    count(*) AS n_customers, sum(cents) AS cents_sum
        |  FROM s, t GROUP BY 1),
        |c AS (SELECT decile, n_customers, cents_sum,
        |    sum(cents_sum) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS cum_cents
        |  FROM d)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(n_customers AS BIGINT) AS n_customers,
        |  CAST(cents_sum AS BIGINT) AS cents_sum,
        |  CAST(cum_cents AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)
        |    AS cum_share
        |FROM c""".stripMargin,

    "q_gini" ->
      // same integer-cents revenue, ascending (cents, custkey) rank,
      // HUGEINT numerator, one double division — mirrors the Spark
      // decimal(38,0) fold exactly
      """WITH r AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM r),
        |t AS (SELECT count(*) AS n, sum(cents) AS tot FROM r)
        |SELECT CAST(t.n AS BIGINT) AS n_customers,
        |  CAST(t.tot AS BIGINT) AS total_cents,
        |  CAST(sum((2 * i - t.n - 1) * cents) AS DOUBLE) /
        |    (CAST(t.n AS DOUBLE) * CAST(t.tot AS DOUBLE)) AS gini
        |FROM s, t GROUP BY t.n, t.tot""".stripMargin,

    "q_incremental_url" ->
      // canonicalize both halves with the same pipeline; store =
      // DISTINCT canon of even ids; batch keeps lowest odd id per
      // canon then anti-joins the store (NOT EXISTS — null-safe)
      """WITH u AS (SELECT doc_id,
        |  'HTTP://WWW.' || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END)
        |  || '/Docs/p' || CAST(doc_id % 8 AS VARCHAR)
        |  || '?b=' || CAST(doc_id % 3 AS VARCHAR)
        |  || '&utm_source=feed'
        |  || (CASE WHEN doc_id % 3 = 0 THEN '#top' ELSE '' END) AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[^:/?#]+://[^/?#]*(.*)$', 1) AS rest
        |  FROM u),
        |c AS (SELECT doc_id, scheme || '://' ||
        |    (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |          WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |          ELSE hostport END) ||
        |    (CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |        '/+$', '') = '' THEN '/'
        |      ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |        '/+$', '') END) ||
        |    (CASE WHEN coalesce(list_aggregate(list_sort(list_filter(
        |        string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |          AND x <> '')), 'string_agg', '&'), '') = '' THEN ''
        |      ELSE '?' || list_aggregate(list_sort(list_filter(
        |        string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
        |          AND x <> '')), 'string_agg', '&') END) AS canon
        |  FROM p),
        |store AS (SELECT DISTINCT canon FROM c WHERE doc_id % 2 = 0),
        |batch AS (SELECT doc_id, canon FROM (
        |    SELECT doc_id, canon, row_number() OVER (
        |      PARTITION BY canon ORDER BY doc_id) AS rn
        |    FROM c WHERE doc_id % 2 <> 0) b WHERE rn = 1)
        |SELECT doc_id, canon FROM batch
        |WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.canon = batch.canon)""".stripMargin,

    "q_crawl_funnel" -> {
      val norm = "trim(regexp_replace(lower(clean), '[^a-z0-9]+', ' ', 'g'))"
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(hh, $i, 1)) - 1)"
      val w6 = s"(16*(16*(16*(16*(16*${hv(1)} + ${hv(2)}) + ${hv(3)}) + " +
        s"${hv(4)}) + ${hv(5)}) + ${hv(6)})"
      // E63 canon → keep-lowest-id → E61 strip chain → E60 classifier,
      // each stage the IDENTICAL fragment its standalone oracle runs
      s"""WITH u AS (SELECT doc_id, text, source,
         |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'https://www.' END)
         |  || source || '.Example.COM'
         |  || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
         |  || '/Docs/p' || CAST(doc_id % 8 AS VARCHAR)
         |  || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
         |  || '?b=' || CAST(doc_id % 3 AS VARCHAR)
         |  || '&utm_source=feed'
         |  || (CASE WHEN doc_id % 4 = 0 THEN '&a=1' ELSE '' END)
         |  || (CASE WHEN doc_id % 3 = 0 THEN '#top' ELSE '' END) AS url
         |  FROM documents),
         |pp AS (SELECT doc_id, text, source,
         |    lower(regexp_extract(regexp_replace(url, '#.*$$', ''),
         |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    lower(regexp_extract(regexp_replace(url, '#.*$$', ''),
         |      '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
         |    regexp_extract(regexp_replace(url, '#.*$$', ''),
         |      '^[^:/?#]+://[^/?#]*(.*)$$', 1) AS rest
         |  FROM u),
         |cc AS (SELECT doc_id, text, source, scheme || '://' ||
         |    (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
         |          WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
         |          ELSE hostport END) ||
         |    (CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
         |        '/+$$', '') = '' THEN '/'
         |      ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
         |        '/+$$', '') END) ||
         |    (CASE WHEN coalesce(list_aggregate(list_sort(list_filter(
         |        string_split(regexp_extract(rest, '\\?(.*)$$', 1), '&'),
         |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
         |          AND x <> '')), 'string_agg', '&'), '') = '' THEN ''
         |      ELSE '?' || list_aggregate(list_sort(list_filter(
         |        string_split(regexp_extract(rest, '\\?(.*)$$', 1), '&'),
         |        x -> NOT regexp_matches(x, '^(utm_[a-z0-9]+|gclid|fbclid)=')
         |          AND x <> '')), 'string_agg', '&') END) AS canon
         |  FROM pp),
         |kept AS (SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source, row_number() OVER (
         |      PARTITION BY canon ORDER BY doc_id) AS rn FROM cc) k
         |  WHERE rn = 1),
         |sh2 AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
         |  '</title><style type="text/css">body { color: #c00; }</style>' ||
         |  '<script>if (1 < 2 && 0 > -1) { var s = "</div>"; }</script>' ||
         |  '</head>' || chr(10) || '<body>' || chr(10) || '<!-- crawl:' ||
         |  source || chr(10) || '  snapshot -->' || chr(10) ||
         |  '<h1 class="t">' || source || '</h1>' || chr(10) || '<p>' ||
         |  text ||
         |  ' &amp;lt;tail&amp;gt; A &amp; B &lt;ok&gt; &quot;q&#39;s&quot;&nbsp;end</p>' ||
         |  chr(10) || '<br/></body></html>' AS html
         |  FROM kept),
         |st AS (SELECT doc_id,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |        html,
         |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |        '(?s)<!--.*?-->', ' ', 'g'),
         |        '(?s)<[^>]+>', ' ', 'g'),
         |      '&nbsp;', ' '), '&quot;', '"'), '&#39;', ''''),
         |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
         |    '\\s+', ' ', 'g')) AS clean
         |  FROM sh2),
         |tt AS (SELECT doc_id,
         |    unnest(string_split($norm, ' ')) AS term FROM st),
         |xx AS (SELECT doc_id, md5(term) AS hh FROM tt),
         |tf AS (SELECT doc_id,
         |    CAST((16 * ${hv(7)} + ${hv(8)}) % 64 AS BIGINT) AS bucket,
         |    count(*) AS tf
         |  FROM xx GROUP BY 1, 2),
         |ww AS (SELECT bucket, $w6 % 2001 - 1000 AS w FROM
         |  (SELECT bucket, md5('w' || CAST(bucket AS VARCHAR)) AS hh
         |   FROM (SELECT DISTINCT bucket FROM tf) b) y),
         |zz AS (SELECT doc_id, sum(tf) AS n_tokens,
         |    sum(tf * ww.w) AS z_milli
         |  FROM tf JOIN ww USING (bucket) GROUP BY 1)
         |SELECT (SELECT count(*) FROM documents) AS n_input,
         |  (SELECT count(*) FROM kept) AS n_unique_url,
         |  CAST(sum(CASE WHEN z_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality_keep,
         |  CAST(sum(CASE WHEN z_milli >= 0 THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tokens_kept
         |FROM zz""".stripMargin
    },

    "q_cut_spans" ->
      // q_dup_spans' detection replayed, then the cut: token stream
      // anti-joined against exploded span positions, reassembly via
      // position-ordered string_agg; left join from totals keeps
      // fully-flagged docs as empty text
      s"""WITH $corpusCte,
         |t AS (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
         |      FROM corpus),
         |g AS (SELECT id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS g
         |  FROM t, unnest(generate_series(1, len(w) - 4)) AS u(i)),
         |d AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
         |h AS (SELECT id, pos, pos + 5 AS e FROM g JOIN d USING (g)),
         |i AS (SELECT id, pos, e,
         |    CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY id
         |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      -1) THEN 1 ELSE 0 END AS nw
         |  FROM h),
         |s AS (SELECT id, pos, e, sum(nw) OVER (PARTITION BY id
         |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM i),
         |sp AS (SELECT id, min(pos) AS a, max(e) - 1 AS b
         |  FROM s GROUP BY id, island),
         |toks AS (SELECT id, CAST(u.i - 1 AS BIGINT) AS pos, w[u.i] AS tok
         |  FROM t, unnest(generate_series(1, len(w))) AS u(i)),
         |cutpos AS (SELECT id, u.p AS pos
         |  FROM sp, unnest(generate_series(a, b)) AS u(p)),
         |kept AS (SELECT tk.id, tk.pos, tk.tok FROM toks tk
         |  WHERE NOT EXISTS (SELECT 1 FROM cutpos c
         |    WHERE c.id = tk.id AND c.pos = tk.pos)),
         |total AS (SELECT id, count(*) AS n_total FROM toks GROUP BY id),
         |re AS (SELECT id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY id)
         |SELECT total.id AS doc_id,
         |  coalesce(re.clean_text, '') AS clean_text,
         |  CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(total.n_total - coalesce(re.n_kept, 0) AS BIGINT) AS n_cut
         |FROM total LEFT JOIN re ON re.id = total.id""".stripMargin,

    "q_dup_spans" ->
      // mirror of Corpus.duplicateSpans k=5 over the dup-seeded
      // corpus: positioned 5-grams (the shCte pattern WITHOUT the
      // per-doc DISTINCT — positions matter here), corpus-wide
      // frequency >= 2 filter, then gaps-and-islands over half-open
      // [pos, pos+5) intervals — new island iff pos > prefix-max(e)
      // (coalesce -1 for the first row), identical to
      // coalesceIntervals' closed-touching merge rule
      s"""WITH $corpusCte,
         |t AS (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
         |      FROM corpus),
         |g AS (SELECT id, CAST(u.i - 1 AS BIGINT) AS pos,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS g
         |  FROM t, unnest(generate_series(1, len(w) - 4)) AS u(i)),
         |d AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
         |h AS (SELECT id, pos, pos + 5 AS e FROM g JOIN d USING (g)),
         |i AS (SELECT id, pos, e,
         |    CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY id
         |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      -1) THEN 1 ELSE 0 END AS nw
         |  FROM h),
         |s AS (SELECT id, pos, e, sum(nw) OVER (PARTITION BY id
         |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM i)
         |SELECT id AS doc_id, min(pos) AS span_start, max(e) - 1 AS span_end,
         |  max(e) - min(pos) AS span_tokens, count(*) AS n_grams
         |FROM s GROUP BY id, island""".stripMargin,

    "q_attribution_linear" ->
      // per-touch credit is integer floor division (micro-cents):
      // cents·10⁶ // n_touches — DuckDB's // truncates toward zero like
      // Spark's div (values are non-negative here, so they agree
      // regardless); sums are exact integers end to end
      """WITH x AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sg
        |  FROM events),
        |t AS (SELECT user_id AS u, sg, event_type AS channel,
        |    count(*) AS n_ch
        |  FROM x WHERE event_type <> 'purchase' GROUP BY 1, 2, 3),
        |st AS (SELECT u, sg, sum(n_ch) AS n_touches FROM t GROUP BY 1, 2),
        |c AS (SELECT user_id AS u, sg, cents FROM x
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT c.u, c.sg, c.cents, st.n_touches
        |  FROM c LEFT JOIN st ON c.u = st.u AND c.sg = st.sg),
        |cr AS (
        |  SELECT t.channel, t.n_ch,
        |    (j.cents * 1000000 // j.n_touches) * t.n_ch AS micro
        |  FROM j JOIN t ON j.u = t.u AND j.sg = t.sg
        |  WHERE j.n_touches IS NOT NULL
        |  UNION ALL
        |  SELECT 'none', 0, cents * 1000000 FROM j WHERE n_touches IS NULL)
        |SELECT channel, CAST(sum(n_ch) AS BIGINT) AS n_touches,
        |  count(*) AS n_journeys,
        |  CAST(sum(micro) // 1000000 AS BIGINT) AS credited_cents
        |FROM cr GROUP BY 1""".stripMargin,

    "q_template_detect" ->
      // skeleton regexes are RE2 ∩ Java; DuckDB needs the 'g' flag
      // where Spark's regexp_replace is global by default
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    'Invoice #' || CAST(doc_id AS VARCHAR) || ': total ' ||
        |    CAST(n_chars AS VARCHAR) || ' USD, ref (' || lang || '-' ||
        |    CAST(doc_id AS VARCHAR) || ').'
        |  FROM documents WHERE doc_id % 25 = 0),
        |fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9]+', '#', 'g'), '\s+', ' ', 'g'))) AS fingerprint
        |  FROM docs)
        |SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS rep_doc
        |FROM fp GROUP BY 1 HAVING count(*) >= 3""".stripMargin,

    "q_fd_check" ->
      // violation_rate is ONE double division of exact integers — raw,
      // unrounded (the keySkewProfile rule)
      """WITH f1 AS (SELECT o_custkey AS lhs,
        |    count(DISTINCT o_orderstatus) AS nd FROM orders GROUP BY 1),
        |f2 AS (SELECT o_orderstatus AS lhs,
        |    count(DISTINCT o_orderpriority) AS nd FROM orders GROUP BY 1),
        |f3 AS (SELECT o_orderkey AS lhs,
        |    count(DISTINCT o_custkey) AS nd FROM orders GROUP BY 1),
        |u AS (
        |  SELECT 'cust_to_status' AS fd, count(*) AS n_lhs,
        |    count(CASE WHEN nd > 1 THEN 1 END) AS n_violating,
        |    max(nd) AS max_rhs_per_lhs FROM f1
        |  UNION ALL
        |  SELECT 'status_to_priority', count(*),
        |    count(CASE WHEN nd > 1 THEN 1 END), max(nd) FROM f2
        |  UNION ALL
        |  SELECT 'orderkey_to_cust', count(*),
        |    count(CASE WHEN nd > 1 THEN 1 END), max(nd) FROM f3)
        |SELECT fd, n_lhs, n_violating, max_rhs_per_lhs,
        |  CAST(n_violating AS DOUBLE) / CAST(n_lhs AS DOUBLE)
        |    AS violation_rate
        |FROM u""".stripMargin,

    "q_semantic_decontam" ->
      // argmax tie-break: cos DESC then eval_id ASC — mirrors Spark's
      // max(struct(cos, −eval_id)); comparisons run on raw doubles
      // (identical fold order both sides), rounding only at output
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |e AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS ev
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |s AS (SELECT c.vec_id, e.eval_id,
         |    ${cosSql("c.v", "e.ev")} AS cos
         |  FROM c CROSS JOIN e),
         |r AS (SELECT vec_id, eval_id, cos,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY cos DESC, eval_id) AS rn
         |  FROM s)
         |SELECT vec_id, eval_id AS top_eval_id, round(cos, 3) AS cos,
         |  cos >= 0.9 AS contaminated
         |FROM r WHERE rn = 1""".stripMargin,

    "q_join_size" ->
      """WITH l AS (SELECT user_id AS k, count(*) AS nl FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (SELECT c_custkey AS k, count(*) AS nr FROM customer
        |  WHERE c_custkey IS NOT NULL GROUP BY 1),
        |m AS (SELECT l.nl, r.nr FROM l FULL OUTER JOIN r ON l.k = r.k)
        |SELECT count(CASE WHEN nl IS NOT NULL THEN 1 END) AS n_keys_left,
        |  count(CASE WHEN nr IS NOT NULL THEN 1 END) AS n_keys_right,
        |  count(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL THEN 1 END)
        |    AS n_keys_matched,
        |  CAST(coalesce(sum(nl), 0) AS BIGINT) AS rows_left,
        |  CAST(coalesce(sum(nr), 0) AS BIGINT) AS rows_right,
        |  CAST(coalesce(sum(nl * nr), 0) AS BIGINT) AS predicted_rows,
        |  CAST(coalesce(max(nl * nr), 0) AS BIGINT) AS max_key_out
        |FROM m""".stripMargin,

    "q_rrf_fuse" ->
      // rrf = two fixed-order reciprocals of exact integers — raw
      // doubles, identical on both engines
      """WITH b AS (SELECT c_nationkey AS q, o_custkey AS d,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents,
        |    count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |a AS (SELECT q, d, row_number() OVER (PARTITION BY q
        |    ORDER BY cents DESC, d) AS ra FROM b),
        |b2 AS (SELECT q, d, row_number() OVER (PARTITION BY q
        |    ORDER BY cnt DESC, d) AS rb FROM b),
        |f AS (SELECT coalesce(a.q, b2.q) AS q, coalesce(a.d, b2.d) AS d,
        |    coalesce(1.0 / (60 + ra), 0.0) + coalesce(1.0 / (60 + rb), 0.0)
        |      AS rrf
        |  FROM (SELECT * FROM a WHERE ra <= 10) a
        |  FULL OUTER JOIN (SELECT * FROM b2 WHERE rb <= 10) b2
        |    ON a.q = b2.q AND a.d = b2.d),
        |r AS (SELECT q, d, rrf, row_number() OVER (PARTITION BY q
        |    ORDER BY rrf DESC, d) AS fused_rank FROM f)
        |SELECT q AS nation_key, d AS cust, rrf, fused_rank
        |FROM r WHERE fused_rank <= 5""".stripMargin,

    "q_anchor_text" ->
      // the two regexp_extract_all calls run the SAME pattern (groups
      // 1/2) so href/anchor arrays align positionally; decorated
      // canonical targets are reconstructed literally (the Docs URL is
      // normalizeUrl's case-fold output, the cdn URL is already
      // canonical), sidestepping a second normalizeUrl mirror
      """WITH h AS (SELECT doc_id, lang,
        |  '<p>' || text || '</p><A Href="HTTPS://Docs.Example.ORG/t'
        |  || CAST(doc_id % 4 AS VARCHAR) || '">Best ' || lang
        |  || ' guide</A><a href=''https://cdn.example.net/d/'
        |  || CAST(doc_id % 3 AS VARCHAR)
        |  || '''>download <b>now</b> &amp; docs</a><a href="/rel">skip</a>'
        |    AS html
        |  FROM documents),
        |x AS (SELECT doc_id,
        |    regexp_extract_all(html,
        |      '(?is)<a\s[^>]*href\s*=\s*["'']([^"'']+)["''][^>]*>(.*?)</a>',
        |      1) AS us,
        |    regexp_extract_all(html,
        |      '(?is)<a\s[^>]*href\s*=\s*["'']([^"'']+)["''][^>]*>(.*?)</a>',
        |      2) AS ts
        |  FROM h),
        |e AS (SELECT doc_id, us[u.i] AS raw_url, ts[u.i] AS raw_anchor
        |  FROM x, unnest(generate_series(1, len(us))) AS u(i)
        |  WHERE regexp_matches(us[u.i], '(?i)^https?://')),
        |n AS (SELECT
        |    CASE WHEN raw_url LIKE 'HTTPS://%'
        |      THEN 'https://docs.example.org/t' || CAST(doc_id % 4 AS VARCHAR)
        |      ELSE raw_url END AS url,
        |    trim(regexp_replace(lower(
        |      regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(raw_anchor, '(?s)<[^>]+>', ' ', 'g'),
        |        '&nbsp;', ' ', 'g'), '&quot;', '"', 'g'),
        |        '&#39;', '''', 'g'), '&lt;', '<', 'g'),
        |        '&gt;', '>', 'g'), '&amp;', '&', 'g')),
        |      '\s+', ' ', 'g')) AS anchor
        |  FROM e),
        |t AS (SELECT url, unnest(string_split(anchor, ' ')) AS term FROM n),
        |c AS (SELECT url, term, count(*) AS n FROM t
        |  WHERE term <> '' GROUP BY 1, 2),
        |r AS (SELECT url, term, n, row_number() OVER (PARTITION BY url
        |    ORDER BY n DESC, term) AS rank FROM c)
        |SELECT url, term, n, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3""".stripMargin,

    "q_quality_percentile" ->
      // rank/percentile arithmetic is pure integers — the // matches
      // Spark's div on the non-negative operands here
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |r AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score, doc_id) AS rank,
        |    count(*) OVER () AS n
        |  FROM s)
        |SELECT doc_id, score, CAST(rank AS BIGINT) AS rank,
        |  CAST(rank * 10000 // n AS BIGINT) AS pct_bp,
        |  rank * 10000 > n * 7500 AS keep
        |FROM r""".stripMargin,

    "q_novelty" -> {
      def gramsOf(src: String) =
        s"""SELECT DISTINCT id,
           |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2]||' '||w[u.i+3]||' '||w[u.i+4] AS sh
           |  FROM (SELECT doc_id AS id, string_split(${normOf("text")}, ' ') AS w
           |        FROM $src) t,
           |       unnest(generate_series(1, len(w) - 4)) AS u(i)""".stripMargin
      // NOT EXISTS (not NOT IN): null-safe mirror of the anti join
      s"""WITH probe AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
         |  UNION ALL SELECT doc_id + 4000000, text FROM documents
         |    WHERE doc_id % 14 = 0),
         |ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         |pg AS (${gramsOf("probe")}),
         |rg AS (SELECT DISTINCT sh FROM (${gramsOf("ref")}) g),
         |tot AS (SELECT id, count(*) AS n_grams FROM pg GROUP BY 1),
         |nv AS (SELECT id, count(*) AS n_novel FROM pg
         |  WHERE NOT EXISTS (SELECT 1 FROM rg WHERE rg.sh = pg.sh)
         |  GROUP BY 1)
         |SELECT tot.id, tot.n_grams,
         |  coalesce(nv.n_novel, 0) AS n_novel,
         |  CAST(coalesce(nv.n_novel, 0) AS DOUBLE) /
         |    CAST(tot.n_grams AS DOUBLE) AS novelty
         |FROM tot LEFT JOIN nv ON tot.id = nv.id""".stripMargin
    },

    "q_time_weighted" ->
      // cents·Δµs folds as exact integers (HUGEINT); twa is ONE raw
      // double division — keySkewProfile rule
      """WITH x AS (SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |y AS (SELECT *, lead(us) OVER (PARTITION BY event_type
        |    ORDER BY us, event_id) AS nxt FROM x)
        |SELECT event_type, count(*) AS n_samples,
        |  max(us) - min(us) AS span_us,
        |  CASE WHEN max(us) - min(us) > 0 THEN
        |    CAST(sum(CASE WHEN nxt IS NOT NULL
        |      THEN cents * (nxt - us) END) AS DOUBLE) /
        |    CAST(max(us) - min(us) AS DOUBLE)
        |  END AS twa
        |FROM y GROUP BY 1""".stripMargin,

    "q_lateness" ->
      """WITH x AS (SELECT event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |y AS (SELECT *, greatest(0, coalesce(max(us) OVER (
        |    PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us, 0))
        |      AS late
        |  FROM x)
        |SELECT event_type, count(*) AS n_events,
        |  count(CASE WHEN late > 0 THEN 1 END) AS n_late,
        |  max(late) AS max_late_us,
        |  count(CASE WHEN late > 60000000 THEN 1 END) AS n_late_gt_60000000,
        |  count(CASE WHEN late > 300000000 THEN 1 END) AS n_late_gt_300000000,
        |  count(CASE WHEN late > 3600000000 THEN 1 END)
        |    AS n_late_gt_3600000000
        |FROM y GROUP BY 1""".stripMargin,

    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    event_type FROM events),
        |a AS (SELECT *, CASE WHEN event_type = 'view' THEN us END AS c1
        |  FROM e),
        |b AS (SELECT *, CASE WHEN event_type = 'click' AND
        |    min(c1) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      IS NOT NULL THEN us END AS c2 FROM a),
        |c AS (SELECT *, CASE WHEN event_type = 'purchase' AND
        |    min(c2) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      IS NOT NULL THEN us END AS c3 FROM b)
        |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
        |  count(DISTINCT CASE WHEN c1 IS NOT NULL THEN user_id END)
        |    AS n_users FROM c
        |UNION ALL SELECT 2, 'click',
        |  count(DISTINCT CASE WHEN c2 IS NOT NULL THEN user_id END) FROM c
        |UNION ALL SELECT 3, 'purchase',
        |  count(DISTINCT CASE WHEN c3 IS NOT NULL THEN user_id END)
        |  FROM c""".stripMargin,

    "q_token_budget" ->
      // the oracle's single ordered cumsum ≡ the two-level prefix sum
      // (hash order is total: 48-bit md5 prefix, ties by doc_id)
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s)
        |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
        |  cum <= 10000 AS keep
        |FROM c""".stripMargin,

    "q_table_digest" ->
      // 12-hex-digit md5 prefix → integer via DuckDB's '0x' cast
      // (Spark side uses conv(,16,10)); summed digests are
      // order-invariant so both engines agree on any row order
      """WITH n AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST('0x' || substring(md5(concat_ws('|',
        |      CAST(n_nationkey AS VARCHAR), n_name,
        |      CAST(n_regionkey AS VARCHAR))), 1, 12) AS BIGINT))
        |      AS VARCHAR) AS digest
        |  FROM nation),
        |c AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST('0x' || substring(md5(concat_ws('|',
        |      CAST(c_custkey AS VARCHAR), c_name, c_mktsegment)), 1, 12)
        |      AS BIGINT)) AS VARCHAR) AS digest
        |  FROM customer),
        |o AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST('0x' || substring(md5(concat_ws('|',
        |      CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
        |      o_orderstatus, o_orderpriority,
        |      CAST(epoch_us(o_orderdate) AS VARCHAR))), 1, 12)
        |      AS BIGINT)) AS VARCHAR) AS digest
        |  FROM orders)
        |SELECT 'customer' AS tbl, n_rows, digest FROM c
        |UNION ALL SELECT 'nation', n_rows, digest FROM n
        |UNION ALL SELECT 'orders', n_rows, digest FROM o""".stripMargin,

    "q_state_runs" ->
      """WITH x AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
        |    THEN 1 ELSE 0 END AS chg FROM x),
        |z AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM y)
        |SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
        |  event_type AS state, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM z GROUP BY 1, 2, 3""".stripMargin,

    "q_itemsets3" ->
      // direct triple count ≥ ceil(n·35bp) — downward closure makes
      // this identical to the Spark side's Apriori-pruned plan; all
      // counts exact BIGINT, support one IEEE division at 6dp
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets,
        |    CAST((count(DISTINCT bk) * 35 + 9999) // 10000 AS BIGINT)
        |      AS minsup FROM b),
        |t AS (SELECT a.it AS item_a, b2.it AS item_b, c.it AS item_c,
        |    CAST(count(*) AS BIGINT) AS supp_abc
        |  FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
        |    JOIN b c ON a.bk = c.bk AND b2.it < c.it
        |  GROUP BY 1, 2, 3)
        |SELECT item_a, item_b, item_c, supp_abc,
        |  round(CAST(supp_abc AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), 6)
        |    AS support
        |FROM t CROSS JOIN n WHERE supp_abc >= n.minsup""".stripMargin,

    "q_stump" ->
      // exact integer stump fit: per-dollar (pos, n) counts, prefix
      // sums, accuracy argmax by (correct desc, threshold asc); the
      // single IEEE division happens at output (6dp)
      """WITH e AS (SELECT (event_type = 'purchase') AS isp,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS x
        |  FROM events),
        |g AS (SELECT x,
        |    CAST(sum(CASE WHEN isp THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
        |    CAST(sum(n) AS BIGINT) AS tn FROM g),
        |c AS (SELECT x AS threshold,
        |    CAST(sum(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS clp,
        |    CAST(sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cln FROM g),
        |s AS (SELECT threshold, clp AS left_pos, cln - clp AS left_neg,
        |    tp - clp AS right_pos, tn - cln - tp + clp AS right_neg, tn,
        |    greatest(clp, cln - clp) +
        |      greatest(tp - clp, tn - cln - tp + clp) AS correct
        |  FROM c CROSS JOIN tot),
        |r AS (SELECT *, row_number()
        |    OVER (ORDER BY correct DESC, threshold) AS rn FROM s)
        |SELECT threshold, left_pos, left_neg, right_pos, right_neg,
        |  correct,
        |  round(CAST(correct AS DOUBLE) / CAST(tn AS DOUBLE), 6)
        |    AS accuracy,
        |  left_pos > left_neg AS predict_left,
        |  right_pos > right_neg AS predict_right
        |FROM r WHERE rn = 1""".stripMargin,

    "q_mann_whitney" ->
      // 2×rank carriers keep tied ranks integral (lo+hi per tie run);
      // u2_a exact BIGINT; z mirrors the Spark fixed IEEE op order:
      // sig2 = na*nb/12 * ((N+1) − T/(N(N−1))), z = (U−μ)/σ, 6dp
      """WITH d AS (SELECT (event_type = 'purchase') AS isa,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ta
        |  FROM d GROUP BY 1),
        |r AS (SELECT t, ta,
        |    CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS hi FROM g),
        |a AS (SELECT CAST(sum(ta) AS BIGINT) AS n_a,
        |    CAST(sum(t - ta) AS BIGINT) AS n_b,
        |    CAST(sum(ta * (2 * hi - t + 1)) AS BIGINT) AS r2_a,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum FROM r),
        |u AS (SELECT n_a, n_b,
        |    CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a, tie_sum
        |  FROM a)
        |SELECT n_a, n_b, u2_a, CAST(u2_a AS DOUBLE) / 2.0 AS u_a,
        |  round(CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |      / 12.0 * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
        |        - CAST(tie_sum AS DOUBLE)
        |          / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))
        |      > 0
        |    THEN (CAST(u2_a AS DOUBLE) / 2.0
        |        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
        |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |        * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
        |          - CAST(tie_sum AS DOUBLE)
        |            / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |              * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
        |                - 1.0))))
        |    END, 6) AS z
        |FROM u""".stripMargin,

    "q_spatial_join" ->
      // brute-force cross join — the Spark grid plan is exact by
      // construction (cell side = radius covers every ≤r pair), so
      // both emit the identical pair set; distances exact BIGINT
      """WITH p AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000 + 0.5)
        |      AS BIGINT) AS y FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    AS BIGINT) AS dist2
        |FROM p a JOIN p b ON a.vec_id < b.vec_id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |  <= 900""".stripMargin,

    "q_boost" ->
      // both boosting rounds unrolled: round-1 stump on unit weights,
      // misclassified weights ×2 (exact BIGINT), round-2 weighted
      // refit; argmax by (weighted correct desc, threshold asc) in
      // both rounds; err_micro is exact integer floor division
      """WITH e AS (SELECT (event_type = 'purchase') AS y,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS x
        |  FROM events),
        |g1 AS (SELECT x,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |t1 AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
        |    CAST(sum(n) AS BIGINT) AS tn FROM g1),
        |c1 AS (SELECT x AS th,
        |    CAST(sum(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS clp,
        |    CAST(sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cln FROM g1),
        |s1 AS (SELECT th, clp AS lp, cln - clp AS lneg, tp - clp AS rp,
        |    tn - cln - tp + clp AS rneg, tn,
        |    greatest(clp, cln - clp) +
        |      greatest(tp - clp, tn - cln - tp + clp) AS wc
        |  FROM c1 CROSS JOIN t1),
        |f1 AS (SELECT th, wc, tn, lp > lneg AS pl, rp > rneg AS pr
        |  FROM (SELECT *, row_number()
        |      OVER (ORDER BY wc DESC, th) AS rn FROM s1) z1
        |  WHERE rn = 1),
        |w2 AS (SELECT e.y, e.x,
        |    CASE WHEN (e.x <= f1.th AND e.y = f1.pl)
        |      OR (e.x > f1.th AND e.y = f1.pr)
        |    THEN CAST(1 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS w
        |  FROM e CROSS JOIN f1),
        |g2 AS (SELECT x,
        |    CAST(sum(CASE WHEN y THEN w ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(w) AS BIGINT) AS n FROM w2 GROUP BY 1),
        |t2 AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
        |    CAST(sum(n) AS BIGINT) AS tn FROM g2),
        |c2 AS (SELECT x AS th,
        |    CAST(sum(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS clp,
        |    CAST(sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cln FROM g2),
        |s2 AS (SELECT th, clp AS lp, cln - clp AS lneg, tp - clp AS rp,
        |    tn - cln - tp + clp AS rneg, tn,
        |    greatest(clp, cln - clp) +
        |      greatest(tp - clp, tn - cln - tp + clp) AS wc
        |  FROM c2 CROSS JOIN t2),
        |f2 AS (SELECT th, wc, tn, lp > lneg AS pl, rp > rneg AS pr
        |  FROM (SELECT *, row_number()
        |      OVER (ORDER BY wc DESC, th) AS rn FROM s2) z2
        |  WHERE rn = 1)
        |SELECT CAST(1 AS BIGINT) AS round, th AS threshold,
        |  wc AS w_correct, tn AS w_total,
        |  CAST((tn - wc) * 1000000 // tn AS BIGINT) AS err_micro,
        |  pl AS predict_left, pr AS predict_right FROM f1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), th, wc, tn,
        |  CAST((tn - wc) * 1000000 // tn AS BIGINT), pl, pr
        |FROM f2""".stripMargin,

    "q_bootstrap" -> {
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      val h12 = (2 to 12).foldLeft(hv(1))((acc, i) =>
        s"(16*$acc + ${hv(i)})")
      // one md5 per ROW seeds 48 bits; each replica draw is integer
      // mixing (seed·(2b+1)+b mod 10⁴) against the Poisson(1) CDF
      // ladder; replica means in exact floor-div micro-units; 5th/95th
      // picks = integer ranks ceil(nr·p) of the SURVIVING replica
      // count nr (a replica that draws all-zero counts is filtered,
      // and the ranks shift with it — mirrored in Stats
      // .bootstrapMeanCI); ties broken by replica id in both engines
      s"""WITH e AS (SELECT event_id AS id,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
         |fl AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(v) * 1000000 // count(*) AS BIGINT) AS mean_micro
         |  FROM e),
         |sd AS (SELECT id, v, md5(CAST(id AS VARCHAR)) AS h FROM e),
         |d AS (SELECT v, CAST(u.b AS BIGINT) AS b,
         |    CAST($h12 AS BIGINT) AS seed
         |  FROM sd, unnest(generate_series(1, 40)) AS u(b)),
         |hh AS (SELECT v, b,
         |    (seed * (b * 2 + 1) + b) % 10000 AS hm FROM d),
         |c AS (SELECT v, b, CASE WHEN hm < 3679 THEN 0
         |    WHEN hm < 7358 THEN 1 WHEN hm < 9197 THEN 2
         |    WHEN hm < 9810 THEN 3 ELSE 4 END AS cnt FROM hh),
         |r AS (SELECT b, CAST(sum(cnt * v) AS BIGINT) AS s,
         |    CAST(sum(cnt) AS BIGINT) AS m FROM c GROUP BY 1),
         |rm AS (SELECT b, CAST(s * 1000000 // m AS BIGINT) AS rep_mean
         |  FROM r WHERE m > 0),
         |rk AS (SELECT rep_mean,
         |    row_number() OVER (ORDER BY rep_mean, b) AS rn,
         |    count(*) OVER () AS nr FROM rm),
         |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |    CAST(max(CASE WHEN rn = (nr * 500 + 9999) // 10000
         |      THEN rep_mean END) AS BIGINT) AS ci_lo_micro,
         |    CAST(max(CASE WHEN rn = (nr * 9500 + 9999) // 10000
         |      THEN rep_mean END) AS BIGINT) AS ci_hi_micro FROM rk)
         |SELECT n_rows, mean_micro, n_reps, ci_lo_micro, ci_hi_micro
         |FROM fl CROSS JOIN ci""".stripMargin
    },

    "q_calibration" -> {
      val qs = (1 to 9).map(i =>
        s"min(CASE WHEN cum * 10 >= n * $i THEN s END) AS q$i")
        .mkString(",\n         |    ")
      val ladder = (1 to 9).map(i =>
        s"(CASE WHEN s > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      // exact-rank decile bounds (the q_psi discipline); per-bucket
      // integer sums; micro-unit means by floor division — no floats
      s"""WITH e AS (SELECT (event_type = 'purchase') AS y,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS s FROM events),
         |v AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM e
         |  GROUP BY 1),
         |w AS (SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum,
         |    CAST((SELECT count(*) FROM e) AS BIGINT) AS n FROM v),
         |bnd AS (SELECT $qs
         |  FROM w),
         |b AS (SELECT CAST(1 + $ladder AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(sum(s) AS BIGINT) AS ssum
         |  FROM e CROSS JOIN bnd GROUP BY 1)
         |SELECT bucket, n, n_pos,
         |  CAST(ssum * 1000000 // n AS BIGINT) AS mean_score_micro,
         |  CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_micro
         |FROM b""".stripMargin
    },

    "q_label_centroids" ->
      // centroid carriers are per-label per-dim integer SUMS of
      // once-quantized coordinates (cosine is scale-invariant, so the
      // un-divided sums give the same value); dot/norms exact BIGINT,
      // one sqrt·sqrt division at output (6dp)
      """WITH f AS (SELECT CAST(label AS BIGINT) AS lab,
        |    CAST(u.i AS BIGINT) AS d,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 10000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i)),
        |s AS (SELECT lab, d, CAST(sum(q) AS BIGINT) AS sv
        |  FROM f GROUP BY 1, 2),
        |meta AS (SELECT CAST(label AS BIGINT) AS lab,
        |    CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
        |nm AS (SELECT s.lab, CAST(sum(sv * sv) AS BIGINT) AS norm2
        |  FROM s GROUP BY 1),
        |p AS (SELECT a.lab AS label_a, b.lab AS label_b,
        |    CAST(sum(a.sv * b.sv) AS BIGINT) AS dot
        |  FROM s a JOIN s b ON a.d = b.d AND a.lab < b.lab
        |  GROUP BY 1, 2)
        |SELECT p.label_a, p.label_b, ma.n AS n_a, mb.n AS n_b, p.dot,
        |  round(CAST(p.dot AS DOUBLE) /
        |    (sqrt(CAST(na.norm2 AS DOUBLE)) *
        |      sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
        |FROM p
        |  JOIN nm na ON na.lab = p.label_a
        |  JOIN nm nb ON nb.lab = p.label_b
        |  JOIN meta ma ON ma.lab = p.label_a
        |  JOIN meta mb ON mb.lab = p.label_b""".stripMargin,

    "q_perm_test" -> {
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      val h12 = (2 to 12).foldLeft(hv(1))((acc, i) =>
        s"(16*$acc + ${hv(i)})")
      // md5-seeded binomial relabeling (the q_bootstrap mixing); all
      // compared quantities exact floor-div micro integers; add-one
      // p-value; replicate dropped if either side lands empty (both
      // engines apply the same rule)
      s"""WITH d AS (SELECT event_id AS id,
         |    (event_type = 'purchase') AS isa,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE event_type IN ('purchase', 'view')),
         |sd AS (SELECT isa, v, md5(CAST(id AS VARCHAR)) AS h FROM d),
         |ds AS (SELECT isa, v, CAST($h12 AS BIGINT) AS seed FROM sd),
         |ob AS (SELECT
         |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN isa THEN v ELSE 0 END) AS BIGINT) AS sa,
         |    CAST(sum(CASE WHEN isa THEN 0 ELSE v END) AS BIGINT) AS sb
         |  FROM ds),
         |obs AS (SELECT n_a, n_b,
         |    CAST(sa * 1000000 // n_a - sb * 1000000 // n_b AS BIGINT)
         |      AS diff_obs_micro,
         |    CAST(n_a * 10000 // (n_a + n_b) AS BIGINT) AS pa_bp
         |  FROM ob),
         |fl AS (SELECT ds.v, CAST(u.r AS BIGINT) AS r,
         |    (ds.seed * (CAST(u.r AS BIGINT) * 2 + 1)
         |      + CAST(u.r AS BIGINT)) % 10000 < obs.pa_bp AS toa
         |  FROM ds CROSS JOIN obs, unnest(generate_series(1, 60)) AS u(r)),
         |rd AS (SELECT r,
         |    CAST(sum(CASE WHEN toa THEN 1 ELSE 0 END) AS BIGINT) AS ma,
         |    CAST(sum(CASE WHEN toa THEN 0 ELSE 1 END) AS BIGINT) AS mb,
         |    CAST(sum(CASE WHEN toa THEN v ELSE 0 END) AS BIGINT) AS ra,
         |    CAST(sum(CASE WHEN toa THEN 0 ELSE v END) AS BIGINT) AS rb
         |  FROM fl GROUP BY 1),
         |df2 AS (SELECT
         |    CAST(ra * 1000000 // ma - rb * 1000000 // mb AS BIGINT)
         |      AS diff_r FROM rd WHERE ma > 0 AND mb > 0),
         |tl AS (SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |    CAST(sum(CASE WHEN abs(diff_r) >=
         |      abs((SELECT diff_obs_micro FROM obs)) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_ge FROM df2)
         |SELECT obs.n_a, obs.n_b, obs.diff_obs_micro, tl.n_reps, tl.n_ge,
         |  CAST((1 + tl.n_ge) * 1000000 // (tl.n_reps + 1) AS BIGINT)
         |    AS p_micro
         |FROM obs CROSS JOIN tl""".stripMargin
    },

    "q_trend_test" ->
      // level-cardinality integer carriers; z = T'·√N / √(R(N−R)·W)
      // with the two variance factors meeting only as one double
      // multiply (their BIGINT product overflows at large N)
      """WITH o AS (SELECT CAST(substring(o_orderpriority, 1, 1)
        |      AS BIGINT) AS s,
        |    (o_orderstatus = 'F') AS y FROM orders),
        |g AS (SELECT s, CAST(count(*) AS BIGINT) AS n_i,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS r_i
        |  FROM o GROUP BY 1),
        |a AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(sum(r_i) AS BIGINT) AS n_pos,
        |    CAST(count(*) AS BIGINT) AS n_levels,
        |    CAST(sum(s * n_i) AS BIGINT) AS sn,
        |    CAST(sum(s * s * n_i) AS BIGINT) AS ssn,
        |    CAST(sum(s * r_i) AS BIGINT) AS sr FROM g)
        |SELECT n, n_pos, n_levels,
        |  CAST(n * sr - n_pos * sn AS BIGINT) AS t_num,
        |  round(CASE WHEN n_pos * (n - n_pos) > 0
        |      AND n * ssn - sn * sn > 0
        |    THEN CAST(n * sr - n_pos * sn AS DOUBLE)
        |      * sqrt(CAST(n AS DOUBLE))
        |      / sqrt(CAST(n_pos * (n - n_pos) AS DOUBLE)
        |        * CAST(n * ssn - sn * sn AS DOUBLE))
        |    END, 6) AS z
        |FROM a""".stripMargin,

    "q_mi_ranking" -> {
      // one q_chi_square block per feature (same integer cells /
      // sorted-cell folds / unobserved-cell closed form), features as
      // STRINGS on both engines so the fold's cell sort order is the
      // identical binary string order
      val feats = Seq(
        ("nation", "CAST(CAST(c_nationkey AS BIGINT) AS VARCHAR)"),
        ("region", "CAST(CAST(n_regionkey AS BIGINT) AS VARCHAR)"),
        ("bal_band", "CASE WHEN c_acctbal < 0 THEN 'neg' " +
          "WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END"))
      def block(i: Int, fe: String): String =
        s"""c$i AS (SELECT $fe AS a, c_mktsegment AS b FROM src),
           |cells$i AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
           |  FROM c$i GROUP BY 1, 2),
           |r$i AS (SELECT a, CAST(sum(o) AS BIGINT) AS rr FROM cells$i
           |  GROUP BY 1),
           |ct$i AS (SELECT b, CAST(sum(o) AS BIGINT) AS cc FROM cells$i
           |  GROUP BY 1),
           |t$i AS (SELECT CAST(sum(o) AS BIGINT) AS n,
           |    CAST(count(DISTINCT a) AS BIGINT) AS ra,
           |    CAST(count(DISTINCT b) AS BIGINT) AS cb FROM cells$i),
           |terms$i AS (SELECT cells$i.a, cells$i.b,
           |    CAST(cells$i.o * t$i.n - r$i.rr * ct$i.cc AS DOUBLE)
           |      AS dev,
           |    CAST(t$i.n AS DOUBLE) * CAST(r$i.rr AS DOUBLE)
           |      * CAST(ct$i.cc AS DOUBLE) AS den,
           |    CAST(cells$i.o AS DOUBLE) / CAST(t$i.n AS DOUBLE)
           |      * ln(CAST(cells$i.o * t$i.n AS DOUBLE)
           |            / CAST(r$i.rr * ct$i.cc AS DOUBLE)) AS mi
           |  FROM cells$i JOIN r$i USING (a) JOIN ct$i USING (b)
           |  CROSS JOIN t$i),
           |rc$i AS (SELECT CAST(sum(r$i.rr * ct$i.cc) AS BIGINT) AS src
           |  FROM cells$i JOIN r$i USING (a) JOIN ct$i USING (b)),
           |f$i AS (SELECT
           |    list_reduce(list(dev * dev / den ORDER BY a, b),
           |      (x, y) -> x + y)
           |    + CAST((SELECT t$i.n * t$i.n FROM t$i)
           |        - (SELECT src FROM rc$i) AS DOUBLE)
           |      / CAST((SELECT t$i.n FROM t$i) AS DOUBLE) AS chi2,
           |    list_reduce(list(mi ORDER BY a, b), (x, y) -> x + y)
           |      AS mi2
           |  FROM terms$i)""".stripMargin
      def out(i: Int, name: String): String =
        s"""SELECT '$name' AS feature, t$i.ra AS n_levels,
           |  round(f$i.chi2, 6) AS chi2,
           |  round(CASE WHEN least(t$i.ra - 1, t$i.cb - 1) > 0
           |    THEN sqrt(f$i.chi2 /
           |      CAST(t$i.n * least(t$i.ra - 1, t$i.cb - 1) AS DOUBLE))
           |    END, 6) AS cramers_v,
           |  round(f$i.mi2, 6) AS mi_nats
           |FROM f$i CROSS JOIN t$i""".stripMargin
      val blocks = feats.zipWithIndex
        .map { case ((_, fe), i) => block(i, fe) }.mkString(",\n")
      val outs = feats.zipWithIndex
        .map { case ((name, _), i) => out(i, name) }
        .mkString("\nUNION ALL\n")
      s"""WITH src AS (SELECT * FROM customer JOIN nation
         |  ON c_nationkey = n_nationkey),
         |$blocks
         |$outs""".stripMargin
    },

    "q_uplift" ->
      // md5-derived variant (the q_ab_test assignment); uplift is a
      // difference of exact floor-div micro rates; pooled
      // two-proportion z folds in fixed IEEE op order (6dp)
      """WITH o AS (SELECT o_orderpriority AS seg,
        |    CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
        |      < '8' THEN 'A' ELSE 'B' END AS variant,
        |    (o_orderstatus = 'F') AS converted FROM orders),
        |g AS (SELECT seg AS segment,
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'A' AND converted THEN 1
        |      ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 'B' AND converted THEN 1
        |      ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM o GROUP BY 1)
        |SELECT segment, n_a, conv_a, n_b, conv_b,
        |  CAST(conv_a * 1000000 // n_a - conv_b * 1000000 // n_b
        |    AS BIGINT) AS uplift_micro,
        |  round(CASE WHEN CAST(conv_a + conv_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE)
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
        |      > 0
        |    THEN (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE)
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |          / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 / CAST(n_a AS DOUBLE)
        |          + 1.0 / CAST(n_b AS DOUBLE)))
        |    END, 6) AS z
        |FROM g WHERE n_a > 0 AND n_b > 0""".stripMargin,

    "q_knn_eval" -> {
      // integer-quantized coords → integer d2; neighbor order
      // (d2, nid) ≡ the Spark packed tie-break; vote argmax by
      // (cnt desc, label asc); accuracy in floor-div micro-units
      val d2 = "list_reduce(list_transform(list_zip(a.v, b.v), " +
        "x -> (x[1]-x[2])*(x[1]-x[2])), (p,q) -> p+q)"
      s"""WITH p AS (SELECT CAST(vec_id AS BIGINT) AS id,
         |    CAST(label AS BIGINT) AS lab,
         |    list_transform(embedding, e ->
         |      CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT))
         |      AS v
         |  FROM embeddings),
         |mq AS (SELECT greatest(1, (count(*) * count(*) + 19999999)
         |    // 20000000) AS md FROM p),
         |pa AS (SELECT p.* FROM p CROSS JOIN mq WHERE p.id % mq.md = 0),
         |d AS (SELECT a.id AS qid, a.lab AS qlab, b.id AS nid,
         |    b.lab AS nlab, $d2 AS d2
         |  FROM pa a JOIN p b ON a.id <> b.id),
         |r AS (SELECT qid, qlab, nlab, row_number()
         |    OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM d),
         |v AS (SELECT qid, qlab, nlab, CAST(count(*) AS BIGINT) AS cnt
         |  FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
         |pr AS (SELECT qid, qlab, nlab, row_number()
         |    OVER (PARTITION BY qid ORDER BY cnt DESC, nlab) AS rn2
         |  FROM v)
         |SELECT qlab AS label, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS accuracy_micro
         |FROM pr WHERE rn2 = 1 GROUP BY 1""".stripMargin
    },

    "q_silhouette" -> {
      // Similarity.silhouetteEval mirror: scale-100 integer coords,
      // exact d2 sums, overflow-free split floor division for the
      // micro-unit means, sign-explicit s division (quotient
      // truncation is sign-sensitive across engines)
      val d2 = "list_reduce(list_transform(list_zip(a.v, b.v), " +
        "x -> (x[1]-x[2])*(x[1]-x[2])), (p,q) -> p+q)"
      s"""WITH p AS (SELECT CAST(vec_id AS BIGINT) AS id,
         |    CAST(label AS BIGINT) AS lab,
         |    list_transform(embedding, e ->
         |      CAST(floor(CAST(e AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS v
         |  FROM embeddings),
         |mq AS (SELECT greatest(1, (count(*) * count(*) + 19999999)
         |    // 20000000) AS md FROM p),
         |pa AS (SELECT p.* FROM p CROSS JOIN mq WHERE p.id % mq.md = 0),
         |d AS (SELECT a.id AS qid, a.lab AS qlab, b.lab AS clab,
         |    $d2 AS d2
         |  FROM pa a JOIN p b ON a.id <> b.id),
         |g AS (SELECT qid, qlab, clab, CAST(sum(d2) AS BIGINT) AS sd,
         |    CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2, 3),
         |m AS (SELECT qid, qlab, clab,
         |    (sd // cnt) * 1000000 + ((sd % cnt) * 1000000) // cnt AS mm
         |  FROM g),
         |pp AS (SELECT qid, qlab,
         |    max(CASE WHEN clab = qlab THEN mm END) AS a_micro,
         |    min(CASE WHEN clab <> qlab THEN mm END) AS b_micro
         |  FROM m GROUP BY 1, 2),
         |s AS (SELECT qid, qlab,
         |    CASE WHEN a_micro IS NULL OR b_micro IS NULL
         |        OR greatest(a_micro, b_micro) = 0 THEN 0
         |      WHEN b_micro >= a_micro THEN
         |        ((b_micro - a_micro) * 1000000) //
         |          greatest(a_micro, b_micro)
         |      ELSE -(((a_micro - b_micro) * 1000000) //
         |          greatest(a_micro, b_micro)) END AS s_micro
         |  FROM pp)
         |SELECT qlab AS label, CAST(count(*) AS BIGINT) AS n_pts,
         |  CAST(sum(s_micro) AS BIGINT) AS sum_sil_micro,
         |  CAST(min(s_micro) AS BIGINT) AS min_sil_micro,
         |  CAST(max(s_micro) AS BIGINT) AS max_sil_micro
         |FROM s GROUP BY 1""".stripMargin
    },

    "q_mmr" -> {
      // Similarity.mmrRerank mirror: cosSql relevance (identical op
      // order to the Spark per-vector-norm cosine), pool = top-20 by
      // (rel desc, cid), then the three greedy MMR argmax steps
      // unrolled — score = 5500·rel − 4500·maxsim, ties by smallest
      // cid, maxsim over the selected set via greatest
      val step1Score = "5500 * rel - 4500 * 0.0"
      s"""WITH c AS (SELECT CAST(vec_id AS BIGINT) AS cid,
         |    CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |q AS (SELECT CAST(vec_id AS BIGINT) AS q_id,
         |    CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id % 1000 = 0),
         |sc AS (SELECT q_id, cid, cv, ${cosSql("qv", "cv")} AS rel
         |  FROM c, q WHERE q_id <> cid),
         |pool AS MATERIALIZED (SELECT q_id, cid, cv, rel FROM (
         |  SELECT q_id, cid, cv, rel, row_number() OVER
         |    (PARTITION BY q_id ORDER BY rel DESC, cid) AS rn FROM sc)
         |  WHERE rn <= 20),
         |s1 AS MATERIALIZED (SELECT q_id, cid AS sel_id, cv AS sel_v,
         |    $step1Score AS score FROM (
         |  SELECT q_id, cid, cv, rel, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ($step1Score) DESC, cid) AS rn FROM pool)
         |  WHERE rn = 1),
         |s2 AS MATERIALIZED (SELECT q_id, sel_id, sel_v, score FROM (
         |  SELECT p.q_id, p.cid AS sel_id, p.cv AS sel_v,
         |    5500 * p.rel - 4500 * ${cosSql("p.cv", "s.sel_v")} AS score,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY (5500 * p.rel - 4500 * ${cosSql("p.cv", "s.sel_v")})
         |        DESC, p.cid) AS rn
         |  FROM pool p JOIN s1 s ON s.q_id = p.q_id AND p.cid <> s.sel_id)
         |  WHERE rn = 1),
         |s3 AS (SELECT q_id, sel_id, score FROM (
         |  SELECT p.q_id, p.cid AS sel_id,
         |    5500 * p.rel - 4500 * greatest(
         |      ${cosSql("p.cv", "s1.sel_v")},
         |      ${cosSql("p.cv", "s2.sel_v")}) AS score,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY (5500 * p.rel - 4500 * greatest(
         |        ${cosSql("p.cv", "s1.sel_v")},
         |        ${cosSql("p.cv", "s2.sel_v")})) DESC, p.cid) AS rn
         |  FROM pool p
         |  JOIN s1 ON s1.q_id = p.q_id AND p.cid <> s1.sel_id
         |  JOIN s2 ON s2.q_id = p.q_id AND p.cid <> s2.sel_id)
         |  WHERE rn = 1)
         |SELECT q_id, CAST(1 AS BIGINT) AS pick, sel_id,
         |  round(score / 10000.0, 6) AS score FROM s1
         |UNION ALL SELECT q_id, CAST(2 AS BIGINT), sel_id,
         |  round(score / 10000.0, 6) FROM s2
         |UNION ALL SELECT q_id, CAST(3 AS BIGINT), sel_id,
         |  round(score / 10000.0, 6) FROM s3""".stripMargin
    },

    "q_hits" -> {
      // Graph.hitsFixedPoint mirror: deterministic doc→page edges,
      // then 2 unrolled (auth, hub) rounds — integer sums (order-free),
      // max-renormalization by floor division, zero-filled node frame.
      // MATERIALIZED per round (the q_pagerank_fixed lesson); DuckDB
      // sum(BIGINT) widens to HUGEINT → re-cast each round.
      def round(i: Int, prevHub: String) = {
        s"""a${i}r AS (SELECT e.dst AS id, sum(h.hub) AS s
           |  FROM e JOIN $prevHub h ON h.id = e.src GROUP BY 1),
           |a${i}f AS (SELECT n.id, coalesce(s, 0) AS s
           |  FROM n LEFT JOIN a${i}r USING (id)),
           |a$i AS MATERIALIZED (SELECT id,
           |    CAST(CASE WHEN (SELECT max(s) FROM a${i}f) > 0
           |      THEN (s * 1000000) // (SELECT max(s) FROM a${i}f)
           |      ELSE 0 END AS BIGINT) AS auth FROM a${i}f),
           |h${i}r AS (SELECT e.src AS id, sum(a.auth) AS s
           |  FROM e JOIN a$i a ON a.id = e.dst GROUP BY 1),
           |h${i}f AS (SELECT n.id, coalesce(s, 0) AS s
           |  FROM n LEFT JOIN h${i}r USING (id)),
           |h$i AS MATERIALIZED (SELECT id,
           |    CAST(CASE WHEN (SELECT max(s) FROM h${i}f) > 0
           |      THEN (s * 1000000) // (SELECT max(s) FROM h${i}f)
           |      ELSE 0 END AS BIGINT) AS hub FROM h${i}f)""".stripMargin
      }
      s"""WITH e AS (
         |  SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS src,
         |    'page:' || source || ':' || CAST(doc_id % 8 AS VARCHAR) AS dst
         |  FROM documents
         |  UNION
         |  SELECT 'doc:' || CAST(doc_id AS VARCHAR),
         |    'cdn:' || CAST(doc_id % 5 AS VARCHAR) FROM documents),
         |n AS MATERIALIZED (SELECT src AS id FROM e
         |  UNION SELECT dst FROM e),
         |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub FROM n),
         |${round(1, "h0")},
         |${round(2, "h1")}
         |SELECT h2.id, h2.hub AS hub_fp, a2.auth AS auth_fp
         |FROM h2 JOIN a2 ON a2.id = h2.id""".stripMargin
    },

    "q_page_hinkley" ->
      // TimeSeries.pageHinkley mirror: running mean via the same
      // overflow-free split floor division (all divisions on
      // nonnegative cumsums — truncation direction never in play),
      // m = cumsum of terms, PH = m − running min, alarms over λ
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |w AS (SELECT event_type, us, event_id, c,
        |    count(*) OVER win AS i, sum(c) OVER win AS cum
        |  FROM e WINDOW win AS
        |    (PARTITION BY event_type ORDER BY us, event_id)),
        |t AS (SELECT event_type, us, event_id, i,
        |    c * 1000000 - ((cum // i) * 1000000 + ((cum % i) * 1000000) // i)
        |      - 500000000 AS term FROM w),
        |m AS (SELECT event_type, us, event_id, i,
        |    sum(term) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |      AS mt FROM t),
        |ph AS (SELECT event_type, us, event_id, i,
        |    mt - min(mt) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |      AS ph,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY us DESC, event_id DESC) AS rd
        |  FROM m)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN ph > 20000000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms,
        |  CAST(min(CASE WHEN ph > 20000000000 THEN i END) AS BIGINT)
        |    AS first_alarm_idx,
        |  CAST(max(ph) AS BIGINT) AS max_ph,
        |  CAST(max(CASE WHEN rd = 1 THEN ph END) AS BIGINT) AS final_ph
        |FROM ph GROUP BY 1""".stripMargin,

    "q_good_turing" -> {
      val norm = normOf("text")
      // Corpus.goodTuring mirror: word-3-gram terms (ALL occurrences,
      // not the dedup'd shCte), counts-of-counts spectrum, smoothed
      // r* = (r+1)·N_{r+1}/N_r in floor-div micro-units (null at
      // spectrum gaps), unseen mass p0 = N1/N — all exact integers
      s"""WITH ws AS (SELECT string_split($norm, ' ') AS w
         |  FROM documents),
         |t AS (SELECT w[u.i]||' '||w[u.i+1]||' '||w[u.i+2] AS term
         |  FROM ws, unnest(generate_series(1, len(w) - 2)) AS u(i)),
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM t
         |  GROUP BY 1),
         |sp AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM c
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
         |    CAST(max(CASE WHEN r = 1 THEN n_r END) AS BIGINT) AS n1
         |  FROM sp)
         |SELECT sp.r, sp.n_r,
         |  CAST(((sp.r + 1) * nx.n_r * 1000000) // sp.n_r AS BIGINT)
         |    AS r_star_micro,
         |  CAST(coalesce((SELECT n1 FROM tot), 0) * 1000000
         |    // (SELECT n_tokens FROM tot) AS BIGINT) AS p0_micro
         |FROM sp LEFT JOIN sp nx ON nx.r = sp.r + 1
         |WHERE sp.r <= 8""".stripMargin
    },

    "q_heaps_law" -> {
      val norm = normOf("text")
      // Corpus.heapsLaw mirror: 16 doc-id prefix slices, per-term
      // first bucket, cumulative tokens/vocab (exact integers), and
      // the log-log β fit rounded to 6dp (ln sums over ≤16 points —
      // the q_lm_score rounding rule)
      s"""WITH t AS (SELECT doc_id, string_split($norm, ' ') AS w
         |  FROM documents),
         |bw AS (SELECT min(doc_id) AS mn,
         |    ((max(doc_id) - min(doc_id)) // 16) + 1 AS width
         |  FROM documents),
         |tok AS (SELECT (t.doc_id - bw.mn) // bw.width AS bucket,
         |    w[u.i]||' '||w[u.i+1]||' '||w[u.i+2] AS term
         |  FROM t, bw, unnest(generate_series(1, len(w) - 2)) AS u(i)),
         |bt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM tok GROUP BY 1),
         |nv AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nv FROM (
         |    SELECT term, min(bucket) AS bucket FROM tok GROUP BY 1)
         |  GROUP BY 1),
         |curve AS (SELECT bt.bucket, bt.n_tokens,
         |    CAST(sum(bt.n_tokens) OVER (ORDER BY bt.bucket) AS BIGINT)
         |      AS cum_tokens,
         |    CAST(sum(coalesce(nv.nv, 0)) OVER (ORDER BY bt.bucket)
         |      AS BIGINT) AS cum_vocab
         |  FROM bt LEFT JOIN nv ON nv.bucket = bt.bucket),
         |fit AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |    sum(ln(cum_tokens)) AS sx, sum(ln(cum_vocab)) AS sy,
         |    sum(ln(cum_tokens) * ln(cum_vocab)) AS sxy,
         |    sum(ln(cum_tokens) * ln(cum_tokens)) AS sxx
         |  FROM curve)
         |SELECT c.bucket, c.n_tokens, c.cum_tokens, c.cum_vocab,
         |  round((f.n * f.sxy - f.sx * f.sy) /
         |    (f.n * f.sxx - f.sx * f.sx), 6) AS beta_6
         |FROM curve c, fit f""".stripMargin
    },

    "q_ewma_chart" ->
      // TimeSeries.ewmaChart mirror: the q_control_chart daily/stats
      // CTEs, then the quantized z-recurrence replayed by PREFIX
      // slice-folds (the q_kaplan_meier idiom) — z_i over xl[1:i]
      // with a scalar lambda that reads the accumulator exactly ONCE.
      // (A single struct-building fold that recomputes z inside a
      // second field reads the MUTATED accumulator in DuckDB —
      // its list_reduce updates acc fields in place — so the breach
      // test must live OUTSIDE the lambda.) The synthetic list head
      // carries z₀ = center·10⁶.
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d')
        |    AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT k, day, x,
        |    abs(x - lag(x) OVER (PARTITION BY k ORDER BY day)) AS mr
        |  FROM d),
        |s AS (SELECT k, count(*) AS n_days,
        |    CAST(sum(x) // count(*) AS BIGINT) AS center_cents,
        |    CASE WHEN count(*) > 1 THEN
        |      CAST(sum(mr) * 1000 // (count(*) - 1) AS BIGINT)
        |    END AS mrbar_milli
        |  FROM m GROUP BY 1),
        |f AS (SELECT d.k, s.n_days, s.center_cents, s.mrbar_milli,
        |    [s.center_cents * 1000000] ||
        |      list(d.x * 1000000 ORDER BY d.day) AS xl
        |  FROM d JOIN s ON d.k = s.k
        |  GROUP BY d.k, s.n_days, s.center_cents, s.mrbar_milli),
        |p AS (SELECT k, n_days, center_cents, mrbar_milli, t.i,
        |    len(xl) AS nl,
        |    list_reduce(xl[1:t.i], (a, e) -> (e + 4 * a) // 5) AS z
        |  FROM f, unnest(generate_series(2, len(xl))) AS t(i))
        |SELECT k AS event_type, max(n_days) AS n_days,
        |  max(center_cents) AS center_cents,
        |  max(mrbar_milli) AS mrbar_milli,
        |  CAST(arg_max(z, i) AS BIGINT) AS ewma_micro,
        |  CAST(sum(CASE WHEN mrbar_milli IS NOT NULL
        |    AND abs(z - center_cents * 1000000) * 1128
        |      > mrbar_milli * 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches
        |FROM p GROUP BY 1""".stripMargin,

    "q_nelson_aalen" ->
      // TimeSeries.nelsonAalen mirror: the q_kaplan_meier at-risk
      // CTEs, then the cumulative SUM of floor micro increments —
      // hash-exact integers end to end (no 6dp product chain)
      """WITH u AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd,
        |    max(CAST(o_orderdate AS DATE)) AS ld FROM orders GROUP BY 1),
        |cut AS (SELECT max(CAST(o_orderdate AS DATE)) AS cd FROM orders),
        |subj AS (SELECT CAST(ld - fd AS BIGINT) // 7 AS dur,
        |    (cd - ld) > 365 AS ev FROM u CROSS JOIN cut),
        |byt AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM byt),
        |ar AS (SELECT t,
        |    CAST((SELECT n FROM tot) - sum(c) OVER (ORDER BY t) + c
        |      AS BIGINT) AS n_risk, d FROM byt)
        |SELECT t, n_risk, d,
        |  CAST(sum(d * 1000000 // n_risk) OVER (ORDER BY t) AS BIGINT)
        |    AS h_micro
        |FROM ar WHERE d >= 1""".stripMargin,

    "q_ndcg" -> {
      val norm = normOf("text")
      val k1p1 = (1.2 + 1.0).toString
      // Corpus.ndcgAtK mirror: the q_rag_context quantized-BM25 CTEs
      // per (term, doc), rankings under the total (s4 desc, doc_id) /
      // (tf desc, doc_id) orders, and the driver-computed micro
      // discount weights injected as SHARED literals — DCG/IDCG are
      // exact integer dot products, NDCG one floor division
      val raw =
        s"""ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
           |      (CAST(df AS DOUBLE) + 0.5))
           |    * (CAST(tf AS DOUBLE) * $k1p1) /
           |    (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
           |      0.75 * CAST(dl AS DOUBLE) /
           |        (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))""".stripMargin
      val wt = graft.operators.Corpus.ndcgWeights(10).zipWithIndex
        .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split($norm, ' ') AS w
         |  FROM documents),
         |dt AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM t),
         |g AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |  FROM dt GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM g GROUP BY 1),
         |s AS (SELECT count(*) AS n_docs,
         |  CAST(sum(len(w)) AS BIGINT) AS tot_len FROM t),
         |b AS (SELECT term, doc_id, tf,
         |    CAST(floor(($raw) * 10000 + 0.5) AS BIGINT) AS s4
         |  FROM g JOIN dfreq USING(term) CROSS JOIN s
         |  WHERE term IN ('stream', 'join', 'vector')),
         |wt(rn, w) AS (VALUES $wt),
         |rk AS (SELECT term, tf,
         |    row_number() OVER (PARTITION BY term
         |      ORDER BY s4 DESC, doc_id) AS rn FROM b),
         |ik AS (SELECT term, tf,
         |    row_number() OVER (PARTITION BY term
         |      ORDER BY tf DESC, doc_id) AS rn FROM b),
         |dcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS dcg_micro
         |  FROM rk JOIN wt USING (rn) GROUP BY 1),
         |idcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS idcg_micro
         |  FROM ik JOIN wt USING (rn) GROUP BY 1)
         |SELECT term, dcg_micro, idcg_micro,
         |  CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT) AS ndcg_micro
         |FROM dcg JOIN idcg USING (term)""".stripMargin
    },

    "q_kneser_ney" -> {
      val norm = normOf("text")
      // Corpus.kneserNeyScore mirror: bigram/context/continuation
      // counts as exact integers, each P(v|u) one BIGINT-rational
      // division + ln, per-doc fold in position order (list_reduce —
      // the q_lm_score idiom), 6dp
      s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws
         |  FROM documents),
         |big AS (SELECT doc_id, u.i AS pos, ws[u.i] AS a, ws[u.i+1] AS b
         |  FROM w, unnest(generate_series(1, len(ws) - 1)) u(i)),
         |c2 AS (SELECT a, b, count(*) AS c2 FROM big GROUP BY 1, 2),
         |cu AS (SELECT a, count(*) AS cu FROM big GROUP BY 1),
         |fwd AS (SELECT a, count(*) AS fwd FROM c2 GROUP BY 1),
         |back AS (SELECT b, count(*) AS back FROM c2 GROUP BY 1),
         |bt AS (SELECT count(*) AS bt FROM c2),
         |sc AS (SELECT big.doc_id, big.pos,
         |    ln(CAST(bt.bt * (4 * c2.c2 - 3)
         |        + 3 * fwd.fwd * back.back AS DOUBLE) /
         |      CAST(4 * cu.cu * bt.bt AS DOUBLE)) AS lnp
         |  FROM big JOIN c2 USING (a, b) JOIN cu USING (a)
         |  JOIN fwd USING (a) JOIN back USING (b) CROSS JOIN bt)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(list_reduce(list(lnp ORDER BY pos), (p, q) -> p + q)
         |    / CAST(count(*) AS DOUBLE), 6) AS kn_avg_lnp
         |FROM sc GROUP BY doc_id""".stripMargin
    },

    "q_script_mix" -> {
      // SparkEntry.qScriptMix mirror: the per-script counts strip the
      // class complement with the IDENTICAL \x{...}-range pattern the
      // Spark side uses (generated from the same ScriptClasses
      // constant — one source of truth for both engines)
      val cls = graft.functions.TextFunctions.ScriptClasses
        .map { case (n, c) =>
          s"length(regexp_replace(text, '[^$c]', '', 'g')) AS c_$n"
        }.mkString(",\n    ")
      s"""WITH per AS (SELECT lang, length(text) AS n_chars,
         |    $cls
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(c_latin) AS BIGINT) AS n_latin,
         |  CAST(sum(c_digit) AS BIGINT) AS n_digit,
         |  CAST(sum(c_cyrillic + c_greek + c_arabic + c_cjk) AS BIGINT)
         |    AS n_nonlatin_script,
         |  CAST(sum(CASE WHEN c_latin > 0
         |    AND c_cyrillic + c_greek + c_arabic + c_cjk > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
         |  CASE WHEN sum(n_chars) > 0 THEN
         |    CAST(sum(c_latin) * 1000000 // sum(n_chars) AS BIGINT)
         |  END AS latin_micro
         |FROM per GROUP BY 1""".stripMargin
    },

    "q_kendall_tau" ->
      // Stats.kendallTauB mirror: exact integer S and tie counts off
      // the i<j day-pair join; tau-b = one product+sqrt+division in
      // fixed IEEE op order (6dp), null when a metric is constant
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sx,
        |    CAST(sign(b.y - a.y) AS BIGINT) AS sy
        |  FROM d a JOIN d b ON a.day < b.day),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |s AS (SELECT CAST(sum(sx * sy) AS BIGINT) AS s_stat,
        |    CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_x,
        |    CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y FROM p)
        |SELECT n.n, s.s_stat, s.ties_x, s.ties_y,
        |  CASE WHEN (n.n * (n.n - 1) // 2 - s.ties_x) = 0
        |      OR (n.n * (n.n - 1) // 2 - s.ties_y) = 0 THEN NULL
        |    ELSE round(s.s_stat / sqrt(
        |      CAST(n.n * (n.n - 1) // 2 - s.ties_x AS DOUBLE) *
        |      CAST(n.n * (n.n - 1) // 2 - s.ties_y AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM s CROSS JOIN n""".stripMargin,

    "q_seasonal_decompose" ->
      // TimeSeries.classicalDecompose mirror: centered 7-MA trend in
      // split floor-div micro-units (full windows only), per-phase
      // seasonal mean with the sign factored out of the division,
      // residual a subtraction — all exact integers
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, cents,
        |    row_number() OVER win AS rn,
        |    count(*) OVER winr AS cnt,
        |    CAST(sum(cents) OVER winr AS BIGINT) AS s
        |  FROM d WINDOW
        |    win AS (PARTITION BY event_type ORDER BY day),
        |    winr AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t AS (SELECT event_type, day, cents, rn,
        |    CASE WHEN cnt = 7 THEN
        |      (s // 7) * 1000000 + ((s % 7) * 1000000) // 7 END
        |      AS trend_micro
        |  FROM w),
        |dt AS (SELECT event_type, day, cents, trend_micro,
        |    (rn - 1) % 7 AS phase,
        |    cents * 1000000 - trend_micro AS detr FROM t),
        |se AS (SELECT event_type, phase,
        |    CASE WHEN sum(detr) >= 0 THEN
        |        CAST(sum(detr) AS BIGINT) // count(*)
        |      ELSE -(CAST(-sum(detr) AS BIGINT) // count(*)) END
        |      AS seasonal_micro
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2)
        |SELECT dt.event_type, dt.day, dt.cents,
        |  CAST(dt.trend_micro AS BIGINT) AS trend_micro,
        |  CAST(se.seasonal_micro AS BIGINT) AS seasonal_micro,
        |  CAST(dt.detr - se.seasonal_micro AS BIGINT) AS resid_micro
        |FROM dt LEFT JOIN se
        |  ON se.event_type = dt.event_type AND se.phase = dt.phase""".stripMargin,

    "q_rag_context" -> {
      val norm = normOf("text")
      val k1p1 = (1.2 + 1.0).toString
      // raw BM25 (no round) quantized by floor(x·10⁴+0.5) on BOTH
      // sides, summed as integers (order-free — raw ln-sum would fold
      // in partition order), top-100 then budget cumsum
      val raw =
        s"""ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
           |      (CAST(df AS DOUBLE) + 0.5))
           |    * (CAST(tf AS DOUBLE) * $k1p1) /
           |    (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
           |      0.75 * CAST(dl AS DOUBLE) /
           |        (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))""".stripMargin
      s"""WITH t AS (SELECT doc_id, string_split($norm, ' ') AS w
         |  FROM documents),
         |dt AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM t),
         |g AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |  FROM dt GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM g GROUP BY 1),
         |s AS (SELECT count(*) AS n_docs,
         |  CAST(sum(len(w)) AS BIGINT) AS tot_len FROM t),
         |b AS (SELECT doc_id,
         |    CAST(floor(($raw) * 10000 + 0.5) AS BIGINT) AS s4
         |  FROM g JOIN dfreq USING(term) CROSS JOIN s
         |  WHERE term IN ('stream', 'join', 'vector')),
         |sc AS (SELECT doc_id, CAST(sum(s4) AS BIGINT) AS score_4
         |  FROM b GROUP BY 1),
         |top AS (SELECT doc_id, score_4 FROM sc
         |  ORDER BY score_4 DESC, doc_id LIMIT 100),
         |tk AS (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |      AS n_tokens FROM documents),
         |r AS (SELECT
         |    row_number() OVER (ORDER BY score_4 DESC, t.doc_id)
         |      AS "rank",
         |    t.doc_id, score_4, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY score_4 DESC, t.doc_id)
         |      AS BIGINT) AS cum_tokens
         |  FROM top t JOIN tk USING (doc_id))
         |SELECT "rank", doc_id, score_4, n_tokens, cum_tokens
         |FROM r WHERE cum_tokens <= 2000""".stripMargin
    },

    "q_partial_corr" -> {
      // Stats.partialCorrelation mirror: HUGEINT moments (≡ Spark
      // DECIMAL(38,0)), each pairwise r = exact-cov cast-to-double /
      // sqrt(product of exact vars), partial via the Yule recursion in
      // the same fixed op order, 6dp
      def cov(sab: String, a: String, b: String) =
        s"(n * $sab - s$a * s$b)"
      def rr(sab: String, a: String, b: String) =
        s"""(CAST(${cov(sab, a, b)} AS DOUBLE) /
           |    sqrt(CAST(${cov(s"s$a$a", a, a)} AS DOUBLE) *
           |         CAST(${cov(s"s$b$b", b, b)} AS DOUBLE)))""".stripMargin
      val (rxy, rxz, ryz) = (rr("sxy", "x", "y"), rr("sxz", "x", "z"),
        rr("syz", "y", "z"))
      s"""WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS y,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS z
         |  FROM events GROUP BY 1),
         |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(z) AS HUGEINT) AS sz,
         |    CAST(sum(x * x) AS HUGEINT) AS sxx,
         |    CAST(sum(y * y) AS HUGEINT) AS syy,
         |    CAST(sum(z * z) AS HUGEINT) AS szz,
         |    CAST(sum(x * y) AS HUGEINT) AS sxy,
         |    CAST(sum(x * z) AS HUGEINT) AS sxz,
         |    CAST(sum(y * z) AS HUGEINT) AS syz
         |  FROM d)
         |SELECT CAST(n AS BIGINT) AS n,
         |  round(CASE WHEN ${cov("sxx", "x", "x")} > 0
         |    AND ${cov("syy", "y", "y")} > 0 THEN $rxy END, 6) AS r_xy,
         |  round(CASE WHEN ${cov("sxx", "x", "x")} > 0
         |    AND ${cov("szz", "z", "z")} > 0 THEN $rxz END, 6) AS r_xz,
         |  round(CASE WHEN ${cov("syy", "y", "y")} > 0
         |    AND ${cov("szz", "z", "z")} > 0 THEN $ryz END, 6) AS r_yz,
         |  round(CASE WHEN abs($rxz) < 1.0 AND abs($ryz) < 1.0 THEN
         |    ($rxy - $rxz * $ryz) /
         |      sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz)) END, 6)
         |    AS r_xy_z
         |FROM m""".stripMargin
    },

    "q_spearman" ->
      // Stats.spearman mirror: doubled tie-averaged ranks
      // (2·rank + cnt − 1, exact integers), then the exact-moment
      // Pearson fold on HUGEINT carriers, one cast-to-double
      // product/sqrt/division (6dp)
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT
        |    CAST(rank() OVER (ORDER BY x) * 2
        |      + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
        |    CAST(rank() OVER (ORDER BY y) * 2
        |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
        |  FROM d),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(rx) AS HUGEINT) AS sx,
        |    CAST(sum(ry) AS HUGEINT) AS sy,
        |    CAST(sum(rx * rx) AS HUGEINT) AS sxx,
        |    CAST(sum(ry * ry) AS HUGEINT) AS syy,
        |    CAST(sum(rx * ry) AS HUGEINT) AS sxy FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN (n * sxx - sx * sx) > 0
        |      AND (n * syy - sy * sy) > 0 THEN
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS rho
        |FROM m""".stripMargin,

    "q_quality_classifier" -> {
      val norm = normOf("text")
      // bucket = two md5 hex digits mod 64 (the q_feature_hash trick);
      // weight = first 6 hex digits of md5('w'||bucket) mod 2001 −
      // 1000, exact milli-units, so z = Σ tf·w is pure integer; the
      // only float path is one division + sigmoid (6dp); keep is the
      // exact integer test z ≥ 0
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
      val w6 = s"(16*(16*(16*(16*(16*${hv(1)} + ${hv(2)}) + ${hv(3)}) + " +
        s"${hv(4)}) + ${hv(5)}) + ${hv(6)})"
      s"""WITH t AS (SELECT doc_id,
         |    unnest(string_split($norm, ' ')) AS term FROM documents),
         |x AS (SELECT doc_id, md5(term) AS h FROM t),
         |tf AS (SELECT doc_id,
         |    CAST((16 * ${hv(7)} + ${hv(8)}) % 64 AS BIGINT) AS bucket,
         |    count(*) AS tf
         |  FROM x GROUP BY 1, 2),
         |w AS (SELECT bucket, $w6 % 2001 - 1000 AS w FROM
         |  (SELECT bucket, md5('w' || CAST(bucket AS VARCHAR)) AS h
         |   FROM (SELECT DISTINCT bucket FROM tf) b) y),
         |z AS (SELECT doc_id, sum(tf) AS n_tokens,
         |    sum(tf * w.w) AS z_milli
         |  FROM tf JOIN w USING (bucket) GROUP BY 1)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(z_milli AS BIGINT) AS z_milli,
         |  round(1.0 / (1.0 + exp(-(CAST(z_milli AS DOUBLE) /
         |    (CAST(n_tokens AS DOUBLE) * 1000.0)))), 6) AS score,
         |  z_milli >= 0 AS keep
         |FROM z""".stripMargin
    },

    "q_rr3" ->
      // RR3 disclosure control: the 2/3-1/3 coin is the first-8-hex
      // md5 integer (positional digit sum — no conv() in DuckDB 1.0)
      // of the quasi key, mod 3; all count arithmetic exact integers
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      (strpos('0123456789abcdef',
        |         substr(md5(c_mktsegment || '|' ||
        |           CAST(c_nationkey AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |      * 2.0 ** (4 * (8 - i)))) AS BIGINT) AS h
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_mktsegment, c_nationkey,
        |  CASE WHEN n < 6 THEN NULL
        |       WHEN n % 3 = 0 THEN n
        |       WHEN h % 3 < 2 THEN
        |         (CASE WHEN n % 3 = 1 THEN n - 1 ELSE n + 1 END)
        |       ELSE (CASE WHEN n % 3 = 1 THEN n + 2 ELSE n - 2 END)
        |  END AS n_rr3
        |FROM g""".stripMargin,

    "q_conformal" ->
      // split-conformal: md5-parity split, per-type floor mean on the
      // train half, exact rank-⌈0.9(n+1)⌉ |residual| on the cal half
      """WITH e AS (
        |  SELECT event_type AS g, event_id AS id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    (CAST(list_sum(list_transform(range(1, 9), i ->
        |      (strpos('0123456789abcdef',
        |         substr(md5(CAST(event_id AS VARCHAR)),
        |           CAST(i AS INT), 1)) - 1)
        |      * 2.0 ** (4 * (8 - i)))) AS BIGINT) % 2 = 0) AS tr
        |  FROM events),
        |f AS (SELECT g, count(*) AS n_train,
        |    CAST(sum(cents) // count(*) AS BIGINT) AS yhat_cents
        |  FROM e WHERE tr GROUP BY 1),
        |c AS (SELECT e.g, e.id, abs(e.cents - f.yhat_cents) AS res,
        |    f.n_train, f.yhat_cents
        |  FROM e JOIN f ON e.g = f.g WHERE NOT e.tr),
        |r AS (SELECT g, n_train, yhat_cents, res,
        |    row_number() OVER (PARTITION BY g ORDER BY res, id) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n_cal
        |  FROM c)
        |SELECT g AS event_type, n_train, CAST(n_cal AS BIGINT) AS n_cal,
        |  yhat_cents, res AS q_cents
        |FROM r
        |WHERE rn = least((9000 * (n_cal + 1) + 9999) // 10000, n_cal)""".stripMargin,

    "q_attribution_decay" ->
      // q_attribution_linear's journey/segment frame plus integer
      // half-life weights 2^(20−k) (bit shifts, never pow()); credit
      // in HUGEINT micro-units so cents·10⁶·w never wraps BIGINT
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sg,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS conv_us
        |  FROM events),
        |t AS (SELECT user_id AS u, sg, event_type AS channel,
        |    count(*) AS n_ch,
        |    sum(CAST(1 AS BIGINT) <<
        |      CAST(20 - least((conv_us - us) // 86400000000, 20) AS INT))
        |      AS w_ch
        |  FROM x WHERE event_type <> 'purchase' AND conv_us IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |st AS (SELECT u, sg, sum(w_ch) AS w_tot FROM t GROUP BY 1, 2),
        |c AS (SELECT user_id AS u, sg, cents FROM x
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT c.u, c.sg, c.cents, st.w_tot
        |  FROM c LEFT JOIN st ON c.u = st.u AND c.sg = st.sg),
        |cr AS (
        |  SELECT t.channel, t.n_ch,
        |    (CAST(j.cents AS HUGEINT) * 1000000 * t.w_ch) // j.w_tot
        |      AS micro
        |  FROM j JOIN t ON j.u = t.u AND j.sg = t.sg
        |  WHERE j.w_tot IS NOT NULL
        |  UNION ALL
        |  SELECT 'none', 0, CAST(cents AS HUGEINT) * 1000000 FROM j
        |  WHERE w_tot IS NULL)
        |SELECT channel, CAST(sum(n_ch) AS BIGINT) AS n_touches,
        |  count(*) AS n_journeys,
        |  CAST(sum(micro) // 1000000 AS BIGINT) AS credited_cents
        |FROM cr GROUP BY 1""".stripMargin,

    "q_hard_negatives" ->
      // q_knn_eval's quantized-d2 frame restricted to cross-label
      // pairs, keeping the per-neighbor rows instead of the vote
      """WITH p AS (SELECT CAST(vec_id AS BIGINT) AS id,
        |    CAST(label AS BIGINT) AS lab,
        |    list_transform(embedding, e ->
        |      CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT))
        |      AS v
        |  FROM embeddings),
        |mq AS (SELECT greatest(1, (count(*) * count(*) + 19999999)
        |    // 20000000) AS md FROM p),
        |pa AS (SELECT p.* FROM p CROSS JOIN mq WHERE p.id % mq.md = 0),
        |d AS (SELECT a.id AS qid, a.lab AS qlab, b.id AS nid,
        |    list_reduce(list_transform(list_zip(a.v, b.v),
        |      x -> (x[1]-x[2])*(x[1]-x[2])), (p,q) -> p+q) AS d2
        |  FROM pa a JOIN p b
        |    ON a.id <> b.id AND a.lab <> b.lab),
        |r AS (SELECT qid, qlab, nid, d2, row_number()
        |    OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM d)
        |SELECT qid AS vec_id, qlab AS label, CAST(rn AS BIGINT) AS rank,
        |  nid AS neg_id, CAST(d2 AS BIGINT) AS neg_d2
        |FROM r WHERE rn <= 3""".stripMargin,

    "q_textrank" -> {
      // adjacent-word co-occurrence graph, then the q_pagerank_fixed
      // integer rounds verbatim (word keys — no id indirection needed
      // in SQL); MATERIALIZED per round against exponential inlining
      val rounds = 5
      val scale = "1000000000000"
      val base = s"((15 * $scale) // (100 * (SELECT n FROM nn)))"
      val iters = (1 to rounds).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT nd.id, CAST($base
           |      + (85 * coalesce(s.inflow, 0)) // 100 AS BIGINT) AS rk
           |  FROM nodes nd LEFT JOIN (
           |    SELECT p.wb AS id, sum(r.rk // d.deg) AS inflow
           |    FROM pairs p
           |    JOIN r${i - 1} r ON r.id = p.wa
           |    JOIN outdeg d ON d.src = p.wa
           |    GROUP BY 1) s ON s.id = nd.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |pos AS (
         |  SELECT doc_id, unnest(w) AS word,
         |    unnest(range(1, len(w) + 1)) AS p
         |  FROM toks),
         |adj0 AS (
         |  SELECT a.word AS wa, b.word AS wb
         |  FROM pos a JOIN pos b
         |    ON a.doc_id = b.doc_id AND b.p = a.p + 1
         |  WHERE a.word <> b.word AND a.word <> '' AND b.word <> ''),
         |pairs AS MATERIALIZED (
         |  SELECT wa, wb FROM adj0 UNION SELECT wb, wa FROM adj0),
         |nodes AS MATERIALIZED (SELECT DISTINCT wa AS id FROM pairs),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |outdeg AS MATERIALIZED (
         |  SELECT wa AS src, count(*) AS deg FROM pairs GROUP BY 1),
         |r0 AS MATERIALIZED (
         |  SELECT id, CAST($scale // (SELECT n FROM nn) AS BIGINT) AS rk
         |  FROM nodes),
         |$iters
         |SELECT id AS word, rk AS rank_fp FROM r$rounds
         |ORDER BY rk DESC, id LIMIT 30""".stripMargin
    },

    "q_brier" -> {
      val qs = (1 to 9).map(i =>
        s"min(CASE WHEN cum * 10 >= n * $i THEN s END) AS q$i")
        .mkString(",\n         |    ")
      val ladder = (1 to 9).map(i =>
        s"(CASE WHEN s > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      // q_calibration's exact-rank deciles fitted on the md5-even
      // half; out-of-sample Murphy decomposition in floor micro/pico
      // units (HUGEINT sums; resolution expanded around the floored
      // base rate exactly as the Spark side)
      s"""WITH e AS (SELECT (event_type = 'purchase') AS y,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
         |    (CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef',
         |         substr(md5(CAST(event_id AS VARCHAR)),
         |           CAST(i AS INT), 1)) - 1)
         |      * 2.0 ** (4 * (8 - i)))) AS BIGINT) % 2 = 0) AS tr
         |  FROM events),
         |v AS (SELECT s, count(*) AS c FROM e WHERE tr GROUP BY 1),
         |w AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum,
         |    (SELECT count(*) FROM e WHERE tr) AS n FROM v),
         |bnd AS (SELECT $qs
         |  FROM w),
         |f AS (SELECT CAST(1 + $ladder AS BIGINT) AS bucket,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000000
         |      // count(*) AS BIGINT) AS f_micro
         |  FROM e CROSS JOIN bnd WHERE tr GROUP BY 1),
         |b AS (SELECT CAST(1 + $ladder AS BIGINT) AS bucket,
         |    count(*) AS n_k,
         |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos_k
         |  FROM e CROSS JOIN bnd WHERE NOT tr GROUP BY 1),
         |k AS (SELECT b.n_k, b.pos_k, f.f_micro,
         |    CAST(b.pos_k * 1000000 // b.n_k AS BIGINT) AS o_micro
         |  FROM b JOIN f ON b.bucket = f.bucket),
         |t AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
         |    CAST(sum(pos_k) AS BIGINT) AS pos,
         |    sum(CAST(n_k AS HUGEINT) * (f_micro - o_micro)
         |      * (f_micro - o_micro)) AS relnum,
         |    sum(CAST(n_k AS HUGEINT) * o_micro) AS osum,
         |    sum(CAST(n_k AS HUGEINT) * o_micro * o_micro) AS osq
         |  FROM k),
         |u AS (SELECT *, CAST(pos * 1000000 // n AS BIGINT)
         |    AS o_bar_micro FROM t)
         |SELECT n, o_bar_micro,
         |  o_bar_micro * (1000000 - o_bar_micro) AS uncertainty_pico,
         |  CAST(relnum // n AS BIGINT) AS reliability_pico,
         |  CAST((osq - 2 * o_bar_micro * osum
         |    + CAST(n AS HUGEINT) * o_bar_micro * o_bar_micro) // n
         |    AS BIGINT) AS resolution_pico
         |FROM u""".stripMargin
    },

    "q_kappa" ->
      // the q_lang_id prediction CASE vs the lang column; kappa on the
      // common N² denominator — one division of exact integers
      s"""WITH w AS (SELECT lang,
         |    string_split(${normOf("text")}, ' ') AS w FROM documents),
         |sc AS (SELECT lang,
         |    ${langScoreSql("w", enW)} AS s_en,
         |    ${langScoreSql("w", esW)} AS s_es,
         |    ${langScoreSql("w", deW)} AS s_de,
         |    ${langScoreSql("w", frW)} AS s_fr
         |  FROM w),
         |p AS (SELECT lang AS b,
         |    CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |         WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |         WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS a
         |  FROM sc),
         |cells AS (SELECT a, b, count(*) AS n_ab FROM p GROUP BY 1, 2),
         |n AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cells),
         |ag AS (SELECT CAST(coalesce(sum(n_ab), 0) AS BIGINT) AS n_agree
         |  FROM cells WHERE a = b),
         |rm AS (SELECT a, sum(n_ab) AS ra FROM cells GROUP BY 1),
         |cm AS (SELECT b, sum(n_ab) AS cb FROM cells GROUP BY 1),
         |pe AS (SELECT coalesce(sum(CAST(ra AS HUGEINT) * cb), 0)
         |    AS pe_num
         |  FROM rm JOIN cm ON rm.a = cm.b)
         |SELECT n.n, ag.n_agree,
         |  CASE WHEN CAST(n.n AS HUGEINT) * n.n - pe.pe_num <> 0 THEN
         |    CAST(CAST(ag.n_agree AS HUGEINT) * n.n - pe.pe_num
         |      AS DOUBLE) /
         |    CAST(CAST(n.n AS HUGEINT) * n.n - pe.pe_num AS DOUBLE)
         |  END AS kappa
         |FROM n, ag, pe""".stripMargin,

    "q_tukey_fences" ->
      // exact-rank quartiles per group (the discreteQuantiles rule:
      // cum·10⁴ ≥ p·n), then the DOUBLED integer fence tests
      """WITH e AS (SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        |c AS (SELECT g, v, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n FROM c),
        |q AS (SELECT g,
        |    min(CASE WHEN cum * 10000 >= n * 2500 THEN v END) AS q1,
        |    min(CASE WHEN cum * 10000 >= n * 7500 THEN v END) AS q3
        |  FROM w GROUP BY 1)
        |SELECT e.g AS event_type, count(*) AS n,
        |  max(q.q1) AS q1, max(q.q3) AS q3,
        |  CAST(sum(CASE WHEN e.v * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN e.v * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM e JOIN q ON e.g = q.g GROUP BY 1""".stripMargin,

    "q_control_chart" ->
      // daily cent sums, floor-mean center, floor milli-cent MR-bar,
      // breach test cross-multiplied to stay integral
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d')
        |    AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT k, day, x,
        |    abs(x - lag(x) OVER (PARTITION BY k ORDER BY day)) AS mr
        |  FROM d),
        |s AS (SELECT k, count(*) AS n_days,
        |    CAST(sum(x) // count(*) AS BIGINT) AS center_cents,
        |    CASE WHEN count(*) > 1 THEN
        |      CAST(sum(mr) * 1000 // (count(*) - 1) AS BIGINT)
        |    END AS mrbar_milli
        |  FROM m GROUP BY 1)
        |SELECT d.k AS event_type, max(s.n_days) AS n_days,
        |  max(s.center_cents) AS center_cents,
        |  max(s.mrbar_milli) AS mrbar_milli,
        |  CAST(sum(CASE WHEN abs(d.x - s.center_cents) * 1000000 >
        |    s.mrbar_milli * 2660 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations
        |FROM d JOIN s ON d.k = s.k GROUP BY 1""".stripMargin,

    "q_cross_source_dup" ->
      // distinct (fingerprint, source) pairs, fp-equi self-join on
      // ordered source pairs, floor micro shares of exact counts
      s"""WITH c AS (
         |  SELECT text, source FROM documents
         |  UNION ALL SELECT text, 'mirror' FROM documents
         |  WHERE doc_id % 7 = 0),
         |f AS (SELECT DISTINCT md5(${normOf("text")}) AS fp,
         |    source AS src FROM c),
         |cnt AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM f
         |  GROUP BY 1),
         |sh AS (SELECT a.src AS source_a, b.src AS source_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM f a JOIN f b ON a.fp = b.fp AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, ca.n AS n_a, cb.n AS n_b, n_shared,
         |  CAST(n_shared * 1000000 // ca.n AS BIGINT) AS share_a_micro,
         |  CAST(n_shared * 1000000 // cb.n AS BIGINT) AS share_b_micro
         |FROM sh
         |JOIN cnt ca ON ca.src = source_a
         |JOIN cnt cb ON cb.src = source_b""".stripMargin,

    "q_g_test" ->
      // Stats.gTest mirror: exact cells/margins, per-cell term
      // O·ln((O·N)/(R·C)) — one IEEE division of exact integer
      // products, one ln — folded in (row, col) cell order, ×2, 6dp
      """WITH c AS (SELECT CAST(o_orderstatus AS VARCHAR) AS a,
        |    CAST(o_orderpriority AS VARCHAR) AS b FROM orders
        |  WHERE o_orderstatus IS NOT NULL
        |    AND o_orderpriority IS NOT NULL),
        |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
        |  FROM c GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS rr FROM cells
        |  GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cc FROM cells
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ra,
        |    CAST(count(DISTINCT b) AS BIGINT) AS cb FROM cells),
        |terms AS (SELECT cells.a, cells.b,
        |    CAST(cells.o AS DOUBLE)
        |      * ln(CAST(CAST(cells.o AS HUGEINT) * t.n AS DOUBLE)
        |          / CAST(CAST(r.rr AS HUGEINT) * ct.cc AS DOUBLE)) AS g
        |  FROM cells JOIN r USING (a) JOIN ct USING (b) CROSS JOIN t)
        |SELECT t.n, t.ra AS n_rows, t.cb AS n_cols,
        |  (t.ra - 1) * (t.cb - 1) AS dof,
        |  CASE WHEN t.ra >= 2 AND t.cb >= 2 THEN
        |    round((SELECT list_reduce(list(g ORDER BY a, b),
        |      (x, y) -> x + y) FROM terms) * 2, 6) END AS g_6
        |FROM t""".stripMargin,

    "q_levene" ->
      // Stats.levene mirror: n-scaled deviations u = |n·x − S| exact
      // HUGEINT (≡ decimal(38,0)); SSW/z̄/SSB folded in group order
      // with the IDENTICAL per-term IEEE trees; W one division, 6dp
      """WITH d AS (SELECT CAST(o_orderpriority AS VARCHAR) AS g,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(v) AS HUGEINT) AS sg FROM d GROUP BY 1),
        |u AS (SELECT d.g, abs(CAST(m.ng AS HUGEINT) * d.v - m.sg)
        |    AS u, m.ng FROM d JOIN m USING (g)),
        |grp AS (SELECT g, CAST(min(ng) AS BIGINT) AS ng,
        |    CAST(sum(u) AS HUGEINT) AS a,
        |    CAST(sum(u * u) AS HUGEINT) AS b FROM u GROUP BY 1),
        |f AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list(
        |      CAST(b AS DOUBLE)
        |        / (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE))
        |      - CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
        |        / (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)
        |          * CAST(ng AS DOUBLE)) ORDER BY g),
        |      (x, y) -> x + y) AS ssw,
        |    list_reduce(list(CAST(a AS DOUBLE) / CAST(ng AS DOUBLE)
        |      ORDER BY g), (x, y) -> x + y) AS zsum
        |  FROM grp),
        |f2 AS (SELECT *, zsum / CAST(nn AS DOUBLE) AS zbar FROM f),
        |s2 AS (SELECT grp.g, CAST(grp.ng AS DOUBLE)
        |    * (CAST(grp.a AS DOUBLE) / (CAST(grp.ng AS DOUBLE)
        |        * CAST(grp.ng AS DOUBLE)) - f2.zbar)
        |    * (CAST(grp.a AS DOUBLE) / (CAST(grp.ng AS DOUBLE)
        |        * CAST(grp.ng AS DOUBLE)) - f2.zbar) AS t
        |  FROM grp CROSS JOIN f2),
        |f3 AS (SELECT list_reduce(list(t ORDER BY g),
        |    (x, y) -> x + y) AS ssb FROM s2)
        |SELECT f2.nn AS n, f2.k AS k_groups,
        |  CASE WHEN f2.k >= 2 AND f2.nn > f2.k AND f2.ssw > 0 THEN
        |    round((CAST(f2.nn - f2.k AS DOUBLE) * f3.ssb)
        |      / (CAST(f2.k - 1 AS DOUBLE) * f2.ssw), 6) END AS w_6
        |FROM f2 CROSS JOIN f3""".stripMargin,

    "q_bartlett" ->
      // Stats.bartlett mirror: per-group s² = (n·Q − S²)/(n(n−1)) one
      // IEEE division of exact carriers; pooled/ln/1-over folds in
      // group order; χ² = T/C 6dp; n<2 groups drop; s²≤0 → null
      """WITH d AS (SELECT CAST(o_orderpriority AS VARCHAR) AS g,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(v) AS HUGEINT) AS s,
        |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
        |  FROM d GROUP BY 1 HAVING count(*) >= 2),
        |e AS (SELECT g, ng,
        |    CAST(CAST(ng AS HUGEINT) * q - s * s AS DOUBLE)
        |      / (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0))
        |      AS s2 FROM grp),
        |f AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list((CAST(ng AS DOUBLE) - 1.0) * s2
        |      ORDER BY g), (x, y) -> x + y) AS pooled,
        |    list_reduce(list((CAST(ng AS DOUBLE) - 1.0) * ln(s2)
        |      ORDER BY g), (x, y) -> x + y) AS lnsum,
        |    list_reduce(list(1.0 / (CAST(ng AS DOUBLE) - 1.0)
        |      ORDER BY g), (x, y) -> x + y) AS invsum,
        |    min(s2) AS s2min
        |  FROM e)
        |SELECT nn AS n, k AS k_groups,
        |  CASE WHEN k >= 2 AND s2min > 0 THEN
        |    round((CAST(nn - k AS DOUBLE)
        |        * ln(pooled / CAST(nn - k AS DOUBLE)) - lnsum)
        |      / (1.0 + (invsum - 1.0 / CAST(nn - k AS DOUBLE))
        |        / (3.0 * CAST(k - 1 AS DOUBLE))), 6) END AS chi2_6
        |FROM f""".stripMargin,

    "q_ansari" ->
      // Stats.ansariBradley mirror: value-cardinality 2× midranks,
      // scores a2 = min(R2, 2(N+1)−R2); W2/S2/Q2 exact; z via the
      // two-sample linear-rank moments in the identical IEEE tree, 6dp
      """WITH d AS (SELECT (event_type = 'purchase') AS isa,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |    AND value IS NOT NULL),
        |g AS (SELECT v,
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ta,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS tb
        |  FROM d GROUP BY 1),
        |tot AS (SELECT coalesce(CAST(sum(ta + tb) AS BIGINT), 0)
        |  AS nn FROM g),
        |r AS (SELECT ta, tb,
        |    2 * sum(ta + tb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - (ta + tb) + 1 AS r2, nn
        |  FROM g CROSS JOIN tot),
        |a AS (SELECT ta, tb,
        |    least(r2, (nn + 1) * 2 - r2) AS a2 FROM r),
        |f AS (SELECT coalesce(CAST(sum(ta) AS BIGINT), 0) AS n_a,
        |    coalesce(CAST(sum(tb) AS BIGINT), 0) AS n_b,
        |    coalesce(CAST(sum(ta * a2) AS HUGEINT), 0) AS w2,
        |    coalesce(CAST(sum((ta + tb) * a2) AS HUGEINT), 0) AS s2,
        |    coalesce(CAST(sum(CAST(ta + tb AS HUGEINT) * a2 * a2)
        |      AS HUGEINT), 0) AS q2
        |  FROM a)
        |SELECT n_a, n_b, CAST(w2 AS BIGINT) AS w2_stat,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |      AND CAST(CAST(n_a AS HUGEINT) * n_b
        |          * (CAST(n_a + n_b AS HUGEINT) * q2 - s2 * s2)
        |          AS DOUBLE)
        |        / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
        |          * (CAST(n_a + n_b AS DOUBLE) - 1.0)) > 0 THEN
        |    round(CAST(CAST(n_a + n_b AS HUGEINT) * w2
        |        - CAST(n_a AS HUGEINT) * s2 AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE)
        |      / sqrt(CAST(CAST(n_a AS HUGEINT) * n_b
        |          * (CAST(n_a + n_b AS HUGEINT) * q2 - s2 * s2)
        |          AS DOUBLE)
        |        / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
        |          * (CAST(n_a + n_b AS DOUBLE) - 1.0))), 6)
        |  END AS z_6
        |FROM f""".stripMargin,

    "q_durbin_watson" ->
      // TimeSeries.durbinWatson mirror: with x = t the residual sums
      // collapse onto exact carriers; slope RAW (exact-int ratio),
      // DW = (ΣΔy² − 2bΣΔy + (n−1)b²)·n / (syy − b·sxy) 6dp
      """WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS k,
        |    CAST(ts AS DATE) AS o,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT * FROM daily WHERE k IS NOT NULL
        |  AND o IS NOT NULL AND v IS NOT NULL),
        |rw AS (SELECT k, v,
        |    CAST(row_number() OVER w AS BIGINT) AS t,
        |    v - lag(v) OVER w AS dlt
        |  FROM d WINDOW w AS (PARTITION BY k ORDER BY o)),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS HUGEINT) AS s,
        |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q,
        |    CAST(sum(t) AS HUGEINT) AS st,
        |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
        |    CAST(sum(CAST(t AS HUGEINT) * v) AS HUGEINT) AS stv,
        |    coalesce(CAST(sum(dlt) AS HUGEINT), 0) AS d1,
        |    coalesce(CAST(sum(CAST(dlt AS HUGEINT) * dlt) AS HUGEINT),
        |      0) AS d2
        |  FROM rw GROUP BY 1),
        |e AS (SELECT k, n,
        |    CAST(CAST(n AS HUGEINT) * stt - st * st AS DOUBLE) AS sxx,
        |    CAST(CAST(n AS HUGEINT) * stv - st * s AS DOUBLE) AS sxy,
        |    CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) AS syy,
        |    CAST(d1 AS DOUBLE) AS d1, CAST(d2 AS DOUBLE) AS d2
        |  FROM g),
        |e2 AS (SELECT k, n, sxx,
        |    CASE WHEN sxx > 0 THEN sxy / sxx END AS b,
        |    CASE WHEN sxx > 0 THEN syy - sxy / sxx * sxy END AS nsse,
        |    d1, d2 FROM e)
        |SELECT k AS event_type, n AS n_points,
        |  b AS slope,
        |  CASE WHEN n >= 3 AND sxx > 0 AND nsse > 0 THEN
        |    round((d2 - 2.0 * b * d1
        |        + (CAST(n AS DOUBLE) - 1.0) * b * b)
        |      * CAST(n AS DOUBLE) / nsse, 6) END AS dw_6
        |FROM e2""".stripMargin,

    "q_grubbs" ->
      // Stats.grubbs mirror: n-scaled deviations exact; suspect =
      // max value among maximal-deviation ties (≡ Spark's
      // max(struct(u, v))); G one fixed IEEE tree, 6dp
      """WITH d AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n0,
        |    CAST(sum(v) AS HUGEINT) AS s0 FROM d),
        |u AS (SELECT v, abs(n0 * v - s0) AS u FROM d, t),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, max(u) AS md,
        |    CAST(sum(v) AS HUGEINT) AS s,
        |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q FROM u),
        |sus AS (SELECT max(u.v) AS suspect FROM u, a WHERE u.u = a.md)
        |SELECT a.n, sus.suspect,
        |  CASE WHEN a.n >= 3
        |      AND CAST(CAST(a.n AS HUGEINT) * a.q - a.s * a.s
        |          AS DOUBLE)
        |        / (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0))
        |        > 0 THEN
        |    round((CAST(a.md AS DOUBLE) / CAST(a.n AS DOUBLE))
        |      / sqrt(CAST(CAST(a.n AS HUGEINT) * a.q - a.s * a.s
        |          AS DOUBLE)
        |        / (CAST(a.n AS DOUBLE)
        |          * (CAST(a.n AS DOUBLE) - 1.0))), 6)
        |  END AS g_6
        |FROM a CROSS JOIN sus""".stripMargin,

    "q_theil_index" ->
      // Stats.theilBetween mirror: per-group term (S_g/S)·
      // ln((S_g·N)/(n_g·S)) — exact products, one IEEE division per
      // factor — folded in group order, 6dp; zero-share groups add 0
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |d AS (SELECT n.n_name AS g, rev.cents AS v
        |  FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_name IS NOT NULL AND rev.cents IS NOT NULL),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(v) AS HUGEINT) AS sg FROM d GROUP BY 1),
        |f AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    CAST(sum(sg) AS HUGEINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS k FROM grp),
        |terms AS (SELECT grp.g,
        |    CASE WHEN grp.sg > 0 THEN
        |      (CAST(grp.sg AS DOUBLE) / CAST(f.ss AS DOUBLE))
        |        * ln(CAST(grp.sg * f.nn AS DOUBLE)
        |            / CAST(CAST(grp.ng AS HUGEINT) * f.ss AS DOUBLE))
        |    ELSE 0.0 END AS t
        |  FROM grp CROSS JOIN f)
        |SELECT f.nn AS n, f.k AS n_groups, CAST(f.ss AS BIGINT)
        |    AS total,
        |  CASE WHEN f.ss > 0 THEN
        |    round((SELECT list_reduce(list(t ORDER BY g),
        |      (x, y) -> x + y) FROM terms), 6) END AS theil_between_6
        |FROM f""".stripMargin,

    "q_theta" ->
      // TimeSeries.thetaPerKey mirror: SES recurrence + the (1−α)ⁿ
      // factor replayed step-by-step via recursive CTE (identical
      // IEEE sequence; pow() never used), slope from exact moments,
      // forecast = l + (b/2)·(1−w)/α in the identical tree
      """WITH RECURSIVE seq AS (SELECT user_id AS k,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |c AS (
        |  SELECT k, rn, CAST(v AS DOUBLE) AS l,
        |    CAST(1 AS DOUBLE) - CAST(0.4 AS DOUBLE) AS w
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, d.rn,
        |    CAST(d.v AS DOUBLE) * CAST(0.4 AS DOUBLE)
        |      + s.l * (CAST(1 AS DOUBLE) - CAST(0.4 AS DOUBLE)) AS l,
        |    s.w * (CAST(1 AS DOUBLE) - CAST(0.4 AS DOUBLE)) AS w
        |  FROM c s JOIN seq d ON d.k = s.k AND d.rn = s.rn + 1),
        |fin AS (SELECT k, CAST(max(rn) AS BIGINT) AS n FROM c
        |  GROUP BY 1),
        |ses AS (SELECT c.k, fin.n, c.l, c.w FROM c
        |  JOIN fin ON c.k = fin.k AND c.rn = fin.n),
        |mom AS (SELECT k, CAST(count(*) AS BIGINT) AS nm,
        |    CAST(sum(v) AS HUGEINT) AS s,
        |    CAST(sum(rn) AS HUGEINT) AS st,
        |    CAST(sum(CAST(rn AS HUGEINT) * rn) AS HUGEINT) AS stt,
        |    CAST(sum(CAST(rn AS HUGEINT) * v) AS HUGEINT) AS stv
        |  FROM seq GROUP BY 1),
        |j AS (SELECT ses.k, ses.n, ses.l, ses.w,
        |    CAST(CAST(mom.nm AS HUGEINT) * mom.stt - mom.st * mom.st
        |      AS DOUBLE) AS sxx,
        |    CAST(CAST(mom.nm AS HUGEINT) * mom.stv - mom.st * mom.s
        |      AS DOUBLE) AS sxy
        |  FROM ses JOIN mom ON ses.k = mom.k)
        |SELECT k AS user_id, n AS n_points, round(l, 6) AS level_6,
        |  CASE WHEN sxx > 0 THEN sxy / sxx END AS slope,
        |  round(CASE WHEN sxx > 0 THEN
        |      l + (sxy / sxx / 2.0)
        |        * (CAST(1 AS DOUBLE) - w) / CAST(0.4 AS DOUBLE)
        |    ELSE l END, 6) AS forecast_6
        |FROM j""".stripMargin,

    "q_ljung_box" ->
      // TimeSeries.ljungBox mirror: the q_acf exact-moment machinery
      // at lags 1..7, r_k one IEEE division each, Q folds the lag
      // terms left-associated in lag order, 6dp
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS HUGEINT) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS s FROM d),
        |v AS (SELECT day, n * x - s AS dev FROM d, t),
        |w AS (SELECT dev,
        |    lead(dev, 1) OVER wd AS d1, lead(dev, 2) OVER wd AS d2,
        |    lead(dev, 3) OVER wd AS d3, lead(dev, 4) OVER wd AS d4,
        |    lead(dev, 5) OVER wd AS d5, lead(dev, 6) OVER wd AS d6,
        |    lead(dev, 7) OVER wd AS d7
        |  FROM v WINDOW wd AS (ORDER BY day)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    sum(dev * dev) AS den,
        |    sum(dev * d1) AS n1, sum(dev * d2) AS n2,
        |    sum(dev * d3) AS n3, sum(dev * d4) AS n4,
        |    sum(dev * d5) AS n5, sum(dev * d6) AS n6,
        |    sum(dev * d7) AS n7
        |  FROM w)
        |SELECT nd AS n, CAST(7 AS BIGINT) AS max_lag,
        |  CASE WHEN den <> 0 AND nd > 7 THEN
        |    round(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) + 2.0) * (
        |      (CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 1.0)
        |      + (CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 2.0)
        |      + (CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 3.0)
        |      + (CAST(n4 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n4 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 4.0)
        |      + (CAST(n5 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n5 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 5.0)
        |      + (CAST(n6 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n6 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 6.0)
        |      + (CAST(n7 AS DOUBLE) / CAST(den AS DOUBLE))
        |        * (CAST(n7 AS DOUBLE) / CAST(den AS DOUBLE))
        |        / (CAST(nd AS DOUBLE) - 7.0)), 6) END AS q_6
        |FROM m""".stripMargin,

    "q_self_bleu" -> {
      val norm = normOf("text")
      // Corpus.selfBleu2 mirror: per-(n, gram) max / attainer-count /
      // runner-up windows give the multi-reference clip without
      // doc×doc pairs; BP from the closest-other length on the
      // length spine (ties → lag = shorter); p RAW exact ratios
      s"""WITH tok AS (SELECT doc_id AS did,
         |    list_filter(string_split($norm, ' '), t -> len(t) > 0)
         |      AS tk FROM documents),
         |g1 AS (SELECT did, 1 AS n, unnest(tk) AS g FROM tok),
         |g2 AS (SELECT did, 2 AS n, unnest(list_transform(
         |    generate_series(1, len(tk) - 1),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS g FROM tok),
         |dg AS (SELECT did, n, g, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2) uu
         |  GROUP BY 1, 2, 3),
         |s1 AS (SELECT did, n, g, c,
         |    max(c) OVER (PARTITION BY n, g) AS m1g FROM dg),
         |s2 AS (SELECT *,
         |    CAST(sum(CASE WHEN c = m1g THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY n, g) AS BIGINT) AS cnt1,
         |    max(CASE WHEN c < m1g THEN c END)
         |      OVER (PARTITION BY n, g) AS m2g FROM s1),
         |cl AS (SELECT did, n, c,
         |    least(c, CASE WHEN c = m1g AND cnt1 = 1
         |      THEN coalesce(m2g, 0) ELSE m1g END) AS clip FROM s2),
         |per AS (SELECT did,
         |    CAST(sum(CASE WHEN n = 1 THEN clip ELSE 0 END) AS BIGINT)
         |      AS m1,
         |    CAST(sum(CASE WHEN n = 1 THEN c ELSE 0 END) AS BIGINT)
         |      AS t1,
         |    CAST(sum(CASE WHEN n = 2 THEN clip ELSE 0 END) AS BIGINT)
         |      AS m2,
         |    CAST(sum(CASE WHEN n = 2 THEN c ELSE 0 END) AS BIGINT)
         |      AS t2
         |  FROM cl GROUP BY 1),
         |base AS (SELECT tok.did, CAST(len(tok.tk) AS BIGINT) AS len,
         |    coalesce(per.m1, 0) AS m1, coalesce(per.t1, 0) AS t1,
         |    coalesce(per.m2, 0) AS m2, coalesce(per.t2, 0) AS t2
         |  FROM tok LEFT JOIN per ON tok.did = per.did),
         |spine AS (SELECT len, CAST(count(*) AS BIGINT) AS docs
         |  FROM base GROUP BY 1),
         |rof AS (SELECT len, CASE
         |    WHEN docs >= 2 THEN len
         |    WHEN lag(len) OVER wl IS NULL
         |      AND lead(len) OVER wl IS NULL THEN NULL
         |    WHEN lag(len) OVER wl IS NULL THEN lead(len) OVER wl
         |    WHEN lead(len) OVER wl IS NULL THEN lag(len) OVER wl
         |    WHEN len - lag(len) OVER wl <= lead(len) OVER wl - len
         |      THEN lag(len) OVER wl
         |    ELSE lead(len) OVER wl END AS r
         |  FROM spine WINDOW wl AS (ORDER BY len)),
         |j AS (SELECT base.*, rof.r,
         |    (base.t1 > 0 AND base.t2 > 0 AND rof.r IS NOT NULL)
         |      AS ok,
         |    CASE WHEN base.t1 >= rof.r THEN 1.0
         |      ELSE exp(1.0 - CAST(rof.r AS DOUBLE)
         |        / CAST(base.t1 AS DOUBLE)) END AS bp
         |  FROM base JOIN rof USING (len))
         |SELECT did AS doc_id, t1 AS c_len, r AS r_len, m1, t1, m2,
         |  t2,
         |  CASE WHEN ok THEN CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE)
         |    END AS p1,
         |  CASE WHEN ok THEN CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE)
         |    END AS p2,
         |  CASE WHEN ok THEN round(bp, 6) END AS bp_6,
         |  CASE WHEN ok THEN round(bp
         |    * sqrt((CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE))
         |      * (CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE))), 6)
         |    END AS self_bleu_6
         |FROM j""".stripMargin
    },

    "q_cond_entropy" -> {
      val norm = normOf("text")
      // Corpus.charConditionalEntropy mirror: canonical-text char
      // bigram counts, prefix counts via one keyed window, per-doc
      // fold of c·ln(c_a/c) in bigram order, H = fold/T 6dp
      s"""WITH canon AS (SELECT doc_id AS did, $norm AS txt
         |  FROM documents),
         |grams AS (SELECT did, substr(txt, CAST(u.i AS INTEGER), 2)
         |    AS bg
         |  FROM canon, unnest(generate_series(1, len(txt) - 1))
         |    AS u(i)),
         |counts AS (SELECT did, bg, CAST(count(*) AS BIGINT) AS c
         |  FROM grams GROUP BY 1, 2),
         |wp AS (SELECT did, bg, c,
         |    CAST(sum(c) OVER (PARTITION BY did, substr(bg, 1, 1))
         |      AS BIGINT) AS ca FROM counts),
         |f AS (SELECT did, CAST(sum(c) AS BIGINT) AS tt,
         |    CAST(count(*) AS BIGINT) AS db,
         |    list_reduce(list(CAST(c AS DOUBLE)
         |      * ln(CAST(ca AS DOUBLE) / CAST(c AS DOUBLE))
         |      ORDER BY bg), (x, y) -> x + y) AS h
         |  FROM wp GROUP BY 1)
         |SELECT canon.did AS doc_id, coalesce(f.tt, 0) AS n_bigrams,
         |  coalesce(f.db, 0) AS distinct_bigrams,
         |  round(f.h / CAST(f.tt AS DOUBLE), 6) AS h_6
         |FROM canon LEFT JOIN f ON canon.did = f.did""".stripMargin
    },

    "q_scd3" ->
      // full-outer key merge: changed keys carry (new, old), unchanged
      // (old, null), inserts (new, null); additive-delta updates keep
      // cents off half-cent rounding boundaries
      """WITH b AS (SELECT o_orderkey, o_totalprice AS price
        |  FROM orders),
        |u AS (SELECT o_orderkey, o_totalprice + 100000 AS price
        |  FROM orders WHERE o_orderkey % 4 = 0)
        |SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  round(coalesce(u.price, b.price), 2) AS price,
        |  round(CASE WHEN u.price IS NOT NULL AND b.price IS NOT NULL
        |    AND u.price <> b.price THEN b.price END, 2) AS prev_price,
        |  (u.price IS NOT NULL AND (b.price IS NULL
        |    OR u.price <> b.price)) AS changed
        |FROM b FULL OUTER JOIN u ON b.o_orderkey = u.o_orderkey""".stripMargin)
}
