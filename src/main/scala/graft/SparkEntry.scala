package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.3 has a `queries` entry;
  * all SQL-expressible ones also carry a DuckDB oracle in `oracleSql`
  * (identical column names + ORDER BY, exact decimal aggregation — see
  * Relational's determinism notes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q10Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan" -> Relational.q01Scan _,
    "q02_filter_project" -> Relational.q02FilterProject _,
    "q03_conditional" -> Relational.q03Conditional _,
    "q04_join_inner" -> Relational.q04JoinInner _,
    "q05_join_broadcast" -> Relational.q05JoinBroadcast _,
    "q06_join_left" -> Relational.q06JoinLeft _,
    "q07_join_semi" -> Relational.q07JoinSemi _,
    "q08_join_anti" -> Relational.q08JoinAnti _,
    "q09_join_theta" -> Relational.q09JoinTheta _,
    "q10_agg" -> Relational.q10Agg _,
    "q11_count_distinct" -> Relational.q11CountDistinct _,
    "q12_approx_distinct" -> Relational.q12ApproxDistinct _,
    "q13_rollup" -> Relational.q13Rollup _,
    "q14_window_rank" -> Relational.q14WindowRank _,
    "q15_window_frame" -> Relational.q15WindowFrame _,
    "q16_topk" -> Relational.q16TopK _,
    "q17_setops" -> Relational.q17SetOps _,
    "q18_strings" -> Relational.q18Strings _,
    "q19_dates" -> Relational.q19Dates _,
    "q20_math" -> Relational.q20Math _,
    "q21_arrays" -> Relational.q21Arrays _,
    "q21_explode" -> Relational.q21Explode _,
    "q22_maps" -> Relational.q22Maps _,
    "q23_json" -> Relational.q23Json _,
    "q24_subquery" -> Relational.q24Subquery _,
    "q25_dedup_exact" -> Relational.q25DedupExact _,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan" ->
      ("SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey, " +
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, " +
        "l_returnflag, l_linestatus, l_shipdate"),
    "q02_filter_project" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderstatus <> 'F' AND o_totalprice > 1000 ORDER BY o_orderkey"),
    "q03_conditional" ->
      ("SELECT event_id, CASE WHEN event_type='purchase' THEN value*1.1 " +
        "WHEN event_type='click' THEN value*1.3 ELSE value END AS v_usd " +
        "FROM events ORDER BY event_id"),
    "q04_join_inner" ->
      ("SELECT o_orderkey, o_custkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q05_join_broadcast" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
    "q06_join_left" ->
      ("SELECT c_custkey, o_orderkey, o_totalprice FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey " +
        "ORDER BY c_custkey, o_orderkey NULLS LAST"),
    "q07_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    "q08_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    "q09_join_theta" ->
      ("SELECT l_orderkey, l_linenumber, p_partkey, l_quantity, p_size " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity < p_size " +
        "ORDER BY l_orderkey, l_linenumber, p_partkey, l_quantity, p_size"),
    "q10_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q11_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_custkeys FROM orders",
    "q13_rollup" ->
      ("SELECT COALESCE(l_returnflag, 'ALL') AS rflag, " +
        "COALESCE(l_linestatus, 'ALL') AS lstatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "COUNT(*) AS cnt FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rflag, lstatus"),
    "q14_window_rank" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q15_window_frame" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, " +
        "LAG(o_totalprice, 1) OVER w AS prev_price, " +
        "LEAD(o_totalprice, 1) OVER w AS next_price, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum_3 " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q16_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
    "q17_setops" ->
      ("SELECT 'both' AS tag, k FROM " +
        "(SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey AS k FROM customer) " +
        "UNION ALL SELECT 'no_orders' AS tag, k FROM " +
        "(SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders) " +
        "ORDER BY tag, k"),
    "q18_strings" ->
      ("SELECT c_custkey, upper(c_name) AS un, substring(c_name, 1, 8) AS sb, " +
        "concat(c_name, '#', c_mktsegment) AS cc, trim(c_name) AS tr, " +
        "CAST(length(c_name) AS BIGINT) AS len, " +
        "(c_name LIKE '%1%') AS lk, " +
        "regexp_extract(c_name, '([0-9]+)', 1) AS re, " +
        "array_to_string(string_split(c_name, '#'), '|') AS sp " +
        "FROM customer ORDER BY c_custkey"),
    "q19_dates" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(day(o_orderdate) AS BIGINT) AS d, " +
        "date_trunc('month', o_orderdate) AS mon, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since " +
        "FROM orders ORDER BY o_orderkey"),
    "q20_math" ->
      ("SELECT o_orderkey, abs(o_totalprice - 1000) AS ab, " +
        "CAST(floor(o_totalprice) AS BIGINT) AS fl, " +
        "CAST(ceil(o_totalprice) AS BIGINT) AS ce, " +
        "round(sqrt(o_totalprice), 6) AS sq, " +
        "round(ln(o_totalprice), 6) AS ln_ " +
        "FROM orders ORDER BY o_orderkey"),
    "q21_arrays" ->
      ("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
        "embedding[1] AS v0, " +
        "list_aggregate(embedding, 'min') AS vmin, " +
        "list_aggregate(embedding, 'max') AS vmax, " +
        "len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big " +
        "FROM embeddings ORDER BY vec_id"),
    "q21_explode" ->
      ("SELECT vec_id, CAST(r.range + 1 AS BIGINT) AS pos, embedding[CAST(r.range AS INT) + 1] AS val " +
        "FROM embeddings, range(64) r WHERE vec_id < 3 ORDER BY vec_id, pos"),
    "q22_maps" ->
      ("SELECT event_id, event_type AS mt, CAST(2 AS BIGINT) AS msz, " +
        "'type,uid' AS mkeys FROM events ORDER BY event_id"),
    "q23_json" ->
      ("SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct " +
        "FROM events ORDER BY event_id"),
    "q24_subquery" -> Relational.q24Sql,
    "q25_dedup_exact" ->
      ("SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY user_id, event_type"),
  )
}
