package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * `queries` entry; `oracleSql` carries the equivalent DuckDB SQL over
  * the same parquet tables (bare table names resolve to the sf dir).
  * Column names/aliases match exactly between the two sides — the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pagenation.sql running tally (SURVEY §7 step 1). */
  def entry(spark: SparkSession): DataFrame =
    Queries.runningTally(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "running_tally" -> ((s, dir) => Queries.runningTally(s, dir)),
    "cslb_reconcile" -> ((s, dir) => Queries.cslbReconcile(s, dir)),
    "pricing_summary" -> ((s, dir) => Queries.pricingSummary(s, dir)),
    "top_revenue_orders" -> ((s, dir) => Queries.topRevenueOrders(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "running_tally" ->
      """WITH rawd AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
        |         count(event_id) AS tally
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
        |SELECT dt, tally,
        |       sum(tally) OVER (ORDER BY dt ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS running_tally
        |FROM rawd
        |ORDER BY running_tally DESC, dt""".stripMargin,
    "cslb_reconcile" ->
      """SELECT DISTINCT o.o_custkey AS contact_id
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE o.o_custkey IS NOT NULL
        |ORDER BY 1""".stripMargin,
    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_e2,
        |       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS sum_disc_price_e4,
        |       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS sum_charge_e6,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "top_revenue_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue_e4
        |FROM (
        |  SELECT l_orderkey,
        |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS revenue_e4
        |  FROM lineitem GROUP BY l_orderkey) r
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue_e4 DESC, o_orderkey
        |LIMIT 100""".stripMargin,
  )
}
