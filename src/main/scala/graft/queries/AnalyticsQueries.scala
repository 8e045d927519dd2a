package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deeper analytics tier: TPC-H-style multi-join/agg shapes that
  * exercise Catalyst's join ordering, pushdown through joins, and
  * mixed agg/sort/limit pipelines — the BI layer the reference ran in
  * BigQuery/Looker (SURVEY.md §2.4 note), expressed natively.
  */
object AnalyticsQueries {

  /** Q3-style shipping priority: top revenue among orders placed before
    * a cutoff with lineitems shipped after it, for one segment. The
    * segment + date filters push below the joins; dims broadcast. */
  def q29ShippingPriority(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < "1998-01-01")
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > "1998-01-01")
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** Q5-style local-supplier volume: revenue per nation where customer
    * and supplier share the nation, one region, one year. Join graph
    * has a cycle (both customer and supplier constrain nationkey) —
    * a genuine join-order workout. */
  def q30LocalVolume(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .where(year(col("o_orderdate")) === 1997)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))

  /** Q14-style promo share: conditional aggregation over a join —
    * percentage of revenue from one part type per month. */
  def q31PromoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(round(
        sum(when(col("p_type") === "ECONOMY",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) * 100.0 /
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        4).as("economy_revenue_pct"))

  /** Rollup: revenue at (year, month), (year), and grand-total levels
    * in one pass — multi-level aggregation (GROUPING SETS family). */
  def q33Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Pivot: revenue per nation pivoted by return flag — columnar
    * reshaping via conditional aggregation under the hood. */
  def q34Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_extendedprice")), 2))
      .withColumnsRenamed(Map("A" -> "rev_a", "N" -> "rev_n", "R" -> "rev_r"))

  /** Exact percentiles + dispersion statistics per order priority. */
  def q35Stats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
        round(corr(col("o_totalprice"), col("o_custkey")), 6).as("corr_price_cust"))

  /** Rolling event-time aggregate: per-user sum/count of event values
    * over the trailing hour, RANGE frame on epoch millis — the
    * sliding-window analytic the tumbling window (q11) can't express. */
  def q36Rolling(s: SparkSession, dir: String): DataFrame = {
    // "__ent_user_id": one user's trailing-hour event history is
    // entity-bounded — marker-sanctioned (VERDICT r09 item 2).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ent_user_id"))
      .orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, 0L)
    Tables.events(s, dir)
      .withColumnRenamed("user_id", "__ent_user_id")
      .select(
        col("event_id"), col("__ent_user_id").as("user_id"), col("ts"),
        round(sum(col("value")).over(w), 4).as("rolling_hour_value"),
        count(lit(1)).over(w).as("rolling_hour_events"))
  }

  /** Semi join via EXISTS: orders having at least one high-quantity
    * line item (the membership-test twin of the q04 anti join). */
  def q37SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(
        Tables.lineitem(s, dir).where(col("l_quantity") >= 49.0)
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** INTERSECT / EXCEPT completion of the set-operation family (the
    * reference used only UNION; an engine replacement needs all three):
    * customers who bought in 1996 but not in 1997, via except on key
    * sets, plus the intersect count as a sanity column. */
  def q38SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    def buyers(y: Int) = ord.where(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    val churned = buyers(1996).except(buyers(1997))
      .withColumnRenamed("o_custkey", "cust_key")
      .withColumn("status", lit("churned_1997"))
    val retained = buyers(1996).intersect(buyers(1997))
      .withColumnRenamed("o_custkey", "cust_key")
      .withColumn("status", lit("retained_1997"))
    churned.unionByName(retained)
  }

  val oracleSql: Map[String, String] = Map(
    "q38_set_ops" ->
      """SELECT cust_key, 'churned_1997' AS status FROM (
        | SELECT o_custkey AS cust_key FROM orders WHERE year(o_orderdate) = 1996
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |UNION ALL
        |SELECT cust_key, 'retained_1997' AS status FROM (
        | SELECT o_custkey AS cust_key FROM orders WHERE year(o_orderdate) = 1996
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""".stripMargin,

    "q36_rolling" ->
      """SELECT event_id, user_id, ts,
        | round(sum(value) OVER w, 4) AS rolling_hour_value,
        | count(*) OVER w AS rolling_hour_events
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q37_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)""".stripMargin,

    "q33_rollup" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
        | CAST(month(l_shipdate) AS INT) AS ship_month,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |GROUP BY ROLLUP (ship_year, ship_month)""".stripMargin,

    "q34_pivot" ->
      """SELECT n_name,
        | round(sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END), 2) AS rev_a,
        | round(sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END), 2) AS rev_n,
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END), 2) AS rev_r
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q35_stats" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        | round(stddev_samp(o_totalprice), 4) AS sd_price,
        | round(corr(o_totalprice, o_custkey), 6) AS corr_price_cust
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q29_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q30_local_volume" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
        |GROUP BY n_name""".stripMargin,

    "q31_promo_share" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
        | CAST(month(l_shipdate) AS INT) AS ship_month,
        | round(sum(CASE WHEN p_type = 'ECONOMY'
        |               THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) * 100.0
        |       / sum(l_extendedprice * (1.0 - l_discount)), 4) AS economy_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
  )
}
