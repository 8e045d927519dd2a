package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.operators.{Augment, DatetimeDim, Dedup, NullAudit}

/** Core (parity-tier) query catalog — one entry per operator cluster in
  * SURVEY.md §2, expressed over the driver's synthetic star schema.
  *
  * Every query is a deterministic SET (no arbitrary-survivor picks, ties
  * broken explicitly) so the driver's sorted-hash compare against DuckDB
  * is stable. Floating-point aggregates are rounded on both sides.
  */
object CoreQueries {

  /** A1 headline grouped aggregation (pricing summary à la TPC-H Q1).
    * Partial aggregation (map-side combine) means the shuffle carries
    * one row per (flag,status,partition) — scale-safe at 100 TB. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** A1 null/NaN audit over every lineitem column (reference
    * init-data-transformation.py:58-63). */
  def q02NullAudit(s: SparkSession, dir: String): DataFrame =
    NullAudit.audit(Tables.lineitem(s, dir))

  /** A2+U1: SELECT DISTINCT ... UNION (dedups across branches). */
  def q03DistinctUnion(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.select(col("l_partkey").as("item_key"))
      .union(li.select(col("l_suppkey")))
      .distinct()
  }

  /** J1: null-aware anti join (NOT IN) — "new" dimension keys discovered
    * on the fact side, exactly the station-augmentation shape
    * (journey-data-transformation.py:110-127). Dim is filtered so the
    * probe actually finds gaps. */
  def q04AntijoinNewKeys(s: SparkSession, dir: String): DataFrame =
    Augment.newKeys(
      s,
      probe = Tables.orders(s, dir),
      probeExprs = Seq("CAST(o_custkey AS BIGINT)" -> "new_key"),
      dim = Tables.customer(s, dir).where(col("c_acctbal") > 1000.0),
      dimKeyExpr = "c_custkey")

  /** J2: star-schema enrichment join — fact ⋈ 4 dims, dims broadcast
    * (journeys_enriched analogue, README.md:224). */
  def q05StarEnrichment(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
  }

  /** F3+U2+A3: datetime dimension from order + ship timestamps. */
  def q06DatetimeDim(s: SparkSession, dir: String): DataFrame =
    DatetimeDim.build(Seq(
      Tables.orders(s, dir) -> col("o_orderdate"),
      Tables.lineitem(s, dir) -> col("l_shipdate")))

  /** P1/P4/P5/P6/F2: fact-prep projection — rename, null filter, cast,
    * derived date key, conditional flag, constant column. */
  def q07FactPrep(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumnRenamed("o_orderkey", "rental_id")
      .where(col("o_orderdate").isNotNull && col("o_custkey").isNotNull)
      .select(
        col("rental_id"),
        col("o_custkey").cast(LongType).as("customer_id"),
        col("o_orderdate").as("start_ts"),
        to_date(col("o_orderdate")).as("weather_date"),
        when(col("o_totalprice") > 300000.0, 1).otherwise(0).as("is_large"),
        lit(0.0).cast(DoubleType).as("placeholder_coord"))

  /** U2+A3 deterministic: unionByName two dims then keep one row per key
    * (window row_number — survivor fixed, unlike dropDuplicates). */
  def q08UnionDedup(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(
      col("c_custkey").as("entity_id"), col("c_name").as("name"),
      lit("customer").as("src"))
    val supp = Tables.supplier(s, dir).select(
      col("s_suppkey").as("entity_id"), col("s_name").as("name"),
      lit("supplier").as("src"))
    Dedup.deterministic(
      cust.unionByName(supp),
      keys = Seq("entity_id"),
      order = Seq(col("src"), col("name")))
  }

  /** §2.6 sorts/limits: global top-k with explicit tiebreak. */
  def q09TopOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** §2.5 window: top-3 orders per customer (rank within partition).
    * The partition key carries the `__ent` provenance marker while the
    * window runs — per-customer order counts are entity-bounded, and
    * the PlanSpec catalog sweep sanctions the marker, not the name
    * (VERDICT r09 item 2). */
  def q10WindowTopn(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("__ent_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumnRenamed("o_custkey", "__ent_custkey")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("__ent_custkey").as("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("rn"))
  }

  /** Streaming-analogue batch query: tumbling 1-hour event-time window
    * (same groupBy(window(...)) plan Structured Streaming uses). */
  def q11EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        col("w.start").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** §2.8 scalar string functions (F7 analogues). */
  def q12StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).as("name_len"),
      split(col("p_type"), " ").getItem(0).as("type_head"),
      element_at(split(col("p_name"), " "), -1).as("name_tail"),
      regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))

  /** F9: JSON extraction inside Spark (from_json on the events props). */
  def q13JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      from_json(col("props"), lit("k INT")).getField("k").as("k"))

  /** A4 max-by: latest event per user (argmax over event time). */
  def q14LatestEvent(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        max(col("ts")).as("last_ts"),
        max_by(col("event_type"), col("ts")).as("last_event_type"),
        count(lit(1)).as("n_events"))

  /** F1/F8 date parsing: dd/MM/yyyy HH:mm (TfL journey format) and
    * ddMMMyyyy (manifest format) round-trips through strings. */
  def q15DateParse(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      to_timestamp(
        date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm"),
        "dd/MM/yyyy HH:mm").as("parsed_ts"),
      to_date(
        date_format(col("o_orderdate"), "ddMMMyyyy"),
        "ddMMMyyyy").as("parsed_date"))
}
