package graft.operators

import graft.{GraftSession, QueryDef, QueryRegistry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The analytics query battery (SURVEY.md §2.B).
  *
  * Mirrors the reference's analytics patterns — filtered scans and topN
  * (spark/sql/quickstart.sql:43), groupBy-count-orderBy-limit and regex log
  * parsing (glue/"S3 Calls benchmarking Code.py":47-80), time-window counts
  * (glue Code.py:115-128), dataset parity via except/intersect
  * (spark/.../TestAutomationUtils.scala:59-85) — re-expressed as pure
  * DataFrame pipelines so Catalyst owns pushdown, pruning, and join
  * strategy. Dimension-sized sides are broadcast explicitly; fact-fact
  * joins rely on shuffle hash/sort-merge with AQE skew handling.
  */
object Queries extends QueryRegistry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** Exact money arithmetic: cast to decimal pre-agg, emit double. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  // --- q1_pricing_summary: TPC-H Q1-style scan+agg; filter must push to parquet.
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- q3_shipping_priority: dim-filtered 3-way join + agg + deterministic topN.
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < ts("1997-01-01"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1997-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --- q5_local_supplier: 6-way star join; all dims broadcast, facts shuffle once.
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supplier = t(s, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- q_top_events: groupBy-count-orderBy-limit (glue top-paths pattern).
  def qTopEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(desc("n"), asc("event_type"))
      .limit(3)

  private val qTopEventsSql =
    """SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3""".stripMargin

  // --- q_log_parse: regex field extraction + LIKE filter + agg (glue log-parse pattern).
  def qLogParse(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "error" && col("props").like("%k%"))
      .withColumn("k_bucket", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long") % 10)
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("k_bucket")

  private val qLogParseSql =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events WHERE event_type = 'error' AND props LIKE '%k%'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_time_buckets: event-time bucketing (glue commit-window count pattern).
  def qTimeBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("hour_ts")

  private val qTimeBucketsSql =
    """SELECT date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_window_rank: top-3 orders per customer (single shuffle on o_custkey).
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private val qWindowRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // --- q_running_sum: per-customer running revenue (exact decimal frame sum).
  def qRunningSum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qRunningSumSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- q_batch_parity: except/intersect dataset diffing (TestAutomationUtils.scala:59-85).
  def qBatchParity(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val a = ord.filter(col("o_totalprice") > 100).select("o_orderkey", "o_orderstatus")
    val b = ord.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_orderstatus")
    val ex = a.except(b).agg(count(lit(1)).as("n")).select(lit("except").as("kind"), col("n"))
    val in = a.intersect(b).agg(count(lit(1)).as("n")).select(lit("intersect").as("kind"), col("n"))
    ex.unionAll(in).orderBy("kind")
  }

  private val qBatchParitySql =
    """WITH a AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100),
      |     b AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O')
      |SELECT 'except' AS kind, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'intersect' AS kind, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |ORDER BY kind""".stripMargin

  // --- q_semi_anti: EXISTS / NOT EXISTS as left-semi / left-anti joins.
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ordKeys = t(s, dir, "orders").select("o_custkey")
    val semi = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "leftsemi")
      .agg(count(lit(1)).as("n")).select(lit("semi").as("kind"), col("n"))
    val anti = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "leftanti")
      .agg(count(lit(1)).as("n")).select(lit("anti").as("kind"), col("n"))
    semi.unionAll(anti).orderBy("kind")
  }

  private val qSemiAntiSql =
    """SELECT 'semi' AS kind, COUNT(*) AS n FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'anti' AS kind, COUNT(*) AS n FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY kind""".stripMargin

  // --- q_rollup: multi-level aggregation in one pass (partial-agg friendly).
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"),
        grouping(col("o_orderstatus")).as("g_s"),
        grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  private val qRollupSql =
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status NULLS FIRST, priority NULLS FIRST""".stripMargin

  // --- q_grouping_sets: explicit GROUPING SETS — per-priority, per-status,
  // and grand-total aggregates in ONE pass (the shapes ROLLUP can't express:
  // two independent single-column sets). Spark expands the sets in a single
  // partial-agg-friendly hash aggregate, exactly like rollup/cube.
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"),
        grouping(col("o_orderpriority")).as("g_p"),
        grouping(col("o_orderstatus")).as("g_s"))
      .select(
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        col("n"), col("total"))
      .orderBy("priority", "status")

  // --- q6_forecast_revenue: TPC-H Q6 — the canonical pushdown benchmark:
  // every filter (date range, discount band, quantity cap) must reach the
  // parquet scan; the agg is a single partial-aggregable global sum.
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --- q18_large_orders: TPC-H Q18 — join + HAVING on an aggregate + topN.
  // The quantity sum is grouped on the JOIN KEY, so the aggregate is partial
  // before the shuffle; the topN carries a unique tiebreak.
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
      .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > 150)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        col("qty_dec").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private val q18Sql =
    """SELECT o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // --- q10_returned_items: TPC-H Q10 — fact-fact join between lineitem and
  // date-filtered orders, customer + nation dims broadcast, topN by exact
  // decimal revenue with a unique tiebreak.
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .as("rev_dec"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy(col("rev_dec").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --- q17_small_quantity: TPC-H Q17 — correlated-aggregate filter
  // (quantity below 20% of the part's average) restated decimal-exact with
  // NO division: l_qty < 0.2·(s/c) ⟺ 5·l_qty·c < s, so both engines filter
  // on exact integers-scaled decimals and the only double op is the final
  // division by the constant 7.0.
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey")
    t(s, dir, "lineitem")
      .withColumn("s", sum(dec(col("l_quantity"))).over(w))
      .withColumn("c", count(lit(1)).over(w))
      .filter(dec(col("l_quantity")) * 5 * col("c") < col("s"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH pa AS (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN pa USING (l_partkey)
      |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * c < s""".stripMargin

  // --- q14_promo_share: TPC-H Q14 — conditional aggregation over a join:
  // share of revenue from PROMO parts in one month. Part is broadcast; both
  // sums are exact decimals, the single double division is deterministic.
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-03-01") && col("l_shipdate") < ts("1997-04-01"))
    val rev = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_share"))
  }

  private val q14Sql =
    """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  // --- q19_disjunctive: TPC-H Q19-style OR-of-conjunctions filter across a
  // join — the optimizer must extract the common join key and push the
  // per-branch predicates; revenue over matching (brand, size, quantity)
  // bands.
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val rev = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    val bands =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40))
    li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(bands)
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  private val qGroupingSetsSql =
    """SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY priority NULLS FIRST, status NULLS FIRST""".stripMargin

  // --- q_pivot: PIVOT — order counts and revenue spread across status
  // columns per priority. Spark's pivot with explicit values plans a single
  // partial-aggregable hash agg (no per-status scans); the oracle states the
  // same thing as conditional aggregation.
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
      // a pivot cell with no rows is null; the oracle's FILTER count is 0
      .select(col("o_orderpriority") +:
        Seq("F", "O", "P").flatMap(v => Seq(
          coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"), col(s"${v}_total"))): _*)
      .orderBy("o_orderpriority")

  private val qPivotSql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS F_n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F_total,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS O_n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O_total,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS P_n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q_skew_join: fact-fact shuffle join; AQE splits skewed partitions at scale.
  def qSkewJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("total"))
      .orderBy("o_orderpriority")

  private val qSkewJoinSql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_bloom_join: runtime bloom-filter join pruning — the pattern behind
  // Spark's InjectRuntimeFilter, built explicitly so the filter can come
  // from an ARBITRARY build-side plan. The selective dim side (urgent
  // orders, ~1/5 of keys) is hashed into a compact bitmap (k=4 hashes,
  // ~8 bits/key → ~2.4% false positives) that prefilters the fact scan
  // INSIDE whole-stage codegen before the join shuffle — at 100 TB, where
  // the dim is too big to broadcast and the join must shuffle both sides,
  // this cuts ~4/5 of the fact shuffle for a bitmap that is kilobytes per
  // executor. Exactness does not depend on the bloom: no false negatives by
  // construction (same XXH64 top-bits addressing on build and probe,
  // FunctionsSpec pins it), and the exact equi-join afterwards removes the
  // false positives — the oracle states the plain join. The bitmap build is
  // distributed (explode k positions, bit_or into 64-bit words, one shuffle
  // whose output is ≤ m/64 rows); only the ≤(m/64)-word aggregate — bounded
  // by the filter SIZE, not the data — reaches the driver, exactly like
  // Spark's own bloom aggregate in runtime filtering.
  private val BloomK = 4

  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val dim = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderdate")
    // Size m to ~8 bits/key (the count is one metadata-cheap job over the
    // pushdown-filtered dim scan), then the shared distributed build.
    val mLog2 = graft.functions.BloomBuild.sizeLog2(dim.count())
    val bitmap = graft.functions.BloomBuild.build(dim, col("o_orderkey"), BloomK, mLog2)
    val pruned = t(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .filter(call_function("bloom_contains",
        col("l_orderkey"), lit(bitmap), lit(BloomK), lit(mLog2)))
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  private val qBloomJoinSql =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_pagerank: 5 damped PageRank iterations over the co-purchase part
  // graph — the iterative-graph-compute pattern beyond connected
  // components (influence/centrality ranking over an item graph). All
  // arithmetic is INTEGER-EXACT on a 1e9 fixed-point rank scale: per-edge
  // contribution is `rank div out_degree`, damping is `* 85 div 100` —
  // floor division and long sums are order-independent, so the result is
  // bit-stable under any partitioning and the DuckDB oracle can state all
  // five iterations verbatim (floating-point PageRank cannot be
  // hash-compared across engines). Every node has out-degree >= 1 by
  // construction (the co-purchase graph is symmetric), so no dangling-mass
  // term. Edges materialize ONCE via localCheckpoint — five iterations
  // re-shuffle the edge list against the rank vector, exactly the
  // Pregel-style schedule that scales (per-iteration cost is O(|E|), plan
  // depth bounded, no driver-side graph). Long-overflow headroom: total
  // rank mass is n*1e9, so a single node absorbing ALL mass stays ~1e17
  // < 2^63 even at 100x the test scale.
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    // spread: the 2-column edge-build feed, so the self-join's map side
    // isn't a single-split scan (guide §2.5); only (k, part) bytes move
    val li = graft.GraftSession.spread(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"))
    // eager cache, NOT localCheckpoint: the edge list is rescanned by every
    // iteration (plus the outdeg/nodes builds) and columnar in-memory
    // batches rescan several times faster than a checkpoint's row-serialized
    // blocks; lineage here is one self-join, constant across iterations, so
    // checkpoint's lineage truncation buys nothing (ranks still truncates)
    val edges = graft.GraftSession.eager(li.toDF("k", "src")
      .join(li.toDF("k2", "dst"), col("k") === col("k2") && col("src") =!= col("dst"))
      .select("src", "dst"))
    // eager (guide §2.4): outdeg and nodes are consumed by EVERY
    // iteration's broadcast builds — lazy, each of the 5 rounds re-ran the
    // full edge aggregation (and the nodes distinct) inside its broadcast
    // thread; cached+materialized once, the rounds read ~|nodes| rows
    val outdeg = graft.GraftSession.eager(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // nodes ≡ outdeg's key set (a groupBy emits each src once): derive it
    // from the outdeg cache instead of paying a separate distinct + eager
    // cache + materialization job over the edge list
    val nodes = outdeg.select(col("src").as("node"))
    // rounds pin via GraftSession.pinRows + an eager materializing count —
    // the same 1-job-per-round shape as the eager localCheckpoint it
    // replaces, but rdd.unpersist actually frees the superseded round's
    // blocks (Dataset.unpersist on a checkpointed frame is a CacheManager
    // no-op; five rank frames leaked per run until a GC cycle)
    var ranks = nodes.withColumn("r", lit(1000000000L))
    var prevPin: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = null
    (1 to 5).foreach { _ =>
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      val (next, nextRdd) = graft.GraftSession.pinRows(nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000000L) + expr("coalesce(inflow, 0L) * 85 div 100")).as("r")))
      nextRdd.count() // the round's one job
      if (prevPin != null) prevPin.unpersist(blocking = false)
      ranks = next
      prevPin = nextRdd
    }
    ranks.orderBy(desc("r"), asc("node"))
      .limit(100)
      .select(col("node").as("l_partkey"), col("r").as("rank_e9"))
  }

  private val qPagerankSql = {
    // one iteration: node inflow = Σ over in-edges of rank(src) div deg(src)
    def iter(prev: String, out: String): String =
      s"""$out AS (SELECT n.node,
         |    150000000 + CAST(COALESCE((SELECT SUM($prev.r // d.deg)
         |      FROM e JOIN $prev ON $prev.node = e.src JOIN d ON d.src = e.src
         |      WHERE e.dst = n.node), 0) AS BIGINT) * 85 // 100 AS r
         |  FROM n)""".stripMargin
    s"""WITH e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
       |    FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
       |n AS (SELECT DISTINCT src AS node FROM e),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM n),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")},
       |${iter("r3", "r4")},
       |${iter("r4", "r5")}
       |SELECT node AS l_partkey, r AS rank_e9 FROM r5
       |ORDER BY r DESC, node LIMIT 100""".stripMargin
  }

  // --- q_range_join: banded time-range join. The naive form is a cross join with a
  // range predicate (O(n*m)); banding by 10-minute buckets turns it into an
  // equi-join on (user_id, bucket) — each probe row explodes to 2 buckets, so
  // cost is O(n + matches) with a single shuffle. This is the scale path for
  // interval joins at 100 TB; the DuckDB oracle states the naive semantics.
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val bucket: Column => Column = c => floor(unix_micros(c) / lit(600000000L))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"), bucket(col("ts")).as("cb"))
    val probes = errors
      .withColumn("b", explode(array(bucket(col("ts")), bucket(col("ts")) - 1)))
    val matched = probes
      .join(clicks, col("user_id") === col("c_user") && col("b") === col("cb"))
      .filter(col("cts") >= col("ts") - expr("INTERVAL 10 MINUTES") && col("cts") < col("ts"))
      .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
    errors.select("event_id").join(matched, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("event_id")
  }

  private val qRangeJoinSql =
    """SELECT a.event_id, COUNT(b.event_id) AS n_clicks
      |FROM (SELECT * FROM events WHERE event_type = 'error') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      |  ON b.user_id = a.user_id AND b.ts >= a.ts - INTERVAL 10 MINUTE AND b.ts < a.ts
      |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin

  // --- q_asof_join: last signup strictly before each purchase, per user.
  // Implemented as a single window pass (one shuffle on user_id) rather than a
  // per-row backward search — the sort-merge as-of pattern.
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .withColumn("last_signup_ms",
        unix_millis(max(when(col("event_type") === "signup", col("ts"))).over(w)))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "last_signup_ms")
      .orderBy("event_id")
  }

  private val qAsofJoinSql =
    """SELECT event_id, user_id, last_signup_ms FROM (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ms(MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS last_signup_ms
      |  FROM events) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // --- q_median: exact per-priority median order price. Both engines
  // interpolate in the CENT-integer domain — (a+b)/2 over integer cents is
  // an EXACT double (no ulp drift between libms), so the oracle can hash
  // the result bit-for-bit. At scale this is Spark's single-pass exact
  // percentile aggregate (one shuffle on the group key), not a full sort.
  def qMedian(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderpriority")
      .agg(percentile(col("cents"), lit(0.5)).as("median_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private val qMedianSql =
    """SELECT o_orderpriority,
      |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_cents,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_percentiles: exact quartile profile per priority — the
  // distribution summary dashboards actually plot. Same cent-integer
  // contract as q_median, restricted to BINARY fractions (.25/.5/.75):
  // (b-a)·2⁻² products over integer cents are EXACT doubles, so any
  // interpolation formula either engine uses lands on the same bits.
  // One single-pass percentile aggregate, one shuffle on the group key.
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderpriority")
      // ONE array-percentile aggregate, not three scalar ones: each scalar
      // percentile builds and merges its own per-group counts map (3x the
      // buffer work, merged in one final task); the array form computes
      // every fraction from a single shared buffer with the SAME
      // interpolation — values bit-identical
      .agg(percentile(col("cents"), array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"),
        element_at(col("ps"), 1).as("p25_cents"),
        element_at(col("ps"), 2).as("p50_cents"),
        element_at(col("ps"), 3).as("p75_cents"),
        col("n_orders"))
      .orderBy("o_orderpriority")

  private val qPercentilesSql =
    """SELECT o_orderpriority,
      |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) AS p25_cents,
      |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS p50_cents,
      |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) AS p75_cents,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q8_market_share: TPC-H Q8 re-expressed on this schema — one
  // nation's supplier share of a region's PROMO-part revenue by year.
  // Star shape: part/supplier/nation/region prune-then-broadcast; the
  // lineitem⨝orders fact join shuffles once; numerator and denominator are
  // exact decimal sums cast to double, so the final share division is one
  // deterministic IEEE op in both engines.
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_type") === "PROMO").select("p_partkey")
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val custNation = t(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = t(s, dir, "customer")
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "CHINA", vol)
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
        sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  private val q8Sql =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'CHINA'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS mkt_share,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q16_parts_suppliers: TPC-H Q16 on this schema — how many distinct
  // suppliers serve each surviving (brand, type, size) part segment.
  // Anti-join the excluded brand (broadcast), then a distinct-aggregate on
  // the pruned fact join: COUNT(DISTINCT) runs as Spark's two-phase
  // expand+partial path — no per-group candidate sets on the driver.
  def q16PartsSuppliers(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 30)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
      .limit(20)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 30
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin

  // --- q_approx_distinct: exact twin for the oracle; the HLL variant is
  // asserted within 5% of this in OperatorsSpec (approx_count_distinct).
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")

  private val qApproxDistinctSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_funnel: ordered conversion funnel over the event stream —
  // view → click → purchase, each stage's timestamp strictly after the
  // previous stage's, per user. Three chained per-user min-aggregations +
  // equi-joins on user_id: every step shuffles ONLY per-user aggregates
  // (never the raw event stream twice), so the plan is a narrow chain of
  // hash joins that scales with #users — the standard product-analytics
  // funnel on 100 TB of events. Counts are exact integers (no float path).
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = e.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = e.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.select(lit("1_view").as("stage"), col("user_id"))
      .union(t2.select(lit("2_click"), col("user_id")))
      .union(t3.select(lit("3_purchase"), col("user_id")))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  private val qFunnelSql =
    """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN t1 ON t1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
      |SELECT stage, COUNT(*) AS n_users FROM (
      |  SELECT '1_view' AS stage, user_id FROM t1
      |  UNION ALL SELECT '2_click', user_id FROM t2
      |  UNION ALL SELECT '3_purchase', user_id FROM t3)
      |GROUP BY stage ORDER BY stage""".stripMargin

  // --- q_retention: weekly cohort retention — users cohorted by their
  // first signup week, counted in each later week they were active. The
  // cohort side reduces to one row per user (map-side combined min) before
  // the join; the activity side is distinct (user, week) pairs — both
  // shuffles carry per-user/week aggregates, never the raw event stream
  // twice. Offsets are exact integers (week-truncated days / 7).
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min("ts")).as("cohort_week"))
    val activity = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("act_week")).distinct()
    cohort.join(activity, "user_id")
      .filter(col("act_week") >= col("cohort_week"))
      .withColumn("week_offset",
        (datediff(col("act_week"), col("cohort_week")) / 7).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users")) // (user, week) already distinct
      .orderBy("cohort_week", "week_offset")
  }

  private val qRetentionSql =
    """WITH c AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events)
      |SELECT cohort_week,
      |  CAST(datediff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
      |  COUNT(*) AS n_users
      |FROM c JOIN a USING (user_id)
      |WHERE act_week >= cohort_week
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- q4_order_priority: TPC-H Q4 on this schema (no l_commitdate /
  // l_receiptdate): orders in one quarter with at least one LATE line
  // (shipped >30 days after the order date), counted per priority. The
  // EXISTS becomes a LEFT SEMI join — Catalyst keeps it semi all the way
  // down, so no order row is ever duplicated by its matching lines and the
  // aggregate sees each order once.
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), "leftsemi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q7_nation_volume: TPC-H Q7 — shipping volume between two nations,
  // both directions, per ship year. The supplier and customer sides each
  // reduce to a broadcastable (key, nation) map BEFORE touching the facts;
  // the only shuffle is lineitem⨝orders. The nation-pair filter runs on
  // the broadcast outputs, so non-qualifying rows die in the map stage.
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_3", "NATION_7")
    val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
    val supp = t(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_3', 'NATION_7')
      |  AND n2.n_name IN ('NATION_3', 'NATION_7')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --- q12_priority_class: TPC-H Q12 on this schema (no l_shipmode /
  // l_receiptdate): per return flag, how many 1997-shipped lines belong to
  // critical (URGENT/HIGH) vs other orders. One fact-fact equi-join, then
  // conditional counts in a single hash aggregate — the Q12 shape.
  def q12PriorityClass(s: SparkSession, dir: String): DataFrame = {
    val critical = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q13_customer_distribution: TPC-H Q13 — the distribution of orders
  // per customer, INCLUDING zero-order customers (the left outer join is
  // the point of the query). Group-on-group: per-customer counts first
  // (map-side combinable), then the tiny histogram aggregate. The priority
  // filter stands in for Q13's o_comment NOT LIKE.
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    val perCust = t(s, dir, "customer").select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // COUNT(col): NULLs (no orders) -> 0
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- q15_top_supplier: TPC-H Q15 — the supplier(s) with the maximum
  // quarterly revenue. The revenue comparison happens in EXACT decimal on
  // both engines (ties included), and only the output casts to double; the
  // max is a one-row broadcast back onto the per-supplier aggregate, never
  // a second scan of the facts.
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .as("rev_exact"))
      .cache() // feeds its own 1-row max AND the equality filter
    val top = rev.join(broadcast(rev.agg(max("rev_exact").as("rev_max"))),
      col("rev_exact") === col("rev_max"))
    top.join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("supplier_no") === col("s_suppkey"))
      .select(col("supplier_no"), col("s_name"),
        col("rev_exact").cast("double").as("total_revenue"))
      .orderBy("supplier_no")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT supplier_no, s_name, CAST(rev_exact AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON supplier_no = s_suppkey
      |WHERE rev_exact = (SELECT MAX(rev_exact) FROM rev)
      |ORDER BY supplier_no""".stripMargin

  // --- q21_waiting_supplier: TPC-H Q21 on this schema — suppliers who
  // were the ONLY late shipper (>60 days after the order date) in a
  // finished multi-supplier order. Q21's EXISTS/NOT-EXISTS pair collapses
  // into ONE hash aggregate per order (distinct-supplier and late-supplier
  // counts side by side), so the facts are scanned once instead of three
  // times; `max(when(late))` recovers the culprit key without a re-join.
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val perOrder = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
        max(when(late, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    perOrder.groupBy("late_supp")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """WITH per_order AS (
      |  SELECT o_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |      THEN l_suppkey END) AS n_late_supp,
      |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |      THEN l_suppkey END) AS late_supp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY o_orderkey)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM per_order JOIN supplier ON late_supp = s_suppkey
      |WHERE n_supp >= 2 AND n_late_supp = 1
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // --- q22_global_sales: TPC-H Q22 on this schema (nation key stands in
  // for the phone country code) — well-funded customers with no RECENT
  // orders (none since 2000, Q22's "no orders for 7 years"), per nation.
  // The positive-balance mean is computed on integer cents (order-free
  // sum, bit-identical across engines) and broadcast as one row; the
  // inactivity test is a LEFT ANTI join against the date-pruned orders.
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val thresh = cust.filter(col("cents") > 0)
      .agg((sum(col("cents")).cast("double") / count(lit(1))).as("avg_cents"))
    cust.join(broadcast(thresh))
      .filter(col("cents").cast("double") > col("avg_cents"))
      .join(t(s, dir, "orders").filter(col("o_orderdate") >= ts("2000-01-01"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("cents")).cast("double") / 100.0).as("totacctbal"))
      .orderBy("cntry")
  }

  private val q22Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7)),
      |t AS (SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS avg_cents
      |  FROM cust WHERE cents > 0)
      |SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
      |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS totacctbal
      |FROM cust, t
      |WHERE CAST(cents AS DOUBLE) > avg_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_json_extract: semi-structured extraction — pull a typed field
  // out of the JSON `props` payload and aggregate it per event type (the
  // ubiquitous telemetry-pipeline pattern). One JSON parse per row feeding
  // a map-side-combinable integer aggregate; no shuffle beyond the tiny
  // per-type groups. Integer sums keep the oracle bit-exact.
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  private val qJsonExtractSql =
    """SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // EUROPE suppliers with their nation name — the shared dim block for
  // the Q2/Q20 adaptations. Supplier × nation × region is dim-sized at
  // any scale factor (TPC-H suppliers are 0.01% of lineitems), so the
  // whole block broadcasts.
  private def europeSuppliers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")

  // --- q2_min_cost_supplier: TPC-H Q2 re-expressed without a partsupp
  // table: the supply catalog is DERIVED from observed lineitems — per
  // (part, supplier) the minimum quantized unit price — and Q2's
  // correlated min-cost subquery becomes a per-part min + equi-join back
  // on (part, cost). Dims broadcast; the one wide shuffle carries the
  // (part, supplier) aggregate (map-side combined), never raw lineitems
  // twice. Unit prices are quantized to 1e-4 BEFORE the min so the join
  // key is an exact integer in both engines.
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val ps = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(lit(10000.0) * col("l_extendedprice") / col("l_quantity"))
        .cast("long")).as("supply_cost"))
    val part = t(s, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size") <= 15)
      .select("p_partkey")
    // cached: eligible feeds BOTH the per-part min and the final join —
    // uncached, the full lineitem supply-catalog aggregate runs twice
    val eligible = ps
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(europeSuppliers(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .cache()
    val minCost = eligible.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min("supply_cost").as("min_cost"))
    eligible.join(broadcast(minCost),
        col("p_partkey") === col("mc_partkey") &&
          col("supply_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("supply_cost"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(round(10000 * l_extendedprice / l_quantity) AS BIGINT)) AS supply_cost
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      |eligible AS (
      |  SELECT p_partkey, supply_cost, s_acctbal, s_name, n_name
      |  FROM ps JOIN part ON l_partkey = p_partkey JOIN eu ON l_suppkey = s_suppkey
      |  WHERE p_type = 'LARGE' AND p_size <= 15)
      |SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
      |FROM eligible e
      |WHERE supply_cost = (SELECT MIN(supply_cost) FROM eligible e2
      |  WHERE e2.p_partkey = e.p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // --- q9_product_profit: TPC-H Q9 with supply cost proxied by the
  // part's retail price (this schema has no partsupp): profit per
  // supplier nation per order year over 'widget' parts. Revenue and cost
  // stay two SEPARATE exact decimal sums (two-factor decimal products
  // only — a three-factor chain would overflow Spark's 38-digit cap and
  // silently rescale), differenced once post-aggregate. Part and
  // supplier dims broadcast; lineitem⋈orders is the one fact shuffle.
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val one = lit(1).cast(DecimalType(18, 2))
    val revenue = sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
    val cost = sum(dec(col("p_retailprice")) * dec(col("l_quantity")))
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(revenue.cast("double").as("revenue"),
        cost.cast("double").as("supply_cost"),
        (revenue - cost).cast("double").as("profit"))
      .orderBy(asc("n_name"), desc("o_year"))
  }

  private val q9Sql =
    """SELECT n_name, year(o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supply_cost,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
      |     - SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  // --- q11_important_parts: TPC-H Q11 with the inventory ledger derived
  // from one nation's suppliers' lineitems: per-part total value, kept
  // when above a fixed fraction of the grand total. The grand total is a
  // 1-row aggregate broadcast back over the per-part values (Q11's scalar
  // subquery), decimals exact until the final double emit; the threshold
  // compare runs in double on BOTH engines so the cast point is shared.
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    // cached: vals feeds the grand total AND the threshold filter —
    // uncached, the lineitem aggregate runs once per branch
    val vals = t(s, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(dec(col("l_extendedprice"))).as("value0"))
      .cache()
    val total = vals.agg(sum(col("value0")).cast("double").as("total0"))
    vals.crossJoin(broadcast(total))
      .filter(col("value0").cast("double") > col("total0") * lit(0.001))
      .select(col("l_partkey").as("p_partkey"),
        col("value0").cast("double").as("part_value"))
      .orderBy(desc("part_value"), asc("p_partkey"))
  }

  private val q11Sql =
    """WITH supp AS (SELECT s_suppkey FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
      |vals AS (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value0
      |  FROM lineitem JOIN supp ON l_suppkey = s_suppkey GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(value0 AS DOUBLE) AS part_value
      |FROM vals
      |WHERE CAST(value0 AS DOUBLE) >
      |  (SELECT CAST(SUM(value0) AS DOUBLE) FROM vals) * CAST(0.001 AS DOUBLE)
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  // --- q20_excess_shipments: TPC-H Q20's nested semi-join reduction on
  // this schema: EUROPE suppliers whose 1997 shipments of widget parts
  // exceeded a fixed volume. Part filter broadcasts into the date-pruned
  // lineitem scan, the per-supplier quantity aggregate map-side combines
  // before its (tiny, #suppliers-sized) shuffle, and the supplier dim
  // broadcasts onto the result — no fact-fact shuffle anywhere.
  def q20ExcessShipments(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_name").contains("widget"))
      .select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_quantity"))).as("qty0"))
    shipped
      .join(broadcast(europeSuppliers(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .filter(col("qty0") > lit(300).cast(DecimalType(18, 2)))
      .select(col("s_name"), col("n_name"), col("qty0").cast("double").as("ship_qty"))
      .orderBy("s_name")
  }

  private val q20Sql =
    """SELECT s_name, n_name, CAST(qty0 AS DOUBLE) AS ship_qty
      |FROM (SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty0
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%widget%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1)
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND qty0 > 300
      |ORDER BY s_name""".stripMargin

  // --- q_histogram: fixed-width numeric histogram (the OLAP
  // width_bucket primitive) over order totals plus per-bucket exact
  // decimal mass — one map-side-combinable hash agg keyed by the bucket
  // id; the bucket is floor of one IEEE double division, identical in
  // both engines, and the mass is an exact decimal sum.
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / 25000).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("mass"))
      .orderBy("bucket")

  private val qHistogramSql =
    """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_unpivot: wide→long reshaping (UNPIVOT / melt) — the inverse of
  // q_pivot and the step every metrics store runs to turn a wide measure
  // row into (entity, measure, value) facts. The unpivot happens AFTER the
  // aggregate, so `stack` runs over |returnflags|·3 rows — at any corpus
  // size the reshape is output-sized; the only corpus-sized work is the
  // one partial-agg shuffle.
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(dec(col("l_discount"))).cast("double").as("sum_disc"))
      .select(col("l_returnflag"),
        expr("stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, " +
          "'sum_disc', sum_disc) AS (measure, value)"))
      .orderBy("l_returnflag", "measure")

  private val qUnpivotSql =
    """WITH a AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
      |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
      |ORDER BY l_returnflag, measure""".stripMargin

  // --- q_histogram_equidepth: 8-bin EQUI-DEPTH histogram of order values
  // — the histogram a query optimizer or distribution dashboard actually
  // wants (equal mass per bin, boundaries where the data is), completing
  // q_histogram's fixed-width variant. Boundaries are the exact k/8
  // percentiles over int-cents: BINARY fractions, so the interpolation
  // (b-a)·k·2⁻³ over integers is an EXACT double in both engines (the
  // q_percentiles contract). The plan is one percentile aggregate (7
  // values, broadcast) + a codegen'd comparison assignment + a bounded
  // hash agg — no sort, no window, no NTILE single-task shuffle.
  def qHistogramEquidepth(s: SparkSession, dir: String): DataFrame = {
    // spread: both the percentile partials and the binning pass otherwise
    // run inside a single-split scan stage (guide §2.5); only the 8-byte
    // cents column moves
    val cents = graft.GraftSession.spread(t(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents")))
    val fracs = (1 to 7).map(k => k / 8.0)
    // ONE array-percentile aggregate, not seven scalar ones: each scalar
    // percentile built and merged its OWN counts map over every order row,
    // and the seven final merges ran in one task (a measured 1.1 s
    // single-task stage); the array form shares a single buffer and
    // interpolates identically — boundary values bit-identical
    val bounds = cents.agg(
      percentile(col("cents"), array(fracs.map(lit): _*)).as("bs"))
    val bin = (1 to 7).map(k => (col("cents") > element_at(col("bs"), k)).cast("long"))
      .reduce(_ + _) + 1L
    cents.crossJoin(broadcast(bounds))
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
      .orderBy("bin")
  }

  private val qHistogramEquidepthSql =
    """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |b AS (SELECT quantile_cont(cents, 0.125) AS b1, quantile_cont(cents, 0.25) AS b2,
      |    quantile_cont(cents, 0.375) AS b3, quantile_cont(cents, 0.5) AS b4,
      |    quantile_cont(cents, 0.625) AS b5, quantile_cont(cents, 0.75) AS b6,
      |    quantile_cont(cents, 0.875) AS b7 FROM c)
      |SELECT bin, COUNT(*) AS n_orders,
      |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
      |FROM (SELECT cents,
      |    1 + CAST(cents > b1 AS BIGINT) + CAST(cents > b2 AS BIGINT)
      |      + CAST(cents > b3 AS BIGINT) + CAST(cents > b4 AS BIGINT)
      |      + CAST(cents > b5 AS BIGINT) + CAST(cents > b6 AS BIGINT)
      |      + CAST(cents > b7 AS BIGINT) AS bin
      |  FROM c, b)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_heavy_hitters: Count-Min-sketch heavy hitters with the exact
  // counts alongside — the streaming-sketch primitive (512×3 integer
  // counters summarize any event volume; estimate = min over 3 hashed
  // rows, always >= exact). Hashes are md5-derived 64-bit values (DuckDB's
  // md5_number_lower) so both engines compute identical buckets; bucket
  // count is a POWER OF TWO, which makes signed-long pmod equal DuckDB's
  // unsigned modulo (2^64 ≡ 0 mod 512). Everything is exact integers:
  // sketch build is one (seed, bucket) hash agg over a 3-way explode,
  // estimates come from a #types-sized broadcast join.
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    def md5lower(c: Column): Column = {
      val hx = md5(c.cast("binary"))
      def hb(i: Int) = substring(hx, i, 2)
      val lo = conv(concat(hb(23), hb(21), hb(19), hb(17)), 16, 10).cast("long")
      val hi = conv(concat(hb(31), hb(29), hb(27), hb(25)), 16, 10).cast("long")
      shiftleft(hi, 32).bitwiseOR(lo)
    }
    def bucket(tpe: Column, seed: Int): Column =
      pmod(md5lower(concat(tpe, lit("#"), lit(seed.toString))), lit(512))
    // spread: the 3-way md5 bucket explode runs in the scan stage — one
    // split means one core computes 3 md5-hex-conv chains per event
    val ev = graft.GraftSession.spread(t(s, dir, "events").select(col("event_type")))
    val sketch = ev
      .select(explode(array((0 until 3).map(sd =>
        struct(lit(sd).as("seed"), bucket(col("event_type"), sd).as("bucket"))): _*))
        .as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("total"))
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
    val probes = exact.select(col("event_type"), col("exact_n"),
      explode(array((0 until 3).map(sd =>
        struct(lit(sd).as("seed"), bucket(col("event_type"), sd).as("bucket"))): _*))
        .as("sb"))
      .select(col("event_type"), col("exact_n"),
        col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy("event_type", "exact_n")
      .agg(min("total").as("cm_est"))
      .select(col("event_type"), col("exact_n"), col("cm_est"),
        (col("cm_est") - col("exact_n")).as("overcount"))
      .orderBy(desc("exact_n"), asc("event_type"))
  }

  private val qHeavyHittersSql =
    """WITH ev AS (SELECT event_type FROM events),
      |sk AS (SELECT seed, CAST(md5_number_lower(event_type || '#' || seed) % 512 AS BIGINT) AS bucket,
      |    COUNT(*) AS total
      |  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2]) AS seed) GROUP BY 1, 2),
      |ex AS (SELECT event_type, COUNT(*) AS exact_n FROM ev GROUP BY 1),
      |pr AS (SELECT ex.event_type, ex.exact_n, s.seed,
      |    CAST(md5_number_lower(ex.event_type || '#' || s.seed) % 512 AS BIGINT) AS bucket
      |  FROM ex CROSS JOIN (SELECT unnest([0, 1, 2]) AS seed) s)
      |SELECT pr.event_type, pr.exact_n, MIN(sk.total) AS cm_est,
      |  MIN(sk.total) - pr.exact_n AS overcount
      |FROM pr JOIN sk ON pr.seed = sk.seed AND pr.bucket = sk.bucket
      |GROUP BY 1, 2 ORDER BY exact_n DESC, event_type""".stripMargin

  // --- q_full_outer: FULL OUTER join with unmatched-side accounting —
  // the reconciliation-report shape (ledger vs ledger): per-customer
  // order rollup full-outer-joined to a deliberately-pruned customer dim,
  // classified into both / order_only / customer_only. The rollup reduces
  // the fact side BEFORE the join (aggregate-sized shuffle), and the
  // outer join itself is the only full-width exchange.
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .filter(col("o_custkey") % 5 =!= 0) // prune the fact side too, so
      .groupBy("o_custkey")               // customer_only rows exist
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).as("spend"))
    val cust = t(s, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0)
      .select("c_custkey", "c_mktsegment")
    perCust.join(cust, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
          .when(col("o_custkey").isNotNull, "order_only")
          .otherwise("customer_only").as("match_type"),
        col("n_orders"), col("spend"))
      .groupBy("match_type")
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum("n_orders"), lit(0)).cast("long").as("n_orders"),
        coalesce(sum("spend").cast("double"), lit(0.0)).as("total_spend"))
      .orderBy("match_type")
  }

  private val qFullOuterSql =
    """WITH pc AS (SELECT o_custkey, COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders WHERE o_custkey % 5 <> 0 GROUP BY 1),
      |c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0)
      |SELECT CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
      |            WHEN o_custkey IS NOT NULL THEN 'order_only'
      |            ELSE 'customer_only' END AS match_type,
      |  COUNT(*) AS n_keys,
      |  CAST(COALESCE(SUM(n_orders), 0) AS BIGINT) AS n_orders,
      |  COALESCE(CAST(SUM(spend) AS DOUBLE), 0.0) AS total_spend
      |FROM pc FULL OUTER JOIN c ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_gap_fill: dense time-grid gap filling — every hour in each
  // event type's observed range gets a row, zero-filled where no events
  // landed (the dashboard/telemetry primitive that makes windowed charts
  // and anomaly baselines honest). The grid generates from a #types-row
  // aggregate (sequence explode — O(types × hours), never a scan of raw
  // events), left-joined back to the hourly counts.
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .cache() // feeds the range aggregate AND the fill join
    val grid = hourly.groupBy("event_type")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "hour")
  }

  private val qGapFillSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
      |  FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
      |    FROM hourly GROUP BY 1))
      |SELECT g.event_type, g.hour, COALESCE(hourly.n, 0) AS n
      |FROM g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.hour = hourly.hour
      |ORDER BY g.event_type, g.hour""".stripMargin

  // --- q_decile_report: NTILE decile profile of order totals — the
  // value-distribution report (who's in the top 10%?). Semantically this
  // is NTILE(10) ordered by (price, key) — a TOTAL order, so tile
  // boundaries are deterministic across engines even where prices tie —
  // but a global NTILE window is a SINGLE-TASK sort of the whole fact
  // table, so the plan is the two-phase distributed rank instead (same
  // shape as x_pack's prefix sum): rows bucket by a fixed price width
  // (order-preserving: higher bucket ⇒ strictly higher price), phase 1
  // ranks within each (parallel) bucket, phase 2 broadcast-joins each
  // bucket's tiny start offset to form the exact global rank, and the
  // decile falls out of NTILE's ceil/floor arithmetic on (rank, n).
  // Parallelism scales with the value range, not 1; output is
  // bit-identical to the single-window formulation the oracle states.
  def qDecileReport(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bkt", floor(col("o_totalprice") / 1000.0))
    val wLocal = Window.partitionBy("bkt")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wOffset = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1) // tiny: one row per bucket
    val offsets = orders.groupBy("bkt").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wOffset), lit(0L)))
      .select("bkt", "off")
    val total = orders.groupBy().agg(count(lit(1)).as("n_total"))
    val ranked = orders
      .withColumn("lr", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("bkt"))
      .crossJoin(broadcast(total))
      .withColumn("rk", col("lr") + col("off"))
    // NTILE(k): first (n mod k) tiles hold ceil(n/k) rows, the rest floor.
    // `div` is true long division — exact at any row count (a double
    // floor(a/b) can be off by one once quotients pass ~2^50).
    ranked
      .withColumn("q", expr("n_total div 10"))
      .withColumn("r", col("n_total") % 10L)
      .withColumn("cut", col("r") * (col("q") + 1L))
      .withColumn("decile",
        when(col("rk") <= col("cut"), expr("(rk - 1) div (q + 1)") + 1L)
          .otherwise(col("r") + expr("(rk - cut - 1) div greatest(q, 1L)") + 1L))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        sum(dec(col("o_totalprice"))).cast("double").as("mass"))
      .withColumn("decile", col("decile").cast("long"))
      .orderBy("decile")
  }

  private val qDecileReportSql =
    """SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM (SELECT o_orderkey, o_totalprice,
      |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_cube: full CUBE over (returnflag, linestatus) — all four
  // grouping combinations (detail, each single-dim margin, grand total)
  // in ONE partial-agg-friendly pass; completes the rollup/grouping-sets
  // family. Same scale shape as q_rollup: Catalyst expands the cube in a
  // single hash aggregate, the output is grouping-cardinality-sized.
  // Margin rows are identified by GROUPING() in BOTH engines — a sentinel
  // via coalesce would conflate margins with genuine NULL (or literal
  // 'ALL') dimension values on an arbitrary corpus.
  def qCube(s: SparkSession, dir: String): DataFrame =
    // spread: the cube expands every row 4x INSIDE the scan stage's
    // partial aggregate — a single-split scan runs that 4x expansion on
    // one core (guide §2.5); only the 4 needed columns move
    graft.GraftSession.spread(t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"))
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("returnflag"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("linestatus"),
        col("n"), col("sum_qty"), col("sum_price"))
      .orderBy("returnflag", "linestatus")

  private val qCubeSql =
    """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
      |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY returnflag NULLS FIRST, linestatus NULLS FIRST""".stripMargin

  // --- q_percent_rank: relative-standing profile of customer spend —
  // percent_rank + cume_dist over a TOTAL order (spend, custkey), so
  // tied spends rank deterministically across engines. One aggregate
  // (map-side partials) feeds the rank window. NB: Window.orderBy with no
  // partitionBy moves ALL aggregated rows through a SINGLE task (Spark
  // warns about this) — acceptable here only because the window input is
  // the per-customer aggregate, not raw orders; a 100 TB-cardinality key
  // would need the q_window_rank-style two-phase ranked shape instead.
  // Both rank functions are rank-arithmetic, exact in IEEE doubles.
  def qPercentRank(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("spend"))
    val w = Window.orderBy(col("spend"), col("o_custkey"))
    spend
      .select(col("o_custkey"), col("spend"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .filter(col("pct_rank") >= 0.99)
      .orderBy("o_custkey")
  }

  private val qPercentRankSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY 1)
      |SELECT o_custkey, spend,
      |  percent_rank() OVER (ORDER BY spend, o_custkey) AS pct_rank,
      |  cume_dist() OVER (ORDER BY spend, o_custkey) AS cume
      |FROM spend QUALIFY pct_rank >= 0.99 ORDER BY o_custkey""".stripMargin

  // --- q_latest_per_key: latest event per user (the argmax/dedup-to-
  // current-state primitive behind every CDC snapshot and feature-store
  // read). ONE window shuffle on user_id with a deterministic
  // (ts, event_id) tiebreak — never a self-join against max(ts), which
  // would scan twice and still tie-break wrong.
  def qLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .orderBy("user_id")
  }

  private val qLatestPerKeySql =
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
      |FROM (SELECT user_id, event_id, ts, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  // --- q_moving_avg: 7-day trailing moving average of daily event value per
  // event_type — the dashboard smoothing primitive. ONE shuffle builds the
  // daily aggregate (map-side combined), then the frame window runs inside
  // per-event_type partitions whose size is bounded by #days, never #events
  // — the 100 TB shape. Day totals stay exact DECIMAL through the frame
  // sum; only the final average divides as double (round 6).
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(dec(col("value"))).as("day_total"))
      .withColumn("day_num", unix_date(col("day")).cast("long"))
    // RANGE over epoch-day integers, not ROWS: a type with gap days must
    // average over the last 7 CALENDAR days (a ROWS frame would silently
    // stretch across the last 7 ACTIVE days — weeks, on sparse types)
    val w = Window.partitionBy("event_type").orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("ma7", round(
        sum("day_total").over(w).cast("double") / count(lit(1)).over(w).cast("double"), 6))
      .select(col("day"), col("event_type"),
        col("day_total").cast("double").as("day_total"), col("ma7"))
      .orderBy("day", "event_type")
  }

  private val qMovingAvgSql =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS day_total
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT day, event_type, CAST(day_total AS DOUBLE) AS day_total,
      |  round(CAST(SUM(day_total) OVER w AS DOUBLE)
      |    / CAST(COUNT(*) OVER w AS DOUBLE), 6) AS ma7
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day, event_type""".stripMargin

  // --- q_lead_lag: day-over-day deltas of daily event counts per type —
  // the trend/regression-detector primitive. Pure integer arithmetic
  // (counts and their differences), so bit-exact across engines; the lag
  // window shares the daily aggregate's partitioning (one shuffle total,
  // partitions bounded by #days per type).
  def qLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("delta", col("n") - lag("n", 1).over(w))
      .withColumn("next_n", lead("n", 1).over(w))
      .orderBy("day", "event_type")
  }

  private val qLeadLagSql =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |  n - lag(n) OVER w AS delta, lead(n) OVER w AS next_n
      |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |ORDER BY day, event_type""".stripMargin

  // --- q_set_ops: INTERSECT/EXCEPT cohort counts — customers active in
  // 1995 vs 1996 (churn/retention set algebra). Spark's intersect/except
  // lower to distinct + semi/anti hash joins on o_custkey: two pushed-down
  // scans, key-only shuffles, no row payload movement — the set-op shape
  // that survives any fact-table size.
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct()
    val y95 = yr(1995)
    val y96 = yr(1996)
    def cohort(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_cust")).select(lit(name).as("cohort"), col("n_cust"))
    cohort("both", y95.intersect(y96))
      .unionByName(cohort("only_1995", y95.except(y96)))
      .unionByName(cohort("only_1996", y96.except(y95)))
      .orderBy("cohort")
  }

  private val qSetOpsSql =
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      |y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_cust
      |  FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
      |UNION ALL
      |SELECT 'only_1995', CAST(COUNT(*) AS BIGINT)
      |  FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
      |UNION ALL
      |SELECT 'only_1996', CAST(COUNT(*) AS BIGINT)
      |  FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
      |ORDER BY cohort""".stripMargin

  // --- q_correlated: orders priced above their customer's average — a
  // correlated scalar subquery driven through the SQL front end, so
  // Catalyst's decorrelation owns the rewrite (subquery → aggregate +
  // join; never a per-row re-execution). The above-average test is stated
  // in exact DECIMAL cross-multiplication (p·n > Σp), so the boundary is
  // bit-identical across engines — a double AVG would make edge rows
  // engine-dependent. Scale: one per-customer aggregate + one key join.
  def qCorrelated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q_corr_orders")
    s.sql(
      """WITH o AS (SELECT o_custkey, o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM graft_q_corr_orders)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM o
        |WHERE p * (SELECT COUNT(*) FROM o o2 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT SUM(o3.p) FROM o o3 WHERE o3.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val qCorrelatedSql =
    """WITH o AS (SELECT o_custkey, o_orderpriority,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      |FROM o
      |WHERE p * (SELECT COUNT(*) FROM o o2 WHERE o2.o_custkey = o.o_custkey)
      |    > (SELECT SUM(o3.p) FROM o o3 WHERE o3.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q_string_agg: per-nation sorted CSV of its customers' market
  // segments — the LISTAGG/STRING_AGG reporting shape. Distinct pairs are
  // reduced FIRST (the shuffle carries one row per (nation, segment),
  // bounded by |nations|x|segments|, never per-customer rows with string
  // payload); the collect_set is over that bounded set, and array_sort +
  // concat_ws makes the CSV order total, so both engines emit the same
  // string byte-for-byte.
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
    pairs.groupBy("c_nationkey")
      .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
        concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_segments"), col("segments"))
      .orderBy("n_name")
  }

  private val qStringAggSql =
    """WITH pairs AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      |SELECT n.n_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_segments,
      |  string_agg(p.c_mktsegment, ',' ORDER BY p.c_mktsegment) AS segments
      |FROM pairs p JOIN nation n ON p.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  // --- q_sessions: batch sessionization of the events stream — a new
  // session starts after a >30-min gap (st_sessionize's batch twin, and
  // the canonical lag -> flag -> running-count window chain). All windows
  // are partitioned BY USER, so the shuffle is one hash exchange on
  // user_id and no partition outgrows a user's event count; timestamps
  // compare as integer microseconds (unix_micros / epoch_us) so the gap
  // test is bit-identical across engines.
  def qSessions(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "sess_id").agg(count(lit(1)).as("sz"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("sz")).as("longest_session"),
        sum(col("sz")).as("n_events"))
      .orderBy("user_id")
  }

  private val qSessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged),
      |per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS sz FROM sess GROUP BY 1, 2)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(MAX(sz) AS BIGINT) AS longest_session,
      |  CAST(SUM(sz) AS BIGINT) AS n_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- q_active_intervals: sweep-line concurrency — treating each order
  // as an open interval [orderdate, orderdate+30d), the top-10 days by
  // number of simultaneously-open orders. The classic interval-overlap
  // counting shape WITHOUT a range join: +1/-1 boundary events, a
  // map-side-combinable per-day net, then ONE running sum over the
  // day-level aggregate. The global window is single-partition by
  // construction but its input is bounded by |distinct days| (~2.5k for
  // any corpus size — date arithmetic caps it), so the pattern holds at
  // 100 TB where a per-order window would not.
  def qActiveIntervals(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select(to_date(col("o_orderdate")).as("d"))
    val deltas = ord.select(col("d"), lit(1L).as("delta"))
      .unionAll(ord.select(date_add(col("d"), 30).as("d"), lit(-1L).as("delta")))
    val daily = deltas.groupBy("d").agg(sum(col("delta")).as("net"))
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("d"), sum(col("net")).over(w).as("open_orders"))
      .orderBy(desc("open_orders"), asc("d"))
      .limit(10)
  }

  private val qActiveIntervalsSql =
    """WITH deltas AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
      |  UNION ALL
      |  SELECT CAST(o_orderdate AS DATE) + 30 AS d, -1 AS delta FROM orders),
      |daily AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d)
      |SELECT d, CAST(SUM(net) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
      |FROM daily ORDER BY open_orders DESC, d LIMIT 10""".stripMargin

  // --- q_window_funnel: time-anchored conversion funnel — the deepest
  // view→click→purchase chain each user completes within ONE HOUR of
  // their first view (the windowFunnel shape; q_funnel is its unbounded
  // sibling). Each step is a per-user min-aggregate joined to the
  // previous step's anchor, so every join is aggregate-sized (one row
  // per user) and the window test is pure integer microseconds. At scale:
  // three hash aggs + three key joins, no window function, no self-join
  // of raw events.
  def qWindowFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val hourUs = 3600L * 1000000L
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + hourUs)
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select("user_id", "t1", "t2"), "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t1") + hourUs)
      .groupBy("user_id").agg(min("us").as("t3"))
    val users = ev.select("user_id").distinct()
    users
      .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
          coalesce(col("s3"), lit(0))).cast("long").as("level"))
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")
  }

  private val qWindowFunnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT ev.user_id, MIN(ev.us) AS t2, MIN(v.t1) AS t1
      |  FROM ev JOIN v ON ev.user_id = v.user_id
      |  WHERE ev.event_type = 'click' AND ev.us > v.t1 AND ev.us <= v.t1 + 3600000000
      |  GROUP BY 1),
      |p AS (SELECT ev.user_id, MIN(ev.us) AS t3
      |  FROM ev JOIN c ON ev.user_id = c.user_id
      |  WHERE ev.event_type = 'purchase' AND ev.us > c.t2 AND ev.us <= c.t1 + 3600000000
      |  GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT CAST((CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END)
      |    + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
      |    + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS level,
      |  COUNT(*) AS n_users
      |FROM u LEFT JOIN v ON u.user_id = v.user_id
      |  LEFT JOIN c ON u.user_id = c.user_id
      |  LEFT JOIN p ON u.user_id = p.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q_bucketed_join: co-located fact-fact join — orders and lineitem
  // written as BUCKETED tables (8 buckets on the join key, sorted in
  // bucket), then joined with ZERO exchange on either side: the join
  // consumes the buckets' co-partitioning directly (PlanAuditSpec pins a
  // shuffle-free SortMergeJoin). This is THE pattern that amortizes the
  // big-join shuffle at 100 TB — pay the partitioning once at write time,
  // reuse it across every downstream join — and the battery's only op
  // exercising Spark's bucketed-table read path end to end.
  private def bucketTableNames(dir: String): (String, String) = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    (s"graft_bkt_orders_$suffix", s"graft_bkt_lineitem_$suffix")
  }

  /** Drops qBucketedJoin's catalog tables AND their warehouse dirs — a
    * fresh session may find the managed location on disk without the
    * catalog entry (warehouse outlives sessions), so both must go. */
  def dropBucketTables(s: SparkSession, dir: String): Unit = {
    val (ot, lt) = bucketTableNames(dir)
    for (tn <- Seq(ot, lt)) {
      s.sql(s"DROP TABLE IF EXISTS $tn")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.conf.warehousePath.stripSuffix("/") + "/" + tn)
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    }
  }

  /** Writes the bucketed tables and returns the LAZY co-located join plan
    * (split out so PlanAuditSpec can audit the physical plan). Callers own
    * cleanup: call [[dropBucketTables]] after materializing. */
  def qBucketedJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketTableNames(dir)
    // NB: no session-conf mutation here — auto bucketed scan (default on)
    // keeps the bucketed read by itself once the merge hint makes the join
    // need the buckets' distribution, and a set-without-restore would leak
    // planner behavior into every op that runs after this one
    dropBucketTables(s, dir)
    // repartition by the bucket key to the bucket count BEFORE the bucketed
    // write (guide §6, write.distribution-mode=hash): bucketBy alone writes
    // task-locally, so a narrow scan (one split at bench scale) sorts and
    // writes ALL buckets single-threaded — and a wide scan would write
    // #tasks x #buckets small files. The hash repartition matches the
    // bucket spec's partitioning, so each task owns whole buckets: same
    // file count (1 per bucket), parallel sort+write at any scale.
    t(s, dir, "orders").repartition(8, col("o_orderkey")).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").format("parquet").saveAsTable(ot)
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), dec(col("l_extendedprice")).as("price"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").format("parquet").saveAsTable(lt)
    // merge hint: at test SF the orders side fits a broadcast, which would
    // bypass the bucketed path entirely — the op exists to exercise the
    // co-located SortMergeJoin a 100 TB fact-fact join would use
    s.table(ot).hint("merge")
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("price")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val joined = qBucketedJoinPlan(s, dir)
    // materialize BEFORE cleanup (the plan reads the catalog tables
    // lazily); the collect is output-sized — |priorities| rows — and lets
    // the op drop its tables + warehouse dirs instead of leaking one pair
    // per dataset dir into shared catalog state where concurrent batteries
    // could race on the names
    val rows = joined.collect().toSeq
    val schema = joined.schema
    dropBucketTables(s, dir)
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  private val qBucketedJoinSql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q_yoy_growth: year-over-year revenue growth per nation — the
  // canonical trend report. Exact-decimal yearly sums first (a bounded
  // (nation, year) aggregate), then ONE lag window over that dim — the
  // window input is |nations|·|years| rows at any corpus size, never
  // order rows. Growth is a single rounded IEEE division of two decimals
  // both engines computed identically.
  def qYoyGrowth(s: SparkSession, dir: String): DataFrame = {
    val yearly = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy("n_name").orderBy("yr")
    yearly
      .withColumn("prev_rev", lag("rev", 1).over(w))
      .select(col("n_name"), col("yr"), col("rev").cast("double").as("revenue"),
        round((col("rev") - col("prev_rev")).cast("double") /
          col("prev_rev").cast("double"), 6).as("yoy_growth"))
      .orderBy("n_name", "yr")
  }

  private val qYoyGrowthSql =
    """WITH y AS (SELECT n.n_name, CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |    JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT n_name, yr, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev - lag(rev) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
      |    / CAST(lag(rev) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE), 6) AS yoy_growth
      |FROM y ORDER BY n_name, yr""".stripMargin

  // --- q_copurchase: market-basket co-occurrence — the top 20 part pairs
  // appearing on the same order. The self-join is keyed on o_orderkey, so
  // each block is one order's line items (bounded by order size, ~7) and
  // the pair expansion is O(orders · k²) with NO quadratic blow-up at any
  // corpus size — the same bounded-block argument as the dedup family's
  // shingle joins. Distinct parts per order first (a pair counts once per
  // order), pair counts combine map-side, top-20 via TakeOrdered.
  def qCopurchase(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    items.toDF("ok", "pa")
      .join(items.toDF("ok", "pb"), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), asc("pa"), asc("pb"))
      .limit(20)
  }

  private val qCopurchaseSql =
    """WITH i AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
      |FROM i a JOIN i b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 ORDER BY n_orders DESC, pa, pb LIMIT 20""".stripMargin

  // --- q_mode: modal value per group — each nation's most common customer
  // market segment with its count. MODE() restated as two hash aggregates
  // (count per (group, value), then max_by with a count-then-value
  // tie-break) — both map-side-combinable, no window over raw rows, the
  // shape that holds when one group spans millions of rows. The tie-break
  // (higher count wins, then LOWER segment string) is total, so both
  // engines pick the identical mode.
  def qMode(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy("c_nationkey")
      .agg(
        // min over (-cnt, segment): highest count wins, ties break toward
        // the lexicographically smallest segment — a total order
        min_by(col("c_mktsegment"),
          struct((-col("cnt")).as("nc"), col("c_mktsegment"))).as("mode_segment"),
        max(col("cnt")).as("n_mode"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("mode_segment"), col("n_mode"))
      .orderBy("n_name")
  }

  private val qModeSql =
    """WITH c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
      |  FROM customer GROUP BY 1, 2),
      |r AS (SELECT c_nationkey, c_mktsegment, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cnt DESC, c_mktsegment) AS rn
      |  FROM c)
      |SELECT n.n_name, r.c_mktsegment AS mode_segment, CAST(r.cnt AS BIGINT) AS n_mode
      |FROM r JOIN nation n ON r.c_nationkey = n.n_nationkey
      |WHERE r.rn = 1 ORDER BY n.n_name""".stripMargin

  // --- q_dispersion: exact second-moment statistics — per order priority,
  // the mean and VARIANCE of order price computed entirely in integer
  // cents: n·Σc² − (Σc)² stays exact decimal/int128 arithmetic (bounded:
  // even at 10⁹ orders of $500k the numerator is ~10³³ < 10³⁸) and ONE
  // double division at the end, so both engines agree bit-for-bit where a
  // naive double `var_samp` would drift with partial-aggregation order.
  // Map-side-combinable hash agg; the canonical "stable variance at
  // scale" shape.
  def qDispersion(s: SparkSession, dir: String): DataFrame = {
    val c = (dec(col("o_totalprice")) * 100).cast(DecimalType(18, 0))
    t(s, dir, "orders")
      .select(col("o_orderpriority"), c.as("c"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum((col("c") * col("c")).cast(DecimalType(38, 0))).as("s2"))
      .select(col("o_orderpriority"), col("n"),
        round(col("s1").cast("double") / (col("n") * 100.0), 6).as("mean_price"),
        round((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") * 10000.0), 4)
          .as("var_price"))
      .orderBy("o_orderpriority")
  }

  private val qDispersionSql =
    """WITH o AS (SELECT o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS c
      |  FROM orders),
      |g AS (SELECT o_orderpriority, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
      |  FROM o GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  round(CAST(s1 AS DOUBLE) / (n * 100.0), 6) AS mean_price,
      |  round(CAST(n * s2 - s1 * s1 AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0), 4) AS var_price
      |FROM g ORDER BY o_orderpriority""".stripMargin

  // --- q_corr: pairwise Pearson correlation of daily revenue between
  // order priorities — the co-movement matrix a demand dashboard reads
  // (do URGENT and LOW days rise together?). Same exact-moment contract
  // as q_dispersion: daily cents are exact decimals, all five moments are
  // exact decimal sums (21 digits at most here — far inside DECIMAL(38)
  // and DuckDB's HUGEINT, so neither engine rounds), and the final corr
  // is casts + one division + two sqrts, every step correctly rounded
  // under IEEE-754 in both engines. Plan: one (day, priority) partial-agg
  // shuffle, a self-join on the BOUNDED day dim, then a 10-row moment
  // aggregate — nothing fact-sized past the first shuffle.
  def qCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"), col("o_orderpriority").as("p"),
        (dec(col("o_totalprice")) * 100).cast(DecimalType(18, 0)).as("c"))
      .groupBy("d", "p").agg(sum("c").cast(DecimalType(18, 0)).as("x"))
    val a = daily.select(col("d"), col("p").as("pa"), col("x").as("xa"))
    val b = daily.select(col("d"), col("p").as("pb"), col("x").as("xb"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    a.join(b, "d").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n"),
        sum("xa").cast(DecimalType(38, 0)).as("sx"),
        sum("xb").cast(DecimalType(38, 0)).as("sy"),
        sum((col("xa") * col("xb")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("xa") * col("xa")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("xb") * col("xb")).cast(DecimalType(38, 0))).as("syy"))
      .select(col("pa"), col("pb"), col("n"),
        when(vx === 0 || vy === 0, lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6))
          .as("corr"))
      .orderBy("pa", "pb")
  }

  private val qCorrSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority AS p,
      |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS x
      |  FROM orders GROUP BY 1, 2),
      |j AS (SELECT a.pa, b.pb, a.xa, b.xb
      |  FROM (SELECT d, p AS pa, x AS xa FROM daily) a
      |  JOIN (SELECT d, p AS pb, x AS xb FROM daily) b USING (d)
      |  WHERE a.pa < b.pb),
      |g AS (SELECT pa, pb, COUNT(*) AS n, SUM(xa) AS sx, SUM(xb) AS sy,
      |    SUM(xa * xb) AS sxy, SUM(xa * xa) AS sxx, SUM(xb * xb) AS syy
      |  FROM j GROUP BY 1, 2)
      |SELECT pa, pb, n,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
      |  END AS corr
      |FROM g ORDER BY 1, 2""".stripMargin

  // --- q_first_last: first-touch / last-touch attribution — each
  // customer's earliest and latest order (date, orderkey tie-break) with
  // prices. Deliberately NOT a first_value/last_value window: min_by /
  // max_by aggregates compute the same rows in ONE map-side-combinable
  // hash agg with no per-partition sort and no frame materialization —
  // at 100 TB the window formulation sorts every customer's history, the
  // aggregate touches each row once. The ordering key is a single long
  // (days·1e12 + orderkey): days stay < ~10^5, so the packed key fits a
  // long with orderkeys up to 10^12 — beyond any TPC-H scale factor —
  // and both engines compare identically. (An 1e8 multiplier would let a
  // 6·10^8 orderkey at SF100 bleed into the day field and mis-order.)
  def qFirstLast(s: SparkSession, dir: String): DataFrame = {
    val ord = unix_date(to_date(col("o_orderdate"))).cast("long") * 1000000000000L +
      col("o_orderkey")
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), dec(col("o_totalprice")).as("p"),
        ord.as("ord"))
      .groupBy("o_custkey")
      .agg(
        min_by(col("o_orderkey"), col("ord")).as("first_key"),
        min_by(col("p"), col("ord")).cast("double").as("first_price"),
        max_by(col("o_orderkey"), col("ord")).as("last_key"),
        max_by(col("p"), col("ord")).cast("double").as("last_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  private val qFirstLastSql =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) * 1000000000000
      |      + o_orderkey AS ord
      |  FROM orders)
      |SELECT o_custkey,
      |  arg_min(o_orderkey, ord) AS first_key,
      |  CAST(arg_min(p, ord) AS DOUBLE) AS first_price,
      |  arg_max(o_orderkey, ord) AS last_key,
      |  CAST(arg_max(p, ord) AS DOUBLE) AS last_price,
      |  COUNT(*) AS n_orders
      |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --- q_rolling_distinct: distinct customers over a rolling 3-month
  // window — the "rolling MAU" shape, where a frame-window COUNT(DISTINCT)
  // doesn't exist in either engine. Restated scalably: reduce to distinct
  // (month, customer) PAIRS first (the only per-row shuffle, map-side
  // partial distinct), then join the tiny month dim against the pair table
  // on a 3-month band and count distinct per window end. The band join is
  // a broadcast of the month DIM (constant ~|months| rows — never the
  // pairs), so per-customer data is touched exactly once per window it
  // falls in (≤3 times) regardless of corpus size.
  def qRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val m = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long")
    val pairs = t(s, dir, "orders").select(m.as("m"), col("o_custkey")).distinct()
    val months = pairs.select(col("m").as("mw")).distinct()
    pairs.join(broadcast(months), col("m").between(col("mw") - 2, col("mw")))
      .groupBy("mw")
      .agg(countDistinct(col("o_custkey")).as("n_cust_3mo"))
      .select(col("mw").as("month_idx"), col("n_cust_3mo"))
      .orderBy("month_idx")
  }

  private val qRollingDistinctSql =
    """WITH pairs AS (SELECT DISTINCT
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
      |    o_custkey
      |  FROM orders),
      |months AS (SELECT DISTINCT m AS mw FROM pairs)
      |SELECT mw AS month_idx, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust_3mo
      |FROM pairs JOIN months ON m BETWEEN mw - 2 AND mw
      |GROUP BY mw ORDER BY month_idx""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", q1PricingSummary, Some(q1Sql)),
    QueryDef("q_correlated", qCorrelated, Some(qCorrelatedSql)),
    QueryDef("q3_shipping_priority", q3ShippingPriority, Some(q3Sql)),
    QueryDef("q5_local_supplier", q5LocalSupplier, Some(q5Sql)),
    QueryDef("q_top_events", qTopEvents, Some(qTopEventsSql)),
    QueryDef("q_log_parse", qLogParse, Some(qLogParseSql)),
    QueryDef("q_time_buckets", qTimeBuckets, Some(qTimeBucketsSql)),
    QueryDef("q_window_rank", qWindowRank, Some(qWindowRankSql)),
    QueryDef("q_running_sum", qRunningSum, Some(qRunningSumSql)),
    QueryDef("q_batch_parity", qBatchParity, Some(qBatchParitySql)),
    QueryDef("q_semi_anti", qSemiAnti, Some(qSemiAntiSql)),
    QueryDef("q_rollup", qRollup, Some(qRollupSql)),
    QueryDef("q6_forecast_revenue", q6ForecastRevenue, Some(q6Sql)),
    QueryDef("q18_large_orders", q18LargeOrders, Some(q18Sql)),
    QueryDef("q10_returned_items", q10ReturnedItems, Some(q10Sql)),
    QueryDef("q17_small_quantity", q17SmallQuantity, Some(q17Sql)),
    QueryDef("q14_promo_share", q14PromoShare, Some(q14Sql)),
    QueryDef("q19_disjunctive", q19Disjunctive, Some(q19Sql)),
    QueryDef("q_grouping_sets", qGroupingSets, Some(qGroupingSetsSql)),
    QueryDef("q_pivot", qPivot, Some(qPivotSql)),
    QueryDef("q_unpivot", qUnpivot, Some(qUnpivotSql)),
    QueryDef("q_skew_join", qSkewJoin, Some(qSkewJoinSql)),
    QueryDef("q_bloom_join", qBloomJoin, Some(qBloomJoinSql)),
    QueryDef("q_pagerank", qPagerank, Some(qPagerankSql)),
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinSql)),
    QueryDef("q_asof_join", qAsofJoin, Some(qAsofJoinSql)),
    QueryDef("q_approx_distinct", qApproxDistinct, Some(qApproxDistinctSql)),
    QueryDef("q_funnel", qFunnel, Some(qFunnelSql)),
    QueryDef("q_retention", qRetention, Some(qRetentionSql)),
    QueryDef("q_percentiles", qPercentiles, Some(qPercentilesSql)),
    QueryDef("q8_market_share", q8MarketShare, Some(q8Sql)),
    QueryDef("q16_parts_suppliers", q16PartsSuppliers, Some(q16Sql)),
    QueryDef("q4_order_priority", q4OrderPriority, Some(q4Sql)),
    QueryDef("q7_nation_volume", q7NationVolume, Some(q7Sql)),
    QueryDef("q12_priority_class", q12PriorityClass, Some(q12Sql)),
    QueryDef("q13_customer_distribution", q13CustomerDistribution, Some(q13Sql)),
    QueryDef("q15_top_supplier", q15TopSupplier, Some(q15Sql)),
    QueryDef("q21_waiting_supplier", q21WaitingSupplier, Some(q21Sql)),
    QueryDef("q22_global_sales", q22GlobalSales, Some(q22Sql)),
    QueryDef("q_json_extract", qJsonExtract, Some(qJsonExtractSql)),
    QueryDef("q_histogram", qHistogram, Some(qHistogramSql)),
    QueryDef("q_histogram_equidepth", qHistogramEquidepth, Some(qHistogramEquidepthSql)),
    QueryDef("q_heavy_hitters", qHeavyHitters, Some(qHeavyHittersSql)),
    QueryDef("q_full_outer", qFullOuter, Some(qFullOuterSql)),
    QueryDef("q_gap_fill", qGapFill, Some(qGapFillSql)),
    QueryDef("q_decile_report", qDecileReport, Some(qDecileReportSql)),
    QueryDef("q_cube", qCube, Some(qCubeSql)),
    QueryDef("q_percent_rank", qPercentRank, Some(qPercentRankSql)),
    QueryDef("q_latest_per_key", qLatestPerKey, Some(qLatestPerKeySql)),
    QueryDef("q2_min_cost_supplier", q2MinCostSupplier, Some(q2Sql)),
    QueryDef("q9_product_profit", q9ProductProfit, Some(q9Sql)),
    QueryDef("q11_important_parts", q11ImportantParts, Some(q11Sql)),
    QueryDef("q20_excess_shipments", q20ExcessShipments, Some(q20Sql)),
    QueryDef("q_median", qMedian, Some(qMedianSql)),
    QueryDef("q_moving_avg", qMovingAvg, Some(qMovingAvgSql)),
    QueryDef("q_lead_lag", qLeadLag, Some(qLeadLagSql)),
    QueryDef("q_set_ops", qSetOps, Some(qSetOpsSql)),
    QueryDef("q_string_agg", qStringAgg, Some(qStringAggSql)),
    QueryDef("q_sessions", qSessions, Some(qSessionsSql)),
    QueryDef("q_active_intervals", qActiveIntervals, Some(qActiveIntervalsSql)),
    QueryDef("q_rolling_distinct", qRollingDistinct, Some(qRollingDistinctSql)),
    QueryDef("q_window_funnel", qWindowFunnel, Some(qWindowFunnelSql)),
    QueryDef("q_first_last", qFirstLast, Some(qFirstLastSql)),
    QueryDef("q_dispersion", qDispersion, Some(qDispersionSql)),
    QueryDef("q_corr", qCorr, Some(qCorrSql)),
    QueryDef("q_mode", qMode, Some(qModeSql)),
    QueryDef("q_bucketed_join", qBucketedJoin, Some(qBucketedJoinSql)),
    QueryDef("q_copurchase", qCopurchase, Some(qCopurchaseSql)),
    QueryDef("q_yoy_growth", qYoyGrowth, Some(qYoyGrowthSql)))
}
