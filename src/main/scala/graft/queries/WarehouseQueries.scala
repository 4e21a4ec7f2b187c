package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema warehouse queries over the TPC-H-ish fixture tables.
  * The reference itself ships no joins (SURVEY §2.5 "absent" note) — this
  * pack exists because a standalone analytics engine at 100 TB lives or
  * dies on join strategy: dimension tables broadcast (no shuffle of the
  * fact side), the fact table shuffles at most once per aggregation
  * grain, and AQE re-plans skew at runtime. Each query is oracle-checked
  * like everything else.
  */
object WarehouseQueries {

  // Deliberately plain parquet reads, no widen/cache: these queries'
  // value as evidence is their SCAN-side plan (PushedFilters/ReadSchema
  // asserted in PlanShapeSpec), which an InMemoryRelation would hide,
  // and their filter+agg cost at bench SF is already scan-bound, so a
  // per-query repartition would cost more than the parallelism buys
  // (measured: revenue_by_nation 0.7→1.6 s with an unconditional widen).
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(24,6)")).cast("double")

  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * Join strategy by table role: nation/region are TRUE dimensions
    * (bounded, tiny) and get a broadcast hint; orders and customer scale
    * WITH the fact table, so they are left to the planner — at bench SF
    * AQE converts them to broadcast joins at runtime (they fit under the
    * threshold), while at 100 TB the same plan degrades gracefully to a
    * shuffle join on the join key instead of OOMing the driver trying to
    * broadcast a fact-sized table.
    */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val cust = t(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val nat = t(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = t(spark, sfDir, "region").select(col("r_regionkey"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_items"), decSum(col("rev")).as("revenue"))
  }

  val revenueByNationOracle: String =
    """SELECT r.r_name AS region, n.n_name AS nation, count(*) AS n_items,
      |       CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |                     AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q1-shaped pricing summary: the canonical wide aggregation. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  val pricingSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |                     AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Top customers by order value in a market segment — broadcast dim
    * filter + TakeOrderedAndProject top-k.
    */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    t(spark, sfDir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_value"))
      .orderBy(desc("total_value"), asc("c_custkey"))
      .limit(25)
  }

  val topCustomersOracle: String =
    """SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
      |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_value
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY 1, 2
      |ORDER BY total_value DESC, c_custkey ASC LIMIT 25""".stripMargin

  /** TPC-H Q3-shaped shipping priority: unshipped-revenue top-10 per
    * order for a market segment as of a cutoff date. Both date filters
    * push into the parquet scans; the segment-filtered customer list
    * broadcasts; the one shuffle is the (orderkey, date, priority)
    * aggregation grain; the top-10 is TakeOrderedAndProject.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "2001-06-01 00:00:00"
    val cust = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val ord = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit(cutoff)))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(col("rev")).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  val shippingPriorityOracle: String =
    """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
      |       CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |                     AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'AUTOMOBILE'
      |  AND o.o_orderdate < TIMESTAMP '2001-06-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // every entry is a pure plan builder → statement-cached (see
  // TableCache.planCachedPack's purity contract)
  val all: Map[String, ((SparkSession, String) => DataFrame, String)] =
    graft.sources.TableCache.planCachedPack(Map(
      "revenue_by_nation" -> ((revenueByNation _, revenueByNationOracle)),
      "pricing_summary" -> ((pricingSummary _, pricingSummaryOracle)),
      "top_customers" -> ((topCustomers _, topCustomersOracle)),
      "shipping_priority" -> ((shippingPriority _, shippingPriorityOracle))))
}
