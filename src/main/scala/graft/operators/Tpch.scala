package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables
import graft.functions.Portable._

/** The remaining TPC-H query shapes (Q2, Q4, Q7-Q10, Q12, Q14-Q17, Q19,
  * Q20) — with Relational.scala's Q1/Q3/Q5/Q6/Q11/Q13/Q18/Q21/Q22 this
  * completes all 22 stock shapes the reference can run through DataFusion's
  * planner (`benches/query.rs:37-47` registers parquet and accepts arbitrary
  * SQL; the TPC-H deck is the canonical workload for exactly that surface).
  *
  * The trimmed testdata schema has no partsupp and no
  * l_shipmode/l_commitdate/l_receiptdate/o_comment columns, so those queries
  * keep the STRUCTURAL shape (the decorrelation pattern Catalyst must get
  * right) with adapted literals: lineitem serves as the part-supplier
  * association, `l_returnflag = 'R'` marks a "late/problem" line, and
  * `s_acctbal < 0` marks a "complaints" supplier. Money maths follow the
  * Portable cents discipline so both engines hash identically.
  */
object Tpch {

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  private val volume: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val volumeSql = "l_extendedprice*(1-l_discount)"

  /** TPC-H Q2 shape — minimum-cost supplier: the correlated scalar MIN
    * subquery whose inner query is itself a JOIN (the region restriction),
    * decorrelated as an argmin join-back. With no partsupp table, the
    * part-supplier catalog derives from lineitem: supply cost of
    * (part, supplier) = the minimum unit price ever shipped, as exact
    * cents. The min-per-part aggregate joins back on (partkey, cost) —
    * equality on exact integers, so ties return every witness, exactly
    * like the stock query.
    *
    * Scale shape: the catalog aggregate is map-side-combined on
    * (partkey, suppkey); the per-part min is a key-partitioned WINDOW
    * over that aggregate (r15 — the aggregate-and-join-back form
    * re-planned the catalog subtree, scanning part and supplier twice);
    * region/nation/part are broadcast dims. The STANDARD-part semi
    * filter below the aggregate already restricts l_partkey, so no
    * second part join is needed for the output key. Nothing re-scans
    * per row.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val euro = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(euro), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val p = Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
    // r11: the part restriction goes BELOW the catalog aggregate — the
    // correlated min (min_c) only matters for STANDARD parts, so the
    // (partkey, suppkey) catalog shuffle carries 1/|types| of the fact
    // instead of all of it. The euro-supplier join also sits below the
    // window: the stock min is over suppliers in the region only.
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(p.select(col("p_partkey").as("std_partkey"))),
        col("l_partkey") === col("std_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(cents(col("l_extendedprice") / col("l_quantity"))).as("cost_c"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_c", min(col("cost_c")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost_c") === col("min_c"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"),
        (col("cost_c").cast("double") / 100.0).as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |   JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |ps AS (
      |  SELECT l_partkey, l_suppkey,
      |   MIN(CAST(ROUND((l_extendedprice/l_quantity)*100) AS BIGINT)) AS cost_c
      |  FROM lineitem GROUP BY 1, 2),
      |psr AS (
      |  SELECT ps.*, s_name, s_acctbal, n_name
      |  FROM ps JOIN eu ON l_suppkey = s_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey,
      | CAST(cost_c AS DOUBLE)/100.0 AS supplycost
      |FROM psr JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'STANDARD'
      | AND cost_c = (SELECT MIN(cost_c) FROM psr i WHERE i.l_partkey = psr.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q4 shape — order priority checking: EXISTS against the fact
    * table feeding an AGGREGATE (distinct from q_semi_join, which emits
    * the rows). The "late line" witness is `l_returnflag = 'R'` (trimmed
    * schema has no commit/receipt dates). The semi join never duplicates
    * orders, so the count is per-order no matter how many lines match —
    * the property the EXISTS decorrelation must preserve.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
      .join(late, Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      | AND EXISTS (SELECT 1 FROM lineitem
      |             WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 shape — volume shipping between two nations: the DISJUNCTIVE
    * cross-side predicate (supplier nation, customer nation) ∈
    * {(A,B),(B,A)} that no single join condition can express. Both nation
    * dims are pre-filtered to the pair BEFORE the broadcast (2-row build
    * sides), the OR runs post-join over the two name columns.
    *
    * Scale shape: the only shuffles are lineitem⋈orders on orderkey and
    * ⋈customer on custkey; supplier/nation broadcast. The year key comes
    * off the pruned l_shipdate column.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_11", "NATION_12")
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_12") ||
        (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_11"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        date_format(col("l_shipdate"), "yyyy").as("l_year"))
      .agg(centsSum(volume).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       | strftime(l_shipdate, '%Y') AS l_year,
       | ${centsSumSql(volumeSql)} AS revenue
       |FROM lineitem
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN nation n1 ON s_nationkey = n1.n_nationkey
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       | AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12')
       |   OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 shape — national market share: a RATIO of a conditional
    * aggregate to the group total, over the widest star in the deck
    * (lineitem + part + supplier + orders + customer + nation×2 + region).
    * Numerator and denominator are both exact cents integers; the single
    * IEEE division at the end is bit-identical in both engines.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asia = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asia), col("c_nationkey") === col("cn_key"))
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", cents(volume)).otherwise(0L)).cast("double")
          / sum(cents(volume)).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    s"""SELECT strftime(o_orderdate, '%Y') AS o_year,
       | CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
       |   THEN CAST(ROUND(($volumeSql)*100) AS BIGINT) ELSE 0 END) AS DOUBLE)
       |  / CAST(SUM(CAST(ROUND(($volumeSql)*100) AS BIGINT)) AS DOUBLE) AS mkt_share
       |FROM lineitem
       | JOIN part ON l_partkey = p_partkey
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN nation n1 ON s_nationkey = n1.n_nationkey
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation n2 ON c_nationkey = n2.n_nationkey
       | JOIN region ON n2.n_regionkey = r_regionkey
       |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
       | AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** TPC-H Q9 shape — product-type profit: a COMPUTED measure spanning
    * three tables (price, discount, a supply-cost proxy of 10% retail ×
    * quantity), grouped by supplier nation and order year, with a LIKE
    * filter pushed to the part scan. The profit expression is rounded to
    * cents per row BEFORE summation — order-independent in both engines.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val profit = volume - lit(0.1) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir).filter(col("p_name").like("%red%"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(centsSum(profit).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
       | ${centsSumSql(s"$volumeSql - 0.1*p_retailprice*l_quantity")} AS sum_profit
       |FROM lineitem
       | JOIN part ON l_partkey = p_partkey
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN nation ON s_nationkey = n_nationkey
       | JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q10 shape — returned-item reporting: a quarter of orders joined
    * to their RETURNED lines, revenue per customer, top 20. The group keys
    * carry the customer attributes (the stock query's wide GROUP BY) so no
    * second join is needed after the aggregate.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= ts("1996-10-01") && col("o_orderdate") < ts("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(centsSum(volume).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       | ${centsSumSql(volumeSql)} AS revenue
       |FROM customer
       | JOIN orders ON c_custkey = o_custkey
       | JOIN lineitem ON o_orderkey = l_orderkey
       | JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       | AND l_returnflag = 'R'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** TPC-H Q12 shape — shipping-mode priority counts: conditional counts
    * (urgent vs not) of the JOINED side's attribute grouped by a lineitem
    * attribute (l_returnflag stands in for the absent l_shipmode). The
    * classic "count the other table's property per my group" shape.
    */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val urgent = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q14 shape — promo revenue: a GLOBAL conditional ratio (one
    * output row) over a month of lineitem joined to part. Numerator and
    * denominator are exact cents; `100.0 * num / den` is evaluated
    * left-to-right in both engines.
    *
    * Scale shape (r15, measured): part here is UNFILTERED — every type
    * must be classified — so the join side is SF-proportional and must
    * never broadcast; but Catalyst's static estimate of the
    * column-pruned scan (60 MB at the 17 GB corpus) sits under the
    * 64 MB auto threshold and its planning-time broadcast builds a
    * ~2 GB, 20M-row hashed relation in ONE task (33-69 s measured; AQE
    * cannot demote a pre-shuffle broadcast). The shuffle_hash hint
    * instead builds per-partition maps of the 94×-smaller side —
    * 6.7 s measured, and the per-partition build is bounded by
    * |part|/shufflePartitions, which scales with the cluster (vs
    * sort-merge's 17.8 s — sorting the 600M-line probe side costs more
    * than the bounded hash builds; all three strategies timed in
    * tools/TpchVariants).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-03-01") && col("l_shipdate") < ts("1997-04-01"))
      .join(Tables.part(spark, dir).hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", cents(volume)).otherwise(0L)).cast("double")
          / sum(cents(volume)).cast("double")).as("promo_revenue"))

  val q14Sql: String =
    s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
       |   THEN CAST(ROUND(($volumeSql)*100) AS BIGINT) ELSE 0 END) AS DOUBLE)
       |  / CAST(SUM(CAST(ROUND(($volumeSql)*100) AS BIGINT)) AS DOUBLE) AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  /** TPC-H Q15 shape — top supplier: equality against the GLOBAL MAX of an
    * aggregate (the stock view + scalar subquery), which must return ALL
    * tied witnesses — the reason it is not a TopK/limit plan. Revenue stays
    * in exact cents through the equality test; the 1-row max is the
    * sanctioned broadcast-scalar pattern (same as q11/q22).
    *
    * Scale shape (r15): the revenue view feeds BOTH the max subquery and
    * the equality probe; without intervention each consumer re-planned
    * the lineitem scan+aggregate (exchange reuse does not fire across
    * the broadcast-scalar boundary — measured two fact scans in the
    * final plan). The view is supplier-granular — tiny next to the fact —
    * so it is materialized ONCE through [[graft.Checkpoints.cut]]
    * (local blocks here, reliable checkpoint under
    * `graft.checkpoint.reliable` on a real cluster) and both consumers
    * read the blocks: one fact scan total.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = graft.Checkpoints.cut(Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(volume)).as("rev_c")))
    val maxRev = rev.agg(max(col("rev_c")).as("max_c"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev_c") === col("max_c"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_c").cast("double") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey, SUM(CAST(ROUND(($volumeSql)*100) AS BIGINT)) AS rev_c
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE)/100.0 AS total_revenue
       |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_c = (SELECT MAX(rev_c) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape — parts/supplier relationship: COUNT(DISTINCT) per
    * wide group, with a NOT IN subquery excluded as a left-anti join
    * ("complaints" suppliers = negative balance in the trimmed schema).
    * lineitem is the part-supplier association; the anti join runs BEFORE
    * the distinct aggregation so excluded suppliers never inflate counts.
    */
  def q16PartSupplier(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
    val complaints = Tables.supplier(spark, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
          && col("p_size").isin(sizes: _*))),
        col("l_partkey") === col("p_partkey"))
      .join(complaints, Seq("l_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      | AND p_size IN (1,4,9,14,19,24,29,34,39,44,49)
      | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 shape — discounted revenue: the OR-of-ANDs predicate
    * spanning BOTH join sides (brand × size-range × quantity-range
    * triples). Catalyst keeps the equi-join on partkey and evaluates the
    * disjunction as a post-join filter — the plan that scales; the naive
    * reading (three separate joins unioned) would scan lineitem thrice.
    */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    def branch(brand: String, sizeMax: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeMax) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#2", 15, 1, 11) || branch("Brand#3", 25, 10, 20) ||
        branch("Brand#4", 35, 20, 30))
      .agg(centsSum(volume).as("revenue"))
  }

  val q19Sql: String =
    s"""SELECT ${centsSumSql(volumeSql)} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q17 — small-quantity-order revenue (round 14; the last of the
    * 22 stock shapes): lines of one brand's small parts whose quantity is
    * below 20% of that PART's all-time average quantity, summed and
    * divided by 7 (the stock "yearly average loss" figure). The
    * correlated scalar AVG decorrelates into one per-part (sum, count)
    * aggregate joined back — and the 0.2·avg comparison is restated in
    * EXACT integers (quantities are integer-valued):
    * q < 0.2·(sum/cnt) ⇔ 5·q·cnt < sum, so the filter is engine-exact
    * and only the terminal cents-sum ÷ 7 touches IEEE.
    *
    * Scale shape (r15): part is a size-gated dim (filtered BEFORE the
    * join, so only 1/|brands| of the fact survives — the q2 r11 lesson),
    * and the per-part stats are computed by a WINDOW over l_partkey on
    * the brand-filtered lines instead of an aggregate-and-join-back —
    * the join-back form scanned the 600M-row lineitem TWICE (the two
    * legs' filters differ post-pushdown, so exchange reuse never fires);
    * the window form scans it ONCE and shuffles only the brand-filtered
    * sliver for the per-part sort. The window is key-partitioned
    * (thousands of parts per brand — no single-partition funnel).
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("sum_q", sum(col("l_quantity").cast("long")).over(w))
      .withColumn("cnt_q", count(lit(1)).over(w))
      .filter(lit(5L) * col("l_quantity").cast("long") * col("cnt_q") < col("sum_q"))
      .agg((centsSum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""WITH s AS (
       |  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_q,
       |         COUNT(*) AS cnt_q
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#3' AND p_size <= 10
       |  GROUP BY 1)
       |SELECT ${centsSumSql("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN s ON s.l_partkey = l.l_partkey
       |WHERE p.p_brand = 'Brand#3' AND p.p_size <= 10
       |  AND 5 * CAST(l.l_quantity AS BIGINT) * s.cnt_q < s.sum_q""".stripMargin

  /** TPC-H Q20 shape — potential part promotion: the nested-IN +
    * correlated-threshold decorrelation. The stock query keeps suppliers
    * whose availqty exceeds half their shipped quantity; with lineitem as
    * the association, a supplier qualifies when its 1997 shipped quantity
    * of a 'small%' part exceeds 20% of that part's 1997 total across all
    * suppliers (5·ps_qty > p_qty — exact integer-valued doubles, no
    * division).
    *
    * Scale shape (r15): ONE lineitem scan. The part-level total is a
    * key-partitioned WINDOW over the (part, supplier) aggregate instead
    * of a second aggregate joined back (the join-back form re-planned
    * the fact scan under each consumer); the window's input is already
    * the map-side-combined per-pair frame, partitioned on l_partkey —
    * thousands of parts, no funnel. The qualifying supplier set then
    * semi-joins up to supplier.
    */
  def q20PromotionSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l97 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.dimHint(Tables.part(spark, dir).filter(col("p_name").like("small%"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val dominant = l97.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("ps_qty"))
      .withColumn("p_qty", sum(col("ps_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("ps_qty") * 5 > col("p_qty"))
      .select(col("l_suppkey").as("s_suppkey"))
    Tables.supplier(spark, dir)
      .join(dominant, Seq("s_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  val q20Sql: String =
    """WITH l97 AS (
      |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |   AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')),
      |per_ps AS (
      |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS ps_qty
      |  FROM l97 GROUP BY 1, 2),
      |per_p AS (
      |  SELECT l_partkey, SUM(ps_qty) AS p_qty FROM per_ps GROUP BY 1)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM per_ps JOIN per_p USING (l_partkey)
      |  WHERE ps_qty * 5 > p_qty)
      |ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q12_ship_priority" -> (q12ShipPriority _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_part_supplier" -> (q16PartSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
    "q20_promotion_suppliers" -> (q20PromotionSuppliers _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q4_order_priority" -> q4Sql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q9_product_profit" -> q9Sql,
    "q10_returned_items" -> q10Sql,
    "q12_ship_priority" -> q12Sql,
    "q14_promo_revenue" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_part_supplier" -> q16Sql,
    "q17_small_qty_revenue" -> q17Sql,
    "q19_discounted_revenue" -> q19Sql,
    "q20_promotion_suppliers" -> q20Sql)
}
