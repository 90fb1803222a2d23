package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Second tier of the relational surface: set operations, CUBE, outer
  * joins, subquery forms, HAVING, math/null scalar functions — rounding out
  * DataFusion's SQL coverage (the reference planner handles all of these;
  * see `benches/query.rs:44` — arbitrary SQL through `ctx.sql`).
  */
object RelationalExt {

  /** GROUP BY CUBE — all grouping-set combinations in one pass. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("total_spend"))

  val cubeAggSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       | ${centsSumSql("o_totalprice")} AS total_spend
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** INTERSECT — nations that have both customers and suppliers. */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))

  val intersectKeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  /** EXCEPT — nations with customers but no suppliers. */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))

  val exceptKeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  /** FULL OUTER join — per-customer order counts vs high-balance customers;
    * rows survive from either side with NULLs on the other.
    */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    counts.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("n_orders"), col("c_acctbal"))
  }

  val fullOuterJoinSql: String =
    """SELECT COALESCE(o_custkey, c_custkey) AS custkey, n_orders, c_acctbal
      |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      |FULL JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0) c
      | ON o_custkey = c_custkey""".stripMargin

  /** IN-list subquery (uncorrelated) — rewritten by Catalyst to a semi join. */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = {
    val machinery = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .join(machinery, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("total_spend"))
  }

  val inSubquerySql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       | ${centsSumSql("o_totalprice")} AS total_spend
       |FROM orders
       |WHERE o_orderstatus = 'O'
       | AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
       |GROUP BY o_orderpriority""".stripMargin

  /** HAVING — post-aggregation filter. */
  def havingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .filter(col("n_customers") >= 5)

  val havingAggSql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
      |GROUP BY c_nationkey HAVING COUNT(*) >= 5""".stripMargin

  /** Scalar subquery — orders above the (exact-cents) global average. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgPrice = o.agg(centsAvg(col("o_totalprice")).as("avg_price"))
    o.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above_avg"))
  }

  val scalarSubquerySql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_above_avg
       |FROM orders
       |WHERE o_totalprice > (SELECT ${centsAvgSql("o_totalprice")} FROM orders)
       |GROUP BY o_orderstatus""".stripMargin

  /** CROSS JOIN — small dimensional cross product. */
  def crossJoinSmall(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).select(col("r_name"))
      .crossJoin(Tables.orders(spark, dir).select(col("o_orderstatus")).distinct())

  val crossJoinSmallSql: String =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s""".stripMargin

  /** Math scalar functions — sqrt (IEEE-exact in both engines), floor/ceil
    * (aligned to BIGINT), modulo.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      sqrt(col("o_totalprice")).as("sqrt_price"),
      floor(col("o_totalprice")).cast("bigint").as("floor_price"),
      ceil(col("o_totalprice")).cast("bigint").as("ceil_price"),
      abs(col("o_totalprice") - 300.0).as("abs_diff"),
      (col("o_orderkey") % 7).as("mod7"))

  val mathFuncsSql: String =
    """SELECT o_orderkey, SQRT(o_totalprice) AS sqrt_price,
      | CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
      | CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_price,
      | ABS(o_totalprice - 300.0) AS abs_diff,
      | o_orderkey % 7 AS mod7
      |FROM orders""".stripMargin

  /** NULL semantics — NULLIF / COALESCE round trip + null-grouping. */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(coalesce(expr("nullif(o_orderstatus, 'P')"), lit("pending")).as("status2"))
      .agg(count(lit(1)).as("n_orders"))

  val nullHandlingSql: String =
    """SELECT COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status2,
      | COUNT(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin

  /** Correlated scalar subquery — exercised through the SQL parser (the
    * DataFrame API cannot express correlation); Catalyst decorrelates it
    * into an aggregate + left outer join.
    */
  def correlatedScalar(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_cs")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_cs")
    spark.sql(
      """SELECT c_custkey, c_name,
        | (SELECT MAX(o_totalprice) FROM orders_cs o
        |  WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer_cs c""".stripMargin)
  }

  val correlatedScalarSql: String =
    """SELECT c_custkey, c_name,
      | (SELECT MAX(o_totalprice) FROM orders o
      |  WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c""".stripMargin

  /** Range (non-equi) join against a tiny in-memory band dimension — the
    * band table broadcasts, so the non-equi condition never forces a
    * cartesian shuffle at scale.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 200.0), ("mid", 200.0, 400.0), ("high", 400.0, 1e9))
      .toDF("band", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("band_spend"))
  }

  val rangeJoinSql: String =
    s"""WITH bands(band, lo, hi) AS (
       | VALUES ('low', 0.0, 200.0), ('mid', 200.0, 400.0), ('high', 400.0, 1e9))
       |SELECT band, COUNT(*) AS n_orders, ${centsSumSql("o_totalprice")} AS band_spend
       |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY band""".stripMargin

  /** MERGE / SCD1-upsert shape (batch): a deterministic "updates" feed
    * (every 10th order, price bumped) merged into the base table — matched
    * rows take the update, unmatched keep the base, insert-only rows
    * survive. Composed as a full outer join + coalesce, the scalable merge
    * when the sink has no native MERGE.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    import spark.implicits._
    val insertOnly = Seq((-1L, 42.0, "U")).toDF("u_key", "u_price", "u_status")
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("u_key"),
        (col("o_totalprice") + 1.0).as("u_price"), lit("U").as("u_status"))
      .unionAll(insertOnly)
    base.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("u_key")).as("key"),
        coalesce(col("u_price"), col("o_totalprice")).as("price"),
        coalesce(col("u_status"), col("o_orderstatus")).as("status"))
  }

  val mergeUpsertSql: String =
    """WITH updates AS (
      | SELECT o_orderkey AS u_key, o_totalprice + 1.0 AS u_price, 'U' AS u_status
      | FROM orders WHERE o_orderkey % 10 = 0
      | UNION ALL SELECT -1, 42.0, 'U')
      |SELECT COALESCE(o_orderkey, u_key) AS key,
      | COALESCE(u_price, o_totalprice) AS price,
      | COALESCE(u_status, o_orderstatus) AS status
      |FROM orders FULL JOIN updates ON o_orderkey = u_key""".stripMargin

  /** Frequency-sketch family: per-event-type heavy-hitter users via
    * exact count + rank (the sketch analogue, count-min, is engine-specific
    * — exact formulation keeps it oracle-checkable).
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), col("user_id"), col("n"), col("rnk"))
  }

  val heavyHittersSql: String =
    """SELECT event_type, user_id, n, rnk FROM (
      | SELECT event_type, user_id, COUNT(*) AS n,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id) AS rnk
      | FROM events GROUP BY event_type, user_id) t
      |WHERE rnk <= 3""".stripMargin

  /** Correlated EXISTS via the SQL parser (the DataFrame API can't express
    * EXISTS correlation) — Catalyst decorrelates it into a left semi join,
    * the NOT EXISTS branch into an anti join, both shuffling once on the
    * correlation key.
    */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_ex")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_ex")
    spark.sql(
      """SELECT c_nationkey, COUNT(*) AS n_with_orders
        |FROM customer_ex c
        |WHERE EXISTS (SELECT 1 FROM orders_ex o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300)
        |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice > 100000)
        |GROUP BY c_nationkey""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT c_nationkey, COUNT(*) AS n_with_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      |                    AND o.o_totalprice > 100000)
      |GROUP BY c_nationkey""".stripMargin

  /** Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep multiplicity
    * (a row appearing m times on the left and n on the right survives
    * max(m-n, 0) / min(m, n) times) — different operators from the
    * set-semantics q_except/q_intersect, aggregated for a deterministic
    * output.
    */
  def exceptIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    cust.exceptAll(supp).groupBy(col("nationkey")).agg(count(lit(1)).as("n_excess"))
      .join(
        cust.intersectAll(supp).groupBy(col("nationkey")).agg(count(lit(1)).as("n_common")),
        Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_excess"), lit(0L)).as("n_excess"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  val exceptIntersectAllSql: String =
    """WITH ea AS (
      |  SELECT nationkey, COUNT(*) AS n_excess FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    EXCEPT ALL
      |    SELECT s_nationkey FROM supplier)
      |  GROUP BY 1
      |), ia AS (
      |  SELECT nationkey, COUNT(*) AS n_common FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    INTERSECT ALL
      |    SELECT s_nationkey FROM supplier)
      |  GROUP BY 1
      |)
      |SELECT COALESCE(ea.nationkey, ia.nationkey) AS nationkey,
      |  COALESCE(n_excess, 0) AS n_excess, COALESCE(n_common, 0) AS n_common
      |FROM ea FULL OUTER JOIN ia ON ea.nationkey = ia.nationkey""".stripMargin

  /** LATERAL correlated subquery — top-2 customers by balance per nation,
    * exercised through the SQL parser (the DataFrame API cannot express a
    * correlated derived table). Catalyst decorrelates the LIMIT'd lateral
    * into a window-rank join, so at scale it runs as one shuffle on the
    * correlation key, not a per-nation re-scan.
    */
  def lateralTop(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_lt")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lt")
    spark.sql(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation_lt n JOIN LATERAL (
        |  SELECT c_name, c_acctbal FROM customer_lt c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
  }

  val lateralTopSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin

  /** SCD2 (slowly-changing-dimension type 2) history build: a change feed
    * (orders per customer, ordered by date) becomes versioned rows with
    * [valid_from, valid_to) ranges and an is_current flag — the standard
    * warehouse pattern for tracking attribute history. One window over the
    * natural key; epoch-day integers keep the ranges engine-exact.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("bigint")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), day.as("valid_from_day"),
      lead(day, 1).over(w).as("valid_to_day"),
      lead(col("o_orderkey"), 1).over(w).isNull.as("is_current"))
  }

  val scd2Sql: String =
    """SELECT o_custkey, o_orderkey,
      | date_diff('day', DATE '1970-01-01', o_orderdate) AS valid_from_day,
      | lead(date_diff('day', DATE '1970-01-01', o_orderdate))
      |   OVER w AS valid_to_day,
      | lead(o_orderkey) OVER w IS NULL AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Per-group MODE with a deterministic tie-break (smallest value wins).
    * Spark 3.4's builtin `mode()` is explicitly non-deterministic on ties,
    * so this is the portable formulation: count per (group, value), then
    * a struct-max argmax — max(struct(cnt, −value)) compares count first
    * and PREFERS the smaller value on equal counts. Two map-side-combined
    * aggregations, no window, k output rows.
    */
  def modeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(max(struct(col("cnt"), (-col("qty")).as("negq"))).as("m"),
        sum(col("cnt")).as("n_rows"))
      .select(col("l_returnflag"), (-col("m.negq")).as("mode_qty"),
        col("m.cnt").as("mode_cnt"), col("n_rows"))
      .orderBy(col("l_returnflag"))

  val modeAggSql: String =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT l_returnflag, qty, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY cnt DESC, qty ASC) AS rn,
      |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows
      |  FROM c)
      |SELECT l_returnflag, qty AS mode_qty, cnt AS mode_cnt, n_rows
      |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  /** Blocked fuzzy entity resolution over the part catalog — the
    * record-linkage primitive (Fellegi–Sunter blocking + edit-distance
    * scoring) every master-data/catalog-dedup pipeline runs: candidate
    * pairs come ONLY from a blocking key (last name token + size), each
    * pair is scored with Levenshtein distance, and each entity reports
    * its match count plus the best-scoring witness (ties broken to the
    * smallest partner key so the argmin is deterministic).
    *
    * Scale shape: the pair generator is an equi-join on the blocking key
    * — shuffle-partitioned by block, NO cartesian — and pair volume is
    * Σ_b |b|², bounded by the blocking key's granularity (here word ×
    * size ⇒ catalog/500-sized blocks; a skewed block would take the
    * dedup_embedding sub-salt decomposition). Levenshtein is codegen'd
    * in both engines and identically defined (unit-cost edit distance).
    */
  def nameMatch(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_name"), col("p_size"),
      regexp_extract(col("p_name"), "(\\S+)$", 1).as("block"))
    val left = base.select(col("block"), col("p_size"),
      col("p_partkey").as("pa"), col("p_name").as("name_a"))
    val right = base.select(col("block"), col("p_size"),
      col("p_partkey").as("pb"), col("p_name").as("name_b"))
    // both sides are catalog-sized: pin the shuffle join so pair scoring
    // partitions by block at any scale (a tiny-stats broadcast would
    // serialize scoring on the probe side's input splits)
    left.join(right.hint("shuffle_merge"), Seq("block", "p_size"))
      .filter(col("pa") =!= col("pb"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 4)
      .groupBy(col("pa").as("p_partkey"), col("name_a").as("p_name"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct(col("dist"), col("pb"))).as("b"))
      .select(col("p_partkey"), col("p_name"), col("n_matches"),
        col("b.dist").cast("long").as("best_dist"), col("b.pb").as("best_match"))
      .orderBy(col("p_partkey"))
  }

  val nameMatchSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_name, p_size,
      |    regexp_extract(p_name, '(\S+)$', 1) AS block FROM part),
      |m AS (
      |  SELECT a.p_partkey, a.p_name, b.p_partkey AS pb,
      |    levenshtein(a.p_name, b.p_name) AS dist
      |  FROM p a JOIN p b ON a.block = b.block AND a.p_size = b.p_size
      |    AND a.p_partkey <> b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 4),
      |r AS (
      |  SELECT p_partkey, p_name, pb, dist,
      |    ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY dist, pb) AS rn,
      |    COUNT(*) OVER (PARTITION BY p_partkey) AS n_matches
      |  FROM m)
      |SELECT p_partkey, p_name, n_matches, CAST(dist AS BIGINT) AS best_dist,
      |  pb AS best_match
      |FROM r WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_name_match" -> (nameMatch _),
    "q_mode" -> (modeAgg _),
    "q_scd2" -> (scd2 _),
    "q_lateral" -> (lateralTop _),
    "q_exists" -> (existsSubquery _),
    "q_set_ops_all" -> (exceptIntersectAll _),
    "q_merge_upsert" -> (mergeUpsert _),
    "q_heavy_hitters" -> (heavyHitters _),
    "q_correlated_scalar" -> (correlatedScalar _),
    "q_range_join" -> (rangeJoin _),
    "q_cube" -> (cubeAgg _),
    "q_intersect" -> (intersectKeys _),
    "q_except" -> (exceptKeys _),
    "q_full_outer_join" -> (fullOuterJoin _),
    "q_in_subquery" -> (inSubquery _),
    "q_having" -> (havingAgg _),
    "q_scalar_subquery" -> (scalarSubquery _),
    "q_cross_join" -> (crossJoinSmall _),
    "q_math_funcs" -> (mathFuncs _),
    "q_null_handling" -> (nullHandling _))

  val oracles: Map[String, String] = Map(
    "q_name_match" -> nameMatchSql,
    "q_mode" -> modeAggSql,
    "q_scd2" -> scd2Sql,
    "q_lateral" -> lateralTopSql,
    "q_exists" -> existsSubquerySql,
    "q_set_ops_all" -> exceptIntersectAllSql,
    "q_merge_upsert" -> mergeUpsertSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_correlated_scalar" -> correlatedScalarSql,
    "q_range_join" -> rangeJoinSql,
    "q_cube" -> cubeAggSql,
    "q_intersect" -> intersectKeysSql,
    "q_except" -> exceptKeysSql,
    "q_full_outer_join" -> fullOuterJoinSql,
    "q_in_subquery" -> inSubquerySql,
    "q_having" -> havingAggSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_cross_join" -> crossJoinSmallSql,
    "q_math_funcs" -> mathFuncsSql,
    "q_null_handling" -> nullHandlingSql)
}
