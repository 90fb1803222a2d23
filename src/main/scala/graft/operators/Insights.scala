package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable.cents

/** Statistical-insight operators — the audit/experimentation layer a
  * data platform runs ON TOP of the relational core: fraud screening
  * (Benford), seasonality baselines, market-basket association rules,
  * CUPED variance-reduced experiment readouts, and the rank-sum test.
  * The reference exposes its engine through arbitrary SQL
  * (`/root/reference/benches/query.rs:37-47`); these are the
  * statistical surfaces of that flow re-expressed as single Catalyst
  * plans with engine-exact arithmetic (integer moments, ppm ratios by
  * integer division, terminal IEEE steps mirrored expression-for-
  * expression in the DuckDB oracle).
  */
object Insights {

  private val d38 = "decimal(38,0)"

  /** Benford first-digit audit of order totals — the classic
    * fabricated-data screen: naturally occurring amounts follow
    * P(d) = log10(1 + 1/d), and a synthetic or tampered feed doesn't.
    * The expected per-mille-million shares are hard-coded integer
    * literals (⌊log10(1+1/d)·10⁶⌋, summing to exactly 10⁶ — the
    * bootstrap-threshold convention), so observed/expected/deviation
    * are all exact integers in both engines; no libm log in either.
    *
    * Scale shape: one map-side-combined 9-group aggregate over the
    * corpus; everything after runs on ≤ 9 rows. The first digit comes
    * from the exact cents integer's decimal string, not from float
    * log arithmetic.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    // round(log10(1+1/d)·10⁶) for d = 1..9; the rounded values sum to
    // exactly 10⁶ (the floors would sum to 999 995)
    val expPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val expDf = spark.sql(
      "SELECT posexplode(array(" + expPpm.mkString("L,") + "L))")
      .select((col("pos") + 1).cast("int").as("digit"),
        col("col").as("exp_ppm"))
    val obs = Tables.orders(spark, dir)
      .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).cast("bigint").as("n_total"))
    obs.crossJoin(broadcast(tot))
      .join(broadcast(expDf), Seq("digit"))
      .withColumn("obs_ppm",
        expr(s"cast(cast(n_obs as $d38) * 1000000 div n_total as bigint)"))
      .select(col("digit"), col("n_obs"), col("n_total"), col("obs_ppm"),
        col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      .orderBy(col("digit"))
  }

  val benfordSql: String =
    """WITH obs AS (
      |  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT)
      |           AS VARCHAR), 1, 1) AS INT) AS digit,
      |         COUNT(*) AS n_obs
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
      |exp AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |          (4, 96910), (5, 79181), (6, 66947), (7, 57992),
      |          (8, 51153), (9, 45757)) AS t(digit, exp_ppm))
      |SELECT obs.digit, CAST(n_obs AS BIGINT) AS n_obs, n_total,
      |  CAST(CAST(n_obs AS HUGEINT) * 1000000 // n_total AS BIGINT) AS obs_ppm,
      |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
      |  CAST(ABS(CAST(n_obs AS HUGEINT) * 1000000 // n_total - exp_ppm)
      |    AS BIGINT) AS dev_ppm
      |FROM obs JOIN exp ON obs.digit = exp.digit CROSS JOIN tot
      |ORDER BY obs.digit""".stripMargin

  /** Day-of-week seasonality index — the baseline every anomaly monitor
    * normalizes by ("is this Tuesday low, or are Tuesdays just low?").
    * Per weekday: observed days, exact revenue cents, and the index
    * (per-day average revenue vs the all-week per-day average) in ppm
    * by pure integer arithmetic. Weekday is epoch-day mod 7 (0 =
    * Thursday) — identical integer arithmetic in both engines, immune
    * to locale/week-start conventions.
    *
    * Scale shape: ONE map-side-combined 7-group aggregate (the distinct
    * day count is calendar-bounded); the index join is a broadcast of a
    * 1-row total.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select((datediff(to_date(col("o_orderdate")), lit("1970-01-01")) % 7)
        .cast("int").as("dow"),
        to_date(col("o_orderdate")).as("day"),
        cents(col("o_totalprice")).as("r"))
      .groupBy(col("dow"))
      .agg(countDistinct(col("day")).as("n_days"),
        sum(col("r")).cast("bigint").as("sum_cents"))
    val tot = per.agg(sum(col("n_days")).cast("bigint").as("tot_days"),
      sum(col("sum_cents")).cast("bigint").as("tot_cents"))
    per.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"), col("sum_cents"),
        expr(s"cast(cast(sum_cents as $d38) * tot_days * 1000000" +
          s" div (cast(n_days as $d38) * tot_cents) as bigint)").as("idx_ppm"))
      .orderBy(col("dow"))
  }

  val seasonalitySql: String =
    """WITH per AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01',
      |           CAST(o_orderdate AS DATE)) % 7 AS INT) AS dow,
      |    CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |      AS sum_cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS tot_days,
      |               CAST(SUM(sum_cents) AS BIGINT) AS tot_cents FROM per)
      |SELECT dow, n_days, sum_cents,
      |  CAST(CAST(sum_cents AS HUGEINT) * tot_days * 1000000
      |    // (CAST(n_days AS HUGEINT) * tot_cents) AS BIGINT) AS idx_ppm
      |FROM per CROSS JOIN tot
      |ORDER BY dow""".stripMargin

  /** Market-basket association rules over brands co-purchased in one
    * order — support, both confidences, and lift for every brand pair,
    * all in exact integer ppm. The itemset domain (25 brands) bounds
    * the output at ≤ 300 rows regardless of corpus size.
    *
    * Scale shape: the corpus joins the part dim (broadcast-sized next
    * to lineitem), collapses to per-order brand sets in ONE shuffle
    * (collect_set dedupes — no separate distinct pass), and the pair
    * expansion is IN-ROW (explode² of a ≤ |brands|-element set, ≤ 7
    * items/order in practice) — never a corpus self-join. The pair
    * aggregate is |brands|²-grouped with map-side combine.
    */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    import graft.Checkpoints.CheckpointOps
    // the per-order sets feed THREE consumers (pairs, marginals, total);
    // without the lineage cut the lazy plan re-scans lineitem for the
    // total leg (Spark's exchange reuse misses it — the count prunes
    // columns differently, so the exchanges don't match)
    val setsCached = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("p_brand")).as("bs"))
      .select(col("bs"))
      .cutLineage()
    val pairs = setsCached
      .select(explode(col("bs")).as("a"), col("bs"))
      .select(col("a"), explode(col("bs")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val brandCnt = setsCached.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("n_x"))
    val tot = setsCached.agg(count(lit(1)).cast("bigint").as("n_orders"))
    pairs
      .join(broadcast(brandCnt.select(col("brand").as("a"),
        col("n_x").as("n_a"))), Seq("a"))
      .join(broadcast(brandCnt.select(col("brand").as("b"),
        col("n_x").as("n_b"))), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_orders"),
        expr(s"cast(cast(n_ab as $d38) * 1000000 div n_a as bigint)")
          .as("conf_ab_ppm"),
        expr(s"cast(cast(n_ab as $d38) * 1000000 div n_b as bigint)")
          .as("conf_ba_ppm"),
        expr(s"cast(cast(n_ab as $d38) * n_orders * 1000000" +
          s" div (cast(n_a as $d38) * n_b) as bigint)").as("lift_ppm"))
      .orderBy(col("a"), col("b"))
  }

  val assocRulesSql: String =
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |pairs AS (
      |  SELECT x.brand AS a, y.brand AS b, COUNT(*) AS n_ab
      |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
      |  GROUP BY 1, 2),
      |bc AS (SELECT brand, COUNT(*) AS n_x FROM ob GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob)
      |SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(ca.n_x AS BIGINT) AS n_a, CAST(cb.n_x AS BIGINT) AS n_b,
      |  n_orders,
      |  CAST(CAST(n_ab AS HUGEINT) * 1000000 // ca.n_x AS BIGINT)
      |    AS conf_ab_ppm,
      |  CAST(CAST(n_ab AS HUGEINT) * 1000000 // cb.n_x AS BIGINT)
      |    AS conf_ba_ppm,
      |  CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
      |    // (CAST(ca.n_x AS HUGEINT) * cb.n_x) AS BIGINT) AS lift_ppm
      |FROM pairs JOIN bc ca ON pairs.a = ca.brand
      |           JOIN bc cb ON pairs.b = cb.brand
      |CROSS JOIN tot
      |ORDER BY a, b""".stripMargin

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13) —
    * the adjustment every mature A/B platform applies: regress the
    * post-period metric on the pre-period metric (θ = cov/var over the
    * enrolled population) and report per-arm means with the pre-period
    * imbalance removed. Arms are custkey parity (the q_abtest
    * convention); the pre/post split is a fixed calendar date. All five
    * moments are decimal(38,0) sums of exact cents; θ, the adjusted
    * means, and the variance-reduction ratio (squared pre/post
    * correlation, in ppm via two exact integer divisions — never
    * squaring a decimal that could overflow 38 digits) mirror the
    * DuckDB formulation step for step.
    *
    * Scale shape: orders collapse to per-customer pre/post sums in one
    * custkey shuffle (BOTH periods from ONE scan via conditional
    * aggregation), join the customer dim on its key, then two bounded
    * aggregates (1 overall row + 2 arm rows) and a broadcast combine.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("1999-01-01")
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(to_date(col("o_orderdate")) < split,
          cents(col("o_totalprice"))).otherwise(0L)).as("pre0"),
        sum(when(to_date(col("o_orderdate")) >= split,
          cents(col("o_totalprice"))).otherwise(0L)).as("post0"))
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), pmod(col("c_custkey"), lit(2)).as("variant"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("variant"),
        coalesce(col("pre0"), lit(0L)).as("x"),
        coalesce(col("post0"), lit(0L)).as("y"))
    val ov = base.agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(expr(s"cast(x as $d38) * y")).as("sxy"),
        sum(expr(s"cast(x as $d38) * x")).as("sxx"),
        sum(expr(s"cast(y as $d38) * y")).as("syy"))
      .select(col("n"), col("sx"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n"), col("sx"),
        (col("num").cast("double") / col("denx").cast("double")).as("theta"),
        // abs() keeps every div operand non-negative: Spark's `div`
        // truncates toward zero while DuckDB's `//` floors, so a
        // negative covariance would round differently between engines
        // (1000·|num| div denx)·(1000·|num| div deny) ≈ 10⁶·r² — genuine
        // ppm; each factor is the per-mille correlation with one of the
        // two variance denominators, so the product lands in [0, 10⁶].
        expr(s"cast((abs(num) * 1000 div denx) * (abs(num) * 1000 div deny)" +
          s" as bigint)").as("varred_ppm"))
    base.groupBy(col("variant"))
      .agg(count(lit(1)).cast("bigint").as("n_users"),
        sum(col("x").cast(d38)).as("sx_g"),
        sum(col("y").cast(d38)).as("sy_g"))
      .crossJoin(broadcast(ov))
      .select(col("variant"), col("n_users"), col("theta"),
        (col("sy_g").cast("double") / col("n_users").cast("double"))
          .as("mean_post"),
        (col("sy_g").cast("double") / col("n_users").cast("double")
          - col("theta") *
            (col("sx_g").cast("double") / col("n_users").cast("double")
              - col("sx").cast("double") / col("n").cast("double")))
          .as("mean_adj"),
        col("varred_ppm"))
      .orderBy(col("variant"))
  }

  val cupedSql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |    SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1999-01-01'
      |        THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS pre0,
      |    SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
      |        THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS post0
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT c_custkey % 2 AS variant,
      |    COALESCE(pre0, 0) AS x, COALESCE(post0, 0) AS y
      |  FROM customer LEFT JOIN pc ON c_custkey = o_custkey),
      |m AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM base),
      |ov AS (
      |  SELECT n, sx,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
      |    CAST((ABS(n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
      |      * (ABS(n * sxy - sx * sy) * 1000 // (n * syy - sy * sy))
      |      AS BIGINT) AS varred_ppm
      |  FROM m),
      |arm AS (
      |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    SUM(CAST(x AS HUGEINT)) AS sx_g, SUM(CAST(y AS HUGEINT)) AS sy_g
      |  FROM base GROUP BY 1)
      |SELECT variant, n_users, theta,
      |  CAST(sy_g AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
      |  CAST(sy_g AS DOUBLE) / CAST(n_users AS DOUBLE)
      |    - theta * (CAST(sx_g AS DOUBLE) / CAST(n_users AS DOUBLE)
      |               - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS mean_adj,
      |  varred_ppm
      |FROM arm CROSS JOIN ov
      |ORDER BY variant""".stripMargin

  /** Mann–Whitney rank-sum test: do urgent-priority orders carry a
    * different price distribution than the rest? Computed on $100
    * price buckets (midrank tie handling) so the statistic is exact:
    * 2U = Σ_b (2·ca(b)·cumB(<b) + ca(b)·cb(b)) — every term an exact
    * integer, U itself held in decimal(38,0)/HUGEINT because nA·nB
    * overflows a BIGINT at the 100 TB row count. The tie-corrected
    * normal approximation z is the single terminal IEEE expression,
    * mirrored token for token in the oracle.
    *
    * Scale shape: the corpus collapses map-side to ≤ 5001 price-domain
    * buckets (price ≤ $500k by the audited domain contract); the
    * cumulative walk and moments run on that bounded set. The global
    * window is bucket-bounded, not corpus-bounded (allowlisted in
    * ScalePatternsSpec with this argument).
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val byBucket = Tables.orders(spark, dir)
      .select(expr("cast(round(o_totalprice*100) as bigint) div 10000")
        .as("bk"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("isa"))
      .groupBy(col("bk"))
      .agg(sum(col("isa")).as("ca"),
        sum(lit(1L) - col("isa")).as("cb"))
    val w = Window.orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = byBucket
      .withColumn("cumb", sum(col("cb")).over(w) - col("cb"))
    val m = walked.agg(
      sum(col("ca")).cast("bigint").as("n_a"),
      sum(col("cb")).cast("bigint").as("n_b"),
      sum(expr(s"cast(2 * ca as $d38) * cumb + cast(ca as $d38) * cb"))
        .as("u2"),
      sum(expr(s"cast(ca + cb as $d38) * (ca + cb) * (ca + cb) - (ca + cb)"))
        .as("tie_term"))
    // u2/tie_term are held in decimal(38,0) (nA·nB overflows BIGINT at the
    // 100 TB row count) but EMITTED as canonical digit strings — Spark
    // decimal128 and DuckDB HUGEINT agree on the text while their binary
    // representations hash differently at the driver (r10 verdict).
    m.select(col("n_a"), col("n_b"),
      col("u2").cast(d38).cast("string").as("u2"),
      col("tie_term").cast(d38).cast("string").as("tie_term"),
      (expr(s"cast(u2 - cast(n_a as $d38) * n_b as double)")
        / (lit(2.0) * sqrt(
          (col("n_a").cast("double") * col("n_b").cast("double") / lit(12.0))
            * ((col("n_a") + col("n_b")).cast("double") + lit(1.0)
              - col("tie_term").cast("double")
                / ((col("n_a") + col("n_b")).cast("double")
                  * ((col("n_a") + col("n_b")).cast("double") - lit(1.0)))))))
        .as("z"))
  }

  val mannWhitneySql: String =
    """WITH b AS (
      |  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // 10000 AS bk,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT bk, ca, cb,
      |    SUM(cb) OVER (ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cb AS cumb
      |  FROM b),
      |m AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |    SUM(CAST(2 * ca AS HUGEINT) * cumb + CAST(ca AS HUGEINT) * cb)
      |      AS u2,
      |    SUM(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb) - (ca + cb))
      |      AS tie_term
      |  FROM c)
      |SELECT n_a, n_b,
      |  CAST(u2 AS VARCHAR) AS u2, CAST(tie_term AS VARCHAR) AS tie_term,
      |  CAST(u2 - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
      |    / (2.0 * sqrt(
      |        (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
      |          * (CAST(n_a + n_b AS DOUBLE) + 1.0
      |            - CAST(tie_term AS DOUBLE)
      |              / (CAST(n_a + n_b AS DOUBLE)
      |                * (CAST(n_a + n_b AS DOUBLE) - 1.0))))) AS z
      |FROM m""".stripMargin

  /** Herfindahl–Hirschman concentration index of supplier revenue per
    * nation — the market-concentration read (is one supplier carrying a
    * whole nation's volume?) behind sourcing-risk dashboards. HHI =
    * Σᵢ shareᵢ² over each nation's suppliers, in exact ppm: the share
    * squares never materialize as ratios — Σrᵢ² and (Σrᵢ)² stay exact
    * integers and ONE integer division produces the index. The divisor
    * is pre-scaled (tot² div 10⁶) so the numerator never multiplies by
    * 10⁶ — Σrᵢ² ≤ tot² can sit near the 38-digit ceiling at 100 TB and
    * a ×10⁶ on top would overflow.
    *
    * Scale shape: corpus → (nation, supplier) aggregate in one shuffle
    * (supplier dim joins broadcast-sized), then a |nations|-group
    * aggregate; output 25 rows.
    */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("r"))
    rev.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r")).cast("bigint").as("rev_cents"),
        sum(expr(s"cast(r as $d38) * r")).as("sum_sq"))
      .select(col("s_nationkey"), col("n_suppliers"), col("rev_cents"),
        // least(..., 10⁶): the pre-scaled divisor (tot² div 10⁶) floors,
        // so a group whose tot² < 10¹² could otherwise exceed 10⁶ ppm
        // and break the documented [10⁶/n, 10⁶] band.
        expr(s"cast(least(sum_sq div greatest(cast(rev_cents as $d38)" +
          s" * rev_cents div 1000000, 1), 1000000) as bigint)")
          .as("hhi_ppm"))
      .orderBy(col("s_nationkey"))
  }

  val hhiSql: String =
    """WITH rev AS (
      |  SELECT s_nationkey, s_suppkey,
      |    SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS r
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2)
      |SELECT s_nationkey, COUNT(*) AS n_suppliers,
      |  CAST(SUM(r) AS BIGINT) AS rev_cents,
      |  CAST(LEAST(SUM(CAST(r AS HUGEINT) * r)
      |    // GREATEST(CAST(SUM(r) AS HUGEINT) * SUM(r) // 1000000, 1),
      |    1000000) AS BIGINT) AS hhi_ppm
      |FROM rev GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Inter-purchase-time distribution — the replenishment-cycle read
    * (how many weeks between a customer's consecutive orders?) behind
    * lifecycle messaging and demand forecasting. Consecutive-order gaps
    * come from a CUSTOMER-partitioned lag window (deterministic
    * tie-break on orderkey for same-day orders), bucketed into weeks
    * capped at 52+, with each bucket's exact share in ppm.
    *
    * Scale shape: the window partitions by customer (corpus/|customers|
    * rows per partition — never global); gaps collapse map-side into
    * ≤ 53 week buckets; the share join is a broadcast 1-row total.
    */
  def interpurchase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("day"))
      .withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr(
        "least(cast(day - prev as bigint) div 7, cast(52 as bigint))")
        .as("week_bucket"))
    val per = gaps.groupBy(col("week_bucket"))
      .agg(count(lit(1)).as("n_gaps"))
    val tot = per.agg(sum(col("n_gaps")).cast("bigint").as("n_total"))
    per.crossJoin(broadcast(tot))
      .select(col("week_bucket"), col("n_gaps"),
        expr(s"cast(cast(n_gaps as $d38) * 1000000 div n_total as bigint)")
          .as("share_ppm"))
      .orderBy(col("week_bucket"))
  }

  val interpurchaseSql: String =
    """WITH gaps AS (
      |  SELECT day - LAG(day, 1) OVER (PARTITION BY o_custkey
      |           ORDER BY day, o_orderkey) AS gap
      |  FROM (SELECT o_custkey, o_orderkey,
      |          date_diff('day', DATE '1970-01-01',
      |            CAST(o_orderdate AS DATE)) AS day
      |        FROM orders)),
      |-- the NULL filter must precede LEAST: DuckDB's LEAST IGNORES
      |-- NULLs (LEAST(NULL, 52) = 52), so first orders would leak into
      |-- the 52+ bucket instead of dropping out
      |g AS (SELECT LEAST(gap // 7, 52) AS week_bucket FROM gaps
      |      WHERE gap IS NOT NULL),
      |per AS (SELECT week_bucket, COUNT(*) AS n_gaps FROM g GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_gaps) AS BIGINT) AS n_total FROM per)
      |SELECT week_bucket, n_gaps,
      |  CAST(CAST(n_gaps AS HUGEINT) * 1000000 // n_total AS BIGINT)
      |    AS share_ppm
      |FROM per CROSS JOIN tot
      |ORDER BY week_bucket""".stripMargin

  /** Wald–Wolfowitz runs test on daily revenue — the randomness check
    * beside [[graft.operators.Analytics.autocorr]] and q_changepoint:
    * too FEW runs of above/below-median days means regime persistence
    * (trend/level shifts), too many means oscillation. The median is an
    * exact ORDER STATISTIC (rank ⌈n/2⌉ with day tie-break — never an
    * interpolated quantile), the run count is exact integer window
    * arithmetic, and z is the single terminal IEEE expression mirrored
    * token for token.
    *
    * Scale shape: the corpus collapses map-side to the calendar-bounded
    * daily aggregate; every window below runs on |days| rows
    * (allowlisted global window, the q_autocorr argument).
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).cast("bigint").as("r"))
    val n1row = daily.agg(count(lit(1)).cast("bigint").as("n_days"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("r"), col("day"))))
      .crossJoin(broadcast(n1row))
      .filter(col("rn") === expr("cast((n_days + 1) div 2 as int)"))
      .select(col("r").as("med"))
    val walked = daily.crossJoin(broadcast(med))
      .select(col("day"), (col("r") > col("med")).cast("int").as("x"))
      .withColumn("prev", lag(col("x"), 1).over(Window.orderBy(col("day"))))
    walked.agg(
        count(lit(1)).cast("bigint").as("n_days"),
        sum(col("x")).cast("bigint").as("n_above"),
        (sum(when(col("prev").isNotNull && col("x") =!= col("prev"), 1L)
          .otherwise(0L)) + 1L).cast("bigint").as("n_runs"))
      .select(col("n_days"), col("n_above"), col("n_runs"),
        // z over exact ints: E[R] = 2ab/n + 1, Var = 2ab(2ab-n)/(n²(n-1))
        ((col("n_runs").cast("double")
          - (lit(2.0) * col("n_above").cast("double")
            * (col("n_days") - col("n_above")).cast("double")
            / col("n_days").cast("double") + lit(1.0)))
          / sqrt(lit(2.0) * col("n_above").cast("double")
            * (col("n_days") - col("n_above")).cast("double")
            * (lit(2.0) * col("n_above").cast("double")
              * (col("n_days") - col("n_above")).cast("double")
              - col("n_days").cast("double"))
            / (col("n_days").cast("double") * col("n_days").cast("double")
              * (col("n_days").cast("double") - lit(1.0)))))
          .as("z"))
  }

  val runsTestSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS r
      |  FROM orders GROUP BY 1),
      |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
      |med AS (
      |  SELECT r AS med FROM (
      |    SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rn FROM daily)
      |  CROSS JOIN nr WHERE rn = (n_days + 1) // 2),
      |walked AS (
      |  SELECT day, CAST(r > med AS INT) AS x,
      |    LAG(CAST(r > med AS INT), 1) OVER (ORDER BY day) AS prev
      |  FROM daily CROSS JOIN med),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS n_above,
      |    CAST(SUM(CASE WHEN prev IS NOT NULL AND x <> prev
      |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
      |  FROM walked)
      |SELECT n_days, n_above, n_runs,
      |  (CAST(n_runs AS DOUBLE)
      |    - (2.0 * CAST(n_above AS DOUBLE)
      |       * CAST(n_days - n_above AS DOUBLE)
      |       / CAST(n_days AS DOUBLE) + 1.0))
      |  / sqrt(2.0 * CAST(n_above AS DOUBLE)
      |    * CAST(n_days - n_above AS DOUBLE)
      |    * (2.0 * CAST(n_above AS DOUBLE)
      |       * CAST(n_days - n_above AS DOUBLE)
      |       - CAST(n_days AS DOUBLE))
      |    / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
      |       * (CAST(n_days AS DOUBLE) - 1.0))) AS z
      |FROM m""".stripMargin

  /** Two-sample Kolmogorov–Smirnov test — does the order-value
    * DISTRIBUTION differ between urgent/high-priority and normal orders?
    * The third leg of the nonparametric family (location shift:
    * [[mannWhitney]]; sequence randomness: [[runsTest]]; here: maximum
    * ECDF divergence, sensitive to shape differences a rank-sum misses).
    *
    * Same bucket-bounded discipline as mannWhitney: values land in $100
    * price buckets (≤5001 by q_data_audit's price-domain contract), the
    * per-bucket (countA, countB) aggregate collapses the corpus map-side,
    * and the cumulative ECDF walk runs on that bounded set — the global
    * window is bucket-bounded, not corpus-bounded (ScalePatternsSpec
    * allowlist argument).
    *
    * Exactness: D = max |cumA·n_b − cumB·n_a| / (n_a·n_b). The numerator
    * is pure integer arithmetic held in decimal(38,0) (cum·n overflows
    * BIGINT at the 100 TB design point) and EMITTED as a canonical digit
    * string (the r11 wide-integer rule); `d` and the scaled `ks_stat`
    * are single terminal IEEE expressions mirrored verbatim in the
    * oracle.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val byBucket = Tables.orders(spark, dir)
      .select(expr("cast(round(o_totalprice*100) as bigint) div 10000")
        .as("bk"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("isa"))
      .groupBy(col("bk"))
      .agg(sum(col("isa")).as("ca"),
        sum(lit(1L) - col("isa")).as("cb"))
    val w = Window.orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // whole-set totals as an unordered window over the same bounded bucket
    // aggregate (default frame = entire partition)
    val wAll = Window.partitionBy()
    val walked = byBucket
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("ta", sum(col("ca")).over(wAll))
      .withColumn("tb", sum(col("cb")).over(wAll))
    val m = walked.agg(
      max(col("ta")).cast("bigint").as("n_a"),
      max(col("tb")).cast("bigint").as("n_b"),
      max(abs(expr(s"cast(cuma as $d38) * tb - cast(cumb as $d38) * ta")))
        .as("d_num"))
    m.select(col("n_a"), col("n_b"),
      col("d_num").cast(d38).cast("string").as("d_num"),
      (col("d_num").cast("double")
        / (col("n_a").cast("double") * col("n_b").cast("double"))).as("d"),
      (sqrt(col("n_a").cast("double") * col("n_b").cast("double")
        / (col("n_a") + col("n_b")).cast("double"))
        * (col("d_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))))
        .as("ks_stat"))
  }

  val ksTestSql: String =
    """WITH b AS (
      |  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // 10000 AS bk,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT bk, ca, cb,
      |    SUM(ca) OVER (ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    SUM(ca) OVER () AS ta, SUM(cb) OVER () AS tb
      |  FROM b),
      |m AS (
      |  SELECT CAST(MAX(ta) AS BIGINT) AS n_a, CAST(MAX(tb) AS BIGINT) AS n_b,
      |    MAX(ABS(CAST(cuma AS HUGEINT) * tb - CAST(cumb AS HUGEINT) * ta))
      |      AS d_num
      |  FROM c)
      |SELECT n_a, n_b, CAST(d_num AS VARCHAR) AS d_num,
      |  CAST(d_num AS DOUBLE)
      |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d,
      |  sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |    / CAST(n_a + n_b AS DOUBLE))
      |    * (CAST(d_num AS DOUBLE)
      |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS ks_stat
      |FROM m""".stripMargin

  /** 1-D earth mover's distance (Wasserstein-1) — HOW FAR apart are the
    * urgent-vs-normal price distributions, in dollars? The integral
    * counterpart of [[ksTest]]'s max divergence: KS asks for the largest
    * ECDF gap, EMD sums ALL the gaps weighted by the price distance a
    * unit of mass must travel — the number a cost model can act on.
    *
    * Same $100-bucket discipline as the other legs (corpus collapses
    * map-side to ≤ 5001 buckets by the audited price-domain contract).
    * On a sparse 1-D grid W1 = Σᵢ |F_A(bᵢ) − F_B(bᵢ)| · (bᵢ₊₁ − bᵢ) · Δ:
    * the ECDF difference is constant between consecutive OBSERVED
    * buckets, so each term is the gap-weighted cum difference and the
    * last bucket contributes nothing (both ECDFs are 1 beyond it).
    *
    * Exactness: the numerator Σ |cumA·n_b − cumB·n_a| · gap is pure
    * integer arithmetic in decimal(38,0)/HUGEINT (≤ n_a·n_b·gridWidth
    * ~ 10²⁷ at the 100 TB design point), emitted as a canonical digit
    * string; `emd_dollars` = num·100/(n_a·n_b) — the ×100 is the
    * bucket width in dollars — as the single mirrored terminal IEEE
    * expression.
    */
  def emd(spark: SparkSession, dir: String): DataFrame = {
    val byBucket = Tables.orders(spark, dir)
      .select(expr("cast(round(o_totalprice*100) as bigint) div 10000")
        .as("bk"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("isa"))
      .groupBy(col("bk"))
      .agg(sum(col("isa")).as("ca"),
        sum(lit(1L) - col("isa")).as("cb"))
    val w = Window.orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val wLead = Window.orderBy(col("bk"))
    val walked = byBucket
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("ta", sum(col("ca")).over(wAll))
      .withColumn("tb", sum(col("cb")).over(wAll))
      .withColumn("gap", lead(col("bk"), 1).over(wLead) - col("bk"))
    val m = walked.agg(
      max(col("ta")).cast("bigint").as("n_a"),
      max(col("tb")).cast("bigint").as("n_b"),
      sum(expr(s"""case when gap is not null
        | then abs(cast(cuma as $d38) * tb - cast(cumb as $d38) * ta) * gap
        | else cast(0 as $d38) end""".stripMargin)).as("w1_num"))
    m.select(col("n_a"), col("n_b"),
      col("w1_num").cast(d38).cast("string").as("w1_num"),
      (col("w1_num").cast("double") * lit(100.0)
        / (col("n_a").cast("double") * col("n_b").cast("double")))
        .as("emd_dollars"))
  }

  val emdSql: String =
    """WITH b AS (
      |  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // 10000 AS bk,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT bk, ca, cb,
      |    SUM(ca) OVER (ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    SUM(ca) OVER () AS ta, SUM(cb) OVER () AS tb,
      |    LEAD(bk, 1) OVER (ORDER BY bk) - bk AS gap
      |  FROM b),
      |m AS (
      |  SELECT CAST(MAX(ta) AS BIGINT) AS n_a, CAST(MAX(tb) AS BIGINT) AS n_b,
      |    SUM(CASE WHEN gap IS NOT NULL
      |      THEN ABS(CAST(cuma AS HUGEINT) * tb - CAST(cumb AS HUGEINT) * ta)
      |        * gap
      |      ELSE CAST(0 AS HUGEINT) END) AS w1_num
      |  FROM c)
      |SELECT n_a, n_b, CAST(w1_num AS VARCHAR) AS w1_num,
      |  CAST(w1_num AS DOUBLE) * 100.0
      |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS emd_dollars
      |FROM m""".stripMargin

  /** Lagged cross-correlation — does today's REVENUE predict order
    * volume k days out? (Revenue at day d is paired with order count at
    * day d+k, i.e. revenue leads.) Pearson correlation between the daily
    * revenue series and the daily order-count series at lags 0..7, the
    * lead-lag diagnostic behind forecasting-feature selection (and the
    * bivariate companion of [[Analytics.autocorr]]'s univariate ACF).
    *
    * Scale shape: the corpus collapses map-side to the DAILY aggregate
    * (rows = |days|, calendar-bounded — the q_autocorr argument); the
    * lag alignment is an 8× crossJoin of that bounded series with the
    * literal lag panel, joined back on integer day index (both sides
    * broadcast-small at any corpus size). No corpus-sized window, no
    * second corpus pass.
    *
    * Exactness: per lag every moment (Σx, Σy, Σxy, Σx², Σy²) is exact
    * integer arithmetic over (cents, counts) held in
    * decimal(38,0)/HUGEINT — Σx² ~ 10³⁵ at the 100 TB design point —
    * emitted as canonical digit strings; corr is the single mirrored
    * terminal IEEE expression (the [[spearman]] formula shape).
    */
  def crosscorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).cast("bigint").as("xc"),
        count(lit(1)).as("yc"))
      .select(datediff(col("day"), lit("1970-01-01")).as("di"),
        col("xc"), col("yc"))
    val lags = spark.range(0L, 8L)
      .select(col("id").cast("bigint").as("lag_d"))
    val pairs = daily.select(col("di"), col("xc"))
      .crossJoin(broadcast(lags))
      .withColumn("di2", col("di").cast("bigint") + col("lag_d"))
      .join(broadcast(daily.select(col("di").cast("bigint").as("di2"),
        col("yc"))), Seq("di2"))
    val m = pairs.groupBy(col("lag_d"))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum(expr(s"cast(xc as $d38)")).as("sx"),
        sum(expr(s"cast(yc as $d38)")).as("sy"),
        sum(expr(s"cast(xc as $d38) * yc")).as("sxy"),
        sum(expr(s"cast(xc as $d38) * xc")).as("sxx"),
        sum(expr(s"cast(yc as $d38) * yc")).as("syy"))
    m.select(col("lag_d"), col("n_days"),
      col("sx").cast(d38).cast("string").as("sx"),
      col("sy").cast(d38).cast("string").as("sy"),
      col("sxy").cast(d38).cast("string").as("sxy"),
      col("sxx").cast(d38).cast("string").as("sxx"),
      col("syy").cast(d38).cast("string").as("syy"),
      ((col("n_days").cast("double") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double"))
        / (sqrt(col("n_days").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          * sqrt(col("n_days").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))))
        .as("corr_xy"))
      .orderBy(col("lag_d"))
  }

  val crosscorrSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS xc,
      |    CAST(COUNT(*) AS BIGINT) AS yc
      |  FROM orders GROUP BY 1),
      |lags AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (1), (2), (3),
      |    (4), (5), (6), (7)) t(lag_d)),
      |p AS (
      |  SELECT l.lag_d, a.xc, b.yc
      |  FROM daily a CROSS JOIN lags l
      |  JOIN daily b ON b.di = a.di + l.lag_d),
      |m AS (
      |  SELECT lag_d, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    SUM(CAST(xc AS HUGEINT)) AS sx,
      |    SUM(CAST(yc AS HUGEINT)) AS sy,
      |    SUM(CAST(xc AS HUGEINT) * yc) AS sxy,
      |    SUM(CAST(xc AS HUGEINT) * xc) AS sxx,
      |    SUM(CAST(yc AS HUGEINT) * yc) AS syy
      |  FROM p GROUP BY 1)
      |SELECT lag_d, n_days,
      |  CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
      |  CAST(sxy AS VARCHAR) AS sxy, CAST(sxx AS VARCHAR) AS sxx,
      |  CAST(syy AS VARCHAR) AS syy,
      |  (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_xy
      |FROM m ORDER BY lag_d""".stripMargin

  /** Chi-square independence screen — is order PRIORITY associated with
    * day-of-week? The categorical-association leg of the insight family
    * (location: mannWhitney, shape: ksTest, randomness: runsTest, fraud:
    * benford). One corpus aggregate to the |priorities|×|weekdays| ≤ 35
    * cell grid (map-side combined); marginals derive from the cell table
    * itself (bounded) via broadcast — no second corpus pass.
    *
    * Per cell: the exact observed/marginal integers; the lift deviation
    * |O·T − R·C|·10⁶ div (R·C) in exact integer ppm (how far the cell
    * sits from independence, 0 = exactly independent); and the χ²
    * contribution (O−E)²/E as ONE mirrored terminal IEEE expression over
    * the exact integers (the z-formula precedent). |O·T − R·C| ≤ T² is
    * held in decimal(38,0)/HUGEINT and emitted as a digit string — at
    * the 100 TB design point T² overflows BIGINT (the r11 wide-integer
    * rule).
    */
  def chi2Assoc(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"),
        (datediff(to_date(col("o_orderdate")), lit("1970-01-01")) % 7)
          .cast("int").as("dow"))
      .groupBy(col("prio"), col("dow"))
      .agg(count(lit(1)).as("n_obs"))
    val rowTot = cells.groupBy(col("prio"))
      .agg(sum(col("n_obs")).cast("bigint").as("n_row"))
    val colTot = cells.groupBy(col("dow"))
      .agg(sum(col("n_obs")).cast("bigint").as("n_col"))
    val tot = cells.agg(sum(col("n_obs")).cast("bigint").as("n_total"))
    cells
      .join(broadcast(rowTot), Seq("prio"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(tot))
      .select(col("prio").as("o_orderpriority"), col("dow"),
        col("n_obs"), col("n_row"), col("n_col"), col("n_total"),
        expr(s"cast(abs(cast(n_obs as $d38) * n_total"
          + s" - cast(n_row as $d38) * n_col) as $d38)")
          .cast("string").as("dev"),
        expr(s"cast(abs(cast(n_obs as $d38) * n_total"
          + s" - cast(n_row as $d38) * n_col) * 1000000"
          + s" div (cast(n_row as $d38) * n_col) as bigint)")
          .as("lift_dev_ppm"),
        // (O-E)² as explicit multiplication, NOT pow(x, 2.0): pow is
        // only 1-ulp-accurate and the two engines' libm could disagree;
        // x*x is a single exactly-specified IEEE multiply
        expr("""(cast(n_obs as double)
          |  - cast(n_row as double) * cast(n_col as double)
          |    / cast(n_total as double))
          | * (cast(n_obs as double)
          |  - cast(n_row as double) * cast(n_col as double)
          |    / cast(n_total as double))
          | / (cast(n_row as double) * cast(n_col as double)
          |    / cast(n_total as double))""".stripMargin)
          .as("chi2_contrib"))
      .orderBy(col("o_orderpriority"), col("dow"))
  }

  val chi2AssocSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) % 7 AS INT) AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT prio, CAST(SUM(n_obs) AS BIGINT) AS n_row
      |      FROM cells GROUP BY 1),
      |c AS (SELECT dow, CAST(SUM(n_obs) AS BIGINT) AS n_col
      |      FROM cells GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM cells)
      |SELECT cells.prio AS o_orderpriority, cells.dow AS dow,
      |  n_obs, n_row, n_col, n_total,
      |  CAST(ABS(CAST(n_obs AS HUGEINT) * n_total
      |    - CAST(n_row AS HUGEINT) * n_col) AS VARCHAR) AS dev,
      |  CAST(ABS(CAST(n_obs AS HUGEINT) * n_total
      |    - CAST(n_row AS HUGEINT) * n_col) * 1000000
      |    // (CAST(n_row AS HUGEINT) * n_col) AS BIGINT) AS lift_dev_ppm,
      |  (CAST(n_obs AS DOUBLE)
      |    - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
      |      / CAST(n_total AS DOUBLE))
      |   * (CAST(n_obs AS DOUBLE)
      |    - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
      |      / CAST(n_total AS DOUBLE))
      |   / (CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
      |      / CAST(n_total AS DOUBLE)) AS chi2_contrib
      |FROM cells JOIN r ON cells.prio = r.prio
      |  JOIN c ON cells.dow = c.dow CROSS JOIN t
      |ORDER BY 1, 2""".stripMargin

  /** Spearman rank correlation — how monotone is the quantity→price
    * relation on line items? The rank-correlation leg of the
    * nonparametric family (location: [[mannWhitney]], shape: [[ksTest]],
    * randomness: [[runsTest]], categorical association: [[chi2Assoc]];
    * here: monotone association, robust to the outliers and curvature
    * that bend the Pearson r of q_linreg).
    *
    * Same bucket-bounded discipline as the other legs: the corpus
    * collapses map-side to the (quantity, $100-price-bucket) joint grid —
    * ≤ 50 × ~1100 cells, bounded by the ATTRIBUTE DOMAINS (quantity
    * 1..50, extendedprice ≤ $110k by the part retail-price domain), not
    * corpus rows. Midranks come from cumulative walks over the two
    * MARGINALS (≤ 50 / ≤ ~1100 rows — the global windows are
    * domain-bounded, ScalePatternsSpec allowlist argument), doubled so
    * the half-rank of an even tie group stays an exact integer:
    * u = 2·cumBefore + count + 1 = twice the midrank.
    *
    * Exactness: every moment (Σw·u, Σw·u², Σw·u·v, …) is exact integer
    * arithmetic held in decimal(38,0)/HUGEINT — Σw·u² ≤ 4n³ needs ~37
    * digits at the 100 TB design point (n = 10¹²) — and EMITTED as a
    * canonical digit string (the r11 wide-integer rule). rho (identical
    * under the doubling: both numerator and denominator scale by 4) is
    * the single terminal IEEE expression mirrored token for token.
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(expr("cast(round(l_quantity) as bigint)").as("q"),
        expr("cast(round(l_extendedprice*100) as bigint) div 10000")
          .as("pb"))
      .groupBy(col("q"), col("pb"))
      .agg(count(lit(1)).as("w"))
    val wq = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.orderBy(col("pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // doubled midrank per marginal value: 2·(rows strictly below) + ties + 1
    // = 2·cumIncluding − ties + 1 — an exact odd/even-safe integer
    val ux = cells.groupBy(col("q")).agg(sum(col("w")).as("wx"))
      .withColumn("u", lit(2L) * sum(col("wx")).over(wq) - col("wx") + 1L)
      .select(col("q"), col("wx"), col("u"))
    val vy = cells.groupBy(col("pb")).agg(sum(col("w")).as("wy"))
      .withColumn("v", lit(2L) * sum(col("wy")).over(wp) - col("wy") + 1L)
      .select(col("pb"), col("wy"), col("v"))
    val m = cells
      .join(broadcast(ux.select(col("q"), col("u"))), Seq("q"))
      .join(broadcast(vy.select(col("pb"), col("v"))), Seq("pb"))
      .agg(sum(col("w")).cast("bigint").as("n"),
        sum(expr(s"cast(w as $d38) * u")).as("su"),
        sum(expr(s"cast(w as $d38) * v")).as("sv"),
        sum(expr(s"cast(w as $d38) * u * u")).as("suu"),
        sum(expr(s"cast(w as $d38) * v * v")).as("svv"),
        sum(expr(s"cast(w as $d38) * u * v")).as("suv"))
    m.select(col("n"),
      col("su").cast(d38).cast("string").as("su"),
      col("sv").cast(d38).cast("string").as("sv"),
      col("suu").cast(d38).cast("string").as("suu"),
      col("svv").cast(d38).cast("string").as("svv"),
      col("suv").cast(d38).cast("string").as("suv"),
      ((col("n").cast("double") * col("suv").cast("double")
        - col("su").cast("double") * col("sv").cast("double"))
        / (sqrt(col("n").cast("double") * col("suu").cast("double")
          - col("su").cast("double") * col("su").cast("double"))
          * sqrt(col("n").cast("double") * col("svv").cast("double")
            - col("sv").cast("double") * col("sv").cast("double"))))
        .as("rho"))
  }

  val spearmanSql: String =
    """WITH cells AS (
      |  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
      |    CAST(ROUND(l_extendedprice*100) AS BIGINT) // 10000 AS pb,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |mx AS (
      |  SELECT q, CAST(SUM(w) AS BIGINT) AS wx FROM cells GROUP BY 1),
      |ux AS (
      |  SELECT q,
      |    2 * SUM(wx) OVER (ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - wx + 1 AS u
      |  FROM mx),
      |my AS (
      |  SELECT pb, CAST(SUM(w) AS BIGINT) AS wy FROM cells GROUP BY 1),
      |vy AS (
      |  SELECT pb,
      |    2 * SUM(wy) OVER (ORDER BY pb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - wy + 1 AS v
      |  FROM my),
      |m AS (
      |  SELECT CAST(SUM(w) AS BIGINT) AS n,
      |    SUM(CAST(w AS HUGEINT) * u) AS su,
      |    SUM(CAST(w AS HUGEINT) * v) AS sv,
      |    SUM(CAST(w AS HUGEINT) * u * u) AS suu,
      |    SUM(CAST(w AS HUGEINT) * v * v) AS svv,
      |    SUM(CAST(w AS HUGEINT) * u * v) AS suv
      |  FROM cells JOIN ux USING (q) JOIN vy USING (pb))
      |SELECT n, CAST(su AS VARCHAR) AS su, CAST(sv AS VARCHAR) AS sv,
      |  CAST(suu AS VARCHAR) AS suu, CAST(svv AS VARCHAR) AS svv,
      |  CAST(suv AS VARCHAR) AS suv,
      |  (CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)
      |    - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
      |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
      |    * sqrt(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
      |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))) AS rho
      |FROM m""".stripMargin

  /** Kendall tau-b — the pairwise-concordance rank correlation on the
    * same (quantity, $100-price-bucket) grid as [[spearman]]. tau answers
    * a subtly different question (probability a random pair is ordered
    * the same way in both variables vs Spearman's rank-linear fit) and
    * its tie correction is exact here because BOTH variables are heavily
    * tied by construction.
    *
    * The O(n²) pair space never materializes: the corpus collapses
    * map-side to the ≤ 50 × ~1100 joint grid (attribute-domain-bounded,
    * the spearman argument), the grid is DENSIFIED by crossing the two
    * observed marginals (missing cells w = 0 — required so the window
    * walks see every column), and the north-east / south-east pair
    * counts come from two strict-suffix cumulative walks: first over q
    * within each pb column, then over pb within each q row. Every
    * window is key-partitioned with a domain-bounded partner dimension.
    *
    * Exactness: concordant/discordant counts and the DOUBLED tie terms
    * (n(n−1), Σt(t−1) — doubled so no halving division ever happens;
    * every factor-of-2 cancels inside tau) are exact integers in
    * decimal(38,0)/HUGEINT — pair counts need ~24 digits at the 100 TB
    * design point — emitted as canonical digit strings (the r11
    * wide-integer rule). tau_b is the single terminal IEEE expression
    * mirrored token for token; the ScalaTest invariant pins
    * n(n−1) − tx − ty + txy = 2(C + D).
    */
  def kendall(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(expr("cast(round(l_quantity) as bigint)").as("q"),
        expr("cast(round(l_extendedprice*100) as bigint) div 10000")
          .as("pb"))
      .groupBy(col("q"), col("pb"))
      .agg(count(lit(1)).as("w"))
    // dense domain grid: every (observed q) × (observed pb) cell exists,
    // absent combinations carry w = 0 — the window walks below need the
    // full column/row to run strict suffix sums by position
    val dense = cells.select(col("q")).distinct()
      .crossJoin(broadcast(cells.select(col("pb")).distinct()))
      .join(broadcast(cells), Seq("q", "pb"), "left")
      .na.fill(0L, Seq("w"))
    val wPbAll = Window.partitionBy(col("pb"))
    val wQinPb = Window.partitionBy(col("pb")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // gtq(q, pb) = rows with the SAME price bucket and strictly larger q
    val withGtq = dense.withColumn("gtq",
      sum(col("w")).over(wPbAll) - sum(col("w")).over(wQinPb))
    val wQAll = Window.partitionBy(col("q"))
    val wPbinQ = Window.partitionBy(col("q")).orderBy(col("pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ne = pairs strictly larger in BOTH dims; se = larger q, smaller pb;
    // wx/wy = the two marginal totals, read off the partition-total
    // window sums so the tie terms need NO extra corpus branch
    val walked = withGtq
      .withColumn("ne",
        sum(col("gtq")).over(wQAll) - sum(col("gtq")).over(wPbinQ))
      .withColumn("se", sum(col("gtq")).over(wPbinQ) - col("gtq"))
      .withColumn("wx", sum(col("w")).over(wQAll))
      .withColumn("wy", sum(col("w")).over(wPbAll))
    // EVERYTHING folds into one pass over the dense grid: w = 0 cells
    // contribute nothing, and Σ_q wx(wx−1) = Σ_cells w·(wx−1) because
    // Σ_{cells in q} w = wx (same for pb / both-dims ties)
    val m = walked.agg(
      sum(col("w")).cast("bigint").as("n"),
      sum(expr(s"cast(w as $d38) * ne")).as("conc"),
      sum(expr(s"cast(w as $d38) * se")).as("disc"),
      sum(expr(s"cast(w as $d38) * (w - 1)")).as("tie_xy2"),
      sum(expr(s"cast(w as $d38) * (wx - 1)")).as("tie_x2"),
      sum(expr(s"cast(w as $d38) * (wy - 1)")).as("tie_y2"))
      .withColumn("n_pairs2", expr(s"cast(n as $d38) * (n - 1)"))
    m.select(col("n"),
      col("n_pairs2").cast(d38).cast("string").as("n_pairs2"),
      col("tie_x2").cast(d38).cast("string").as("tie_x2"),
      col("tie_y2").cast(d38).cast("string").as("tie_y2"),
      col("tie_xy2").cast(d38).cast("string").as("tie_xy2"),
      col("conc").cast(d38).cast("string").as("conc"),
      col("disc").cast(d38).cast("string").as("disc"),
      ((lit(2.0) * col("conc").cast("double")
        - lit(2.0) * col("disc").cast("double"))
        / sqrt((col("n_pairs2").cast("double")
          - col("tie_x2").cast("double"))
          * (col("n_pairs2").cast("double")
            - col("tie_y2").cast("double"))))
        .as("tau_b"))
  }

  val kendallSql: String =
    """WITH cells AS (
      |  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
      |    CAST(ROUND(l_extendedprice*100) AS BIGINT) // 10000 AS pb,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |dense AS (
      |  SELECT g.q, g.pb, COALESCE(cells.w, 0) AS w
      |  FROM (SELECT qs.q, pbs.pb
      |        FROM (SELECT DISTINCT q FROM cells) qs
      |        CROSS JOIN (SELECT DISTINCT pb FROM cells) pbs) g
      |  LEFT JOIN cells ON g.q = cells.q AND g.pb = cells.pb),
      |g1 AS (
      |  SELECT q, pb, w,
      |    SUM(w) OVER (PARTITION BY pb)
      |      - SUM(w) OVER (PARTITION BY pb ORDER BY q
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gtq
      |  FROM dense),
      |g2 AS (
      |  SELECT q, pb, w,
      |    SUM(gtq) OVER (PARTITION BY q)
      |      - SUM(gtq) OVER (PARTITION BY q ORDER BY pb
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ne,
      |    SUM(gtq) OVER (PARTITION BY q ORDER BY pb
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - gtq AS se,
      |    SUM(w) OVER (PARTITION BY q) AS wx,
      |    SUM(w) OVER (PARTITION BY pb) AS wy
      |  FROM g1),
      |cd AS (
      |  SELECT CAST(SUM(w) AS BIGINT) AS n,
      |         SUM(CAST(w AS HUGEINT) * ne) AS conc,
      |         SUM(CAST(w AS HUGEINT) * se) AS disc,
      |         SUM(CAST(w AS HUGEINT) * (w - 1)) AS tie_xy2,
      |         SUM(CAST(w AS HUGEINT) * (wx - 1)) AS tie_x2,
      |         SUM(CAST(w AS HUGEINT) * (wy - 1)) AS tie_y2
      |  FROM g2),
      |m AS (
      |  SELECT n, CAST(n AS HUGEINT) * (n - 1) AS n_pairs2,
      |    tie_x2, tie_y2, tie_xy2, conc, disc
      |  FROM cd)
      |SELECT n, CAST(n_pairs2 AS VARCHAR) AS n_pairs2,
      |  CAST(tie_x2 AS VARCHAR) AS tie_x2,
      |  CAST(tie_y2 AS VARCHAR) AS tie_y2,
      |  CAST(tie_xy2 AS VARCHAR) AS tie_xy2,
      |  CAST(conc AS VARCHAR) AS conc, CAST(disc AS VARCHAR) AS disc,
      |  (2.0 * CAST(conc AS DOUBLE) - 2.0 * CAST(disc AS DOUBLE))
      |    / sqrt((CAST(n_pairs2 AS DOUBLE) - CAST(tie_x2 AS DOUBLE))
      |      * (CAST(n_pairs2 AS DOUBLE) - CAST(tie_y2 AS DOUBLE))) AS tau_b
      |FROM m""".stripMargin

  /** Welch's unequal-variance t-test — the PARAMETRIC companion of
    * [[mannWhitney]] on the same urgent/normal split of order totals:
    * the rank-sum test asks "does one arm stochastically dominate?",
    * Welch asks "do the MEANS differ?" without assuming equal variances
    * (the classic A/B readout). One map-side-combined pass collapses the
    * corpus to two rows of exact cent moments (n, Σc, Σc² — Σc² in
    * decimal(38,0): ~10¹⁴ per row at the price cap makes BIGINT overflow
    * at ~10⁵ rows, far below the design point), pivoted into ONE row so
    * the t statistic and the Welch–Satterthwaite df are single mirrored
    * IEEE expression trees (+, ×, ÷, sqrt only — every op exactly
    * rounded, so both engines agree bit-for-bit).
    */
  def welchTtest(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("c"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("isa"))
      .agg(
        sum(col("isa")).cast("bigint").as("n_a"),
        sum(lit(1L) - col("isa")).cast("bigint").as("n_b"),
        sum(expr(s"cast(isa * c as $d38)")).as("s_a"),
        sum(expr(s"cast((1 - isa) * c as $d38)")).as("s_b"),
        sum(expr(s"cast(isa * c as $d38) * c")).as("ss_a"),
        sum(expr(s"cast((1 - isa) * c as $d38) * c")).as("ss_b"))
    // sample variance from exact moments: (n·Σc² − (Σc)²) / (n·(n−1));
    // wide integers reach double THROUGH THE DIGIT STRING: above 2^53
    // DuckDB's direct HUGEINT→DOUBLE is not correctly rounded (it
    // composes the two 64-bit halves in double arithmetic) while
    // string→double is correctly rounded in BOTH engines (strtod /
    // Double.parseDouble), so the conversion — like every later op
    // (+, ×, ÷, sqrt) — is exactly specified
    val va = "(cast(n_a as double) * cast(cast(ss_a as string) as double)" +
      " - cast(cast(s_a as string) as double) * cast(cast(s_a as string) as double))" +
      " / (cast(n_a as double) * (cast(n_a as double) - 1.0))"
    val vb = "(cast(n_b as double) * cast(cast(ss_b as string) as double)" +
      " - cast(cast(s_b as string) as double) * cast(cast(s_b as string) as double))" +
      " / (cast(n_b as double) * (cast(n_b as double) - 1.0))"
    val sea = s"($va / cast(n_a as double))"
    val seb = s"($vb / cast(n_b as double))"
    m.select(col("n_a"), col("n_b"),
      col("s_a").cast(d38).cast("string").as("s_a"),
      col("s_b").cast(d38).cast("string").as("s_b"),
      col("ss_a").cast(d38).cast("string").as("ss_a"),
      col("ss_b").cast(d38).cast("string").as("ss_b"),
      expr("cast(cast(s_a as string) as double) / cast(n_a as double)" +
        " - cast(cast(s_b as string) as double) / cast(n_b as double)")
        .as("mean_diff_cents"),
      expr(s"(cast(cast(s_a as string) as double) / cast(n_a as double)" +
        s" - cast(cast(s_b as string) as double) / cast(n_b as double))" +
        s" / sqrt($sea + $seb)").as("t_stat"),
      expr(s"(($sea + $seb) * ($sea + $seb))" +
        s" / ($sea * $sea / (cast(n_a as double) - 1.0)" +
        s" + $seb * $seb / (cast(n_b as double) - 1.0))").as("df"))
  }

  val welchTtestSql: String = {
    val va = "(CAST(n_a AS DOUBLE) * CAST(CAST(ss_a AS VARCHAR) AS DOUBLE)" +
      " - CAST(CAST(s_a AS VARCHAR) AS DOUBLE)" +
      " * CAST(CAST(s_a AS VARCHAR) AS DOUBLE))" +
      " / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
    val vb = "(CAST(n_b AS DOUBLE) * CAST(CAST(ss_b AS VARCHAR) AS DOUBLE)" +
      " - CAST(CAST(s_b AS VARCHAR) AS DOUBLE)" +
      " * CAST(CAST(s_b AS VARCHAR) AS DOUBLE))" +
      " / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
    val sea = s"($va / CAST(n_a AS DOUBLE))"
    val seb = s"($vb / CAST(n_b AS DOUBLE))"
    s"""WITH m AS (
      |  SELECT
      |    CAST(SUM(isa) AS BIGINT) AS n_a,
      |    CAST(SUM(1 - isa) AS BIGINT) AS n_b,
      |    SUM(CAST(isa * c AS HUGEINT)) AS s_a,
      |    SUM(CAST((1 - isa) * c AS HUGEINT)) AS s_b,
      |    SUM(CAST(isa * c AS HUGEINT) * c) AS ss_a,
      |    SUM(CAST((1 - isa) * c AS HUGEINT) * c) AS ss_b
      |  FROM (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c,
      |          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |            THEN 1 ELSE 0 END AS isa
      |        FROM orders))
      |SELECT n_a, n_b,
      |  CAST(s_a AS VARCHAR) AS s_a, CAST(s_b AS VARCHAR) AS s_b,
      |  CAST(ss_a AS VARCHAR) AS ss_a, CAST(ss_b AS VARCHAR) AS ss_b,
      |  CAST(CAST(s_a AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    - CAST(CAST(s_b AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE)
      |    AS mean_diff_cents,
      |  (CAST(CAST(s_a AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    - CAST(CAST(s_b AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE))
      |    / sqrt($sea + $seb) AS t_stat,
      |  (($sea + $seb) * ($sea + $seb))
      |    / ($sea * $sea / (CAST(n_a AS DOUBLE) - 1.0)
      |     + $seb * $seb / (CAST(n_b AS DOUBLE) - 1.0)) AS df
      |FROM m""".stripMargin
  }

  /** One-way ANOVA F across the five order priorities — the k-group
    * generalization of [[welchTtest]]: does ANY priority class have a
    * different mean order total? The priority domain is FIXED (the five
    * TPC-H literals), so the per-group exact moments pivot map-side into
    * one row of 15 conditional aggregates and the sums-over-groups that
    * IEEE addition makes order-sensitive become EXPLICIT left-to-right
    * expression trees mirrored token-for-token in the oracle — no
    * cross-row double sum ever happens (the chi2_assoc discipline,
    * closed over groups by pivoting the bounded domain).
    */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val base = Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("c"),
        col("o_orderpriority").as("p"))
    val aggs = prios.zipWithIndex.flatMap { case (p, i) =>
      val g = i + 1
      Seq(
        sum(when(col("p") === p, 1L).otherwise(0L)).cast("bigint")
          .as(s"n$g"),
        sum(expr(s"cast(case when p = '$p' then c else 0 end as $d38)"))
          .as(s"s$g"),
        sum(expr(s"cast(case when p = '$p' then c else 0 end as $d38) * c"))
          .as(s"ss$g"))
    }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val gs = 1 to 5
    // grand totals and the two sums of squares as explicit left-assoc
    // chains; d_g = mean_g − grand mean, ssb = Σ n_g·d_g², ssw = Σ(Σc²_g
    // − (Σc_g)²/n_g) — +, ×, ÷ only, mirrored exactly in the oracle
    val nAll = gs.map(g => s"cast(n$g as double)").mkString(" + ")
    val sAll = gs.map(g => s"cast(cast(s$g as string) as double)")
      .mkString(" + ")
    def dg(g: Int) =
      s"(cast(cast(s$g as string) as double) / cast(n$g as double)" +
        s" - ($sAll) / ($nAll))"
    val ssb = gs.map(g => s"cast(n$g as double) * ${dg(g)} * ${dg(g)}")
      .mkString(" + ")
    val ssw = gs.map(g => s"(cast(cast(ss$g as string) as double)" +
      s" - cast(cast(s$g as string) as double)" +
      s" * cast(cast(s$g as string) as double) / cast(n$g as double))")
      .mkString(" + ")
    val outs =
      gs.map(g => col(s"n$g")) ++
        gs.map(g => col(s"s$g").cast(d38).cast("string").as(s"s$g")) ++
        gs.map(g => col(s"ss$g").cast(d38).cast("string").as(s"ss$g")) ++
      Seq(expr(s"$ssb").as("ssb"), expr(s"$ssw").as("ssw"),
        expr(s"(($ssb) / 4.0) / (($ssw) / (($nAll) - 5.0))").as("f_stat"),
        expr(s"($ssb) / (($ssb) + ($ssw))").as("eta2"))
    m.select(outs: _*)
  }

  val anovaSql: String = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val gs = 1 to 5
    val aggs = prios.zipWithIndex.flatMap { case (p, i) =>
      val g = i + 1
      Seq(
        s"CAST(SUM(CASE WHEN p = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS n$g",
        s"SUM(CAST(CASE WHEN p = '$p' THEN c ELSE 0 END AS HUGEINT)) AS s$g",
        s"SUM(CAST(CASE WHEN p = '$p' THEN c ELSE 0 END AS HUGEINT) * c)" +
          s" AS ss$g")
    }.mkString(",\n      |    ")
    val nAll = gs.map(g => s"CAST(n$g AS DOUBLE)").mkString(" + ")
    val sAll = gs.map(g => s"CAST(CAST(s$g AS VARCHAR) AS DOUBLE)")
      .mkString(" + ")
    def dg(g: Int) =
      s"(CAST(CAST(s$g AS VARCHAR) AS DOUBLE) / CAST(n$g AS DOUBLE)" +
        s" - ($sAll) / ($nAll))"
    val ssb = gs.map(g => s"CAST(n$g AS DOUBLE) * ${dg(g)} * ${dg(g)}")
      .mkString(" + ")
    val ssw = gs.map(g => s"(CAST(CAST(ss$g AS VARCHAR) AS DOUBLE)" +
      s" - CAST(CAST(s$g AS VARCHAR) AS DOUBLE)" +
      s" * CAST(CAST(s$g AS VARCHAR) AS DOUBLE)" +
      s" / CAST(n$g AS DOUBLE))").mkString(" + ")
    val nCols = gs.map(g => s"n$g").mkString(", ")
    val sCols = gs.map(g => s"CAST(s$g AS VARCHAR) AS s$g").mkString(", ")
    val ssCols = gs.map(g => s"CAST(ss$g AS VARCHAR) AS ss$g")
      .mkString(", ")
    s"""WITH m AS (
      |  SELECT
      |    $aggs
      |  FROM (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c,
      |          o_orderpriority AS p
      |        FROM orders))
      |SELECT $nCols, $sCols, $ssCols,
      |  $ssb AS ssb, $ssw AS ssw,
      |  (($ssb) / 4.0) / (($ssw) / (($nAll) - 5.0)) AS f_stat,
      |  ($ssb) / (($ssb) + ($ssw)) AS eta2
      |FROM m""".stripMargin
  }

  /** Theil–Sen robust trend + exact Mann–Kendall test on weekly revenue —
    * the trend leg of the time-series health family (q_autocorr:
    * persistence; q_changepoint: level shifts; q_runs_test: randomness;
    * here: IS there a monotone drift, and how steep?). The Theil–Sen
    * slope (median of all pairwise slopes) is 29%-breakdown robust where
    * OLS ([[q_linreg]]'s family) is 0%-robust; Mann–Kendall is its
    * hypothesis-test twin (S = #rising − #falling pairs).
    *
    * The corpus collapses map-side to the calendar-bounded weekly
    * aggregate (|weeks| rows), and the O(weeks²) pair space (~59k pairs
    * on this span — weeks², NOT corpus², at any corpus size) is built
    * by exploding a sorted packed array broadcast from a 1-row
    * aggregate — no cartesian node, no corpus-sized shuffle. The median
    * slope is an exact ORDER STATISTIC (lower median, rank ⌈P/2⌉,
    * (wi,wj) tie-break — never interpolated), selected by a window over
    * the bounded pair grid. Slopes are doubles from exact-integer
    * division (both engines divide the same ints — identical), the MK
    * variance numerator 18·Var = n(n−1)(2n+5) − Σt(t−1)(2t+5) is exact
    * integer with the full tie correction, and z is the single mirrored
    * IEEE expression.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .select((datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long") / 7L).cast("long").as("wi"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("wi"))
      .agg(sum(col("c")).cast("bigint").as("rev"))
    val packed = weekly
      .agg(sort_array(collect_list(struct(col("wi"), col("rev"))))
        .as("arr"))
    val pairs = weekly.crossJoin(broadcast(packed))
      .select(col("wi"), col("rev"),
        explode(expr("filter(arr, x -> x.wi > wi)")).as("o"))
      .select(col("wi"), col("rev"),
        col("o.wi").as("wj"), col("o.rev").as("revj"))
      .select(col("wi"), col("wj"),
        (col("revj") - col("rev")).as("num"),
        (col("wj") - col("wi")).as("den"))
      .withColumn("slope",
        col("num").cast("double") / col("den").cast("double"))
    val w = Window.orderBy(col("slope"), col("wi"), col("wj"))
    val med = pairs
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("rk").cast("long").as("med_rank"),
        col("num").as("med_num"), col("den").as("med_den"),
        col("slope").as("slope_cents_per_week"))
    val trend = pairs.agg(
      sum(when(col("num") > 0L, 1L).otherwise(0L)).cast("bigint")
        .as("n_pos"),
      sum(when(col("num") === 0L, 1L).otherwise(0L)).cast("bigint")
        .as("n_zero"),
      sum(when(col("num") < 0L, 1L).otherwise(0L)).cast("bigint")
        .as("n_neg"))
    // tie term over equal-revenue groups (slope-0 ties): Σ t(t−1)(2t+5)
    val ties = weekly.groupBy(col("rev"))
      .agg(count(lit(1)).cast("bigint").as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .cast("bigint").as("tie18"))
    val n = weekly.agg(count(lit(1)).cast("bigint").as("n_weeks"))
    med.crossJoin(broadcast(trend)).crossJoin(broadcast(ties))
      .crossJoin(broadcast(n))
      .select(col("n_weeks"), col("n_pairs"), col("med_rank"),
        col("med_num"), col("med_den"), col("slope_cents_per_week"),
        col("n_pos"), col("n_zero"), col("n_neg"),
        (col("n_pos") - col("n_neg")).as("mk_s"),
        expr("n_weeks * (n_weeks - 1) * (2 * n_weeks + 5) - tie18")
          .as("var18"),
        expr("""(cast(n_pos - n_neg as double)
          |  - cast(case when n_pos - n_neg > 0 then 1
          |              when n_pos - n_neg < 0 then -1
          |              else 0 end as double))
          | / sqrt(cast(var18 as double) / 18.0)""".stripMargin
          .replace("var18",
            "(n_weeks * (n_weeks - 1) * (2 * n_weeks + 5) - tie18)"))
          .as("z_mk"))
  }

  val theilSenSql: String =
    """WITH weekly AS (
      |  SELECT CAST(DATEDIFF('day', DATE '1970-01-01',
      |           CAST(o_orderdate AS DATE)) // 7 AS BIGINT) AS wi,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |pairs AS (
      |  SELECT a.wi AS wi, b.wi AS wj,
      |    b.rev - a.rev AS num, b.wi - a.wi AS den,
      |    CAST(b.rev - a.rev AS DOUBLE) / CAST(b.wi - a.wi AS DOUBLE)
      |      AS slope
      |  FROM weekly a JOIN weekly b ON b.wi > a.wi),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY slope, wi, wj) AS rk,
      |    COUNT(*) OVER () AS n_pairs
      |  FROM pairs),
      |med AS (
      |  SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
      |    CAST(rk AS BIGINT) AS med_rank, num AS med_num,
      |    den AS med_den, slope AS slope_cents_per_week
      |  FROM ranked WHERE rk = (n_pairs + 1) // 2),
      |trend AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN num > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_pos,
      |    CAST(SUM(CASE WHEN num = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_zero,
      |    CAST(SUM(CASE WHEN num < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_neg
      |  FROM pairs),
      |ties AS (
      |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
      |    AS BIGINT) AS tie18
      |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
      |        FROM weekly GROUP BY rev)),
      |nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks FROM weekly)
      |SELECT n_weeks, n_pairs, med_rank, med_num, med_den,
      |  slope_cents_per_week, n_pos, n_zero, n_neg,
      |  n_pos - n_neg AS mk_s,
      |  n_weeks * (n_weeks - 1) * (2 * n_weeks + 5) - tie18 AS var18,
      |  (CAST(n_pos - n_neg AS DOUBLE)
      |    - CAST(CASE WHEN n_pos - n_neg > 0 THEN 1
      |                WHEN n_pos - n_neg < 0 THEN -1
      |                ELSE 0 END AS DOUBLE))
      |   / sqrt(CAST((n_weeks * (n_weeks - 1) * (2 * n_weeks + 5) - tie18)
      |       AS DOUBLE) / 18.0) AS z_mk
      |FROM med, trend, ties, nw""".stripMargin

  /** Exponentially weighted moving average of daily revenue, α = 1/4 in
    * EXACT integer cents: s₁ = x₁, sₜ = ⌊(3·sₜ₋₁ + xₜ)/4⌋ — the standard
    * smoothing baseline of an ops dashboard / anomaly monitor, with the
    * recursion in truncating integer arithmetic so both engines walk the
    * identical sequence (no float drift over thousands of steps).
    *
    * Scale shape: the corpus collapses map-side to the DAILY aggregate
    * (rows = |days|, calendar-bounded — the q_autocorr argument); the
    * recursion is inherently SEQUENTIAL, so it runs as one in-row fold
    * over the packed day array (O(|days|²) array copies on ≤ thousands of
    * elements — still microseconds) rather than pretending a window can
    * parallelize a true recurrence. The oracle replays the identical walk
    * as a recursive CTE.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        cents(col("o_totalprice")).as("r"))
      .groupBy(col("day"))
      .agg(sum(col("r")).cast("bigint").as("cents"))
    daily
      .agg(array_sort(collect_list(struct(col("day"), col("cents")))).as("xs"))
      .withColumn("ew", expr(
        """aggregate(transform(xs, s -> s.cents),
          |  cast(array() as array<bigint>),
          |  (acc, x) -> if(size(acc) = 0, array(x),
          |    concat(acc, array((3 * element_at(acc, -1) + x) div 4))))""".stripMargin))
      .select(posexplode(arrays_zip(col("xs"), col("ew"))))
      .select(date_format(col("col.xs.day"), "yyyy-MM-dd").as("day"),
        col("col.xs.cents").as("revenue_cents"),
        col("col.ew").as("ewma_cents"))
  }

  val ewmaSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT day, cents, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
      |ew AS (
      |  SELECT i, day, cents, cents AS ewma FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT idx.i, idx.day, idx.cents, (3 * ew.ewma + idx.cents) // 4
      |  FROM ew JOIN idx ON idx.i = ew.i + 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, cents AS revenue_cents,
      |  CAST(ewma AS BIGINT) AS ewma_cents
      |FROM ew""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ewma" -> (ewma _),
    "q_runs_test" -> (runsTest _),
    "q_interpurchase" -> (interpurchase _),
    "q_hhi" -> (hhi _),
    "q_benford" -> (benford _),
    "q_seasonality" -> (seasonality _),
    "q_assoc_rules" -> (assocRules _),
    "q_cuped" -> (cuped _),
    "q_mann_whitney" -> (mannWhitney _),
    "q_ks_test" -> (ksTest _),
    "q_chi2_assoc" -> (chi2Assoc _),
    "q_spearman" -> (spearman _),
    "q_kendall" -> (kendall _),
    "q_emd" -> (emd _),
    "q_crosscorr" -> (crosscorr _),
    "q_welch_ttest" -> (welchTtest _),
    "q_anova" -> (anova _),
    "q_theil_sen" -> (theilSen _))

  val oracles: Map[String, String] = Map(
    "q_runs_test" -> runsTestSql,
    "q_interpurchase" -> interpurchaseSql,
    "q_hhi" -> hhiSql,
    "q_benford" -> benfordSql,
    "q_seasonality" -> seasonalitySql,
    "q_ewma" -> ewmaSql,
    "q_assoc_rules" -> assocRulesSql,
    "q_cuped" -> cupedSql,
    "q_mann_whitney" -> mannWhitneySql,
    "q_ks_test" -> ksTestSql,
    "q_chi2_assoc" -> chi2AssocSql,
    "q_spearman" -> spearmanSql,
    "q_kendall" -> kendallSql,
    "q_emd" -> emdSql,
    "q_crosscorr" -> crosscorrSql,
    "q_welch_ttest" -> welchTtestSql,
    "q_anova" -> anovaSql,
    "q_theil_sen" -> theilSenSql)
}
