package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Analytic extras: grouping sets, percentiles, moment statistics, the
  * window-function zoo, ordered array aggregation, richer string functions.
  * All oracle-checked; float outputs are made engine-exact either via
  * integral inputs (percentile over whole-number quantities) or by
  * deriving moments from exact integer sums (`q_stats_manual`).
  */
object Analytics {

  /** Explicit GROUPING SETS + grouping_id — finer than rollup/cube. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    // DataFrame API exposes rollup/cube only; GROUPING SETS goes through SQL
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         | CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         | COUNT(*) AS n_orders
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      | COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Exact interpolated percentiles over integral quantities (whole numbers
    * → interpolation arithmetic is exact in both engines).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      | quantile_cont(l_quantity, 0.5) AS median_qty,
      | quantile_cont(l_quantity, 0.9) AS p90_qty,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Mean / variance / stddev derived from exact integer moments (sum and
    * sum-of-squares of cents are order-independent BIGINTs; the float math
    * on top is a fixed expression mirrored in the oracle) — how to get
    * deterministic second-order statistics out of a distributed engine.
    */
  def statsManual(spark: SparkSession, dir: String): DataFrame = {
    val c = cents(col("o_totalprice"))
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(c).as("s1"),
        // c² fits a long per-row, but the SUM can exceed 2^63 at scale —
        // decimal(38,0) keeps it exact and order-independent (DuckDB's
        // SUM(BIGINT) auto-promotes to HUGEINT, mirrored by the oracle)
        sum((c * c).cast("decimal(38,0)")).as("s2"),
        count(lit(1)).as("n"))
      .select(
        col("o_orderstatus"),
        (col("s1").cast("double") / col("n") / 100.0).as("mean_price"),
        (((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1)) / 10000.0).as("var_price"),
        sqrt(((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1)) / 10000.0).as("stddev_price"),
        col("n"))
  }

  val statsManualSql: String = {
    val s1 = "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)"
    val s2 = "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)*CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)"
    s"""SELECT o_orderstatus,
       | $s1/COUNT(*)/100.0 AS mean_price,
       | ((($s2 - $s1*$s1/COUNT(*)) / (COUNT(*) - 1)) / 10000.0) AS var_price,
       | SQRT((($s2 - $s1*$s1/COUNT(*)) / (COUNT(*) - 1)) / 10000.0) AS stddev_price,
       | COUNT(*) AS n
       |FROM orders GROUP BY o_orderstatus""".stripMargin
  }

  /** Window-function zoo: lag/lead + first/last over a running frame. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_orderkey"), 1).over(w).as("prev_order"),
      lead(col("o_orderkey"), 1).over(w).as("next_order"),
      first(col("o_orderkey")).over(wf).as("first_order"),
      rank().over(w).cast("bigint").as("order_seq"))
  }

  val windowFuncsSql: String =
    """SELECT o_custkey, o_orderkey,
      | LAG(o_orderkey, 1) OVER w AS prev_order,
      | LEAD(o_orderkey, 1) OVER w AS next_order,
      | FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
      | RANK() OVER w AS order_seq
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** NTILE — quartile assignment with a unique global ordering.
    *
    * NOT `ntile(4).over(Window.orderBy(...))`: an unpartitioned window
    * funnels the whole table through one task. Instead, exact two-pass:
    * (1) range-partition the (price, key) pairs, count rows per partition
    * (tiny driver collect), locate the 3 exact NTILE cut ranks, and fetch
    * just those 3 rows with targeted single-partition jobs; (2) broadcast
    * the cut pairs and assign buckets with a codegen'd struct comparison —
    * the main pass is scan + project with NO exchange at all. The unique
    * (o_totalprice, o_orderkey) ordering makes rank cut-offs exact.
    *
    * NOTE: pass 1 executes eagerly (a collect of per-partition counts plus
    * three targeted single-partition fetches) at DataFrame-construction
    * time; the returned frame is the exchange-free pass 2.
    */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    // pass 1 over (price, key) pairs only — a few % of the table's bytes.
    // Explicit casts pin the row shape to the (Double, Long) encoder even if
    // the source column is ever widened to decimal.
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = base
      .select(col("o_totalprice").cast("double"), col("o_orderkey").cast("long"))
      .repartitionByRange(parts, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
      .as[(Double, Long)]
    val rdd = ranged.rdd // shuffle map stage runs once; later jobs reuse it
    val counts = rdd.mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(pid) = rows before pid
    val n = offsets.last
    if (n == 0) return base.withColumn("quartile", lit(1L)).limit(0)
    val q = n / 4
    val rem = n % 4
    // cut rank i = size of first i buckets (first `rem` buckets get q+1 rows)
    val cutRanks = (1 to 3).map(i => i * q + math.min(i, rem))
    val sc = spark.sparkContext
    val cutPairs: Seq[(Double, Long)] = cutRanks.map { rank =>
      val pid = offsets.indexWhere(_ >= rank) - 1 // offsets(pid) < rank <= offsets(pid+1)
      val local = (rank - offsets(pid)).toInt
      // hasNext before next(): codegen'd iterators (BufferedRowIterator)
      // only materialize the next row inside hasNext, so a bare next()
      // throws NoSuchElementException even mid-partition.
      sc.runJob(rdd, (it: Iterator[(Double, Long)]) => {
        val at = it.drop(local - 1)
        require(at.hasNext, s"cut rank $rank: partition $pid shorter than counted")
        at.next()
      }, Seq(pid)).head
    }
    val pair = struct(col("o_totalprice"), col("o_orderkey"))
    val above = cutPairs.map(c => (pair > struct(lit(c._1), lit(c._2))).cast("long"))
    base.select(
      col("o_orderkey"), col("o_totalprice"),
      (lit(1L) + above.reduce(_ + _)).as("quartile"))
  }

  val ntileQuartilesSql: String =
    """SELECT o_orderkey, o_totalprice,
      | CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
      |FROM orders""".stripMargin

  /** Ordered array aggregation, emitted as a joined string (deterministic
    * multiset encoding portable across engines).
    */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_nationkey") < 5)
      .groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("c_custkey")))).as("custkeys"),
        count(lit(1)).as("n_customers"))

  val arrayAggSql: String =
    """SELECT c_nationkey,
      | array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
      | COUNT(*) AS n_customers
      |FROM customer WHERE c_nationkey < 5
      |GROUP BY c_nationkey""".stripMargin

  /** Richer string functions — trim/lpad/concat/regexp_extract/split. */
  def stringFuncs2(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      concat(lit("P-"), lpad(col("p_partkey").cast("string"), 6, "0")).as("padded_id"),
      trim(col("p_name")).as("trimmed"),
      regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
      size(split(col("p_name"), " ")).cast("bigint").as("n_words"))

  val stringFuncs2Sql: String =
    """SELECT p_partkey,
      | CONCAT('P-', LPAD(CAST(p_partkey AS VARCHAR), 6, '0')) AS padded_id,
      | TRIM(p_name) AS trimmed,
      | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      | CAST(LEN(string_split(p_name, ' ')) AS BIGINT) AS n_words
      |FROM part""".stripMargin

  /** lead/lag/first_value navigation within each customer's order history —
    * partitioned by o_custkey, so the window never needs a global sort.
    */
  def leadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
      col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_totalprice")).over(w).as("first_price"))
  }

  val leadLagSql: String =
    """SELECT o_custkey, o_orderkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_totalprice,
      | LAG(o_totalprice, 1) OVER w AS prev_price,
      | LEAD(o_totalprice, 1) OVER w AS next_price,
      | FIRST_VALUE(o_totalprice) OVER w AS first_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** RANGE-frame moving window: per-customer 30-day running spend. The
    * frame is value-based (days), not row-based — ties on the same day are
    * peers and aggregate together in both engines per the SQL standard.
    * Money sums via scaled integers (order-independent, engine-exact).
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val dayNo = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayNo)
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      dayNo.cast("bigint").as("day_no"),
      (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100).as("spend_30d"),
      count(lit(1)).over(w).as("n_orders_30d"))
  }

  val windowRangeSql: String =
    """SELECT o_custkey, o_orderkey,
      | date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day_no,
      | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS DOUBLE)/100 AS spend_30d,
      | COUNT(*) OVER w AS n_orders_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
      |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin

  /** UNPIVOT — wide measure columns to (measure, val) rows, via the native
    * Dataset.unpivot operator (Spark's melt). The input is a 3-row exact-
    * cents aggregate, so the unpivot itself is plan-trivial; what's checked
    * is the measure-name/value pairing against DuckDB's UNPIVOT.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        centsSum(col("l_extendedprice")).as("sum_price"),
        centsSum(col("l_discount")).as("sum_discount"),
        centsSum(col("l_quantity")).as("sum_qty"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_price"), col("sum_discount"), col("sum_qty")),
      "measure", "val")
  }

  val unpivotMeasuresSql: String =
    s"""WITH a AS (
       | SELECT l_returnflag,
       |  ${centsSumSql("l_extendedprice")} AS sum_price,
       |  ${centsSumSql("l_discount")} AS sum_discount,
       |  ${centsSumSql("l_quantity")} AS sum_qty
       | FROM lineitem GROUP BY 1)
       |UNPIVOT a ON sum_price, sum_discount, sum_qty
       |INTO NAME measure VALUE val""".stripMargin

  /** Distribution windows — percent_rank / cume_dist / ntile(10) per order
    * status. The ratios are exact rationals of small integers, so the
    * doubles match across engines bit-for-bit; ties broken by orderkey so
    * rank functions are deterministic.
    */
  def windowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      ntile(10).over(w).cast("bigint").as("decile"))
  }

  val windowDistSql: String =
    """SELECT o_orderkey, o_orderstatus,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cume,
      | CAST(ntile(10) OVER w AS BIGINT) AS decile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Equi-width histogram of order totals — the distribution profile
    * behind data-quality dashboards and partition-bound planning. All
    * bucket math is exact integers: prices go to cents (round(x·100) as
    * BIGINT), the bucket index is `(cents−min)·20 div (max−min+1)` —
    * never a float division that could put a boundary value in different
    * buckets on different engines. The [min,max] bounds are a 1-row
    * aggregate broadcast back over the scan (two passes, both map-side
    * combined; no window, no sort — at 100 TB the histogram is still a
    * 20-row result off one shuffle).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val bounds = cents.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
    cents.crossJoin(broadcast(bounds))
      .select(expr("(cents - minc) * 20 div (maxc - minc + 1)").as("bucket"),
        col("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        expr("cast(sum(cents) as double) / 100").as("sum_price"))
  }

  val histogramSql: String =
    """WITH c AS (
      |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |b AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc FROM c)
      |SELECT (cents - minc) * 20 // (maxc - minc + 1) AS bucket,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(cents) AS DOUBLE) / 100 AS sum_price
      |FROM c, b GROUP BY 1""".stripMargin

  /** Histogram quantile sketch — the quantile path that actually scales:
    * exact percentiles buffer whole groups (q_percentiles is the exact
    * small-group baseline), but at 100 TB a single-group percentile must
    * stream. A fixed 1024-bin equi-width histogram gives every quantile
    * with ≤ 1/1024-of-range error in ONE corpus pass: bin counts
    * aggregate map-side, the cumulative walk runs over AT MOST 1024
    * rows (bounded — not a corpus window), and each requested quantile
    * picks the first bin whose cumulative count crosses ⌈q·N⌉.
    * Everything is integer-exact (cents, integral bin edges), so the
    * SKETCH ITSELF is oracle-hash-checked, not just its error bound.
    * Output per q ∈ {50, 90, 99}: the crossing bin, its lower edge in
    * cents (the quantile estimate), and N.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("cast(round(value * 100) as bigint)").as("v"))
    val mm = ev.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
      count(lit(1)).as("n_total"))
    val binned = ev.crossJoin(broadcast(mm))
      .withColumn("bin", expr("((v - vmin) * 1024) div (vmax - vmin + 1)"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_bin"))
    val wcum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("cum_n", sum(col("n_bin")).over(wcum))
    val qs = spark.sql("SELECT explode(array(bigint(50), bigint(90), bigint(99))) AS q_pct")
    cum.crossJoin(broadcast(mm)).join(broadcast(qs),
        col("cum_n") * 100 >= col("q_pct") * col("n_total"))
      .groupBy(col("q_pct"))
      .agg(min(col("bin")).as("bin"), max(col("n_total")).as("n_total"),
        max(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
      .withColumn("est_cents", expr("vmin + (bin * (vmax - vmin + 1)) div 1024"))
      .select(col("q_pct"), col("bin"), col("est_cents"), col("n_total"))
  }

  val quantileSketchSql: String =
    """WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events),
      |mm AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n_total FROM v),
      |binned AS (
      |  SELECT ((v - vmin) * 1024) // (vmax - vmin + 1) AS bin, COUNT(*) AS n_bin
      |  FROM v, mm GROUP BY 1),
      |cum AS (
      |  SELECT bin, CAST(SUM(n_bin) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
      |  FROM binned),
      |qs AS (SELECT unnest([50, 90, 99]) AS q_pct)
      |SELECT CAST(q_pct AS BIGINT) AS q_pct, CAST(MIN(bin) AS BIGINT) AS bin,
      |       CAST(MAX(vmin) + (MIN(bin) * (MAX(vmax) - MAX(vmin) + 1)) // 1024 AS BIGINT) AS est_cents,
      |       CAST(MAX(n_total) AS BIGINT) AS n_total
      |FROM cum, mm, qs
      |WHERE cum_n * 100 >= q_pct * n_total
      |GROUP BY q_pct""".stripMargin

  /** Histogram mergeability proof — the q_kmv_merge twin for quantiles:
    * shard events 4 ways by a content hash (stand-ins for 4 executors'
    * partial sketches), build each shard's fixed-bin histogram under the
    * SHARED global binning, sum the shard histograms per bin, and emit the
    * merged counts NEXT TO the directly-computed global histogram with a
    * per-bin `lossless` boolean. Fixed-bin histograms merge by plain
    * addition — the property that makes the quantile sketch
    * tree-aggregatable across 1000 executors with no accuracy loss
    * (unlike rank-sketch merges, which pay error per merge level).
    * Output ≤ 256 rows regardless of corpus size.
    */
  def histogramMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      expr("cast(round(value * 100) as bigint)").as("v"),
      expr("""(instr('0123456789abcdef',
            |  substr(md5(cast(event_id as string)), 1, 1)) - 1) % 4"""
        .stripMargin).as("shard"))
    val mm = ev.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val binned = ev.crossJoin(broadcast(mm))
      .withColumn("bin", expr("((v - vmin) * 256) div (vmax - vmin + 1)"))
    val perShard = binned.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_bin"))
    val merged = perShard.groupBy(col("bin"))
      .agg(sum(col("n_bin")).cast("bigint").as("n_merged"),
        countDistinct(col("shard")).as("n_shards"))
    val global = binned.groupBy(col("bin")).agg(count(lit(1)).as("n_global"))
    merged.join(global, Seq("bin"))
      .select(col("bin"), col("n_shards"), col("n_merged"), col("n_global"),
        (col("n_merged") === col("n_global")).as("lossless"))
  }

  val histogramMergeSql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    (strpos('0123456789abcdef',
      |       substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) % 4 AS shard
      |  FROM events),
      |mm AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM v),
      |b AS (SELECT shard, ((v - vmin) * 256) // (vmax - vmin + 1) AS bin
      |      FROM v, mm),
      |ps AS (SELECT shard, bin, COUNT(*) AS n_bin FROM b GROUP BY shard, bin),
      |m AS (SELECT bin, CAST(SUM(n_bin) AS BIGINT) AS n_merged,
      |        CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards
      |      FROM ps GROUP BY bin),
      |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_global FROM b GROUP BY bin)
      |SELECT m.bin, m.n_shards, m.n_merged, g.n_global,
      |  m.n_merged = g.n_global AS lossless
      |FROM m JOIN g ON m.bin = g.bin""".stripMargin

  /** Distribution-drift monitor — the check a production pipeline runs on
    * every ingest window: split events at the midpoint of their time span,
    * histogram `value` into 16 fixed bins under shared bounds, and report
    * per-bin counts and proportion shift. All proportions are integral ppm
    * (n·10⁶ div total) so the drift table hash-matches across engines —
    * no float sums whose accumulation order differs. The summary statistic
    * a caller derives (total variation distance = Σ|shift|/2) is a plain
    * integer sum over these rows.
    *
    * Scale shape: one 4-value bounds aggregate broadcast to one corpus
    * pass, then a 16-row aggregate. Output ≤ 16 rows at any size.
    */
  def driftBins(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir).select(
      expr("cast(round(value * 100) as bigint)").as("v"),
      unix_micros(col("ts")).as("t"))
    val mm = v.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val lab = v.crossJoin(broadcast(mm)).select(
      expr("case when (t - tmin) * 2 < (tmax - tmin + 1) then 0 else 1 end").as("half"),
      expr("((v - vmin) * 16) div (vmax - vmin + 1)").as("bin"))
    val c = lab.groupBy(col("bin")).agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).cast("bigint").as("n_first"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).cast("bigint").as("n_second"))
    val t = c.agg(sum(col("n_first")).cast("bigint").as("nf"),
      sum(col("n_second")).cast("bigint").as("ns"))
    c.crossJoin(broadcast(t))
      .select(col("bin"), col("n_first"), col("n_second"),
        expr("CAST(n_first * 1000000 div nf AS BIGINT)").as("p_first_ppm"),
        expr("CAST(n_second * 1000000 div ns AS BIGINT)").as("p_second_ppm"),
        expr("CAST(abs(n_first * 1000000 div nf - n_second * 1000000 div ns) AS BIGINT)")
          .as("shift_ppm"))
  }

  val driftBinsSql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v, epoch_us(ts) AS t
      |  FROM events),
      |mm AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax,
      |              MIN(v) AS vmin, MAX(v) AS vmax FROM v),
      |lab AS (
      |  SELECT CASE WHEN (t - tmin) * 2 < (tmax - tmin + 1) THEN 0 ELSE 1 END AS half,
      |         ((v - vmin) * 16) // (vmax - vmin + 1) AS bin
      |  FROM v, mm),
      |c AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_second
      |  FROM lab GROUP BY bin),
      |t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS nf,
      |             CAST(SUM(n_second) AS BIGINT) AS ns FROM c)
      |SELECT bin, n_first, n_second,
      |  CAST(n_first * 1000000 // nf AS BIGINT) AS p_first_ppm,
      |  CAST(n_second * 1000000 // ns AS BIGINT) AS p_second_ppm,
      |  CAST(ABS(n_first * 1000000 // nf - n_second * 1000000 // ns) AS BIGINT)
      |    AS shift_ppm
      |FROM c, t""".stripMargin

  /** Per-group simple linear regression (slope / intercept / r²) of price
    * on quantity — the grouped-OLS shape (DataFusion exposes regr_slope &
    * co through its SQL surface; this is the same capability as one
    * portable plan). All five moments (Σx, Σy, Σxy, Σx², Σy²) are EXACT
    * integers summed in decimal(38,0) (long would overflow on Σy² at
    * sf≥0.1: y ≤ 1e7 cents ⇒ y² ≤ 1e14 per row), so every group's closed
    * forms divide the SAME exact integers in both engines — the terminal
    * IEEE divisions are the only float ops. r uses sqrt, which IEEE 754
    * requires correctly rounded, so it is portable too.
    *
    * Scale shape: one map-side-combined aggregation over the fact table,
    * k output rows. Nothing else.
    */
  def linreg(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(expr(s"cast(x * y as $d38)")).as("sxy"),
        sum(expr(s"cast(x * x as $d38)")).as("sxx"),
        sum(expr(s"cast(y * y as $d38)")).as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"),
        col("sx"), col("sy"))
      .select(col("l_returnflag"), col("n"),
        (col("num").cast("double") / col("denx").cast("double")).as("slope"),
        col("num"), col("sx"), col("sy"), col("deny"), col("denx"))
      .select(col("l_returnflag"), col("n"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"),
        ((col("num").cast("double") * col("num").cast("double"))
          / (col("denx").cast("double") * col("deny").cast("double"))).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  val linregSql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sx,
      |    SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sy,
      |    SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sxy,
      |    SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
      |    SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS syy
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n,
      |    n * sxy - sx * sy AS num,
      |    n * sxx - sx * sx AS denx,
      |    n * syy - sy * sy AS deny, sx, sy
      |  FROM m),
      |s AS (
      |  SELECT *, CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) AS slope FROM d)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n, slope,
      |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
      |  (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
      |    / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) AS r2
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Skyline (Pareto frontier) of customers over (total spend, order
    * count) — the multi-criteria "best customers" operator relational
    * engines bolt on as SKYLINE OF. A point survives iff no other point
    * is ≥ in both dimensions and > in one.
    *
    * Scale shape — banded two-phase, NO global window and NO pairwise
    * self-join over the point set:
    *   1. points = one customer-keyed aggregate (spend in exact cents).
    *   2. band = (x−min)·64 div (max−min+1) off a broadcast 1-row bounds
    *      row (the q_histogram index — integer, boundary-exact). Banding
    *      is monotone in x, so band' > band ⟹ x' > x strictly.
    *   3. cross-band dominance: per-band max(y) (≤64 rows) self-joined on
    *      band' > band — a 64×64 broadcast nested loop, constant at any
    *      corpus size — gives hb = max y in any strictly-higher band.
    *   4. in-band dominance: windows PARTITIONED by band (order by x desc,
    *      RANGE ≥1 preceding for x' > x; partition (band, x) for ties).
    * dominated ⟺ max(y' : x' > x) ≥ y ∨ max(y' : x' = x) > y; the x'>x
    * max splits exactly into greatest(in-band window, hb).
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))").as("spend_cents"),
        count(lit(1)).as("n_orders"))
    val bounds = pts.agg(min(col("spend_cents")).as("xmin"),
      max(col("spend_cents")).as("xmax"))
    val banded = pts.crossJoin(broadcast(bounds))
      .withColumn("band", expr("(spend_cents - xmin) * 64 div (xmax - xmin + 1)"))
    val bandMax = banded.groupBy(col("band")).agg(max(col("n_orders")).as("bmax"))
    val hb = bandMax.as("a").join(broadcast(bandMax.as("b")), col("b.band") > col("a.band"))
      .groupBy(col("a.band").as("band")).agg(max(col("b.bmax")).as("hb"))
    val wGt = Window.partitionBy(col("band")).orderBy(col("spend_cents").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("band"), col("spend_cents"))
    banded.join(broadcast(hb), Seq("band"), "left")
      .withColumn("m_gt", max(col("n_orders")).over(wGt))
      .withColumn("m_eq", max(col("n_orders")).over(wEq))
      .filter(coalesce(greatest(col("m_gt"), col("hb")), lit(-1L)) < col("n_orders")
        && !(col("m_eq") > col("n_orders")))
      .select(col("o_custkey"), col("spend_cents"), col("n_orders"))
      .orderBy(col("spend_cents").desc)
  }

  /** Oracle states the DEFINITION (NOT EXISTS dominance) rather than the
    * banded plan — correctness of the decomposition is exactly what the
    * cross-engine compare should witness.
    */
  val skylineSql: String =
    """WITH p AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT o_custkey, spend_cents, n_orders
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders
      |    AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders))
      |ORDER BY spend_cents DESC""".stripMargin

  /** Median absolute deviation per return flag — the robust outlier
    * screen (3σ breaks on heavy tails; 3·MAD doesn't). Both medians run
    * on VALUE HISTOGRAMS, not sorted rows: l_quantity has ≤50 distinct
    * integer values, so the plan is corpus → (flag, value) counts with
    * map-side combine, then cumulative walks over ≤50-row per-group
    * histograms — the q_quantile_sketch shape; no corpus-sized sort or
    * window at any scale.
    *
    * Everything stays integral: median·2 = v₁+v₂ (the two middle values,
    * equal when n is odd), deviations in ×2 units |2v − med_x2|, MAD·4 =
    * e₁+e₂ over the deviation histogram, and the outlier test
    * |v−med| > 3·MAD clears denominators to 2·dev_x2 > 3·mad_x4 — exact
    * BIGINTs end-to-end, no float division anywhere.
    */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    val vc = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), expr("cast(l_quantity as bigint)").as("v"))
      .agg(count(lit(1)).as("c"))
    def medianX2(hist: DataFrame, grp: String, v: String): DataFrame = {
      val w = Window.partitionBy(col(grp)).orderBy(col(v))
      val cum = hist.withColumn("cum", sum(col("c")).over(w))
        .join(hist.groupBy(col(grp)).agg(sum(col("c")).as("n")), Seq(grp))
      val lo = cum.filter(col("cum") >= expr("(n + 1) div 2"))
        .groupBy(col(grp)).agg(min(col(v)).as("v1"))
      val hi = cum.filter(col("cum") >= expr("(n + 2) div 2"))
        .groupBy(col(grp)).agg(min(col(v)).as("v2"), max(col("n")).as("n"))
      lo.join(hi, Seq(grp)).select(col(grp), (col("v1") + col("v2")).as("mx2"),
        col("n"))
    }
    val med = medianX2(vc, "l_returnflag", "v")
      .withColumnRenamed("mx2", "med_x2")
    val dev = vc.join(med, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), expr("abs(2 * v - med_x2)").as("v"))
      .agg(sum(col("c")).as("c"))
    val madx4 = medianX2(dev, "l_returnflag", "v")
      .select(col("l_returnflag"), col("mx2").as("mad_x4"))
    vc.join(med, Seq("l_returnflag")).join(madx4, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"), max(col("med_x2")).as("med_x2"),
        max(col("mad_x4")).as("mad_x4"),
        sum(when(expr("2 * abs(2 * v - med_x2) > 3 * mad_x4"), col("c"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("l_returnflag"))
  }

  val madSql: String =
    """WITH vc AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, v, c,
      |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM vc),
      |med AS (
      |  SELECT lo.l_returnflag, lo.v1 + hi.v2 AS med_x2, hi.n FROM
      |    (SELECT l_returnflag, MIN(v) AS v1 FROM cum
      |     WHERE cum >= (n + 1) // 2 GROUP BY 1) lo
      |    JOIN
      |    (SELECT l_returnflag, MIN(v) AS v2, MAX(n) AS n FROM cum
      |     WHERE cum >= (n + 2) // 2 GROUP BY 1) hi
      |    USING (l_returnflag)),
      |dv AS (
      |  SELECT vc.l_returnflag, abs(2 * vc.v - med.med_x2) AS v,
      |         CAST(SUM(vc.c) AS BIGINT) AS c
      |  FROM vc JOIN med USING (l_returnflag) GROUP BY 1, 2),
      |dcum AS (
      |  SELECT l_returnflag, v, c,
      |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM dv),
      |madx AS (
      |  SELECT lo.l_returnflag, lo.v1 + hi.v2 AS mad_x4 FROM
      |    (SELECT l_returnflag, MIN(v) AS v1 FROM dcum
      |     WHERE cum >= (n + 1) // 2 GROUP BY 1) lo
      |    JOIN
      |    (SELECT l_returnflag, MIN(v) AS v2 FROM dcum
      |     WHERE cum >= (n + 2) // 2 GROUP BY 1) hi
      |    USING (l_returnflag))
      |SELECT vc.l_returnflag, CAST(MAX(med.n) AS BIGINT) AS n,
      |  CAST(MAX(med.med_x2) AS BIGINT) AS med_x2,
      |  CAST(MAX(madx.mad_x4) AS BIGINT) AS mad_x4,
      |  CAST(SUM(CASE WHEN 2 * abs(2 * vc.v - med.med_x2) > 3 * madx.mad_x4
      |       THEN vc.c ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM vc JOIN med USING (l_returnflag) JOIN madx USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact rolling 7-row median of daily spend per order priority — the
    * robust trend line a monitoring dashboard overlays on a noisy daily
    * series (median shrugs off single-day spikes that wreck a rolling
    * mean). Exactness: the window holds ≤ 7 exact cent-integers, the
    * median is element_at on the sorted window array (odd n) or the mean
    * of the two middles (even n — one IEEE division by 2, exact in
    * binary), mirroring DuckDB's interpolating MEDIAN() over the same
    * ROWS frame.
    *
    * Scale shape: the corpus collapses to a (priority × day) aggregate
    * with map-side combine BEFORE any window; the rolling window runs on
    * the days-sized series partitioned by priority — never corpus rows.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("arr", sort_array(collect_list(col("spend_cents")).over(w)))
      .withColumn("n", size(col("arr")))
      .select(col("priority"), col("day"), col("spend_cents"),
        expr("""cast(case when n % 2 = 1 then element_at(arr, cast((n + 1) div 2 as int))
               |else (element_at(arr, cast(n div 2 as int))
               |      + element_at(arr, cast(n div 2 + 1 as int))) / 2.0
               |end as double)""".stripMargin).as("med7"))
      .orderBy(col("priority"), col("day"))
  }

  val rollingMedianSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT priority, day, spend_cents,
      |  CAST(MEDIAN(spend_cents) OVER (PARTITION BY priority ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS med7
      |FROM d ORDER BY priority, day""".stripMargin

  /** Lag-1 autocorrelation + AR(1) slope of the daily-revenue series —
    * the time-series health probe (is today's revenue predictable from
    * yesterday's?) behind every anomaly-detection baseline. Pearson r
    * over (rₜ₋₁, rₜ) pairs from the SAME exact-integer moment machinery
    * as [[linreg]]: all five moments are decimal(38,0) sums of exact
    * cents, and the terminal float ops (two casts, one division, two
    * correctly-rounded sqrts applied in the SAME order in both engines)
    * are the only IEEE steps. denx·deny would overflow 38 digits, so r
    * divides by the two sqrts SEQUENTIALLY rather than by sqrt of the
    * product.
    *
    * Scale shape: corpus → days-sized daily aggregate (map-side
    * combine); the lag window and moment aggregate run on that bounded
    * series. The single-partition window is days-sized by construction.
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("r"))
    val pairs = daily
      .withColumn("x", lag(col("r"), 1).over(Window.orderBy(col("day"))))
      .filter(col("x").isNotNull)
      .select(col("x"), col("r").as("y"))
    pairs.agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(expr(s"cast(x as $d38) * y")).as("sxy"),
        sum(expr(s"cast(x as $d38) * x")).as("sxx"),
        sum(expr(s"cast(y as $d38) * y")).as("syy"))
      .select(col("n").cast("long").as("n_pairs"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
      // wide integers reach double THROUGH THE DIGIT STRING (the
      // q_welch_ttest rule): above 2^53 DuckDB's direct HUGEINT→DOUBLE
      // composes the two 64-bit halves in double arithmetic and is not
      // correctly rounded, while string→double is correctly rounded in
      // both engines — without this the oracle diverged by 1 ulp at some
      // scale factors (observed sf0.001, r16)
      .select(col("n_pairs"),
        expr("cast(cast(num as string) as double)" +
          " / cast(cast(denx as string) as double)").as("ar1_slope"),
        expr("cast(cast(num as string) as double)" +
          " / sqrt(cast(cast(denx as string) as double))" +
          " / sqrt(cast(cast(deny as string) as double))").as("corr"))
  }

  val autocorrSql: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS r
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT LAG(r, 1) OVER (ORDER BY day) AS x, r AS y FROM d
      |  QUALIFY x IS NOT NULL),
      |m AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM p),
      |t AS (
      |  SELECT CAST(n AS BIGINT) AS n_pairs,
      |    n * sxy - sx * sy AS num,
      |    n * sxx - sx * sx AS denx,
      |    n * syy - sy * sy AS deny
      |  FROM m)
      |SELECT n_pairs,
      |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(denx AS VARCHAR) AS DOUBLE) AS ar1_slope,
      |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / sqrt(CAST(CAST(denx AS VARCHAR) AS DOUBLE))
      |    / sqrt(CAST(CAST(deny AS VARCHAR) AS DOUBLE)) AS corr
      |FROM t""".stripMargin

  /** Percentile-bootstrap confidence interval for the mean order value —
    * the uncertainty quantification every metrics platform attaches to a
    * point estimate, made ENGINE-EXACT: replicate b resamples each order
    * with a Poisson(1) weight derived from md5(orderkey:b) against
    * hard-coded cumulative thresholds (⌊CDF·2³²⌋ — identical integer
    * literals in both engines), so the 200 replicate means are exact
    * integer ratios and the CI bounds are specific order statistics
    * (ranks 5 / 100 / 196 with the replicate id as tiebreak), not an
    * interpolated quantile.
    *
    * Scale shape: the ×B row expansion happens map-side (explode of a
    * sequence literal) and collapses map-side again into ≤ B partials per
    * partition before the ONE B-row shuffle — corpus-sized data never
    * shuffles, regardless of B. The rank pass runs on B rows.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 200
    val rep = Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("x"))
      // the x200 hash expansion below inherits the scan's input splits —
      // a single-digit-MB orders file is ONE split, serializing 30M md5s
      // on one core (measured 25 s at sf0.1); spread the base rows first
      .transform(Tables.spread)
      .withColumn("b", explode(expr(s"sequence(1, $B)")))
      .withColumn("u", expr(
        "cast(conv(substring(md5(concat(cast(o_orderkey as string), ':', cast(b as string))), 1, 8), 16, 10) as bigint)"))
      .withColumn("w", expr(
        """case when u < 1580030168 then 0 when u < 3160060337 then 1
          |when u < 3950075421 then 2 when u < 4213413783 then 3
          |when u < 4279248373 then 4 when u < 4292415291 then 5
          |else 6 end""".stripMargin))
      .groupBy(col("b"))
      .agg(sum(expr("cast(w as decimal(38,0)) * x")).as("swx"),
        sum(col("w")).cast("long").as("sw"))
      .select(col("b"),
        (col("swx").cast("double") / col("sw").cast("double")).as("mean_cents"))
    val ranked = rep.withColumn("rn",
      row_number().over(Window.orderBy(col("mean_cents"), col("b"))))
    ranked.agg(
      count(lit(1)).as("n_reps"),
      max(when(col("rn") === 5, col("mean_cents"))).as("ci_lo"),
      max(when(col("rn") === 100, col("mean_cents"))).as("ci_med"),
      max(when(col("rn") === 196, col("mean_cents"))).as("ci_hi"))
  }

  val bootstrapCiSql: String =
    """WITH rep AS (
      |  SELECT b,
      |    CAST(SUM(CAST(w AS HUGEINT) * x) AS DOUBLE)
      |      / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS mean_cents
      |  FROM (
      |    SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS x, b,
      |      CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
      |           WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
      |           WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
      |           ELSE 6 END AS w
      |    FROM (
      |      SELECT o_orderkey, o_totalprice, r.b,
      |        ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
      |           || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT AS u
      |      FROM orders CROSS JOIN (SELECT UNNEST(generate_series(1, 200)) AS b) r))
      |  GROUP BY b),
      |rk AS (
      |  SELECT mean_cents,
      |    ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn
      |  FROM rep)
      |SELECT COUNT(*) AS n_reps,
      |  MAX(CASE WHEN rn = 5 THEN mean_cents END) AS ci_lo,
      |  MAX(CASE WHEN rn = 100 THEN mean_cents END) AS ci_med,
      |  MAX(CASE WHEN rn = 196 THEN mean_cents END) AS ci_hi
      |FROM rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_median" -> (rollingMedian _),
    "q_autocorr" -> (autocorr _),
    "q_bootstrap_ci" -> (bootstrapCi _),
    "q_skyline" -> (skyline _),
    "q_mad" -> (mad _),
    "q_linreg" -> (linreg _),
    "q_quantile_sketch" -> (quantileSketch _),
    "q_histogram_merge" -> (histogramMerge _),
    "q_drift_bins" -> (driftBins _),
    "q_histogram" -> (histogram _),
    "q_unpivot" -> (unpivotMeasures _),
    "q_window_dist" -> (windowDist _),
    "q_window_range" -> (windowRange _),
    "q_lead_lag" -> (leadLag _),
    "q_grouping_sets" -> (groupingSets _),
    "q_percentiles" -> (percentiles _),
    "q_stats_manual" -> (statsManual _),
    "q_window_funcs" -> (windowFuncs _),
    "q_ntile" -> (ntileQuartiles _),
    "q_array_agg" -> (arrayAgg _),
    "q_string_funcs2" -> (stringFuncs2 _))

  val oracles: Map[String, String] = Map(
    "q_rolling_median" -> rollingMedianSql,
    "q_autocorr" -> autocorrSql,
    "q_bootstrap_ci" -> bootstrapCiSql,
    "q_skyline" -> skylineSql,
    "q_mad" -> madSql,
    "q_linreg" -> linregSql,
    "q_quantile_sketch" -> quantileSketchSql,
    "q_histogram_merge" -> histogramMergeSql,
    "q_drift_bins" -> driftBinsSql,
    "q_histogram" -> histogramSql,
    "q_unpivot" -> unpivotMeasuresSql,
    "q_window_dist" -> windowDistSql,
    "q_window_range" -> windowRangeSql,
    "q_lead_lag" -> leadLagSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_percentiles" -> percentilesSql,
    "q_stats_manual" -> statsManualSql,
    "q_window_funcs" -> windowFuncsSql,
    "q_ntile" -> ntileQuartilesSql,
    "q_array_agg" -> arrayAggSql,
    "q_string_funcs2" -> stringFuncs2Sql)
}
