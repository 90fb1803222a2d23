package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev-loop A/B harness for candidate plan shapes at the scaled corpus.
  *
  * q21_oneshuffle: the single-scan rewrite with raw lines pre-partitioned
  * on l_orderkey ONCE — HashPartitioning(o)
  * satisfies ClusteredDistribution([o, s]) and ClusteredDistribution([o]),
  * so BOTH aggregates run exchange-free on top of it. Trade-off: the
  * explicit repartition forfeits map-side combine on the first aggregate —
  * but TPC-H (orderkey, suppkey) pairs are ~unique per line, so that
  * combine removes almost nothing anyway.
  *
  *   sbt "runMain graft.tools.TpchVariants /tmp/k1000_tpch q21_oneshuffle,q21_committed"
  */
object TpchVariants {

  def q21OneShuffle(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).as("r"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(col("r")).as("supp_late_lines"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        count(when(col("supp_late_lines") > 0, 1)).as("n_late_supp"),
        max(when(col("supp_late_lines") > 0, col("l_suppkey"))).as("late_supp"),
        sum(when(col("supp_late_lines") > 0, col("supp_late_lines"))).as("late_lines"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    val n = Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder
      .join(f, Seq("l_orderkey"), "left_semi")
      .join(Tables.dimHint(s), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** The committed shape but with the finished-orders semi join forced to
    * sort-merge: perOrder is already HashPartitioning(l_orderkey) from its
    * rollup, so only the F-filtered keys shuffle — vs AQE's runtime
    * broadcast conversion, which builds a 75M-key hashed relation in one
    * task (measured 43 s of q21's 164 s at the 17 GB corpus).
    */
  def q21Smj(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).as("r"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(col("r")).as("supp_late_lines"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        count(when(col("supp_late_lines") > 0, 1)).as("n_late_supp"),
        max(when(col("supp_late_lines") > 0, col("l_suppkey"))).as("late_supp"),
        sum(when(col("supp_late_lines") > 0, col("supp_late_lines"))).as("late_lines"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey")).hint("merge")
    val n = Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder
      .join(f, Seq("l_orderkey"), "left_semi")
      .join(Tables.dimHint(s), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** The single-scan two-level per-order aggregate rewrite (without the
    * repartition or merge-hint twists). Measured 242 s vs the committed
    * semi/anti form's 72 s at the 17 GB corpus (solo JVMs) — the rewrite
    * LOST and was reverted; kept here for re-testing if the corpus or
    * engine changes the trade.
    */
  def q21SingleScan(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).as("r"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(col("r")).as("supp_late_lines"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        count(when(col("supp_late_lines") > 0, 1)).as("n_late_supp"),
        max(when(col("supp_late_lines") > 0, col("l_suppkey"))).as("late_supp"),
        sum(when(col("supp_late_lines") > 0, col("supp_late_lines"))).as("late_lines"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    val n = Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder
      .join(f, Seq("l_orderkey"), "left_semi")
      .join(Tables.dimHint(s), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** The three-scan semi/anti self-join form — the COMMITTED shape since
    * the r15 measurement; kept for same-session frontier comparison.
    */
  def q21ThreeScan(spark: SparkSession, dir: String): DataFrame = {
    val l1 = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    val n = Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    l1.join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"), "left_anti")
      .join(f, Seq("l_orderkey"), "left_semi")
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** q17's pre-r15 aggregate-and-join-back form (two lineitem scans),
    * kept for same-session frontier comparison against the committed
    * window form.
    */
  def q17JoinBack(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .join(Tables.dimHint(brandParts), col("l_partkey") === col("p_partkey"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_q"),
        count(lit(1)).as("cnt_q"))
    li.join(Tables.dimHint(stats), Seq("l_partkey"))
      .filter(lit(5L) * col("l_quantity").cast("long") * col("cnt_q") < col("sum_q"))
      .agg((graft.functions.Portable.centsSum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** q14 variants: the committed form lets Catalyst broadcast the full
    * 20M-row part (60 MB column-pruned estimate -> ~2 GB hashed relation
    * built in one task). Candidates: force a shuffled hash join
    * (per-partition parallel builds, no driver/global relation), and a
    * pre-aggregated probe (month lines folded to per-part cents before
    * the join - numerator/denominator are integer cent sums, so the
    * result is bit-identical).
    */
  private val volume14 =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  def q14ShuffleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(Tables.part(spark, dir).hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", graft.functions.Portable.cents(volume14)).otherwise(0L)).cast("double")
          / sum(graft.functions.Portable.cents(volume14)).cast("double")).as("promo_revenue"))

  def q14PreAgg(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_partkey"))
      .agg(sum(graft.functions.Portable.cents(volume14)).as("cents"))
    perPart
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")).hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", col("cents")).otherwise(0L)).cast("double")
          / sum(col("cents")).cast("double")).as("promo_revenue"))
  }

  def q14Merge(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(Tables.part(spark, dir).hint("merge"), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", graft.functions.Portable.cents(volume14)).otherwise(0L)).cast("double")
          / sum(graft.functions.Portable.cents(volume14)).cast("double")).as("promo_revenue"))

  /** q5 with the SF-proportional customer slice (ASIA nations, ~20% of
    * customers) forced to shuffled-hash against orders instead of
    * Catalyst's static-estimate broadcast (one 9.2 s build task at 17 GB).
    */
  def q5ShuffleHash(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .hint("shuffle_hash")
      .join(o, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(graft.functions.Portable.centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q5_shufflehash" -> (q5ShuffleHash _),
    "q5_committed" -> ((s, d) => graft.SparkEntry.queries("q5_local_supplier")(s, d)),
    "q14_merge" -> (q14Merge _),
    "q19_committed" -> ((s, d) => graft.SparkEntry.queries("q19_discounted_revenue")(s, d)),
    "q14_shufflehash" -> (q14ShuffleHash _),
    "q14_preagg" -> (q14PreAgg _),
    "q14_committed" -> ((s, d) => graft.SparkEntry.queries("q14_promo_revenue")(s, d)),
    "q17_joinback" -> (q17JoinBack _),
    "q21_oneshuffle" -> (q21OneShuffle _),
    "q21_singlescan" -> (q21SingleScan _),
    "q21_smj" -> (q21Smj _),
    "q21_threescan" -> (q21ThreeScan _),
    "q21_committed" -> ((s, d) => graft.SparkEntry.queries("q21_waiting_suppliers")(s, d)),
    "q17_committed" -> ((s, d) => graft.SparkEntry.queries("q17_small_qty_revenue")(s, d)),
    "q18_committed" -> ((s, d) => graft.SparkEntry.queries("q18_large_volume")(s, d)),
    "q11_committed" -> ((s, d) => graft.SparkEntry.queries("q11_important_share")(s, d)),
    "q15_committed" -> ((s, d) => graft.SparkEntry.queries("q15_top_supplier")(s, d)),
    "q20_committed" -> ((s, d) => graft.SparkEntry.queries("q20_promotion_suppliers")(s, d)),
    "q2_committed" -> ((s, d) => graft.SparkEntry.queries("q2_min_cost_supplier")(s, d)),
    "q22_committed" -> ((s, d) => graft.SparkEntry.queries("q22_sales_opportunity")(s, d)))

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = if (args.length > 1) args(1).split(",").toSeq else variants.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      val rows = variants(k)(spark, dir).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"variant":"$k","sec":$secs%.1f,"rows":${rows.length}}""")
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
