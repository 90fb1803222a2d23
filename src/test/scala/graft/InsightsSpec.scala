package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Insights

/** Semantic checks for the statistical-insight operators (the DuckDB
  * hash-compare is the driver's job; these pin the invariants that make
  * the numbers MEAN what they claim).
  */
class InsightsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("benford: nine digits, expected shares sum to exactly 1e6, counts conserve") {
    val rows = Insights.benford(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(rows.map(_.getAs[Long]("exp_ppm")).sum == 1000000L)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == total)
    assert(rows.forall(_.getAs[Long]("n_total") == total))
    // truncated observed shares can undershoot 1e6 by at most 9 ulps
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum > 1000000L - 10 && obsSum <= 1000000L)
  }

  test("seasonality: seven weekdays, indices average to ~1e6, cents conserve") {
    val rows = Insights.seasonality(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("dow")).toSeq == (0 to 6))
    val total = rows.map(_.getAs[Long]("sum_cents")).sum
    import org.apache.spark.sql.functions._
    val expect = Tables.orders(spark, sf)
      .agg(sum(graft.functions.Portable.cents(col("o_totalprice"))))
      .head.getLong(0)
    assert(total == expect)
    // day-weighted mean of the index is 1 by construction (up to div floor)
    val wmean = rows.map(r =>
      r.getAs[Long]("idx_ppm") * r.getAs[Long]("n_days")).sum.toDouble /
      rows.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(wmean - 1000000.0) < 1000.0, s"weighted mean $wmean")
  }

  test("assoc rules: pair counts bounded by marginals, lift symmetric in its inputs") {
    val rows = Insights.assocRules(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 300)
    rows.foreach { r =>
      val (nab, na, nb, n) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_orders"))
      assert(nab <= na && nab <= nb && na <= n && nb <= n)
      assert(r.getAs[String]("a") < r.getAs[String]("b"))
      // confidence is a probability: ≤ 1e6 ppm
      assert(r.getAs[Long]("conf_ab_ppm") <= 1000000L)
      assert(r.getAs[Long]("conf_ba_ppm") <= 1000000L)
      // lift = conf_ab / P(b): recompute from the exact integers
      val lift = nab.toDouble * n / (na.toDouble * nb)
      assert(math.abs(r.getAs[Long]("lift_ppm") - lift * 1e6) <= 1.0)
    }
  }

  test("cuped: adjusted means preserve the overall post mean and cut arm variance bias") {
    val rows = Insights.cuped(spark, sf).collect()
    assert(rows.length == 2)
    val n = rows.map(_.getAs[Long]("n_users")).sum
    // CUPED is mean-preserving: Σ n_g·adj_g == Σ n_g·post_g (the θ terms
    // cancel against the overall pre mean by construction)
    val post = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_post")).sum / n
    val adj = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_adj")).sum / n
    assert(math.abs(post - adj) < math.abs(post) * 1e-6 + 1e-6)
    // variance reduction is a squared correlation: within [0, 1e6] ppm
    rows.foreach { r =>
      val v = r.getAs[Long]("varred_ppm")
      assert(v >= 0L && v <= 1000000L)
    }
    // pre/post spend per customer correlates positively → real reduction,
    // and the value is genuinely PARTS-PER-MILLION scale: the r10-advised
    // 1000× shrink (an extra `div 1000`) would report 7 here, not ~7100
    assert(rows.head.getAs[Long]("varred_ppm") > 1000L)
  }

  test("mann-whitney: U bounded by nA*nB, recomputes from raw bucket walk") {
    val row = Insights.mannWhitney(spark, sf).head()
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val u2 = row.getAs[String]("u2").toLong
    assert(na > 0 && nb > 0)
    assert(u2 >= 0 && u2 <= 2 * na * nb)
    // priorities are assigned independently of price → z near 0 at this SF
    val z = row.getAs[Double]("z")
    assert(math.abs(z) < 6.0, s"|z|=$z unexpectedly extreme")
  }

  test("ldiversity: group counts conserve customers, l bounded by band domain") {
    val rows = graft.pipeline.Prep.lDiversity(spark, sf).collect()
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      assert(l >= 1L && l <= 12L) // acctbal ∈ [-1000, 10000) → ≤ 12 bands
      assert(r.getAs[Boolean]("meets_l3") == (l >= 3L))
      assert(l <= r.getAs[Long]("n_rows"))
    }
  }

  test("hhi: bounded by [1/n, 1] band, revenue conserves") {
    val rows = Insights.hhi(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_suppliers"), r.getAs[Long]("hhi_ppm"))
      // HHI of n equal shares = 1/n; of a monopoly = 1 (1e6 ppm)
      assert(h >= 1000000L / n - 1 && h <= 1000000L, s"hhi $h n $n")
    }
    import org.apache.spark.sql.functions._
    val expect = Tables.lineitem(spark, sf)
      .agg(sum(graft.functions.Portable.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("rev_cents")).sum == expect)
  }

  test("new/returning: day-1 users all new, splits conserve actives") {
    val rows = graft.operators.Events.newReturning(spark, sf).collect()
    assert(rows.nonEmpty)
    // the corpus's first day has no history: everyone is new
    assert(rows.head.getAs[Long]("n_new") == rows.head.getAs[Long]("n_active"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")
        == r.getAs[Long]("n_active"))
      assert(r.getAs[Long]("new_ppm") <= 1000000L)
    }
    // each user is new exactly once
    import org.apache.spark.sql.functions._
    val users = Tables.events(spark, sf).select(countDistinct(col("user_id")))
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_new")).sum == users)
  }

  test("interleave: positions are the exact round-robin arithmetic per shard") {
    val rows = graft.pipeline.Prep.interleave(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 16).toSet))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val (s, n) = (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("min_pos") == s)
      assert(r.getAs[Long]("max_pos") == (n - 1) * 16 + s)
      // Σ((i·16)+s) for i in 0..n-1 = 16·n(n-1)/2 + n·s
      val expectSum = BigDecimal(16) * n * (n - 1) / 2 + BigDecimal(n) * s
      assert(BigDecimal(r.getAs[String]("sum_pos")) == expectSum)
    }
  }

  test("interpurchase: gap count = orders - customers-with-orders; shares bounded") {
    val rows = Insights.interpurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf)
    val nOrders = orders.count()
    val nCusts = orders.select(countDistinct(col("o_custkey"))).head.getLong(0)
    // each customer contributes (their order count - 1) gaps
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == nOrders - nCusts)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_bucket") >= 0L
        && r.getAs[Long]("week_bucket") <= 52L)
      assert(r.getAs[Long]("share_ppm") <= 1000000L)
    }
  }

  test("runs test: run count bounded by [1, n], above-count ~ half, z finite") {
    val row = Insights.runsTest(spark, sf).head()
    val (n, a, r) = (row.getAs[Long]("n_days"), row.getAs[Long]("n_above"),
      row.getAs[Long]("n_runs"))
    assert(n > 0 && a > 0 && a < n)
    // strict > median puts at most half the days above
    assert(a <= n / 2 + 1)
    assert(r >= 1 && r <= n)
    val z = row.getAs[Double]("z")
    assert(!z.isNaN && !z.isInfinite)
    // independent daily draws: |z| should not be extreme at this SF
    assert(math.abs(z) < 8.0, s"|z|=$z")
  }

  test("ks test: D in [0,1], counts conserve orders, statistic consistent with D") {
    val row = Insights.ksTest(spark, sf).head()
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val total = Tables.orders(spark, sf).count()
    assert(na > 0 && nb > 0 && na + nb == total)
    val dNum = BigInt(row.getAs[String]("d_num"))
    val d = row.getAs[Double]("d")
    assert(dNum >= 0 && dNum <= BigInt(na) * BigInt(nb))
    assert(d >= 0.0 && d <= 1.0)
    // the emitted double is exactly the terminal division of the integers
    assert(d == dNum.toDouble / (na.toDouble * nb.toDouble))
    val ks = row.getAs[Double]("ks_stat")
    assert(ks == math.sqrt(na.toDouble * nb.toDouble / (na + nb).toDouble) * d)
    // priority is assigned independently of price in the generator, so
    // the two ECDFs should not diverge wildly at this SF
    assert(ks < 8.0, s"ks=$ks")
  }

  test("chi2 assoc: cells conserve marginals, contributions non-negative and exact") {
    val rows = Insights.chi2Assoc(spark, sf).collect()
    assert(rows.length <= 35 && rows.nonEmpty)
    val total = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_obs")).sum == total)
    rows.foreach { r =>
      val (o, nr, nc, t) = (r.getAs[Long]("n_obs"), r.getAs[Long]("n_row"),
        r.getAs[Long]("n_col"), r.getAs[Long]("n_total"))
      assert(o <= nr && o <= nc && nr <= t && nc <= t)
      val dev = BigInt(r.getAs[String]("dev"))
      assert(dev == (BigInt(o) * t - BigInt(nr) * nc).abs)
      assert(r.getAs[Long]("lift_dev_ppm") ==
        (dev * 1000000 / (BigInt(nr) * nc)).toLong)
      val contrib = r.getAs[Double]("chi2_contrib")
      val e = nr.toDouble * nc.toDouble / t.toDouble
      assert(contrib >= 0.0 && contrib == (o - e) * (o - e) / e)
    }
  }

  test("spearman: midrank conservation, exact moments vs local recompute, rho in [-1,1]") {
    val r = Insights.spearman(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    // Σ doubled-midranks over the whole sample = 2·(1+…+n) = n(n+1),
    // for EACH variable — the conservation law that pins the tie handling
    assert(BigInt(r.getAs[String]("su")) == BigInt(n) * (n + 1))
    assert(BigInt(r.getAs[String]("sv")) == BigInt(n) * (n + 1))
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    // local recompute from the raw bucketed pairs (sf0.001 ⇒ ~6k rows)
    val pairs = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "cast(round(l_quantity) as bigint)").as("q"),
        org.apache.spark.sql.functions.expr(
          "cast(round(l_extendedprice*100) as bigint) div 10000").as("pb"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def doubledMidranks(xs: Array[Long]): Map[Long, BigInt] = {
      val counts = xs.groupBy(identity).map { case (v, a) => v -> a.length }
      var below = 0L
      counts.toSeq.sortBy(_._1).map { case (v, c) =>
        val u = BigInt(2) * below + c + 1; below += c; v -> u
      }.toMap
    }
    val (us, vs) = (doubledMidranks(pairs.map(_._1)), doubledMidranks(pairs.map(_._2)))
    val (su, sv) = (pairs.map(p => us(p._1)).sum, pairs.map(p => vs(p._2)).sum)
    assert(BigInt(r.getAs[String]("suu")) == pairs.map(p => us(p._1) * us(p._1)).sum)
    assert(BigInt(r.getAs[String]("svv")) == pairs.map(p => vs(p._2) * vs(p._2)).sum)
    assert(BigInt(r.getAs[String]("suv")) == pairs.map(p => us(p._1) * vs(p._2)).sum)
    assert(BigInt(r.getAs[String]("su")) == su && BigInt(r.getAs[String]("sv")) == sv)
  }

  test("kendall: brute-force pair counts at sf0.001, tie identity, tau in [-1,1]") {
    val r = Insights.kendall(spark, sf).collect().head
    val pairs = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "cast(round(l_quantity) as bigint)").as("q"),
        org.apache.spark.sql.functions.expr(
          "cast(round(l_extendedprice*100) as bigint) div 10000").as("pb"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // O(n²) ground truth over the ~6k bucketed rows
    var conc = 0L; var disc = 0L
    var i = 0
    while (i < pairs.length) {
      var j = i + 1
      while (j < pairs.length) {
        val s = java.lang.Long.signum(pairs(i)._1 - pairs(j)._1) *
          java.lang.Long.signum(pairs(i)._2 - pairs(j)._2)
        if (s > 0) conc += 1 else if (s < 0) disc += 1
        j += 1
      }
      i += 1
    }
    assert(BigInt(r.getAs[String]("conc")) == conc)
    assert(BigInt(r.getAs[String]("disc")) == disc)
    // n(n−1) − tx − ty + txy = 2(C + D): every unordered pair is either
    // comparable in both dims or tied somewhere; inclusion–exclusion
    val id = BigInt(r.getAs[String]("n_pairs2")) -
      BigInt(r.getAs[String]("tie_x2")) - BigInt(r.getAs[String]("tie_y2")) +
      BigInt(r.getAs[String]("tie_xy2"))
    assert(id == 2 * (BigInt(conc) + BigInt(disc)))
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("emd: exact numerator vs local ECDF recompute, dominates the mean shift") {
    val r = Insights.emd(spark, sf).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    // local recompute over the bucketed orders (sf0.001 ⇒ ~1.5k rows)
    val rows = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "cast(round(o_totalprice*100) as bigint) div 10000").as("bk"),
        org.apache.spark.sql.functions.expr(
          "case when o_orderpriority in ('1-URGENT','2-HIGH') then 1L else 0L end").as("isa"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byBk = rows.groupBy(_._1).map { case (bk, a) =>
      (bk, a.count(_._2 == 1L).toLong, a.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    var (cuma, cumb, num) = (BigInt(0), BigInt(0), BigInt(0))
    byBk.zip(byBk.drop(1)).foreach { case ((bk, ca, cb), (bk2, _, _)) =>
      cuma += ca; cumb += cb
      num += (cuma * nb - cumb * na).abs * (bk2 - bk)
    }
    assert(BigInt(r.getAs[String]("w1_num")) == num)
    // W1 ≥ |mean_A − mean_B| for 1-D distributions (exact in bucket units)
    val sa = BigInt(byBk.map(c => c._1 * c._2).sum)
    val sb = BigInt(byBk.map(c => c._1 * c._3).sum)
    assert(num >= (sa * nb - sb * na).abs)
    assert(r.getAs[Double]("emd_dollars") >= 0.0)
  }

  test("crosscorr: 8 lags, lag-0 strongly positive, exact moments vs local recompute") {
    val out = Insights.crosscorr(spark, sf).collect()
    assert(out.map(_.getAs[Long]("lag_d")).toSeq == (0L to 7L))
    // every lagged overlap is bounded by the full day count (lag 0 = all
    // days; sparse calendars make the shrink NON-monotone, so only the
    // bound is an invariant)
    val ns = out.map(_.getAs[Long]("n_days"))
    assert(ns.forall(_ <= ns.head) && ns.forall(_ > 0))
    // same-day revenue and order count must co-move strongly; the
    // generator draws days independently so lagged corr stays small
    assert(out.head.getAs[Double]("corr_xy") > 0.5)
    assert(out.drop(1).forall(r => math.abs(r.getAs[Double]("corr_xy")) < 0.3))
    // exact-moment recompute at sf0.001 (~700 day rows)
    import org.apache.spark.sql.functions._
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.functions.Portable.cents(col("o_totalprice")))
        .cast("bigint").as("xc"), count(lit(1)).as("yc"))
      .select(datediff(col("day"), lit("1970-01-01")).as("di"),
        col("xc"), col("yc"))
      .collect().map(x => (x.getInt(0).toLong, x.getLong(1), x.getLong(2)))
    val byDi = daily.map(d => d._1 -> d).toMap
    out.foreach { r =>
      val k = r.getAs[Long]("lag_d")
      val pairs = daily.flatMap(a => byDi.get(a._1 + k).map(b => (a._2, b._3)))
      assert(r.getAs[Long]("n_days") == pairs.length)
      assert(BigInt(r.getAs[String]("sxy")) ==
        pairs.map(p => BigInt(p._1) * p._2).sum)
      assert(BigInt(r.getAs[String]("sxx")) ==
        pairs.map(p => BigInt(p._1) * p._1).sum)
      assert(BigInt(r.getAs[String]("syy")) ==
        pairs.map(p => BigInt(p._2) * p._2).sum)
    }
  }

  test("welch t-test: exact moments vs local BigInt recompute, t and df agree") {
    import org.apache.spark.sql.functions._
    val r = Insights.welchTtest(spark, sf).head
    val raw = Tables.orders(spark, sf)
      .select(graft.functions.Portable.cents(col("o_totalprice")).as("c"),
        col("o_orderpriority").as("p"))
      .collect()
      .map(x => (x.getLong(0), Set("1-URGENT", "2-HIGH")(x.getString(1))))
    val a = raw.filter(_._2).map(_._1)
    val b = raw.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    assert(BigInt(r.getAs[String]("s_a")) == a.map(BigInt(_)).sum)
    assert(BigInt(r.getAs[String]("ss_a")) ==
      a.map(c => BigInt(c) * c).sum)
    assert(BigInt(r.getAs[String]("ss_b")) ==
      b.map(c => BigInt(c) * c).sum)
    def vn(xs: Array[Long]) = {
      val n = xs.length.toDouble
      val m = xs.sum.toDouble / n
      (xs.map(c => (c - m) * (c - m)).sum / (n - 1.0), n)
    }
    val (va, na) = vn(a); val (vb, nb) = vn(b)
    val se2 = va / na + vb / nb
    val tLocal = (a.sum.toDouble / na - b.sum.toDouble / nb) / math.sqrt(se2)
    assert(math.abs(r.getAs[Double]("t_stat") - tLocal) < 1e-9 * math.abs(tLocal) + 1e-12)
    val dfLocal = se2 * se2 /
      ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))
    assert(math.abs(r.getAs[Double]("df") - dfLocal) < 1e-6 * dfLocal)
    // Welch df is bracketed by min single-arm df and the pooled df
    assert(r.getAs[Double]("df") >= math.min(na, nb) - 1.0 - 1e-9)
    assert(r.getAs[Double]("df") <= na + nb - 2.0 + 1e-9)
  }

  test("anova: group moments conserve, F from local recompute, eta2 in [0,1)") {
    import org.apache.spark.sql.functions._
    val r = Insights.anova(spark, sf).head
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val raw = Tables.orders(spark, sf)
      .select(graft.functions.Portable.cents(col("o_totalprice")).as("c"),
        col("o_orderpriority").as("p"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val groups = prios.map(p => raw.filter(_._2 == p).map(_._1))
    (1 to 5).foreach { g =>
      assert(r.getAs[Long](s"n$g") == groups(g - 1).length)
      assert(BigInt(r.getAs[String](s"s$g")) ==
        groups(g - 1).map(BigInt(_)).sum)
      assert(BigInt(r.getAs[String](s"ss$g")) ==
        groups(g - 1).map(c => BigInt(c) * c).sum)
    }
    assert((1 to 5).map(g => r.getAs[Long](s"n$g")).sum == raw.length)
    val grand = raw.map(_._1).sum.toDouble / raw.length
    val ssbL = groups.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.length * (m - grand) * (m - grand)
    }.sum
    val sswL = groups.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.map(c => (c - m) * (c - m)).sum
    }.sum
    assert(math.abs(r.getAs[Double]("ssb") - ssbL) < 1e-6 * ssbL + 1e-3)
    assert(math.abs(r.getAs[Double]("ssw") - sswL) < 1e-6 * sswL)
    val fLocal = (ssbL / 4.0) / (sswL / (raw.length - 5.0))
    assert(math.abs(r.getAs[Double]("f_stat") - fLocal) < 1e-6 * fLocal + 1e-9)
    val eta2 = r.getAs[Double]("eta2")
    assert(eta2 >= 0.0 && eta2 < 1.0)
    assert(math.abs(eta2 - ssbL / (ssbL + sswL)) < 1e-6)
  }

  test("theil-sen: brute-force pairwise recompute of median slope and MK test") {
    import org.apache.spark.sql.functions._
    val r = Insights.theilSen(spark, sf).head
    val weekly = Tables.orders(spark, sf)
      .select((datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long") / 7L).cast("long").as("wi"),
        graft.functions.Portable.cents(col("o_totalprice")).as("c"))
      .groupBy("wi").agg(sum(col("c")).cast("bigint").as("rev"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val n = weekly.length
    val pairs = for {
      i <- weekly.indices; j <- i + 1 until n
    } yield (weekly(i)._1, weekly(j)._1,
      weekly(j)._2 - weekly(i)._2, weekly(j)._1 - weekly(i)._1)
    assert(r.getAs[Long]("n_weeks") == n)
    assert(r.getAs[Long]("n_pairs") == pairs.length)
    assert(r.getAs[Long]("n_pairs") == n.toLong * (n - 1) / 2)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_zero")
      + r.getAs[Long]("n_neg") == pairs.length)
    assert(r.getAs[Long]("n_pos") == pairs.count(_._3 > 0))
    assert(r.getAs[Long]("mk_s") ==
      pairs.count(_._3 > 0).toLong - pairs.count(_._3 < 0))
    // lower-median order statistic with (wi, wj) tie-break
    val sorted = pairs.map(p => (p._3.toDouble / p._4, p._1, p._2, p._3, p._4))
      .sortBy(t => (t._1, t._2, t._3))
    val med = sorted((pairs.length + 1) / 2 - 1)
    assert(r.getAs[Long]("med_num") == med._4)
    assert(r.getAs[Long]("med_den") == med._5)
    assert(r.getAs[Double]("slope_cents_per_week") == med._1)
    // exact MK variance numerator with the tie correction
    val tie18 = weekly.groupBy(_._2).map(_._2.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(r.getAs[Long]("var18") ==
      n.toLong * (n - 1) * (2L * n + 5) - tie18)
    val s = r.getAs[Long]("mk_s")
    val zLocal = (s.toDouble - math.signum(s.toDouble)) /
      math.sqrt(r.getAs[Long]("var18").toDouble / 18.0)
    assert(math.abs(r.getAs[Double]("z_mk") - zLocal) < 1e-12 * math.abs(zLocal).max(1.0))
  }

  test("orc source: round trip matches the parquet base aggregate") {
    val viaOrc = graft.sources.Sources.orcEventsAgg(spark, sf).collect()
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(graft.functions.Portable.cents(col("value"))).cast("bigint").as("value_cents"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy(col("event_type")).collect()
    assert(viaOrc.toSeq == base.toSeq)
  }

  test("q_ewma: the in-row fold equals a sequential Scala recompute of the recurrence") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Portable.cents
    val got = Insights.ewma(spark, sf)
      .select($"day", $"revenue_cents", $"ewma_cents")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val daily = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        cents(col("o_totalprice")).as("r"))
      .groupBy($"day").agg(sum($"r").as("cents"))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.length == daily.length && got.nonEmpty)
    var s = daily.head._2
    got.zip(daily).zipWithIndex.foreach { case (((gd, gr, ge), (dd, dr)), i) =>
      assert(gd == dd && gr == dr, s"day $i mismatch")
      if (i > 0) s = (3 * s + dr) / 4
      assert(ge == s, s"ewma at $gd: got $ge want $s")
    }
    // smoothing actually smooths: the EWMA series has lower variance
    // than the raw series (guaranteed only statistically, but at 2.4k
    // days a violation means the recurrence is wrong, not unlucky)
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(variance(got.map(_._3.toDouble)) < variance(got.map(_._2.toDouble)))
  }
}
