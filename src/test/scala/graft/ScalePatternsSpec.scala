package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Skew

/** Scale patterns: salted skew joins and partition-pruned layouts. */
class ScalePatternsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("no query plan contains a scale-killer: cartesian product or unpartitioned window") {
    // The global guard behind the per-query plan assertions: EVERY query in
    // the inventory is planned and screened for the two patterns that are
    // always fatal at 100 TB — a CartesianProduct (the non-equi-join
    // fallback nobody meant to ship) and a Window over SinglePartition
    // (all rows through one task). Allowlist entries must argue bounded
    // cardinality, not convenience.
    val allow = Map(
      // window input is the per-source aggregate: rows = |sources| (tiny,
      // bounded by the mixture config), not corpus rows
      "mixture_weights" -> "global-window",
      // same |sources|-row aggregate input as mixture_weights
      "mixture_temperature" -> "global-window",
      // cumulative walk over the 1024-bin histogram: rows ≤ 1024 by
      // construction regardless of corpus size
      "q_quantile_sketch" -> "global-window",
      // at-risk cumulative runs over DISTINCT LIFETIMES (≤ corpus day
      // span), after the per-user aggregation — not corpus rows
      "q_survival" -> "global-window",
      // lag window runs on the DAILY-REVENUE aggregate: rows = |days|
      // (calendar-bounded), the corpus collapses map-side first
      "q_autocorr" -> "global-window",
      // rank window runs on the B=200-row replicate-mean aggregate —
      // bounded by the literal resampling budget at any corpus size
      "q_bootstrap_ci" -> "global-window",
      // cumulative walk over $100 price buckets: rows ≤ 5001 by the
      // audited price-domain contract (q_data_audit's range check),
      // regardless of corpus size
      "q_mann_whitney" -> "global-window",
      // same $100-bucket cumulative walk as q_mann_whitney: the ECDF
      // window input is <=5001 bucket rows by the audited price-domain
      // contract, regardless of corpus size
      "q_ks_test" -> "global-window",
      // median rank + runs walk over the DAILY-REVENUE aggregate: rows =
      // |days| (calendar-bounded), the corpus collapses map-side first —
      // the q_autocorr argument
      "q_runs_test" -> "global-window",
      // midrank walks run over the two MARGINALS of the (quantity,
      // $100-price-bucket) grid: <=50 / ~1100 rows, bounded by the
      // attribute domains regardless of corpus size
      "q_spearman" -> "global-window",
      // same <=5001-bucket ECDF walk as q_ks_test, plus a lead() over
      // the same bounded bucket set for the inter-bucket gap
      "q_emd" -> "global-window",
      // median-slope order statistic over the WEEKLY pair grid: rows =
      // weeks·(weeks−1)/2 (calendar-bounded, ~59k on this span), the
      // corpus collapses map-side to the weekly aggregate first
      "q_theil_sen" -> "global-window")
    // a GLOBAL window is a Window node feeding from Exchange
    // SinglePartition (possibly through its Sort) — matching the node
    // STRUCTURE, not bare substrings: a runtime bloom-filter subquery
    // legitimately builds over Exchange SinglePartition (1-row aggregate)
    // and must not flag a query whose windows are all key-partitioned
    def hasGlobalWindow(p: String): Boolean = {
      val lines = p.split("\n")
      lines.zipWithIndex.exists { case (l, i) =>
        l.contains("Window") &&
          lines.slice(i + 1, i + 4).exists(_.contains("Exchange SinglePartition"))
      }
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      val flags = Seq(
        if (p.contains("CartesianProduct")) Some("cartesian") else None,
        if (hasGlobalWindow(p)) Some("global-window") else None).flatten
      flags.filterNot(f => allow.get(name).contains(f)).map(f => s"$name: $f")
    }
    assert(offenders.isEmpty,
      s"scale-killer patterns in:\n${offenders.mkString("\n")}")
  }

  test("compute-heavy map stages spread their input (single-split guard)") {
    // r10's single-split defect class: a map stage inherits the scan's
    // input splits, and every testdata table is ONE parquet row group —
    // Spark's byte-range splitting cannot subdivide a row group, so
    // `spark.sql.files.minPartitionNum` only manufactures EMPTY splits
    // (measured r11, sf0.1 lineitem with minPartitionNum=16: 3 byte-range
    // splits, all 600k rows in one of them) and an explicit exchange
    // (Tables.spread) is the only thing that actually redistributes rows.
    // This guard pins the four operators measured serializing onto 1-2
    // cores at 10x data (r10 scaling capture): each must plan a
    // round-robin exchange, i.e. the spread must survive optimization.
    val mustSpread = Seq(
      "q_bootstrap_ci",   // x200 md5 expansion of the orders scan
      "emb_knn_graph",    // n^2 cosine probe streamed side
      "emb_pq",           // m*ks*dsub HOF encode per corpus row
      "ann_topk_ivfpq")   // same encode inside the ADC path
    val missing = mustSpread.filter { name =>
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      !p.contains("RoundRobinPartitioning")
    }
    assert(missing.isEmpty,
      s"heavy map stage lost its spread exchange: $missing")
  }

  test("Tables.spread redistributes a single-split scan to full parallelism") {
    val df = Tables.spread(Tables.embeddings(spark, sf).select(col("vec_id")))
    assert(df.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // rows actually move: no partition holds more than ~2x the fair share
    val counts = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    val fair = counts.sum.toDouble / counts.length
    assert(counts.max <= math.max(2 * fair, fair + 8),
      s"spread left rows concentrated: ${counts.mkString(",")}")
  }

  test("no query broadcast-hints an unbounded corpus-sized side") {
    // Round-7 verdict item 4: the cartesian/global-window guard above let
    // a FULL-CORPUS broadcast sail through (graph_triangles over the exact
    // knn graph). This guard closes that class: every broadcast HINT in
    // every registered query's logical plan must be a declared small side.
    // "Small" is structural — the hinted subtree either (a) touches no
    // corpus-sized table at all (dims, bounds rows, model artifacts), or
    // (b) passes through a cardinality-bounding node between the corpus
    // scan and the broadcast. A raw corpus scan under a broadcast hint is
    // exactly the pattern that dies at 100 TB no matter what Catalyst
    // estimates at test SF. Allowlist entries must argue
    // declared-oracle-baseline status, not convenience.
    //
    // Round-15 hardening (the r14 verdict's top finding):
    //   - the corpus list now includes EVERY SF-scaled relation — part,
    //     supplier, customer scale linearly with SF (part is ~20B rows at
    //     100 TB TPC-H), they were wrongly treated as dims;
    //   - plans are built under spark.graft.dimHint.maxBytes=0, the
    //     at-scale simulation: every size-gated Tables.dimHint degrades
    //     to no-hint, so any hint this guard still sees is a FORCED one;
    //   - the Aggregate exemption is tightened to DOMAIN-BOUNDED
    //     aggregates only: a group-less aggregate is 1 row at any SF and
    //     passes; a keyed aggregate's cardinality is its key domain,
    //     which for fact keys (l_partkey, doc_id, ...) is itself
    //     SF-proportional — those must go through dimHint or argue a
    //     bounded key domain in the allowlist.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, ResolvedHint}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val corpus = Seq("embeddings", "documents", "events", "lineitem", "orders",
      "part", "supplier", "customer")
    val allow = Map(
      // the declared exact-scoring baseline: broadcasts the whole corpus
      // as the query panel BY DESIGN (Scaladoc: the scale path is
      // emb_knn_graph_ivf, which routes through coarse cells instead)
      "emb_knn_graph" -> "exact-baseline corpus panel",
      // fixed 20-id query panels: the broadcast side is filter(vec_id < 20)
      // — ≤ 20 rows at ANY corpus size; bounded by the literal key
      // predicate, which this structural guard can't see (ann_topk itself
      // carries a structural limit(20) since round 13 and needs no entry)
      "emb_pq" -> "fixed 20-id panel",
      "ann_topk_ivfpq" -> "fixed 20-id panel",
      // the dense branch broadcasts the same filter(vec_id < 20) panel as
      // ann_topk — ≤ 20 rows at ANY corpus size (the lexical branch's
      // broadcast side is Aggregate-bounded and passes structurally)
      "ann_rrf" -> "fixed 20-id panel (dense branch)",
      // the declared modulo query panel (vec_id % 100 == 0) — the
      // small-side oracle variant; a production caller passes an explicit
      // bounded panel (Scaladoc)
      "ann_range" -> "declared modulo query panel",
      // ---- r15 domain-bounded keyed aggregates (the tightened Aggregate
      // exemption needs the key-domain argument the guard can't see) ----
      // per-SOURCE aggregates: |sources| is mixture-config cardinality
      // (tens of rows at any corpus size — the mixture_weights argument)
      "doc_repeat_upsample" -> "per-source aggregate, |sources| config-bounded",
      "doc_token_budget" -> "per-source aggregate, |sources| config-bounded",
      "mixture_apply" -> "per-source aggregate, |sources| config-bounded",
      // centroid tables keyed (label, dim): |labels| is a small class
      // enum x 64 dims — model-artifact-sized at any corpus size
      "emb_assign" -> "per-(label,dim) centroid table, domain-bounded",
      "emb_outliers" -> "per-(label,dim) centroid + per-label moment table",
      // per-EVENT_TYPE aggregates: event_type is a bounded enum (~6
      // values, generator-declared domain)
      "q_approx_agg" -> "per-event_type sketch row, enum-bounded",
      "q_approx_agg_diag" -> "per-event_type sketch row, enum-bounded",
      "q_changepoint" -> "per-event_type hourly stats, enum-bounded",
      "q_events_anomaly" -> "per-event_type hourly moments, enum-bounded",
      "q_segment_overlap" -> "per-event_type audience counts, enum-bounded",
      // contingency marginals over (priority <=5) x (dow = 7) — attribute
      // domains, not corpus rows
      "q_chi2_assoc" -> "priority x dow marginals, domain-bounded",
      // per-day aggregate: rows = |days|, calendar-bounded (the
      // q_autocorr argument)
      "q_crosscorr" -> "per-day aggregate, calendar-bounded",
      // (quantity <=50) x ($100 price bucket ~1100) grid and its
      // marginals — the audited price-domain contract (q_data_audit),
      // same argument as their global-window allowlist entries
      "q_kendall" -> "bounded (quantity, price-bucket) grid",
      "q_spearman" -> "bounded (quantity, price-bucket) grid marginals")
    // at-scale simulation: every Tables.dimHint degrades to no-hint, so
    // the plans screened here are the 100 TB plans
    spark.conf.set("spark.graft.dimHint.maxBytes", "0")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val hinted = fn(spark, sf).queryExecution.analyzed.collect {
          // only BROADCAST-family hints move data to every executor; a
          // SHUFFLE_HASH/SHUFFLE_MERGE hint on a corpus side is fine (it
          // REFUSES the broadcast, e.g. dedup_embedding's block-pair join)
          case h: ResolvedHint if h.hints.strategy.exists(
            _.toString.toUpperCase.contains("BROADCAST")) => h.child
        }
        val bad = hinted.exists { sub =>
          val scansCorpus = sub.collect { case l: LogicalRelation => l.relation }.exists {
            case f: HadoopFsRelation =>
              corpus.exists(f.location.rootPaths.mkString(",").contains)
            case _ => false
          }
          val bounded = sub.collectFirst {
            // a keyed Aggregate's cardinality is its key DOMAIN — only the
            // group-less (1-row) shape is bounded at every SF
            case a: Aggregate if a.groupingExpressions.isEmpty => a: Any
            case l: GlobalLimit => l: Any
            case l: LocalLimit => l: Any
          }.isDefined
          scansCorpus && !bounded
        }
        if (bad && !allow.contains(name)) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"unbounded corpus-sized broadcast hint in: ${offenders.mkString(", ")}")
    } finally spark.conf.unset("spark.graft.dimHint.maxBytes")
  }

  test("dimHint fires under the size bound and degrades to no-hint above it") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hintCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    // sf0.001 part is a few KB — well under the default 64 MB bound
    assert(hintCount(Tables.dimHint(Tables.part(spark, sf))) == 1)
    // at-scale simulation: bound 0 means NO relation qualifies
    spark.conf.set("spark.graft.dimHint.maxBytes", "0")
    try assert(hintCount(Tables.dimHint(Tables.part(spark, sf))) == 0)
    finally spark.conf.unset("spark.graft.dimHint.maxBytes")
    // and the gated join returns identical rows either way (inner equi
    // join: only the physical strategy moves)
    val q = Tables.lineitem(spark, sf).filter(col("l_quantity") > 45)
    val expected = q.join(Tables.part(spark, sf),
      col("l_partkey") === col("p_partkey")).count()
    spark.conf.set("spark.graft.dimHint.maxBytes", "0")
    try assert(q.join(Tables.dimHint(Tables.part(spark, sf)),
      col("l_partkey") === col("p_partkey")).count() == expected)
    finally spark.conf.unset("spark.graft.dimHint.maxBytes")
  }

  test("salted join returns exactly the plain-join rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey")).collect().toSet
    val salted = Skew.saltedJoin(orders, customer,
        col("o_custkey") === col("c_custkey"), salt = 8)
      .select(col("o_orderkey"), col("c_custkey")).collect().toSet
    assert(salted == plain)
  }

  test("partitionBy layout prunes partitions at read time") {
    val tmp = Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf).write.mode("overwrite")
      .partitionBy("lang").parquet(tmp)
    val q = spark.read.parquet(tmp).filter(col("lang") === "en")
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(q.count() == expected)
    // partition filter reaches the scan (expression ids vary: "lang#N = en")
    val scan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*lang#\\d+ = en".r.findFirstIn(scan).isDefined, scan)
  }

  test("dynamic partition pruning: fact partitions pruned by the dim filter") {
    // DPP is THE mechanism that saves a partitioned 100 TB fact scan when
    // the partition key is only constrained through a joined dimension —
    // the filter value is not known until runtime, so static pruning can't
    // fire. Write events partitioned by event_type, join a filtered tiny
    // dim on the partition column, and require the dynamic pruning
    // expression in the fact scan.
    val tmp = Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$tmp/fact")
    val dimDf = {
      import spark.implicits._
      Seq(("purchase", 1), ("error", 2)).toDF("et", "grp")
    }
    dimDf.write.mode("overwrite").parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("grp") === 1)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val q = fact.join(dim, fact("event_type") === dim("et"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan must carry a DPP filter: $plan")
    assert(q.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("runtime bloom filter: selective dim side injects a semi-join filter") {
    // The shuffle-join analogue of DPP: when the fact is NOT partitioned on
    // the join key, the runtime bloom filter built from the selective dim
    // side prunes fact rows before the shuffle — at 100 TB that is the
    // difference between shuffling the full fact and shuffling the matching
    // sliver. Thresholds are tuned down so the rule fires at test size.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.part(spark, sf).filter(col("p_size") === 1)
      val q = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"fact side must carry the runtime bloom filter: $plan")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val expected = fact.join(dim, col("l_partkey") === col("p_partkey")).count()
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      assert(q.count() == expected, "bloom filter must not change results")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("curate pipeline exposes observed metrics") {
    import scala.collection.mutable
    val seen = mutable.Map.empty[String, Long]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("curate_metrics").foreach { row =>
          seen("rows_seen") = row.getAs[Long]("rows_seen")
          seen("rows_kept") = row.getAs[Long]("rows_kept")
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      pipeline.Curate.run(spark, sf).collect()
      // listener fires asynchronously; poll briefly
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get("rows_seen").contains(Tables.documents(spark, sf).count()))
      assert(seen("rows_kept") <= seen("rows_seen"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("dedup clusters group exact duplicates together") {
    import spark.implicits._
    val c = dedup.Dedup.clusters(spark, sf)
    // every doc labeled, labels ≤ doc_id (min-propagation invariant)
    assert(c.count() == Tables.documents(spark, sf).count())
    assert(c.filter($"cluster_id" > $"doc_id").count() == 0)
    // exact duplicates (same md5) must share a cluster
    val dupPair = Tables.documents(spark, sf)
      .groupBy(md5($"text")).agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1).select(explode($"ids").as("doc_id"),
        $"ids"(0).as("rep"))
    if (dupPair.count() > 0) {
      val joined = dupPair.join(c, "doc_id")
        .groupBy($"rep").agg(countDistinct($"cluster_id").as("nc"))
      assert(joined.filter($"nc" =!= 1).count() == 0)
    }
  }
}
