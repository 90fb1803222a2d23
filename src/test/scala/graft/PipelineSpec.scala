package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Pipeline._

class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, Array.fill(30)("alpha").mkString(" "), "en", "s1"),
      (2L, Array.fill(30)("alpha").mkString(" "), "en", "s1"), // exact dup of 1
      (3L, "too short", "en", "s1"),                           // fails quality
      (4L, Array.fill(40)("beta").mkString(" "), "fr", "s2"),
      (5L, Array.fill(40)("gamma").mkString(" "), "xx", "s2")  // unsupported lang
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("scrubPii redacts emails, urls, and phone-shaped tokens in order") {
    import spark.implicits._
    val pii = Seq(
      (1L, "contact jane.doe+spam@example.co.uk or visit https://example.com/a?b=c&d=e now"),
      (2L, "call 555-867-5309 or 555.867.5309 but not 55-555 or 5558675309"),
      (3L, "mail me at http://host/path?email=bob@mail.org today"), // email inside URL query
      (4L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = pii.transform(scrubPii()).as[(Long, String)].collect().toMap
    assert(out(1L) == "contact <EMAIL> or visit <URL> now", out(1L))
    assert(out(2L) == "call <PHONE> or <PHONE> but not 55-555 or 5558675309", out(2L))
    // fixed order: the email is redacted FIRST (even inside the URL), then
    // the remaining URL prefix collapses to <URL>
    assert(!out(3L).contains("bob@mail.org"), s"email must never survive: ${out(3L)}")
    assert(out(3L).contains("<URL>") && out(3L).contains("<EMAIL>"), out(3L))
    assert(out(4L) == "no pii here at all")
    // the query-facing profile agrees with the stage on counts
    val c = textanalysis.Text.scrubPiiOf(pii)
      .select(col("doc_id"), col("n_emails"), col("n_urls"), col("n_phones"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(c(1L) == ((1L, 1L, 0L)), c(1L).toString)
    assert(c(2L) == ((0L, 0L, 2L)), c(2L).toString)
    assert(c(4L) == ((0L, 0L, 0L)), c(4L).toString)
  }

  test("chained gates compose and keep the expected survivors") {
    val out = docs
      .transform(qualityGate(0.6))
      .transform(exactDedup())
      .transform(langGate(Seq("en", "fr")))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
  }

  test("repetitionGate drops degenerate docs and keeps varied text") {
    import spark.implicits._
    val mixed = Seq(
      (1L, Array.fill(30)("alpha").mkString(" "), "en", "s1"), // 97% dup words
      (2L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "s1")) // all distinct
      .toDF("doc_id", "text", "lang", "source")
    val out = mixed.transform(repetitionGate(0.9, 0.9))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("pipeline_curate_v2: audit conserves docs and matches the standalone operators") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = graft.pipeline.Curate.runV2(spark, sf).cache()
    val total = Tables.documents(spark, sf).count()
    val sums = out.agg(
      sum($"n_docs"), sum($"n_kept"), sum($"drop_gopher"),
      sum($"drop_bow_dup"), sum($"drop_cdc_dup"), sum($"drop_diversity"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(sums._1 == total, "audit must conserve the corpus")
    assert(sums._2 > 0 && sums._2 < total, "the composed gate must split")
    // cross-consistency with the standalone operators the stages reuse
    val gopherFails = graft.textanalysis.Text.gopherQuality(spark, sf)
      .filter(!$"passes").count()
    assert(sums._3 == gopherFails, "drop_gopher != standalone gopher fails")
    val bowGroups = graft.dedup.Dedup.bow(spark, sf).count()
    assert(sums._4 == total - bowGroups, "drop_bow_dup != docs - bow groups")
    val divFails = graft.textanalysis.Text.unigramDiversity(spark, sf)
      .filter($"simpson_ppm" > 55000L).count()
    assert(sums._6 == divFails, "drop_diversity != standalone diversity fails")
    // kept docs pass every gate: kept <= n_docs - each drop column
    out.collect().foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      Seq("drop_gopher", "drop_bow_dup", "drop_cdc_dup", "drop_diversity").foreach { c =>
        assert(kept <= r.getAs[Long]("n_docs") - r.getAs[Long](c),
          s"($c) inconsistent in ${r}")
      }
    }
    out.unpersist()
  }

  test("pipeline_curate_v2 conserves a corpus containing empty documents (zero CDC chunks)") {
    import spark.implicits._
    // an empty text produces ZERO Gear chunks, so it has no dupShare row;
    // the audit must still count it (left join + dup share 0), not drop it
    val docs = Seq(
      (1L, "", "en", "s1"),
      (2L, (1 to 60).map(i => s"w$i and the of to in is that it for w$i").mkString(" "), "en", "s1"),
      (3L, (1 to 60).map(i => s"v$i and the of to in is that it for v$i").mkString(" "), "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.pipeline.Curate.runV2Of(docs)
    val total = out.agg(sum($"n_docs")).as[Long].head()
    assert(total == 3L, s"audit must conserve the corpus incl. the empty doc, got $total")
    // the empty doc shares no chunks: it must not be a cdc drop
    val cdcDrops = out.agg(sum($"drop_cdc_dup")).as[Long].head()
    assert(cdcDrops == 0L, s"no doc here shares chunks with a lower id, got $cdcDrops cdc drops")
  }

  test("the chain is one lazy Catalyst plan (no eager jobs at build time)") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = docs.transform(qualityGate()).transform(exactDedup())
      .transform(normalize()).transform(packSequences(budget = 64))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "pipeline construction must not run jobs")
    assert(df.columns.contains("seq_id"))
  }

  test("packSequences agrees with Prep.packSequences' seq assignment") {
    import spark.implicits._
    val packed = docs.transform(packSequences(budget = 64, shardCol = "source"))
      .select(col("source"), col("doc_id"), col("seq_id"))
      .as[(String, Long, Long)].collect().toSet
    // s1: doc1 30 tokens (cum 0 -> seq 0), doc2 30 (cum 30 -> 0), doc3 2 (cum 60 -> 0)
    // s2: doc4 40 (cum 0 -> 0), doc5 40 (cum 40 -> 0)... budget 64: cum 40 < 64 -> seq 0
    assert(packed == Set(
      ("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 0L),
      ("s2", 4L, 0L), ("s2", 5L, 0L)), packed.toString)
    val packed32 = docs.transform(packSequences(budget = 32, shardCol = "source"))
      .select(col("doc_id"), col("seq_id")).as[(Long, Long)].collect().toMap
    // budget 32: s1 doc1 cum 0 -> 0, doc2 cum 30 -> 0, doc3 cum 60 -> 1
    //            s2 doc4 cum 0 -> 0, doc5 cum 40 -> 1
    assert(packed32 == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 1L), packed32.toString)
  }

  test("deterministicSample is stable and respects the hex threshold") {
    val s1 = docs.transform(deterministicSample(50))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = docs.transform(deterministicSample(50))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same input must sample identically")
    val all = docs.transform(deterministicSample(100))
    assert(all.count() == 5, "100% keeps everything")
    val none = docs.transform(deterministicSample(0))
    assert(none.count() == 0, "0% keeps nothing")
  }

  test("deterministicSample rates are nested: sample(p) ⊆ sample(q) for p < q") {
    import spark.implicits._
    val ids = (1L to 500L).toDF("doc_id")
    val rates = Seq(10.0, 30.0, 60.0, 90.0)
    val kept = rates.map(p => ids.transform(deterministicSample(p))
      .collect().map(_.getLong(0)).toSet)
    kept.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), s"smaller rate must be a subset (${lo.size} vs ${hi.size})")
    }
    // rate lands near the target (hex-byte quantization ±1/256)
    val n30 = kept(1).size / 500.0
    assert(n30 > 0.2 && n30 < 0.4, s"30% sample landed at $n30")
  }

  test("mixtureTemperature: shares sum to ~1e6 and the temperature flattens the mix") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.pipeline.Prep.mixtureTemperature(spark, sf).collect()
    assert(rows.length > 1)
    val tempSum = rows.map(_.getAs[Long]("temp_share_ppm")).sum
    // integer-floor loss bounded by one ppm per source
    assert(tempSum <= 1000000L && tempSum >= 1000000L - rows.length)
    // alpha < 1 flattens: the biggest source loses share, the smallest gains
    val byRaw = rows.sortBy(_.getAs[Long]("raw_share_ppm"))
    assert(byRaw.last.getAs[Long]("temp_share_ppm") <=
      byRaw.last.getAs[Long]("raw_share_ppm"))
    assert(byRaw.head.getAs[Long]("temp_share_ppm") >=
      byRaw.head.getAs[Long]("raw_share_ppm"))
  }

  test("domainWeight: target-domain docs outscore the rest; weights well-formed") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.pipeline.Prep.domainWeight(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // importance ratios are non-negative by construction
    assert(rows.forall(_.getAs[Long]("score_ppm") >= 0L))
    // the defining property of importance weighting: documents FROM the
    // target domain (en) must average a higher weight than the rest —
    // otherwise the selector would anti-select its own target
    val (en, rest) = rows.partition(_.getAs[String]("lang") == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("score_ppm").toDouble).sum / rs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} not above non-target mean ${mean(rest)}")
    // every doc with tokens is scored exactly once
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length == total)
  }
}
