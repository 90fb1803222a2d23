package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The reference's headline mode is N concurrent query streams on one
  * engine (benches/query.rs:60-76); graft.Bench times that. This spec pins
  * the CORRECTNESS side: a mix of operator families — including queries
  * that register temp views (q_lateral) and one with an iterative fixpoint
  * (dedup_exact_hash's window) — each run twice simultaneously on one
  * SparkSession must produce byte-identical results to its sequential run.
  * Shared-session thread safety is what a multi-tenant Spark app hits on
  * day one.
  */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private val names = Seq(
    "q1_pricing_summary", "q_topk_per_key", "q_lateral", "q_funnel",
    "text_rep", "emb_quant", "q_window_dist", "dedup_exact_hash",
    "text_scrub_pii", "text_bpe_tokens", "doc_chunk",
    "q_attribution", "text_perplexity", "emb_pq",
    "emb_kmeans", "text_collocations", "mm_resize")

  private def run(n: String): Seq[String] =
    SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq

  test("34 concurrent runs of 17 mixed queries match their sequential results") {
    val sequential = names.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (names ++ names).map(n => Future(n -> run(n)))
      val results = Await.result(Future.sequence(fs), 5.minutes)
      results.foreach { case (n, got) =>
        assert(got == sequential(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
