package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump formatted physical plans for the named queries (or a
  * default headline set) so pushdown / pruning / join strategy / codegen
  * coverage can be audited. `runMain graft.tools.ExplainAudit [names...]`
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("ref_filter", "ref_aggregation", "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier", "q6_revenue_forecast", "q_topk_orders", "q_asof_join",
        "pack_sequences", "text_contamination", "dedup_embedding", "pipeline_curate",
        "q_funnel", "dedup_cc", "emb_assign", "text_rarity",
        "text_scrub_pii", "text_bpe_tokens", "doc_chunk", "dedup_minhash_lsh",
        "emb_semdedup", "dedup_incremental", "text_boilerplate", "ann_topk_lsh",
        "q_attribution", "q_events_transition", "text_perplexity", "dedup_substring",
        "emb_pq", "text_inverted_index", "graph_pagerank",
        "emb_knn_graph", "emb_kmeans", "text_collocations", "mm_resize",
        "q_events_lake")
    val spark = GraftSession.local(4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
