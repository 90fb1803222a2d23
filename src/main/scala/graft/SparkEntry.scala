package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.Blobs
import graft.pipeline.{Curate, Prep}
import graft.operators.{Analytics, Audit, Events, Insights, Layout, Relational, RelationalExt, Skew, TopK, Tpch}
import graft.similarity.Ann
import graft.textanalysis.{BpeTrain, Text}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Tpch.queries ++ RelationalExt.queries ++ Analytics.queries ++ TopK.queries ++ Events.queries ++ Text.queries ++ BpeTrain.queries ++ Dedup.queries ++
      Ann.queries ++ graft.similarity.Graph.queries ++ Blobs.queries ++ Curate.queries ++ Skew.queries ++ Prep.queries ++ graft.sources.Sources.queries ++ Audit.queries ++ Insights.queries ++ Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Tpch.oracles ++ RelationalExt.oracles ++ Analytics.oracles ++ TopK.oracles ++ Events.oracles ++ Text.oracles ++ BpeTrain.oracles ++ Dedup.oracles ++
      Ann.oracles ++ graft.similarity.Graph.oracles ++ Blobs.oracles ++ Curate.oracles ++ Skew.oracles ++ Prep.oracles ++ graft.sources.Sources.oracles ++ Audit.oracles ++ Insights.oracles ++ Layout.oracles
}
