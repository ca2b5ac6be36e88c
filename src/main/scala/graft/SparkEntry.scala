package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, Multimodal, Relational, Similarity, SsbCorpus, TextAnalysis, TpchCorpus, VariantCorpus}
import graft.sources.Tables
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + pipeline ops);
  * `oracleSql` gives the DuckDB-equivalent SQL for every SQL-expressible
  * entry (same column aliases — the driver hash-compares by column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + group + sort — the reference's SSB sweet spot. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q05_star_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ EventStream.queries ++
      graft.plans.PredicateTransfer.queries ++ graft.sources.ZoneMapPruner.queries ++
      graft.sources.BloomPruner.queries ++ graft.sources.Layout.queries ++
      graft.sources.JsonLines.queries ++ graft.sources.Orc.queries ++
      TpchCorpus.queries ++ SsbCorpus.queries ++ VariantCorpus.queries ++
      Graph.queries ++ graft.cache.HybridScan.queries ++
      graft.plans.ModeExec.queries ++ graft.sources.StoreScheme.queries

  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++ EventStream.oracleSql ++
      graft.plans.PredicateTransfer.oracleSql ++ graft.sources.ZoneMapPruner.oracleSql ++
      graft.sources.BloomPruner.oracleSql ++ graft.sources.Layout.oracleSql ++
      graft.sources.JsonLines.oracleSql ++ graft.sources.Orc.oracleSql ++
      TpchCorpus.oracleSql ++ SsbCorpus.oracleSql ++ VariantCorpus.oracleSql ++
      Graph.oracleSql ++ graft.cache.HybridScan.oracleSql ++
      graft.plans.ModeExec.oracleSql ++ graft.sources.StoreScheme.oracleSql
}
