package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOf, Dedup, Geo, Graph, Multimodal, Relational, Similarity, Skew, Sketches, TimeSeries, TrainingData, Windows}
import graft.functions.{HeavyHitters, Sentiment, Text}
import graft.sources.{Layout, SnapOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a `queries` map (name → builder) and an
  * `oracle` map (name → equivalent DuckDB SQL); this object aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + agg: exercises scan, broadcast join, partial agg, sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q06StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Geo.queries ++ Text.queries ++ Dedup.queries ++
      Similarity.queries ++ Windows.queries ++ Multimodal.queries ++
      Sketches.queries ++ Sentiment.queries ++ TimeSeries.queries ++
      Layout.queries ++ Skew.queries ++ AsOf.queries ++ TrainingData.queries ++
      Graph.queries ++ HeavyHitters.queries ++ SnapOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Geo.oracle ++ Text.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Windows.oracle ++ Multimodal.oracle ++
      Sketches.oracle ++ Sentiment.oracle ++ TimeSeries.oracle ++
      Layout.oracle ++ Skew.oracle ++ AsOf.oracle ++ TrainingData.oracle ++
      Graph.oracle ++ HeavyHitters.oracle ++ SnapOps.oracle
}
