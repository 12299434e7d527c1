package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text.{h60, h60Sql}
import graft.sources.Tables

/** Training-data pipeline operators over `documents`: deterministic
  * stratified sampling / train-val-test splitting (data mixing), and
  * fixed-token-window chunking. The reference feeds a downstream ML
  * consumer (connor.fun sentiment); these are the corpus-side operations
  * that sit between an ingested lake and a trainer at 100 TB.
  *
  * Scale + reproducibility shape: membership decisions are pure functions
  * of the row key — `h60(salt || doc_id) mod N` — never `rand()`. That
  * makes sampling (a) map-side (no shuffle, no global count), (b) stable
  * under retries/repartitioning, (c) incremental (new docs don't reshuffle
  * old splits — the property that keeps eval sets frozen as the corpus
  * grows), and (d) exactly mirrorable in the DuckDB oracle. Chunking is a
  * bounded explode (⌈tokens/window⌉ rows per doc), all map-side.
  */
object TrainingData {

  /** Per-source target sampling percentage (the mixture weights): spread
    * 10%..95% across the catalog's 20 sources. Single source of truth for
    * both engines. */
  private[graft] val mixRates: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 10 + (85 * i) / 19))

  private def rateCol(source: Column): Column =
    // coalesce to 0 like the oracle's CASE ... ELSE 0: a source outside
    // the mix config samples nothing, it doesn't go NULL
    coalesce(element_at(
      map(mixRates.flatMap { case (s, r) => Seq(lit(s), lit(r)) }: _*), source), lit(0))

  private val rateSqlCase: String =
    "CASE source " +
      mixRates.map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ") +
      " ELSE 0 END"

  /** Sample-membership bucket (0-99) and split bucket (0-9), keyed on
    * doc_id with distinct salts so the two decisions are independent. */
  private def sampleBucket(docId: Column): Column =
    pmod(h60(concat(lit("smp:"), docId.cast("string"))), lit(100L))
  private def splitBucket(docId: Column): Column =
    pmod(h60(concat(lit("spl:"), docId.cast("string"))), lit(10L))

  // ---------------------------------------------------------------- q54
  /** Mixture report: per source, corpus size, target rate, achieved
    * sample, and the sampled set's train/val/test split (8/1/1 by the
    * independent split hash). This is the audit a mixing config ships
    * with; the underlying per-row predicates are the operators. */
  def q54StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val withBuckets = d.select(col("source"),
      sampleBucket(col("doc_id")).as("sb"),
      splitBucket(col("doc_id")).as("pb"),
      rateCol(col("source")).as("rate"))
    val in = col("sb") < col("rate")
    withBuckets.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("rate")).as("target_pct"),
        sum(when(in, 1L).otherwise(0L)).as("n_sampled"),
        sum(when(in && col("pb") < 8, 1L).otherwise(0L)).as("n_train"),
        sum(when(in && col("pb") === 8, 1L).otherwise(0L)).as("n_val"),
        sum(when(in && col("pb") === 9, 1L).otherwise(0L)).as("n_test"))
      .orderBy(col("source"))
  }

  val q54Sql: String =
    s"""WITH b AS (SELECT source,
       |    ${h60Sql("'smp:'||doc_id")} % 100 AS sb,
       |    ${h60Sql("'spl:'||doc_id")} % 10 AS pb,
       |    $rateSqlCase AS rate
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, min(rate) AS target_pct,
       |  sum(CASE WHEN sb < rate THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       |  sum(CASE WHEN sb < rate AND pb < 8 THEN 1 ELSE 0 END)::BIGINT AS n_train,
       |  sum(CASE WHEN sb < rate AND pb = 8 THEN 1 ELSE 0 END)::BIGINT AS n_val,
       |  sum(CASE WHEN sb < rate AND pb = 9 THEN 1 ELSE 0 END)::BIGINT AS n_test
       |FROM b
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q55
  private val window = 32

  /** Context-window chunking: split each document into fixed
    * `window`-token chunks (last chunk ragged), one row per chunk — the
    * map-side explode a tokenize-and-pack trainer pipeline starts from.
    * Bounded: ⌈tokens/window⌉ rows per doc. */
  def q55Chunking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = split(col("text"), " ")
    // Chunks are cut BEFORE the explode: transform() maps each start
    // offset to its finished (chunk_id, chunk, n_tokens) struct while the
    // token array is still one row, and explode then emits narrow rows.
    // Exploding raw offsets instead would make Generate copy the full
    // token array into every chunk row (required-child-output columns are
    // serialized per generated row) — an O(chunks × tokens) byte copy per
    // document that a 100 TB corpus pays in the hot path.
    d.select(col("doc_id"), t.as("tk"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("tk")), lit(window)),
          start => struct(
            ((start - 1) / lit(window)).cast("int").as("chunk_id"),
            concat_ws(" ", slice(col("tk"), start, lit(window))).as("chunk"),
            least(lit(window), size(col("tk")) - start + 1).as("n_tokens"))))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.chunk"), col("c.n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val q55Sql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |s AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, $window)) AS start FROM t)
       |SELECT doc_id,
       |  ((start - 1) // $window)::INT AS chunk_id,
       |  array_to_string(list_slice(tk, start, least(start + ${window - 1}, len(tk))), ' ') AS chunk,
       |  least($window, len(tk) - start + 1) AS n_tokens
       |FROM s
       |ORDER BY doc_id, chunk_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_stratified_sample" -> q54StratifiedSample _,
    "q55_chunking"          -> q55Chunking _,
  )

  val oracle: Map[String, String] = Map(
    "q54_stratified_sample" -> q54Sql,
    "q55_chunking"          -> q55Sql,
  )
}
