package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Lexicon sentiment scoring as a typed `Aggregator[IN,BUF,OUT]` — the
  * custom-UDAF surface (SURVEY §7.3). connor.fun's downstream is
  * per-region tweet sentiment (the reference producer feeds it,
  * `/root/reference/README.md:2`), so a sentiment aggregate is the
  * reference's intent made first-class.
  *
  * Determinism: the buffer carries integer hit/token counts (exact,
  * order-independent merges); the single double division happens once per
  * group in `finish` — so the result hash-matches the DuckDB oracle
  * despite Spark's nondeterministic merge order.
  *
  * Scale: an Aggregator compiles to a partial-then-final typed aggregate —
  * the same two-phase shape as built-in aggs, constant state per group.
  */
object Sentiment {

  val positive: Set[String] = Set("fast", "big", "value", "merge", "join")
  val negative: Set[String] = Set("slow", "small", "error", "filter")

  case class Buf(pos: Long, neg: Long, tokens: Long)

  /** text → sentiment ratio aggregator: (pos-neg)/tokens over the group. */
  object ScoreAgg extends Aggregator[String, Buf, Double] {
    override def zero: Buf = Buf(0L, 0L, 0L)
    override def reduce(b: Buf, text: String): Buf = {
      var pos = 0L; var neg = 0L; var n = 0L
      text.split(" ").foreach { t =>
        n += 1
        if (positive.contains(t)) pos += 1
        else if (negative.contains(t)) neg += 1
      }
      Buf(b.pos + pos, b.neg + neg, b.tokens + n)
    }
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.pos + b.pos, a.neg + b.neg, a.tokens + b.tokens)
    override def finish(b: Buf): Double =
      if (b.tokens == 0L) 0.0 else (b.pos - b.neg).toDouble / b.tokens
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---------------------------------------------------------------- q41
  /** Sentiment per source via the typed Aggregator (registered as an
    * untyped UDAF column so it slots into a relational groupBy). */
  def q41SourceSentiment(spark: SparkSession, dir: String): DataFrame = {
    val score = udaf(ScoreAgg)
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(score(col("text")) + 1e-9, 6).as("sentiment"))
      .orderBy(col("source"))
  }

  val q41Sql: String = {
    def hits(set: Set[String]): String = {
      val lst = set.toSeq.sorted.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), t -> list_contains($lst, t)))"
    }
    s"""WITH t AS (SELECT source,
       |    ${hits(positive)} AS pos,
       |    ${hits(negative)} AS neg,
       |    len(string_split(text,' ')) AS toks
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  round((sum(pos) - sum(neg))::DOUBLE / sum(toks) + 1e-9, 6) AS sentiment
       |FROM t
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_source_sentiment" -> q41SourceSentiment _,
  )

  val oracle: Map[String, String] = Map(
    "q41_source_sentiment" -> q41Sql,
  )
}
