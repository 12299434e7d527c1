package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis surface over the `documents` table (BASELINE.json
  * extension: language-ID, quality scoring, token counting, document
  * fingerprinting). The reference (`/root/reference/regionSpout.go:152`)
  * ships tweet text opaquely; connor.fun's downstream is tweet sentiment, so
  * a text-scoring surface is the natural extension of its intent.
  *
  * Everything here is built from codegen'd built-ins — `split`, higher-order
  * array functions (`transform`/`aggregate`/`filter`), `regexp_count`, `md5`
  * — no UDFs, so whole-stage codegen spans the full pipeline and the 100 TB
  * plan is a pure map over the corpus followed by a tiny aggregate.
  *
  * Cross-engine determinism: every score is integer arithmetic or a single
  * well-ordered double expression, so results hash-match the DuckDB oracle
  * bit-for-bit. The shared 60-bit hash is `H(x) = bigint(md5(x)[0,15) hex)`
  * — identical in Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`).
  */
object Text {

  /** 60-bit deterministic cross-engine hash (fits a signed long). Native
    * codegen'd expression ([[graft.expressions.H60]]); numerically equal
    * to `conv(substring(md5(c),1,15),16,10)` — see h60Legacy + spec. */
  def h60(c: Column): Column = call_function("graft_h60", c)

  /** The built-in-composed form h60 replaced (kept for the parity spec). */
  def h60Legacy(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB fragment computing h60 of `e`. */
  def h60Sql(e: String): String = s"('0x'||substr(md5($e),1,15))::BIGINT"

  private val P = 1000000007L

  def toks(c: Column): Column = split(c, " ")

  // ---------------------------------------------------------------- q21
  /** Token statistics per language: whitespace tokens, BPE-ish regex tokens
    * (letter runs / digit runs / single other), distinct-token
    * (type-token) counts, chars. One map + one 5-group aggregate. */
  def q21TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = toks(col("text"))
    d.select(
        col("lang"),
        size(t).as("n_ws"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe"),
        size(array_distinct(t)).as("n_distinct"),
        length(col("text")).as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("total_tokens"),
        round(avg(col("n_ws")) + 1e-9, 4).as("avg_tokens"),
        round(avg(col("n_bpe")) + 1e-9, 4).as("avg_bpe_tokens"),
        round(avg(col("n_distinct")) + 1e-9, 4).as("avg_distinct"),
        round(avg(col("n_chars")) + 1e-9, 4).as("avg_chars"))
      .orderBy(col("lang"))
  }

  val q21Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  sum(len(string_split(text,' ')))::BIGINT AS total_tokens,
      |  round(avg(len(string_split(text,' '))) + 1e-9, 4) AS avg_tokens,
      |  round(avg(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) + 1e-9, 4) AS avg_bpe_tokens,
      |  round(avg(len(list_distinct(string_split(text,' ')))) + 1e-9, 4) AS avg_distinct,
      |  round(avg(length(text)) + 1e-9, 4) AS avg_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Per-document quality score from length / type-token ratio / stopword
    * ratio — the standard pretraining-corpus heuristics, purely map-side. */
  private val stopwords = Seq("the", "a", "of", "and", "to")

  def q22QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = toks(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    d.select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(filter(t, x => array_contains(stopArr, x))).as("n_stop"),
        size(array_distinct(t)).as("n_distinct"),
        length(regexp_replace(col("text"), " ", "")).as("n_alpha"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("n_alpha") / col("n_tokens") + 1e-9, 6).as("avg_token_len"),
        round(col("n_stop") / col("n_tokens") + 1e-9, 6).as("stop_ratio"),
        round(col("n_distinct") / col("n_tokens") + 1e-9, 6).as("ttr"),
        round(
          least(lit(1.0), col("n_tokens") / 100.0) *
            (lit(0.5) + (col("n_distinct") / col("n_tokens")) * 0.5) *
            (lit(1.0) - (col("n_stop") / col("n_tokens")) * 0.5) + 1e-9, 6)
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  val q22Sql: String =
    """WITH t AS (SELECT doc_id,
      |    len(string_split(text,' ')) AS n_tokens,
      |    len(list_filter(string_split(text,' '),
      |        x -> list_contains(['the','a','of','and','to'], x))) AS n_stop,
      |    len(list_distinct(string_split(text,' '))) AS n_distinct,
      |    length(replace(text,' ','')) AS n_alpha
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  round(n_alpha / n_tokens + 1e-9, 6) AS avg_token_len,
      |  round(n_stop / n_tokens + 1e-9, 6) AS stop_ratio,
      |  round(n_distinct / n_tokens + 1e-9, 6) AS ttr,
      |  round(least(1.0, n_tokens / 100.0) *
      |        (0.5 + (n_distinct / n_tokens) * 0.5) *
      |        (1.0 - (n_stop / n_tokens) * 0.5) + 1e-9, 6) AS quality
      |FROM t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Marker-token language ID (n-gram-heuristic family): score each
    * language by marker hits, argmax with first-wins tie-break, confusion
    * matrix vs the labeled lang. Map + tiny aggregate. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "sort"),
    "fr" -> Seq("table", "value", "merge"),
    "de" -> Seq("hash", "join", "scan"),
    "zh" -> Seq("window", "stream", "batch"))

  def q23LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = toks(col("text"))
    val scored = d.select(
      (col("doc_id") +: col("lang") +:
        markers.map { case (l, ms) =>
          val arr = array(ms.map(lit): _*)
          size(filter(t, x => array_contains(arr, x))).as(s"s_$l")
        }): _*)
    val langs = markers.map(_._1)
    // argmax, first language in `markers` order wins ties
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), rest) =>
      val geAll = langs.drop(i + 1)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .foldLeft(lit(true))(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    scored.select(col("lang"), pred.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  val q23Sql: String = {
    val score = markers.map { case (l, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), x -> list_contains($lst, x))) AS s_$l"
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val pred = langs.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o")
      val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"""WITH sc AS (SELECT doc_id, lang,
       |    $score
       |  FROM documents),
       |p AS (SELECT lang, CASE $pred ELSE 'und' END AS pred_lang FROM sc)
       |SELECT lang, pred_lang, count(*) AS n
       |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  // ---------------------------------------------------------------- q24
  /** Document fingerprint: polynomial rolling hash over per-token 60-bit
    * hashes, mod 1e9+7 — an order-sensitive content signature (unlike the
    * set-based MinHash in Dedup). Pure map, no shuffle at any scale. */
  def fingerprint(text: Column): Column =
    aggregate(
      toks(text), lit(0L),
      (acc, t) => (acc * 131L + h60(t) % P) % P)

  def fingerprintSql(text: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       | list_transform(string_split($text,' '), t -> ${h60Sql("t")} % 1000000007)),
       | (a,b) -> (a*131 + b) % 1000000007)""".stripMargin.replace("\n", "")

  def q24Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  val q24Sql: String =
    s"""SELECT doc_id, ${fingerprintSql("text")} AS fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Repetition ratio (Gopher-style quality filter): fraction of bigrams
    * that are repeats of an earlier bigram — high values flag template /
    * boilerplate documents. Pure map; flagged docs surface for the dedup
    * pipeline. */
  /** HOF reference for the native bigram-distinct count — kept only for
    * the spec that asserts `graft_bigram_distinct` equality. */
  private[graft] def bigramDistinctReference(t: Column): Column =
    size(array_distinct(transform(sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", slice(t, i, lit(2))))))

  def q47Repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = toks(col("text"))
    // distinct-bigram counting is the q47 hot path: the HOF form built a
    // string per bigram through interpreted lambdas (4.3 s at sf0.1);
    // the native pair-set pass is 0.7 s with identical counts
    d.select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), (size(col("t")) - 1).as("n_bigrams"),
        call_function("graft_bigram_distinct", col("t")).as("n_distinct"))
      .select(col("doc_id"), col("n_bigrams"),
        round((col("n_bigrams") - col("n_distinct")) / col("n_bigrams") + 1e-9, 6)
          .as("repetition_ratio"))
      .filter(col("repetition_ratio") > 0.05)
      .orderBy(col("doc_id"))
  }

  val q47Sql: String =
    """WITH b AS (SELECT doc_id,
      |    list_transform(range(1, len(string_split(text,' '))),
      |      i -> array_to_string(list_slice(string_split(text,' '), i, i+1), ' ')) AS bg
      |  FROM documents),
      |r AS (SELECT doc_id, len(bg) AS n_bigrams,
      |    round((len(bg) - len(list_distinct(bg))) / len(bg) + 1e-9, 6) AS repetition_ratio
      |  FROM b)
      |SELECT doc_id, n_bigrams, repetition_ratio
      |FROM r
      |WHERE repetition_ratio > 0.05
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q117
  /** The composed quality-filter CHAIN — the actual "clean the crawl"
    * job every pretraining pipeline runs, where q22/q23/q47 are the
    * individual heuristics: five rules in a FIXED order, each document
    * attributed to the FIRST rule it fails (the filter-funnel waterfall
    * report that tells a data engineer which rule is doing the killing
    * and in what order), survivors counted as 'kept'. Per (source,
    * verdict): document count.
    *
    * Rules (C4/Gopher-family heuristics, thresholds set from the staged
    * corpus so every rule has both passing and failing docs):
    *   1. too_short      n_tokens < 16
    *   2. too_long       n_tokens > 88
    *   3. repetitive     repeated-bigram ratio > 1/12 (native pair-set
    *                     count, q47's kernel)
    *   4. low_diversity  type-token ratio < 0.30
    *   5. low_stopword   stopword ratio < 0.05 (q22's stopword list)
    *
    * Scale shape: ONE corpus scan — every per-doc statistic is a
    * map-side projection (codegen'd HOFs + the native bigram kernel),
    * the waterfall is a when-chain, and the only shuffle is the final
    * (source, verdict)-domain aggregate whose output is bounded by
    * #sources × 6. This is the plan shape a 100 TB filter run needs:
    * attribution comes free with the verdict, no per-rule re-scans.
    *
    * Determinism: every threshold compares INTEGER cross-products
    * (n_stop·20 < n, nd·10 < n·3, (nb−nbd)·12 > nb) — no float ratio
    * ever crosses an engine boundary. */
  /** The per-document filter-chain verdict of [[q117FilterChain]],
    * appended as a `verdict` column over any frame carrying `text` —
    * factored so the STREAMING ingest gate
    * ([[graft.streaming.Ingest.qualityGateSink]]) applies byte-identical
    * rule semantics per micro-batch: stream ≡ batch by construction,
    * the q104/trendingTws discipline. */
  private[graft] def withFilterVerdict(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val statCols = Seq(
      size(t).as("fc_n"),
      size(filter(t, x => array_contains(stopArr, x))).as("fc_stop"),
      size(array_distinct(t)).as("fc_nd"),
      (size(t) - 1).as("fc_nb"),
      call_function("graft_bigram_distinct", t).as("fc_nbd"))
    val verdict =
      when(col("fc_n") < 16, "too_short")
        .when(col("fc_n") > 88, "too_long")
        .when((col("fc_nb") - col("fc_nbd")) * 12 > col("fc_nb"), "repetitive")
        .when(col("fc_nd") * 10 < col("fc_n") * 3, "low_diversity")
        .when(col("fc_stop") * 20 < col("fc_n"), "low_stopword")
        .otherwise("kept")
    docs.select(col("*") +: statCols: _*)
      .withColumn("verdict", verdict)
      .drop("fc_n", "fc_stop", "fc_nd", "fc_nb", "fc_nbd")
  }

  def q117FilterChain(spark: SparkSession, dir: String): DataFrame =
    withFilterVerdict(Tables.documents(spark, dir).select(col("source"), col("text")))
      .groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("verdict"))

  val q117Sql: String =
    """WITH s AS (SELECT source,
      |    len(string_split(text,' ')) AS n,
      |    len(list_filter(string_split(text,' '),
      |        x -> list_contains(['the','a','of','and','to'], x))) AS n_stop,
      |    len(list_distinct(string_split(text,' '))) AS nd,
      |    len(string_split(text,' ')) - 1 AS nb,
      |    len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
      |        i -> array_to_string(list_slice(string_split(text,' '), i, i+1), ' ')))) AS nbd
      |  FROM documents),
      |v AS (SELECT source,
      |    CASE WHEN n < 16 THEN 'too_short'
      |         WHEN n > 88 THEN 'too_long'
      |         WHEN (nb - nbd) * 12 > nb THEN 'repetitive'
      |         WHEN nd * 10 < n * 3 THEN 'low_diversity'
      |         WHEN n_stop * 20 < n THEN 'low_stopword'
      |         ELSE 'kept' END AS verdict
      |  FROM s)
      |SELECT source, verdict, count(*) AS n_docs
      |FROM v
      |GROUP BY source, verdict
      |ORDER BY source, verdict""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Corpus-frequency scoring — the global-stats-then-score shape behind
    * IDF weighting and perplexity-style quality filters: pass 1 builds
    * the corpus term-frequency table (vocab-sized by Heaps' law, ≪
    * corpus — broadcastable in practice, a key-shuffle join at worst);
    * pass 2 scores each doc by its tokens' average corpus frequency.
    * Rare-token-heavy docs (low avg_tf) are the classic garbage/noise
    * signal. Integer counts + one final division keep it cross-engine
    * exact (nudged round for the ratio-of-ints boundary). */
  def q58TokenCommonness(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tk = d.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    tk.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("tf")) / count(lit(1)) + 1e-9, 4).as("avg_tf"))
      .orderBy(col("doc_id"))
  }

  val q58Sql: String =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |freq AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(sum(tf) / count(*) + 1e-9, 4) AS avg_tf
      |FROM tk JOIN freq USING (tok)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65
  private val bm25K1 = 1.2
  private val bm25B = 0.75

  /** Fixed keyword queries (a search/eval workload constant — the same
    * role as q30's query vectors). */
  private[graft] val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join", "table"),
    2 -> Seq("stream", "window", "batch"),
    3 -> Seq("vector", "hash", "merge"))

  /** BM25 relevance: top-10 documents per keyword query. The full
    * corpus-statistics ranking pipeline in three joins, all broadcast-
    * sized except the corpus scan: (1) per-doc term frequencies for the
    * 9 query terms only — the token filter runs map-side against a
    * literal array, so the explode carries ≤ matched tokens, never the
    * corpus vocabulary; (2) document frequencies (9 rows) and the global
    * (N, Σdl) pair joined back by broadcast; (3) per-(query, doc) scores
    * summed in sorted-term order via an explicit array fold — groupBy
    * sum over doubles would add in partition order and lose cross-engine
    * (and run-to-run) bit-identity.
    *
    * Shape at 100 TB: one corpus scan, one (doc, term) shuffle bounded
    * by |terms|·docs-matched, broadcast stats, top-k window per query.
    * Constants (k1, b, k1+1) are interpolated from the SAME Scala
    * doubles into both engines — shortest-repr round-trip keeps them
    * bit-identical. */
  /** (doc_id, tk, dl) — tokenized corpus with doc lengths. The single
    * definition q65 and q78 both build on: the cross-engine determinism
    * discipline (string_split parity, dl = raw token count including
    * empties) lives here once. */
  private def tokenizedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).as("dl"))

  /** (doc_id, dl, term, tf) — per-document term frequencies, optionally
    * restricted map-side to a term allow-list BEFORE the explode so the
    * shuffle carries only matching tokens. */
  private def docTermFreq(toksDf: DataFrame,
                          termFilter: Option[Column] = None): DataFrame = {
    val terms = termFilter match {
      case Some(arr) => filter(col("tk"), t => array_contains(arr, t))
      case None      => col("tk")
    }
    toksDf
      .select(col("doc_id"), col("dl"), explode(terms).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  def q65Bm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allTerms = bm25Queries.flatMap(_._2).distinct
    val termArr = array(allTerms.map(lit): _*)
    val toksDf = tokenizedDocs(spark, dir)
    val dtf = docTermFreq(toksDf, Some(termArr))
    val dfs = dtf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val global = toksDf.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sdl"))
    val qt = {
      import spark.implicits._
      bm25Queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("query_id", "term")
    }
    val avgdl = col("sdl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfPart = (col("tf") * lit(bm25K1 + 1)) /
      (col("tf") + lit(bm25K1) * (lit(1.0) - lit(bm25B) + lit(bm25B) * col("dl") / avgdl))
    val parts = dtf
      .join(broadcast(dfs), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(global))
      .select(col("query_id"), col("doc_id"),
        struct(col("term"), (idf * tfPart).as("part")).as("p"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    parts.groupBy(col("query_id"), col("doc_id"))
      .agg(round(aggregate(sort_array(collect_list(col("p"))), lit(0.0),
        (acc, x) => acc + x.getField("part")) + 1e-9, 4).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .orderBy(col("query_id"), col("rk"))
  }

  val q65Sql: String = {
    val allTerms = bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString("[", ", ", "]")
    val qtValues = bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }.mkString(", ")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |ex AS (SELECT doc_id, len(tk) AS dl,
       |    unnest(list_filter(tk, x -> list_contains($allTerms, x))) AS term
       |  FROM tk),
       |dtf AS (SELECT doc_id, dl, term, count(*) AS tf FROM ex GROUP BY 1, 2, 3),
       |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM dtf GROUP BY 1),
       |g AS (SELECT count(*) AS n_docs, sum(len(tk))::BIGINT AS sdl FROM tk),
       |qt(query_id, term) AS (SELECT * FROM (VALUES $qtValues)),
       |parts AS (SELECT qt.query_id, dtf.doc_id,
       |    struct_pack(term := dtf.term, part :=
       |      ln(1.0 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |      ((dtf.tf * ${bm25K1 + 1}) /
       |       (dtf.tf + $bm25K1 * (1.0 - $bm25B + $bm25B * dtf.dl
       |         / (sdl::DOUBLE / g.n_docs))))) AS p
       |  FROM dtf JOIN dfs USING (term) JOIN qt ON qt.term = dtf.term CROSS JOIN g),
       |sc AS (SELECT query_id, doc_id,
       |    round(list_reduce(list_prepend(0.0,
       |      list_transform(list_sort(list(p)), x -> x.part)), (a, b) -> a + b)
       |      + 1e-9, 4) AS score
       |  FROM parts GROUP BY query_id, doc_id),
       |rk AS (SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
       |  FROM sc)
       |SELECT query_id, doc_id, score, rk FROM rk WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------- q78
  /** Unigram language-model scoring: per-document negative log-
    * likelihood per token under the corpus's own unigram distribution —
    * the CCNet/Gopher-style perplexity filter that ranks documents by
    * how "typical" their token mix is (boilerplate scores low, noise
    * scores high). Two passes: a corpus term-frequency aggregate
    * (vocabulary-sized — tiny, broadcast), then a per-doc (term, tf)
    * aggregation joined against it. NLL(doc) = −Σ_t tf_t·ln(c_t/T) / dl.
    *
    * Determinism: the per-doc sum folds in SORTED-TERM order via an
    * explicit array fold (q65's discipline) — a groupBy sum over
    * doubles would add in partition order and lose run-to-run and
    * cross-engine bit-identity. ln(c/T) is computed on the same exact
    * integers in both engines, so each addend is bit-identical.
    *
    * Shape at 100 TB: one corpus scan for frequencies (vocab fits in
    * broadcast after the aggregate), one (doc, term) shuffle bounded
    * by distinct terms per doc, top-level rows = documents. */
  def q78Perplexity(spark: SparkSession, dir: String): DataFrame = {
    val dtf = docTermFreq(tokenizedDocs(spark, dir))
    val freq = dtf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    val total = freq.agg(sum(col("c")).as("tot"))
    dtf
      .join(broadcast(freq), "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("dl"),
        struct(col("term"),
          (col("tf") * log(col("c").cast("double") / col("tot"))).as("part")).as("p"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(round(-aggregate(sort_array(collect_list(col("p"))), lit(0.0),
        (acc, x) => acc + x.getField("part")) / col("dl") + 1e-9, 4).as("nll"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("nll"))
      .orderBy(col("doc_id"))
  }

  val q78Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |dtf0 AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM tk),
      |dtf AS (SELECT doc_id, dl, term, count(*) AS tf FROM dtf0 GROUP BY 1, 2, 3),
      |freq AS (SELECT term, sum(tf)::BIGINT AS c FROM dtf GROUP BY 1),
      |tot AS (SELECT sum(c)::BIGINT AS tot FROM freq),
      |parts AS (SELECT dtf.doc_id, dtf.dl,
      |    {'term': dtf.term, 'part': dtf.tf * ln(freq.c::DOUBLE / tot.tot)} AS p
      |  FROM dtf JOIN freq USING (term) CROSS JOIN tot)
      |SELECT doc_id, any_value(dl)::BIGINT AS n_tokens,
      |  round(-list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list(p)), x -> x.part)), (a, b) -> a + b)
      |    / any_value(dl) + 1e-9, 4) AS nll
      |FROM parts GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Deterministic PII pseudonymization + in-query audit — the privacy
    * transform a training pipeline applies before text leaves the lake.
    * Pseudonyms are a pure keyed hash of the name (`h60("pii:"||name)`
    * into a fixed-width token), which gives the three properties that
    * matter at 100 TB: map-side (no lookup table to shuffle or leak),
    * STABLE across tables and runs (the same name pseudonymizes
    * identically everywhere, so joins on pseudonymized keys still
    * work), and collision-auditable — the output's
    * n_names vs n_pseudonyms columns ARE the audit that no two names
    * collapsed (a salt bump re-keys the corpus if they ever do). The
    * audit runs per segment AND globally (the `ALL` rollup row): the
    * pseudonym space is global, so two names in DIFFERENT segments
    * that collide after the 12-digit truncation would slip a
    * per-segment audit while silently merging cross-table joins on
    * the pseudonym — only the corpus-wide distinct-count catches that.
    * Reversal resistance comes from the keyed prefix; a deployment
    * would hold the salt in a KMS, not a literal. */
  def q89Pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val pseudo = concat(lit("cust-"),
      lpad((h60(concat(lit("pii:"), col("c_name"))) % 1000000000000L).cast("string"),
        12, "0"))
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_name"), pseudo.as("pseudonym"))
      .rollup(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_name")).as("n_names"),
        countDistinct(col("pseudonym")).as("n_pseudonyms"),
        min(col("pseudonym")).as("sample_pseudonym"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("n"), col("n_names"), col("n_pseudonyms"), col("sample_pseudonym"))
      .orderBy(col("segment"))
  }

  val q89Sql: String =
    s"""WITH p AS (SELECT c_mktsegment, c_name,
       |    'cust-' || lpad((${h60Sql("'pii:'||c_name")} % 1000000000000)::VARCHAR,
       |      12, '0') AS pseudonym
       |  FROM customer)
       |SELECT coalesce(c_mktsegment, 'ALL') AS segment, count(*) AS n,
       |  count(DISTINCT c_name) AS n_names,
       |  count(DISTINCT pseudonym) AS n_pseudonyms,
       |  min(pseudonym) AS sample_pseudonym
       |FROM p GROUP BY ROLLUP (c_mktsegment) ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Interpolated BIGRAM LM perplexity — q78's unigram filter upgraded
    * to the model CCNet-class pipelines actually use for quality
    * scoring: P(w₂|w₁) = 0.7·c(w₁w₂)/c(w₁) + 0.3·c(w₂)/N (Jelinek–
    * Mercer smoothing, so unseen-in-context words fall back to the
    * unigram prior instead of −∞). Per-doc NLL per bigram; docs with
    * fewer than 2 tokens have no bigrams and are excluded in both
    * engines.
    *
    * Scale shape: corpus statistics are two aggregates (bigram counts
    * ∝ distinct-bigram vocabulary, unigram counts ∝ vocabulary); the
    * per-doc (doc, bigram) shuffle is bounded by distinct bigrams per
    * doc. Join strategies stay AQE-chosen — the unigram table is
    * broadcast-tiny, the bigram table is vocab²-bounded and must be
    * allowed to degrade to a shuffle join at corpus scale (no hints).
    * Determinism: per-doc parts folded in sorted (w₁, w₂) order (the
    * q65/q78 discipline); each part is one ln over ratios of exact
    * integers — bit-identical cross-engine. */
  def q95BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val t2 = tokenizedDocs(spark, dir).filter(col("dl") >= 2)
    val pairs = t2.select(col("doc_id"), (col("dl") - 1).as("nb"),
        explode(transform(sequence(lit(1), col("dl") - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("nb"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val dbf = pairs.groupBy(col("doc_id"), col("nb"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val cb = dbf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cb"))
    val uni = tokenizedDocs(spark, dir)
      .select(explode(col("tk")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).as("nu"))
    val p = dbf
      .join(cb, Seq("w1", "w2"))
      .join(uni.select(col("term").as("w1"), col("cu").as("cu1")), "w1")
      .join(uni.select(col("term").as("w2"), col("cu").as("cu2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("nb"),
        struct(col("w1"), col("w2"),
          (col("tf") * log(lit(0.7) * col("cb") / col("cu1")
            + lit(0.3) * col("cu2") / col("nu"))).as("part")).as("p"))
    p.groupBy(col("doc_id"), col("nb"))
      .agg(round(-aggregate(sort_array(collect_list(col("p"))), lit(0.0),
        (acc, x) => acc + x.getField("part")) / col("nb") + 1e-9, 4).as("nll"))
      .select(col("doc_id"), col("nb").as("n_bigrams"), col("nll"))
      .orderBy(col("doc_id"))
  }

  val q95Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |t2 AS (SELECT doc_id, len(tk) - 1 AS nb, tk FROM tk WHERE len(tk) >= 2),
      |pr AS (SELECT doc_id, nb, tk, unnest(range(1, nb + 1)) AS i FROM t2),
      |pw AS (SELECT doc_id, nb, tk[i] AS w1, tk[i+1] AS w2 FROM pr),
      |dbf AS (SELECT doc_id, nb, w1, w2, count(*) AS tf FROM pw GROUP BY 1, 2, 3, 4),
      |cb AS (SELECT w1, w2, sum(tf)::BIGINT AS cb FROM dbf GROUP BY 1, 2),
      |uni AS (SELECT term, count(*) AS cu
      |  FROM (SELECT unnest(tk) AS term FROM tk) GROUP BY 1),
      |tot AS (SELECT sum(cu)::BIGINT AS nu FROM uni),
      |parts AS (SELECT dbf.doc_id, dbf.nb,
      |    {'w1': dbf.w1, 'w2': dbf.w2,
      |     'part': dbf.tf * ln(0.7 * cb.cb / u1.cu + 0.3 * u2.cu / tot.nu)} AS p
      |  FROM dbf JOIN cb ON dbf.w1 = cb.w1 AND dbf.w2 = cb.w2
      |  JOIN uni u1 ON dbf.w1 = u1.term
      |  JOIN uni u2 ON dbf.w2 = u2.term
      |  CROSS JOIN tot)
      |SELECT doc_id, any_value(nb)::BIGINT AS n_bigrams,
      |  round(-list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list(p)), x -> x.part)), (a, b) -> a + b)
      |    / any_value(nb) + 1e-9, 4) AS nll
      |FROM parts GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Per-source KL divergence from the corpus unigram distribution —
    * the domain-shift diagnostic a data-mixing pipeline reads before
    * setting q54/q64's mixture weights: a source whose token
    * distribution sits far from the corpus (here: the language-marked
    * sources) contributes disproportionate distribution shift per
    * sampled token. KL(pₛ‖p_c) = Σ_t pₛ(t)·ln(pₛ(t)/p_c(t)) — finite
    * by construction since every source term is a corpus term.
    *
    * Shape: ONE (source, term) aggregate feeds everything (corpus
    * counts derive from it by a second, vocab-sized aggregate); the
    * join back is vocabulary-sized. Per-source sum folded in sorted
    * term order for cross-engine bit-identity. */
  def q96SourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(toks(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cst"))
    val stot = st.groupBy(col("source")).agg(sum(col("cst")).as("ns"))
    val ct = st.groupBy(col("term")).agg(sum(col("cst")).as("ct"))
    val ctot = ct.agg(sum(col("ct")).as("nc"))
    val ps = col("cst").cast("double") / col("ns")
    val pc = col("ct").cast("double") / col("nc")
    st.join(ct, "term")
      .join(stot, "source")
      .crossJoin(broadcast(ctot))
      .select(col("source"), col("ns"),
        struct(col("term"), (ps * log(ps / pc)).as("part")).as("p"))
      .groupBy(col("source"))
      .agg(min(col("ns")).as("n_tokens"), count(lit(1)).as("n_terms"),
        round(aggregate(sort_array(collect_list(col("p"))), lit(0.0),
          (acc, x) => acc + x.getField("part")) + 1e-9, 6).as("kl"))
      .orderBy(col("source"))
  }

  val q96Sql: String =
    """WITH st AS (SELECT source, term, count(*) AS cst
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |stot AS (SELECT source, sum(cst)::BIGINT AS ns FROM st GROUP BY 1),
      |ct AS (SELECT term, sum(cst)::BIGINT AS ct FROM st GROUP BY 1),
      |ctot AS (SELECT sum(ct)::BIGINT AS nc FROM ct),
      |parts AS (SELECT st.source, stot.ns,
      |    {'term': st.term,
      |     'part': (st.cst::DOUBLE / stot.ns)
      |       * ln((st.cst::DOUBLE / stot.ns) / (ct.ct::DOUBLE / ctot.nc))} AS p
      |  FROM st JOIN ct USING (term) JOIN stot USING (source) CROSS JOIN ctot)
      |SELECT source, min(ns)::BIGINT AS n_tokens, count(*) AS n_terms,
      |  round(list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list(p)), x -> x.part)), (a, b) -> a + b)
      |    + 1e-9, 6) AS kl
      |FROM parts GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q100
  /** k-anonymity / l-diversity audit over quasi-identifiers — the
    * privacy-risk measurement that decides whether a table can be
    * released (or joined into training data) as-is: group by the
    * quasi-identifier columns (market segment × nation — the columns an
    * attacker can link from public data), and for each equivalence
    * class report its size (k), the diversity of the sensitive
    * attribute (distinct account-balance bands — l), and whether the
    * class is re-identifiable (size < `kThreshold`). A release is
    * k-anonymous iff no class is flagged; classes that are flagged are
    * the ones to suppress or generalize (the q89 pseudonymization
    * handles identifiers; THIS audits the quasi-identifiers that
    * pseudonyms don't touch).
    *
    * Scale shape: one hash aggregate over the table (partial+final, the
    * q01 shape) — the audit is a single scan at any corpus size, and
    * the output is bounded by the QI-domain product, not the row count.
    *
    * Determinism: pure integer arithmetic; the sensitive band uses
    * floor-before-integral-cast in both engines (Spark cast truncates
    * toward zero, DuckDB ::BIGINT rounds — floor removes the
    * difference; the q88/q76 lesson). */
  private val kThreshold = 10

  def q100KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal") / 1000.0).cast("long")
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"), band.as("band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("band")).as("l_div"))
      .select(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"),
        col("k"), col("l_div"),
        when(col("k") < kThreshold, lit(1)).otherwise(lit(0)).as("at_risk"))
      .orderBy(col("segment"), col("nation"))
  }

  val q100Sql: String =
    s"""SELECT c_mktsegment AS segment, c_nationkey AS nation,
       |  count(*) AS k,
       |  count(DISTINCT floor(c_acctbal / 1000.0)::BIGINT) AS l_div,
       |  (CASE WHEN count(*) < $kThreshold THEN 1 ELSE 0 END)::INT AS at_risk
       |FROM customer
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q101
  /** TF-IDF document-to-document sparse retrieval: for each query
    * document, the top-5 most similar corpus documents by TF-IDF
    * cosine — the fuzzy complement of q60's exact n-gram
    * decontamination (an eval document rephrased enough to dodge exact
    * 8-gram matching still surfaces here) and the sparse-vector sibling
    * of q30's dense kNN.
    *
    * Scale shape: this is an inverted-index join, not all-pairs — the
    * ONE (doc, term) aggregate the norms already need doubles as the
    * index, and the score join is a broadcast hash join against the
    * query-side weights (bounded by queries × vocabulary), so only
    * postings for query terms ever produce score rows; norm joins stay
    * AQE-chosen (corpus-sized — never hint-forced).
    *
    * The stop-term DF-cap prune is ON: terms with df > `dfCapRatio` ×
    * n_docs are dropped from the index BEFORE weights, norms, and the
    * score join — the standard stopword cut, enforced (not argued) and
    * mirrored exactly in the oracle. Near-ubiquitous terms carry
    * ln(N/df) ≈ 0 weight yet generate the densest postings, so the cut
    * removes most score rows while barely moving cosines: measured at
    * sf0.1, score rows drop 931k → 403k (-57%). Parity note: both
    * engines compare the same exact-integer df against the same IEEE
    * double cap, so the cut is identical on both sides at any setting.
    *
    * Determinism: weights are tf·ln(N/df) over exact integers (one ln,
    * bit-identical); per-doc norms and per-pair dot products fold in
    * SORTED term order (the q65/q78/q96 discipline); cosines rounded to
    * 6 with (sim DESC, doc_id) tie-breaks. */
  /** The CORPUS-SPECIFIC cap the oracle-gated q101 entry passes
    * explicitly: this synthetic corpus plants 30 stop-terms in a
    * razor-thin df ≈ 0.77·N band (+ 1 rare term), and 0.772 sits inside
    * that band to keep roughly half the vocabulary. It is deliberately
    * NOT the API default — any df drift would discontinuously flip half
    * this corpus's vocabulary in or out of the index (round-6 ADVICE),
    * which is a property of the planted corpus, not of the operator. */
  private[graft] val tfidfDfCapRatio = 0.772

  /** The general-purpose default: natural-language corpora put
    * stopwords at df ≳ 0.5·N and content terms far below, so 0.5 has
    * margin on both sides of the cut for real df distributions. */
  private[graft] val tfidfDfCapDefault = 0.5

  /** Query-side size of the gate entry: the 10 lowest doc_ids. The
    * 4-arg form exposes it (`nQueries`) so scale sweeps can measure
    * score-join growth with query count, not just index build. */
  private[graft] val tfidfNQueries = 10

  /** General API: defaults to [[tfidfDfCapDefault]] — the margin-bearing
    * cap. The oracle-gated `q101_tfidf_retrieval` entry does NOT route
    * through this default; it passes the corpus-specific
    * [[tfidfDfCapRatio]] explicitly at its registration (the round-6
    * ADVICE contract: corpus constants live at call sites). */
  def q101TfidfRetrieval(spark: SparkSession, dir: String): DataFrame =
    q101TfidfRetrieval(spark, dir, tfidfDfCapDefault, tfidfNQueries)

  def q101TfidfRetrieval(spark: SparkSession, dir: String,
                         dfCapRatio: Double): DataFrame =
    q101TfidfRetrieval(spark, dir, dfCapRatio, tfidfNQueries)

  def q101TfidfRetrieval(spark: SparkSession, dir: String,
                         dfCapRatio: Double, nQueries: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksDf = tokenizedDocs(spark, dir)
    val dtf = docTermFreq(toksDf)
    val dfs = dtf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nd = toksDf.agg(count(lit(1)).as("n_docs"))
    // materialize the weighted index ONCE — norms, query weights, and
    // the score join are three consumers with no common-subplan reuse
    // otherwise. This IS the inverted-index build: a production
    // deployment writes this frame as the index table, term-bucketed.
    // (sf0.1 cost is dominated by the ~1.5M score rows the planted
    // 31-term vocabulary forces — every doc shares every term with
    // every query; real corpora are sparse here, and the df-cap prune
    // documented above restores sparsity when vocabulary grows)
    val w = dtf
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(nd))
      .filter(col("df") <= lit(dfCapRatio) * col("n_docs")) // stop-term prune
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("w"))
      .localCheckpoint(true)
    val nrm = w
      .groupBy(col("doc_id"))
      .agg(sqrt(aggregate(sort_array(collect_list(struct(col("term"),
        (col("w") * col("w")).as("part")))), lit(0.0),
        (acc, x) => acc + x.getField("part"))).as("nrm"))
    val qw = w.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_doc"), col("term"), col("w").as("qw"))
    val sims = w.join(broadcast(qw), "term")
      .filter(col("doc_id") =!= col("q_doc"))
      .select(col("q_doc"), col("doc_id"),
        struct(col("term"), (col("w") * col("qw")).as("part")).as("p"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(aggregate(sort_array(collect_list(col("p"))), lit(0.0),
        (acc, x) => acc + x.getField("part")).as("s"))
      .join(nrm.select(col("doc_id").as("q_doc"), col("nrm").as("qnrm")), "q_doc")
      .join(nrm, "doc_id")
      .select(col("q_doc"), col("doc_id"),
        round(col("s") / (col("qnrm") * col("nrm")) + 1e-9, 6).as("sim"))
    val rkw = Window.partitionBy(col("q_doc")).orderBy(col("sim").desc, col("doc_id"))
    sims.withColumn("rk", row_number().over(rkw))
      .filter(col("rk") <= 5)
      .orderBy(col("q_doc"), col("rk"))
  }

  val q101Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |dtf AS (SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(tk) AS term FROM tk) GROUP BY 1, 2),
      |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM dtf GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM tk),
      |w AS (SELECT doc_id, term, dtf.tf * ln(nd.n_docs::DOUBLE / dfs.df) AS w
      |  FROM dtf JOIN dfs USING (term) CROSS JOIN nd
      |  WHERE dfs.df <= $tfidfDfCapRatio * nd.n_docs),
      |nrm AS (SELECT doc_id,
      |    sqrt(list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list({'term': term, 'part': w * w})),
      |        x -> x.part)), (a, b) -> a + b)) AS nrm
      |  FROM w GROUP BY doc_id),
      |qw AS (SELECT doc_id AS q_doc, term, w AS qw FROM w WHERE doc_id < 10),
      |s AS (SELECT qw.q_doc, w.doc_id,
      |    list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list({'term': w.term, 'part': w.w * qw.qw})),
      |        x -> x.part)), (a, b) -> a + b) AS s
      |  FROM w JOIN qw USING (term) WHERE w.doc_id <> qw.q_doc
      |  GROUP BY 1, 2),
      |sim AS (SELECT s.q_doc, s.doc_id,
      |    round(s.s / (a.nrm * b.nrm) + 1e-9, 6) AS sim
      |  FROM s JOIN nrm a ON s.q_doc = a.doc_id JOIN nrm b ON s.doc_id = b.doc_id),
      |rk AS (SELECT q_doc, doc_id, sim,
      |    row_number() OVER (PARTITION BY q_doc ORDER BY sim DESC, doc_id) AS rk
      |  FROM sim)
      |SELECT q_doc, doc_id, sim, rk FROM rk WHERE rk <= 5
      |ORDER BY q_doc, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_token_stats"   -> q21TokenStats _,
    "q22_quality_score" -> q22QualityScore _,
    "q23_lang_id"       -> q23LangId _,
    "q24_fingerprint"   -> q24Fingerprint _,
    "q47_repetition"    -> q47Repetition _,
    "q58_token_commonness" -> q58TokenCommonness _,
    "q65_bm25"          -> q65Bm25 _,
    "q78_perplexity"    -> q78Perplexity _,
    "q89_pseudonymize"  -> q89Pseudonymize _,
    "q95_bigram_lm"     -> q95BigramLm _,
    "q96_source_divergence" -> q96SourceDivergence _,
    "q100_k_anonymity"  -> q100KAnonymity _,
    // the gate passes the corpus-specific cap EXPLICITLY — the plain
    // 2-arg API defaults to the general margin-bearing cap instead
    "q101_tfidf_retrieval" -> ((s: SparkSession, d: String) =>
      q101TfidfRetrieval(s, d, tfidfDfCapRatio, tfidfNQueries)),
    "q117_filter_chain" -> q117FilterChain _,
  )

  val oracle: Map[String, String] = Map(
    "q21_token_stats"   -> q21Sql,
    "q22_quality_score" -> q22Sql,
    "q23_lang_id"       -> q23Sql,
    "q24_fingerprint"   -> q24Sql,
    "q47_repetition"    -> q47Sql,
    "q58_token_commonness" -> q58Sql,
    "q65_bm25"          -> q65Sql,
    "q78_perplexity"    -> q78Sql,
    "q89_pseudonymize"  -> q89Sql,
    "q95_bigram_lm"     -> q95Sql,
    "q96_source_divergence" -> q96Sql,
    "q100_k_anonymity"  -> q100Sql,
    "q101_tfidf_retrieval" -> q101Sql,
    "q117_filter_chain" -> q117Sql,
  )
}
