package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  // ---------------------------------------------------------------- q60
  private val ngramN = 8
  private val commonGramBar = 10

  /** Distinct 8-gram hashes of a document — the standard contamination
    * fingerprint granularity (long enough that sharing one is evidence of
    * copying, not vocabulary). One native pass
    * ([[graft.expressions.Ngram8Hashes]]): only 64-bit longs survive the
    * projection, never n-gram strings (q60 measured 2.9 s with the HOF
    * reference below vs 1.3 s native at sf0.1 — per-gram string assembly
    * + interpreted lambda dispatch was most of the cost). */
  private def ngramHashes(text: Column): Column =
    call_function("graft_ngram8", split(text, " "))

  /** Built-in-composed reference for [[ngramHashes]], kept so the spec
    * can assert the native form computes the identical hash set. */
  private[graft] def ngramHashesReference(text: Column): Column = {
    val t = split(text, " ")
    when(size(t) >= ngramN,
      array_distinct(transform(sequence(lit(1), size(t) - (ngramN - 1)), i =>
        h60(concat_ws(" ", slice(t, i, lit(ngramN)))))))
      .otherwise(array().cast("array<bigint>"))
  }

  private def ngramHashesSql(tk: String): String =
    s"""list_distinct(list_transform(range(1, greatest(len($tk) - ${ngramN - 2}, 1)),
       | i -> ${h60Sql(s"array_to_string(list_slice($tk, i, i + ${ngramN - 1}), ' ')")}))"""
      .stripMargin.replace("\n", "")

  /** Train→test contamination report: test-split documents sharing at
    * least one 8-gram with a train-split document, with how many train
    * docs and how many distinct 8-grams leak. The eval-set hygiene check
    * every training corpus ships with — built on the SAME deterministic
    * split hashes as q54, so it audits exactly the split a trainer would
    * materialize.
    *
    * Scale shape: (doc, gram-hash) pairs shuffle-join on the hash —
    * pure hash-partitioned equi-join, linear in corpus grams. Grams seen
    * in more than [[commonGramBar]] train docs are dropped first
    * (boilerplate exemption): that is both standard decontamination
    * practice and the skew guard — a viral n-gram would otherwise form a
    * hot join key whose bucket goes quadratic at 100 TB. */
  def q60Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val grams = d.select(col("doc_id"),
        sampleBucket(col("doc_id")).as("sb"),
        splitBucket(col("doc_id")).as("pb"),
        rateCol(col("source")).as("rate"),
        ngramHashes(col("text")).as("gs"))
      .filter(col("sb") < col("rate"))
      // the val split (pb = 8) can never contribute to either collect_set
      // below — drop it BEFORE the explode so its grams never shuffle
      .filter(col("pb") =!= 8)
      .select(col("doc_id"), col("pb"), explode(col("gs")).as("g"))
    // ONE gram-hash pass and ONE shuffle on g: both splits' doc sets are
    // collected in the same aggregate (collect_set skips the other
    // split's nulls), and the boilerplate bar is applied right there —
    // before any pair is materialized, so a viral n-gram costs one
    // dropped group, never a quadratic bucket. An earlier form derived
    // train/test/common as three filters of the gram frame, which re-ran
    // the md5 pipeline per use and serialized behind a broadcast build
    // of the common-gram set: 5.2 s vs 1.9 s at sf0.1. Kept grams carry
    // ≤ commonGramBar train docs, so the downstream explode is bounded.
    val byGram = grams.groupBy(col("g")).agg(
        array_sort(collect_set(when(col("pb") < 8, col("doc_id")))).as("train_docs"),
        array_sort(collect_set(when(col("pb") === 9, col("doc_id")))).as("test_docs"))
      .filter(size(col("train_docs")) > 0 &&
        size(col("train_docs")) <= commonGramBar &&
        size(col("test_docs")) > 0)
    byGram.select(col("g"), explode(col("test_docs")).as("doc_id"), col("train_docs"))
      .select(col("g"), col("doc_id"), explode(col("train_docs")).as("t_doc"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("t_doc")).as("n_train_docs"),
        countDistinct(col("g")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  val q60Sql: String =
    s"""WITH b AS (SELECT doc_id,
       |    ${h60Sql("'smp:'||doc_id")} % 100 AS sb,
       |    ${h60Sql("'spl:'||doc_id")} % 10 AS pb,
       |    $rateSqlCase AS rate,
       |    string_split(text, ' ') AS tk
       |  FROM documents),
       |g AS (SELECT doc_id, pb, unnest(${ngramHashesSql("tk")}) AS g
       |  FROM b WHERE sb < rate),
       |tr AS (SELECT doc_id AS t_doc, g FROM g WHERE pb < 8),
       |te AS (SELECT doc_id, g FROM g WHERE pb = 9),
       |common AS (SELECT g FROM tr GROUP BY g
       |  HAVING count(DISTINCT t_doc) > $commonGramBar),
       |trf AS (SELECT t_doc, g FROM tr
       |  WHERE NOT EXISTS (SELECT 1 FROM common c WHERE c.g = tr.g))
       |SELECT te.doc_id,
       |  count(DISTINCT trf.t_doc) AS n_train_docs,
       |  count(DISTINCT te.g) AS n_shared_grams
       |FROM te JOIN trf ON te.g = trf.g
       |GROUP BY te.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q63
  private val samplePerGroup = 5

  /** Deterministic fixed-size per-group sample: top-[[samplePerGroup]]
    * docs per source by an independent hash order — the count-based
    * complement to q54's rate-based sampling (inspection samples, eval
    * slices, "show me 5 docs per domain"). One shuffle on source; the
    * rank window never materializes more than the group. At 100 TB the
    * same expression runs as a per-partition top-k before the shuffle
    * (WindowGroupLimit pushes rk <= k below the exchange). */
  def q63GroupSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    d.select(col("doc_id"), col("source"),
        h60(concat(lit("s3:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= samplePerGroup)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  val q63Sql: String =
    s"""WITH h AS (SELECT doc_id, source,
       |    ${h60Sql("'s3:'||doc_id")} AS hk
       |  FROM documents),
       |r AS (SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
       |  FROM h)
       |SELECT source, rk, doc_id FROM r
       |WHERE rk <= $samplePerGroup
       |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Token budget for the mixture plan (a config constant: what the
    * trainer will consume). */
  private val tokenBudget = 10000000L
  private val sumRates: Long = mixRates.map(_._2.toLong).sum

  /** Per-source allocation under [[tokenBudget]], precomputed from the
    * shared mixture weights: exact integer division, emitted identically
    * into both engines. */
  private val allocFor: Map[String, Long] =
    mixRates.map { case (s, r) => s -> (tokenBudget * r) / sumRates }.toMap

  private def allocCol(source: Column): Column =
    coalesce(element_at(
      map(allocFor.toSeq.sortBy(_._1).flatMap { case (s, a) => Seq(lit(s), lit(a)) }: _*),
      source), lit(0L))

  private val allocSqlCase: String =
    "CASE source " +
      allocFor.toSeq.sortBy(_._1).map { case (s, a) => s"WHEN '$s' THEN ${a}::BIGINT" }
        .mkString(" ") + " ELSE 0::BIGINT END"

  /** Mixture execution plan: given the weights and a token budget, how
    * many tokens each source contributes and how many passes (epochs,
    * ×100) over the source that implies — the repeat-factor audit a
    * data-mixing run is driven by. Everything is exact integer
    * arithmetic: one aggregate over the corpus, constants broadcast in
    * the projection; at 100 TB this is a metadata query over per-source
    * token counts. */
  def q64MixPlan(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        rateCol(col("source")).as("weight"),
        allocCol(col("source")).as("alloc_tokens"))
      .withColumn("epochs_x100",
        expr("(alloc_tokens * 100) div total_tokens"))
      .orderBy(col("source"))
  }

  val q64Sql: String =
    s"""WITH t AS (SELECT source, count(*) AS n_docs,
       |    sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
       |  FROM documents GROUP BY source)
       |SELECT source, n_docs, total_tokens,
       |  $rateSqlCase AS weight,
       |  $allocSqlCase AS alloc_tokens,
       |  (alloc_tokens * 100) // total_tokens AS epochs_x100
       |FROM t
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q72
  private[graft] val cdcModulus = 8L

  /** Content-defined chunking: a boundary falls after token i when the
    * rolling 3-gram hash ending at i is ≡ 0 mod [[cdcModulus]] (expected
    * chunk ≈ 8 tokens). Unlike q55's fixed windows, boundaries move WITH
    * the content — an insertion reshuffles only its own chunk, so chunk
    * hashes stay stable for dedup/caching (the storage-dedup property).
    * ENTIRELY map-side, like q55: chunk ids, start offsets, and the cut
    * chunks are all derived inside the row, and the explode emits
    * finished narrow chunk rows — no per-token shuffle, no reassembly
    * aggregate (an earlier explode+groupBy+collect_list form paid an
    * O(corpus-tokens) exchange just to rebuild what the row already
    * knew: 1.2 s vs 1.0 s at sf0.1, and the exchange would dominate at
    * corpus scale). The DuckDB oracle mirrors the
    * prefix with an O(n²) slice-sum — DuckDB 1.0's list_reduce
    * mis-evaluates struct accumulators, and oracle cost is irrelevant. */
  /** Per-token chunk ids — one native pass
    * ([[graft.expressions.CdcChunkIds]]: rolling hash + boundary count
    * together, no per-position interpreted md5 lambda or fold: 1.7 s HOF
    * vs 1.2 s native at sf0.1, before the map-side chunk cutting below
    * removed the reassembly shuffle as well). */
  private def cdcIds(tk: Column): Column =
    call_function("graft_cdc_ids", tk, lit(cdcModulus))

  /** Built-in-composed reference for [[cdcIds]] (flags, then an
    * exclusive-prefix-sum fold), kept for the native≡HOF parity spec. */
  private[graft] def cdcIdsReference(tk: Column): Column = {
    val flags = transform(sequence(lit(1), size(tk)), i =>
      when(i >= 3 &&
        pmod(h60(concat_ws(" ", get(tk, i - 3), get(tk, i - 2), get(tk, i - 1))),
          lit(cdcModulus)) === 0L,
        lit(1)).otherwise(lit(0)))
    // size guard, not coalesce: element_at(empty, -1) THROWS in Spark 4
    // (INVALID_ARRAY_INDEX_IN_ELEMENT_AT) rather than returning null
    val incl = aggregate(flags, array().cast("array<int>"),
      (acc, f) => concat(acc,
        array(when(size(acc) === 0, lit(0)).otherwise(element_at(acc, -1)) + f)))
    // chunk id = boundaries strictly before the token (exclusive prefix)
    transform(sequence(lit(1), size(tk)), i =>
      coalesce(get(incl, i - 2), lit(0)))
  }

  def q72CdcChunking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = split(col("text"), " ")
    val base = d.select(col("doc_id"), t.as("tk"))
    // staged selects: cids and starts are each multi-referenced —
    // CollapseProject must not re-inline their producers per reference
    val withIds = base.select(col("doc_id"), col("tk"), cdcIds(col("tk")).as("cids"))
    // 1-based start offset of every chunk: positions where the id changes
    val starts = filter(sequence(lit(1), size(col("tk"))), i =>
      i === 1 || get(col("cids"), i - 1) =!= get(col("cids"), i - 2))
    val withStarts = withIds.select(col("doc_id"), col("tk"), starts.as("st"))
    // cut the finished chunks in-row (q55's discipline), then explode
    withStarts.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("st"))), c => {
          val s0 = get(col("st"), c - 1)
          val len = coalesce(get(col("st"), c), size(col("tk")) + 1) - s0
          struct((c - 1).cast("int").as("chunk_id"),
            len.cast("long").as("n_tokens"),
            concat_ws(" ", slice(col("tk"), s0, len)).as("chunk"))
        })).as("r"))
      .select(col("doc_id"), col("r.chunk_id").as("chunk_id"),
        col("r.n_tokens").as("n_tokens"), col("r.chunk").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val q72Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |fl AS (SELECT doc_id, tk, list_transform(range(1, len(tk) + 1), i ->
       |    CASE WHEN i >= 3 AND ${h60Sql("tk[i-2]||' '||tk[i-1]||' '||tk[i]")} % $cdcModulus = 0
       |      THEN 1 ELSE 0 END) AS flags FROM tk),
       |cd AS (SELECT doc_id, tk, list_transform(range(1, len(tk) + 1),
       |    i -> coalesce(list_sum(list_slice(flags, 1, i - 1)), 0)::INT) AS cids FROM fl),
       |ex AS (SELECT doc_id, u.i AS pos, tk[u.i] AS tok, cids[u.i] AS cid
       |  FROM cd, UNNEST(range(1, len(tk) + 1)) AS u(i))
       |SELECT doc_id, cid AS chunk_id, count(*)::BIGINT AS n_tokens,
       |  array_to_string(list_transform(
       |    list_sort(list(struct_pack(pos := pos, tok := tok))), x -> x.tok), ' ') AS chunk
       |FROM ex
       |GROUP BY doc_id, cid
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- q70
  private val bpeRounds = 3

  /** Tokenizer training: the first [[bpeRounds]] BPE merges over the
    * corpus — per round, count adjacent symbol pairs weighted by word
    * frequency, pick the global best, merge it everywhere. This is the
    * real vocab-building step of a training pipeline in its distributed
    * shape: ONE corpus scan builds the word-frequency table (Zipf: the
    * vocab is tiny relative to the corpus — the classic corpus→vocab
    * reduction every BPE trainer does), each round is then a vocab-sized
    * aggregate, and only a single (pair, count) scalar comes back to the
    * driver per round — the merge table IS driver state, exactly as in
    * production trainers. Checkpoint-per-round keeps lineage flat (the
    * CC-loop discipline).
    *
    * Determinism: counts are exact integers; the best pair is the total
    * order (count desc, left asc, right asc); the merge fold is the same
    * left-to-right non-overlapping fold in both engines. */
  def q70BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, syms) = bpeTrain(spark, dir)
    Checkpoints.release(syms)
    merges.toDF("round", "left_sym", "right_sym", "pair_count")
      .orderBy(col("round"))
  }

  /** The q70 trainer factored to ALSO return its final state: the
    * vocab with each word's merged symbol list — which IS the trained
    * tokenizer q118 applies. Caller releases the returned checkpoint. */
  private def bpeTrain(spark: SparkSession,
      dir: String): (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    var syms = words
      .select(col("word"), col("f"), split(col("word"), "").as("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to bpeRounds if !exhausted) {
      // size > 1 guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]),
      // so a single-symbol word would emit spurious (sym, NULL) and
      // (NULL, sym) pairs — and Spark's ascending tie-break sorts NULLS
      // FIRST, so such a pair at max count would win the argmax while
      // DuckDB's range(1, 1) correctly yields nothing
      val bestOpt = syms.filter(size(col("sym")) > 1)
        .select(col("f"),
          explode(transform(sequence(lit(1), size(col("sym")) - 1),
            i => struct(get(col("sym"), i - 1).as("a"), get(col("sym"), i).as("b"))))
            .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect().headOption
      bestOpt match {
        case None =>
          // fully merged (or empty) corpus: no pairs left — stop cleanly
          exhausted = true
        case Some(best) =>
          val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
          merges += ((r, a, b, cnt))
          val merged = aggregate(col("sym"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x))))
          val prev = syms
          syms = syms.select(col("word"), col("f"), merged.as("sym"))
            .localCheckpoint(true)
          // round N−1's vocab checkpoint is dead once N is materialized
          Checkpoints.release(prev)
      }
    }
    (merges.result(), syms)
  }

  // --------------------------------------------------------------- q118
  /** Tokenizer APPLICATION — the other half of q70's story: encode the
    * corpus with the trained merges and report what the tokenizer buys.
    * The scale shape is the important part: merges are applied to the
    * VOCAB (Heaps-law-bounded — q70's final per-word symbol lists ARE
    * the trained tokenizer's encode table), and the corpus-sized side
    * only joins its (source, word) occurrence counts against that
    * table — encoding 100 TB never re-runs the merge fold per token
    * occurrence, it's one vocab join. Output per source: whitespace
    * tokens, character-level symbols (the no-tokenizer baseline), BPE
    * symbols after [[bpeRounds]] merges, and symbols saved — the
    * compression the trained merges bought, by source.
    *
    * Determinism: pure integer sums; the symbol lists come from the
    * same deterministic trainer the q70 oracle replays. */
  def q118BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, syms) = bpeTrain(spark, dir)
    val perSourceWord = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n"))
    // materialize the sources-sized aggregate so the trainer's vocab
    // checkpoint can be released NOW (q114's corrected discipline:
    // checkpoint the BOUNDED intermediate, never the final frame — the
    // projection below stays lazy and plan-visible to the audits)
    val agg = perSourceWord
      .join(syms.select(col("word"), size(split(col("word"), "")).as("n_raw"),
        size(col("sym")).as("n_bpe")), "word")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("n_raw")).as("n_symbols_raw"),
        sum(col("n") * col("n_bpe")).as("n_symbols_bpe"))
      .localCheckpoint(true)
    Checkpoints.release(syms)
    agg.select(col("source"), col("n_tokens"), col("n_symbols_raw"),
        col("n_symbols_bpe"),
        (col("n_symbols_raw") - col("n_symbols_bpe")).as("symbols_saved"))
      .orderBy(col("source"))
  }

  private def bpeRoundSqlCte(r: Int): String =
    s"""p$r AS (SELECT s.sym[i.i] AS a, s.sym[i.i + 1] AS b, sum(s.f)::BIGINT AS cnt
       |  FROM s${r - 1} s, UNNEST(range(1, len(s.sym))) AS i(i)
       |  GROUP BY 1, 2),
       |best$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |s$r AS (SELECT s.word, s.f,
       |    list_reduce(list_prepend([]::VARCHAR[], list_transform(s.sym, x -> [x])),
       |      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.a AND x[1] = b.b
       |        THEN list_append(list_slice(acc, 1, len(acc) - 1), b.a || b.b)
       |        ELSE list_append(acc, x[1]) END) AS sym
       |  FROM s${r - 1} s CROSS JOIN best$r b)""".stripMargin

  val q70Sql: String =
    s"""WITH w AS (SELECT word, count(*)::BIGINT AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY word),
       |s0 AS (SELECT word, f, string_split(word, '') AS sym FROM w),
       |${(1 to bpeRounds).map(bpeRoundSqlCte).mkString(",\n")}
       |SELECT * FROM (
       |${(1 to bpeRounds).map(r =>
          s"  SELECT $r AS round, a AS left_sym, b AS right_sym, cnt AS pair_count FROM best$r")
          .mkString("\n  UNION ALL\n")})
       |ORDER BY round""".stripMargin

  /** Oracle: replay q70's training CTEs to the final vocab s3, then the
    * same vocab join against per-(source, word) counts. */
  val q118Sql: String =
    s"""WITH w AS (SELECT word, count(*)::BIGINT AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY word),
       |s0 AS (SELECT word, f, string_split(word, '') AS sym FROM w),
       |${(1 to bpeRounds).map(bpeRoundSqlCte).mkString(",\n")},
       |c AS (SELECT source, word, count(*)::BIGINT AS n
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1, 2),
       |j AS (SELECT c.source, c.n,
       |    len(string_split(c.word, '')) AS n_raw, len(s.sym) AS n_bpe
       |  FROM c JOIN s$bpeRounds s ON c.word = s.word)
       |SELECT source,
       |  sum(n)::BIGINT AS n_tokens,
       |  sum(n * n_raw)::BIGINT AS n_symbols_raw,
       |  sum(n * n_bpe)::BIGINT AS n_symbols_bpe,
       |  (sum(n * n_raw) - sum(n * n_bpe))::BIGINT AS symbols_saved
       |FROM j
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Intra-corpus duplicated-substring coverage (the Lee et al.
    * "Deduplicating Training Data" §4 audit, at 8-gram granularity):
    * per document, what fraction of its distinct 8-grams also occur in
    * at least one OTHER document. Where q60 audits train→test leakage
    * between splits, this audits the corpus against itself — the metric
    * that decides whether substring-level dedup is worth running at
    * all, and the per-doc ranking of what it would remove.
    *
    * Shape: one native 8-gram-hash pass per doc
    * ([[ngramHashes]] — longs only, no gram strings), one (hash →
    * doc-count) aggregation over the exploded pairs, one equi-join
    * back, one per-doc count. All hash-partitioned equi-joins, linear
    * in corpus grams; docs shorter than 8 tokens surface with
    * n_grams = 0 via the left join rather than vanishing. */
  def q79DupgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val grams = d.select(col("doc_id"), explode(ngramHashes(col("text"))).as("h"))
    // hashes are distinct per doc, so count(*) per hash = containing docs
    val docCounts = grams.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val perDoc = grams.join(docCounts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
    d.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("n_dup").cast("double") / col("n_grams") + 1e-9, 6))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val q79Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (SELECT doc_id, unnest(${ngramHashesSql("tk")}) AS h
       |  FROM tk WHERE len(tk) >= $ngramN),
       |dc AS (SELECT h, count(*) AS nd FROM grams GROUP BY h),
       |pd AS (SELECT g.doc_id, count(*) AS n_grams,
       |    sum(CASE WHEN dc.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
       |  FROM grams g JOIN dc USING (h) GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |  coalesce(pd.n_grams, 0)::BIGINT AS n_grams,
       |  coalesce(pd.n_dup, 0)::BIGINT AS n_dup,
       |  CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 0.0
       |    ELSE round(pd.n_dup::DOUBLE / pd.n_grams + 1e-9, 6) END AS dup_frac
       |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q92
  private[graft] val packShards = 8
  private[graft] val packBin = 256 // context-window capacity in tokens

  /** Sequence-packing audit — the step between chunking (q55) and the
    * trainer: documents are concatenated into fixed-capacity context
    * windows ("bins"), and what a pipeline needs to know is how FULL
    * the bins run and how many documents get SPLIT across a window
    * boundary (a split document loses cross-boundary attention — the
    * packing-efficiency/quality tradeoff every pretraining run tunes).
    *
    * Packing is inherently sequential, so the scale design shards
    * first: docs hash to `packShards` independent streams (one per
    * worker at 100 TB), each stream packs greedily in deterministic
    * doc_id order via ONE exclusive-cumsum window per shard — the only
    * shuffle. A doc's bin is its start offset div capacity; a doc
    * crosses a boundary iff its first and last token land in different
    * bins. Output: per shard, docs/tokens/bins, boundary crossings,
    * and the mean fill of the shard's bins — all exact integers plus
    * one audited ratio, so parity is unconditional. */
  def q92SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(h60(concat(lit("pk:"), col("doc_id").cast("string"))), lit(packShards.toLong))
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = d
      .withColumn("cum0", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("shard"), col("n"),
        expr(s"cum0 div $packBin").as("bin0"),
        expr(s"(cum0 + n - 1) div $packBin").as("bin1"))
    placed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        (max(col("bin1")) + 1).as("n_bins"),
        sum(when(col("bin0") =!= col("bin1"), 1L).otherwise(0L)).as("n_split_docs"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_bins"),
        col("n_split_docs"),
        round(col("n_tokens").cast("double") / (col("n_bins") * packBin) + 1e-9, 6)
          .as("fill_ratio"))
      .orderBy(col("shard"))
  }

  val q92Sql: String =
    s"""WITH d AS (SELECT doc_id,
       |    ${h60Sql("'pk:'||doc_id")} % $packShards AS shard,
       |    len(string_split(text, ' '))::BIGINT AS n
       |  FROM documents),
       |p AS (SELECT shard, n,
       |    coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
       |  FROM d),
       |b AS (SELECT shard, n,
       |    cum0 // $packBin AS bin0, (cum0 + n - 1) // $packBin AS bin1
       |  FROM p)
       |SELECT shard, count(*) AS n_docs, sum(n)::BIGINT AS n_tokens,
       |  (max(bin1) + 1)::BIGINT AS n_bins,
       |  sum(CASE WHEN bin0 <> bin1 THEN 1 ELSE 0 END)::BIGINT AS n_split_docs,
       |  round(sum(n)::DOUBLE / ((max(bin1) + 1) * $packBin) + 1e-9, 6) AS fill_ratio
       |FROM b GROUP BY shard ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------- q94
  private val wsampleK = 25

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each doc draws a reproducible uniform
    * u = (h60("ws:"||doc_id) + 1) / 2⁶⁰ ∈ (0, 1] and the top-k docs by
    * key = ln(u)/w (w = token count) are exactly a weight-proportional
    * sample without replacement — longer documents proportionally more
    * likely, yet every decision is a pure function of the row key (no
    * rand(): retries, repartitions, and the oracle all agree). This is
    * the importance-sampling primitive behind mixture reweighting when
    * the unit is tokens rather than documents (q54 samples per-DOC).
    *
    * Scale shape: keys are map-side; the only reduction is the global
    * top-k, which Spark plans as TakeOrderedAndProject (per-partition
    * heaps, no full sort, no shuffle of non-winners). Determinism
    * rests on IDENTICAL ROUNDING, not exactness: h+1 can exceed
    * double's 53-bit mantissa, so the bigint→double cast rounds — but
    * both engines (and the spec's MessageDigest recompute) perform the
    * same correctly-rounded cast, power-of-two division, ln(), and
    * divide, so the ranking compares bit-identical doubles. A
    * higher-precision recompute would legitimately disagree. */
  def q94WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val two60 = math.pow(2.0, 60) // exact: power of two
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        ((h60(concat(lit("ws:"), col("doc_id").cast("string"))) + 1L).cast("double")
          / two60).as("u"))
    val keyed = d.select(col("doc_id"), col("source"), col("n_tokens"),
      (log(col("u")) / col("n_tokens")).as("wkey"))
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    // heaps, non-winners never shuffle), THEN rank the k survivors — a
    // global row_number window over the full corpus would drag every row
    // into one partition
    val top = keyed.orderBy(col("wkey").desc, col("doc_id")).limit(wsampleK)
    top
      .withColumn("rk",
        row_number().over(Window.orderBy(col("wkey").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("source"), col("n_tokens"),
        round(col("wkey") + 1e-12, 9).as("wkey"))
      .orderBy(col("rk"))
  }

  val q94Sql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    len(string_split(text, ' '))::BIGINT AS n_tokens,
       |    (${h60Sql("'ws:'||doc_id")} + 1)::DOUBLE / ${math.pow(2.0, 60)} AS u
       |  FROM documents),
       |k AS (SELECT doc_id, source, n_tokens, ln(u) / n_tokens AS wkey FROM d),
       |r AS (SELECT *, row_number() OVER (ORDER BY wkey DESC, doc_id) AS rk FROM k)
       |SELECT rk, doc_id, source, n_tokens,
       |  round(wkey + 1e-12, 9) AS wkey
       |FROM r WHERE rk <= $wsampleK ORDER BY rk""".stripMargin

  // --------------------------------------------------------------- q107
  /** Batch twin of the streaming rolling feature window
    * ([[graft.streaming.Tws.featureWindowTws]]): per-user features over
    * the user's LAST 10 events — count, mean, min, max, latest event
    * time. The feature-backfill job every online feature store pairs
    * with its serving path: stream keeps features fresh, this query
    * (re)computes them over the lake, and StreamingSpec pins that the
    * two agree on identical input.
    *
    * Shape: per-group top-k via row_number over (user_id / ts desc) —
    * Spark plans the rank filter as WindowGroupLimit (per-partition
    * heaps, non-qualifying events never leave their partition), then
    * one partial+final aggregate. One shuffle on user_id total, reused
    * by window AND aggregate.
    *
    * Determinism: mean folds the kept events' values in sorted
    * (ts, event_id) order (the q65/q78/q101 discipline), rounded to 6;
    * min/max/count/latest are exact. event_id breaks ts ties (none in
    * this corpus; the discipline costs nothing). The `+ 1e-9` before
    * round(…, 6) is the codebase-wide half-way nudge (q61/q102/q103 …):
    * Spark rounds doubles HALF_UP while DuckDB rounds half-even, so a
    * quotient landing exactly on a 5×10⁻⁷ boundary would round apart;
    * the nudge moves both engines off the boundary in the same
    * direction. It biases the 6th decimal by at most 1e-9 and is
    * mirrored in the oracle — remove it from BOTH sides or neither. */
  def q107FeatureWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        round(aggregate(
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("value").as("v")))),
            lit(0.0), (a, x) => a + x.getField("v")) / count(lit(1)) + 1e-9, 6)
          .as("mean_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        max(col("ts")).as("latest_ts"))
      .orderBy(col("user_id"))
  }

  val q107Sql: String =
    """WITH rk AS (SELECT user_id, event_id, value, ts,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT user_id, count(*) AS n,
      |  round(list_reduce(list_prepend(0.0,
      |      list_transform(list_sort(list({'ts': ts, 'event_id': event_id,
      |        'v': value})), x -> x.v)), (a, b) -> a + b)
      |    / count(*) + 1e-9, 6) AS mean_v,
      |  min(value) AS min_v, max(value) AS max_v, max(ts) AS latest_ts
      |FROM rk WHERE rk <= 10
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_feature_window"   -> q107FeatureWindow _,
    "q54_stratified_sample" -> q54StratifiedSample _,
    "q55_chunking"          -> q55Chunking _,
    "q60_decontaminate"     -> q60Decontaminate _,
    "q63_group_sample"      -> q63GroupSample _,
    "q64_mix_plan"          -> q64MixPlan _,
    "q70_bpe_merges"        -> q70BpeMerges _,
    "q118_bpe_encode"       -> q118BpeEncode _,
    "q72_cdc_chunking"      -> q72CdcChunking _,
    "q79_dupgram_coverage"  -> q79DupgramCoverage _,
    "q92_sequence_pack"     -> q92SequencePack _,
    "q94_weighted_sample"   -> q94WeightedSample _,
  )

  val oracle: Map[String, String] = Map(
    "q107_feature_window"   -> q107Sql,
    "q54_stratified_sample" -> q54Sql,
    "q55_chunking"          -> q55Sql,
    "q60_decontaminate"     -> q60Sql,
    "q63_group_sample"      -> q63Sql,
    "q64_mix_plan"          -> q64Sql,
    "q70_bpe_merges"        -> q70Sql,
    "q118_bpe_encode"       -> q118Sql,
    "q72_cdc_chunking"      -> q72Sql,
    "q79_dupgram_coverage"  -> q79Sql,
    "q92_sequence_pack"     -> q92Sql,
    "q94_weighted_sample"   -> q94Sql,
  )
}
