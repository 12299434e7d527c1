package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text.{h60, h60Sql}
import graft.sources.Tables
import Checkpoints.MaterializeOps

/** Deduplication surface over `documents` (BASELINE.json extension):
  * exact hash-dedup, MinHash+LSH near-dup candidate generation, exact
  * n-gram Jaccard verification, and SimHash signatures + banded
  * Hamming-distance near-dup pairs.
  *
  * Scale shape (100 TB): signatures are computed purely map-side with
  * higher-order array functions (no explode, no UDFs — one codegen'd
  * projection over the corpus). The only shuffles are (a) the LSH band
  * self-join, which groups by band key exactly like a production
  * shingle→minhash→band→bucket-join pipeline, and (b) final distincts.
  * Band-key skew (an empty-band degenerate bucket) is the classic failure
  * mode; AQE skew-join handles moderate skew and band keys include the
  * band index so buckets stay narrow.
  *
  * Cross-engine determinism: all hashing is the md5-derived 60-bit H from
  * [[graft.functions.Text]], reduced mod 2^31-1; permutations are
  * h_i(x) = (a_i·x + b_i) mod 2^31-1 with the SAME Scala constants
  * generating both the Spark plan and the DuckDB oracle SQL.
  */
object Dedup {

  /** Mersenne prime 2^31-1: keeps a_i·x within a signed 64-bit long.
    * Shared with the native expression ([[graft.expressions.GraftHash]])
    * and emitted into the DuckDB mirror — single source of truth. */
  private val P31 = graft.expressions.GraftHash.MinHashP31

  /** MinHash permutation constants (8 perms, 4 bands × 2 rows). */
  private val perms: Seq[(Long, Long)] =
    graft.expressions.GraftHash.minhashPerms.toSeq

  private val nBands = 4
  private val rowsPerBand = 2

  // ------------------------------------------------------------ shingles
  /** 3-gram token shingles (overlapping, order-preserving). */
  private def shingles(text: Column): Column = {
    val t = split(text, " ")
    transform(sequence(lit(1), size(t) - 2), i => concat_ws(" ", slice(t, i, lit(3))))
  }

  private def shinglesSql(text: String): String =
    s"""list_transform(range(1, len(string_split($text,' ')) - 1),
       | i -> array_to_string(list_slice(string_split($text,' '), i, i+2), ' '))"""
      .stripMargin.replace("\n", "")

  // ---------------------------------------------------------------- q25
  /** Exact dedup via hash-groupBy: per source, total docs vs distinct
    * full-text hashes vs distinct 5-token-prefix hashes (normalized key).
    * At scale this is THE dedup primitive: group on a 128-bit content hash,
    * keep min(doc_id) — here surfaced as distinct counts. */
  def q25ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = split(col("text"), " ")
    d.select(col("source"), md5(col("text")).as("h_full"),
        md5(concat_ws(" ", slice(t, 1, 5))).as("h_prefix"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h_full")).as("n_unique"),
        countDistinct(col("h_prefix")).as("n_unique_prefix5"))
      .orderBy(col("source"))
  }

  val q25Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_unique,
      |  count(DISTINCT md5(array_to_string(list_slice(string_split(text,' '),1,5),' '))) AS n_unique_prefix5
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Staged HOF reference for the native signature expression — the
    * round-1 shape (shingle hashes in one Project, 8 affine mins over
    * that attribute; staging measured 25 s → ~3 s at sf0.1). Kept only
    * so TextDedupSpec can assert `graft_minhash_sig` equality. */
  private[graft] def minhashSigReference(text: Column): Column = {
    val hs = transform(shingles(text), s => h60(s) % P31)
    array(perms.map { case (a, b) =>
      array_min(transform(hs, h => (lit(a) * h + lit(b)) % P31))
    }: _*)
  }

  /** doc_id + exploded band keys "bandIdx:h1:h2".
    *
    * The signature is ONE native pass ([[graft.expressions.MinHashSig]]):
    * shingle bytes are assembled and h60'd and all 8 permutation minima
    * updated per shingle, with no shingle-string array or per-permutation
    * array materialization (the staged-HOF round-1 form above measured
    * 2.0 s at sf0.1; native is 0.8 s — and q27, which reruns the whole
    * candidate pipeline, drops 2.7 → 1.3 s). */
  private def bandedDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val sig = d.select(col("doc_id"),
      call_function("graft_minhash_sig", split(col("text"), " ")).as("sig"))
    // concat (null-propagating), NOT concat_ws (null-skipping): a <3-token
    // doc has all-null minima and must get a NULL band — which never
    // equi-joins, exactly like the oracle's '0:'||NULL — rather than a
    // degenerate "0:" bucket that would pair every short doc together
    sig.select(col("doc_id"), explode(array((0 until nBands).map { b =>
      concat((lit(b + ":"): Column) +: (0 until rowsPerBand).flatMap(r => Seq(
        (if (r == 0) lit("") else lit(":")): Column,
        element_at(col("sig"), b * rowsPerBand + r + 1).cast("string"))): _*)
    }: _*)).as("band"))
      .filter(col("band").isNotNull)
  }

  /** Candidate pairs from shared bands. Instead of a self-join (which
    * would evaluate the signature pipeline once per join side), group
    * doc_ids per band and explode each bucket's i<j pairs — signatures
    * are computed exactly once, and bucket sizes are tiny by construction
    * (that's what banding is for), so the pair explosion is bounded.
    * The one corpus that breaks the "buckets stay collision-sized"
    * premise is an exact-duplicate-heavy one (10⁶ byte-identical docs
    * share every band): at scale, run the q25 content-hash dedup FIRST —
    * near-dup detection is only meaningful over exact-distinct docs, and
    * it restores the bound here and in q29's banding. */
  private def bandPairs(spark: SparkSession, dir: String): DataFrame = {
    bandedDocs(spark, dir)
      .groupBy(col("band"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("ids")) - 1), i =>
          transform(sequence(i + 1, size(col("ids"))), j =>
            struct(element_at(col("ids"), i).as("doc_a"),
              element_at(col("ids"), j).as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
  }

  /** MinHash+LSH near-dup candidates: docs sharing any band. */
  def q26MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    bandPairs(spark, dir)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))

  /** Shared oracle CTE prefix: shingle hashes + signatures + bands. */
  private def bandsSqlCte: String = {
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(h, x -> ($a*x + $b) % $P31)) AS m$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")
      s"SELECT doc_id, '$b:' || ${parts.mkString(" || ':' || ")} AS band FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""hs AS (SELECT doc_id, list_transform(${shinglesSql("text")},
       |    s -> ${h60Sql("s")} % $P31) AS h FROM documents),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hs),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  val q26Sql: String =
    s"""WITH $bandsSqlCte
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Verified near-dup pairs: the LSH candidates that pass the exact
    * 3-gram Jaccard bar (≥ 0.5) — q27's body, shared with q56's
    * clustering. */
  private def verifiedPairs(spark: SparkSession, dir: String): DataFrame =
    candidateJaccard(spark, dir).filter(col("jaccard") >= 0.5)

  /** Every LSH candidate pair with its exact 3-gram Jaccard, UNFILTERED —
    * the verify step's raw material, shared by q27 (which applies the
    * ≥ 0.5 bar) and q71's estimator-calibration audit (which needs the
    * misses too). Candidates only — never all-pairs — so the cost is
    * proportional to collisions. */
  private def candidateJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // unsorted candidates — q26's output sort would just add a wasted
    // exchange under this join
    val cand = bandPairs(spark, dir).distinct()
    // Shingle sets are computed ONLY for docs that appear in a candidate
    // pair: the candidate ids (LSH collisions — tiny by construction)
    // broadcast into the corpus scan as a join filter, and the expensive
    // shingle+distinct projection sits ABOVE that join, so its cost is
    // ∝ collisions, not corpus size. (Earlier forms shingled the whole
    // corpus and either shuffled it per verify join, or — worse —
    // re-shingled it inside serialized broadcast builds: measured 3.0 s
    // and 6.2 s at sf0.1 vs 3.1 s for this shape, of which 2.0 s is the
    // shared LSH candidate pipeline itself.) The verify joins are then
    // tiny-⋈-tiny broadcasts; raw text never shuffles.
    val ids = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sets = d.join(broadcast(ids), "doc_id")
      .select(col("doc_id"), array_distinct(shingles(col("text"))).as("sh"))
    // both sides broadcast the SAME subtree (renames stay above the
    // exchange) so ReuseExchange collapses them into one corpus scan
    val bsets = broadcast(sets)
    val inter = size(array_intersect(col("x.sh"), col("y.sh")))
    cand
      .join(bsets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(bsets.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(inter / (size(col("x.sh")) + size(col("y.sh")) - inter), 6).as("jaccard"))
  }

  def q27NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    verifiedPairs(spark, dir).orderBy(col("doc_a"), col("doc_b"))

  /** CTE chain ending in `j` (candidate pairs + exact jaccard) — shared
    * by the q27 verify and the q56 clustering oracles. */
  private def verifiedPairsSqlCtes: String =
    s"""$bandsSqlCte,
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
       |sets AS (SELECT doc_id, list_distinct(${shinglesSql("text")}) AS sh FROM documents),
       |j AS (SELECT c.doc_a, c.doc_b,
       |    round(len(list_distinct(list_intersect(a.sh, b.sh))) /
       |      (len(a.sh) + len(b.sh) - len(list_distinct(list_intersect(a.sh, b.sh)))), 6) AS jaccard
       |  FROM cand c
       |  JOIN sets a ON c.doc_a = a.doc_id
       |  JOIN sets b ON c.doc_b = b.doc_id)""".stripMargin

  val q27Sql: String =
    s"""WITH $verifiedPairsSqlCtes
       |SELECT doc_a, doc_b, jaccard FROM j
       |WHERE jaccard >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Estimator calibration: for every LSH candidate pair, the MinHash
    * ESTIMATE of Jaccard (fraction of agreeing signature components —
    * what the sketch promises) next to the exact n-gram Jaccard (what
    * q27 computes), with the absolute error. This is the audit that
    * justifies trusting sketches at 100 TB, where exact verification of
    * every pair is the expensive step you want to drop: if the estimate
    * tracks truth on the verified slice, the verify bar can move to the
    * estimate. Same candidates-only cost shape as q27; k/8 estimates are
    * exact doubles, so cross-engine hashing is safe with no rounding. */
  def q71MinhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // Materialize the candidate+jaccard frame ONCE (tiny — it's the LSH
    // collision set). Without this the whole band→verify pipeline is a
    // lazy subtree referenced by three separate consumers (the output
    // join plus the ids→sigs broadcast build, which ReuseExchange can't
    // collapse with the sets broadcast inside candidateJaccard), and the
    // shuffle-heavy candidate pipeline re-runs per consumer — measured
    // 10.3 s at sf0.1 vs ~2 s materialized.
    val cand = candidateJaccard(spark, dir).localCheckpoint(true)
    val ids = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sigs = d.join(broadcast(ids), "doc_id")
      .select(col("doc_id"),
        call_function("graft_minhash_sig", split(col("text"), " ")).as("sig"))
    val bsigs = broadcast(sigs)
    val nEq = size(filter(zip_with(col("x.sig"), col("y.sig"), (a, b) => a === b),
      x => x))
    cand
      .join(bsigs.as("x"), col("doc_a") === col("x.doc_id"))
      .join(bsigs.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (nEq.cast("double") / lit(perms.length.toDouble)).as("est_jaccard"))
      .withColumn("abs_err",
        round(abs(col("est_jaccard") - col("jaccard")) + 1e-9, 6))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q71Sql: String = {
    val eqSum = perms.indices
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $verifiedPairsSqlCtes,
       |est AS (SELECT j.doc_a, j.doc_b, j.jaccard,
       |    ($eqSum) / ${perms.length}.0 AS est_jaccard
       |  FROM j
       |  JOIN sig a ON j.doc_a = a.doc_id
       |  JOIN sig b ON j.doc_b = b.doc_id)
       |SELECT doc_a, doc_b, jaccard, est_jaccard,
       |  round(abs(est_jaccard - jaccard) + 1e-9, 6) AS abs_err
       |FROM est
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------- q110
  /** Corpus-to-corpus containment: for every ordered source pair
    * (source, vs_source), the fraction of `source`'s documents with a
    * VERIFIED near-dup (exact 3-gram Jaccard ≥ 0.5 on LSH candidates —
    * q27's bar) in `vs_source` — the "did my new crawl add anything the
    * old one doesn't have" measurement that decides whether a corpus
    * slice is worth keeping BEFORE paying to process it. Sources here
    * are the `documents.source` column; in production they are crawls,
    * snapshots, or vendor deliveries.
    *
    * Scale shape: entirely candidate-bounded — the band→bucket→verify
    * pipeline is q26/q27's (collisions only, never all-pairs), and this
    * operator adds two doc→source equi-joins on the VERIFIED pair set
    * (near-dup-count-sized, the smallest frame in the pipeline) plus a
    * (source, vs_source)-keyed aggregate bounded by the source-pair
    * domain. Per-source totals are one corpus aggregate. Nothing in the
    * addition grows faster than the verified pair count.
    *
    * Determinism: counts are exact integers; the ratio rounds once at
    * the output boundary with the codebase-wide half-way nudge. */
  def q110CorpusContainment(spark: SparkSession, dir: String): DataFrame = {
    val ds = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    // materialized once for the same reason as q71: the candidate
    // pipeline must not re-run per consumer
    val vp = verifiedPairs(spark, dir).localCheckpoint(true)
    val cross = vp
      .join(ds.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(ds.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .filter(col("src_a") =!= col("src_b"))
    // directed cover: each verified cross-source pair covers BOTH ends
    val covered = cross
      .select(col("src_b").as("source"), col("src_a").as("vs_source"),
        col("doc_b").as("doc"))
      .union(cross.select(col("src_a"), col("src_b"), col("doc_a")))
      .groupBy(col("source"), col("vs_source"))
      .agg(countDistinct(col("doc")).as("covered"))
    val totals = ds.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    covered.join(totals, "source")
      .select(col("source"), col("vs_source"), col("n_docs"), col("covered"),
        round(col("covered") / col("n_docs") + 1e-9, 6).as("containment"))
      .orderBy(col("source"), col("vs_source"))
  }

  val q110Sql: String =
    s"""WITH $verifiedPairsSqlCtes,
       |ds AS (SELECT doc_id, source FROM documents),
       |cp AS (SELECT j.doc_a, j.doc_b, a.source AS src_a, b.source AS src_b
       |  FROM j JOIN ds a ON j.doc_a = a.doc_id JOIN ds b ON j.doc_b = b.doc_id
       |  WHERE j.jaccard >= 0.5 AND a.source <> b.source),
       |cov AS (SELECT source, vs_source, count(DISTINCT doc) AS covered FROM (
       |    SELECT src_b AS source, src_a AS vs_source, doc_b AS doc FROM cp
       |    UNION ALL SELECT src_a, src_b, doc_a FROM cp) GROUP BY 1, 2),
       |tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT cov.source, cov.vs_source, tot.n_docs, cov.covered,
       |  round(cov.covered::DOUBLE / tot.n_docs + 1e-9, 6) AS containment
       |FROM cov JOIN tot ON cov.source = tot.source
       |ORDER BY cov.source, cov.vs_source""".stripMargin

  // ---------------------------------------------------------------- q28
  /** 64-bit signature: bits 0-31 from h60(token), bits 32-63 from a
    * salted h60(token || "#2") — h60 is only 60 bits wide, so a single
    * hash would leave the top bits constant; two independent hashes give
    * 64 real bits. 16-bit bands (4 × 65536 buckets) keep buckets narrow
    * at corpus scale: at 10⁹ docs a band bucket holds ~4·10³ docs, vs
    * ~10⁶ under the old 32-bit/8-bit-band scheme whose ≤1024 total
    * buckets went quadratic. Same pigeonhole guarantee (hamming ≤ 3 over
    * 4 bands → ≥ 1 exact band). */
  private val simBits = 64
  // banding constants are private[graft]: q119's payload near-dup
  // (Multimodal) bands its byte-shingle signatures with the SAME
  // geometry — one source of truth for the 4×16-bit scheme
  private[graft] val bandBits = 16
  private[graft] val nSimBands = simBits / bandBits
  private[graft] val bandMask = (1L << bandBits) - 1

  /** Per-bit weight 2^b as a signed-64 literal (bit 63 = Long.MinValue;
    * sums of distinct powers never carry, so bit-wise OR ≡ addition in
    * both engines — and DuckDB's checked BIGINT add never overflows
    * because ascending-order partials stay within [MIN, MAX]). */
  private def bitWeight(b: Int): Long = 1L << b

  /** 64-bit SimHash from two staged token-hash columns — bit b is set iff
    * the signed sum of tokens' bit-b contributions is > 0. Callers stage
    * the token-hash arrays first so md5 runs twice per token, not 64×.
    * Native one-pass expression ([[graft.expressions.SimHash64]]); the
    * HOF fold-per-bit form below is the spec-checked reference. */
  private def simhashFromHashes(hs1: Column, hs2: Column): Column =
    call_function("graft_simhash64", hs1, hs2)

  /** Reference implementation of [[simhashFromHashes]]: one interpreted
    * `aggregate` fold per signature bit. 64× more lambda dispatch than
    * the native expression — kept only so TextDedupSpec can assert the
    * native form computes the identical signature. */
  private[graft] def simhashReference(hs1: Column, hs2: Column): Column = {
    val bitSums = (0 until simBits).map { b =>
      val (hs, bit) = if (b < 32) (hs1, b) else (hs2, b - 32)
      aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, b) =>
      when(s > 0L, lit(bitWeight(b))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Token-hash stages for [[simhashReference]], exposed for the spec. */
  private[graft] def tokenHashCols(text: Column): (Column, Column) =
    (tokenHashes1(text), tokenHashes2(text))

  private def tokenHashes1(text: Column): Column =
    transform(split(text, " "), t => h60(t))
  private def tokenHashes2(text: Column): Column =
    transform(split(text, " "), t => h60(concat(t, lit("#2"))))

  /** Single-expression SimHash (tests / one-off use; prefer the staged
    * doc-frame path in queries). */
  def simhash(text: Column): Column =
    simhashFromHashes(tokenHashes1(text), tokenHashes2(text))

  /** doc_id + staged simhash signature for any (doc_id, text) frame —
    * batch or the per-batch slice of a stream. */
  private[graft] def simhashFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        tokenHashes1(col("text")).as("hs1"),
        tokenHashes2(col("text")).as("hs2"))
      .select(col("doc_id"), simhashFromHashes(col("hs1"), col("hs2")).as("sh"))

  /** doc_id + staged simhash signature. */
  private def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    simhashFrame(Tables.documents(spark, dir))

  private def simhashSql(text: String): String = {
    val hs1 = s"list_transform(string_split($text,' '), t -> ${h60Sql("t")})"
    val hs2 = s"list_transform(string_split($text,' '), t -> ${h60Sql("t || '#2'")})"
    val terms = (0 until simBits).map { b =>
      val (arr, bit) = if (b < 32) ("hh1", b) else ("hh2", b - 32)
      // bit weight emitted as the precomputed signed literal: DuckDB
      // rejects 1::BIGINT << 63 (checked shift), the constant is fine
      s"(CASE WHEN list_sum(list_transform($arr, h -> CASE WHEN (h >> $bit) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN (${bitWeight(b)})::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"(SELECT $terms FROM (SELECT $hs1 AS hh1, $hs2 AS hh2) _sh)"
  }

  /** SimHash signature per document. */
  def q28Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashDocs(spark, dir)
      .select(col("doc_id"), col("sh").as("simhash"))
      .orderBy(col("doc_id"))

  val q28Sql: String =
    s"""SELECT doc_id, ${simhashSql("text")} AS simhash
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q29
  /** SimHash near-dup pairs: band the 64-bit signature into 4 × 16-bit
    * halves-of-halves (pigeonhole: hamming<=3 pairs share >=1 exact
    * band), bucket-join on (band idx, band value), verify with
    * popcount(xor) <= 3. Same LSH join shape as q26 — scales as buckets,
    * not all-pairs, and 4 × 65536 buckets keep in-bucket pair counts
    * linear at corpus scale. */
  // Group-and-explode, not self-join: the join-vs-explode winner depends
  // on bucket geometry, measured BOTH ways at sf0.1 each time the band
  // scheme changed. Old 32-bit/8-bit-band scheme (≤1024 fat buckets):
  // join 2.9 s vs explode 4.3 s — join won. Current 64-bit/16-bit-band
  // scheme (4 × 65536 narrow buckets): explode 0.76 s vs join 1.34 s —
  // explode wins (signatures computed once, in-bucket pair lists tiny),
  // and narrow buckets are exactly the geometry that survives 10⁹ docs.
  /** The band-key explode shared by q29 and q62 — the Spark twin of
    * [[bandListSql]] (single source of truth per engine: a band-scheme
    * change edits exactly one site on each side). Input needs `sh`;
    * other columns pass through. */
  private def withBands(sigs: DataFrame): DataFrame =
    sigs.select(col("*"), explode(array((0 until nSimBands).map { b =>
      concat_ws(":", lit(b.toString),
        shiftright(col("sh"), bandBits * b).bitwiseAND(lit(bandMask)))
    }: _*)).as("band"))

  def q29SimhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val banded = withBands(simhashDocs(spark, dir))
      .select(col("doc_id"), col("sh"), col("band"))
    banded
      .groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("xs")) - 1), i =>
          transform(sequence(i + 1, size(col("xs"))), j =>
            struct(element_at(col("xs"), i).as("a"),
              element_at(col("xs"), j).as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.sh").bitwiseXOR(col("p.b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val bandListSql: String =
    (0 until nSimBands).map { b =>
      s"'$b:' || ((sh >> ${bandBits * b}) & $bandMask)"
    }.mkString("[", ",\n    ", "]")

  val q29Sql: String =
    s"""WITH sigs AS (SELECT doc_id, ${simhashSql("text")} AS sh FROM documents),
       |banded AS (SELECT doc_id, sh, unnest($bandListSql) AS band FROM sigs)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(xor(x.sh, y.sh)) AS hamming
       |FROM banded x JOIN banded y ON x.band = y.band AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sh, y.sh)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q56
  /** Near-dup CLUSTERS: connected components over the verified pair graph
    * (q27's output), every document labeled with its component's min
    * doc_id and whether it is the canonical keeper — the step that turns
    * pairwise near-dup detection into an actionable "keep one per
    * cluster" dedup decision.
    *
    * Iterative min-label propagation, the standard Spark shape for
    * components: each round joins the (tiny, broadcastable) undirected
    * edge list against current labels, takes the per-node min of own and
    * neighbor labels, and stops at fixpoint. Rounds ≤ graph diameter —
    * near-dup clusters are shallow (duplicates of a common original), so
    * a handful; `maxIter` guards pathological chains. Per-round persist +
    * unpersist keeps lineage flat (no exponential recompute), exactly
    * what large-star/small-star does at 10⁹-node scale. Deterministic:
    * min over integer ids — no floats, no ordering hazards. */
  /** Connected components by iterative min-label propagation. `nodes` has
    * one `doc_id` column; `edges` has `doc_a`/`doc_b`. Returns (doc_id,
    * cluster_id = component min, is_canonical). */
  private[graft] def connectedComponents(nodes: DataFrame, edges: DataFrame,
                                         maxIter: Int = 20): DataFrame = {
    // localCheckpoint, not persist: persist caches blocks but keeps the
    // full upstream lineage in the plan, so every round's join would make
    // Catalyst re-analyze the whole producer tree (for q56 that's the
    // entire LSH+verify pipeline — per-round planning cost grows with it).
    // Checkpointing truncates the plan to a leaf; rounds then plan over
    // two tiny in-memory relations.
    //
    // Round 10 (r8 ask #1 extension): the PROPAGATION ROUNDS run in the
    // AQE-off loop session (Loops.session) over re-hosted, join-key-
    // partitioned inputs — under AQE every round re-shuffled the static
    // edge list and the label frame from partitioning-less LogicalRDD
    // leaves (probed: 4 exchanges/round vs 1 here, LoopProbe r10; the
    // same tax PartProbe measured at 2.7× on PageRank at 10×). The
    // producer pipeline (LSH+verify) stays under the caller's AQE
    // session — only the loop pays the re-plan tax. Hub skew is
    // absorbed by the min-label partial aggregate (map-side), the same
    // argument as PageRank's dst-sum — pinned by GraphSpec's heavy-hub
    // fixture.
    val parent = nodes.sparkSession
    val und0 = edges.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(edges.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .materialized
    val labels0 = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .materialized
    // loop parallelism sized to the collision subgraph (Loops scaladoc:
    // AQE-off loops must size their stages at entry; a 4-partition loop
    // over a few-hundred-row subgraph beats 32-task stage overhead)
    val s = Loops.session(parent, Loops.dataSizedParts(und0.count(),
      parent.sparkContext.defaultParallelism))
    // re-host into the loop session, partitioned on the loop's join
    // keys: und by `a` (static — never re-exchanged again), labels by
    // doc_id (each round's output inherits the layout through the
    // AQE-off persist, so the label side of both joins stays exchange-
    // free too; the only per-round shuffle is the neighbor-min
    // aggregate, which changes key to `b`)
    // sortWithinPartitions: localCheckpoint preserves outputOrdering as
    // well as partitioning into the LogicalRDD leaf, so the loop's
    // sort-merge joins skip the per-round sort of the static edge side
    // (probed: the round-2 plan's Sort over the und scan disappears)
    val und = Loops.rehost(und0, s).repartition(col("a"))
      .sortWithinPartitions("a").materialized
    var labels = Loops.rehost(labels0, s).repartition(col("doc_id"))
      .sortWithinPartitions("doc_id").materialized
    Checkpoints.release(und0)
    Checkpoints.release(labels0)
    val initLabels = labels // released with `und` once the result exists
    // Per-round localCheckpoint, NOT persist (round-10 change, probed by
    // LoopProbe): the round body references `labels` twice (neighbor-min
    // feed + the join-back), which is a SELF-join after the first round —
    // Spark's self-join attribute disambiguation rewrites one side's
    // lineage, the rewritten side MISSES the cache of the previous
    // round's persisted frame, and the executed plan re-derives the
    // whole previous round inline (probe dump: a nested SortMergeJoin
    // re-running round N−1 from the checkpoint leaves, one extra
    // exchange and a growing right-spine of recomputes). A checkpoint
    // is a LEAF: nothing to re-derive on the rewritten side, and under
    // the AQE-off loop session its doc_id partitioning carries into the
    // next round's plan — each round is exactly ONE exchange (the
    // neighbor-min aggregate, whose key genuinely changes to `b`).
    // prevRound tracks round N−1's checkpoint, released as soon as
    // round N is materialized (O(1) live rounds, the Checkpoints
    // discipline).
    var prevRound: DataFrame = null
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = und.join(labels, und("a") === labels("doc_id"))
        .select(col("b").as("doc_id"), col("label"))
        .groupBy(col("doc_id")).agg(min(col("label")).as("nlabel"))
      // the old label is already on the left side of this join, so the
      // moved flag rides along for free — no second join-back against the
      // previous labels just to count changes (one shuffle join per round,
      // not two)
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label")).as("moved"))
        .materialized // eager: materializes the round
      changed = next.filter(col("moved")).count()
      if (prevRound != null) Checkpoints.release(prevRound)
      prevRound = next
      labels = next.select(col("doc_id"), col("label"))
      iter += 1
    }
    // a silent non-converged return would emit labels that are NOT the
    // component minimum (and mismatch the transitive-closure oracle with
    // no hint why) — fail loudly, releasing the last round's checkpoint
    // first so a caught failure doesn't pin its blocks for the rest of
    // the session
    if (changed != 0) {
      if (prevRound != null) Checkpoints.release(prevRound)
      // mirror the success path's eager release: the rehosted edge list
      // and init-label checkpoints are loop-session state a CAUGHT
      // failure would otherwise pin until ContextCleaner GC — the exact
      // lag class the r8 eager-release work removed (r10 ADVICE)
      Checkpoints.release(und)
      Checkpoints.release(initLabels)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still moving) — raise maxIter for this graph")
    }
    // materialize + truncate lineage so every intermediate can be freed:
    // the result is checkpoint-backed (ContextCleaner reclaims its blocks
    // once unreferenced), not pinned in the CacheManager forever. Caveat
    // of localCheckpoint: executor loss loses the blocks — acceptable for
    // an iterative result, the caller re-runs (GraphX does the same).
    val result = labels
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("is_canonical"))
      .materialized
    if (prevRound != null) Checkpoints.release(prevRound)
    // the edge list and the (long-superseded) init-label checkpoint are
    // dead once the result frame is materialized — release them now
    // rather than leaving them to ContextCleaner lag (the r8 eager-
    // release discipline; under back-to-back runs these blocks survived
    // into the next run and fed the bimodal slow mode)
    Checkpoints.release(und)
    Checkpoints.release(initLabels)
    // hand the (checkpoint-backed, loop-sized) labels back to the
    // caller's session — q56 joins them against the corpus under AQE
    Loops.rehost(result, parent)
  }

  /** q56 iterates ONLY over the collision subgraph (docs appearing in a
    * verified pair — a sliver of the corpus by construction); everything
    * else is trivially its own canonical cluster and joins back in one
    * map-side coalesce. At 10⁹ docs this is the difference between
    * propagating labels across the corpus and across the duplicates. */
  /** Probe/spec hook: the q56 collision subgraph — (nodes, edges) of
    * the verified near-dup pair graph, edges persisted (the caller
    * unpersists). LoopProbe drives the propagation loop over the REAL
    * subgraph in both AQE modes with this. */
  private[graft] def collisionGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // persisted: the LSH+jaccard pipeline feeds both the node list and
    // the undirected edge list — without this it would run once per use
    val edges = verifiedPairs(spark, dir).select(col("doc_a"), col("doc_b"))
      .persist()
    val nodes = edges.select(col("doc_a").as("doc_id"))
      .union(edges.select(col("doc_b").as("doc_id")))
      .distinct()
    (nodes, edges)
  }

  def q56DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val (graphNodes, edges) = collisionGraph(spark, dir)
    val comps = connectedComponents(graphNodes, edges)
      .select(col("doc_id"), col("cluster_id"))
    edges.unpersist() // comps is checkpoint-backed; lineage no longer needed
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(broadcast(comps), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: min reachable id per node via a recursive CTE — tractable
    * exactly because the pair graph is LSH-collision-sized. */
  val q56Sql: String =
    s"""WITH RECURSIVE $verifiedPairsSqlCtes,
       |edges AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM edges
       |  UNION SELECT doc_b, doc_a FROM edges),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
       |SELECT a AS doc_id, min(b) AS cluster_id, a = min(b) AS is_canonical
       |FROM reach
       |GROUP BY a
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Incremental ingest dedup: an incoming batch (a deterministic ~20%
    * hash-slice of documents, standing in for today's crawl) is checked
    * against the already-ingested corpus (the other ~80%) — each new doc
    * either matches an existing near-dup (hamming ≤ 3 on the 64-bit
    * SimHash) and is skipped, or is cleared for ingest. This is the
    * asymmetric daily-batch-vs-corpus-index join a 100 TB lake actually
    * runs (q29 is the one-shot all-pairs form): signatures for BOTH sides
    * come from one map-side pass, the join is banded (pigeonhole, 4×16-bit
    * bands) so cost is ∝ bucket collisions, and the small incoming side
    * broadcasts — the corpus index is never shuffled, which is the whole
    * point at scale. */
  /** The corpus side of the incremental gate as a production pipeline
    * maintains it: the banded signature index (old_doc, old_sh, band) —
    * built once per corpus version, appended as docs are ingested. */
  private[graft] def bandedIndex(corpus: DataFrame): DataFrame =
    withBands(simhashFrame(corpus))
      .select(col("doc_id").as("old_doc"), col("sh").as("old_sh"), col("band"))

  /** Gate one batch of (doc_id, text) rows against a banded corpus
    * index: per new doc, the min matched corpus doc (hamming ≤ 3), the
    * match count, and the skip/ingest decision. The new batch broadcasts
    * into the index join — the index never shuffles. Shared by the q62
    * batch query and the streaming gate
    * ([[graft.streaming.Ingest.dedupGateSink]]).
    *
    * `old_doc =!= new_doc` makes replay safe: a re-delivered batch whose
    * docs were already folded into the index must not match itself.
    *
    * `withinBatch = true` additionally catches duplicates INSIDE the
    * batch (two copies of a new doc arriving together would otherwise
    * both say "ingest"): a doc matching a LOWER-id batch doc is skipped —
    * keep-first semantics; matching any-direction would skip BOTH copies
    * and lose the content entirely. The kept copy may itself be skipped
    * against the corpus, in which case its duplicate's content is in the
    * corpus transitively. q62 keeps the default (its oracle gates the
    * batch-vs-corpus semantics only, over disjoint id sets). */
  private[graft] def gateBatch(newDocs: DataFrame, index: DataFrame,
                               withinBatch: Boolean = false): DataFrame = {
    val incLazy = withBands(simhashFrame(newDocs))
      .select(col("doc_id").as("new_doc"), col("sh").as("new_sh"), col("band"))
    // the within-batch mode fans inc out three ways (index join, self
    // left side, self broadcast) — materialize the signature pass once
    // instead of re-tokenizing/re-hashing the batch per reference; the
    // plain q62 path keeps the lazy single-use frame
    val inc = if (withinBatch) incLazy.localCheckpoint(true) else incLazy
    val idxPairs = index.join(broadcast(inc), "band")
      .filter(bit_count(col("new_sh").bitwiseXOR(col("old_sh"))) <= 3 &&
        col("old_doc") =!= col("new_doc"))
      .select(col("new_doc"), col("old_doc"))
    val pairs = if (!withinBatch) idxPairs else {
      val selfOld = inc.select(col("new_doc").as("old_doc"),
        col("new_sh").as("old_sh"), col("band"))
      idxPairs.union(
        selfOld.join(broadcast(inc), "band")
          .filter(bit_count(col("new_sh").bitwiseXOR(col("old_sh"))) <= 3 &&
            col("old_doc") < col("new_doc"))
          .select(col("new_doc"), col("old_doc")))
    }
    val matches = pairs
      .groupBy(col("new_doc"))
      .agg(min(col("old_doc")).as("matched_doc"),
        countDistinct(col("old_doc")).as("n_matches"))
    newDocs.select(col("doc_id"))
      .join(broadcast(matches), col("doc_id") === col("new_doc"), "left")
      .select(col("doc_id"), col("matched_doc"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        when(col("matched_doc").isNotNull, "skip").otherwise("ingest").as("decision"))
  }

  def q62IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val incomingFlag =
      pmod(h60(concat(lit("inc:"), col("doc_id").cast("string"))), lit(5L)) === 0L
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    gateBatch(docs.filter(incomingFlag), bandedIndex(docs.filter(!incomingFlag)))
      .orderBy(col("doc_id"))
  }

  val q62Sql: String =
    s"""WITH sigs AS (SELECT doc_id, ${simhashSql("text")} AS sh,
       |    (${h60Sql("'inc:'||doc_id")} % 5 = 0) AS incoming
       |  FROM documents),
       |banded AS (SELECT doc_id, sh, incoming, unnest($bandListSql) AS band FROM sigs),
       |m AS (SELECT i.doc_id AS new_doc, min(c.doc_id) AS matched_doc,
       |    count(DISTINCT c.doc_id) AS n_matches
       |  FROM banded i JOIN banded c ON i.band = c.band AND i.incoming AND NOT c.incoming
       |  WHERE bit_count(xor(i.sh, c.sh)) <= 3
       |  GROUP BY i.doc_id)
       |SELECT s.doc_id, m.matched_doc,
       |  coalesce(m.n_matches, 0)::BIGINT AS n_matches,
       |  CASE WHEN m.matched_doc IS NOT NULL THEN 'skip' ELSE 'ingest' END AS decision
       |FROM sigs s LEFT JOIN m ON s.doc_id = m.new_doc
       |WHERE s.incoming
       |ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Fuzzy string self-join (edit distance ≤ 1) via DELETION-
    * NEIGHBORHOOD blocking — the spell-check/entity-resolution join.
    * Two strings within one edit (substitute / insert / delete) share
    * at least one single-deletion variant (delete the edited position
    * from the longer/both), so: explode each distinct name into its
    * |s|+1 deletion variants (plus itself), equi-join on the variant,
    * verify candidates with exact levenshtein, report per-name
    * neighbor degree. Never an all-pairs comparison: candidate cost is
    * ∝ variant-bucket collisions, the same pigeonhole economics as the
    * SimHash bands above — and the verify runs on candidates only,
    * like q27. Both engines evaluate the SAME exact integer
    * levenshtein, so the hash gate covers the verify bar too. */
  /** Adversarial-density guard for [[q87FuzzyJoin]] (r10 verdict ask
    * #1): a deletion-variant bucket of degree D explodes D·(D−1)/2
    * candidate pairs, so ONE crafted (or pathological) hot neighborhood
    * — a million names sharing a variant — would go quadratic however
    * linear the rest of the corpus is. Buckets past the cap are EXCLUDED
    * from pair generation and surfaced per name in the `n_capped` audit
    * column instead (the q60 boilerplate-exemption pattern: bound the
    * explode BEFORE pairs exist, never after). The staged corpora's max
    * degree is 38 at every tier (replica neighborhoods are disjoint by
    * construction, measured constant 1×–20×), so 256 never binds on
    * genuine data and the oracle stays unchanged — the cap exists for
    * the 100× corpus nobody staged. Note the engine caps HASH buckets
    * (xxhash64(v)) while the oracle caps string buckets: a collision
    * could only merge buckets toward the cap, and at 38 ≪ 256 an
    * 8-byte-hash collision dense enough to matter cannot occur in any
    * staged tier. */
  private[graft] val fuzzyDegreeCap = 256

  def q87FuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    fuzzyNeighbors(Tables.customer(spark, dir)
      .select(col("c_name").as("t")).distinct())

  /** The fuzzy-join core over a distinct name column `t` — split from
    * [[q87FuzzyJoin]] so the cap path is testable with a synthetic
    * over-cap neighborhood (no staged corpus reaches degree 256). */
  private[graft] def fuzzyNeighbors(names: DataFrame): DataFrame = {
    val vars = names.select(col("t"), explode(expr(
      "array_append(transform(sequence(1, length(t)), " +
        "i -> concat(substr(t, 1, i-1), substr(t, i+1))), t)")).as("v"))
    // group-and-explode, not a self-join: the variant pipeline runs ONCE
    // and each bucket's i<j pairs explode in place (q26's measured shape —
    // the self-join form re-evaluated the explode per side and shuffled
    // both: 12 s vs ~3 s at sf0.1). Buckets are deletion-variant
    // collisions — tiny by construction, same pigeonhole economics as the
    // bands.
    // block on xxhash64(variant), not the variant string: the blocking
    // key never leaves the engine (the oracle only has to agree on the
    // FINAL pairs), so an 8-byte shuffle key beats a 19-char string —
    // and a hash collision can only ADD candidates, which the exact
    // levenshtein verify below discards
    val buckets = vars
      .groupBy(xxhash64(col("v")).as("vk"))
      .agg(sort_array(collect_set(col("t"))).as("ts"))
      .filter(size(col("ts")) > 1)
      .localCheckpoint(true) // one bucket pass feeds both the kept pairs and the audit
    val cand = buckets
      .filter(size(col("ts")) <= fuzzyDegreeCap)
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("ts")) - 1), i =>
          transform(sequence(i + 1, size(col("ts"))), j =>
            struct(element_at(col("ts"), i).as("t1"),
              element_at(col("ts"), j).as("t2")))))).as("p"))
      .select(col("p.t1"), col("p.t2"))
      .distinct()
    // per-name overflow audit: how many of this name's neighborhoods
    // were excluded by the cap (0 everywhere on the staged corpora).
    // Over-cap buckets explode to NAMES (linear, Δ·D rows), never pairs.
    val capped = buckets.filter(size(col("ts")) > fuzzyDegreeCap)
      .select(explode(col("ts")).as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("nc"))
    val ver = cand.filter(levenshtein(col("t1"), col("t2")) <= 1)
    // FULL join: a name whose only neighborhoods were capped still
    // surfaces — n_neighbors 0, first_neighbor null, n_capped > 0 —
    // so capping is auditable from the output alone, never a silent
    // recall hole (the no-silent-caps rule)
    ver.select(col("t1").as("name"), col("t2").as("nb"))
      .union(ver.select(col("t2"), col("t1")))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_neighbors"), min(col("nb")).as("first_neighbor"))
      .join(capped, Seq("name"), "full")
      .select(col("name"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        col("first_neighbor"),
        coalesce(col("nc"), lit(0L)).as("n_capped"))
      .orderBy(col("name"))
  }

  val q87Sql: String =
    s"""WITH names AS (SELECT DISTINCT c_name AS t FROM customer),
      |vars AS (SELECT t, unnest(list_append(
      |    list_transform(range(1, len(t)+1), i -> substr(t, 1, i-1) || substr(t, i+1)), t)) AS v
      |  FROM names),
      |deg AS (SELECT v, count(DISTINCT t) AS deg FROM vars GROUP BY v),
      |cand AS (SELECT DISTINCT a.t AS t1, b.t AS t2
      |  FROM vars a JOIN vars b ON a.v = b.v AND a.t < b.t
      |  JOIN deg d ON d.v = a.v AND d.deg <= $fuzzyDegreeCap),
      |capped AS (SELECT a.t AS name, count(DISTINCT a.v) AS nc
      |  FROM vars a JOIN deg d ON d.v = a.v AND d.deg > $fuzzyDegreeCap
      |  GROUP BY a.t),
      |ver AS (SELECT t1, t2 FROM cand WHERE levenshtein(t1, t2) <= 1),
      |sym AS (SELECT t1 AS name, t2 AS nb FROM ver
      |  UNION ALL SELECT t2, t1 FROM ver),
      |agg AS (SELECT name, count(*) AS n_neighbors, min(nb) AS first_neighbor
      |  FROM sym GROUP BY name)
      |SELECT coalesce(a.name, c.name) AS name,
      |  coalesce(a.n_neighbors, 0) AS n_neighbors, a.first_neighbor,
      |  coalesce(c.nc, 0) AS n_capped
      |FROM agg a FULL JOIN capped c ON c.name = a.name
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_exact_dedup"     -> q25ExactDedup _,
    "q26_minhash_lsh"     -> q26MinhashLsh _,
    "q27_ngram_jaccard"   -> q27NgramJaccard _,
    "q28_simhash"         -> q28Simhash _,
    "q29_simhash_neardup" -> q29SimhashNeardup _,
    "q56_dedup_clusters"  -> q56DedupClusters _,
    "q62_incremental_dedup" -> q62IncrementalDedup _,
    "q71_minhash_estimate"  -> q71MinhashEstimate _,
    "q87_fuzzy_join"        -> q87FuzzyJoin _,
    "q110_corpus_containment" -> q110CorpusContainment _,
  )

  val oracle: Map[String, String] = Map(
    "q25_exact_dedup"     -> q25Sql,
    "q26_minhash_lsh"     -> q26Sql,
    "q27_ngram_jaccard"   -> q27Sql,
    "q28_simhash"         -> q28Sql,
    "q29_simhash_neardup" -> q29Sql,
    "q56_dedup_clusters"  -> q56Sql,
    "q62_incremental_dedup" -> q62Sql,
    "q71_minhash_estimate"  -> q71Sql,
    "q87_fuzzy_join"        -> q87Sql,
    "q110_corpus_containment" -> q110Sql,
  )
}
