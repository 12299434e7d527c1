package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text.{h60, h60Sql}
import graft.sources.Tables

/** Multimodal-column surface (BASELINE.json extension): media as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The reference ships whole tweets as opaque JSON bytes
  * (`/root/reference/regionSpout.go:152`) — the same "payload is bytes,
  * engine routes it" stance taken here for images/audio/video. The
  * testdata has no real media, so payloads are the document text's UTF-8
  * bytes; REAL media only changes the bytes, never the plumbing.
  *
  * DECODE IS A STUB: the container has no image/audio codecs, so
  * [[MediaCodec.decodeStub]] derives deterministic fake dimensions /
  * features from the payload hash. Everything around it — binary column
  * handling, metadata struct schema, per-partition batching via
  * `mapPartitions`, fixed-dim feature vectors — is the real Spark-side
  * contract, and is what the specs test.
  *
  * Scale shape: all pure map-side (payload never shuffles); frame
  * sampling explodes bounded index lists (≤ duration/stride rows per
  * doc); feature extraction emits fixed-width vectors ready for the
  * Similarity LSH path.
  */
object Multimodal {

  /** Typed media row — the multimodal column contract: opaque payload +
    * queryable metadata. */
  case class MediaRow(
      doc_id: Long, media_type: String, payload: Array[Byte],
      n_bytes: Long, source: String)

  /** Decoded-media stub output: what a real codec would yield. */
  case class Decoded(
      doc_id: Long, media_type: String, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])

  /** Deterministic source→modality mapping (src hash parity). */
  def mediaTypeCol(source: Column): Column =
    when(pmod(h60(source), lit(3)) === 0, "image")
      .when(pmod(h60(source), lit(3)) === 1, "audio")
      .otherwise("video")

  private def mediaTypeSql(source: String): String =
    s"""CASE ${h60Sql(source)} % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       | ELSE 'video' END""".stripMargin.replace("\n", "")

  /** documents → typed media frame (payload = UTF-8 bytes of text). */
  def mediaFrame(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        mediaTypeCol(col("source")).as("media_type"),
        col("text").cast("binary").as("payload"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source"))
      .as[MediaRow]
  }

  // ---------------------------------------------------------------- q37
  /** Media metadata projection: payload size, content hash, modality, and
    * synthetic decode-independent dimensions — the schema a media lake
    * table carries alongside the bytes. */
  def q37MediaMetadata(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        mediaTypeCol(col("source")).as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_hash"),
        // deterministic pseudo-dimensions from payload length
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 9).cast("int").as("height"))
      .orderBy(col("doc_id"))

  val q37Sql: String =
    s"""SELECT doc_id, ${mediaTypeSql("source")} AS media_type,
       |  octet_length(text::BLOB)::INT AS n_bytes,
       |  md5(text) AS content_hash,
       |  (n_chars % 640 + 16)::INT AS width,
       |  (n_chars % 480 + 9)::INT AS height
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Frame sampling: treat n_chars as a frame count, sample every 50th
    * frame, one output row per sampled frame with a per-frame signature —
    * the explode-bounded-list shape a video pipeline uses. */
  def q38FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_chars") - 1, lit(50L))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        h60(concat_ws(":", col("doc_id"), col("frame_no"))).as("frame_sig"))
      .orderBy(col("doc_id"), col("frame_no"))

  val q38Sql: String =
    s"""SELECT doc_id, unnest(range(0, n_chars, 50)) AS frame_no
       |FROM documents WHERE doc_id < 100""".stripMargin match {
      case inner =>
        s"""WITH f AS ($inner)
           |SELECT doc_id, frame_no,
           |  ${h60Sql("doc_id || ':' || frame_no")} AS frame_sig
           |FROM f
           |ORDER BY doc_id, frame_no""".stripMargin
    }

  // ----------------------------------------------------- decode plumbing
  /** STUBBED codec. A real deployment swaps `decodeStub` for an actual
    * decoder (JNI/FFI) — signatures and batching stay identical. */
  object MediaCodec {
    val featureDim = 16

    /** Deterministic fake decode: dimensions + a fixed-dim feature vector
      * derived from the payload bytes. Stands in for image decode /
      * audio sample / video frame-grab. */
    def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def u(i: Int): Int = md(i) & 0xff
      val width = 16 + (u(0) << 4 | u(1) >> 4)
      val height = 9 + (u(2) << 4 | u(3) >> 4)
      val frames = 1 + u(4)
      val feat = Array.tabulate(featureDim)(i => (u(i) - 128) / 128.0f)
      (width, height, frames, feat)
    }
  }

  /** Batched decode over partitions: the `mapPartitions` contract a real
    * codec needs (amortize per-batch init — codec contexts, model weights
    * — across a partition's rows). Map-side; no shuffle. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (real codec: open context once)
      rows.map { m =>
        val (w, h, f, feat) = MediaCodec.decodeStub(m.payload)
        Decoded(m.doc_id, m.media_type, w, h,
          if (m.media_type == "video") f else 1, feat)
      }
    }
  }

  // ---------------------------------------------------------------- q52
  /** The decode path, driver-gated: mediaFrame → mapPartitions decode →
    * metadata + leading feature dims. The stub's md5-byte math is
    * deterministic, so DuckDB can mirror it exactly: u(i) = byte i of
    * md5(payload); width = 16 + (u0<<4 | u1>>4); height likewise from
    * u2/u3; frames = 1+u4 for video; f_i = (u_i−128)/128 — exact k/128
    * doubles in both engines, no rounding needed. A real codec swap-in
    * keeps this query's schema and plan; only the byte math changes. */
  def q52DecodeFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFrame(spark, dir)).toDF()
      .select(col("doc_id"), col("media_type"),
        col("width"), col("height"), col("n_frames"),
        col("feature")(0).cast("double").as("f0"),
        col("feature")(1).cast("double").as("f1"),
        col("feature")(2).cast("double").as("f2"),
        col("feature")(3).cast("double").as("f3"))
      .orderBy(col("doc_id"))

  val q52Sql: String = {
    def u(i: Int) = s"('0x'||substr(h,${2 * i + 1},2))::INT"
    s"""WITH m AS (SELECT doc_id, source, md5(text) AS h FROM documents),
       |b AS (SELECT doc_id, ${mediaTypeSql("source")} AS media_type,
       |    ${u(0)} AS u0, ${u(1)} AS u1, ${u(2)} AS u2,
       |    ${u(3)} AS u3, ${u(4)} AS u4 FROM m)
       |SELECT doc_id, media_type,
       |  (16 + u0 * 16 + u1 // 16)::INT AS width,
       |  (9 + u2 * 16 + u3 // 16)::INT AS height,
       |  (CASE WHEN media_type = 'video' THEN 1 + u4 ELSE 1 END)::INT AS n_frames,
       |  (u0 - 128) / 128.0 AS f0,
       |  (u1 - 128) / 128.0 AS f1,
       |  (u2 - 128) / 128.0 AS f2,
       |  (u3 - 128) / 128.0 AS f3
       |FROM b
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q97
  /** Content-addressable payload dedup audit — the storage answer for a
    * 100 TB media lake: payloads keyed by content hash are stored ONCE;
    * this query reports, per modality, how many payloads collapse and
    * how many bytes a CAS layout reclaims (`logical` = bytes as
    * referenced, `physical` = bytes stored once per distinct hash).
    * This is q25's exact-dedup move applied to BINARY columns, where
    * the payoff is storage, not training quality.
    *
    * Scale shape: the payload itself never shuffles — only its hash
    * and length reach the two hash-keyed aggregates (first per
    * (modality, hash), then per modality). Exactly how a real CAS
    * ingest dedups: hash map-side, reduce on digests. */
  def q97MediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir).select(
      mediaTypeCol(col("source")).as("media_type"),
      md5(col("text").cast("binary")).as("h"),
      octet_length(col("text").cast("binary")).cast("long").as("nb"))
    m.groupBy(col("media_type"), col("h"))
      // nb is a function of the hash (same bytes → same length): min is
      // a no-op aggregator that keeps the column through the group
      .agg(count(lit(1)).as("n"), min(col("nb")).as("nb"))
      .groupBy(col("media_type"))
      .agg(sum(col("n")).as("n_payloads"),
        count(lit(1)).as("n_unique"),
        sum(col("n") * col("nb")).as("logical_bytes"),
        sum(col("nb")).as("physical_bytes"))
      .select(col("media_type"), col("n_payloads"), col("n_unique"),
        (col("n_payloads") - col("n_unique")).as("n_dup"),
        col("logical_bytes"), col("physical_bytes"),
        round(col("physical_bytes").cast("double") / col("logical_bytes") + 1e-9, 6)
          .as("stored_frac"))
      .orderBy(col("media_type"))
  }

  val q97Sql: String =
    s"""WITH m AS (SELECT ${mediaTypeSql("source")} AS media_type,
       |    md5(text) AS h, octet_length(text::BLOB)::BIGINT AS nb
       |  FROM documents),
       |g AS (SELECT media_type, h, count(*) AS n, min(nb) AS nb
       |  FROM m GROUP BY 1, 2)
       |SELECT media_type, sum(n)::BIGINT AS n_payloads,
       |  count(*) AS n_unique,
       |  (sum(n) - count(*))::BIGINT AS n_dup,
       |  sum(n * nb)::BIGINT AS logical_bytes,
       |  sum(nb)::BIGINT AS physical_bytes,
       |  round(sum(nb)::DOUBLE / sum(n * nb) + 1e-9, 6) AS stored_frac
       |FROM g GROUP BY media_type ORDER BY media_type""".stripMargin

  // --------------------------------------------------------------- q119
  /** Perceptual-style NEAR-dup detection over opaque binary payloads —
    * what q97's exact CAS dedup cannot see: re-encoded/partially-edited
    * media whose bytes differ but mostly overlap (the pHash-bucketing
    * shape of an image/audio store, run here on the payload bytes the
    * container actually has). The payload is treated as pure bytes: no
    * tokenizer, no text assumption — overlapping 8-BYTE shingles over
    * the hex encoding (stride one byte), SimHashed with the native
    * one-pass kernel, banded 4×16-bit with Dedup's geometry (one source
    * of truth), and verified at Hamming ≤ 3. The MODALITY rides in the
    * band key, so image/audio/video payloads can never pair — each
    * modality's store dedups independently, which is how a real CAS
    * shards anyway.
    *
    * Scale shape: signatures are one map-side pass (codegen'd h60 per
    * shingle + the native simhash fold); payload bytes never shuffle —
    * only (doc_id, modality, 64-bit sh) reaches the band group-and-
    * explode, whose buckets are collision-sized by construction (q29's
    * economics). Linear in corpus bytes at any scale.
    *
    * Determinism: hex() is uppercase in BOTH engines; shingling,
    * hashing, banding, and the Hamming verify replay exactly in SQL. */
  def q119MediaNeardup(spark: SparkSession, dir: String): DataFrame = {
    // signature pass: the native byte-level kernel (round-11; before it,
    // this was the column pipeline kept below as q119HexSigs) — one
    // codegen'd expression per doc, no hex column / shingle array /
    // boxed hash arrays on the wire. Bit-identical to the hex path by
    // construction (GraftHash.mediaSimhash replays its md5 inputs), so
    // the SQL oracle below still describes exactly what this computes.
    val sigs = q119NativeSigs(spark, dir)
    val banded = sigs.select(col("doc_id"), col("media_type"), col("sh"),
      explode(array((0 until graft.operators.Dedup.nSimBands).map { b =>
        concat_ws(":", col("media_type"), lit(b.toString),
          shiftright(col("sh"), graft.operators.Dedup.bandBits * b)
            .bitwiseAND(lit(graft.operators.Dedup.bandMask)))
      }: _*)).as("band"))
    banded
      .groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("media_type"),
        col("sh")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("xs")) - 1), i =>
          transform(sequence(i + 1, size(col("xs"))), j =>
            struct(element_at(col("xs"), i).as("a"),
              element_at(col("xs"), j).as("b")))))).as("p"))
      .select(col("p.a.media_type").as("media_type"),
        col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.sh").bitwiseXOR(col("p.b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("media_type"), col("doc_a"), col("doc_b"))
  }

  /** q119's signature frame via the native kernel — factored so the
    * parity spec compares exactly what the query runs. */
  private[graft] def q119NativeSigs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      mediaTypeCol(col("source")).as("media_type"),
      call_function("graft_simhash64_bytes",
        col("text").cast("binary")).as("sh"))

  /** The pre-round-11 COLUMN form of q119's signature pass — hex string
    * → byte-aligned 16-char windows → h60 / h60(+"#2") arrays →
    * graft_simhash64 fold. Kept solely as the parity reference for the
    * native kernel (ExpressionsSpec asserts `graft_simhash64_bytes`
    * equals this per doc on the real corpus); the query itself no
    * longer runs it. */
  private[graft] def q119HexSigs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text.h60
    val hx = hex(col("text").cast("binary"))
    val m = Tables.documents(spark, dir).select(col("doc_id"),
      mediaTypeCol(col("source")).as("media_type"), hx.as("hx"))
    // byte-aligned 8-byte windows: hex positions 1, 3, 5, … (2 hex
    // chars per byte); a payload under 8 bytes contributes its whole
    // (shorter) hex string as the single shingle
    val shingles = transform(
      sequence(lit(1), greatest(length(col("hx")) - 15, lit(1)), lit(2)),
      i => col("hx").substr(i, lit(16)))
    m.select(col("doc_id"), col("media_type"), shingles.as("sg"))
      .select(col("doc_id"), col("media_type"),
        call_function("graft_simhash64",
          transform(col("sg"), s => h60(s)),
          transform(col("sg"), s => h60(concat(s, lit("#2"))))).as("sh"))
  }

  val q119Sql: String = {
    import graft.functions.Text.h60Sql
    val nBands = graft.operators.Dedup.nSimBands
    val bandBits = graft.operators.Dedup.bandBits
    val bandMask = graft.operators.Dedup.bandMask
    val simBits = nBands * bandBits
    val terms = (0 until simBits).map { b =>
      val (arr, bit) = if (b < 32) ("hh1", b) else ("hh2", b - 32)
      s"(CASE WHEN list_sum(list_transform($arr, h -> CASE WHEN (h >> $bit) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN (${1L << b})::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    val bandList = (0 until nBands).map { b =>
      s"media_type || ':$b:' || ((sh >> ${bandBits * b}) & $bandMask)"
    }.mkString("[", ",\n    ", "]")
    s"""WITH m AS (SELECT doc_id, ${mediaTypeSql("source")} AS media_type,
       |    hex(encode(text)) AS hx FROM documents),
       |sg AS (SELECT doc_id, media_type,
       |    list_transform(range(1, greatest(len(hx) - 15, 1) + 1, 2),
       |      i -> substr(hx, i, 16)) AS sg
       |  FROM m),
       |hh AS (SELECT doc_id, media_type,
       |    list_transform(sg, s -> ${h60Sql("s")}) AS hh1,
       |    list_transform(sg, s -> ${h60Sql("s || '#2'")}) AS hh2
       |  FROM sg),
       |sig AS (SELECT doc_id, media_type, ($terms)::BIGINT AS sh FROM hh),
       |banded AS (SELECT doc_id, media_type, sh, unnest($bandList) AS band FROM sig)
       |SELECT DISTINCT x.media_type AS media_type, x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(xor(x.sh, y.sh)) AS hamming
       |FROM banded x JOIN banded y ON x.band = y.band AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sh, y.sh)) <= 3
       |ORDER BY media_type, doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_metadata"  -> q37MediaMetadata _,
    "q38_frame_sample"    -> q38FrameSample _,
    "q52_decode_features" -> q52DecodeFeatures _,
    "q97_media_dedup"     -> q97MediaDedup _,
    "q119_media_neardup"  -> q119MediaNeardup _,
  )

  val oracle: Map[String, String] = Map(
    "q37_media_metadata"  -> q37Sql,
    "q38_frame_sample"    -> q38Sql,
    "q52_decode_features" -> q52Sql,
    "q97_media_dedup"     -> q97Sql,
    "q119_media_neardup"  -> q119Sql,
  )
}
