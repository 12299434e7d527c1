package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media frame: payload is the text bytes, metadata typed") {
    val m = Multimodal.mediaFrame(spark, sf).head()
    assert(m.payload.nonEmpty)
    assert(m.n_bytes == m.payload.length.toLong)
    assert(Set("image", "audio", "video").contains(m.media_type))
  }

  test("decode plumbing: deterministic stub, fixed feature dim, map-side") {
    val media = Multimodal.mediaFrame(spark, sf).limit(50)
    val d1 = Multimodal.decodeAll(media).collect().sortBy(_.doc_id)
    val d2 = Multimodal.decodeAll(media).collect().sortBy(_.doc_id)
    assert(d1.length == 50)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.width == b.width && a.height == b.height)
      assert(a.feature.toSeq == b.feature.toSeq, "decode must be deterministic")
    }
    d1.foreach { d =>
      assert(d.feature.length == Multimodal.MediaCodec.featureDim)
      assert(d.width >= 16 && d.height >= 9 && d.n_frames >= 1)
      if (d.media_type != "video") assert(d.n_frames == 1)
    }
    // map-side: decode must not repartition
    assert(Multimodal.decodeAll(media).rdd.getNumPartitions ==
      media.rdd.getNumPartitions)
  }

  test("q97 CAS dedup accounting: payload counts conserve, physical never exceeds logical") {
    val rows = Multimodal.q97MediaDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_payloads"))
      assert(r.getAs[Long]("n_dup")
        == r.getAs[Long]("n_payloads") - r.getAs[Long]("n_unique"))
      assert(r.getAs[Long]("physical_bytes") <= r.getAs[Long]("logical_bytes"))
      val f = r.getAs[Double]("stored_frac")
      assert(f > 0.0 && f <= 1.0 + 1e-9)
    }
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_payloads")).sum == total,
      "every document's payload must appear in exactly one modality row")
  }

  test("q119 payload near-dup: same-modality ordered pairs, hamming recomputed from first principles") {
    // sf0.01: the staged corpus carries planted near-dup AND exact-dup
    // payloads there (sf0.001 may have neither — too sparse to pin)
    val dir = "/root/testdata/sf0.01"
    val pairs = Multimodal.queries("q119_media_neardup")(spark, dir).collect()
    assert(pairs.nonEmpty, "sf0.01 must surface payload near-dups")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), "pairs are ordered once")
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 3, s"verify bar is hamming <= 3, got $h")
    }
    // same-modality only: the modality rides in the band key, so a
    // cross-modality pair is impossible by construction — verify against
    // the data rather than trust the construction
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        Multimodal.mediaTypeCol(col("source")).as("mt")).collect()
    val mtOf = docs.map(r => r.getLong(0) -> r.getString(2)).toMap
    pairs.foreach { r =>
      assert(mtOf(r.getAs[Long]("doc_a")) == r.getAs[String]("media_type") &&
        mtOf(r.getAs[Long]("doc_b")) == r.getAs[String]("media_type"),
        "both docs of a pair must carry the pair's modality")
    }
    // independent recompute: rebuild each reported pair's signatures in
    // plain Scala (byte shingles + the same h60/majority-bit fold the
    // HOF reference pins against the native kernel) and confirm the
    // reported hamming — the full pipeline verified end to end on every
    // emitted pair without touching the engine's own expressions
    val textOf = docs.map(r => r.getLong(0) -> r.getString(1)).toMap
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def sig(text: String): Long = {
      val hx = text.getBytes("UTF-8").map("%02X".format(_)).mkString
      val n = math.max(hx.length - 15, 1)
      val sg = (1 to n by 2).map(i => hx.substring(i - 1, math.min(i + 15, hx.length)))
      val h1 = sg.map(h60)
      val h2 = sg.map(s => h60(s + "#2"))
      (0 until 64).map { b =>
        val hs = if (b < 32) h1 else h2
        val bit = if (b < 32) b else b - 32
        val sum = hs.map(h => if (((h >> bit) & 1L) == 1L) 1 else -1).sum
        if (sum > 0) 1L << b else 0L
      }.reduce(_ | _)
    }
    pairs.foreach { r =>
      val h = java.lang.Long.bitCount(
        sig(textOf(r.getAs[Long]("doc_a"))) ^ sig(textOf(r.getAs[Long]("doc_b"))))
      assert(h == r.getAs[Int]("hamming"),
        s"pair (${r.getAs[Long]("doc_a")}, ${r.getAs[Long]("doc_b")}): " +
          s"recomputed hamming $h != reported ${r.getAs[Int]("hamming")}")
    }
  }
}
