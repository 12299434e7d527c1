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
}
