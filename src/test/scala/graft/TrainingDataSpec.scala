package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingData

class TrainingDataSpec extends SparkSpec {

  test("q54 split accounting: train+val+test = sampled <= docs, targets honored") {
    val rows = TrainingData.queries("q54_stratified_sample")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, sampled) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))
      assert(sampled <= n)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") + r.getAs[Long]("n_test") == sampled)
    }
  }

  test("hash sampling is subset-stable: membership unchanged as the corpus grows") {
    // the frozen-eval-set property: a doc's sample/split decision is a pure
    // function of its id, so evaluating it on a 10% slice of the corpus
    // must agree with the full-corpus run doc-by-doc
    val d = graft.sources.Tables.documents(spark, sf)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          pmod(graft.functions.Text.h60(concat(lit("smp:"), col("doc_id").cast("string"))), lit(100L)).as("sb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = buckets(d)
    val slice = buckets(d.filter(col("doc_id") % 10 === 3))
    assert(slice.nonEmpty)
    slice.foreach { case (id, b) => assert(full(id) == b) }
  }

  // Pure-Scala twin of the h60/bucket/split pipeline — an independent
  // code path (MessageDigest, not Catalyst) so the spec can't inherit a
  // bug from the expressions it checks.
  private def h60s(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q92 sequence packing matches a from-first-principles Scala recompute") {
    // split(_, -1): keep trailing empty tokens, matching Spark split /
    // DuckDB string_split semantics (Java's 1-arg split drops them —
    // the recompute must count tokens the way the engines do)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val bin = TrainingData.packBin.toLong
    val expected = docs
      .map { case (id, n) => (h60s(s"pk:$id") % TrainingData.packShards, id, n) }
      .groupBy(_._1).toSeq
      .map { case (sh, rows) =>
        var cum = 0L; var splitDocs = 0L; var bins = 0L; var tok = 0L
        rows.sortBy(_._2).foreach { case (_, _, n) =>
          if (cum / bin != (cum + n - 1) / bin) splitDocs += 1
          bins = math.max(bins, (cum + n - 1) / bin + 1)
          tok += n; cum += n
        }
        (sh, rows.length.toLong, tok, bins, splitDocs)
      }.sortBy(_._1)
    val got = TrainingData.queries("q92_sequence_pack")(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expected)
    got.foreach { r =>
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.0 && fill <= 1.0, s"fill ratio out of range: $fill")
      assert(r.getLong(4) <= r.getLong(1), "split docs bounded by doc count")
    }
  }

  test("q94 weighted sampling matches a from-first-principles A-ES recompute") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val expected = docs.map { case (id, n) =>
      val u = (h60s(s"ws:$id") + 1).toDouble / math.pow(2, 60)
      (id, math.log(u) / n, n)
    }.sortBy { case (id, k, _) => (-k, id) }.take(25)
    val got = TrainingData.queries("q94_weighted_sample")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == expected.map(_._1).toSeq,
      "A-ES top-k must match the independent recompute, in order")
    // invariants: dense ranks, no repeats (without replacement), and
    // every key ≤ 0 (ln of u ∈ (0,1] divided by a positive weight) —
    // NOT a mean-length claim: one k-sized draw under mildly varying
    // weights carries sampling noise larger than the weighting effect
    assert(got.map(_.getAs[Int]("rk")).toSeq == (1 to 25))
    assert(got.map(_.getAs[Long]("doc_id")).distinct.length == 25)
    assert(got.forall(_.getAs[Double]("wkey") <= 0.0))
  }

  test("q60 decontamination matches a from-first-principles Scala recompute") {
    // sf0.01, not the usual sf0.001 fixture: the smallest corpus has ZERO
    // contaminated test docs, which would make this comparison vacuously
    // empty == empty; sf0.01 has real leakage (and the nonEmpty assert
    // keeps the test honest if the data ever changes)
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.documents(spark, sf01)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val rates = TrainingData.mixRates.toMap
    def sampled(id: Long, src: String) = h60s(s"smp:$id") % 100 < rates.getOrElse(src, 0)
    def split(id: Long) = h60s(s"spl:$id") % 10
    def grams(text: String): Set[Long] =
      text.split(" ").sliding(8).filter(_.length == 8)
        .map(w => h60s(w.mkString(" "))).toSet
    val train = docs.filter { case (id, _, s) => sampled(id, s) && split(id) < 8 }
      .map { case (id, t, _) => id -> grams(t) }
    val test = docs.filter { case (id, _, s) => sampled(id, s) && split(id) == 9 }
      .map { case (id, t, _) => id -> grams(t) }
    val gramTrainDocs = train.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val rare = gramTrainDocs.filter(_._2.size <= 10)
    val expected = test.flatMap { case (tid, gs) =>
      val shared = gs.filter(rare.contains)
      val tdocs = shared.flatMap(rare(_))
      if (shared.nonEmpty) Some((tid, tdocs.size.toLong, shared.size.toLong)) else None
    }.sortBy(_._1)
    val got = TrainingData.queries("q60_decontaminate")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(expected.nonEmpty, "fixture must contain real contamination")
    assert(got.toSeq == expected.toSeq)
  }

  test("native graft_ngram8 equals the HOF reference form") {
    val d = graft.sources.Tables.documents(spark, sf)
    val cmp = d.select(
        call_function("graft_ngram8", org.apache.spark.sql.functions.split(col("text"), " ")).as("native"),
        TrainingData.ngramHashesReference(col("text")).as("ref"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("q63 per-group sample: bounded, ranked 1..k, deterministic") {
    val rows = TrainingData.queries("q63_group_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
    val again = TrainingData.queries("q63_group_sample")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q64 mix plan: exact integer accounting") {
    val rows = TrainingData.queries("q64_mix_plan")(spark, sf).collect()
    assert(rows.length == 20)
    val rates = TrainingData.mixRates.toMap
    val sumRates = rates.values.map(_.toLong).sum
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Int]("weight") == rates(src))
      val alloc = (10000000L * rates(src)) / sumRates
      assert(r.getAs[Long]("alloc_tokens") == alloc)
      assert(r.getAs[Long]("epochs_x100") == alloc * 100 / r.getAs[Long]("total_tokens"))
    }
    // allocations never exceed the budget (integer floor division)
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= 10000000L)
  }

  test("q70 BPE merges match a from-first-principles Scala recompute") {
    val words = new scala.collection.mutable.HashMap[String, Long]()
    graft.sources.Tables.documents(spark, sf).select("text").collect()
      .foreach(_.getString(0).split(" ").foreach(w =>
        words(w) = words.getOrElse(w, 0L) + 1L))
    var syms: Map[String, List[String]] = words.keys.map(w => w -> w.split("").toList).toMap
    val expected = (1 to 3).map { r =>
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((w, f) <- words; Seq(a, b) <- syms(w).sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + f
      val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      syms = syms.map { case (w, s) =>
        w -> s.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
      (r, a, b, cnt)
    }
    val got = TrainingData.queries("q70_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q118 BPE encode matches a from-first-principles tokenizer application") {
    // recompute: train the 3 merges in Scala (q70's spec logic), apply
    // them to every word, and total symbols per source independently
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
    val words = new scala.collection.mutable.HashMap[String, Long]()
    docs.foreach(_.getString(1).split(" ").foreach(w =>
      words(w) = words.getOrElse(w, 0L) + 1L))
    var syms: Map[String, List[String]] = words.keys.map(w => w -> w.split("").toList).toMap
    for (_ <- 1 to 3) {
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((w, f) <- words; Seq(a, b) <- syms(w).sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + f
      val ((a, b), _) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      syms = syms.map { case (w, s) =>
        w -> s.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    }
    val expected = docs.groupBy(_.getString(0)).view.mapValues { rs =>
      val toks = rs.flatMap(_.getString(1).split(" "))
      (toks.length.toLong,
        toks.map(_.length.toLong).sum,
        toks.map(w => syms(w).length.toLong).sum)
    }.toMap
    val got = TrainingData.queries("q118_bpe_encode")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"got $got expected $expected")
    // the merges must actually buy something on this corpus
    val rows = TrainingData.queries("q118_bpe_encode")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(4) > 0L),
      "three trained merges must save symbols in every source")
    assert(rows.forall(r => r.getLong(2) - r.getLong(3) == r.getLong(4)))
  }

  test("native graft_cdc_ids equals the HOF flags+prefix reference") {
    val tk = org.apache.spark.sql.functions.split(col("text"), " ")
    val cmp = graft.sources.Tables.documents(spark, sf)
      .select(call_function("graft_cdc_ids", tk, lit(TrainingData.cdcModulus)).as("native"),
        TrainingData.cdcIdsReference(tk).as("ref"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("q72 CDC chunks conserve the text and cut only at content boundaries") {
    val byDoc = TrainingData.queries("q72_cdc_chunking")(spark, sf).collect()
      .groupBy(_.getLong(0))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("chunk_id"))
      assert(ordered.map(_.getAs[Int]("chunk_id")).toSeq == ordered.indices)
      assert(ordered.map(_.getAs[String]("chunk")).mkString(" ") == docs(id),
        "chunks reassemble the document")
      // every cut position is a real content boundary (rolling 3-gram
      // hash divisible by the modulus) — recomputed independently
      val toks = docs(id).split(" ")
      var pos = 0
      ordered.dropRight(1).foreach { r =>
        pos += r.getAs[Long]("n_tokens").toInt
        assert(pos >= 3 &&
          h60s(toks.slice(pos - 3, pos).mkString(" ")) % TrainingData.cdcModulus == 0,
          s"doc $id cut at $pos is not a content boundary")
      }
    }
  }

  test("q55 chunking conserves tokens and respects the window") {
    val chunks = TrainingData.queries("q55_chunking")(spark, sf)
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("total"), max(col("n_tokens")).as("mx"),
        count(lit(1)).as("n_chunks"))
    val truth = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val joined = perDoc.join(truth, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("total") == r.getAs[Int]("n_tok"), "token conservation")
      assert(r.getAs[Int]("mx") <= 32)
      assert(r.getAs[Long]("n_chunks") == (r.getAs[Int]("n_tok") + 31) / 32)
    }
  }

  test("q79 matches an independent recompute from the HOF gram reference") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf)
    // independent pipeline: reference (non-native) gram hashes, then the
    // doc-count/coverage arithmetic rebuilt from scratch
    val grams = d.select(col("doc_id"),
        explode(graft.operators.TrainingData.ngramHashesReference(col("text"))).as("h"))
    val nd = grams.groupBy("h").count().withColumnRenamed("count", "nd")
    val exp = grams.join(nd, "h").groupBy("doc_id")
      .agg(count(lit(1)).as("g"), sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val out = graft.operators.TrainingData.q79DupgramCoverage(spark, sf).collect()
    assert(out.length == d.count())
    out.foreach { r =>
      val (g, dup) = exp.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getAs[Long]("n_grams") == g && r.getAs[Long]("n_dup") == dup,
        s"doc ${r.getLong(0)}")
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      if (g > 0) {
        val want = BigDecimal(dup.toDouble / g + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(f == want)
      } else assert(f == 0.0)
    }
  }

}
