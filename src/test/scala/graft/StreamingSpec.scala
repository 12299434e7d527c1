package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.streaming.{Ingest, Monitor}
import graft.streaming.Monitor.{Gauge, RegionEvent}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------ envelope
  test("envelope projection: region routing + topic naming on a batch frame") {
    // derive an event_id landing in each region via the synthetic-point formula
    def region(id: Long): String = {
      val lon = (-1300 + id % 660) / 10.0
      val lat = (240 + (id * 7919) % 260) / 10.0
      graft.operators.Geo.usaCatalog.sortBy(_.id).find(r =>
        lon >= math.min(r.east, r.west) && lon <= math.max(r.east, r.west) &&
          lat >= r.south && lat <= r.north).map(_.id).getOrElse("NONE")
    }
    val ids = (0L until 660L)
    val usa0 = ids.find(region(_) == "USA0").get
    val usa1 = ids.find(region(_) == "USA1").get
    val none = ids.find(region(_) == "NONE").get
    val events = Seq(usa0, usa1, none).map(i =>
      (i, ts("2024-01-01 00:00:00"), 1L, "click", 1.0, s"props-$i"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Ingest.envelope(spark, events).collect()
    assert(out.length == 2, "NONE row must be dropped")
    val byId = out.map(r => r.getAs[String]("id").toLong -> r).toMap
    assert(byId(usa0).getAs[String]("topic") == "raw-tweets-USA0")
    assert(byId(usa1).getAs[String]("topic") == "raw-tweets-USA1")
    assert(byId(usa0).getAs[String]("text") == s"props-$usa0")
    assert(byId(usa0).getAs[String]("region_data").contains("\"USA0\""))
  }

  // --------------------------------------------------- windowed counting
  test("streaming 30s tumbling region counts over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegionEvent]
    val query = Monitor.regionCounts(input.toDF())
      .writeStream.format("memory").queryName("rc").outputMode("update").start()
    try {
      input.addData(
        RegionEvent("USA0", ts("2024-01-01 10:00:05")),
        RegionEvent("USA0", ts("2024-01-01 10:00:25")),
        RegionEvent("USA1", ts("2024-01-01 10:00:35")))
      query.processAllAvailable()
      val rows = spark.table("rc").collect()
        .map(r => (r.getAs[Timestamp]("w_start").toString, r.getAs[String]("region")) -> r.getAs[Long]("n"))
        .toMap
      assert(rows(("2024-01-01 10:00:00.0", "USA0")) == 2)
      assert(rows(("2024-01-01 10:00:30.0", "USA1")) == 1)
    } finally query.stop()
  }

  test("watermark drops events later than the delay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegionEvent]
    val query = Monitor.regionCounts(input.toDF(), watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("wm").outputMode("update").start()
    try {
      input.addData(RegionEvent("USA0", ts("2024-01-01 10:00:10")))
      query.processAllAvailable()
      // advance event time → watermark moves to 10:09 after this batch
      input.addData(RegionEvent("USA0", ts("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // now 50 minutes late vs the watermark: must be dropped
      input.addData(RegionEvent("USA0", ts("2024-01-01 10:00:11")))
      query.processAllAvailable()
      val firstWindow = spark.table("wm").collect()
        .filter(_.getAs[Timestamp]("w_start").toString == "2024-01-01 10:00:00.0")
      assert(firstWindow.nonEmpty)
      assert(firstWindow.map(_.getAs[Long]("n")).max == 1,
        "late event must not increment the closed window")
    } finally query.stop()
  }

  // -------------------------------------------------- reset-on-read gauge
  test("gauge state function: counts, resets to zero, flags stalls on timeout") {
    val fn = Monitor.gaugeFn(Some(30000L)) _
    // data branch: 3 events → emit 3, state reset to 0
    val st1 = TestGroupState.create[Long](
      Optional.empty[Long](), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out1 = fn("USA0", Iterator.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:00"))), st1).toList
    assert(out1 == List(Gauge("USA0", 3, stalled = false)))
    assert(st1.get == 0L, "reset-on-read: counter zeroed after emission")
    // timeout branch: silent region emits the stalled zero
    val st2 = TestGroupState.create[Long](
      Optional.of(0L), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out2 = fn("USA1", Iterator.empty, st2).toList
    assert(out2 == List(Gauge("USA1", 0, stalled = true)))
  }

  test("gauges stream emits per-trigger counts (reset-on-read semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegionEvent]
    val query = Monitor.gauges(input.toDS(), timeoutMs = None)
      .writeStream.format("memory").queryName("gg").outputMode("append").start()
    try {
      input.addData(Seq.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      input.addData(Seq.fill(2)(RegionEvent("USA0", ts("2024-01-01 00:00:02"))))
      query.processAllAvailable()
      val counts = spark.table("gg").collect()
        .filter(_.getAs[String]("region") == "USA0").map(_.getAs[Long]("n")).toList
      assert(counts == List(3, 2), "each trigger emits its own count, then resets")
    } finally query.stop()
  }

  // ------------------------------------------------------- e2e file slice
  test("end-to-end: file stream → envelope → per-region partitioned parquet sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // file source tails a directory — stage the table file into one
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"))
    val events = Ingest.eventsFileStream(spark, srcDir.toString)
    val query = Ingest.routedParquetSink(Ingest.envelope(spark, events), out, ckpt)
    query.awaitTermination(120000L)
    val written = spark.read.parquet(out)
    val expected = Ingest.envelope(spark, graft.sources.Tables.events(spark, sf)).count()
    assert(written.count() == expected)
    val regions = written.select("region").distinct().collect().map(_.getString(0)).toSet
    assert(regions == Set("USA0", "USA1"))
  }

  test("kafka wire e2e: started sink routes per-row topics, envelope bytes decode") {
    val out = java.nio.file.Files.createTempDirectory("graft_wire").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wire_ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_wire_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"))
    val events = Ingest.eventsFileStream(spark, srcDir.toString)
    val query = Ingest.kafkaWireSink(Ingest.envelope(spark, events), out, ckpt)
    query.awaitTermination(120000L)

    val written = spark.read.parquet(out)
    // wire schema: topic routes, key/value carry bytes
    assert(written.schema("key").dataType.typeName == "binary")
    assert(written.schema("value").dataType.typeName == "binary")
    val topics = written.select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics == Set("raw-tweets-USA0", "raw-tweets-USA1"))
    // same rows the batch-side envelope produces
    val expected = Ingest.envelope(spark, graft.sources.Tables.events(spark, sf))
    assert(written.count() == expected.count())
    // decode the value payloads: JSON envelope fields, topic/region
    // routing consistent, key bytes = id bytes (Kafka partitioning key)
    val decoded = Ingest.decodeWire(written).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      assert(r.getAs[String]("id") == r.getAs[String]("key_s"))
      assert(s"raw-tweets-${r.getAs[String]("region")}" == r.getAs[String]("topic"))
      assert(r.getAs[String]("region_data").contains(r.getAs[String]("region")))
      assert(r.getAs[String]("text") != null)
    }
  }

  test("streaming dedup within watermark drops duplicate keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegionEvent]
    val query = graft.streaming.Ingest
      .dedupedStream(input.toDF(), Seq("region", "ts"), "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        RegionEvent("USA0", ts("2024-01-01 10:00:00")),
        RegionEvent("USA0", ts("2024-01-01 10:00:00")), // in-batch dup
        RegionEvent("USA1", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      // cross-batch dup, still inside the watermark horizon
      input.addData(RegionEvent("USA0", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      val rows = spark.table("dd").collect()
      assert(rows.length == 2, s"expected 2 distinct keys, got ${rows.length}")
    } finally query.stop()
  }

  test("monitor pipeline end-to-end: windowed counts with stall flags per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    // event_id 0 maps to NONE; use ids resolving to USA0 only, so USA1
    // must come out stalled
    def regionOf(id: Long): String = {
      val lon = (-1300 + id % 660) / 10.0
      val lat = (240 + (id * 7919) % 260) / 10.0
      graft.operators.Geo.usaCatalog.sortBy(_.id).find(r =>
        lon >= math.min(r.east, r.west) && lon <= math.max(r.east, r.west) &&
          lat >= r.south && lat <= r.north).map(_.id).getOrElse("NONE")
    }
    val usa0 = (0L until 660L).find(regionOf(_) == "USA0").get
    val batches = scala.collection.mutable.ArrayBuffer.empty[Array[(String, Long, Boolean)]]
    val events = input.toDF().toDF("event_id", "ts")
    val query = Monitor.monitorQuery(spark, events, (df, _) =>
      batches += df.collect().map(r =>
        (r.getAs[String]("region"), r.getAs[Long]("n"), r.getAs[Boolean]("stalled"))))
    try {
      input.addData((usa0, ts("2024-01-01 10:00:05")), (usa0, ts("2024-01-01 10:00:07")))
      query.processAllAvailable()
      // the final micro-batch can be a data-less watermark advance; check
      // the batch that carried the counts
      val dataBatch = batches.reverse.find(_.exists(_._2 > 0)).get
      val byRegion = dataBatch.map(t => t._1 -> ((t._2, t._3))).toMap
      assert(byRegion("USA0") == ((2L, false)))
      assert(byRegion("USA1") == ((0L, true)), "silent region must be flagged")
    } finally query.stop()
  }

  test("stall supervisor restarts the query; checkpoint keeps it exactly-once") {
    val out = java.nio.file.Files.createTempDirectory("graft_rs_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rs_ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rs_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events_a.parquet"))
    def factory() = Ingest.routedParquetSink(
      Ingest.envelope(spark, Ingest.eventsFileStream(spark, srcDir.toString)), out, ckpt)
    @volatile var stalledSignal = false
    val sup = new Monitor.StallSupervisor(factory _, _ => stalledSignal, maxRestarts = 2)
    try {
      sup.query.awaitTermination(120000L)
      val perFile = Ingest.envelope(spark, graft.sources.Tables.events(spark, sf)).count()
      assert(spark.read.parquet(out).count() == perFile)
      val firstRunId = sup.query.runId

      // healthy tick: no restart
      assert(!sup.checkOnce() && sup.restartCount == 0)
      assert(sup.query.runId == firstRunId)

      // stalled region reported -> supervisor stops + restarts the query;
      // new input staged first so the fresh AvailableNow run sees it
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        srcDir.resolve("events_b.parquet"))
      stalledSignal = true
      assert(sup.checkOnce() && sup.restartCount == 1)
      assert(sup.query.runId != firstRunId, "restart must be a new run")
      sup.query.awaitTermination(120000L)
      // exactly-once across the restart: file A not re-emitted, file B once
      assert(spark.read.parquet(out).count() == 2 * perFile)

      // restart budget: once exhausted, ticks stop flapping
      assert(sup.checkOnce() && sup.restartCount == 2)
      sup.query.awaitTermination(120000L)
      assert(!sup.checkOnce() && sup.exhausted)
    } finally sup.query.stop()
  }

  test("partition upsert sink: each batch replaces only the partitions it touches") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ups").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ups_ckpt").toString
    val input = MemoryStream[RegionEvent]
    def start() = Ingest.partitionUpsertSink(
      input.toDF(), root, Seq("region"), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // batch 1: one row in each region partition
    input.addData(
      RegionEvent("USA0", ts("2024-01-01 10:00:00")),
      RegionEvent("USA1", ts("2024-01-01 10:00:00")))
    val q1 = start()
    try q1.awaitTermination(120000L) finally q1.stop()
    // batch 2: a REVISED USA0 slice only — USA1 must survive untouched
    input.addData(
      RegionEvent("USA0", ts("2024-01-02 11:00:00")),
      RegionEvent("USA0", ts("2024-01-02 12:00:00")))
    val q2 = start()
    try q2.awaitTermination(120000L) finally q2.stop()
    val rows = spark.read.parquet(root).collect()
      .map(r => (r.getAs[String]("region"), r.getAs[Timestamp]("ts").toString)).toSet
    assert(rows == Set(
      ("USA0", "2024-01-02 11:00:00.0"),
      ("USA0", "2024-01-02 12:00:00.0"),
      ("USA1", "2024-01-01 10:00:00.0")),
      s"USA0 replaced by batch 2, USA1 kept from batch 1; got $rows")
  }

  test("streaming quality gate: stream verdicts equal the batch chain; audit + replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft_qgate_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_qgate_ckpt").toString
    val auditDir = java.nio.file.Files.createTempDirectory("graft_qgate_audit").toString
    // real corpus docs so several rules actually fire, split in two batches
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val q = Ingest.qualityGateSink(
      input.toDF().toDF("doc_id", "source", "text"), outDir, ckpt, auditDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      // batch 1 includes a same-id re-delivery — judged once
      input.addData((b2 :+ b2.head).toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, s"gate must survive both batches: ${q.exception}")
    } finally q.stop()
    // the static chain over the same corpus is the ground truth
    val staticJudged = graft.functions.Text.withFilterVerdict(
      graft.sources.Tables.documents(spark, sf).select("doc_id", "source", "text"))
    val expectKept = staticJudged.filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotKept = spark.read.parquet(outDir).select("doc_id").collect()
      .map(_.getLong(0))
    assert(gotKept.length == gotKept.toSet.size, "re-delivered doc judged once")
    assert(gotKept.toSet == expectKept, "stream-kept set ≡ batch-kept set")
    // audit waterfall: summed across batches it must equal the batch query
    val audit = spark.read.parquet(auditDir)
      .groupBy("source", "verdict").agg(sum("n_docs").as("n_docs"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expectAudit = staticJudged.groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(audit == expectAudit, s"audit mismatch: $audit vs $expectAudit")
    // replay: re-delivering batch 1's data as a NEW run (fresh checkpoint,
    // same dirs) rewrites only its own batch partitions — totals unchanged
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_qgate_ckpt2").toString
    val input2 = MemoryStream[(Long, String, String)]
    val q2 = Ingest.qualityGateSink(
      input2.toDF().toDF("doc_id", "source", "text"), outDir, ckpt2, auditDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try { input2.addData(b1.toSeq); q2.processAllAvailable() } finally q2.stop()
    val keptAfterReplay = spark.read.parquet(outDir).select("doc_id").collect()
      .map(_.getLong(0))
    assert(keptAfterReplay.length == keptAfterReplay.toSet.size &&
      keptAfterReplay.toSet == expectKept,
      "replayed batch overwrites its own partition — no duplicates, no loss")
  }

  test("streaming dedup gate: all-skip first batch, same-id re-delivery in one batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gate_e").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_e_ckpt").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft_gate_e_idx").toString
    val freshText = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt"
    val corpus = Seq(
      (1000L, "spark join table scan row value part hash merge batch line sort"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = Ingest.dedupGateSink(input.toDF().toDF("doc_id", "text"),
      graft.operators.Dedup.bandedIndex(corpus), root, ckpt, idxDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 0: EVERY doc is a corpus dup -> zero ingests -> the delta
      // write is an empty dynamic-partition overwrite that leaves idxDir
      // holding only a _SUCCESS marker. Batch 1 then reads the index dir;
      // schema inference over a data-file-less directory would throw
      // (AnalysisException) and kill the stream — the explicit-schema
      // read must survive it.
      input.addData(
        (1L, "spark join table scan row value part hash merge batch line sort"))
      q.processAllAvailable()
      // batch 1: same-id re-delivery inside ONE batch (doc 2 twice) plus
      // a fresh doc; the gate must collapse the twin rows to one decision
      input.addData((2L, freshText), (2L, freshText))
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"stream must survive an all-skip first batch: ${q.exception}")
    } finally q.stop()
    val rows = spark.read.parquet(root).collect()
    assert(rows.count(_.getAs[Long]("doc_id") == 2L) == 1,
      "same-id rows in one batch collapse to a single decision")
    val d = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(d(1L) == "skip" && d(2L) == "ingest")
  }

  test("streaming dedup gate: corpus, accumulated-index and in-batch dups skipped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_ckpt").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft_gate_idx").toString
    val freshText = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt"
    // static corpus: two already-ingested docs -> banded signature index
    val corpus = Seq(
      (1000L, "spark join table scan row value part hash merge batch line sort"),
      (1001L, "stream window batch data column agg filter group vector key slow fast"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.bandedIndex(corpus)
    val input = MemoryStream[(Long, String)]
    val q = Ingest.dedupGateSink(input.toDF().toDF("doc_id", "text"), index,
      root, ckpt, idxDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 0: a near-dup of corpus doc 1000, a fresh doc, and an
      // IN-BATCH duplicate of that fresh doc (higher id -> keep-first)
      input.addData(
        (1L, "spark join table scan row value part hash merge batch line sort"),
        (2L, freshText),
        (4L, freshText))
      q.processAllAvailable()
      // batch 1: a copy of corpus doc 1001, and a copy of doc 2 - which
      // only the ACCUMULATED index (not the static corpus) can catch
      input.addData(
        (3L, "stream window batch data column agg filter group vector key slow fast"),
        (5L, freshText))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(root).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("decision"), Option(r.get(1)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(rows(1L) == (("skip", Some(1000L))))
    assert(rows(2L) == (("ingest", None)))
    assert(rows(4L) == (("skip", Some(2L))), "in-batch duplicate keeps the lowest id")
    assert(rows(3L) == (("skip", Some(1001L))))
    assert(rows(5L) == (("skip", Some(2L))), "accumulated index catches batch-0 ingests")
    // REPLAY: a fresh run (new checkpoint, SAME index dir) re-delivering
    // batch 0 must REWRITE partition batch=0, not append - and because
    // the durable index now already contains doc 2's delta, this also
    // exercises the old!=new self-match guard: doc 2 must still say
    // "ingest" (its own signature is in the index) while doc 4 still
    // matches doc 2.
    val before = spark.read.parquet(root).count()
    val input2 = MemoryStream[(Long, String)]
    input2.addData(
      (1L, "spark join table scan row value part hash merge batch line sort"),
      (2L, freshText),
      (4L, freshText))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_gate_ckpt2").toString
    val q2 = Ingest.dedupGateSink(input2.toDF().toDF("doc_id", "text"), index,
      root, ckpt2, idxDir)
    try q2.awaitTermination(120000L) finally q2.stop()
    val after = spark.read.parquet(root)
    assert(after.count() == before, "replayed batch rewrites, never duplicates")
    assert(after.filter(col("doc_id") === 1L).count() == 1L)
    val replayed = after.filter(col("batch") === 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(replayed(2L) == "ingest", "a doc must not match its own indexed signature")
    assert(replayed(4L) == "skip")
    // cross-RUN dup caught via the durable index: a fresh sink instance
    // sees batch-0's delta even though its driver state is brand new
    val input3 = MemoryStream[(Long, String)]
    input3.addData((6L, freshText))
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft_gate_ckpt3").toString
    val q3 = Ingest.dedupGateSink(input3.toDF().toDF("doc_id", "text"), index,
      root, ckpt3, idxDir)
    try q3.awaitTermination(120000L) finally q3.stop()
    val run3 = spark.read.parquet(root).filter(col("doc_id") === 6L).collect()(0)
    assert(run3.getAs[String]("decision") == "skip" &&
      run3.getAs[Long]("matched_doc") == 2L,
      "durable index must catch duplicates across separate runs")
  }

  test("streaming session windows: merge within gap, finalize past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegionEvent]
    val query = input.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(col("region"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("region"), col("session_window.start").as("s_start"), col("n"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(
        RegionEvent("USA0", ts("2024-01-01 10:00:00")),
        RegionEvent("USA0", ts("2024-01-01 10:02:00")), // within gap: same session
        RegionEvent("USA0", ts("2024-01-01 10:20:00"))) // past gap: new session
      query.processAllAvailable()
      // advance event time so the watermark closes both sessions
      input.addData(RegionEvent("USA1", ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getAs[Timestamp]("s_start").toString, r.getAs[Long]("n"))).toSet
      assert(rows == Set(("2024-01-01 10:00:00.0", 2L), ("2024-01-01 10:20:00.0", 1L)),
        s"got $rows")
    } finally query.stop()
  }

  test("stream-stream join: attribution within horizon, outside-horizon dropped") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[RegionEvent]
    val purchases = MemoryStream[RegionEvent]
    val joined = graft.streaming.Joins.windowedAttribution(
      clicks.toDF(), purchases.toDF(), key = "region", horizonSec = 600L)
    val query = joined.select(col("l_region"), col("l_ts"), col("r_ts"))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      purchases.addData(
        RegionEvent("USA0", ts("2024-01-01 10:00:00")),
        RegionEvent("USA1", ts("2024-01-01 09:00:00")))
      clicks.addData(
        RegionEvent("USA0", ts("2024-01-01 10:05:00")), // 5 min after: in horizon
        RegionEvent("USA1", ts("2024-01-01 10:05:00")), // 65 min after: outside
        RegionEvent("USA0", ts("2024-01-01 09:55:00"))) // before purchase: no match
      query.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getAs[String]("l_region"), r.getAs[Timestamp]("l_ts").toString))
      assert(rows.toSet == Set(("USA0", "2024-01-01 10:05:00.0")),
        s"only the in-horizon click joins, got ${rows.mkString(",")}")
    } finally query.stop()
  }

  test("stalled-region batch check flags silent catalog regions") {
    val counts = Seq(("USA0", 5L)).toDF("region", "n")
    val stalled = Monitor.stalledRegions(spark, counts).collect().map(_.getString(0))
    assert(stalled.toSet == Set("USA1"))
  }

  test("streaming funnel: bounded state advances in order, pre-signup events ignored") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Funnel
    val input = MemoryStream[Funnel.FunnelEvent]
    val q = Funnel.funnelProgress(input.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      // batch 0: a click BEFORE any signup must not count; the signup lands
      input.addData(
        Funnel.FunnelEvent(1L, "click", ts("2024-01-01 10:00:00")),
        Funnel.FunnelEvent(1L, "signup", ts("2024-01-01 10:05:00")),
        Funnel.FunnelEvent(2L, "purchase", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val b0 = spark.table("funnel").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("steps")).toMap
      assert(b0 == Map(1L -> 1), s"only user 1 advanced (to signup), got $b0")
      // batch 1: click then purchase arrive together -> folded in event-time
      // order, user 1 reaches step 3 in one update
      input.addData(
        Funnel.FunnelEvent(1L, "purchase", ts("2024-01-01 10:15:00")),
        Funnel.FunnelEvent(1L, "click", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      val rows = spark.table("funnel").collect()
      val last = rows.filter(_.getAs[Long]("user_id") == 1L)
        .maxBy(_.getAs[Int]("steps"))
      assert(last.getAs[Int]("steps") == 3)
      assert(last.getAs[java.sql.Timestamp]("click_ts").toString == "2024-01-01 10:10:00.0")
      assert(rows.count(_.getAs[Long]("user_id") == 2L) == 0,
        "a purchase with no signup/click never emits")
      // microsecond precision: a click 500us after its signup (same
      // millisecond) must still advance — ms-truncated state would
      // reject it where batch q80 counts it
      val su = ts("2024-01-01 11:00:00")
      val ck = ts("2024-01-01 11:00:00"); ck.setNanos(500000)
      input.addData(
        Funnel.FunnelEvent(3L, "signup", su),
        Funnel.FunnelEvent(3L, "click", ck))
      q.processAllAvailable()
      val u3 = spark.table("funnel").collect()
        .filter(_.getAs[Long]("user_id") == 3L).maxBy(_.getAs[Int]("steps"))
      assert(u3.getAs[Int]("steps") == 2,
        "sub-millisecond ordering must survive the state round-trip")
      assert(u3.getAs[java.sql.Timestamp]("click_ts").getNanos == 500000)
    } finally q.stop()
  }

  test("expiring funnel state fn: timeout evicts, activity re-arms, transitions shared") {
    import graft.streaming.Funnel
    val fn = Funnel.expiringStepFn(600000L) _ // 10 min idle gap
    // timeout branch: state removed, nothing emitted
    val stT = TestGroupState.create[Funnel.FunnelState](
      Optional.of(Funnel.FunnelState(Some(1L), Some(2L), None)),
      GroupStateTimeout.EventTimeTimeout, 1000L, Optional.of(5000L),
      hasTimedOut = true)
    assert(fn(1L, Iterator.empty, stT).isEmpty)
    assert(stT.isRemoved, "idle user's state must be evicted")
    // active branch: same transition as the non-expiring stepFn, and
    // the eviction clock armed to last activity + gap
    val stA = TestGroupState.create[Funnel.FunnelState](
      Optional.empty[Funnel.FunnelState](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(0L), hasTimedOut = false)
    val out = fn(7L, Iterator(
      Funnel.FunnelEvent(7L, "signup", ts("2024-01-01 10:00:00"))), stA).toList
    assert(out.map(p => (p.user_id, p.steps)) == List((7L, 1)))
    assert(stA.getTimeoutTimestampMs.get ==
      ts("2024-01-01 10:00:00").getTime + 600000L)
  }

  test("expiring funnel e2e: watermark evicts idle user; active path matches q80 twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Funnel
    val input = MemoryStream[Funnel.FunnelEvent]
    val q = Funnel.funnelProgressExpiring(input.toDS(), "0 seconds",
        java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("funnel_exp")
      .outputMode("update").start()
    try {
      // batch 0: user 1 signs up and clicks → state armed to 10:05+10m
      input.addData(
        Funnel.FunnelEvent(1L, "signup", ts("2024-01-01 10:00:00")),
        Funnel.FunnelEvent(1L, "click", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // batch 1: unrelated activity pushes the watermark to 11:00
      input.addData(Funnel.FunnelEvent(2L, "signup", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // batch 2 (no user-1 data): watermark 11:00 > 10:15 → eviction fires
      input.addData(Funnel.FunnelEvent(2L, "click", ts("2024-01-01 11:01:00")))
      q.processAllAvailable()
      // batch 3: user 1 returns with a bare purchase — state was evicted,
      // so without signup/click it must NOT complete the funnel
      input.addData(Funnel.FunnelEvent(1L, "purchase", ts("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val u1 = spark.table("funnel_exp").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1 && u1.head.getAs[Int]("steps") == 2,
        s"only the pre-eviction progress row may exist, got ${u1.toSeq}")
      // user 2 stayed active throughout → normal progress to step 2
      val u2 = spark.table("funnel_exp").collect()
        .filter(_.getAs[Long]("user_id") == 2L).map(_.getAs[Int]("steps"))
      assert(u2.sorted.toSeq == Seq(1, 2))
    } finally q.stop()
    // active-path parity: with no eviction in play, the expiring and
    // open-ended variants emit identical rows for identical input
    val a = MemoryStream[Funnel.FunnelEvent]
    val b = MemoryStream[Funnel.FunnelEvent]
    val qa = Funnel.funnelProgress(a.toDS())
      .writeStream.format("memory").queryName("fp_plain").outputMode("update").start()
    val qb = Funnel.funnelProgressExpiring(b.toDS(), "0 seconds",
        java.time.Duration.ofDays(365))
      .writeStream.format("memory").queryName("fp_exp").outputMode("update").start()
    try {
      val evs = Seq(
        Funnel.FunnelEvent(5L, "signup", ts("2024-02-01 09:00:00")),
        Funnel.FunnelEvent(5L, "click", ts("2024-02-01 09:10:00")),
        Funnel.FunnelEvent(5L, "purchase", ts("2024-02-01 09:20:00")),
        Funnel.FunnelEvent(6L, "click", ts("2024-02-01 09:00:00")))
      a.addData(evs); b.addData(evs)
      qa.processAllAvailable(); qb.processAllAvailable()
      def rows(t: String) = spark.table(t).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("steps"),
          r.getAs[Timestamp]("signup_ts"), r.getAs[Timestamp]("click_ts"),
          r.getAs[Timestamp]("purchase_ts"))).toSet
      assert(rows("fp_plain") == rows("fp_exp"),
        "active users must see byte-identical output from both variants")
      assert(rows("fp_plain").nonEmpty)
    } finally { qa.stop(); qb.stop() }
  }

  test("streaming funnel state persists across batches on the RocksDB state store") {
    // the 100 TB state backend (Session.withRocksDBStateStore): same
    // funnel semantics, but per-user state lives in embedded RocksDB.
    // The provider is read from session conf at query start, so it is
    // set for this query and restored after.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Funnel
    // apply the exact pairs Session.withRocksDBStateStore ships (provider
    // + changelog checkpointing), so the helper's config is what runs
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[Funnel.FunnelEvent]
      val q = Funnel.funnelProgress(input.toDS())
        .writeStream.format("memory").queryName("funnel_rocks")
        .outputMode("update").start()
      try {
        input.addData(
          Funnel.FunnelEvent(1L, "signup", ts("2024-01-01 10:00:00")),
          Funnel.FunnelEvent(1L, "click", ts("2024-01-01 10:05:00")))
        q.processAllAvailable()
        // second batch: the purchase only counts if the click state
        // written to RocksDB in batch 0 is read back in batch 1
        input.addData(Funnel.FunnelEvent(1L, "purchase", ts("2024-01-01 10:10:00")))
        q.processAllAvailable()
        val last = spark.table("funnel_rocks").collect()
          .filter(_.getAs[Long]("user_id") == 1L).maxBy(_.getAs[Int]("steps"))
        assert(last.getAs[Int]("steps") == 3,
          "state must round-trip through RocksDB across micro-batches")
        // prove the query really ran on RocksDB, not the default heap
        // store: the state operator reports rocksdb custom metrics
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb state metrics, got ${metrics.keySet}")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("state data source: a stopped query's state reads back as a DataFrame") {
    // run a stateful aggregation with a checkpoint, stop it, then audit
    // its state from the checkpoint alone — the ops workflow StateInspect
    // wraps. The state must equal what the query last emitted.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_ckpt").toString
    val input = MemoryStream[RegionEvent]
    val q = input.toDF().groupBy("region").count()
      .writeStream.format("memory").queryName("state_src")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:01"))))
      input.addData(RegionEvent("USA1", ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
    } finally q.stop()
    val st = graft.streaming.StateInspect.stateRows(spark, ckpt)
      .selectExpr("key.region AS region", "value.count AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("USA0" -> 3L, "USA1" -> 1L),
      s"checkpoint state must match the aggregation, got $st")
    val md = graft.streaming.StateInspect.stateMetadata(spark, ckpt).collect()
    assert(md.length == 1)
    assert(md.head.getAs[String]("operatorName") == "stateStoreSave")
  }

  test("streaming heavy hitters on MapState: MG transitions match the batch Aggregator across batches") {
    // Tws.trendingTws = HeavyHitters.MGAgg as continuous MapState. The
    // token script is chosen so every MG transition is order-independent
    // (distinct keys stay <= k until the decrement batch, which is a
    // single row), making the expected sketch computable by hand:
    //   b1: 5xa 3xb            -> {a:5, b:3}, n=8   (exact: <= k keys)
    //   b2: 4xa + c,d,e,f,g,h  -> {a:9, b:3, c..h:1}, n=18 (8 keys = k)
    //   b3: 1xz (map full)     -> decrement-all: {a:8, b:2}, n=19
    // b2/b3 only work if b1/b2's counters round-trip through MapState.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[Tws.RegionToken]
      val q = Tws.trendingTws(input.toDS())
        .writeStream.format("memory").queryName("mg_tws")
        .outputMode("update").start()
      try {
        def batch(tokens: Seq[String]): Array[(String, Long, Long)] = {
          val mark = spark.table("mg_tws").count()
          input.addData(tokens.map(t => Tws.RegionToken("USA0", t)))
          q.processAllAvailable()
          spark.table("mg_tws").collect().drop(mark.toInt)
            .map(r => (r.getAs[String]("token"), r.getAs[Long]("est"),
              r.getAs[Long]("n")))
        }
        val b1 = batch(Seq.fill(5)("a") ++ Seq.fill(3)("b"))
        assert(b1.toSeq == Seq(("a", 5L, 8L), ("b", 3L, 8L)), s"got ${b1.toSeq}")
        val b2 = batch(Seq.fill(4)("a") ++ Seq("c", "d", "e", "f", "g", "h"))
        assert(b2.head == (("a", 9L, 18L)) && b2.length == 8,
          s"counters must survive the batch boundary, got ${b2.toSeq}")
        val b3 = batch(Seq("z"))
        assert(b3.toSeq == Seq(("a", 8L, 19L), ("b", 2L, 19L)),
          s"decrement-all on a full sketch, got ${b3.toSeq}")
        // the streamed sketch equals the batch Aggregator over the same
        // row sequence — transition parity by construction
        val allTokens = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
          Seq.fill(4)("a") ++ Seq("c", "d", "e", "f", "g", "h", "z")
        val batchBuf = allTokens.foldLeft(
          graft.functions.HeavyHitters.MGAgg.zero)(
          graft.functions.HeavyHitters.MGAgg.reduce)
        assert(batchBuf.counts == Map("a" -> 8L, "b" -> 2L) &&
          batchBuf.processed == 19L, s"got $batchBuf")
        // MG guarantees on the final state: est <= exact, no false
        // negatives above n/(k+1), candidate set bounded by k
        val exact = allTokens.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
        val thr = 19.0 / (graft.functions.HeavyHitters.k + 1)
        assert(batchBuf.counts.forall { case (t, c) => c <= exact(t) })
        assert(exact.filter(_._2 > thr).keySet.subsetOf(batchBuf.counts.keySet))
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming KLL quantiles on ValueState: cumulative sketch matches a " +
      "batch-built one across batches, count exact per region") {
    // Tws.quantilesTws = q125's KLL blob as continuous ValueState. The
    // script keeps every region's total under the sketch's k (=200), so
    // NO compaction fires and the sketch stores every value — quantiles
    // are exact order statistics and byte-level randomness is out of
    // play: the streamed result after 3 batches must EQUAL a one-pass
    // sketch built over the same values (parity by construction:
    // handleInputRows folds through Sketches.kllMergeBlobs itself).
    // b2/b3 only work if b1/b2's blob round-trips through RocksDB.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    import graft.operators.Sketches
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[Tws.RegionValue]
      val q = Tws.quantilesTws(input.toDS())
        .writeStream.format("memory").queryName("kll_tws")
        .outputMode("update").start()
      try {
        def batch(vals: Seq[(String, Double)]): Map[String, (Long, Double, Double)] = {
          val mark = spark.table("kll_tws").count()
          input.addData(vals.map { case (r, v) => Tws.RegionValue(r, v) })
          q.processAllAvailable()
          spark.table("kll_tws").collect().drop(mark.toInt)
            .map(r => r.getAs[String]("region") ->
              ((r.getAs[Long]("n"), r.getAs[Double]("p50"),
                r.getAs[Double]("p95")))).toMap
        }
        val b1 = batch((1 to 10).map(i => "USA0" -> i.toDouble))
        assert(b1("USA0")._1 == 10L, s"b1 count, got $b1")
        val b2 = batch((11 to 30).map(i => "USA0" -> i.toDouble) ++
          Seq("USA1" -> 100.0, "USA1" -> 200.0))
        assert(b2("USA0")._1 == 30L,
          s"the blob must survive the batch boundary, got $b2")
        assert(b2("USA1")._1 == 2L, "regions key independent sketches")
        val b3 = batch(Seq("USA0" -> 0.5))
        assert(b3("USA0")._1 == 31L, s"b3 count, got $b3")
        // parity: a one-pass sketch over the same per-region sequences
        // answers identically (n < k: exact, no randomness in play)
        val usa0 = (1 to 30).map(_.toDouble) :+ 0.5
        val inc = org.apache.datasketches.quantilescommon
          .QuantileSearchCriteria.INCLUSIVE
        val ref = org.apache.datasketches.kll.KllDoublesSketch
          .newHeapInstance(Sketches.kllK)
        usa0.foreach(ref.update)
        assert(b3("USA0")._2 == ref.getQuantile(0.5, inc) &&
          b3("USA0")._3 == ref.getQuantile(0.95, inc),
          s"streamed quantiles must equal the batch-built sketch's: " +
            s"${b3("USA0")} vs (${ref.getQuantile(0.5, inc)}, " +
            s"${ref.getQuantile(0.95, inc)})")
        // and those are plain order statistics of the value multiset
        assert(b3("USA0")._2 == usa0.sorted.apply(
          math.ceil(0.5 * usa0.size).toInt - 1))
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rolling feature window on ListState: append path, overflow trim, late arrival — across batches") {
    // Tws.featureWindowTws: last-maxN per-user features. Batch script
    // (maxN = 4, one user):
    //   b1: values 1,2,3 @ 10:01..10:03      -> n=3 mean=2   (append path)
    //   b2: values 4,5   @ 10:04..10:05      -> n=4 {2,3,4,5} (overflow trim)
    //   b3: value 10     @ 10:04:30 (LATE)   -> n=4 {4, 10, 5} +3? ->
    //       merged {3,4,10,5} by ts: (10:03,3)(10:04,4)(10:04:30,10)(10:05,5)
    //       -> mean=5.5, max=10, latest stays 10:05
    // b2/b3 prove the buffer written in earlier batches (incl. via the
    // merge-op append) reads back in later ones.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[Tws.UserValue]
      val q = Tws.featureWindowTws(input.toDS(), maxN = 4)
        .writeStream.format("memory").queryName("fw_tws")
        .outputMode("update").start()
      try {
        var nextId = 0L
        def batch(vals: (Double, String)*): (Int, Double, Double, Double, Long) = {
          val mark = spark.table("fw_tws").count()
          input.addData(vals.map { case (v, t) =>
            nextId += 1; Tws.UserValue(7L, nextId, v, ts(t))
          })
          q.processAllAvailable()
          val r = spark.table("fw_tws").collect().drop(mark.toInt)
          assert(r.length == 1, s"one user -> one feature row, got ${r.toSeq}")
          (r.head.getAs[Int]("n"), r.head.getAs[Double]("mean"),
            r.head.getAs[Double]("vmin"), r.head.getAs[Double]("vmax"),
            r.head.getAs[Long]("latest_us"))
        }
        def us(t: String): Long =
          java.time.temporal.ChronoUnit.MICROS.between(
            java.time.Instant.EPOCH, ts(t).toInstant)
        val b1 = batch((1.0, "2024-01-01 10:01:00"), (2.0, "2024-01-01 10:02:00"),
          (3.0, "2024-01-01 10:03:00"))
        assert(b1 == ((3, 2.0, 1.0, 3.0, us("2024-01-01 10:03:00"))), s"got $b1")
        val b2 = batch((4.0, "2024-01-01 10:04:00"), (5.0, "2024-01-01 10:05:00"))
        assert(b2 == ((4, 3.5, 2.0, 5.0, us("2024-01-01 10:05:00"))),
          s"overflow must evict the OLDEST entry, got $b2")
        val b3 = batch((10.0, "2024-01-01 10:04:30"))
        assert(b3 == ((4, 5.5, 3.0, 10.0, us("2024-01-01 10:05:00"))),
          s"late arrival slots by event time and evicts the oldest, got $b3")
        // the pinned late-data contract: an event older than the FULL
        // window's oldest entry (10:03) is dropped by the trim — exactly
        // what the batch twin does (it's outside the global last-4), so
        // parity holds for arbitrarily-late arrivals too
        val b4 = batch((99.0, "2024-01-01 10:00:00"))
        assert(b4 == b3,
          s"an arbitrarily-late event must not displace the kept window, got $b4")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("feature window: timestamp ties at the eviction boundary break by event_id, matching q107") {
    // round-6 ADVICE: the corpus has no ts ties, so the lake parity spec
    // can't catch a tie-break divergence — this script can. Three events
    // share ONE timestamp; values are chosen so the old (tsUs, value)
    // order would keep a DIFFERENT pair than q107's (ts, event_id) order:
    //   id=1 v=5.0, id=2 v=1.0, id=3 v=3.0, all @ T, maxN=2
    //   by (ts, event_id): keep ids {2,3} -> values {1.0, 3.0}  (q107 rule)
    //   by (ts, value):    keep ids {3,1} -> values {3.0, 5.0}  (the bug)
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val tieTs = ts("2024-01-01 12:00:00")
      val input = MemoryStream[Tws.UserValue]
      val q = Tws.featureWindowTws(input.toDS(), maxN = 2)
        .writeStream.format("memory").queryName("fw_ties")
        .outputMode("update").start()
      try {
        input.addData(Tws.UserValue(7L, 1L, 5.0, tieTs),
          Tws.UserValue(7L, 2L, 1.0, tieTs))
        q.processAllAvailable()
        input.addData(Tws.UserValue(7L, 3L, 3.0, tieTs)) // tie at the boundary
        q.processAllAvailable()
        val last = spark.table("fw_ties").collect().last
        assert(last.getAs[Int]("n") == 2 &&
          last.getAs[Double]("vmin") == 1.0 && last.getAs[Double]("vmax") == 3.0 &&
          last.getAs[Double]("mean") == 2.0,
          s"ties must evict the LOWEST event_id (q107's order), got $last")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("feature window: the streaming ListState twin agrees with batch q107 on the lake corpus") {
    // the feature-store contract: featureWindowTws keeps features fresh,
    // q107 backfills them over the lake — on identical input they must
    // agree. Real sf0.001 events streamed in two event-time-ordered
    // batches; each user's LAST update-mode emission is their final
    // feature row and must match the oracle-gated batch query.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val evs = graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("value"), col("ts")).collect()
        .map(r => Tws.UserValue(r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getTimestamp(3)))
        .sortBy(e => (e.ts.getTime, e.event_id))
      val (b1, b2) = evs.splitAt(evs.length / 2)
      val input = MemoryStream[Tws.UserValue]
      val q = Tws.featureWindowTws(input.toDS(), maxN = 10)
        .writeStream.format("memory").queryName("fw_parity")
        .outputMode("update").start()
      try {
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      // last emission per user = final state (memory sink appends batches
      // in order; one row per user per batch it appeared in)
      val streamed = spark.table("fw_parity").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Int]("n"), r.getAs[Double]("mean"), r.getAs[Double]("vmin"),
            r.getAs[Double]("vmax"), r.getAs[Long]("latest_us")))
        .toMap // toMap keeps the LAST occurrence per key
      val batch = graft.operators.TrainingData.q107FeatureWindow(spark, sf).collect()
      assert(batch.length == streamed.size, s"${batch.length} vs ${streamed.size}")
      batch.foreach { r =>
        val u = r.getAs[Long]("user_id")
        val (n, mean, vmin, vmax, latestUs) = streamed(u)
        assert(n.toLong == r.getAs[Long]("n"), s"user $u n")
        assert(math.abs(mean - r.getAs[Double]("mean_v")) < 1e-6, s"user $u mean")
        assert(vmin == r.getAs[Double]("min_v") && vmax == r.getAs[Double]("max_v"),
          s"user $u min/max")
        val batchUs = java.time.temporal.ChronoUnit.MICROS.between(
          java.time.Instant.EPOCH, r.getAs[java.sql.Timestamp]("latest_ts").toInstant)
        assert(latestUs == batchUs, s"user $u latest")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("state audit: q84-style rules over a real checkpoint's dedup state") {
    // "state debugging is a query", composed end-to-end: run the
    // watermarked streaming dedup against a checkpoint, then audit the
    // checkpoint's STATE STORE with the same conditional-aggregate rule
    // shape as q84 — one pass over StateInspect.stateRows computes every
    // value rule, and the referential rule is a left-anti join against
    // the emitted output. The rules a production pipeline would page on:
    //   1. no state entry outlives the watermark (eviction really runs —
    //      the unbounded-state trap made a monitored invariant),
    //   2. the dedup key is unique in state,
    //   3. every state entry corresponds to an emitted row (state and
    //      output never diverge).
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_audit_ckpt").toString
    val input = MemoryStream[RegionEvent]
    val q = Ingest.dedupedStream(input.toDF(), Seq("region", "ts"), "1 minute")
      .writeStream.format("memory").queryName("dd_audit")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(RegionEvent("USA0", ts("2024-01-01 10:00:00")),
        RegionEvent("USA0", ts("2024-01-01 10:00:00")), // dup collapses
        RegionEvent("USA1", ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      // an hour later: watermark sweeps to 10:59:0x, evicting the 10:00
      // entries (watermark updates land a batch late, so two batches)
      input.addData(RegionEvent("USA2", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(RegionEvent("USA3", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    val wmMicros = java.time.Instant.parse("2024-01-01T10:59:01.000Z")
      .toEpochMilli * 1000L
    val state = graft.streaming.StateInspect.stateRows(spark, ckpt)
      .selectExpr("key.region AS region", "key.ts AS ts",
        "value.expiresAtMicros AS expires_us")
      .localCheckpoint(true) // audited twice (agg + anti join)
    val emitted = spark.table("dd_audit")
    // value rules: ONE conditional aggregate over the state frame
    val valueRules = state.agg(
        sum(when(col("expires_us") <= lit(wmMicros), 1L).otherwise(0L))
          .as("expired_past_watermark"),
        (count(lit(1)) - countDistinct(col("region"), col("ts")))
          .as("duplicate_state_key"))
      .selectExpr("stack(2, 'expired_past_watermark', expired_past_watermark," +
        " 'duplicate_state_key', duplicate_state_key) AS (rule, violations)")
    // referential rule: state ⟕̸ output (left anti) must be empty
    val orphanRule = state
      .join(emitted, Seq("region", "ts"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("state_entry_never_emitted").as("rule"), col("violations"))
    val audit = valueRules.union(orphanRule).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("expired_past_watermark" -> 0L,
        "duplicate_state_key" -> 0L, "state_entry_never_emitted" -> 0L),
      s"state audit must be clean, got $audit")
    // and the audit has TEETH: the surviving population is exactly the
    // two post-sweep keys, so rule 1 passed against real eviction, not
    // an empty store
    val keys = state.select(col("region")).collect().map(_.getString(0)).toSet
    assert(keys == Set("USA2", "USA3"),
      s"the 10:00 entries must be swept by the watermark, got $keys")
  }

  test("gaugesTws stall timer: a silent region emits a stalled zero when its deadline fires") {
    // the ProcessingTime timer path (handleExpiredTimer) end-to-end: one
    // event arms the 1 s deadline; with no further input the engine's
    // wall-clock epochs evaluate the timer and the region emits a
    // zero-count stalled row — regionSpout.go's stalled branch as a
    // timer. Polled (not processAllAvailable, which never drains while
    // timer epochs keep scheduling); generous 60 s deadline, typical
    // fire ~2-3 s.
    implicit val sqlCtx = spark.sqlContext
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[RegionEvent]
      val q = graft.streaming.Tws.gaugesTws(input.toDS(), timeoutMs = 1000L)
        .writeStream.format("memory").queryName("tws_stall")
        .outputMode("update").start()
      try {
        input.addData(RegionEvent("USA0", ts("2024-01-01 00:00:01")))
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        def rows() = spark.table("tws_stall").collect()
        while (System.nanoTime() < deadline &&
               !rows().exists(r => r.getAs[Boolean]("stalled"))) Thread.sleep(500)
        val got = rows()
        assert(got.exists(r => r.getAs[String]("region") == "USA0" &&
            r.getAs[Long]("n") == 1L && !r.getAs[Boolean]("stalled")),
          s"the armed batch emits the live count first, got ${got.toSeq}")
        assert(got.exists(r => r.getAs[String]("region") == "USA0" &&
            r.getAs[Long]("n") == 0L && r.getAs[Boolean]("stalled")),
          s"expired timer must emit the stalled zero, got ${got.toSeq}")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("state TTL on transformWithState: idle state expires, active state survives, reader proves eviction") {
    // Tws.regionTotalsTws carries a ValueState with a REAL TTLConfig —
    // the declarative user-universe bound. Driven as restart-per-batch
    // Trigger.Once runs over one checkpoint (ProcessingTime time-mode
    // spins wall-clock timer batches under processAllAvailable/
    // AvailableNow — measured ~87 empty epochs per drain — while Once
    // runs exactly one deterministic batch), with foreachBatch as the
    // sink (the memory sink refuses checkpoint recovery).
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Tws
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    def run(ckpt: String, input: MemoryStream[RegionEvent], ttl: java.time.Duration,
            buf: scala.collection.mutable.ArrayBuffer[(String, Long)]): Unit = {
      val q = Tws.regionTotalsTws(input.toDS(), ttl)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Tws.RegionTotal], _: Long) =>
          b.collect().foreach(r => buf += ((r.region, r.total))); ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination(120000L)
      ()
    }
    try {
      // ALIVE: ttl far above the restart latency — state must ACCUMULATE
      // across query restarts (each update re-arms the TTL clock)
      val ckA = java.nio.file.Files.createTempDirectory("graft_ttl_alive").toString
      val inA = MemoryStream[RegionEvent]
      val bufA = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      inA.addData(Seq.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:01"))))
      inA.addData(RegionEvent("USA1", ts("2024-01-01 00:00:01")))
      run(ckA, inA, java.time.Duration.ofMinutes(10), bufA)
      inA.addData(RegionEvent("USA0", ts("2024-01-01 00:00:02")))
      run(ckA, inA, java.time.Duration.ofMinutes(10), bufA)
      assert(bufA.toSet == Set("USA0" -> 3L, "USA1" -> 1L, "USA0" -> 4L),
        s"live TTL state must accumulate 3 -> 4 across restarts, got $bufA")
      // the reader surfaces the TTL bookkeeping: both keys present, each
      // with a concrete expiration timestamp
      val stA = graft.streaming.StateInspect
        .stateRows(spark, ckA, stateVarName = "total")
        .selectExpr("key.value AS region", "value.value.value AS total",
          "value.ttlExpirationMs AS exp")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(stA.map(t => t._1 -> t._2).toSet == Set("USA0" -> 4L, "USA1" -> 1L),
        s"got ${stA.toSeq}")
      assert(stA.forall(_._3 > 0L), "every TTL'd value carries its expiration")

      // EXPIRED: idle past the ttl — the store itself drops the state;
      // the key restarts from zero and the READER proves the eviction
      val ckB = java.nio.file.Files.createTempDirectory("graft_ttl_expired").toString
      val inB = MemoryStream[RegionEvent]
      val bufB = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      inB.addData(Seq.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:01"))))
      inB.addData(RegionEvent("USA1", ts("2024-01-01 00:00:01")))
      run(ckB, inB, java.time.Duration.ofSeconds(3), bufB)
      Thread.sleep(4000) // both keys idle past the 3 s TTL
      inB.addData(RegionEvent("USA0", ts("2024-01-01 00:00:02")))
      run(ckB, inB, java.time.Duration.ofSeconds(3), bufB)
      assert(bufB.toList.filter(_._1 == "USA0").map(_._2) == List(3L, 1L),
        s"expired state must restart from zero, got $bufB")
      val stB = graft.streaming.StateInspect
        .stateRows(spark, ckB, stateVarName = "total")
        .selectExpr("key.value AS region", "value.value.value AS total")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(stB == Map("USA0" -> 1L),
        s"idle USA1 must be physically evicted from the store, got $stB")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("transformWithState gauges match the legacy flatMapGroupsWithState semantics") {
    // Tws.gaugesTws is Monitor.gauges on the Spark 4 arbitrary-state API;
    // TWS requires the RocksDB store, so the session conf pattern of the
    // funnel-on-RocksDB test applies. Timer disabled → deterministic.
    implicit val sqlCtx = spark.sqlContext
    val prev = Session.rocksDBConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[RegionEvent]
      val q = graft.streaming.Tws.gaugesTws(input.toDS(), timeoutMs = 0L)
        .writeStream.format("memory").queryName("gg_tws")
        .outputMode("update").start()
      try {
        input.addData(Seq.fill(3)(RegionEvent("USA0", ts("2024-01-01 00:00:01"))))
        input.addData(RegionEvent("USA1", ts("2024-01-01 00:00:01")))
        q.processAllAvailable()
        input.addData(Seq.fill(2)(RegionEvent("USA0", ts("2024-01-01 00:00:02"))))
        q.processAllAvailable()
        val rows = spark.table("gg_tws").collect()
        val usa0 = rows.filter(_.getAs[String]("region") == "USA0")
          .map(_.getAs[Long]("n")).toList
        assert(usa0 == List(3, 2), "reset-on-read per trigger, exactly like gauges")
        val usa1 = rows.filter(_.getAs[String]("region") == "USA1")
          .map(_.getAs[Long]("n")).toList
        assert(usa1 == List(1), "keys only emit on batches with their data")
        assert(rows.forall(!_.getAs[Boolean]("stalled")))
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          "TWS must be running on the RocksDB store")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

}
