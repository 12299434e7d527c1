package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.sources.{Published, Snap, SnapCatalog, SnapScan, Tables}

/** The SQL catalog's contracts ([[graft.sources.SnapCatalog]]): every
  * DML verb lands content-identical to its Scala-API twin through the
  * same commit machinery, reads prune from manifest stats with
  * POST-pruning statistics (the broadcast decision sees the pruned
  * side), merge-on-read composes, and schema evolution rides the
  * format's metadata-only commits. */
class SnapCatalogSpec extends SparkSpec {

  private var ctr = 0
  private def freshCatalog(tag: String): String = {
    ctr += 1
    val root = Files.createTempDirectory(s"snapcat_$tag").toString
    val cat = s"snapcat_${tag}_$ctr"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def cust: DataFrame = Tables.customer(spark, sf) // keys 0..149
  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet
  private def tmpLoc(tag: String): HPath =
    new HPath(Files.createTempDirectory(s"snapcattwin_$tag").toString, "tbl")

  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  private def snapScans(plan: SparkPlan): Seq[SnapScan] =
    plan.collect { case b: BatchScanExec => b.scan }
      .collect { case s: SnapScan => s }

  test("SQL lifecycle ≡ Scala API: CTAS, MERGE INTO, UPDATE, DELETE, " +
      "INSERT INTO all land the same content the Snap calls land, " +
      "through the same commit machinery") {
    val cat = freshCatalog("life")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range') " +
      "AS SELECT * FROM snapcat_cust_src")
    assert(rows(spark.sql(s"SELECT * FROM $cat.t")) == rows(cust))

    val twin = tmpLoc("life")
    Snap.create(spark, twin, cust, Seq("c_custkey"), "c_custkey", 4,
      layout = "range", tag = "twin")
    def sameAsTwin(clue: String): Unit =
      assert(rows(spark.sql(s"SELECT * FROM $cat.t")) ==
        rows(Snap.read(spark, twin)), clue)

    // MERGE: updates, deletes, inserts in one statement
    val d1 = cust.filter(col("c_custkey") < 10)
      .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
      .withColumn("_deleted", lit(false))
      .unionByName(cust.filter(col("c_custkey") >= 80 && col("c_custkey") < 90)
        .withColumn("_deleted", lit(true)))
      .unionByName(cust.filter(col("c_custkey") < 2)
        .select((col("c_custkey") + 1000L).as("c_custkey"), col("c_name"),
          col("c_nationkey"), lit(9.99).as("c_acctbal"), col("c_mktsegment"))
        .withColumn("_deleted", lit(false)))
    d1.createOrReplaceTempView("snapcat_d1")
    spark.sql(
      s"""MERGE INTO $cat.t t USING snapcat_d1 s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED AND s._deleted THEN DELETE
         |WHEN MATCHED THEN UPDATE SET
         |  c_name = s.c_name, c_nationkey = s.c_nationkey,
         |  c_acctbal = s.c_acctbal, c_mktsegment = s.c_mktsegment
         |WHEN NOT MATCHED AND NOT s._deleted THEN INSERT
         |  (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
         |  VALUES (s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal,
         |          s.c_mktsegment)""".stripMargin)
    Snap.merge(spark, twin, d1)
    sameAsTwin("MERGE INTO diverged from Snap.merge")

    // UPDATE with a plain predicate
    spark.sql(s"UPDATE $cat.t SET c_acctbal = c_acctbal - 500.0 " +
      "WHERE c_custkey >= 30 AND c_custkey < 40")
    Snap.merge(spark, twin, Snap.read(spark, twin)
      .filter(col("c_custkey") >= 30 && col("c_custkey") < 40)
      .withColumn("c_acctbal", col("c_acctbal") - lit(500.0))
      .withColumn("_deleted", lit(false)))
    sameAsTwin("UPDATE diverged")

    // UPDATE that MOVES a key (delete old image + insert new)
    spark.sql(s"UPDATE $cat.t SET c_custkey = c_custkey + 9000 " +
      "WHERE c_custkey = 7")
    val moved = Snap.read(spark, twin).filter(col("c_custkey") === 7)
      .withColumn("_deleted", lit(true))
      .unionByName(Snap.read(spark, twin).filter(col("c_custkey") === 7)
        .withColumn("c_custkey", col("c_custkey") + lit(9000L))
        .withColumn("_deleted", lit(false)))
    Snap.merge(spark, twin, moved)
    sameAsTwin("key-moving UPDATE diverged")

    // DELETE
    spark.sql(s"DELETE FROM $cat.t WHERE c_custkey % 20 = 3")
    Snap.merge(spark, twin, Snap.read(spark, twin)
      .filter(col("c_custkey") % 20 === 3).withColumn("_deleted", lit(true)))
    sameAsTwin("DELETE diverged")

    // INSERT INTO (new keys; a keyed table's append)
    spark.sql(s"INSERT INTO $cat.t SELECT c_custkey + 5000, c_name, " +
      "c_nationkey, 1.5, 'INS' FROM snapcat_cust_src WHERE c_custkey < 5")
    Snap.merge(spark, twin, cust.filter(col("c_custkey") < 5)
      .select((col("c_custkey") + 5000L).as("c_custkey"), col("c_name"),
        col("c_nationkey"), lit(1.5).as("c_acctbal"),
        lit("INS").as("c_mktsegment"))
      .withColumn("_deleted", lit(false)))
    sameAsTwin("INSERT INTO diverged")

    // the SQL table's manifest chain is the machinery's: same version
    // count as the twin (create + 5 data commits), every op a merge
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "t")
    val h = Snap.head(spark, loc).get
    assert(h.version == Snap.head(spark, twin).get.version,
      "the SQL path must commit exactly the versions the Scala path does")
    // no staged debris left behind
    val leftover = Published.fsOf(loc).listStatus(loc)
      .filter(_.getPath.getName.startsWith("stage-v0-sql-"))
    assert(leftover.isEmpty, s"SQL staging not cleaned: ${leftover.toSeq}")
  }

  test("reads prune from manifest stats and report POST-pruning " +
      "statistics: a WHERE-pruned snap side broadcasts where the " +
      "unpruned estimate would shuffle") {
    val cat = freshCatalog("prune")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.p TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range') " +
      "AS SELECT * FROM snapcat_cust_src")

    val sel = spark.sql(
      s"SELECT c_custkey, c_acctbal FROM $cat.p WHERE c_custkey BETWEEN 100 AND 120")
    assert(rows(sel) == rows(cust.filter(col("c_custkey").between(100, 120))
      .select(col("c_custkey"), col("c_acctbal"))))
    val scan = snapScans(finalPlan(sel)).head
    assert(scan.plannedFiles > 0 && scan.plannedFiles < scan.totalFiles,
      s"expected a strict file subset, planned ${scan.plannedFiles} of " +
        s"${scan.totalFiles}")

    // statistics: pruned bytes strictly below the full table's
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "p")
    val fullBytes = Published.fsOf(loc)
      .listStatus(new HPath(loc, "data")).map(_.getLen).sum
    val est = scan.estimateStatistics()
    assert(est.sizeInBytes().getAsLong < fullBytes,
      "statistics must describe the PRUNED file subset")

    // the static broadcast decision: threshold BETWEEN pruned and full
    // size, big probe side → only the pruned estimate can broadcast
    val thr = (est.sizeInBytes().getAsLong + fullBytes) / 2
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      spark.range(0, 200000).createOrReplaceTempView("snapcat_big_ids")
      val j = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.p t
           |JOIN snapcat_big_ids b ON t.c_custkey = b.id
           |WHERE t.c_custkey BETWEEN 100 AND 120""".stripMargin)
      // sparkPlan = the STATIC plan (pre-AQE): this is where the
      // reported statistics decide build sides
      val static = j.queryExecution.sparkPlan
      val bhj = static.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.nonEmpty, s"expected a static broadcast join:\n$static")
      val buildSideScans = bhj.flatMap { b =>
        val side = if (b.buildSide.toString.contains("Left")) b.left else b.right
        side.collect { case s: BatchScanExec => s.scan }
          .collect { case s: SnapScan => s }
      }
      assert(buildSideScans.nonEmpty,
        s"the snap side must be the broadcast build side:\n$static")
      assert(j.collect().head.getAs[Long]("n") ==
        cust.filter(col("c_custkey").between(100, 120)).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("merge-on-read composes with the catalog read: outstanding " +
      "deltas mask base rows and serve latest images; a fold clears " +
      "the wrap") {
    val cat = freshCatalog("mor")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.m TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range','mode'='mor') " +
      "AS SELECT * FROM snapcat_cust_src")
    spark.sql(s"UPDATE $cat.m SET c_acctbal = 777.0 WHERE c_custkey < 5")
    spark.sql(s"DELETE FROM $cat.m WHERE c_custkey >= 140")
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "m")
    assert(Snap.head(spark, loc).get.deltas.nonEmpty,
      "mode=mor writes must land as merge-on-read deltas")
    // the delete-only statement landed positionally (O(positions)
    // commit bytes), not as full-width key-delta rows
    assert(Snap.head(spark, loc).get.dvs.nonEmpty,
      "a mor-mode SQL DELETE must land as a positional deletion vector")
    // content through the catalog == the engine's own MOR read
    assert(rows(spark.sql(s"SELECT * FROM $cat.m")) ==
      rows(Snap.read(spark, loc)))
    // pruned + projected + counted forms under the MOR wrap
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.m").head.getLong(0) ==
      Snap.read(spark, loc).count())
    assert(rows(spark.sql(
      s"SELECT c_custkey, c_acctbal FROM $cat.m WHERE c_custkey < 8")) ==
      rows(Snap.read(spark, loc).filter(col("c_custkey") < 8)
        .select(col("c_custkey"), col("c_acctbal"))))
    // fold → back to the stock columnar path, same content
    Snap.optimize(spark, loc)
    assert(Snap.head(spark, loc).get.deltas.isEmpty &&
      Snap.head(spark, loc).get.dvs.isEmpty)
    assert(rows(spark.sql(s"SELECT * FROM $cat.m")) ==
      rows(Snap.read(spark, loc)))
  }

  test("time travel from SQL: VERSION AS OF pins committed versions, " +
      "TIMESTAMP AS OF resolves by commit time, a branch name serves " +
      "the branch head for audit, and pinned tables refuse writes") {
    val cat = freshCatalog("tt")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range') " +
      "AS SELECT * FROM snapcat_cust_src")                     // v1
    val v1Rows = rows(cust)
    Thread.sleep(1100) // commit-time resolution rides file mtime
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(1100)
    spark.sql(s"UPDATE $cat.t SET c_acctbal = 111.0 WHERE c_custkey < 10") // v2
    val v2Rows = rows(spark.sql(s"SELECT * FROM $cat.t"))
    spark.sql(s"DELETE FROM $cat.t WHERE c_custkey >= 100")    // v3
    val v3Rows = rows(spark.sql(s"SELECT * FROM $cat.t"))
    assert(v1Rows != v2Rows && v2Rows != v3Rows)

    assert(rows(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1")) == v1Rows)
    assert(rows(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2")) == v2Rows)
    assert(rows(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 3")) == v3Rows)
    // pinned reads keep the stats-pruned scan path
    val sel = spark.sql(s"SELECT c_custkey, c_acctbal FROM $cat.t " +
      "VERSION AS OF 1 WHERE c_custkey BETWEEN 100 AND 120")
    val scan = snapScans(finalPlan(sel)).head
    assert(scan.plannedFiles < scan.totalFiles,
      "a pinned read must still prune from manifest stats")

    // TIMESTAMP AS OF between v1 and v2 serves v1; a pre-create
    // instant refuses loudly
    assert(rows(spark.sql(s"SELECT * FROM $cat.t " +
      s"TIMESTAMP AS OF timestamp_millis(${tsAfterV1}L)")) == v1Rows)
    val early = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t " +
        s"TIMESTAMP AS OF timestamp_millis(${tsAfterV1 - 3600000}L)").collect()
    }
    assert(early.getMessage.contains("no version committed at or before"),
      s"got: ${early.getMessage}")

    // a BRANCH name under VERSION AS OF serves the branch head — the
    // audit-from-SQL leg of write-audit-publish
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "t")
    graft.sources.SnapBranch.create(spark, loc, "audit")
    graft.sources.SnapBranch.merge(spark, loc, "audit",
      cust.filter(col("c_custkey") < 3)
        .withColumn("c_mktsegment", lit("BRANCHED"))
        .withColumn("_deleted", lit(false)))
    val branchSql = rows(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'audit'"))
    assert(branchSql == rows(graft.sources.SnapBranch.read(spark, loc, "audit")))
    assert(branchSql != rows(spark.sql(s"SELECT * FROM $cat.t")),
      "main must not see unpublished branch content")
    val noBranch = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
    }
    assert(noBranch.getMessage.contains("no branch"))

    // pinned tables refuse writes at the capability layer
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val tc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[TableCatalog]
    val pinnedT = tc.loadTable(Identifier.of(Array.empty[String], "t"), "1")
    assert(!pinnedT.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_WRITE))
  }

  test("stored procedures: CALL system.{optimize,vacuum,rebucket," +
      "history,retention,create/publish/drop_branch} run the engine's " +
      "maintenance verbs from SQL and return their results as rows") {
    val cat = freshCatalog("proc")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range') " +
      "AS SELECT * FROM snapcat_cust_src")
    spark.sql(s"UPDATE $cat.t SET c_acctbal = 1.0 WHERE c_custkey < 5")
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "t")
    val content = rows(spark.sql(s"SELECT * FROM $cat.t"))

    // history ≡ the Scala frame, through CALL
    assert(rows(spark.sql(s"CALL $cat.system.history('t')")) ==
      rows(Snap.history(spark, loc)))

    // retention audit: a read, one row, named-argument form binds
    val ret = spark.sql(
      s"CALL $cat.system.retention('t', keep_versions => 1)").head
    assert(ret.getAs[Long]("versions_total") == 2 &&
      ret.getAs[Long]("versions_kept") == 1)

    // optimize returns the committed (or no-op head) version;
    // content invariant
    val optV = spark.sql(s"CALL $cat.system.optimize('t')")
      .head.getAs[Int]("version")
    assert(optV == Snap.head(spark, loc).get.version)
    assert(rows(spark.sql(s"SELECT * FROM $cat.t")) == content)

    // a third data version so the default keep_versions=2 vacuum has a
    // manifest beyond the horizon to sweep
    spark.sql(s"UPDATE $cat.t SET c_acctbal = 2.0 WHERE c_custkey = 0")
    val content3 = rows(spark.sql(s"SELECT * FROM $cat.t"))
    val vac = spark.sql(s"CALL $cat.system.vacuum('t')").head
    assert(vac.getAs[Int]("manifests_deleted") >= 1)
    assert(rows(spark.sql(s"SELECT * FROM $cat.t")) == content3)

    // rebucket rewrites under the new topology; content invariant
    val rbV = spark.sql(s"CALL $cat.system.rebucket('t', 8)")
      .head.getAs[Int]("version")
    assert(Snap.head(spark, loc).get.buckets == 8 &&
      rbV == Snap.head(spark, loc).get.version)
    assert(rows(spark.sql(s"SELECT * FROM $cat.t")) == content3)

    // the whole write-audit-publish flow from SQL: fork, stage via the
    // Scala twin (branch DML is the procedures' scala lane), audit via
    // VERSION AS OF, publish, branch gone
    spark.sql(s"CALL $cat.system.create_branch('t', 'wap')")
    graft.sources.SnapBranch.merge(spark, loc, "wap",
      cust.filter(col("c_custkey") === 0)
        .withColumn("c_mktsegment", lit("AUDITME"))
        .withColumn("_deleted", lit(false)))
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'wap'")
      .filter(col("c_mktsegment") === "AUDITME").count() == 1)
    val pubV = spark.sql(s"CALL $cat.system.publish_branch('t', 'wap')")
      .head.getAs[Int]("version")
    assert(pubV == Snap.head(spark, loc).get.version &&
      Snap.head(spark, loc).get.op == "publish")
    assert(spark.sql(s"SELECT * FROM $cat.t")
      .filter(col("c_mktsegment") === "AUDITME").count() == 1)
    assert(graft.sources.SnapBranch.list(spark, loc).isEmpty)

    // drop_branch discards staged work without touching main
    spark.sql(s"CALL $cat.system.create_branch('t', 'doomed')")
    spark.sql(s"CALL $cat.system.drop_branch('t', 'doomed')")
    assert(graft.sources.SnapBranch.list(spark, loc).isEmpty)

    // unknown procedure refuses with the surface listed
    val bad = intercept[Exception] {
      spark.sql(s"CALL $cat.system.explode('t')").collect()
    }
    // Spark wraps the loader error as FAILED_TO_LOAD_ROUTINE; the
    // catalog's surface-listing message rides the cause chain
    assert(bad.getMessage.contains("FAILED_TO_LOAD_ROUTINE"))
  }

  test("native streaming sink: writeStream.toTable creates on the " +
      "first epoch and upserts per epoch, exactly-once across a " +
      "restart from the same checkpoint, refusing a foreign one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cat = freshCatalog("sink")
    spark.sql(s"CREATE TABLE $cat.s (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='k','buckets'='2','layout'='range')")
    val root = Files.createTempDirectory("snapcat_sink").toString
    val input = MemoryStream[(Long, String)]
    def start(ckpt: String) = input.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(s"$cat.s")
    val q = start(s"$root/ckpt")
    try {
      input.addData((1L, "a"), (50L, "b"), (99L, "c"))
      q.processAllAvailable()
      // deferred create fired with data-derived bounds
      val locS = new HPath(
        spark.conf.get(s"spark.sql.catalog.$cat.root"), "s")
      val h1 = Snap.head(spark, locS).get
      assert(h1.version == 1 && h1.rangeMin == 1 && h1.rangeMax == 99)
      assert(rows(spark.sql(s"SELECT * FROM $cat.s")) ==
        Set("1|a", "50|b", "99|c"))
      input.addData((50L, "B2"), (120L, "d"))
      q.processAllAvailable()
      assert(rows(spark.sql(s"SELECT * FROM $cat.s")) ==
        Set("1|a", "50|B2", "99|c", "120|d"))
    } finally q.stop()
    val locS = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "s")
    val vBefore = Snap.head(spark, locS).get.version
    // same checkpoint, new query instance: committed epochs replay as
    // nothing — no new version lands
    val q2 = start(s"$root/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(Snap.head(spark, locS).get.version == vBefore,
      "a restart over a drained checkpoint must not re-apply epochs")
    // a FOREIGN checkpoint would remap epoch ids over the same applied
    // high-water — the lineage stamp refuses it loudly
    val input3 = MemoryStream[(Long, String)]
    input3.addData((7L, "x"))
    val q3 = input3.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/ckpt_foreign")
      .toTable(s"$cat.s")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
      q3.awaitTermination(30000L)
    }
    q3.stop()
    assert(err.getMessage.contains("stream lineage") ||
      Option(err.getCause).exists(_.getMessage.contains("stream lineage")),
      s"got: ${err.getMessage}")
    // no staged debris survives the sink lifecycle: the termination
    // listener tears the stage (and its heartbeat) down on q.stop()
    def stages() = Published.fsOf(locS).listStatus(locS)
      .filter(_.getPath.getName.startsWith("stage-v0-sqlstream-"))
    val deadline = System.currentTimeMillis() + 30000L
    while (stages().nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(200L)
    assert(stages().isEmpty,
      "stopped queries must tear their stage dirs down")
  }

  test("streaming aggregate modes into the table: update-as-append " +
      "maintains a keyed aggregate; complete mode replaces per epoch; " +
      "batch INSERT OVERWRITE replaces content") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cat = freshCatalog("modes")
    val root = Files.createTempDirectory("snapcat_modes").toString

    // update mode: the aggregate's changed rows are the upsert delta
    spark.sql(s"CREATE TABLE $cat.u (w STRING, n BIGINT) " +
      "TBLPROPERTIES ('key'='w')")
    val in1 = MemoryStream[String]
    val q1 = in1.toDF().toDF("w").groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt_u").toTable(s"$cat.u")
    try {
      in1.addData("x", "y", "x")
      q1.processAllAvailable()
      assert(rows(spark.sql(s"SELECT * FROM $cat.u")) == Set("x|2", "y|1"))
      in1.addData("y")
      q1.processAllAvailable()
      assert(rows(spark.sql(s"SELECT * FROM $cat.u")) == Set("x|2", "y|2"))
    } finally q1.stop()

    // complete mode: every epoch restates the full result; the sink
    // replaces (keys absent from the epoch would be deleted)
    spark.sql(s"CREATE TABLE $cat.c (w STRING, n BIGINT) " +
      "TBLPROPERTIES ('key'='w')")
    val in2 = MemoryStream[String]
    val q2 = in2.toDF().toDF("w").groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt_c").toTable(s"$cat.c")
    try {
      in2.addData("a", "b")
      q2.processAllAvailable()
      assert(rows(spark.sql(s"SELECT * FROM $cat.c")) == Set("a|1", "b|1"))
      in2.addData("a")
      q2.processAllAvailable()
      assert(rows(spark.sql(s"SELECT * FROM $cat.c")) == Set("a|2", "b|1"))
    } finally q2.stop()

    // batch INSERT OVERWRITE: unstated keys get deleted in ONE commit
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.o TBLPROPERTIES ('key'='c_custkey'," +
      "'buckets'='2','layout'='range') AS SELECT * FROM snapcat_cust_src")
    spark.sql(s"INSERT OVERWRITE $cat.o " +
      "SELECT c_custkey, c_name, c_nationkey, 9.0, 'OW' " +
      "FROM snapcat_cust_src WHERE c_custkey < 10")
    val after = spark.sql(s"SELECT * FROM $cat.o")
    assert(after.count() == 10 &&
      rows(after.select(col("c_mktsegment")).distinct()) == Set("OW"))
    val locO = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "o")
    assert(Snap.head(spark, locO).get.version == 2,
      "the whole replacement must land as one commit")
  }

  test("metadata tables: t$history and t$files serve manifest metadata, " +
      "t$changes is batch CDF (full replay + version ranges) and the " +
      "native streaming source behind one catalog name") {
    val cat = freshCatalog("meta")
    cust.createOrReplaceTempView("snapcat_cust_src")
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (" +
      "'key'='c_custkey','buckets'='4','layout'='range') " +
      "AS SELECT * FROM snapcat_cust_src")                       // v1
    spark.sql(s"UPDATE $cat.t SET c_acctbal = 5.0 WHERE c_custkey < 10") // v2
    spark.sql(s"DELETE FROM $cat.t WHERE c_custkey >= 140")      // v3
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "t")

    // $history ≡ the engine's frame
    assert(rows(spark.sql(s"SELECT * FROM $cat.`t$$history`")) ==
      rows(Snap.history(spark, loc)))

    // $files ≡ the head manifest's file set
    val h = Snap.head(spark, loc).get
    assert(rows(spark.sql(s"SELECT path, kind FROM $cat.`t$$files`")) ==
      (h.files.map(f => s"${f.path}|base") ++
        h.deltas.map(f => s"${f.path}|delta") ++
        h.dvs.map(f => s"${f.path}|dv")).toSet)

    // $changes batch: full replay seeds the create as upserts, then
    // per-version parity with Snap.changes (upsert = insert+update)
    val cdf = spark.sql(s"SELECT * FROM $cat.`t$$changes`")
    assert(rows(cdf.filter(col("_commit_version") === 1 &&
        col("_change_type") === "upsert")
      .select(cust.columns.map(col).toSeq: _*)) == rows(cust),
      "full-replay CDF must seed the create")
    Seq(2, 3).foreach { v =>
      val ch = Snap.changes(spark, loc, v - 1, v)
      assert(rows(cdf.filter(col("_commit_version") === v &&
          col("_change_type") === "upsert")
        .select(cust.columns.map(col).toSeq: _*)) ==
        rows(ch.filter(col("_change_type").isin("insert", "update"))
          .select(cust.columns.map(col).toSeq: _*)), s"v$v upserts")
      assert(rows(cdf.filter(col("_commit_version") === v &&
          col("_change_type") === "delete").select(col("c_custkey"))) ==
        rows(ch.filter(col("_change_type") === "delete")
          .select(col("c_custkey"))), s"v$v deletes")
    }

    // a version RANGE through read options
    val ranged = spark.read.option("startingVersion", "2")
      .option("endingVersion", "2").table(s"$cat.`t$$changes`")
    assert(rows(ranged.select(col("_commit_version")).distinct()) ==
      Set("2"))

    // the same name is the native streaming source
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val ckpt = Files.createTempDirectory("snapcat_meta_ckpt").toString
    val q = spark.readStream.option("startingVersion", "1")
      .table(s"$cat.`t$$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(collected.add); ()
      }.start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = collected.asScala.toSeq
      assert(got.count(_.getAs[Int]("_commit_version") == 1) ==
        cust.count(), "stream must replay the create")
      assert(got.map(_.getAs[Int]("_commit_version")).toSet == Set(1, 2, 3))
    } finally q.stop()

    // metadata tables are read-only
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.`t$$history` VALUES " +
        "(9, 'x', 8, 8, false, 0, 0, 0, 0, 4, -1)")
    }
    assert(err.getMessage != null)
    // unknown suffix refuses with the surface listed
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.`t$$bogus`").collect()
    }
    assert(bad.getMessage.contains("unknown metadata table") ||
      bad.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
      s"got: ${bad.getMessage}")
  }

  test("DDL: CREATE + INSERT creates at first write with data-derived " +
      "bounds; ALTER TABLE ADD/RENAME COLUMN ride metadata commits; " +
      "duplicate keys in one statement refuse; DROP removes") {
    val cat = freshCatalog("ddl")
    spark.sql(s"CREATE TABLE $cat.d (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='k','buckets'='2','layout'='range')")
    // pending table reads as empty
    assert(spark.sql(s"SELECT * FROM $cat.d").count() == 0)
    spark.sql(s"INSERT INTO $cat.d VALUES (1, 'a'), (50, 'b'), (99, 'c')")
    val loc = new HPath(spark.conf.get(s"spark.sql.catalog.$cat.root"), "d")
    val h = Snap.head(spark, loc).get
    assert(h.version == 1 && h.rangeMin == 1 && h.rangeMax == 99,
      s"first-write create must derive range bounds from the DATA, got " +
        s"[${h.rangeMin},${h.rangeMax}]")
    // evolution through the catalog
    spark.sql(s"ALTER TABLE $cat.d ADD COLUMNS (w DOUBLE)")
    spark.sql(s"ALTER TABLE $cat.d RENAME COLUMN v TO label")
    spark.sql(s"INSERT INTO $cat.d VALUES (120, 'd', 2.5)")
    assert(rows(spark.sql(s"SELECT k, label, w FROM $cat.d WHERE k > 90")) ==
      Set("99|c|null", "120|d|2.5"))
    // a keyed table refuses bag inserts loudly
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.d VALUES (7, 'x', 1.0), (7, 'y', 2.0)")
    }
    assert(err.getMessage != null)
    // refused statement must not have committed anything
    assert(spark.sql(s"SELECT count(*) FROM $cat.d WHERE k = 7")
      .head.getLong(0) == 0)
    // DROP
    spark.sql(s"DROP TABLE $cat.d")
    assert(!Published.fsOf(loc).exists(loc))
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.d").collect() }
  }
}
