package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed facts join with zero shuffle exchanges") {
    Layout.bucketizeFacts(spark, sf, buckets = 4)
    val joined = Layout.colocatedOrderRevenue(spark)
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = inner.collect { case s: ShuffleExchangeLike => s }
    // the groupBy on o_orderkey also reuses the bucket distribution:
    // bucketed-by-key tables make the whole query exchange-free
    assert(shuffles.isEmpty,
      s"expected zero exchanges over bucketed tables, got ${shuffles.size}")
  }

  test("bucketized facts survive catalog loss: attach re-declares, never re-bucketizes") {
    // re-clustering the facts is the 100 TB cost — a new JVM must
    // re-declare the published files (Published attach), not rewrite
    Layout.bucketizeFacts(spark, sf, buckets = 4)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def stamps(): Map[String, Long] =
      Seq("orders_bucketed", "lineitem_bucketed").flatMap { t =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(warehouse, t))
          .iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
          .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }.toMap
    val expected = Layout.colocatedOrderRevenue(spark).collect()
    val published = stamps()
    Seq("orders_bucketed", "lineitem_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE `$t`") // external: files survive, catalog forgets
      assert(!spark.catalog.tableExists(t))
    }
    Layout.bucketizeFacts(spark, sf, buckets = 4)
    assert(Layout.colocatedOrderRevenue(spark).collect().toSeq == expected.toSeq)
    assert(stamps() == published, "attach must not rewrite any bucketed fact file")
    // ... while a DIFFERENT requested layout is a rebuild, not a serve
    // of the mismatched files
    Layout.bucketizeFacts(spark, sf, buckets = 2)
    assert(stamps() != published, "a changed bucket layout must re-bucketize")
    // restore the ENGINE default (8): the warehouse is shared across
    // JVMs, so leaving a 4-bucket layout would force the next bench's
    // q50 to re-bucketize once and read as a noisy flag
    Layout.bucketizeFacts(spark, sf)
  }

  test("schema evolution: mergeSchema reads old and new parquet slices together") {
    // lakes evolve: an early slice lacks a column later slices carry —
    // mergeSchema must union the schemas, null-filling the old slice
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    val v1 = graft.sources.Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
    val v2 = graft.sources.Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    v1.write.parquet(s"$dir/load=1")
    v2.write.parquet(s"$dir/load=2")
    val merged = spark.read.option("mergeSchema", true).parquet(dir)
    assert(merged.columns.toSet == Set("n_nationkey", "n_name", "n_regionkey", "load"))
    val old = merged.filter(col("load") === 1)
    assert(old.count() == v1.count())
    assert(old.filter(col("n_regionkey").isNotNull).count() == 0,
      "old slice null-fills the evolved column")
    val neu = merged.filter(col("load") === 2)
    assert(neu.filter(col("n_regionkey").isNull).count() == 0)
  }

  test("CSV and JSON round-trip the orders table losslessly") {
    val orders = graft.sources.Tables.orders(spark, sf).orderBy(col("o_orderkey"))
    val schema = orders.schema
    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Layout.writeCsv(orders, csvDir)
    Layout.writeJson(orders, jsonDir)
    val fromCsv = Layout.readCsv(spark, csvDir, schema).orderBy(col("o_orderkey"))
    val fromJson = Layout.readJson(spark, jsonDir, schema).orderBy(col("o_orderkey"))
    val want = orders.collect().map(_.toSeq)
    assert(fromCsv.collect().map(_.toSeq).toSeq == want.toSeq, "CSV round-trip")
    assert(fromJson.collect().map(_.toSeq).toSeq == want.toSeq, "JSON round-trip")
  }

  test("dynamic partition overwrite replaces only the written partition") {
    val root = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    val v1 = Seq(("USA0", 1L, "old0"), ("USA1", 2L, "old1")).toDF("region", "id", "v")
    Layout.overwritePartitions(v1, root, Seq("region"))
    // capture USA1's physical files before the partial overwrite
    def usa1Files = new java.io.File(s"$root/region=USA1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSet
    val before = usa1Files
    // backfill ONLY USA0
    val v2 = Seq(("USA0", 3L, "new0")).toDF("region", "id", "v")
    Layout.overwritePartitions(v2, root, Seq("region"))
    val rows = spark.read.parquet(root).collect()
      .map(r => (r.getAs[String]("region"), r.getAs[Long]("id"), r.getAs[String]("v"))).toSet
    assert(rows == Set(("USA0", 3L, "new0"), ("USA1", 2L, "old1")),
      s"USA0 replaced, USA1 untouched; got $rows")
    assert(usa1Files == before, "sibling partition's files must not be rewritten")
  }

  test("compaction hits the target file count without losing rows") {
    val in = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    val orders = graft.sources.Tables.orders(spark, sf)
    orders.repartition(37).write.mode("overwrite").parquet(in) // small-file mess
    assert(spark.read.parquet(in).inputFiles.length >= 30)
    Layout.compact(spark, in, out, targetFiles = 4)
    assert(spark.read.parquet(out).inputFiles.length == 4)
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("ORC round-trips losslessly and pushes filters to the scan") {
    val orders = graft.sources.Tables.orders(spark, sf).orderBy(col("o_orderkey"))
    val orcDir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Layout.writeOrc(orders, orcDir)
    val back = Layout.readOrc(spark, orcDir).orderBy(col("o_orderkey"))
    assert(back.collect().map(_.toSeq).toSeq == orders.collect().map(_.toSeq).toSeq,
      "ORC round-trip")
    // same pushdown contract as parquet: the predicate reaches the ORC scan
    val filtered = Layout.readOrc(spark, orcDir).filter(col("o_orderkey") === 1L)
    val scans = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata("PushedFilters").contains("EqualTo(o_orderkey,1)"),
      s"expected pushed filter, got ${scans.head.metadata("PushedFilters")}")
  }

  test("partitioned events layout prunes by region at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Layout.writePartitionedEvents(spark, sf, out)
    val pruned = spark.read.parquet(out).filter(col("region") === "USA0")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "region predicate must become a partition filter, not a data filter")
    // pruning actually happened: the executed scan read fewer files than
    // the table holds (inputFiles on the relation is the unpruned listing).
    // collect() drives the same lazy executedPlan our scan node came from,
    // populating its metrics.
    pruned.collect()
    val readFiles = scans.head.metrics("numFiles").value
    val allFiles = spark.read.parquet(out).inputFiles.length
    assert(readFiles < allFiles,
      s"pruned scan read $readFiles of $allFiles files")
    // and the data layout round-trips
    val total = graft.operators.Geo.q19GeoAssign(spark, sf)
      .filter(col("region") === "USA0").head().getLong(1)
    assert(pruned.count() == total)
  }

  test("q77: both layouts account every row; clustering can only improve skipping") {
    val rows = Layout.q77ZonemapSkip(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val n = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows("by_orderkey").getAs[Long]("rows_total") == n)
    assert(rows("by_shipmonth").getAs[Long]("rows_total") == n)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_skippable") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("rows_skippable") <= r.getAs[Long]("rows_total"))
    }
    assert(rows("by_shipmonth").getAs[Long]("rows_skippable") >=
      rows("by_orderkey").getAs[Long]("rows_skippable"),
      "month-clustered chunks must skip at least as many rows as insertion-order chunks")
  }


  test("q88: every layout accounts every row; z-order skips at least as much as either 1-D layout") {
    val rows = Layout.q88ZorderLayout(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val n = graft.sources.Tables.lineitem(spark, sf).count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("rows_total") == n)
      assert(r.getAs[Long]("rows_skippable") <= n)
    }
    assert(rows("c_by_zorder").getAs[Long]("rows_skippable") >=
      rows("a_by_orderkey").getAs[Long]("rows_skippable"),
      "Morton clustering cannot do worse than insertion order")
    assert(rows("c_by_zorder").getAs[Long]("rows_skippable") >=
      rows("b_by_price").getAs[Long]("rows_skippable"),
      "the multi-dimensional claim: Morton must skip at least as much as " +
        "the 1-D price layout on a conjunctive predicate")
  }

}
