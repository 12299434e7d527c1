package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-Spark-job cost attribution for the COMMIT-machinery lifecycles
  * (the s05–s09 bench entries are dominated by per-commit fixed costs,
  * not data volume — this probe shows WHERE each epoch's milliseconds
  * go). Installs a listener that records every job's callsite and
  * wall-clock, runs one lifecycle, and prints the per-callsite rollup.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.CommitTrace s09"
  */
object CommitTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, String, Long)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) rows.add((e.jobId,
          s._2, (System.nanoTime() - s._1) / 1000000L))
      }
    })

    // warm-up (JIT + codegen + footer caches), cleared from the trace
    spark.read.parquet(s"$sfDir/customer.parquet").count()
    Thread.sleep(500L); rows.clear()

    val t0 = System.nanoTime()
    args.headOption.getOrElse("s09") match {
      case "s09" =>
        // mirror of Bench.nativeSinkOnce: CREATE TABLE + 6 one-file
        // epochs through the native catalog streaming sink; run TWICE
        // (fresh table + checkpoint each) so the second wall is the
        // bench's warm min-of-2 class
        val srcDir = java.nio.file.Files.createTempDirectory("ct_src").toString
        graft.sources.Tables.customer(spark, sfDir)
          .withColumn("_deleted", lit(false))
          .repartition(6).write.mode("overwrite").parquet(srcDir)
        (0 until 2).foreach { run =>
          val tR = System.nanoTime()
          val root = java.nio.file.Files.createTempDirectory("ct_s09")
          val cat = "ct_cat_" + java.lang.Long.toHexString(System.nanoTime())
          spark.conf.set(s"spark.sql.catalog.$cat",
            classOf[graft.sources.SnapCatalog].getName)
          spark.conf.set(s"spark.sql.catalog.$cat.root",
            root.resolve("wh").toString)
          spark.sql(s"CREATE TABLE $cat.t (c_custkey BIGINT, " +
            "c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE, " +
            "c_mktsegment STRING) TBLPROPERTIES (" +
            "'key'='c_custkey','buckets'='8','layout'='range')")
          val in = spark.readStream
            .schema(spark.read.parquet(srcDir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(srcDir).drop("_deleted")
            .selectExpr("CAST(c_custkey AS BIGINT) c_custkey", "c_name",
              "CAST(c_nationkey AS BIGINT) c_nationkey",
              "CAST(c_acctbal AS DOUBLE) c_acctbal", "c_mktsegment")
          val q = in.writeStream
            .option("checkpointLocation", root.resolve("ckpt").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable(s"$cat.t")
          q.awaitTermination(300000L)
          if (q.isActive) q.stop()
          println(f"CT s09 run=$run wall ${(System.nanoTime() - tR) / 1e9}%.2f s")
        }
      case "merge" =>
        // N plain Snap.merge commits (the s06/s07 per-commit unit).
        // SPARK_GRAFT_CT_NOAQE=true runs them with AQE off — an A/B of
        // how much of the per-commit fixed cost is AQE's per-stage job
        // scheduling on metadata-sized shuffles.
        if (sys.env.get("SPARK_GRAFT_CT_NOAQE").contains("true"))
          spark.conf.set("spark.sql.adaptive.enabled", "false")
        val root = java.nio.file.Files.createTempDirectory("ct_merge")
        val loc = new org.apache.hadoop.fs.Path(root.resolve("t").toString)
        val cust = graft.sources.Tables.customer(spark, sfDir)
        graft.sources.Snap.create(spark, loc, cust,
          Seq("c_custkey"), "c_custkey", 8, layout = "range", tag = "ct")
        rows.clear()
        val tM = System.nanoTime()
        (0 until 4).foreach { k =>
          graft.sources.Snap.merge(spark, loc,
            cust.filter(col("c_custkey") >= k * 20 &&
                col("c_custkey") < k * 20 + 20)
              .withColumn("c_acctbal", col("c_acctbal") + lit((k + 1).toDouble))
              .withColumn("_deleted", lit(false)))
        }
        println(f"CT 4 merges wall ${(System.nanoTime() - tM) / 1e9}%.2f s")
      case "s08" =>
        val root = java.nio.file.Files.createTempDirectory("ct_s08")
        val src = new org.apache.hadoop.fs.Path(root.resolve("src").toString)
        val dst = new org.apache.hadoop.fs.Path(root.resolve("dst").toString)
        val cust = graft.sources.Tables.customer(spark, sfDir)
        graft.sources.Snap.create(spark, src, cust,
          Seq("c_custkey"), "c_custkey", 8, layout = "range", tag = "ct")
        val q = graft.streaming.SnapFollow.followAgg(spark, src.toString,
          dst.toString, root.resolve("ckpt").toString,
          "c_nationkey", "c_acctbal",
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
        try {
          (0 until 4).foreach { k =>
            graft.sources.Snap.merge(spark, src,
              cust.filter(col("c_custkey") >= k * 20 &&
                  col("c_custkey") < k * 20 + 20)
                .withColumn("c_acctbal", col("c_acctbal") + lit((k + 1).toDouble))
                .withColumn("_deleted", lit(false)))
          }
          val deadline = System.currentTimeMillis() + 120000L
          while (graft.sources.Snap.head(spark, dst)
              .exists(_.applied < 5L) &&
              System.currentTimeMillis() < deadline) Thread.sleep(200L)
        } finally q.stop()
      case other => sys.error(s"unknown lifecycle: $other")
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // rollup: total ms and count per callsite/description
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toList
    val byDesc = all.groupBy(_._2).map { case (d, rs) =>
      (d, rs.size, rs.map(_._3).sum) }.toSeq.sortBy(-_._3)
    println(f"\nCOMMITTRACE wall=$wall%.2f s, jobs=${all.size}, " +
      f"job-ms-total=${all.map(_._3).sum}")
    byDesc.foreach { case (d, n, ms) =>
      println(f"  $ms%6d ms  n=$n%-3d  $d") }
    println("\nCOMMITTRACE job sequence:")
    all.sortBy(_._1).foreach { case (id, d, ms) =>
      println(f"  job=$id%-4d $ms%6d ms  $d") }
    spark.stop()
  }
}
