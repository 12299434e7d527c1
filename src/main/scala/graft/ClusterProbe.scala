package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multi-executor validation of the published-index lifecycle (r11
  * verdict ask #1): every zero-exchange pin and attach measurement so
  * far ran in one local[N] JVM where executors share the driver's
  * memory. This probe runs the q120–q124 legs under
  * `local-cluster[2,8,4096]` — two REAL worker JVMs with their own
  * heaps, the closest this sandbox gets to a cluster — and checks:
  *
  *   1. tasks actually schedule on both separate-process executors;
  *   2. each lifecycle leg returns EXACTLY the rows the single-JVM
  *      Verify dump recorded (pass the dump dir as arg 2);
  *   3. the attached tables keep their bucket layout under
  *      multi-executor scheduling: the occupancy aggregate and the
  *      cells ⋈ pq co-join plan ZERO shuffle exchanges;
  *   4. per-leg wall-clock (cold attach + warm), for PLANS.md.
  *
  * Run: `sbt package`, then
  * `sbt "runMain graft.ClusterProbe /root/testdata/sf0.01 /tmp/verify_out"`.
  * The graft classes reach the worker JVMs via `spark.jars` (the sbt
  * classpath exists only in the driver). */
object ClusterProbe {

  import ProbeKit.canon

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val compareDir = args.lift(1)
    // master via SPARK_GRAFT_MASTER (builderFromEnv wires spark.jars +
    // executor memory); default = the 2-worker arrangement, overridable
    // to e.g. local-cluster[4,4,2048] to probe more executors
    // the CLI jar arg only applies to the default-master branch; under
    // an env master builderFromEnv reads SPARK_GRAFT_JAR — silently
    // ignoring an explicit arg would test stale default-jar classes
    require(args.lift(2).isEmpty || sys.env.get("SPARK_GRAFT_MASTER").forall(_.isEmpty)
        || sys.env.contains("SPARK_GRAFT_JAR"),
      "with SPARK_GRAFT_MASTER set, pass the jar via SPARK_GRAFT_JAR, not arg 3")
    val spark = {
      if (sys.env.get("SPARK_GRAFT_MASTER").forall(_.isEmpty)) {
        val jar = new java.io.File(args.lift(2).getOrElse(
          "target/scala-2.13/connorfunstreamproducerspark_2.13-0.1.0.jar")).getAbsolutePath
        require(new java.io.File(jar).exists(), s"run `sbt package` first: $jar missing")
        Session.builder("local-cluster[2,8,4096]", 16)
          .config("spark.executor.memory", "3g")
          .config("spark.jars", jar)
      } else Session.builderFromEnv(16, 16)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. separate-process executors, and work lands on both (a small
    // corpus scan is one task — repartition so tasks outnumber one
    // executor's cores, the shape every shuffle stage has)
    import graft.sources.Tables
    val execIds = Tables.embeddings(spark, dir).repartition(16).rdd
      .mapPartitions { it =>
        val n = it.size // force the partition
        Iterator.single(s"${org.apache.spark.SparkEnv.get.executorId}:$n")
      }.collect().map(_.split(":")(0)).distinct.sorted.toSeq
    println(s"CLUSTERPROBE executors_used=$execIds")
    require(execIds.count(_ != "driver") >= 2,
      s"expected tasks on 2 separate executors, got $execIds")

    // 2 + 4. the lifecycle legs: cold first call (attach in this fresh
    // JVM) then warm; rows compared against the single-JVM Verify dump
    val legs = Seq(
      "q120_ann_search_table", "q121_ivfpq_search_table",
      "q122_index_maintain_table", "q123_index_epoch_roll",
      "q124_index_compact")
    val results = scala.collection.mutable.Map[String, Array[Row]]()
    legs.foreach { name =>
      val q = SparkEntry.queries(name)
      val t0 = System.nanoTime(); val r1 = q(spark, dir).collect()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val r2 = q(spark, dir).collect()
      val warm = (System.nanoTime() - t1) / 1e9
      require(canon(r1) == canon(r2), s"$name: warm run diverged from cold")
      results(name) = r1
      println(f"CLUSTERPROBE $name cold=$cold%.2f warm=$warm%.2f rows=${r1.length}")
    }
    compareDir.foreach { cd =>
      legs.foreach { name =>
        val expected = spark.read.parquet(s"$cd/$name").collect()
        val ok = canon(expected) == canon(results(name))
        println(s"CLUSTERPROBE $name matches_single_jvm=$ok")
        require(ok, s"$name: multi-executor result diverged from single-JVM dump")
      }
    }

    // 3. plan pins under multi-executor scheduling
    import graft.operators.Similarity
    val occ = spark.table(Similarity.indexTableName(dir, "mbase"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val occShuffles = PlanWalk.shuffles(PlanWalk.executed(occ)).size
    println(s"CLUSTERPROBE occupancy_exchanges=$occShuffles")
    require(occShuffles == 0, "bucketed occupancy aggregate must plan zero exchanges")

    val cells = spark.table(Similarity.indexTableName(dir, "cells"))
    val pq = spark.table(Similarity.indexTableName(dir, "pq"))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevR = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val p = PlanWalk.executed(cells.join(pq, Seq("cell", "vec_id")))
      val smj = PlanWalk.allNodes(p).exists {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _ => false
      }
      val nsh = PlanWalk.shuffles(p).size
      println(s"CLUSTERPROBE cojoin_smj=$smj cojoin_exchanges=$nsh")
      require(smj && nsh == 0,
        "bucket-for-bucket co-join must stay exchange-free on a real cluster")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevR)
    }
    println("CLUSTERPROBE ALL OK")
    spark.stop()
  }
}
