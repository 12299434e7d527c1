package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Snap, SnapSql, Tables}

/** The SQL entry for snap tables ([[graft.sources.SnapSql]]): a
  * registered view plans the manifest's files with stats pruning driven
  * by the QUERY'S OWN predicates (the Delta/Iceberg integration shape
  * rebuilt on this repo's manifests), composes with column mapping and
  * merge-on-read, and pins time travel as SQL. */
class SnapSqlSpec extends SparkSpec {

  private def tmpLoc(tag: String): HPath =
    new HPath(Files.createTempDirectory(s"snapsql_$tag").toString, "tbl")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("SQL over a range table: the query's WHERE prunes files at plan " +
      "time (strict subset), answers match the API read, joins plan") {
    val loc = tmpLoc("rng")
    val ord = Tables.orders(spark, sf) // o_orderkey 0..1499
    Snap.create(spark, loc, ord, Seq("o_orderkey"), "o_orderkey", 16,
      layout = "range", tag = "t")
    val idx = SnapSql.registerView(spark, "snap_ord_sql", loc)
    val got = spark.sql(
      "SELECT * FROM snap_ord_sql WHERE o_orderkey >= 300 AND o_orderkey <= 600")
    val expect = Snap.read(spark, loc)
      .filter(col("o_orderkey") >= 300 && col("o_orderkey") <= 600)
    assert(rows(got) == rows(expect))
    assert(idx.lastPlanned > 0 && idx.lastPlanned < idx.total,
      s"no plan-time pruning: ${idx.lastPlanned} of ${idx.total}")
    // BOTH pruning layers engage: the index skipped files above, and
    // the residual predicate still pushes into the parquet row groups
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(o_orderkey,300)"),
      s"residual predicate not pushed to parquet:\n$plan")
    // the pruned subset equals the API's own pruning decision
    val (_, apiPlanned, apiTotal) = Snap.prunedScan(spark, loc, 300L, 600L)
    assert(idx.lastPlanned == apiPlanned && idx.total == apiTotal)
    // an unfiltered query keeps everything
    assert(spark.sql("SELECT count(*) FROM snap_ord_sql").head().getLong(0) ==
      ord.count())
    assert(idx.lastPlanned == idx.total)
    // a JOIN through spark.sql plans and answers correctly
    Tables.customer(spark, sf).createOrReplaceTempView("cust_sql_spec")
    val j = spark.sql(
      """SELECT c.c_nationkey, count(*) AS n
        |FROM snap_ord_sql o JOIN cust_sql_spec c ON c.c_custkey = o.o_custkey
        |WHERE o.o_orderkey < 400 GROUP BY c.c_nationkey""".stripMargin)
    val jExpect = Snap.read(spark, loc).filter(col("o_orderkey") < 400)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    assert(rows(j) == rows(jExpect))
    assert(idx.lastPlanned < idx.total, "the join's WHERE did not prune")
  }

  test("SQL over a MOR table: deltas apply through the view, base files " +
      "still prune from the query's filter; rename maps logical SQL " +
      "names onto physical stats") {
    val loc = tmpLoc("mor")
    val cust = Tables.customer(spark, sf) // c_custkey 0..149
    Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 4,
      layout = "range", tag = "t")
    Snap.mergeMor(spark, loc, cust.filter(col("c_custkey") === 5)
      .withColumn("c_acctbal", lit(777.0)).withColumn("_deleted", lit(false)))
    Snap.mergeMor(spark, loc, cust.filter(col("c_custkey") === 120)
      .withColumn("_deleted", lit(true)))
    // rename the KEY column: SQL speaks the new logical name, the
    // stats live under the physical one
    Snap.renameColumn(spark, loc, "c_custkey", "cust_id")
    val idx = SnapSql.registerView(spark, "snap_mor_sql", loc)
    val got = spark.sql(
      "SELECT cust_id, c_acctbal FROM snap_mor_sql WHERE cust_id < 38")
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotMap(5L) == 777.0, "the MOR delta did not apply through SQL")
    assert(gotMap.size == 38)
    assert(idx.lastPlanned > 0 && idx.lastPlanned < idx.total,
      s"renamed-key filter did not prune: ${idx.lastPlanned} of ${idx.total}")
    // the delete applies through the view too
    assert(spark.sql(
      "SELECT count(*) FROM snap_mor_sql WHERE cust_id = 120")
      .head().getLong(0) == 0L)
  }

  test("time travel as SQL: an asOf view serves its pinned version; a " +
      "re-registered view follows the head") {
    val loc = tmpLoc("tt")
    val cust = Tables.customer(spark, sf)
    Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 4,
      layout = "range", tag = "t")
    Snap.merge(spark, loc, cust.filter(col("c_custkey") === 7)
      .withColumn("c_acctbal", lit(1.0)).withColumn("_deleted", lit(false)))
    SnapSql.registerView(spark, "snap_tt_v1", loc, asOf = Some(1))
    SnapSql.registerView(spark, "snap_tt_head", loc)
    val orig = cust.filter(col("c_custkey") === 7)
      .head().getAs[Double]("c_acctbal")
    assert(spark.sql(
      "SELECT c_acctbal FROM snap_tt_v1 WHERE c_custkey = 7")
      .head().getDouble(0) == orig)
    assert(spark.sql(
      "SELECT c_acctbal FROM snap_tt_head WHERE c_custkey = 7")
      .head().getDouble(0) == 1.0)
  }
}
