package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Semantics pins for the round-5 ANSI-SQL-entry additions: the
  * recursive calendar spine (q103) and null-aware anti join (q105). */
class SqlEntrySpec extends SparkSpec {
  import spark.implicits._

  test("q103 spine is a contiguous month calendar that conserves the filtered orders") {
    val rows = Relational.q103RecursiveSpine(spark, sf).collect()
    val months = rows.map(_.getDate(0).toLocalDate)
    // contiguous first-of-month sequence, min to max
    assert(months.forall(_.getDayOfMonth == 1))
    months.sliding(2).foreach {
      case Array(a, b) => assert(a.plusMonths(1) == b, s"gap between $a and $b")
      case _ =>
    }
    // the spine conserves the filtered fact: group sums == direct recompute
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 450000.0)
      .select(date_trunc("MONTH", col("o_orderdate")).cast("date").as("mo"),
        col("o_totalprice"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    assert(rows.map(_.getLong(1)).sum == orders.length.toLong)
    // spine covers every month that has data, PLUS any calendar gaps
    val withData = orders.map(_._1).toSet
    assert(withData.subsetOf(months.toSet))
    val zeroRows = rows.filter(_.getLong(1) == 0L)
    zeroRows.foreach(r => assert(!withData(r.getDate(0).toLocalDate)))
    zeroRows.foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("q105 equals the driver-side complement; a real NULL empties NOT IN") {
    val got = Relational.q105NotIn(spark, sf).collect().map(_.getLong(0)).toSet
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val lowValue = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") < 100000.0)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(got == (cust -- lowValue))
    // the null-aware branch: one NULL in the subquery → empty result
    Seq((1L, "a"), (2L, "b")).toDF("k", "name").createOrReplaceTempView("probe_v")
    Seq(Some(1L), None).toDF("k").createOrReplaceTempView("build_v")
    val withNull = spark.sql(
      "SELECT k FROM probe_v WHERE k NOT IN (SELECT k FROM build_v)")
    assert(withNull.count() == 0L, "NULL in NOT IN subquery must empty the result")
    // and a probe NULL never qualifies even against a null-free build side
    Seq(Some(1L), None).toDF("k").createOrReplaceTempView("probe2_v")
    Seq(5L).toDF("k").createOrReplaceTempView("build2_v")
    val probeNull = spark.sql(
      "SELECT k FROM probe2_v WHERE k NOT IN (SELECT k FROM build2_v)")
    assert(probeNull.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("q111 table diff conserves keys and classifies the simulated rewrite exactly") {
    import org.apache.spark.sql.functions.col
    val a = spark.read.parquet(s"$sf/orders.parquet")
    val n = a.count()
    val del = a.filter(col("o_orderkey") % 11 === 0).count()
    val ins = a.filter(col("o_orderkey") % 13 === 0).count()
    // updated = surviving keys whose price actually moves (price > 0, so
    // the 10% reprice always changes the value)
    val upd = a.filter(col("o_orderkey") % 11 =!= 0 &&
      col("o_orderkey") % 7 === 0).count()
    val got = graft.operators.Relational.q111TableDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("deleted")._1 == del && got("inserted")._1 == ins &&
      got("updated")._1 == upd, s"got $got")
    // conservation: every key of A ∪ B classified exactly once
    assert(got.values.map(_._1).sum == n + ins,
      s"classified ${got.values.map(_._1).sum} of ${n + ins} keys")
    // drift semantics: unchanged rows carry zero drift; updates carry
    // a positive reprice delta
    assert(got("unchanged")._2 == 0.0 && got("updated")._2 > 0.0)
  }
}
