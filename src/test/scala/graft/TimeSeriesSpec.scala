package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import graft.operators.TimeSeries

/** q48 time-series kNN: result sanity + the bounded-state plan shape
  * (pre-aggregated (user, day) counts, never collect_list over raw
  * events — the heavy-hitter OOM guard from VERDICT r1 item 1). */
class TimeSeriesSpec extends SparkSpec {

  test("q48 returns 5 neighbors per query user with cos in [-1, 1]") {
    val rows = TimeSeries.queries("q48_timeseries_knn")(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.nonEmpty)
    perQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 5))
      rs.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    }
  }

  test("q48 plan pre-aggregates: collect_list sees (day, n) pairs, not raw events") {
    val plan = TimeSeries.queries("q48_timeseries_knn")(spark, sf)
      .queryExecution.optimizedPlan
    val aggs = plan.collect { case a: Aggregate => a }
    val collectors = aggs.filter(_.aggregateExpressions.exists(
      _.toString.contains("collect_list")))
    assert(collectors.nonEmpty, "expected a collect_list aggregate")
    // every collect_list aggregate must itself consume another Aggregate
    // (the per-(user, day) count) — bounded ≤30 rows/user state
    collectors.foreach { c =>
      val inner = c.child.collect { case a: Aggregate => a }
      assert(inner.nonEmpty,
        s"collect_list aggregate reads raw events:\n$c")
      assert(inner.exists(_.aggregateExpressions.exists(_.toString.contains("count"))),
        "inner aggregate should be the (user, day) count")
    }
  }
}
