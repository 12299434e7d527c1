package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

class WindowsSpec extends SparkSpec {

  test("tumbling window counts conserve the event total") {
    val total = Tables.events(spark, sf).count()
    val n = Windows.q33TumblingWindow(spark, sf).agg(sum(col("n"))).head().getLong(0)
    assert(n == total)
  }

  test("sliding 60s/30s windows count every event exactly twice") {
    val total = Tables.events(spark, sf).count()
    val n = Windows.q34SlidingWindow(spark, sf).agg(sum(col("n"))).head().getLong(0)
    assert(n == 2 * total)
  }

  test("session windows conserve events and close after the gap") {
    val total = Tables.events(spark, sf).count()
    val sessions = Windows.q35SessionWindow(spark, sf).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == total)
    sessions.foreach { s =>
      val start = s.getAs[java.sql.Timestamp]("session_start")
      val end = s.getAs[java.sql.Timestamp]("session_end")
      assert(end.getTime - start.getTime >= 8L * 3600 * 1000,
        "session_end = last event + gap, so span >= gap")
    }
  }

  test("stall grid is complete and stalled iff count is zero") {
    val rows = Windows.q36StallDetect(spark, sf).collect()
    assert(rows.length % 3 == 0, "hour grid × {USA0, USA1, NONE}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("stalled") == (r.getAs[Long]("n_events") == 0L))
    }
    assert(rows.exists(_.getAs[Boolean]("stalled")),
      "sparse sf0.001 data must have silent region-hours")
  }

  test("q66 outliers: every flagged window is beyond 2 sigma of a sane mean") {
    val rows = Windows.queries("q66_window_outliers")(spark, sf).collect()
    assert(rows.nonEmpty, "hourly volumes at sf0.001 must include outliers")
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_n") > 0.0)
      // the filter is |n - mean| > 2*sd, so the reported z must clear 2
      // (up to the rounding nudge)
      assert(math.abs(r.getAs[Double]("z")) > 2.0 - 1e-3)
    }
    // flagged windows are a strict subset of all hourly windows
    val total = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
    assert(rows.length < total)
  }

  test("q80: funnel timestamps are strictly ordered and steps match nullness") {
    import org.apache.spark.sql.functions._
    val rows = Windows.q80Funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("signup_ts")
      val c = Option(r.getAs[java.sql.Timestamp]("click_ts"))
      val p = Option(r.getAs[java.sql.Timestamp]("purchase_ts"))
      assert(s != null)
      c.foreach(ct => assert(ct.after(s), "first click is strictly after signup"))
      p.foreach { pt =>
        assert(c.isDefined, "a purchase step requires a click step")
        assert(pt.after(c.get), "first purchase is strictly after the click")
      }
      val steps = r.getAs[Int]("steps")
      assert(steps == (if (p.isDefined) 3 else if (c.isDefined) 2 else 1))
    }
  }

}
