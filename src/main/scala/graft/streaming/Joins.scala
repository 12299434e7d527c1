package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins — the unbounded⋈unbounded capability the rest of
  * the streaming surface (stream-static envelope join in
  * [[Ingest.envelope]], windowed aggs in [[Monitor]]) doesn't cover.
  *
  * Correct unbounded join state needs BOTH: watermarks on both sides (so
  * the engine knows when an input is final) and a time-bound join
  * condition (so each side knows how long a row can still find matches).
  * With them, state is O(rows inside the horizon) regardless of stream
  * length — the only stream-stream join shape that survives an unbounded
  * run; without the interval condition Spark would buffer both streams
  * forever. Mirrors the reference's enrichment intent
  * (`/root/reference/regionSpout.go:126-163`) when both inputs move.
  */
object Joins {

  /** Inner join of two event streams on `key`, matching right rows whose
    * timestamp falls within `[left.ts - horizonSec, left.ts]` (the "right
    * happened up to horizon before left" attribution join, e.g. clicks
    * attributed to a preceding purchase). Both sides carry `delay`
    * watermarks; columns are prefixed to keep the output unambiguous. */
  def windowedAttribution(left: DataFrame, right: DataFrame,
                          key: String, horizonSec: Long,
                          delay: String = "1 minute"): DataFrame = {
    val l = prefixed(left, "l_").withWatermark("l_ts", delay)
    val r = prefixed(right, "r_").withWatermark("r_ts", delay)
    val cond: Column =
      col(s"l_$key") === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $horizonSec SECONDS") &&
        col("r_ts") <= col("l_ts")
    l.join(r, cond)
  }

  private def prefixed(df: DataFrame, p: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
}
