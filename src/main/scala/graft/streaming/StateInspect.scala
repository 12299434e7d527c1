package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming-state observability: Spark 4's state data sources, wrapped
  * as the ops surface a production deployment actually uses — inspect a
  * live (or stopped) query's state by reading its CHECKPOINT, no query
  * restart, no debug rebuilds.
  *
  * At 100 TB this is the difference between "the dedup gate is
  * mis-skipping, add logging and redeploy" and "SELECT the gate's index
  * out of the checkpoint and look": state is data, so state debugging is
  * a query. The reader streams the store files (RocksDB SSTs or HDFS
  * snapshots) partition by partition — it never materializes the store
  * in memory — and composes with every relational operator above
  * (joins against expected-state frames, q84-style audits over state).
  */
object StateInspect {

  /** Rows of one state store: (key struct, value struct, partition_id).
    * `storeName`/`operatorId` select among multiple stateful operators
    * (stream-stream joins keep four stores per side). For a
    * transformWithState operator pass `stateVarName` instead of
    * `storeName` — TWS keys each state variable to its own column
    * family, and the reader addresses them by variable name (a TTL'd
    * ValueState reads back as
    * `value.value.<field> + value.ttlExpirationMs`). */
  def stateRows(spark: SparkSession, checkpoint: String,
                operatorId: Int = 0, storeName: String = "default",
                stateVarName: String = ""): DataFrame = {
    val r = spark.read.format("statestore").option("operatorId", operatorId)
    (if (stateVarName.nonEmpty) r.option("stateVarName", stateVarName)
     else r.option("storeName", storeName)).load(checkpoint)
  }

  /** One row per stateful operator in the checkpoint: operator id/name,
    * store names, partition counts, batch id range — the catalog of
    * [[stateRows]] targets. */
  def stateMetadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)
}
