package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DeltaBatchWrite, DeltaWrite, DeltaWriter, DeltaWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, min_by, raise_error, struct, sum, when}
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

/** DataSource V2 write path for [[Snap]] tables — every SQL verb
  * ([[SnapCatalog]]: `INSERT INTO`, `MERGE INTO`, `UPDATE`, `DELETE`,
  * CTAS) funnels through ONE shape:
  *
  *   1. **Stage.** Executor tasks write their rows as plain parquet
  *      part files into a token-private `stage-v0-sql-<token>/` dir
  *      under the table location — the same naming + `_live` heartbeat
  *      convention as merge staging, so a dead SQL writer's debris is
  *      swept by vacuum exactly like a dead merge's. Each staged row is
  *      the table's logical columns plus the `_deleted` flag; an
  *      UPDATE that moves a key stages delete(old)+insert(new).
  *   2. **Commit.** The driver resolves the staged rows to one row per
  *      key (an upsert beats the delete the same statement staged for
  *      the key it vacated; two upserts for one key refuse loudly — a
  *      keyed table has no bag semantics) and hands them to the
  *      EXISTING commit machinery: [[Snap.merge]] (copy-on-write) or
  *      [[Snap.mergeMor]] per the table's `mode` property. Lease, OCC,
  *      stats, bucket routing, manifest atomicity — all inherited, so
  *      a `MERGE INTO` lands byte-for-byte the manifest shape the
  *      Scala API lands.
  *
  * The staging pass costs one extra write+read of the DELTA (never the
  * table): at 100 TB with a 1% delta that is 1% extra I/O, and in
  * exchange the SQL path shares every durability property the Scala
  * path has instead of reimplementing them.
  *
  * Row-level ops are DELTA-based ([[org.apache.spark.sql.connector.write.SupportsDelta]]):
  * Spark hands this writer exactly the changed rows (insert / update /
  * delete with row IDs = the table's key columns) rather than whole
  * rewritten file groups — the natural fit for a format whose merge is
  * already keyed, and what keeps a SQL `UPDATE ... WHERE` O(delta)
  * write-side. */
object SnapWriteV2 {

  /** The staged-rows schema: logical columns (all nullable — a DELETE
    * stages nulls outside the key) plus the delete flag. */
  private[sources] def stagedSchema(tableSchema: StructType): StructType = {
    require(!tableSchema.fieldNames.contains("_deleted"),
      "snap catalog: a table with a user column named _deleted cannot " +
        "take SQL writes (the staged-delta flag would shadow it)")
    StructType(tableSchema.fields.map(_.copy(nullable = true)) :+
      StructField("_deleted", BooleanType, nullable = false))
  }

  /** Resolve the staged delta to ONE row per key in a single
    * aggregation (r20 optimization — the old shape paid a separate
    * dup-probe job plus a window sort per statement/epoch, pure fixed
    * cost on the native sink's per-epoch path): an upsert beats the
    * delete the same statement staged for the key it vacated
    * (`min_by` on the delete flag — ties are identical delete rows),
    * and two surviving rows for one key REFUSE via `raise_error`
    * riding the resolved delete flag, which every consumer (the merge
    * contract job, the deferred create's staging pass, the delete-only
    * probe) evaluates on its FIRST action — still strictly before any
    * manifest commits, without its own Spark job. */
  private[sources] def resolveStaged(raw: DataFrame, keyCols: Seq[String],
                                     what: String): DataFrame = {
    val keyEx = keyCols.map(col)
    val dataCols = raw.columns.filterNot(keyCols.contains).toSeq
    raw.groupBy(keyEx: _*)
      .agg(min_by(struct(dataCols.map(col): _*),
          col("_deleted").cast("int")).as("__graft_r"),
        sum(when(!col("_deleted"), 1L).otherwise(0L)).as("__graft_ups"))
      .select((keyEx ++ dataCols.map {
        case "_deleted" =>
          when(col("__graft_ups") > 1,
            raise_error(concat(
              lit(s"$what stages more than one surviving row for key ("),
              concat_ws(",", keyEx.map(_.cast("string")): _*),
              lit(") — a snap table is keyed; deduplicate the source " +
                "(or MERGE from an aggregated source)"))))
            .otherwise(col("__graft_r._deleted")).as("_deleted")
        case c => col("__graft_r").getField(c).as(c)
      }): _*)
  }

  /** Build the executor-side parquet writer factory for `schema` and
    * the job configuration it needs (carries the serialized schema for
    * the write support). */
  private[sources] def prepareFactory(
      spark: SparkSession, schema: StructType): (OutputWriterFactory, SnapSerConf) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    (owf, new SnapSerConf(job.getConfiguration))
  }
}

/** A serializable Hadoop configuration (the stock wrapper is
  * spark-private; writing the pair of methods is cheaper than leaning
  * on an internal class). */
final class SnapSerConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] final case class SnapStagedFileMsg(path: String, rows: Long)
  extends WriterCommitMessage

/** One SQL write (append or row-level delta) against one snap table.
  * Created on the driver at write planning; opens the private stage
  * dir + heartbeat immediately, commits through [[Snap.merge]] /
  * [[Snap.mergeMor]], and always tears the stage down. */
final class SnapStagedWrite(
    spark: SparkSession, loc: HPath, tableSchema: StructType,
    keyCols: Seq[String], mode: String,
    rowSchema: StructType, rowIdSchema: Option[StructType],
    pendingCreate: Option[SnapPendingSpec],
    replace: Boolean = false, queryId: String = "")
  extends DeltaWrite with DeltaBatchWrite {

  require(mode == "cow" || mode == "mor",
    s"snap catalog: unknown write mode '$mode' (cow|mor)")
  // the row schema Spark hands the writers must BE the table's columns
  // (Spark aligns inserts and assignments upstream) — EXCEPT a
  // delete-only row-level op, which carries no row projection at all
  // (only row IDs); refusing a real mismatch loudly beats writing
  // misaligned bytes
  require(rowSchema.isEmpty ||
      rowSchema.fieldNames.sorted.sameElements(tableSchema.fieldNames.sorted),
    s"snap catalog: write schema ${rowSchema.fieldNames.mkString(",")} " +
      s"does not match table columns ${tableSchema.fieldNames.mkString(",")}")

  private val staged = SnapWriteV2.stagedSchema(tableSchema)
  private val fs = Published.fsOf(loc)
  private val token = java.util.UUID.randomUUID().toString.take(12)
  private val stage = new HPath(loc, s"stage-v0-sql-$token")
  // vacuum-visible liveness, exactly like merge staging (a kill -9
  // here leaves debris that ages out and is swept)
  private val hb = {
    Published.retryIO()(fs.mkdirs(stage))
    new Snap.StageHeartbeat(fs, stage).start()
  }

  private val idSchema: StructType = rowIdSchema.getOrElse(
    StructType(keyCols.map(n =>
      tableSchema(tableSchema.fieldIndex(n))).toArray))

  override def toBatch: DeltaBatchWrite = this
  override def description(): String = s"graft-snap sql write $loc"

  /** The STREAMING form of the same write — `writeStream.toTable`
    * (append + update-as-append) and complete mode (`replace` per
    * epoch). The batch-side stage this constructor opened is unused by
    * the streaming path; tear it down and hand off. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    cleanup()
    new SnapStreamingWrite(spark, loc, tableSchema, keyCols, mode,
      rowSchema, pendingCreate, replace, queryId)
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val (owf, conf) = SnapWriteV2.prepareFactory(spark, staged)
    new SnapStageWriterFactory(owf, conf,
      fs.makeQualified(stage).toString, staged, rowSchema, idSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    try {
      val files = messages.collect {
        case SnapStagedFileMsg(p, _) if p != null => p }
      val keyEx = keyCols.map(col)
      if (files.isEmpty) {
        // an empty CTAS still creates the (empty) table; an empty
        // INSERT/UPDATE/DELETE is a no-op, not a new version — but an
        // empty OVERWRITE of a committed table is a truncate
        pendingCreate.foreach { p =>
          p.create(spark, loc,
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              tableSchema))
        }
        if (replace && pendingCreate.isEmpty) {
          val all = Snap.read(spark, loc)
          if (all.limit(1).count() > 0)
            Snap.merge(spark, loc, all.withColumn("_deleted", lit(true)))
        }
        return
      }
      val raw = Published.retryIO()(
        spark.read.schema(staged).parquet(files: _*))
      // one row per key: an upsert beats the delete the SAME statement
      // staged when a key moved (UPDATE old→new stages both); two
      // upserts for one key is a real conflict on a keyed table —
      // refused in-plan by resolveStaged before anything commits
      val resolved = SnapWriteV2.resolveStaged(raw, keyCols,
        "snap catalog: statement")
      // INSERT OVERWRITE (SupportsTruncate): the staged upserts REPLACE
      // the content — every current key the statement did not restate
      // gets a delete row, and the whole replacement lands as ONE merge
      val effective =
        if (!replace || pendingCreate.isDefined) resolved
        else {
          val keep = resolved.filter(!col("_deleted")).select(keyEx: _*)
          // left_anti, not except: a snap table's keys are unique, so
          // the anti-join is row-equivalent — and it broadcasts the
          // statement's keys instead of shuffling the TABLE's keys
          // (except dedups both sides; at 100 TB that is a full-table
          // exchange for a metadata-sized question)
          val doomed = Snap.read(spark, loc).select(keyEx: _*)
            .join(keep, keyCols, "left_anti")
          resolved.unionByName(doomed.select(
            (tableSchema.fields.map { f =>
              if (keyCols.contains(f.name)) col(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            } :+ lit(true).as("_deleted")).toSeq: _*))
        }
      pendingCreate match {
        case Some(p) =>
          // first data lands = the actual create (bounds derived from
          // the data, CTAS-correct for range/zorder layouts)
          p.create(spark, loc,
            effective.filter(!col("_deleted")).drop("_deleted"))
        case None if mode == "mor" =>
          // a delete-only statement on a mor table lands as positional
          // deletion vectors — O(positions) commit bytes, the format's
          // cheapest delete shape
          val deleteOnly =
            effective.filter(!col("_deleted")).limit(1).count() == 0
          if (deleteOnly)
            Snap.deleteVector(spark, loc, effective.select(keyEx: _*))
          else Snap.mergeMor(spark, loc, effective)
        case None =>
          Snap.merge(spark, loc, effective)
      }
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    hb.stop()
    try Published.retryIO()(fs.delete(stage, true))
    catch { case _: java.io.IOException => () } // debris ages out
  }
}

/** The snap table as a NATIVE streaming sink —
  * `df.writeStream.toTable("cat.t")` with exactly-once effect:
  *
  *   - **append** / **update** mode (update-as-append: a streaming
  *     aggregate's changed rows ARE this table's upsert contract):
  *     each epoch's rows stage executor-side and land as ONE merge.
  *   - **complete** mode (`replace`): each epoch's rows replace the
  *     content — keys the epoch did not restate get delete rows — so
  *     `outputMode("complete").toTable(...)` maintains a continuously
  *     replaced aggregate table.
  *
  * Exactly-once rides the format's applied-high-water: the epoch id
  * commits INSIDE the same atomic manifest as the rows
  * ([[Snap.mergeStreaming]] / [[Snap.mergeMorStreaming]]), so a driver
  * death between sink commit and checkpoint commit replays the epoch
  * into a no-op. Lineage: the table stamps the stream's STABLE query
  * id (`LogicalWriteInfo.queryId` — the id in checkpoint metadata) via
  * the same `_GRAFT_CKPT` stamp-or-verify the CDC sink uses, so a
  * foreign checkpoint refuses loudly instead of remapping epoch ids.
  * A pending (CREATE-but-never-written) table creates on the FIRST
  * epoch with data-derived bounds, stamping that epoch as applied.
  *
  * One stage dir + `_live` heartbeat serves the whole query; each
  * epoch's files are distinct (task ids are app-unique), consumed and
  * deleted by that epoch's commit. */
final class SnapStreamingWrite(
    spark: SparkSession, loc: HPath, tableSchema: StructType,
    keyCols: Seq[String], mode: String, rowSchema: StructType,
    pendingCreate: Option[SnapPendingSpec], replace: Boolean,
    queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // streaming writes do NOT pass through Spark's output resolution
  // (no implicit casts, unlike batch INSERT) — a type mismatch would
  // reach the parquet writer as a ClassCastException mid-task; refuse
  // at plan time with the fix spelled out
  rowSchema.fields.foreach { f =>
    val t = tableSchema(tableSchema.fieldIndex(f.name)).dataType
    require(f.dataType == t,
      s"snap streaming sink $loc: column ${f.name} arrives as " +
        s"${f.dataType.simpleString} but the table stores " +
        s"${t.simpleString} — cast it in the stream " +
        s"(.withColumn(\"${f.name}\", col(\"${f.name}\")" +
        s".cast(\"${t.simpleString}\")))")
  }

  private val staged = SnapWriteV2.stagedSchema(tableSchema)
  private val fs = Published.fsOf(loc)
  private val token = java.util.UUID.randomUUID().toString.take(12)
  private val stage = new HPath(loc, s"stage-v0-sqlstream-$token")
  private val hb = {
    Published.retryIO()(fs.mkdirs(stage))
    new Snap.StageHeartbeat(fs, stage).start()
  }
  private val lineageDone =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var created = pendingCreate.isEmpty

  // StreamingWrite has no close hook, and a gracefully STOPPED query
  // would otherwise leave the heartbeat ticking (and the stage dir
  // shielded from vacuum) for the JVM's life — a listener keyed on the
  // stream's stable id tears down when this query instance terminates
  private val teardown =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit =
        if (e.id.toString == queryId) {
          cleanupStage()
          spark.streams.removeListener(this)
        }
    }
  spark.streams.addListener(teardown)

  private def cleanupStage(): Unit = {
    hb.stop()
    try Published.retryIO()(fs.delete(stage, true))
    catch { case _: java.io.IOException => () } // debris ages out
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val (owf, conf) = SnapWriteV2.prepareFactory(spark, staged)
    val stageDir = fs.makeQualified(stage).toString
    val schema = staged
    val rs = rowSchema
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        // task ids are app-unique, so epochs never collide on paths
        new SnapStageWriter(owf, conf, stageDir, schema, rs, rs,
          partitionId, taskId)
    }
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
    Snap.traced(s"sink.commit(e$epochId)")(commitImpl(epochId, messages))

  private def commitImpl(epochId: Long,
                         messages: Array[WriterCommitMessage]): Unit = {
    if (!lineageDone.get()) {
      Published.stampOrVerifyLineage(loc, queryId,
        s"snap streaming sink $loc")
      lineageDone.set(true)
    }
    val files = messages.collect {
      case SnapStagedFileMsg(p, _) if p != null => p }
    if (files.isEmpty) return // no-op epoch; high-water stays behind
    try {
      val keyEx = keyCols.map(col)
      val raw = Published.retryIO()(
        spark.read.schema(staged).parquet(files: _*))
      // one row per key; a bag epoch refuses in-plan (resolveStaged)
      // on the commit's first action, before any manifest lands
      val resolved = SnapWriteV2.resolveStaged(raw, keyCols,
        s"snap streaming sink: epoch $epochId")
      if (!created && Snap.head(spark, loc).isEmpty) {
        // first data = the deferred create, epoch stamped as applied so
        // a replayed epoch 0 no-ops through the high-water
        val p = pendingCreate.get
        Snap.create(spark, loc,
          resolved.filter(!col("_deleted")).drop("_deleted")
            .select(p.schema.fieldNames.map(col).toSeq: _*),
          p.keyCols, p.bucketCol, p.buckets, layout = p.layout,
          tag = p.tag, applied = epochId, statsCols = p.statsCols,
          zorderBy = p.zorderBy)
        created = true
      } else {
        val effective =
          if (!replace) resolved
          else {
            val keep = resolved.filter(!col("_deleted")).select(keyEx: _*)
            // left_anti, not except: a snap table's keys are unique, so
          // the anti-join is row-equivalent — and it broadcasts the
          // statement's keys instead of shuffling the TABLE's keys
          // (except dedups both sides; at 100 TB that is a full-table
          // exchange for a metadata-sized question)
          val doomed = Snap.read(spark, loc).select(keyEx: _*)
            .join(keep, keyCols, "left_anti")
            resolved.unionByName(doomed.select(
              (tableSchema.fields.map { f =>
                if (keyCols.contains(f.name)) col(f.name)
                else lit(null).cast(f.dataType).as(f.name)
              } :+ lit(true).as("_deleted")).toSeq: _*))
          }
        if (mode == "mor")
          Snap.mergeMorStreaming(spark, loc, effective, epochId)
        else
          Snap.mergeStreaming(spark, loc, effective, epochId)
      }
    } finally files.foreach { f =>
      try Published.retryIO()(fs.delete(new HPath(f), false))
      catch { case _: java.io.IOException => () } // debris ages out
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    // a failed epoch fails the query; the next run builds a new write
    cleanupStage()
    spark.streams.removeListener(teardown)
  }
}

/** Executor-side factory: one staged parquet part per task attempt. */
private[sources] final class SnapStageWriterFactory(
    owf: OutputWriterFactory, conf: SnapSerConf, stageDir: String,
    schema: StructType, rowSchema: StructType, idSchema: StructType)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new SnapStageWriter(owf, conf, stageDir, schema, rowSchema, idSchema,
      partitionId, taskId)
}

/** Buffers nothing: each incoming row is appended to this task's
  * staged parquet file as it arrives. Distinct task attempts write
  * distinct files; only COMMITTED attempts' messages reach the driver,
  * and stage teardown removes any orphan. */
private[sources] final class SnapStageWriter(
    owf: OutputWriterFactory, conf: SnapSerConf, stageDir: String,
    schema: StructType, rowSchema: StructType, idSchema: StructType,
    partitionId: Int, taskId: Long)
  extends DeltaWriter[InternalRow] {

  private val arity = schema.length
  private val delOrd = arity - 1
  // incoming rows map into the staged layout BY NAME (a delete-only op
  // has no row schema at all; ids carry their own schema)
  private val rowOrds: Array[Int] =
    rowSchema.fieldNames.map(schema.fieldIndex)
  private val rowTypes: Array[DataType] = rowSchema.fields.map(_.dataType)
  private val idOrds: Array[Int] = idSchema.fieldNames.map(schema.fieldIndex)
  private val idTypes: Array[DataType] = idSchema.fields.map(_.dataType)
  private val idInRow: Array[Int] =
    idSchema.fieldNames.map(n => rowSchema.fieldNames.indexOf(n))
  private val path = s"$stageDir/part-$partitionId-$taskId.parquet"
  private var out: OutputWriter = null
  private var rows = 0L
  private var closed = false

  private def writer(): OutputWriter = {
    if (out == null) {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID("graft-sql", 0), TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt)
      out = owf.newInstance(path, schema,
        new TaskAttemptContextImpl(conf.value, attempt))
    }
    out
  }

  // no per-value copies: the parquet write support serializes the row
  // synchronously inside write(), before the source buffer is reused
  private def emit(vals: Array[Any]): Unit = {
    writer().write(new GenericInternalRow(vals))
    rows += 1
  }

  override def write(row: InternalRow): Unit = insert(row)

  override def insert(row: InternalRow): Unit = {
    require(rowOrds.nonEmpty,
      "snap catalog: insert reached a delete-only write")
    val a = new Array[Any](arity)
    var i = 0
    while (i < rowOrds.length) {
      a(rowOrds(i)) = if (row.isNullAt(i)) null else row.get(i, rowTypes(i))
      i += 1
    }
    a(delOrd) = false
    emit(a)
  }

  override def update(meta: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    // an update that MOVES the key is a delete of the old image plus an
    // insert of the new one (the commit-side resolution keeps the
    // insert when both land on the same key)
    var moved = false
    var j = 0
    while (j < idOrds.length && !moved) {
      val dt = idTypes(j)
      val ir = idInRow(j)
      val oldV = if (id.isNullAt(j)) null else id.get(j, dt)
      val newV = if (ir < 0 || row.isNullAt(ir)) null else row.get(ir, dt)
      moved = !java.util.Objects.equals(oldV, newV)
      j += 1
    }
    if (moved) delete(meta, id)
    insert(row)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val a = new Array[Any](arity)
    var j = 0
    while (j < idOrds.length) {
      a(idOrds(j)) = if (id.isNullAt(j)) null else id.get(j, idTypes(j))
      j += 1
    }
    a(delOrd) = true
    emit(a)
  }

  override def commit(): WriterCommitMessage = {
    close()
    SnapStagedFileMsg(if (rows == 0) null else path, rows)
  }

  override def abort(): Unit = {
    close()
    if (rows > 0) {
      val p = new HPath(path)
      try p.getFileSystem(conf.value).delete(p, false)
      catch { case _: java.io.IOException => () }
    }
  }

  override def close(): Unit = {
    if (!closed) {
      closed = true
      if (out != null) out.close()
    }
  }
}
