package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snap changelog as a NATIVE Structured Streaming source — the
  * r19 verdict's ask #2: `spark.readStream.format("graft-snap-changes")
  * .option("path", loc)` lets ANY streaming consumer (watermarked
  * aggregates, stream joins, arbitrary sinks, stateful ops) follow a
  * snap table, replacing the bespoke poll-loop contract
  * ([[graft.streaming.SnapFollow]] remains the exactly-once APPLIER;
  * this is the exactly-once READER).
  *
  * Offsets ARE manifest versions — the one total order the format
  * already commits. A micro-batch (v1, v2] plans one step per
  * committed version from manifest METADATA only:
  *
  *   - `mor` steps: the added delta files ARE the change set — one
  *     partition per file, a plain parquet read (O(delta) end to end).
  *   - `dv` steps: one partition per deletion vector (the doomed
  *     positions ride in the partition; the reader counts rows off the
  *     target file and emits deletes at the recorded indexes) plus the
  *     residual delta files.
  *   - `merge`/`create` (copy-on-write) steps: one partition per
  *     TOUCHED BUCKET — the reader loads the bucket's removed rows
  *     (with the step's folded deltas and deletion vectors applied
  *     in-memory, latest-wins) keyed in a map, streams the added rows
  *     against it, and emits value-changed upserts plus leftover
  *     deletes. Per-task memory is one bucket's rows — the same order
  *     a shuffle partition holds; carried files are never read.
  *   - `optimize`/`evolve`/`rebucket` steps: row-set-neutral, skipped
  *     without opening a file.
  *
  * Emitted rows are the table's columns plus `_change_type`
  * ("upsert" | "delete") and `_commit_version` — the collapsed-apply
  * shape ([[graft.streaming.SnapFollow.pollOnce]]'s input): a
  * downstream applier needs post-images and delete keys, so COW steps
  * suppress value-identical rewrite survivors (they are rewrite
  * artifacts, not changes).
  *
  * Exactly-once across driver death for free: offsets live in the
  * stream checkpoint, and replanning (v1, v2] from immutable manifests
  * is deterministic — a replayed batch reads byte-identical files.
  * Retention interplay: versions inside an in-flight batch must be
  * within the vacuum horizon, the same contract `Snap.changes` has.
  *
  * `startingVersion` option: emit from that version on (1 replays the
  * whole table — the create step emits every row as an upsert);
  * default = the head at query start (changes from now on). Schema is
  * resolved ONCE at load; steps written under older schemas project
  * into it by logical name (absent columns null-fill — the additive-
  * evolution contract). */
class SnapChangesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snap-changes"

  private def loc(options: CaseInsensitiveStringMap): HPath = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snap-changes needs .option(\"path\", <table location>)")
    new HPath(p)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapChangesTable.changeSchema(
      Snap.head(SparkSession.active, loc(options)).getOrElse(
        sys.error(s"graft-snap-changes: ${loc(options)} never committed"))
        .schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapChangesTable(
      loc(new CaseInsensitiveStringMap(properties)), schema)
}

object SnapChangesTable {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  def changeSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, IntegerType, nullable = false)))
}

final class SnapChangesTable(loc: HPath, schema0: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"graft-snap-changes $loc"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new SnapChangeStream(SparkSession.active, loc, schema0,
            Option(options.get("startingVersion")).map(_.toInt))
      }
    }
}

private[sources] final case class SnapVersionOffset(version: Int)
  extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

/** One step's read-and-project recipe: the step's PHYSICAL read
  * schema, a DRIVER-built (serializable) stock parquet reader closure
  * for it, and per output column its index in the read row (-1 →
  * null-fill). Shipping the closure inside the partition is the stock
  * FileScanRDD arrangement — the reader function is designed to be
  * serialized to executors. */
private[sources] final case class SnapStepShape(
    physRead: StructType,
    reader: PartitionedFile => Iterator[InternalRow],
    outIdx: Array[Int], keyIdx: Array[Int])

private[sources] sealed trait SnapChangePartition extends InputPartition {
  def version: Int
  def shape: SnapStepShape
}
/** A mor step's delta file (or a dv step's residual delta file):
  * rows carry the delete flag at `delIdx` in the read row. */
private[sources] final case class SnapMorChangePart(
    version: Int, shape: SnapStepShape, file: SnapFilePart,
    delIdx: Int) extends SnapChangePartition
/** A deletion vector: emit the target's rows at `positions` as
  * deletes. */
private[sources] final case class SnapDvChangePart(
    version: Int, shape: SnapStepShape, target: SnapFilePart,
    positions: Array[Long]) extends SnapChangePartition
/** A copy-on-write step's touched bucket: pre-side (removed base files
  * with folded deltas and per-file doomed positions applied) diffed
  * against the added files. `deltaShape` reads the folded delta files
  * (same data columns + the delete flag and sequence). */
private[sources] final case class SnapCowChangePart(
    version: Int, shape: SnapStepShape, deltaShape: SnapStepShape,
    removed: Seq[SnapFilePart], removedDeltas: Seq[SnapFilePart],
    added: Seq[SnapFilePart], dvPositions: Map[String, Array[Long]],
    delIdx: Int, seqIdx: Int) extends SnapChangePartition

/** A file to read executor-side: absolute path + length (the whole
  * file as ONE split — row order is the file's, which is what makes
  * position-based deletes countable). */
private[sources] final case class SnapFilePart(abs: String, len: Long,
                                               name: String)

final class SnapChangeStream(spark: SparkSession, loc: HPath,
                             outSchema: StructType,
                             startingVersion: Option[Int])
  extends MicroBatchStream {

  private val fs = Published.fsOf(loc)
  private def headVersion: Int = Snap.head(spark, loc).getOrElse(
    sys.error(s"graft-snap-changes: $loc never committed")).version

  override def initialOffset(): Offset =
    SnapVersionOffset(startingVersion.map(v => math.max(0, v - 1))
      .getOrElse(headVersion))
  override def latestOffset(): Offset = SnapVersionOffset(headVersion)
  override def deserializeOffset(json: String): Offset =
    SnapVersionOffset(
      json.replaceAll("[^0-9]", "") match { case s => s.toInt })
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // output column count excluding the two meta columns
  private val outCols = outSchema.length - 2

  private def shapeOf(m: Snap.SnapManifest,
                      extraMeta: Seq[StructField]): SnapStepShape = {
    val physRead = StructType(m.schema.fields.map(f =>
      f.copy(name = m.physicalOf(f.name), nullable = true)) ++ extraMeta)
    val stepLogical = m.schema.fieldNames
    val outIdx = outSchema.fields.take(outCols).map(f =>
      stepLogical.indexOf(f.name))
    val keyIdx = m.keyCols.map(k => stepLogical.indexOf(k)).toArray
    require(keyIdx.forall(_ >= 0), s"graft-snap-changes: step schema of " +
      s"$loc v${m.version} lost a key column — restart the stream")
    // returning_batch=false: plain row iterators — the diff/emit
    // recipes are row-at-a-time, and the change sets are the SMALL
    // side by design (vectorization buys nothing here)
    val reader = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, physRead, new StructType(), physRead, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    SnapStepShape(physRead, reader, outIdx, keyIdx)
  }

  // ONE data/ listing per planning call, never a serial getFileStatus
  // per referenced file (the r19 SnapFileIndex discipline — at a big
  // COW step the per-file probe is O(files) driver-side RPCs)
  private def lenOf(listed: Map[String, Long], f: Snap.SnapFile): Long =
    listed.getOrElse(Snap.fileNameOf(f.path),
      Published.retryIO()(fs.getFileStatus(
        new HPath(loc, f.path))).getLen) // vacuum raced the listing

  private def filePart(listed: Map[String, Long])(
      f: Snap.SnapFile): SnapFilePart = {
    val p = fs.makeQualified(new HPath(loc, f.path))
    SnapFilePart(p.toString, lenOf(listed, f), Snap.fileNameOf(f.path))
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val dataDir = new HPath(loc, "data")
    val listed: Map[String, Long] = Published.retryIO() {
      if (!fs.exists(dataDir)) Map.empty
      else fs.listStatus(dataDir)
        .map(st => st.getPath.getName -> st.getLen).toMap
    }
    val filePart = this.filePart(listed) _
    val fromV = start.asInstanceOf[SnapVersionOffset].version
    val toV = end.asInstanceOf[SnapVersionOffset].version
    val metaD = Seq(
      StructField(Snap.MorDelCol, BooleanType, nullable = false),
      StructField(Snap.MorSeqCol, LongType, nullable = false))
    ((fromV + 1) to toV).flatMap { v =>
      val child = Snap.atVersion(spark, loc, v)
      child.op match {
        case "optimize" | "evolve" | "rebucket" => Seq.empty
        case "mor" =>
          val parent = Snap.atVersion(spark, loc, v - 1)
          val parentD = parent.deltas.map(_.path).toSet
          val shape = shapeOf(child, metaD)
          child.deltas.filterNot(f => parentD.contains(f.path)).map(f =>
            SnapMorChangePart(v, shape, filePart(f),
              shape.physRead.fieldIndex(Snap.MorDelCol)))
        case "dv" =>
          val parent = Snap.atVersion(spark, loc, v - 1)
          val parentD = parent.deltas.map(_.path).toSet
          val parentV = parent.dvs.map(_.path).toSet
          val shape = shapeOf(child, Seq.empty)
          val shapeD = shapeOf(child, metaD)
          val targetOf = parent.files.map(f =>
            Snap.fileNameOf(f.path) -> f).toMap
          val dvParts = child.dvs.filterNot(f => parentV.contains(f.path))
            .map { dv =>
              val target = targetOf(Snap.dvTargetOf(dv))
              SnapDvChangePart(v, shape, filePart(target),
                readPositions(dv))
            }
          val resParts = child.deltas.filterNot(f => parentD.contains(f.path))
            .map(f => SnapMorChangePart(v, shapeD, filePart(f),
              shapeD.physRead.fieldIndex(Snap.MorDelCol)))
          dvParts ++ resParts
        case _ => // create | merge: the copy-on-write diff
          val shape = shapeOf(child, Seq.empty)
          val shapeD = shapeOf(child, metaD)
          val (removed, removedD, dvPos) =
            if (v == 1) (Seq.empty[Snap.SnapFile], Seq.empty[Snap.SnapFile],
              Map.empty[String, Array[Long]])
            else {
              val parent = Snap.atVersion(spark, loc, v - 1)
              val childPaths = child.files.map(_.path).toSet
              val childD = child.deltas.map(_.path).toSet
              val rm = parent.files.filterNot(f => childPaths.contains(f.path))
              val rmD = parent.deltas.filterNot(f => childD.contains(f.path))
              val rmNames = rm.map(f => Snap.fileNameOf(f.path)).toSet
              val pos = parent.dvs
                .filter(dv => rmNames.contains(Snap.dvTargetOf(dv)))
                .groupBy(Snap.dvTargetOf)
                .map { case (t, dvs) =>
                  t -> dvs.flatMap(readPositions).toArray.sorted }
              (rm, rmD, pos)
            }
          val parentPaths =
            if (v == 1) Set.empty[String]
            else Snap.atVersion(spark, loc, v - 1).files.map(_.path).toSet
          val added = child.files.filterNot(f => parentPaths.contains(f.path))
          if (removed.isEmpty && added.isEmpty && removedD.isEmpty) Seq.empty
          else {
            val buckets = (removed ++ added ++ removedD).map(_.bucket).toSet
            buckets.toSeq.sorted.map { b =>
              SnapCowChangePart(v, shape, shapeD,
                removed.filter(_.bucket == b).map(filePart),
                removedD.filter(_.bucket == b).map(filePart),
                added.filter(_.bucket == b).map(filePart),
                dvPos.filter { case (t, _) =>
                  removed.exists(f => f.bucket == b &&
                    Snap.fileNameOf(f.path) == t) },
                shapeD.physRead.fieldIndex(Snap.MorDelCol),
                shapeD.physRead.fieldIndex(Snap.MorSeqCol))
            }
          }
      }
    }.toArray
  }

  /** One deletion vector's positions — tiny by construction. */
  private def readPositions(dv: Snap.SnapFile): Array[Long] = {
    val abs = fs.makeQualified(new HPath(loc, dv.path)).toString
    Published.retryIO()(spark.read.schema(StructType(Seq(
      StructField(Snap.DvPosCol, LongType, nullable = false))))
      .parquet(abs)).collect().map(_.getLong(0))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapChangeReaderFactory(outSchema)
}

/** Applies each partition's diff/emit recipe over stock parquet row
  * iterators. The reader closures ride inside the partitions' shapes
  * (driver-built, serializable — the stock FileScanRDD arrangement). */
private[sources] final class SnapChangeReaderFactory(outSchema: StructType)
  extends PartitionReaderFactory {

  private val outCols = outSchema.length - 2

  private def rowsOf(shape: SnapStepShape,
                     f: SnapFilePart): Iterator[InternalRow] =
    shape.reader(PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(f.abs), 0L, f.len, Array.empty, 0L, f.len,
      Map.empty))
      .flatMap {
        // the vectorized reader yields ColumnarBatch disguised as
        // InternalRow (the FileScanRDD contract) — unwrap either way
        case cb: org.apache.spark.sql.vectorized.ColumnarBatch =>
          cb.rowIterator().asScala
        case r: InternalRow => Iterator.single(r)
      }

  private def outRow(vals: Array[Any], change: String,
                     version: Int): InternalRow = {
    val a = new Array[Any](outSchema.length)
    System.arraycopy(vals, 0, a, 0, outCols)
    a(outCols) = org.apache.spark.unsafe.types.UTF8String.fromString(change)
    a(outCols + 1) = version
    new GenericInternalRow(a)
  }

  /** The step row's values in OUTPUT order (null-filled where the step
    * schema lacks a column), copied out of the reused reader row. */
  private def project(shape: SnapStepShape, r: InternalRow): Array[Any] = {
    val a = new Array[Any](outCols)
    var i = 0
    while (i < outCols) {
      val si = shape.outIdx(i)
      a(i) = if (si < 0 || r.isNullAt(si)) null
        else copyVal(r.get(si, shape.physRead.fields(si).dataType))
      i += 1
    }
    a
  }
  private def keyOf(shape: SnapStepShape, r: InternalRow): List[Any] =
    shape.keyIdx.toList.map(i =>
      if (r.isNullAt(i)) null
      else copyVal(r.get(i, shape.physRead.fields(i).dataType)))
  private def copyVal(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case other => other
  }
  private def valsEqual(a: Array[Any], b: Array[Any]): Boolean = {
    var i = 0
    while (i < a.length) {
      val eq = (a(i), b(i)) match {
        // BinaryType surfaces as Array[Byte] — reference equality would
        // read every byte-identical rewrite survivor as a change
        case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
        case (x, y) => java.util.Objects.equals(x, y)
      }
      if (!eq) return false
      i += 1
    }
    true
  }

  private def iterReader(it: Iterator[InternalRow]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case SnapMorChangePart(v, shape, file, delIdx) =>
        iterReader(rowsOf(shape, file).map { r =>
          val del = r.getBoolean(delIdx)
          outRow(project(shape, r), if (del) "delete" else "upsert", v)
        })

      case SnapDvChangePart(v, shape, target, positions) =>
        val posSet = positions.toSet
        var idx = -1L
        iterReader(rowsOf(shape, target).flatMap { r =>
          idx += 1
          if (posSet.contains(idx))
            Iterator.single(outRow(project(shape, r), "delete", v))
          else Iterator.empty
        })

      case SnapCowChangePart(v, shape, shapeD, removed, removedD, added,
          dvPos, delIdx, seqIdx) =>
        // pre side: bucket rows keyed in memory (one bucket per task —
        // shuffle-partition-order memory), deltas latest-wins, doomed
        // positions skipped
        val pre = new scala.collection.mutable.HashMap[List[Any],
          (Array[Any], Long)]()
        removed.foreach { f =>
          val doomed = dvPos.getOrElse(f.name, Array.empty[Long]).toSet
          var idx = -1L
          rowsOf(shape, f).foreach { r =>
            idx += 1
            if (!doomed.contains(idx))
              pre.put(keyOf(shape, r), (project(shape, r), -1L))
          }
        }
        // folded deltas apply over the pre rows in sequence order (the
        // delta shape's data-column indexes line up with `shape`'s —
        // the meta columns are appended)
        removedD.flatMap(f => rowsOf(shapeD, f).map { r =>
          (keyOf(shapeD, r), project(shapeD, r),
            r.getBoolean(delIdx), r.getLong(seqIdx))
        }.toSeq).sortBy(_._4).foreach { case (k, vals, del, seq) =>
          val curSeq = pre.get(k).map(_._2).getOrElse(Long.MinValue)
          if (seq > curSeq) {
            if (del) pre.remove(k) else pre.put(k, (vals, seq))
          }
        }
        val upserts = added.iterator.flatMap(f => rowsOf(shape, f))
          .flatMap { r =>
            val k = keyOf(shape, r)
            val vals = project(shape, r)
            pre.remove(k) match {
              case Some((old, _)) if valsEqual(old, vals) =>
                Iterator.empty // rewrite survivor, not a change
              case _ => Iterator.single(outRow(vals, "upsert", v))
            }
          }
        val deletes = new Iterator[InternalRow] {
          private var inner: Iterator[InternalRow] = null
          private def it: Iterator[InternalRow] = {
            if (inner == null)
              inner = pre.valuesIterator.map { case (vals, _) =>
                outRow(vals, "delete", v) }.toArray.iterator
            inner
          }
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = it.next()
        }
        iterReader(upserts ++ deletes)

      case other => sys.error(s"graft-snap-changes: unexpected $other")
    }
}
