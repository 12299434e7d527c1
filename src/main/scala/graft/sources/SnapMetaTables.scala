package graft.sources

import java.util

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES through the SQL catalog — suffix a
  * snap table's name with `$<kind>`:
  *
  * {{{
  * SELECT * FROM cat.ns.`t$history`                 -- one row per version
  * SELECT * FROM cat.ns.`t$files`                   -- the head's file set
  * SELECT * FROM cat.ns.`t$changes`                 -- batch CDF (full replay)
  * spark.read.option("startingVersion", 3).option("endingVersion", 5)
  *   .table("cat.ns.`t$changes`")                   -- a version range
  * spark.readStream.table("cat.ns.`t$changes`")     -- follow, exactly-once
  * }}}
  *
  * `$history` and `$files` are manifest-metadata-sized and serve
  * driver-computed rows snapshotted at scan PLANNING (a registered
  * frame stays consistent). `$changes` is the changelog as a real
  * table: BATCH reads plan the same per-version partitions the
  * streaming source plans ([[SnapChangeStream]] — mor deltas read
  * straight, dv positions emit deletes, COW steps diff per touched
  * bucket; O(change) work, never O(table)), and STREAMING reads are
  * exactly the `graft-snap-changes` source, so `readStream.table`
  * follows the table with offsets = manifest versions. All three are
  * read-only: writes address the base table. */
private[sources] object SnapMetaTables {

  val Kinds = Seq("changes", "history", "files")

  def load(spark: SparkSession, loc: HPath, kind: String): Option[Table] =
    kind match {
      case "changes" => Some(new SnapChangesCatTable(spark, loc))
      case "history" => Some(new SnapLocalTable(s"$loc$$history",
        historySchema, () => historyRows(spark, loc)))
      case "files" => Some(new SnapLocalTable(s"$loc$$files",
        filesSchema, () => filesRows(spark, loc)))
      case _ => None
    }

  private val historySchema = new StructType()
    .add("version", IntegerType).add("op", StringType)
    .add("parent", IntegerType).add("base", IntegerType)
    .add("rebased", BooleanType)
    .add("n_files", LongType).add("n_rows", LongType)
    .add("n_deltas", LongType).add("n_delta_rows", LongType)
    .add("buckets", IntegerType).add("applied", LongType)

  private def historyRows(spark: SparkSession,
                          loc: HPath): Array[InternalRow] =
    Snap.history(spark, loc).collect().map(r =>
      InternalRow.fromSeq(r.toSeq.map {
        case s: String => UTF8String.fromString(s)
        case v => v
      }))

  private val filesSchema = new StructType()
    .add("path", StringType).add("kind", StringType)
    .add("bucket", IntegerType).add("n_rows", LongType)
    .add("min", StringType).add("max", StringType)
    .add("dv_target", StringType)

  private def filesRows(spark: SparkSession,
                        loc: HPath): Array[InternalRow] = {
    val m = Snap.head(spark, loc).getOrElse(
      sys.error(s"snap $loc: no committed version"))
    def row(f: Snap.SnapFile, kind: String, target: String) =
      InternalRow.fromSeq(Seq(
        UTF8String.fromString(f.path), UTF8String.fromString(kind),
        f.bucket, f.rows, UTF8String.fromString(f.min),
        UTF8String.fromString(f.max),
        if (target == null) null else UTF8String.fromString(target)))
    (m.files.map(row(_, "base", null)) ++
      m.deltas.map(row(_, "delta", null)) ++
      m.dvs.map(f => row(f, "dv", Snap.dvTargetOf(f)))).toArray
  }
}

/** A read-only table of driver-computed, metadata-sized rows; the row
  * set snapshots at scan planning. */
private[sources] final class SnapLocalTable(
    tname: String, tschema: StructType, rowsF: () => Array[InternalRow])
  extends Table with SupportsRead {

  override def name(): String = tname
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tschema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(SnapLocalRowsPart(rowsF()))
        override def createReaderFactory(): PartitionReaderFactory =
          (p: InputPartition) => {
            val it = p.asInstanceOf[SnapLocalRowsPart].rows.iterator
            new PartitionReader[InternalRow] {
              private var cur: InternalRow = _
              override def next(): Boolean =
                if (it.hasNext) { cur = it.next(); true } else false
              override def get(): InternalRow = cur
              override def close(): Unit = ()
            }
          }
      }
    }
}

private[sources] final case class SnapLocalRowsPart(
    rows: Array[InternalRow]) extends InputPartition

/** `t$changes`: the changelog as a first-class table — batch CDF over
  * a version range and the native streaming source behind one name. */
private[sources] final class SnapChangesCatTable(spark: SparkSession,
                                                 loc: HPath)
  extends Table with SupportsRead {

  private val tschema = SnapChangesTable.changeSchema(
    Snap.head(spark, loc).getOrElse(
      sys.error(s"snap $loc: no committed version")).schema)

  override def name(): String = s"$loc$$changes"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tschema

        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          new SnapChangeStream(spark, loc, tschema,
            Option(options.get("startingVersion")).map(_.toInt))

        // batch CDF: (startingVersion-1, endingVersion] planned exactly
        // like a micro-batch — per-version O(change) partitions
        override def toBatch: Batch = new Batch {
          private val stream =
            new SnapChangeStream(spark, loc, tschema, None)
          private val from = Option(options.get("startingVersion"))
            .map(_.toInt).getOrElse(1)
          private val to = Option(options.get("endingVersion"))
            .map(_.toInt).getOrElse(
              Snap.head(spark, loc).get.version)
          require(from >= 1 && to >= from,
            s"snap $$changes: bad version range [$from,$to]")
          override def planInputPartitions(): Array[InputPartition] =
            stream.planInputPartitions(
              SnapVersionOffset(from - 1), SnapVersionOffset(to))
          override def createReaderFactory(): PartitionReaderFactory =
            stream.createReaderFactory()
        }
      }
    }
}
