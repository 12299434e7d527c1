package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions.{col, max_by, struct}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read path for [[Snap]] tables — the scan behind
  * [[SnapCatalog]] (`SELECT ... FROM snapcat.ns.t`).
  *
  * Design: wrap the STOCK v2 parquet scan over a snapshot-pinned file
  * list rather than re-implement a parquet reader. The wrapper owns
  * exactly the three things the stock scan cannot know:
  *
  *   - **Manifest-stats file skipping.** Pushed filters are translated
  *     to physical column names and tested against each file's
  *     [min,max] BEFORE the inner scan is built, so `WHERE key BETWEEN`
  *     plans only the intersecting files — the same decision
  *     [[SnapSql.SnapFileIndex]] makes on the HadoopFsRelation path.
  *     All filters are reported back as residual (pruning and parquet
  *     row-group skipping stay best-effort; Spark re-applies the
  *     predicates above the scan, so an untranslatable filter shape can
  *     never produce a wrong row set).
  *   - **Post-pruning statistics.** [[SupportsReportStatistics]] serves
  *     the PRUNED file subset's bytes and the manifest's row counts, so
  *     join planning sees the side a `WHERE` leaves, not the whole
  *     table — a pruned snap side broadcasts where the unpruned
  *     estimate would shuffle (r19 verdict ask #5).
  *   - **Runtime file skipping.** [[SupportsRuntimeV2Filtering]] on the
  *     stats-bearing columns accepts IN-list runtime filters (dynamic
  *     pruning from joins, and the row-level MERGE machinery's group
  *     filters) and re-prunes the file list before execution.
  *
  * Merge-on-read composes: with outstanding delta files the scan masks
  * base rows whose key appears in any delta and serves the latest
  * non-deleted delta image per key from an embedded partition. The
  * delta state is driver-collected — O(outstanding delta rows), the
  * same order the DataFrame read path broadcasts for its anti-join
  * ([[Snap.morApplyFrame]]), bounded by the fold-on-touch policy. A
  * delta-free table takes the stock columnar path untouched; the MOR
  * wrap is the transient-state price and drops off at the next fold.
  *
  * Column mapping composes positionally: the inner scan reads PHYSICAL
  * names (the bytes' names), the wrapper reports the LOGICAL read
  * schema; fields align by position, so renamed columns resolve with
  * no per-row cost. */
object SnapV2 {

  /** Translate a v1 filter's attribute names logical→physical. None
    * for shapes we do not understand — such a filter is simply not
    * pushed (it still executes above the scan). */
  private[sources] def renamePhys(m: Snap.SnapManifest,
                                  f: Filter): Option[Filter] = {
    def n(a: String): String = m.physicalOf(a)
    f match {
      case EqualTo(a, v) => Some(EqualTo(n(a), v))
      case EqualNullSafe(a, v) => Some(EqualNullSafe(n(a), v))
      case GreaterThan(a, v) => Some(GreaterThan(n(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(n(a), v))
      case LessThan(a, v) => Some(LessThan(n(a), v))
      case LessThanOrEqual(a, v) => Some(LessThanOrEqual(n(a), v))
      case In(a, vs) => Some(In(n(a), vs))
      case IsNull(a) => Some(IsNull(n(a)))
      case IsNotNull(a) => Some(IsNotNull(n(a)))
      case StringStartsWith(a, v) => Some(StringStartsWith(n(a), v))
      case StringEndsWith(a, v) => Some(StringEndsWith(n(a), v))
      case StringContains(a, v) => Some(StringContains(n(a), v))
      case And(l, r) =>
        for (ll <- renamePhys(m, l); rr <- renamePhys(m, r)) yield And(ll, rr)
      case Or(l, r) =>
        for (ll <- renamePhys(m, l); rr <- renamePhys(m, r)) yield Or(ll, rr)
      case Not(c) => renamePhys(m, c).map(Not)
      case AlwaysTrue() | AlwaysFalse() => Some(f)
      case _ => None
    }
  }

  private[sources] def asLong(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  /** The per-file [min,max] of PHYSICAL column `name` as longs — None
    * (never skip) when no stats exist. Same contract as
    * [[SnapSql.SnapFileIndex]]. */
  private[sources] def rangeOf(m: Snap.SnapManifest, f: Snap.SnapFile,
                               name: String): Option[(Long, Long)] =
    if (name == m.physicalOf(m.bucketCol) && m.keyKind == "long")
      Some((f.min.toLong, f.max.toLong))
    else f.extra.get(name).map { case (mn, mx) => (mn.toLong, mx.toLong) }

  /** Conservative exclusion over v1 filters in PHYSICAL names: skip a
    * file ONLY when a bound provably rules it out; anything we do not
    * understand keeps the file (pruning never guesses). */
  private[sources] def excludes(m: Snap.SnapManifest, f: Snap.SnapFile,
                                flt: Filter): Boolean = {
    def bound(a: String, v: Any)(test: (Long, Long, Long) => Boolean): Boolean =
      (rangeOf(m, f, a), asLong(v)) match {
        case (Some((mn, mx)), Some(x)) => test(mn, mx, x)
        case _ => false
      }
    flt match {
      case GreaterThanOrEqual(a, v) => bound(a, v)((_, mx, x) => mx < x)
      case GreaterThan(a, v) => bound(a, v)((_, mx, x) => mx <= x)
      case LessThanOrEqual(a, v) => bound(a, v)((mn, _, x) => mn > x)
      case LessThan(a, v) => bound(a, v)((mn, _, x) => mn >= x)
      case EqualTo(a, v) => bound(a, v)((mn, mx, x) => x < mn || x > mx)
      case In(a, vs) if vs.nonEmpty && vs.forall(asLong(_).isDefined) =>
        rangeOf(m, f, a) match {
          case Some((mn, mx)) =>
            !vs.exists(v => asLong(v).exists(x => x >= mn && x <= mx))
          case None => false
        }
      // a conjunction excludes if EITHER side does; a disjunction only
      // if BOTH sides do
      case And(l, r) => excludes(m, f, l) || excludes(m, f, r)
      case Or(l, r) => excludes(m, f, l) && excludes(m, f, r)
      case _ => false
    }
  }

  /** Normalize an EXTERNAL (collected Row) key value to the canonical
    * comparison form shared with [[normInternal]]. */
  private[sources] def normExternal(v: Any): Any = v match {
    case null => null
    case b: java.lang.Byte => java.lang.Long.valueOf(b.longValue)
    case s: java.lang.Short => java.lang.Long.valueOf(s.longValue)
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
    case l: java.lang.Long => l
    case s: String => s
    case b: java.lang.Boolean => b
    case d: java.math.BigDecimal => d.stripTrailingZeros()
    case other => sys.error(s"snap catalog: unsupported key value $other " +
      s"(${other.getClass.getName}) for the merge-on-read mask")
  }

  /** Normalize an INTERNAL row's key value to the same canonical form. */
  private[sources] def normInternal(r: InternalRow, ord: Int,
                                    dt: DataType): Any =
    if (r.isNullAt(ord)) null
    else dt match {
      case ByteType => java.lang.Long.valueOf(r.getByte(ord).toLong)
      case ShortType => java.lang.Long.valueOf(r.getShort(ord).toLong)
      case IntegerType => java.lang.Long.valueOf(r.getInt(ord).toLong)
      case LongType => java.lang.Long.valueOf(r.getLong(ord))
      case StringType => r.getUTF8String(ord).toString
      case BooleanType => java.lang.Boolean.valueOf(r.getBoolean(ord))
      case d: DecimalType =>
        r.getDecimal(ord, d.precision, d.scale).toJavaBigDecimal
          .stripTrailingZeros()
      case other => sys.error(
        s"snap catalog: unsupported key type $other for the merge-on-read " +
          "mask — fold the deltas (Snap.optimize) before reading via SQL")
    }

  /** A key type the MOR mask can normalize on both sides. */
  private[sources] def maskableKeyType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BooleanType | _: DecimalType => true
    case _ => false
  }
}

/** A [[PartitioningAwareFileIndex]] over an explicit, snapshot-pinned
  * file list — what the inner parquet scan plans its partitions from.
  * No listing, no discovery: the manifest already IS the index. */
private[sources] final class SnapStaticIndex(
    spark: SparkSession, root: HPath, statuses: Seq[FileStatus])
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {
  // allFiles() resolves the root through leafDirToChildrenFiles by its
  // QUALIFIED path — an unqualified key silently lists nothing
  private val qualifiedRoot = Published.fsOf(root).makeQualified(root)
  private val leaves = {
    val m = new scala.collection.mutable.LinkedHashMap[HPath, FileStatus]
    statuses.foreach(st => m += st.getPath -> st)
    m
  }
  override def rootPaths: Seq[HPath] = Seq(qualifiedRoot)
  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def leafFiles: scala.collection.mutable.LinkedHashMap[HPath, FileStatus] =
    leaves
  override def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
    Map(qualifiedRoot -> statuses.toArray)
  override def refresh(): Unit = ()
}

/** Scan builder: collect pushdown, then build [[SnapScan]]. */
final class SnapScanBuilder(spark: SparkSession, loc: HPath,
                            m: Snap.SnapManifest)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = m.schema
  private var usablePhys: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    usablePhys = filters.flatMap(SnapV2.renamePhys(m, _))
    // everything stays residual: file skipping and parquet row-group
    // skipping are best-effort, Spark re-evaluates above the scan
    filters
  }
  override def pushedFilters(): Array[Filter] = usablePhys
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SnapScan(spark, loc, m, required, usablePhys)
}

/** One read of one committed snapshot. See [[SnapV2]] for the design. */
final class SnapScan(spark: SparkSession, loc: HPath,
                     m: Snap.SnapManifest, required: StructType,
                     pushedPhys: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  private val staticChosen: Seq[Snap.SnapFile] =
    m.files.filterNot(f => pushedPhys.exists(SnapV2.excludes(m, f, _)))
  @volatile private var chosen: Seq[Snap.SnapFile] = staticChosen

  /** Plan-audit hooks (the SnapSqlSpec pattern). */
  def plannedFiles: Int = chosen.size
  val totalFiles: Int = m.files.size

  private val fs = Published.fsOf(loc)
  // one listing of data/, filtered against the manifest (the r19
  // SnapFileIndex discipline — never a serial getFileStatus per file)
  private lazy val statusOf: Map[String, FileStatus] = {
    val dataDir = new HPath(loc, "data")
    val listed = Published.retryIO() {
      if (fs.exists(dataDir)) fs.listStatus(dataDir)
      else Array.empty[FileStatus]
    }.map(st => "data/" + st.getPath.getName -> st).toMap
    (m.files ++ m.deltas).map(f => f.path -> listed.getOrElse(f.path,
      Published.retryIO()(fs.getFileStatus(new HPath(loc, f.path))))).toMap
  }

  private val physAll = StructType(
    m.schema.fields.map(f => f.copy(name = m.physicalOf(f.name))))
  // the BYTES side is always nullable (the table surface narrows key
  // nullability for Spark's row-ID contract; the parquet reader should
  // never be told more than the files guarantee)
  private val physRequired = StructType(required.fields.map(f =>
    f.copy(name = m.physicalOf(f.name), nullable = true)))
  private val morOutstanding = m.deltas.nonEmpty || m.dvs.nonEmpty
  // under MOR the base read carries the key columns too (for masking);
  // the wrapper projects them away before rows leave the reader
  private val extraKeys: Seq[StructField] =
    if (!morOutstanding) Seq.empty
    else m.keyCols.filterNot(k => required.fieldNames.contains(k))
      .map(k => physAll(m.physicalOf(k)))
  private val baseReadPhys = StructType(physRequired.fields ++ extraKeys)
  // only meaningful under MOR (the key columns are in baseReadPhys by
  // construction then); lazy so a key-pruning projection on a
  // delta-free table never looks them up
  private lazy val keyOrds: Array[Int] =
    m.keyCols.map(k => baseReadPhys.fieldIndex(m.physicalOf(k))).toArray
  private lazy val keyTypes: Array[DataType] =
    keyOrds.map(i => baseReadPhys.fields(i).dataType)

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-snap v${m.version} $loc"
  override def toBatch: Batch = this

  // ---------------------------------------------------- statistics
  override def estimateStatistics(): Statistics = {
    val files = chosen
    val bytes = files.map(f => statusOf(f.path).getLen).sum +
      m.deltas.map(f => statusOf(f.path).getLen).sum
    val rows = files.map(_.rows).sum + m.deltas.map(_.rows).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
  }

  // ------------------------------------------- runtime file skipping
  override def filterAttributes(): Array[NamedReference] = {
    // only the columns with long-kind file stats can answer a runtime
    // IN-list (declared stats columns are long by the create contract;
    // the bucket column only when its key kind is long)
    val statted = ((if (m.keyKind == "long") Seq(m.bucketCol) else Nil) ++
      m.effectiveStatsCols).distinct
    statted.map(c => Expressions.column(c)).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    def inList(p: Predicate): Option[(String, Seq[Long])] =
      if (p.name() != "IN") None
      else p.children().headOption match {
        case Some(r: NamedReference) if r.fieldNames.length == 1 =>
          val lits = p.children().tail
          val vs = lits.flatMap {
            case l: V2Literal[_] => SnapV2.asLong(l.value())
            case _ => None
          }
          if (vs.length == lits.length) Some((r.fieldNames.head, vs.toSeq))
          else None
        case _ => None
      }
    chosen = predicates.foldLeft(staticChosen) { (fs0, p) =>
      inList(p) match {
        // bail above 100k values: the per-file containment test would
        // cost more than the scan it saves
        case Some((logical, vs)) if vs.nonEmpty && vs.size <= 100000 =>
          val phys = m.physicalOf(logical)
          fs0.filter { f =>
            SnapV2.rangeOf(m, f, phys) match {
              case Some((mn, mx)) => vs.exists(v => v >= mn && v <= mx)
              case None => true
            }
          }
        case _ => fs0
      }
    }
  }

  // ------------------------------------------------------ planning
  private def innerScan(files: Seq[Snap.SnapFile]): ParquetScan =
    ParquetScan(spark, spark.sessionState.newHadoopConf(),
      new SnapStaticIndex(spark, loc, files.map(f => statusOf(f.path))),
      dataSchema = physAll, readDataSchema = baseReadPhys,
      readPartitionSchema = new StructType(),
      pushedFilters = pushedPhys,
      options = CaseInsensitiveStringMap.empty())

  override def planInputPartitions(): Array[InputPartition] = {
    val baseParts: Array[InputPartition] =
      if (chosen.isEmpty) Array.empty
      else innerScan(chosen).toBatch.planInputPartitions()
    if (!morOutstanding) baseParts
    else {
      val (_, winners) = morState
      baseParts.map(p => SnapMorBasePartition(p): InputPartition) :+
        (SnapMorWinnersPartition(winners): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = innerScan(chosen).createReaderFactory()
    if (!morOutstanding) inner
    else {
      val (mask, _) = morState
      new SnapMorReaderFactory(inner, mask, keyOrds, keyTypes,
        required.length, required)
    }
  }

  /** Driver-collected merge-on-read state: the mask (every delta key,
    * normalized) and the winner rows (latest non-deleted image per
    * key, already projected to the requested LOGICAL columns).
    * O(outstanding delta rows) — the same order [[Snap.morApplyFrame]]
    * broadcasts; the fold-on-touch policy keeps it small. */
  private lazy val morState: (Set[Seq[Any]], Array[Row]) = {
    m.keyCols.foreach { k =>
      val dt = m.schema(k).dataType
      require(SnapV2.maskableKeyType(dt),
        s"snap catalog: key column $k of type $dt cannot feed the " +
          "merge-on-read mask — fold the deltas (Snap.optimize) first")
    }
    def normKeys(rows: Array[Row]): Set[Seq[Any]] = rows
      .map(r => r.schema.fields.indices.toList
        .map(i => SnapV2.normExternal(r.get(i))): Seq[Any])
      .toSet
    // deletion vectors fold into the key mask: their doomed keys are
    // resolved from the targeted files' positions (Snap.dvMaskKeys) —
    // this reader tracks no row positions, and a key mask is exactly
    // equivalent for rows the positions name
    val dvMask: Set[Seq[Any]] =
      if (m.dvs.isEmpty) Set.empty
      else normKeys(Snap.dvMaskKeys(spark, loc, m).distinct().collect())
    if (m.deltas.isEmpty) (dvMask, Array.empty[Row])
    else {
      val metaFields = Seq(
        StructField(Snap.MorDelCol, BooleanType, nullable = false),
        StructField(Snap.MorSeqCol, LongType, nullable = false))
      val deltaPhys = StructType(physAll.fields ++ metaFields)
      val paths = m.deltas.map(f =>
        fs.makeQualified(new HPath(loc, f.path)).toString)
      val df = Published.retryIO()(
        spark.read.schema(deltaPhys).parquet(paths: _*))
      val physKeys = m.keyCols.map(m.physicalOf)
      // ONE job for mask AND winners (r20 — the old shape paid a
      // distinct-collect plus a window-collect over the same delta
      // files): per key, the highest-sequence image via max_by —
      // exactly the window's rn=1 row, because sequence ties are
      // impossible (one delta row per key per commit, one sequence
      // per commit). Every grouped key feeds the mask; non-deleted
      // winners project to the requested columns.
      val structFields =
        (physRequired.fieldNames.toSeq :+ Snap.MorDelCol).distinct
      val rows = df.groupBy(physKeys.map(col): _*)
        .agg(max_by(struct(structFields.map(col): _*),
          col(Snap.MorSeqCol)).as("__graft_w"))
        .collect()
      val mask: Set[Seq[Any]] = rows.map(r => physKeys.indices.toList
        .map(i => SnapV2.normExternal(r.get(i))): Seq[Any]).toSet
      val winners = rows.flatMap { r =>
        val w = r.getStruct(physKeys.length)
        if (w.getAs[Boolean](Snap.MorDelCol)) None
        else Some(Row.fromSeq(
          physRequired.fieldNames.map(n => w.getAs[Any](n)).toSeq))
      }
      (mask ++ dvMask, winners)
    }
  }
}

/** Tags an inner parquet partition as base-side of a MOR read. */
private[sources] final case class SnapMorBasePartition(inner: InputPartition)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** The delta winners, embedded as external rows (small by contract). */
private[sources] final case class SnapMorWinnersPartition(rows: Array[Row])
  extends InputPartition

/** Row-based reader wrap for MOR: masks base rows whose key has any
  * delta entry, projects away the mask-only key columns, and serves
  * the embedded winner rows. */
private[sources] final class SnapMorReaderFactory(
    base: PartitionReaderFactory, mask: Set[Seq[Any]],
    keyOrds: Array[Int], keyTypes: Array[DataType],
    outArity: Int, outSchema: StructType) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case SnapMorBasePartition(inner) =>
        val in = base.createReader(inner)
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (in.next()) {
              val r = in.get()
              val key: Seq[Any] = keyOrds.indices
                .map(i => SnapV2.normInternal(r, keyOrds(i), keyTypes(i)))
              if (!mask.contains(key)) {
                // copy THEN project: the inner reader reuses its row
                // buffer across next() calls
                val c = r.copy()
                val out = new GenericInternalRow(outArity)
                var i = 0
                while (i < outArity) {
                  out.update(i,
                    if (c.isNullAt(i)) null
                    else c.get(i, outSchema.fields(i).dataType))
                  i += 1
                }
                cur = out
                return true
              }
            }
            false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = in.close()
        }
      case SnapMorWinnersPartition(rows) =>
        new PartitionReader[InternalRow] {
          private val conv =
            CatalystTypeConverters.createToCatalystConverter(outSchema)
          private val it = rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = conv(it.next()).asInstanceOf[InternalRow]; true }
            else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      case other => sys.error(s"snap catalog: unexpected partition $other")
    }
}
