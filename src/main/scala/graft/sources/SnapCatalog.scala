package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{DeltaWriteBuilder, DeltaWrite, LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog for [[Snap]] tables — the format's full DDL/DML front
  * door, closing the r19 verdict's top ask: register once
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.snapcat", classOf[SnapCatalog].getName)
  * spark.conf.set("spark.sql.catalog.snapcat.root", "/warehouse/snap")
  * }}}
  *
  * and every verb runs as plain SQL: `CREATE TABLE snapcat.ns.t ...
  * USING snap`, CTAS, `INSERT INTO`, `MERGE INTO`, `UPDATE`, `DELETE`,
  * `SELECT` (with manifest-stats file pruning — [[SnapScanBuilder]]),
  * `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN` (the format's
  * metadata-only evolution), `DROP TABLE`. Writes route through the
  * EXISTING commit machinery ([[SnapWriteV2]]) — lease, OCC, manifest
  * atomicity, MOR/COW modes all inherited, so a SQL `MERGE INTO` is
  * content-identical to [[Snap.merge]] (q147 pins this).
  *
  * Table identity is its directory under `root` (namespaces are
  * subdirectories). Two states exist on disk:
  *
  *   - **Committed**: a manifest chain — the table [[Snap]] serves.
  *   - **Pending**: only the `_sql_table` spec marker (schema + key /
  *     bucket / layout / mode properties) that `CREATE TABLE` writes.
  *     The ACTUAL [[Snap.create]] is deferred to the first write, so a
  *     CTAS (or CREATE + INSERT) derives range/zorder bounds from the
  *     DATA instead of degenerating to an empty-table (0,0) range.
  *     Pending tables read as empty, exactly like a created-empty one.
  *
  * Table properties: `key` (csv key columns; required unless a
  * `bucket(n, col)` partition transform names it), `bucket_col`
  * (default: first key), `buckets` (default 8), `layout`
  * (hash|range|zorder, default hash), `zorder_by`, `stats` (csv stats
  * columns), `mode` (cow|mor write routing, default cow). */
class SnapCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: HPath = _
  private def spark: SparkSession = SparkSession.active
  private def fs = Published.fsOf(root)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"snap catalog: set spark.sql.catalog.$name.root to the warehouse " +
        "directory the catalog serves")
    root = new HPath(r)
  }

  override def name(): String = catalogName

  private def segOk(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' ||
      c == '-' || c == '.') && s != "." && s != ".."

  private def dirOf(parts: Seq[String]): HPath = {
    parts.foreach(s => require(segOk(s),
      s"snap catalog: illegal name segment '$s'"))
    parts.foldLeft(root)((p, s) => new HPath(p, s))
  }
  private def dirOf(ident: Identifier): HPath =
    dirOf(ident.namespace.toSeq :+ ident.name)

  private def isTableDir(p: HPath): Boolean = {
    val f = Published.fsOf(p)
    Published.exists(f, new HPath(p, SnapPendingSpec.MarkerName)) ||
      (Published.exists(f, p) &&
        f.listStatus(p).exists(_.getPath.getName.startsWith("manifest-v")))
  }

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toSeq)
    if (!Published.exists(fs, dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    // `t$<kind>` names a METADATA TABLE of t (Iceberg-style):
    // $changes (batch CDF + streaming source), $history, $files
    val at = ident.name.indexOf('$')
    if (at > 0) {
      val dir = dirOf(ident.namespace.toSeq :+ ident.name.substring(0, at))
      if (Snap.head(spark, dir).isEmpty) throw new NoSuchTableException(ident)
      return SnapMetaTables.load(spark, dir, ident.name.substring(at + 1))
        .getOrElse(sys.error(s"snap catalog: unknown metadata table " +
          s"suffix '${ident.name.substring(at + 1)}' — the surface is " +
          s"$$${SnapMetaTables.Kinds.mkString(", $")}"))
    }
    val dir = dirOf(ident)
    val pending = SnapPendingSpec.read(dir)
    if (Snap.head(spark, dir).isEmpty && pending.isEmpty)
      throw new NoSuchTableException(ident)
    new SnapTable(spark, dir, pending)
  }

  /** `VERSION AS OF` — an integer pins that committed main version
    * (loud past the vacuum horizon, like [[Snap.atVersion]]); any other
    * string names a BRANCH and serves its head (the audit-from-SQL leg
    * of write-audit-publish: `SELECT ... FROM cat.t VERSION AS OF
    * 'audit'` reads exactly what publish would make live). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (Snap.head(spark, dir).isEmpty) throw new NoSuchTableException(ident)
    val m =
      if (version.nonEmpty && version.forall(_.isDigit))
        Snap.atVersion(spark, dir, version.toInt)
      else SnapBranch.head(spark, dir, version).getOrElse(sys.error(
        s"snap catalog: $ident has no branch '$version' (VERSION AS OF " +
          "takes a committed version number or a live branch name)"))
    new SnapTable(spark, dir, None,
      pinned = Some((m, s"VERSION AS OF $version")))
  }

  /** `TIMESTAMP AS OF` — Spark hands micros-since-epoch; serves the
    * newest version whose manifest landed at or before that instant
    * (commit time = the manifest file's store mtime, the Delta-lake
    * convention — the format stamps no wall clock of its own). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (Snap.head(spark, dir).isEmpty) throw new NoSuchTableException(ident)
    val m = Snap.versionAsOfTimestamp(spark, dir, timestampMicros / 1000L)
    new SnapTable(spark, dir, None,
      pinned = Some((m, s"TIMESTAMP AS OF ${timestampMicros / 1000L}ms")))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    // a bucket(n, col) partition transform is the idiomatic way to say
    // hash layout; everything else comes from TBLPROPERTIES
    val bucketT: Option[(Int, String)] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name() == "bucket" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        val n = t.arguments().collectFirst {
          case l: V2Literal[_] if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue
        }
        n.map(v => (v, t.references()(0).fieldNames()(0)))
      case other => sys.error(s"snap catalog: unsupported partitioning " +
        s"${other.mkString(",")} — use PARTITIONED BY (bucket(n, col)) " +
        "or TBLPROPERTIES")
    }
    val keyCols: Seq[String] = props.get("key").map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty))
      .orElse(bucketT.map(b => Seq(b._2)))
      .getOrElse(sys.error("snap catalog: CREATE TABLE needs the key — " +
        "TBLPROPERTIES ('key'='c1,c2') or PARTITIONED BY (bucket(n, c1))"))
    val bucketCol = props.getOrElse("bucket_col",
      bucketT.map(_._2).getOrElse(keyCols.head))
    val buckets = props.get("buckets").map(_.toInt)
      .orElse(bucketT.map(_._1)).getOrElse(8)
    val spec = SnapPendingSpec(
      schema = schema, keyCols = keyCols, bucketCol = bucketCol,
      buckets = buckets, layout = props.getOrElse("layout", "hash"),
      zorderBy = props.getOrElse("zorder_by", ""),
      statsCols = props.get("stats").map(_.split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty),
      mode = props.getOrElse("mode", "cow"),
      tag = s"sqlcat:${(ident.namespace :+ ident.name).mkString(".")}")
    spec.validate()
    val dir = dirOf(ident)
    val f = Published.fsOf(dir)
    Published.retryIO()(f.mkdirs(dir))
    require(Published.createNewAtomic(f,
      new HPath(dir, SnapPendingSpec.MarkerName), spec.render),
      s"snap catalog: concurrent CREATE TABLE of $ident — lost the race")
    new SnapTable(spark, dir, Some(spec))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) false
    else {
      Published.retryIO()(Published.fsOf(dir).delete(dir, true))
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snap catalog: a table IS its directory; rename is not supported " +
        "(copy via CTAS, or move the directory offline)")

  /** Additive evolution only, routed through the format's
    * metadata-only commits (no data rewrites, old snapshots intact). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "snap catalog: nested ADD COLUMN is not supported")
        val ddl = StructType(Seq(
          org.apache.spark.sql.types.StructField(
            a.fieldNames()(0), a.dataType(), a.isNullable))).toDDL
        Snap.addColumns(spark, dir, ddl)
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          "snap catalog: nested RENAME COLUMN is not supported")
        Snap.renameColumn(spark, dir, r.fieldNames()(0), r.newName())
      case s: TableChange.SetProperty if s.property() == "mode" =>
        SnapPendingSpec.setMode(dir, s.value())
      case other => throw new UnsupportedOperationException(
        s"snap catalog: unsupported ALTER $other (additive evolution " +
          "only: ADD COLUMNS, RENAME COLUMN, SET TBLPROPERTIES mode)")
    }
    loadTable(ident)
  }

  // -------------------------------------------------------- procedures

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    SnapProcedures.load(catalogName, root, ident).getOrElse(
      sys.error(s"snap catalog: no procedure $ident — the surface is " +
        s"system.{${SnapProcedures.names.mkString(",")}}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(SnapProcedures.Namespace)) Array.empty
    else SnapProcedures.names
      .map(n => Identifier.of(SnapProcedures.Namespace, n)).toArray

  // -------------------------------------------------------- namespaces

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] =
    if (!Published.exists(fs, root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir).map(p => Array(p.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val dir = dirOf(namespace.toSeq)
      if (!Published.exists(fs, dir))
        throw new NoSuchNamespaceException(namespace)
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
        .filterNot(isTableDir).map(p => namespace :+ p.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (Published.exists(fs, dirOf(namespace.toSeq)) &&
        !isTableDir(dirOf(namespace.toSeq)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    Published.retryIO()(fs.mkdirs(dirOf(namespace.toSeq)))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "snap catalog: namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = dirOf(namespace.toSeq)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade)
        require(fs.listStatus(dir).isEmpty,
          s"snap catalog: namespace ${namespace.mkString(".")} is not empty")
      Published.retryIO()(fs.delete(dir, true))
    }
  }
}

/** The `_sql_table` spec marker: what `CREATE TABLE` records so the
  * actual [[Snap.create]] can run at first write with real data
  * bounds. Same kv + checksum discipline as the manifests. */
final case class SnapPendingSpec(schema: StructType, keyCols: Seq[String],
                                 bucketCol: String, buckets: Int,
                                 layout: String, zorderBy: String,
                                 statsCols: Seq[String], mode: String,
                                 tag: String) {
  def validate(): Unit = {
    require(keyCols.nonEmpty, "snap catalog: empty key")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"snap catalog: key column $k is not in the schema"))
    require(keyCols.contains(bucketCol),
      "snap catalog: bucket_col must be a key column")
    require(buckets >= 1, "snap catalog: buckets must be >= 1")
    require(Seq("hash", "range", "zorder").contains(layout),
      s"snap catalog: bad layout '$layout'")
    require(Seq("cow", "mor").contains(mode),
      s"snap catalog: bad mode '$mode' (cow|mor)")
    schema.fieldNames.foreach(Snap.assertLegalColName)
    require(!schema.fieldNames.contains("_deleted"),
      "snap catalog: column name _deleted is reserved on SQL-writable " +
        "tables (it carries the staged delete flag)")
  }

  /** Run the deferred create with the first write's data. */
  def create(spark: SparkSession, loc: HPath,
             data: org.apache.spark.sql.DataFrame): Unit =
    Snap.create(spark, loc, data.select(
        schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*),
      keyCols, bucketCol, buckets, layout = layout, tag = tag,
      statsCols = statsCols, zorderBy = zorderBy)

  def render: Array[Byte] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val body = (Seq("graft-snap-table 1",
      s"schema=${enc(schema.toDDL)}",
      s"key=${keyCols.map(enc).mkString(",")}",
      s"bucketCol=${enc(bucketCol)}",
      s"buckets=$buckets",
      s"layout=$layout",
      s"zorderBy=${enc(zorderBy)}",
      s"stats=${statsCols.map(enc).mkString(",")}",
      s"mode=$mode",
      s"tag=${enc(tag)}").mkString("\n") + "\n").getBytes("UTF-8")
    val sum = java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(body))
    body ++ s"#commit $sum\n".getBytes("UTF-8")
  }
}

object SnapPendingSpec {
  private[sources] val MarkerName = "_sql_table"

  def read(dir: HPath): Option[SnapPendingSpec] = {
    val f = Published.fsOf(dir)
    val p = new HPath(dir, MarkerName)
    val txt =
      if (!Published.exists(f, p)) null
      else Published.retryNullable(Published.readOrNull(f, p))
    if (txt == null) None
    else {
      val footerAt = txt.lastIndexOf("#commit ")
      require(footerAt >= 0 && txt.endsWith("\n"),
        s"snap catalog: torn table spec at $p — drop and recreate")
      val body = txt.substring(0, footerAt)
      val sum = txt.substring(footerAt + "#commit ".length).trim
      require(sum == java.lang.Long.toHexString(
        graft.expressions.GraftHash.h60(body.getBytes("UTF-8"))),
        s"snap catalog: corrupt table spec at $p")
      def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
      val kv = body.split("\n").filter(_.contains("="))
        .map { l => val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1)) }
        .toMap
      Some(SnapPendingSpec(
        StructType.fromDDL(dec(kv("schema"))),
        kv("key").split(",").toSeq.filter(_.nonEmpty).map(dec),
        dec(kv("bucketCol")), kv("buckets").toInt, kv("layout"),
        dec(kv("zorderBy")),
        kv.getOrElse("stats", "").split(",").toSeq.filter(_.nonEmpty).map(dec),
        kv("mode"), dec(kv("tag"))))
    }
  }

  /** Flip the write-routing mode (the only mutable spec property). */
  def setMode(dir: HPath, mode: String): Unit = {
    require(Seq("cow", "mor").contains(mode),
      s"snap catalog: bad mode '$mode' (cow|mor)")
    val f = Published.fsOf(dir)
    val cur = read(dir).getOrElse(sys.error(
      s"snap catalog: $dir has no table spec (created via the Scala " +
        "API?) — mode only applies to catalog-created tables"))
    val p = new HPath(dir, MarkerName)
    Published.retryIO()(f.delete(p, false))
    require(Published.createNewAtomic(f, p, cur.copy(mode = mode).render),
      s"snap catalog: concurrent spec update at $dir")
  }
}

/** One snap table as the catalog serves it. Reads resolve the head
  * manifest at scan build (a registered DataFrame stays snapshot-
  * pinned, like every other read path); writes stage + route through
  * the commit machinery; MERGE/UPDATE/DELETE are delta-based row-level
  * operations (Spark hands us the changed rows, we commit O(delta)). */
final class SnapTable(spark: SparkSession, loc: HPath,
                      pending: Option[SnapPendingSpec],
                      pinned: Option[(Snap.SnapManifest, String)] = None)
  extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations {

  // a pinned table (VERSION/TIMESTAMP AS OF, branch ref) serves that
  // manifest for everything — schema, keys, scan — and refuses writes
  private def headOpt = pinned.map(_._1).orElse(Snap.head(spark, loc))
  private val spec: Option[SnapPendingSpec] = pending.orElse(
    SnapPendingSpec.read(loc))

  // key columns surface NON-nullable: the format refuses null keys at
  // every write, and Spark's row-level ops require it of row IDs
  private def logicalSchema: StructType = {
    val raw = headOpt.map(_.schema).orElse(spec.map(_.schema)).getOrElse(
      sys.error(s"snap catalog: $loc has neither a manifest nor a spec"))
    val keys = keyCols.toSet
    StructType(raw.fields.map(f =>
      if (keys.contains(f.name)) f.copy(nullable = false) else f))
  }
  private def keyCols: Seq[String] =
    headOpt.map(_.keyCols).orElse(spec.map(_.keyCols)).get
  private def mode: String = spec.map(_.mode).getOrElse("cow")

  override def name(): String =
    pinned.fold(loc.toString) { case (_, d) => s"$loc [$d]" }
  override def schema(): StructType = logicalSchema
  override def capabilities(): util.Set[TableCapability] =
    if (pinned.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("key", keyCols.mkString(","))
    m.put("mode", mode)
    headOpt.foreach { h =>
      m.put("buckets", h.buckets.toString)
      m.put("layout", h.layout)
      m.put("version", h.version.toString)
    }
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    headOpt match {
      case Some(m) => new SnapScanBuilder(spark, loc, m)
      case None => new SnapEmptyScanBuilder(logicalSchema)
    }

  private def refusePinnedWrite(): Unit =
    pinned.foreach { case (_, d) => sys.error(
      s"snap catalog: $loc [$d] is a pinned read — writes go to the " +
        "current table (or to a branch via its procedures)") }

  // SupportsStreamingUpdateAsAppend: update-mode output of a streaming
  // aggregate is exactly this table's upsert contract — changed rows
  // keyed by the grouping; truncate covers INSERT OVERWRITE and
  // complete-mode streaming (each batch replaces the content)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    refusePinnedWrite()
    new WriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = stagedWrite(info, None, replace)
    }
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    refusePinnedWrite()
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new SnapRowLevelOperation(SnapTable.this, info.command())
    }
  }

  private[sources] def stagedWrite(info: LogicalWriteInfo,
                                   rowId: Option[StructType],
                                   replace: Boolean = false): SnapStagedWrite = {
    // the first write against a pending table IS the create
    val pendingCreate = if (headOpt.isEmpty) Some(spec.getOrElse(
      sys.error(s"snap catalog: $loc never committed and has no spec")))
    else None
    new SnapStagedWrite(spark, loc, logicalSchema, keyCols, mode,
      info.schema(), rowId, pendingCreate, replace, info.queryId())
  }

  private[sources] def rowLevelScanBuilder(): ScanBuilder =
    newScanBuilder(CaseInsensitiveStringMap.empty())
  private[sources] def keyRefs: Array[NamedReference] =
    keyCols.map(c => Expressions.column(c)).toArray
}

/** Delta-based row-level operation: the scan is the table's pruning
  * scan (row-exact filtering is SAFE for delta ops — only the rows
  * Spark hands back get written, nothing is group-rewritten), the
  * write is the shared staged write, and the row ID is the table key. */
final class SnapRowLevelOperation(table: SnapTable, cmd: Command)
  extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): Command = cmd
  override def description(): String = s"graft-snap $cmd"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.rowLevelScanBuilder()

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        val rowId: Option[StructType] =
          if (info.rowIdSchema().isPresent) Some(info.rowIdSchema().get)
          else None
        table.stagedWrite(info, rowId)
      }
    }

  override def rowId(): Array[NamedReference] = table.keyRefs

  // updates arrive as update(id, old→new); the writer itself splits a
  // key-moving update into delete(old)+insert(new)
  override def representUpdateAsDeleteAndInsert(): Boolean = false
}

/** Scan over a pending (never-committed) table: schema, zero rows. */
final class SnapEmptyScanBuilder(schema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = Array.empty
    override def createReaderFactory(): PartitionReaderFactory =
      (_: InputPartition) => sys.error("empty scan has no partitions")
  }
}
