package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance verbs as SQL stored procedures — the DSv2
  * `ProcedureCatalog` surface (Spark 4's `CALL` statement, the
  * Iceberg-procedures shape), so the LAST Scala-API-only operations
  * run from a SQL prompt:
  *
  * {{{
  * CALL snapcat.system.optimize(table => 'ns.t')
  * CALL snapcat.system.vacuum('ns.t', keep_versions => 3)
  * CALL snapcat.system.rebucket('ns.t', 16)
  * CALL snapcat.system.history('ns.t')
  * CALL snapcat.system.retention('ns.t')
  * CALL snapcat.system.create_branch('ns.t', 'audit')
  * CALL snapcat.system.publish_branch('ns.t', 'audit')
  * CALL snapcat.system.drop_branch('ns.t', 'audit')
  * }}}
  *
  * Every procedure routes through the EXISTING engine calls (lease,
  * OCC, manifest atomicity all inherited) and returns its result as
  * rows — `history` returns the full per-version frame, the mutators
  * return the version they committed. Result sets are manifest-
  * metadata-sized (O(versions within the retention horizon) at most),
  * never data-sized, so the driver-side materialization `LocalScan`
  * requires is bounded by construction. */
private[sources] object SnapProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] = all.map(_.name)

  def load(catalogName: String, root: HPath,
           ident: Identifier): Option[UnboundProcedure] =
    if (!(ident.namespace.sameElements(Namespace))) None
    else all.find(_.name == ident.name)
      .map(p => new SnapUnboundProcedure(catalogName, root, p))

  private def spark: SparkSession = SparkSession.active

  /** One procedure: parameters after the leading `table` one, output
    * schema, and the engine call. */
  private final case class ProcDef(name: String, description: String,
                                   params: Seq[ProcedureParameter],
                                   output: StructType,
                                   run: (HPath, InternalRow) => Seq[Seq[Any]])

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pDefault(name: String, dt: DataType,
                       default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private val versionOut = new StructType().add("version", IntegerType)

  private val all: Seq[ProcDef] = Seq(
    ProcDef("optimize",
      "fold each fat bucket's base/delta/dv files into one file per " +
        "bucket; returns the committed version (the head if a no-op)",
      Seq(pDefault("min_files_per_bucket", IntegerType, "2")),
      versionOut,
      (loc, args) => Seq(Seq(Snap.optimize(spark, loc, args.getInt(1))))),

    ProcDef("vacuum",
      "delete manifests and data files only the versions beyond " +
        "keep_versions reference; returns what was reclaimed",
      Seq(pDefault("keep_versions", IntegerType, "2")),
      new StructType().add("manifests_deleted", IntegerType)
        .add("data_files_deleted", IntegerType)
        .add("stage_dirs_swept", IntegerType),
      (loc, args) => {
        val (m, d, s) = Snap.vacuum(spark, loc, args.getInt(1))
        Seq(Seq(m, d, s))
      }),

    ProcDef("rebucket",
      "rewrite every resolved row under a new bucket count with " +
        "range/zorder bounds re-derived from current data",
      Seq(p("buckets", IntegerType)),
      versionOut,
      (loc, args) => Seq(Seq(Snap.rebucket(spark, loc, args.getInt(1))))),

    ProcDef("history",
      "one row per committed version within the retention horizon, " +
        "from manifest metadata alone",
      Seq.empty,
      new StructType().add("version", IntegerType).add("op", StringType)
        .add("parent", IntegerType).add("base", IntegerType)
        .add("rebased", org.apache.spark.sql.types.BooleanType)
        .add("n_files", LongType).add("n_rows", LongType)
        .add("n_deltas", LongType).add("n_delta_rows", LongType)
        .add("buckets", IntegerType).add("applied", LongType),
      (loc, _) => Snap.history(spark, loc).collect().toSeq
        .map(_.toSeq)),

    ProcDef("retention",
      "what a vacuum(keep_versions) would keep and reclaim — a read, " +
        "deletes nothing, takes no lease",
      Seq(pDefault("keep_versions", IntegerType, "2")),
      new StructType().add("versions_total", LongType)
        .add("versions_kept", LongType)
        .add("oldest_readable_version", LongType)
        .add("manifests_reclaimable", LongType)
        .add("files_reclaimable", LongType)
        .add("bytes_reclaimable", LongType),
      (loc, args) => Snap.retention(spark, loc, args.getInt(1))
        .collect().toSeq.map(_.toSeq)),

    ProcDef("create_branch",
      "fork the current main head as the branch's v1 — pure metadata, " +
        "files by reference; returns the main version forked from",
      Seq(p("branch", StringType)),
      new StructType().add("forked_from_version", IntegerType),
      (loc, args) =>
        Seq(Seq(SnapBranch.create(spark, loc, args.getString(1))))),

    ProcDef("publish_branch",
      "fast-forward main to the branch head as one commit, gated on " +
        "main still sitting at the fork version; returns the new main " +
        "version",
      Seq(p("branch", StringType)),
      versionOut,
      (loc, args) =>
        Seq(Seq(SnapBranch.publish(spark, loc, args.getString(1))))),

    ProcDef("drop_branch",
      "discard a branch's manifest chain; its exclusive files fall to " +
        "the next vacuum",
      Seq(p("branch", StringType)),
      new StructType().add("dropped", org.apache.spark.sql.types.BooleanType),
      (loc, args) => {
        SnapBranch.drop(spark, loc, args.getString(1))
        Seq(Seq(true))
      }))

  /** Binding is trivial (parameters are static); `call` resolves the
    * table directory under the catalog root and runs the engine call
    * on the driver — these are metadata commits orchestrating
    * distributed jobs, not data movement through the driver. */
  private final class SnapUnboundProcedure(catalogName: String, root: HPath,
                                           d: ProcDef)
    extends UnboundProcedure with BoundProcedure {

    override def name(): String = d.name
    override def description(): String = d.description
    override def bind(inputType: StructType): BoundProcedure = this

    override def parameters(): Array[ProcedureParameter] =
      (ProcedureParameter.in("table", StringType)
        .comment("table identifier relative to the catalog root, " +
          "e.g. 'ns.t' or 't'").build() +: d.params).toArray

    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val parts = table.split('.').toSeq.filter(_.nonEmpty)
      require(parts.nonEmpty, s"CALL $catalogName.system.${d.name}: " +
        "empty table identifier")
      val loc = parts.foldLeft(root)((p, s) => new HPath(p, s))
      require(Snap.head(spark, loc).nonEmpty,
        s"CALL $catalogName.system.${d.name}: $table is not a committed " +
          s"snap table under $root")
      val out = d.output
      val resultRows = d.run(loc, input).map { vals =>
        InternalRow.fromSeq(vals.zip(out.fields).map {
          case (v: String, _) => UTF8String.fromString(v)
          case (v, _) => v
        })
      }.toArray
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = resultRows
      }).iterator()
    }
  }
}
