package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hooks for the object-store sim, separated so specs can schedule a
  * deterministic interleaving inside a rename's copy phase without the
  * filesystem class itself carrying test state. */
private[graft] object S3Sim {
  /** Called after EACH file lands in a rename's copy phase (arg: the
    * just-copied destination). Specs park here to observe the torn
    * window a copy-rename store exposes; default no-op. */
  @volatile var renameFileHook: Path => Unit = _ => ()

  /** Per-file sleep (ms) inside a rename's copy phase — the subprocess
    * crash probes set this to widen the mid-swap window enough to land
    * a kill -9 inside it. 0 in normal operation. */
  lazy val slowRenameMs: Long =
    sys.env.get("SPARK_GRAFT_S3_SLOW_RENAME_MS")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(0L)

  // The TRANSIENT fault engine (put/get/list/delete/copy taps below)
  // lives in [[StoreFaults]] — shared with the hdfs sim since r16; the
  // retryable-error class is not object-store-specific.
}

/** The [[org.apache.hadoop.fs.AbstractFileSystem]] face of the s3 sim —
  * what the FileContext API resolves (`fs.AbstractFileSystem.s3a.impl`).
  * Spark's streaming CheckpointFileManager prefers FileContext, so a
  * checkpoint located under `s3a://` needs this binding exactly like a
  * real deployment needs hadoop-aws's `S3A` class; without it the
  * stream dies at plan time with ClassNotFoundException (found by the
  * first s3-rooted StreamRestartProbe run). Delegation preserves the
  * sim's semantics — FileContext renames route to the copy+delete
  * [[S3SimFileSystem.rename]]. */
class S3SimAbstractFileSystem(uri: URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new S3SimFileSystem, conf, "s3a", false)

/** An OBJECT-STORE-SEMANTICS simulation filesystem — the third storage
  * class the publish machinery claims to survive, after POSIX local and
  * the HDFS sim ([[HdfsSimFileSystem]]). Registered under the `s3a`
  * scheme (opt-in — `SPARK_GRAFT_S3_SIM=true`, wired in
  * [[graft.Session.builder]]; this image ships no real S3A connector,
  * so nothing is hijacked), backing onto local disk so specs and probe
  * scripts inspect state with java.nio while every engine operation
  * resolves through `org.apache.hadoop.fs` like a real connector.
  *
  * The semantics enforced are the ones that make object stores the
  * HARD case for publish machinery — each one strictly worse than the
  * POSIX behavior the local backing would otherwise leak through:
  *
  *  - '''rename is NOT a metadata operation.''' S3 has no rename; S3A
  *    emulates it as per-object COPY + per-object DELETE — O(files),
  *    non-atomic, with every intermediate state (partial destination,
  *    then doubled content, then shrinking source) visible to a
  *    concurrent lister. This sim does exactly that: copy every file
  *    (each copy a fresh PUT the store itself timestamps), THEN delete
  *    the source tree, with an injectable per-file hook
  *    ([[S3Sim.renameFileHook]]) and an env stall
  *    (`SPARK_GRAFT_S3_SLOW_RENAME_MS`) so specs and crash probes can
  *    land inside the window. The publish machinery's correctness
  *    argument on such a store is NOT rename atomicity — it is the
  *    marker manifest: a reader that lists a half-copied table sees
  *    files the marker's manifest does not account for (or no marker
  *    at all) and refuses to serve ([[Published.ensure]]), degrading
  *    to wait-out-the-writer's-lease. S3SimSpec executes that torn
  *    window; the subprocess probes (PLANS.md r14) kill a publisher
  *    INSIDE the swap copy and require the next JVM to sweep and
  *    rebuild.
  *  - '''rename never clobbers.''' S3A's rename returns false onto an
  *    existing file destination and moves INTO an existing directory —
  *    same contract surface as HDFS, kept here so the engine cannot
  *    lean on POSIX rename-overwrite under this scheme either.
  *  - '''`setTimes` is a SILENT no-op''' — Hadoop's `FileSystem` base
  *    behavior, which S3A inherits: objects have no touch; the call
  *    "succeeds" without moving Last-Modified. This is the store
  *    profile the lease heartbeat's verified-touch + content-bump
  *    machinery exists for ([[Published.withLease]]): on a non-local
  *    scheme the bump is primary, each bump a fresh PUT the store
  *    timestamps server-side.
  *  - '''create-no-overwrite is an atomic conditional put.''' S3
  *    conditional writes (`If-None-Match: *`) give exactly-one-winner
  *    PUT semantics, which is precisely the contract
  *    [[Published.createNewAtomic]] requires of an object-store
  *    connector (its scaladoc; pinned executable by LeaseContractSpec's
  *    racy-vs-conditional schedules). The sim models a connector WITH
  *    conditional put — a check-then-put connector is demonstrated
  *    double-winning in LeaseContractSpec and is outside the contract.
  *
  * What it is NOT: a real object store. Request latency, multipart
  * upload boundaries, and IAM failures are absent; directory objects
  * exist for free because the backing store is a local filesystem (S3A
  * presents the same dir facade over key prefixes). List-after-write
  * consistency is NOT simulated as a gap because S3 itself has been
  * strongly consistent since 2020-12 — the machinery's reasoning never
  * depends on read-after-list anyway (markers gate serving; leases
  * gate writing). The RETRYABLE-error class IS modeled (r14 verdict
  * ask #1): [[StoreFaults.maybeFault]] can throw a transient IOException on
  * any PUT/GET/LIST/DELETE and on each per-object copy/delete inside a
  * rename — probabilistically (seeded, env-driven: the fault probe
  * legs) or deterministically (spec hook) — at the exact API boundary
  * where a real connector surfaces a 500/reset after its own retries
  * are exhausted. */
class S3SimFileSystem extends RawLocalFileSystem
    with CreateNoOverwriteIntercept with MaterializedPermissions {

  override def getUri: URI = URI.create("s3a://graftbucket")

  override def getScheme: String = "s3a"

  // -------------------------------------------- transient-fault taps
  // Each override faults BEFORE delegating: a failed request reaches
  // the service boundary and does nothing — a faulted conditional PUT
  // claims no key, a faulted LIST returns no partial listing. The
  // create pair must tap BOTH public overloads (the same subtlety
  // CreateNoOverwriteIntercept documents); super chains through the
  // intercept trait, so the no-overwrite claim still runs for the
  // requests that survive the fault gate.
  // "put" = plain PUT (overwrite create); "putif" = conditional PUT
  // (create-new) — split so a spec can fault heartbeat BUMPS (plain
  // rewrites) without also blocking a rival's ACQUIRE attempt on the
  // same path; both are in the probabilistic default set.
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    StoreFaults.maybeFault(if (overwrite) "put" else "putif", f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    StoreFaults.maybeFault(if (overwrite) "put" else "putif", f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    StoreFaults.maybeFault("get", f)
    super.open(f, bufferSize)
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    StoreFaults.maybeFault("list", f)
    super.listStatus(f)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    StoreFaults.maybeFault("delete", f)
    super.delete(f, recursive)
  }

  /** Conditional-put create-new: exactly one concurrent no-overwrite
    * create of `f` wins (S3 `If-None-Match: *`). nio createFile is
    * O_EXCL — the winner holds the (empty) object before its stream
    * opens, so the open overwrites only its own claim. */
  override protected def onCreateNoOverwrite(f: Path): Unit = {
    val local = pathToFile(f).toPath
    java.nio.file.Files.createDirectories(local.getParent)
    try { java.nio.file.Files.createFile(local); () }
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"s3sim: $f already exists (conditional put refused)")
    }
  }

  /** A stream open that fails AFTER the conditional put claimed the key
    * must not orphan an empty token-less object (same failure atomicity
    * as [[Published.createNewAtomic]]'s local branch). */
  override protected def onOpenFailedAfterClaim(f: Path): Unit = {
    java.nio.file.Files.deleteIfExists(pathToFile(f).toPath); ()
  }

  /** Objects have no touch: silently succeed without moving mtime
    * (Hadoop base-class behavior, inherited by S3A). The lease
    * heartbeat's VERIFIED touch detects exactly this shape — an
    * unverified one would count the no-op as a successful beat. */
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()

  /** S3A-shaped rename: never clobbers, and is executed as per-object
    * copy (fresh PUTs, store-stamped mtimes) followed by per-object
    * delete — non-atomic, intermediate states visible. */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcF = pathToFile(src)
    val dstF = pathToFile(dst)
    if (!srcF.exists()) false
    else if (dstF.isDirectory) {
      val into = new java.io.File(dstF, srcF.getName)
      if (into.exists()) false
      else copyThenDelete(srcF, into)
    } else if (dstF.exists()) false
    else copyThenDelete(srcF, dstF)
  }

  /** The copy phase lands every file at the destination (hook + stall
    * after each), the delete phase then removes the source tree —
    * S3A's two-pass emulation. A crash anywhere in between leaves
    * partial-dst/complete-src, doubled content, or partial-src states;
    * none may ever be SERVED (that is the marker manifest's job, not
    * this method's). */
  private def copyThenDelete(src: java.io.File, dst: java.io.File): Boolean = {
    def copyTree(s: java.io.File, d: java.io.File): Unit =
      if (s.isDirectory) {
        java.nio.file.Files.createDirectories(d.toPath)
        // sorted for a deterministic copy order — specs and probes
        // reason about "first k files copied". listFiles is null if a
        // concurrent JVM (stale-breaker retire) removed the dir mid-walk;
        // treat as empty — the caller's rename then behaves like a real
        // S3A rename racing a delete, not an NPE.
        Option(s.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).foreach(c =>
            copyTree(c, new java.io.File(d, c.getName)))
      } else {
        StoreFaults.maybeFault("copy", new Path(d.toURI.getPath))
        Option(d.getParentFile).foreach(p =>
          java.nio.file.Files.createDirectories(p.toPath))
        // copy WITHOUT attributes: the "PUT" gets the store's own
        // fresh Last-Modified, like a real object copy
        java.nio.file.Files.copy(s.toPath, d.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        if (S3Sim.slowRenameMs > 0) Thread.sleep(S3Sim.slowRenameMs)
        S3Sim.renameFileHook(new Path(d.toURI.getPath))
      }
    def deleteTree(s: java.io.File): Unit = {
      if (s.isDirectory)
        Option(s.listFiles()).getOrElse(Array.empty[java.io.File])
          .foreach(deleteTree)
      else StoreFaults.maybeFault("deletefile", new Path(s.toURI.getPath))
      s.delete(); ()
    }
    copyTree(src, dst)
    deleteTree(src)
    true
  }
}
