package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop's raw local filesystem re-registered under its own scheme —
  * the test double for a NON-`file` warehouse (HDFS, an object-store
  * connector): resolving a `graftmock://` path through
  * `Path.getFileSystem` lands here via the standard
  * `fs.graftmock.impl` registration, exactly how a deployment plugs in
  * a real connector. Because the scheme is not `file`,
  * `Published.createNewAtomic` takes its GENERIC branch
  * (`FileSystem.create(p, overwrite=false)` + Hadoop
  * FileAlreadyExistsException mapping) — the code path a real HDFS
  * warehouse runs, unreachable through `file://` which gets the POSIX
  * CREATE_NEW override. Storage is still the local disk, so tests can
  * inspect state with java.nio. (RawLocalFileSystem's create-no-
  * overwrite is check-then-act — functionally create-new, without
  * HDFS's namenode atomicity; fine for spec-level behavior checks,
  * which is why the atomicity CONTRACT itself lives in
  * `createNewAtomic`'s per-scheme scaladoc, not here — and why
  * [[RacyCreateFileSystem]]/[[CondPutFileSystem]] pin that contract's
  * two sides as executed schedules.) */
class GraftMockFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftmock:///")
}

// The create-no-overwrite interception subtlety (BOTH public create
// overloads must be caught) lives in ONE place:
// graft.sources.CreateNoOverwriteIntercept — shared by the main-source
// HdfsSimFileSystem and every mock store below.
import graft.sources.CreateNoOverwriteIntercept

object NoSetTimesFileSystem {
  /** How often ANY instance was asked for a client-stamped touch —
    * the heartbeat spec asserts 0: on a non-local store the content
    * bump is the PRIMARY mechanism, not a fallback discovered by
    * throwing. */
  val setTimesCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** S3-shaped mtime semantics: `setTimes` is refused (object stores have
  * no touch — S3A's is a no-op, some connectors throw), but every
  * REWRITE refreshes Last-Modified, because a rewrite is a new PUT the
  * service itself timestamps (the local backing store's create does the
  * same). Exactly the store profile the lease heartbeat's content-bump
  * mode exists for: a live holder on this store keeps its lease young
  * only if the heartbeat rewrites instead of touching. */
class NoSetTimesFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftnomt:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = {
    NoSetTimesFileSystem.setTimesCalls.incrementAndGet()
    throw new java.io.IOException(
      s"graftnomt: no setTimes on this store (S3-shaped): $p")
  }
}

/** Refuses `_GRAFT_LEASE` OVERWRITES only: the initial create-new
  * acquisition and all data writes succeed, isolating a refresh-path
  * failure from everything else a spec touches. */
private[graft] trait RefuseLeaseRewrites extends RawLocalFileSystem {
  private def refuse(f: Path, overwrite: Boolean): Unit =
    if (overwrite && f.getName.endsWith("._GRAFT_LEASE"))
      throw new java.io.IOException(
        s"${getUri.getScheme}: lease rewrite refused: $f")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    refuse(f, overwrite)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    refuse(f, overwrite)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

/** A store that refuses BOTH heartbeat mechanisms for lease files — no
  * setTimes AND lease rewrites rejected. On this (pathological) profile
  * the stale threshold genuinely degrades back to a ceiling on publish
  * duration, and the heartbeat's contract is to say so LOUDLY after 3
  * consecutive failed beats instead of silently dropping the guarantee. */
class NoRefreshFileSystem extends NoSetTimesFileSystem
    with RefuseLeaseRewrites {
  override def getUri: URI = URI.create("graftnorf:///")
}

/** The SNEAKIER profile of the same degradation: `setTimes` is a SILENT
  * no-op — Hadoop's `FileSystem` base implementation and most
  * object-store connectors (S3A included) return without doing
  * anything — and lease rewrites are refused. An UNVERIFIED touch on
  * this store reports success while the lease quietly ages to
  * breakable: the exact shape that would mask total refresh failure
  * behind the fallback path. The heartbeat's contract here is the same
  * LOUD ceiling warning as [[NoRefreshFileSystem]] — which it can only
  * deliver by VERIFYING that a touch actually moved the mtime. */
class SilentMtimeFileSystem extends RawLocalFileSystem
    with RefuseLeaseRewrites {
  override def getUri: URI = URI.create("graftsmt:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()
}

/** Schedulable interleaving point for the create-new contract specs:
  * [[RacyCreateFileSystem]] runs it inside the check-act gap,
  * [[CondPutFileSystem]] immediately before its atomic claim, so ONE
  * thread schedule can be replayed against both connector shapes. */
object CreateContract {
  @volatile var hook: () => Unit = () => ()
}

/** The connector shape `Published.createNewAtomic`'s scaladoc WARNS
  * about (its object-store clause): create-no-overwrite implemented as
  * check-then-put. The existence check and the PUT are two separate
  * operations, so two racers can both pass the check and both "win" —
  * the second PUT silently clobbering the first's lease. This class
  * exists to pin that documented hazard as an EXECUTED fact
  * (LeaseContractSpec), so a refactor can't quietly start trusting
  * `create(p, false)` on stores without conditional-put. */
class RacyCreateFileSystem extends RawLocalFileSystem
    with CreateNoOverwriteIntercept {
  override def getUri: URI = URI.create("graftracy:///")
  override protected def onCreateNoOverwrite(f: Path): Unit = {
    // CHECK …
    if (exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    // … the gap a real connector has between its HEAD and its PUT; the
    // open that follows is a plain PUT, overwriting whatever landed
    // meanwhile
    CreateContract.hook()
  }
}

object LandThenThrow {
  /** Armed window: while true, a lease create LANDS server-side but the
    * call throws, the client-side cleanup delete silently fails, and
    * the first [[getBlipBudget]] lease reads blip. */
  @volatile var armed: Boolean = false
  val getBlips = new java.util.concurrent.atomic.AtomicInteger(0)
  val getBlipBudget = 2
  private[graft] def leaseFile(f: Path): Boolean =
    f.getName.endsWith("._GRAFT_LEASE")
}

/** The AMBIGUOUS-fault connector shape the sims structurally cannot
  * model (they fault BEFORE the claim): the conditional PUT's request
  * succeeds SERVER-side — object created, content durable — but the
  * client gets an error (lost 200, timed-out response), its cleanup
  * delete also blips, and the next couple of reads blip too. Real
  * stores do exactly this under network partitions. The acquire loop's
  * contract (r16 review finding #1): resolve ownership by re-reading —
  * it must end up OWNING the lease it landed, never concluding
  * LeaseHeld against its own file and stalling on its own orphan. */
class LandThenThrowFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftltt:///")

  private def wrap(out: FSDataOutputStream): FSDataOutputStream = {
    val thrown = new java.util.concurrent.atomic.AtomicBoolean(false)
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        // the data LANDS (real close flushes it durably) …
        out.close()
        // … and only then does the CALL fail — once (createNewAtomic's
        // cleanup path re-closes; a second throw there would mask the
        // original error)
        if (thrown.compareAndSet(false, true))
          throw new java.io.IOException(
            "graftltt: response lost after the PUT landed")
      }
    }, null)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val out = super.create(f, overwrite, bufferSize, replication,
      blockSize, progress)
    if (!overwrite && LandThenThrow.armed && LandThenThrow.leaseFile(f))
      wrap(out)
    else out
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val out = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (!overwrite && LandThenThrow.armed && LandThenThrow.leaseFile(f))
      wrap(out)
    else out
  }

  /** The cleanup delete after the "failed" PUT blips too — the store is
    * unreachable for everyone during the window, so the landed object
    * SURVIVES the client's failure-atomicity attempt. */
  override def delete(f: Path, recursive: Boolean): Boolean =
    if (LandThenThrow.armed && LandThenThrow.leaseFile(f))
      throw new java.io.IOException(s"graftltt: delete blipped: $f")
    else super.delete(f, recursive)

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
    if (LandThenThrow.armed && LandThenThrow.leaseFile(f) &&
        LandThenThrow.getBlips.incrementAndGet() <= LandThenThrow.getBlipBudget)
      throw new java.io.IOException(s"graftltt: read blipped: $f")
    else super.open(f, bufferSize)
}

/** The connector shape the contract REQUIRES: create-no-overwrite as an
  * atomic conditional put (exactly-one-winner claim — S3 conditional
  * writes, HDFS's namenode-atomic startFile). The hook sits where the
  * racy store's gap was, so the SAME schedule that double-wins there
  * excludes here. */
class CondPutFileSystem extends RawLocalFileSystem
    with CreateNoOverwriteIntercept {
  override def getUri: URI = URI.create("graftcput:///")
  override protected def onCreateNoOverwrite(f: Path): Unit = {
    CreateContract.hook()
    val local = pathToFile(f).toPath
    java.nio.file.Files.createDirectories(local.getParent)
    // the claim IS the exclusion; opening the claimed file for write
    // is then uncontended
    try java.nio.file.Files.createFile(local)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }
}

object ManifestLandThenThrow {
  /** Armed window for the SNAP commit's ambiguity contract: a manifest
    * create LANDS server-side but the call throws, and the client-side
    * failure-atomicity delete blips too (store unreachable for
    * everyone) — the landed manifest survives. Reads stay CLEAN so the
    * commit's read-back resolution is what gets exercised. */
  @volatile var armed: Boolean = false
  val landed = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def manifestFile(f: Path): Boolean =
    f.getName.startsWith("manifest-v")
}

/** [[LandThenThrowFileSystem]]'s shape pointed at SNAP manifests: the
  * conditional PUT that commits a snapshot succeeds durably but the
  * response is lost. [[graft.sources.Snap.commitManifest]]'s contract:
  * resolve by reading the manifest back — its own writer token means
  * COMMITTED (return success, exactly one manifest), never a re-issued
  * create against its own landed commit and never a stall. */
class ManifestLandThenThrowFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftmltt:///")

  private def wrap(out: FSDataOutputStream): FSDataOutputStream = {
    val thrown = new java.util.concurrent.atomic.AtomicBoolean(false)
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        out.close()
        ManifestLandThenThrow.landed.incrementAndGet()
        if (thrown.compareAndSet(false, true))
          throw new java.io.IOException(
            "graftmltt: response lost after the manifest PUT landed")
      }
    }, null)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val out = super.create(f, overwrite, bufferSize, replication,
      blockSize, progress)
    if (!overwrite && ManifestLandThenThrow.armed &&
        ManifestLandThenThrow.manifestFile(f)) wrap(out)
    else out
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val out = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (!overwrite && ManifestLandThenThrow.armed &&
        ManifestLandThenThrow.manifestFile(f)) wrap(out)
    else out
  }

  /** The failure-atomicity delete after the "failed" PUT blips — the
    * landed manifest survives the client's cleanup attempt. */
  override def delete(f: Path, recursive: Boolean): Boolean =
    if (ManifestLandThenThrow.armed &&
        ManifestLandThenThrow.manifestFile(f))
      throw new java.io.IOException(s"graftmltt: delete blipped: $f")
    else super.delete(f, recursive)
}
