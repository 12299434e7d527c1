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

/** Intercepts EVERY create-no-overwrite entry point. RawLocalFileSystem
  * overrides both public create shapes — the 6-arg boolean variant
  * (which `FileSystem.create(p, overwrite)` convenience chains end at,
  * routing to a private helper WITHOUT passing through the FsPermission
  * variant) and the FsPermission variant — so a mock that changes
  * create-new semantics must intercept both or silently miss the exact
  * call `Published.createNewAtomic` makes. */
private[graft] trait CreateNoOverwriteIntercept extends RawLocalFileSystem {
  /** Runs before a no-overwrite create opens its stream: throw Hadoop's
    * FileAlreadyExistsException to refuse, or atomically claim the
    * path. After it returns, the open proceeds with overwrite=true (the
    * claim, if any, already holds the file). */
  protected def onCreateNoOverwrite(f: Path): Unit
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      onCreateNoOverwrite(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      onCreateNoOverwrite(f)
      super.create(f, permission, true, bufferSize, replication, blockSize,
        progress)
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
}

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

/** A store that refuses BOTH heartbeat mechanisms for lease files — no
  * setTimes AND lease rewrites rejected. On this (pathological) profile
  * the stale threshold genuinely degrades back to a ceiling on publish
  * duration, and the heartbeat's contract is to say so LOUDLY after 3
  * consecutive failed beats instead of silently dropping the guarantee.
  * Only `_GRAFT_LEASE` OVERWRITES are refused: the initial create-new
  * acquisition and all data writes succeed, isolating the failure to
  * the refresh path the WARN is about. */
class NoRefreshFileSystem extends NoSetTimesFileSystem {
  override def getUri: URI = URI.create("graftnorf:///")
  private def refuse(f: Path, overwrite: Boolean): Unit =
    if (overwrite && f.getName.endsWith("._GRAFT_LEASE"))
      throw new java.io.IOException(s"graftnorf: lease rewrite refused: $f")
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
