package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Intercepts EVERY create-no-overwrite entry point of a
  * [[RawLocalFileSystem]]-backed filesystem. RawLocalFileSystem
  * overrides both public create shapes — the 6-arg boolean variant
  * (which `FileSystem.create(p, overwrite)` convenience chains end at,
  * routing to a private helper WITHOUT passing through the
  * FsPermission variant) and the FsPermission variant — so anything
  * changing create-new semantics must intercept both or silently miss
  * the exact call [[Published.createNewAtomic]] makes. ONE copy of
  * that subtlety lives here; [[HdfsSimFileSystem]] and the
  * LeaseContractSpec mock stores all mix it in. */
private[graft] trait CreateNoOverwriteIntercept extends RawLocalFileSystem {
  /** Runs before a no-overwrite create opens its stream: throw Hadoop's
    * FileAlreadyExistsException to refuse, or atomically claim the
    * path. After it returns, the open proceeds with overwrite=true (the
    * claim, if any, already holds the file). */
  protected def onCreateNoOverwrite(f: Path): Unit

  /** Cleanup when the stream open fails AFTER [[onCreateNoOverwrite]]
    * claimed the path: claim-style interceptors delete their claim so a
    * transient open failure can't orphan an empty token-less file that
    * every later acquirer loses to until the stale break. */
  protected def onOpenFailedAfterClaim(f: Path): Unit = ()

  private def opened(f: Path)(open: => FSDataOutputStream): FSDataOutputStream =
    try open
    catch { case e: Throwable => onOpenFailedAfterClaim(f); throw e }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      onCreateNoOverwrite(f)
      opened(f)(super.create(f, true, bufferSize, replication, blockSize,
        progress))
    } else super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      onCreateNoOverwrite(f)
      opened(f)(super.create(f, permission, true, bufferSize, replication,
        blockSize, progress))
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
}

/** Materializes permissions into every [[org.apache.hadoop.fs.FileStatus]]
  * the sim returns, instead of RawLocalFileSystem's DEPRECATED lazy
  * status whose `getPermission` shells out via `new java.io.File(uri)` —
  * a constructor that rejects any non-`file` URI. That lazy load is
  * harmless under `file://` and never fires on the plain-`listStatus`
  * paths, but Spark lists `s3a`-schemed roots through
  * `FileSystem.listFiles` (the `spark.sql.files.useListFilesFileSystemList`
  * default), whose `LocatedFileStatus` construction eagerly reads
  * permissions — crashing any RawLocal-backed sim registered under a
  * foreign scheme ("URI scheme is not file", found by the first q50 run
  * against the s3 sim). Fixed permissions are also the FAITHFUL
  * behavior: real object-store connectors report synthetic permissions
  * (S3A: 666/777), and HDFS stamps them namenode-side — neither ever
  * execs a local `ls`. */
private[graft] trait MaterializedPermissions extends RawLocalFileSystem {
  private def worm(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", null, st.getPath)
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    worm(super.getFileStatus(f))
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(worm)
}

/** The [[org.apache.hadoop.fs.AbstractFileSystem]] face of the hdfs sim
  * (`fs.AbstractFileSystem.hdfs.impl`): the FileContext API — which
  * Spark's streaming CheckpointFileManager prefers — would otherwise
  * resolve the `hdfs` scheme to the real `org.apache.hadoop.fs.Hdfs`
  * client and dial a namenode called `graftsim`. Registered only under
  * the same opt-in env as the sim itself. */
class HdfsSimAbstractFileSystem(uri: java.net.URI,
                                conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new HdfsSimFileSystem, conf, "hdfs", false)

/** An HDFS-SEMANTICS simulation filesystem — the closest executable
  * stand-in this zero-egress image allows for the r13 verdict's
  * MiniDFSCluster ask (the image ships only `hadoop-client-api` /
  * `hadoop-client-runtime`; no namenode/datanode classes exist to
  * boot a real MiniDFS, and nothing can be downloaded).
  *
  * What it is: local disk behind `org.apache.hadoop.fs` resolution,
  * registered under the `hdfs` scheme (opt-in —
  * `SPARK_GRAFT_HDFS_SIM=true`, wired in [[graft.Session.builder]]),
  * with HDFS's DOCUMENTED semantics enforced where they are STRICTER
  * than the backing POSIX ones, so code that would misbehave on real
  * HDFS fails here instead of silently passing on local leniency:
  *
  *  - `create(p, overwrite=false)` is ATOMIC create-new (HDFS: one
  *    namenode `startFile` op). RawLocalFileSystem's version is
  *    check-then-act — exactly the reopened race
  *    [[Published.createNewAtomic]]'s scaladoc warns about and
  *    LeaseContractSpec demonstrates — so both create overloads route
  *    the no-overwrite claim through nio `createFile` (open(2)
  *    O_CREAT|O_EXCL): exactly-one-winner, like the namenode.
  *  - `rename(src, dst)` follows HDFS rules, NOT rename(2): a dst
  *    that exists as a FILE fails the rename (returns false — POSIX
  *    would silently clobber it); a dst that is a DIRECTORY moves src
  *    INTO it (fails if the target name is taken); renaming a
  *    directory onto an existing empty directory — POSIX-legal —
  *    fails too. Running the whole engine over this proves no publish
  *    or committer path leans on rename-overwrite.
  *  - One authority (`hdfs://graftsim`), one clock: mtimes are
  *    stamped by the backing store at operation time, which is also
  *    HDFS's story (namenode-side stamps) collapsed to one host.
  *
  * What it is NOT, stated so nobody mistakes the evidence: a real
  * namenode. RPC latency, lease recovery on open write streams,
  * block-level replication and safe-mode behavior are absent — those
  * claims stay scaladoc reasoning ([[Published.createNewAtomic]],
  * [[Published.withLease]]) until a deployment runs the suite against
  * real HDFS. What DOES become executed fact with this sim: every
  * non-`file`-scheme branch of the publish machinery (generic
  * create-new, delete-then-rename `replace`, content-bump heartbeat,
  * manifest walks) and Spark's own read/write/committer stack
  * resolving the warehouse through a foreign scheme end-to-end
  * (HdfsSimSpec; full Verify + oracle + bench + crash probe runs
  * recorded in PLANS.md r14). */
class HdfsSimFileSystem extends RawLocalFileSystem
    with CreateNoOverwriteIntercept with MaterializedPermissions {

  override def getUri: URI = URI.create("hdfs://graftsim")

  override def getScheme: String = "hdfs"

  // -------------------------------------------- transient-fault taps
  // Shared with the s3 sim ([[StoreFaults]], r15 verdict ask #2): an
  // HDFS client surfaces DataNode/RPC blips as the same post-retry
  // IOException class. Each tap faults BEFORE delegating — a failed
  // RPC reaches the namenode and does nothing. The one scheme
  // difference: rename here is ONE atomic metadata op, so the fault
  // lands on the CALL ("rename"), never on a torn half-rename — there
  // is no per-object copy/deletefile class to tap.
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

  /** The namenode-atomic create-new claim: exactly one concurrent
    * no-overwrite create of `f` may win. nio createFile is O_EXCL —
    * the winner holds the (empty) file before its stream opens, so
    * the subsequent open can safely overwrite its own claim. */
  override protected def onCreateNoOverwrite(f: Path): Unit = {
    val local = pathToFile(f).toPath
    java.nio.file.Files.createDirectories(local.getParent)
    try { java.nio.file.Files.createFile(local); () }
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"hdfssim: $f already exists (namenode-atomic create-new)")
    }
  }

  /** Failure atomicity, matching [[Published.createNewAtomic]]'s local
    * branch: a stream open that fails AFTER the O_EXCL claim succeeded
    * must not orphan an empty token-less file — every later acquirer
    * would lose to the ghost until the stale break. */
  override protected def onOpenFailedAfterClaim(f: Path): Unit = {
    java.nio.file.Files.deleteIfExists(pathToFile(f).toPath); ()
  }

  /** HDFS rename rules (FileSystem-contract rename, the one
    * DistributedFileSystem implements): never clobber. An existing
    * FILE dst fails; an existing DIRECTORY dst means "move src into
    * it" and fails if dst/src.name is taken. POSIX rename(2) — which
    * the Raw local fallback uses — would overwrite a dst file and an
    * empty dst dir; running the engine here catches any code path
    * leaning on that. */
  override def rename(src: Path, dst: Path): Boolean = {
    StoreFaults.maybeFault("rename", src)
    val srcF = pathToFile(src)
    val dstF = pathToFile(dst)
    if (!srcF.exists()) false
    else if (dstF.isDirectory) {
      val into = new java.io.File(dstF, srcF.getName)
      if (into.exists()) false
      else super.rename(src, new Path(dst, srcF.getName))
    } else if (dstF.exists()) false
    else super.rename(src, dst)
  }
}
