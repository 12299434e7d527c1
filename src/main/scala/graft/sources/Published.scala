package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Durable bucketed-table publishing — attach-or-build with a completion
  * marker, shared by the ANN index tables (`operators/Similarity`) and
  * the q50 bucketed fact tables ([[Layout.bucketizeFacts]]).
  *
  * The problem both share: bucketed tables are the at-rest form of an
  * expensive computation (a trained index; a 100 TB fact re-cluster),
  * but Spark's in-memory catalog forgets them across JVMs while the
  * warehouse keeps their files. Without this module every engine
  * restart re-paid the build (re-train, re-bucketize). With it, tables
  * are EXTERNAL — the files, not the catalog entry, are the durable
  * artifact — and a `_GRAFT_PUBLISHED` marker written only AFTER a
  * complete publish carries everything a new JVM needs to re-declare
  * the table (`CREATE TABLE … CLUSTERED BY … LOCATION`): bucket count,
  * bucket/sort column, source-snapshot fingerprint, a manifest hash of
  * the table's own data files, schema DDL. Bucket ids live in the file
  * names the bucketed writer produced, so the re-declared table keeps
  * its zero-exchange join property (pinned by PlanShapeSpec for the
  * index, LayoutSpec for the facts).
  *
  * ALL filesystem access goes through the Hadoop FileSystem API
  * resolved from the warehouse path's own scheme, so the same machinery
  * runs against `file:///`, HDFS, or any mounted Hadoop-compatible
  * store — the warehouse a 100 TB deployment actually has. The one
  * primitive whose guarantee is storage-specific, atomic create-new,
  * is isolated in [[createNewAtomic]] with a per-scheme contract.
  *
  * [[ensure]] validates EVERY hit against the request — including
  * catalog hits: a table left in this JVM's catalog by a publish for a
  * different source snapshot or bucket layout (fixed-name fact tables
  * across corpus dirs; an index whose corpus was regenerated in place
  * mid-session) is stale for THIS request and is dropped, not served.
  * Anything non-matching — a crashed partial publish (no marker), a
  * torn marker, a different bucket layout, a changed source, a location
  * holding files the marker's manifest does not account for — falls
  * through to the rebuild. The source fingerprint is metadata-only
  * ((relative name, size, mtime) of the source files — no data scan;
  * the publish must stay cheaper to attach than to read): an mtime-only
  * touch costs at worst one spurious rebuild. The one regeneration it
  * can NOT see is a corpus rewritten in place with both sizes and
  * mtimes preserved (`rsync -t` of equal-length files, an archive
  * restore with timestamps) — a deployment that replaces corpora that
  * way must bump a byte somewhere or drop the markers; everything
  * cheaper than reading the data has this blind spot.
  *
  * Concurrent WRITERS are excluded by a lease ([[withLease]]): every
  * publish and every append to a published table first creates a
  * `<tbl>._GRAFT_LEASE` file next to the table directory with atomic
  * create-new semantics, so a second JVM (or thread) publishing the
  * same table fails loudly ([[LeaseHeld]]) instead of interleaving its
  * writes with the winner's. A publish builds in a private per-token
  * STAGING directory and swaps it into the serve location with a
  * single rename only after re-verifying lease ownership — so even a
  * writer that overran the stale threshold and lost its lease can
  * never land files in the serve location (its job wrote to its own
  * staging dir; its commit fails [[LeaseLost]] before the swap). The
  * marker rides inside the staged directory, so the swap rename IS the
  * commit: readers see either the old complete table or the new one,
  * never a torn mix. Appends re-stamp the marker's manifest hash after
  * their post-append ownership check ([[restampManifest]]) — an append
  * that overran its lease leaves a manifest mismatch that [[ensure]]
  * refuses to serve, degrading to a rebuild instead of serving
  * duplicated rows. A live holder HEARTBEATS its lease at
  * [[leaseStaleMs]]/4 (local: an mtime touch; any other store: a
  * content bump whose rewrite the store itself timestamps — no client
  * clock in the freshness judgment, and a content change aborts a
  * rival's break even on stores with no mtime semantics), so
  * arbitrarily long publishes keep their exclusivity; a lease left by
  * a CRASHED publisher stops refreshing and is taken over once older
  * than [[leaseStaleMs]] (default 30 min of crash-detection latency —
  * tunable via SPARK_GRAFT_LEASE_STALE_MS). */
object Published {

  /** A second concurrent publisher lost the create-new race — the
    * caller must NOT fall back to writing (that is the double-append /
    * torn-publish hazard the lease exists to close); retry after the
    * holder finishes or fail the job. */
  final class LeaseHeld(msg: String) extends IllegalStateException(msg)

  /** The lease file no longer carries THIS holder's token at a commit
    * point — a breaker decided this holder was dead (a publish ran past
    * `staleMs`) and someone else may be writing. The commit must not
    * happen. */
  final class LeaseLost(msg: String) extends IllegalStateException(msg)

  /** Count of "heartbeat degraded" warnings issued JVM-wide — the
    * observable face of the 3-consecutive-failed-beats loud-degrade
    * contract (r13 advice #2), so the fault specs can assert the
    * warning FIRED instead of scraping stderr. */
  private[graft] val heartbeatDegradedWarnings =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Crash-DETECTION latency, not a ceiling on publish duration: a
    * live holder's heartbeat ([[withLease]]) refreshes the lease
    * at a quarter of this period, so only a lease whose holder STOPPED
    * — crashed JVM, killed process — ages past the threshold and is
    * broken. The threshold therefore sizes how long a dead writer can
    * wedge a table, and how much clock skew the mtime comparison must
    * absorb; [[assertLeaseOwned]] still guards every commit point so
    * even a pathologically-broken live holder fails LOUDLY, with its
    * files still in its private staging dir, never in the serve
    * location. Env-overridable so crash probes don't wait 30 min. */
  private[graft] val leaseStaleMs: Long =
    sys.env.get("SPARK_GRAFT_LEASE_STALE_MS").flatMap { v =>
      val parsed = scala.util.Try(v.trim.toLong).toOption
      // tolerate-and-warn, never throw: this is object-init code, and a
      // malformed value ('30m') would otherwise surface as an opaque
      // ExceptionInInitializerError on the first touch of Published
      if (parsed.isEmpty) System.err.println(
        s"[graft] ignoring malformed SPARK_GRAFT_LEASE_STALE_MS='$v' (want millis)")
      parsed
    }.getOrElse(30L * 60 * 1000)

  // ---------------------------------------------------------------
  // Hadoop-FS plumbing. The Configuration is the session's LIVE
  // context configuration — the same object the engine's streaming
  // sinks resolve against — so fs.defaultFS, spark.hadoop.* settings,
  // and connector registrations (including ones made at RUNTIME via
  // hadoopConfiguration.set("fs.<scheme>.impl", …)) apply here too.
  // getActiveSession is thread-local, so fall back to the process-wide
  // default session — a helper thread that never called
  // setActiveSession must not silently resolve against bare Hadoop
  // defaults. Deliberately NOT sessionState.newHadoopConf(): that is a
  // per-call clone carrying per-session SQL-conf overlays — publish
  // artifacts are WAREHOUSE-scoped, shared by every session of the
  // context, so session-scoped fs settings should not fork their
  // semantics (and a clone per filesystem op is measurable on the
  // serve path). A fully session-less caller (the LeaseHold demo) gets
  // cached Hadoop defaults, which still resolve any EXPLICIT-scheme
  // path correctly — with one registration mirrored from
  // Session.builder: the opt-in hdfs-sim scheme override, so a
  // session-less probe JVM pointed at an `hdfs://graftsim` warehouse
  // resolves it like every session JVM instead of dialing a namenode.
  private lazy val defaultConf = {
    val c = new Configuration()
    if (sys.env.get("SPARK_GRAFT_HDFS_SIM").contains("true")) {
      c.set("fs.hdfs.impl", classOf[HdfsSimFileSystem].getName)
      c.set("fs.AbstractFileSystem.hdfs.impl",
        classOf[HdfsSimAbstractFileSystem].getName)
    }
    if (sys.env.get("SPARK_GRAFT_S3_SIM").contains("true")) {
      c.set("fs.s3a.impl", classOf[S3SimFileSystem].getName)
      c.set("fs.AbstractFileSystem.s3a.impl",
        classOf[S3SimAbstractFileSystem].getName)
    }
    c
  }
  private def hconf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(defaultConf)

  /** The FileSystem serving `p`, with the local checksummed wrapper
    * unwrapped: lease/marker files are control metadata, and RAW local
    * semantics (create/rename map directly to open(2)/rename(2), no
    * `.crc` sidecars) are what the atomicity argument is stated over. */
  private[graft] def fsOf(p: HPath): FileSystem =
    p.getFileSystem(hconf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  /** For the local scheme, the java.nio view of `p` (the atomic-
    * primitive override below); None on any other filesystem. */
  private def localOf(fs: FileSystem, p: HPath): Option[java.nio.file.Path] =
    if ("file" == fs.getUri.getScheme)
      Some(java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath))
    else None

  /** THE atomicity primitive the lease protocol stands on: create `p`
    * with `content` iff it does not exist, exactly one concurrent
    * caller succeeding. Per-scheme contract:
    *  - `file://` — java.nio CREATE_NEW, i.e. open(2) O_CREAT|O_EXCL:
    *    atomic on POSIX. (Hadoop's RawLocalFileSystem.create(p, false)
    *    is check-then-act and would reopen the race, hence the
    *    override.)
    *  - HDFS — FileSystem.create(p, overwrite=false): the existence
    *    check and creation are one namenode operation; atomic.
    *  - Object stores (S3A and kin) — create-no-overwrite is NOT
    *    atomic on connectors that check-then-put; a deployment whose
    *    warehouse lives there must point this at a connector with
    *    conditional-put create (S3A over S3 conditional writes
    *    supports it) or front the warehouse with HDFS semantics. The
    *    contract is create-new atomicity; this method is the single
    *    place a deployment plugs a different primitive into.
    * Failure-atomic: a create that wins but fails writing `content`
    * removes the file — never a token-less orphan lease. */
  private[graft] def createNewAtomic(fs: FileSystem, p: HPath,
                                     content: Array[Byte]): Boolean =
    localOf(fs, p) match {
      case Some(lp) =>
        try {
          java.nio.file.Files.createFile(lp)
          try { java.nio.file.Files.write(lp, content); true }
          catch { case e: java.io.IOException =>
            java.nio.file.Files.deleteIfExists(lp); throw e
          }
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case None =>
        try {
          val out = fs.create(p, false)
          try { out.write(content); out.close(); true }
          catch { case e: java.io.IOException =>
            try out.close() catch { case _: java.io.IOException => () }
            try fs.delete(p, false) catch { case _: java.io.IOException => () }
            throw e
          }
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
        }
    }

  private[sources] def exists(fs: FileSystem, p: HPath): Boolean = fs.exists(p)

  /** Best-effort delete with bounded retries on transient faults —
    * delete is idempotent, so re-issuing is always safe. The retries
    * matter most on the RELEASE path: a single swallowed DELETE blip
    * there leaked the lease until the stale break (caught by the r16
    * hdfs fault campaign's debris gate — the release holds the break
    * claim across these retries, so nothing races the re-issue).
    * Still swallows after the budget: callers treat deletion as
    * cleanup, and a leak that ages out beats failing a completed
    * publish. */
  private[sources] def deleteIfExists(fs: FileSystem, p: HPath): Unit = {
    var attempt = 0
    var done = false
    while (!done && attempt < storeOpAttempts) {
      try { fs.delete(p, false); done = true }
      catch { case _: java.io.IOException =>
        attempt += 1
        if (attempt < storeOpAttempts) {
          try Thread.sleep(25L * attempt)
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); attempt = storeOpAttempts }
        }
      }
    }
  }

  /** Re-run a read that swallows transient faults into null until it
    * yields something, bounded — a lone null is ambiguous (store blip
    * vs genuinely absent), the r15 campaign's recurring lesson, and
    * the retry shape kept getting hand-rolled per site with drifting
    * interrupt semantics (r16 review finding #4). An interrupt stops
    * the retries (flag restored) and returns null; every caller's
    * null-handling is the SAFE direction (abort / skip delete / throw
    * loud), so cutting the retries short can never commit anything. */
  private[sources] def retryNullable[T >: Null](read: => T, attempts: Int = 3,
                                       sleepMs: Long = 25): T = {
    var cur = read
    var n = 1
    while (cur == null && n < attempts) {
      try Thread.sleep(sleepMs)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); return null }
      cur = read
      n += 1
    }
    cur
  }

  private def retryRead(fs: FileSystem, p: HPath): String =
    retryNullable(readOrNull(fs, p))

  private[sources] def readOrNull(fs: FileSystem, p: HPath): String =
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      scala.util.Using.resource(fs.open(p))(_.readFully(0, buf))
      new String(buf, "UTF-8")
    } catch { case _: java.io.IOException => null }

  private[sources] def ageOf(fs: FileSystem, p: HPath): Long =
    try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.IOException => 0L } // just released

  private def writeFile(fs: FileSystem, p: HPath, content: Array[Byte]): Unit =
    scala.util.Using.resource(fs.create(p, true))(_.write(content))

  // ------------------------------------------- transient-fault policy
  // Bounded per-op retries on the publish chain's CONTROL-PLANE store
  // operations (r15 verdict ask #1). The serve path already absorbs
  // residual store faults (task retries + ensure's tolerant ops); the
  // publish path used to be one-blip-fatal — a single transient
  // IOException on a marker PUT, a lease create, or one object of the
  // swap's copy-rename killed a whole multi-table build AFTER the
  // expensive work was done. Policy: a handful of attempts with linear
  // backoff, and — the invariant that makes retrying safe — every
  // commit-path retry re-runs its OWNERSHIP gate first, so a retried
  // op can never commit over a lost lease (pinned by S3FaultSpec's
  // retried-commit-aborts test). Ops that are NOT idempotent under
  // ambiguity (the lease's conditional PUT) resolve the ambiguity by
  // re-reading before retrying instead of blindly re-issuing.
  private[graft] val storeOpAttempts: Int = 5

  /** Run `op`, retrying transient IOExceptions up to [[storeOpAttempts]]
    * times with linear backoff; `gate` runs before EVERY attempt
    * (ownership re-checks belong inside the retry). Only for ops that
    * are idempotent to re-issue (overwrite PUTs, LISTs, GETs, deletes —
    * not create-new, which has its own ambiguity-resolving loop). */
  private[sources] def retryIO[T](gate: () => Unit = () => ())(op: => T): T = {
    var attempt = 0
    while (true) {
      gate()
      try return op
      catch { case e: java.io.IOException =>
        attempt += 1
        if (attempt >= storeOpAttempts) throw e
        try Thread.sleep(50L * attempt)
        catch { case _: InterruptedException =>
          Thread.currentThread().interrupt(); throw e }
      }
    }
    sys.error("unreachable")
  }

  /** WHOLE-JOB retry for Spark write/read jobs whose driver-side commit
    * ops (committer listing, per-file rename, temp cleanup) sit outside
    * both task retries and [[retryIO]]'s per-op scope: re-run `job`
    * from scratch on a transient ([[hasIOCause]]) failure, `gate`
    * (ownership check) before every attempt. Callers must make the job
    * idempotent to re-run (Overwrite mode into a private staging
    * location). ONE copy of the policy — Published's staged build and
    * Snap's staging share it (r17 review finding #5). */
  private[sources] def retryJobIO[T](what: String, gate: () => Unit)
                                    (job: => T): T = {
    var attempt = 0
    while (true) {
      gate()
      try return job
      catch { case e: Throwable if hasIOCause(e) =>
        attempt += 1
        if (attempt >= storeOpAttempts) throw e
        System.err.println(s"[graft] $what failed on a transient store " +
          s"fault (attempt $attempt/$storeOpAttempts, retrying): " +
          s"${e.getMessage}")
      }
    }
    sys.error("unreachable")
  }

  /** Stamp-or-verify a durable store's stream lineage (`_GRAFT_CKPT`
    * inside `loc`): batch ids are meaningful only under the checkpoint
    * that assigned them, so a foreign lineage must refuse loudly before
    * any batch applies. The identity stamped is the checkpoint's QUERY
    * ID (the uuid Spark writes into `<ckpt>/metadata` when the query
    * first starts) — NOT the path: a wiped-and-recreated checkpoint at
    * the same path restarts batch ids at 0, which would alias
    * already-applied ids and silently no-op real new data (r17 review
    * finding); recreation regenerates the query id, so the id catches
    * it. Because the metadata file exists only once the query is
    * RUNNING, callers must invoke this from inside the stream (first
    * micro-batch), not at sink construction. An EMPTY stamp is the
    * crashed-create artifact (file landed, bytes did not — the r16
    * KllPublish lesson): re-stamp instead of wedging the table forever.
    * (KllPublish's own construction-time twin predates this helper and
    * keeps path identity — a query id does not exist yet at its call
    * point.) */
  private[graft] def assertStreamLineage(loc: HPath, checkpointDir: String,
                                         what: String): Unit = {
    val fs = fsOf(loc)
    val idFile = new HPath(loc, "_GRAFT_CKPT")
    val metaP = new HPath(checkpointDir, "metadata")
    val meta = retryNullable(readOrNull(fsOf(metaP), metaP))
    require(meta != null,
      s"$what: checkpoint $checkpointDir has no readable metadata yet — " +
        "the lineage check must run INSIDE the started query")
    val ckptId = "\"id\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(meta).map(_.group(1)).getOrElse(
        sys.error(s"$what: checkpoint metadata carries no query id: $meta"))
    stampOrVerifyLineage(loc, ckptId, what)
  }

  /** The stamp-or-verify core behind [[assertStreamLineage]] (and the
    * snap follower's source binding): bind `loc` to `identity`, or
    * verify it is already bound to exactly that identity.
    *
    * Stamping runs UNDER the table lease (r17 advice): with a plain
    * unlocked overwrite PUT, two foreign writers started concurrently
    * could both read an absent stamp and both pass — conflicting
    * batch-id spaces then sharing one applied high-water. The lease
    * serializes them; re-entrant under a caller's hold. A LANDED stamp
    * is immutable, so the verify-only fast path needs no lease. */
  private[graft] def stampOrVerifyLineage(loc: HPath, identity: String,
                                          what: String): Unit = {
    val fs = fsOf(loc)
    val idFile = new HPath(loc, "_GRAFT_CKPT")
    def readStamp(): String = {
      val existing =
        if (retryIO()(fs.exists(idFile))) retryNullable(readOrNull(fs, idFile))
        else ""
      require(existing != null,
        s"$what: lineage stamp $idFile unreadable after retries — refusing " +
          "to guess (a wrong lineage silently drops or doubles batches)")
      existing
    }
    // The stamp carries a terminator so a TORN write (crash mid-PUT:
    // some bytes landed, not all) is distinguishable from a landed
    // one. A footer-less stamp — empty OR partial — is the crashed-
    // create artifact: the writer only applies batches AFTER a
    // successful stamp call, so no batch can have applied under it;
    // re-stamp instead of wedging the table forever (r17 advice
    // extended the r16 empty-stamp heal to partial bytes).
    def landedAndVerified(existing: String): Boolean =
      if (!existing.endsWith(StampFooter)) false
      else {
        require(existing.stripSuffix(StampFooter) == identity,
          s"$what: table was written under stream lineage " +
            s"'${existing.stripSuffix(StampFooter)}'; applying lineage " +
            s"'$identity' would remap batch ids and break the " +
            "applied-high-water dedup — reuse the original checkpoint " +
            "or drop the table")
        true
      }
    if (landedAndVerified(readStamp())) return
    withLeaseAwaiting(loc, s"lineage:${loc.getName}") {
      val existing = readStamp() // re-read under the lease
      if (!landedAndVerified(existing)) {
        retryIO()(fs.mkdirs(loc))
        retryIO() { deleteIfExists(fs, idFile) }
        retryIO()(writeFile(fs, idFile,
          (identity + StampFooter).getBytes("UTF-8")))
        // read-back verify: the write above is a plain PUT (safe under
        // the lease — no rival stamper); a blip that tore it must
        // surface NOW, not as a silent future re-stamp window
        val back = retryNullable(readOrNull(fs, idFile))
        require(back == identity + StampFooter,
          s"$what: lineage stamp read-back mismatch after write — store " +
            "faulting hard; refusing to start the stream")
      }
    }
  }

  /** Terminator for [[assertStreamLineage]]'s stamp: present == the
    * stamp landed whole; absent == a crashed create's partial bytes. */
  private[graft] val StampFooter = "\n#ok"

  /** True iff a job failure's cause chain bottoms out in an IOException
    * — the transient-store-fault class whole-job retries are for. An
    * analysis error or OOM has no business being re-run. */
  private[sources] def hasIOCause(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 20) {
      if (cur.isInstanceOf[java.io.IOException]) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  private def copyFileBytes(fs: FileSystem, src: HPath, dst: HPath): Unit =
    scala.util.Using.resource(fs.open(src)) { in =>
      scala.util.Using.resource(fs.create(dst, true)) { out =>
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      }
    }

  /** Move `src` to `dst` (file or directory), SURVIVING transient store
    * faults mid-move — the swap-rename hardening. On a copy-rename
    * store a faulted `fs.rename` leaves a partial destination, and a
    * blind re-issue would nest src INTO the half-made dst directory
    * (the FileSystem rename contract's move-into-dir rule). Each
    * attempt therefore dispatches on observed state:
    *   - src gone, dst present — a prior attempt completed; done.
    *   - dst absent — a clean `fs.rename` (atomic on local/HDFS; the
    *     copy+delete emulation on object stores).
    *   - BOTH present — a prior attempt died mid-copy or mid-source-
    *     delete: FINISH FORWARD. Every dst-side file was copied from
    *     src by that attempt and nothing else can write here (the
    *     caller holds the table lease; the names are per-token
    *     private), so copying src's remainder over dst and dropping
    *     src reproduces the completed rename. Deleting dst and
    *     re-renaming instead would LOSE data when the fault hit the
    *     DELETE phase (dst complete, src already partial).
    * `gate` runs before every attempt — the commit-path callers pass
    * their lease-ownership check so a retried swap can never land over
    * a broken lease. */
  private[graft] def moveResumable(fs: FileSystem, src: HPath, dst: HPath,
                                   gate: () => Unit = () => ()): Unit = {
    var attempt = 0
    while (true) {
      gate()
      try {
        if (!exists(fs, src)) {
          if (exists(fs, dst)) return
          throw new java.io.IOException(
            s"move $src -> $dst: source vanished with no destination")
        } else if (!exists(fs, dst)) {
          if (fs.rename(src, dst)) return
          throw new java.io.IOException(s"rename $src -> $dst returned false")
        } else {
          if (fs.getFileStatus(src).isDirectory) {
            val qsrc = fs.makeQualified(src).toString
            walkFiles(fs, src) { st =>
              val rel = st.getPath.toString.stripPrefix(qsrc).stripPrefix("/")
              copyFileBytes(fs, st.getPath, new HPath(dst, rel))
            }
          } else copyFileBytes(fs, src, dst)
          if (!fs.delete(src, true) && exists(fs, src))
            throw new java.io.IOException(
              s"move $src -> $dst: source delete failed")
          return
        }
      } catch { case e: java.io.IOException =>
        attempt += 1
        if (attempt >= storeOpAttempts) throw e
        try Thread.sleep(50L * attempt)
        catch { case _: InterruptedException =>
          Thread.currentThread().interrupt(); throw e }
      }
    }
  }

  /** Replace `dst` with `tmp`. Local: one atomic rename(2). Other
    * schemes (where the FileSystem rename contract never clobbers):
    * rename `dst` ASIDE, rename `tmp` in, drop the aside — the
    * dst-less window is two metadata renames, not a delete + rename,
    * and a crash between them leaves the old content recoverable in
    * the aside instead of destroyed. The aside name starts with `_`
    * so [[manifestHash]] ignores it, and a stale aside (crash debris)
    * is dropped before the swap, not clobbered by it. Either way a
    * concurrent ensure() in the window degrades to "not served" (the
    * caller waits out our lease), never to a torn read. Both rename
    * legs are [[moveResumable]] — a transient fault mid-leg resumes
    * instead of killing the commit — and `gate` (the caller's lease
    * check) runs before every attempt. */
  private def replace(fs: FileSystem, tmp: HPath, dst: HPath,
                      gate: () => Unit = () => ()): Unit =
    localOf(fs, tmp) match {
      case Some(ltmp) =>
        java.nio.file.Files.move(ltmp,
          java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case None =>
        val aside = new HPath(dst.getParent, dst.getName + ".old")
        deleteIfExists(fs, aside)
        if (exists(fs, dst)) moveResumable(fs, dst, aside, gate)
        moveResumable(fs, tmp, dst, gate)
        deleteIfExists(fs, aside)
    }

  // ---------------------------------------------------------------

  /** Per-thread re-entrancy + ownership token: `write` inside a caller
    * that already holds the table lease (q124's bootstrap path) must
    * not self-deadlock, and commit points verify the on-disk lease
    * still carries this holder's token. Keyed by the fs-qualified
    * location URI so `/w/t` and `file:///w/t` are one lease. */
  private final case class Held(thread: Thread, token: String)
  private val leaseHolders =
    new java.util.concurrent.ConcurrentHashMap[String, Held]()
  private val tokenSeq = new java.util.concurrent.atomic.AtomicLong()

  private def leasePath(loc: HPath): HPath =
    new HPath(loc.getParent, loc.getName + "._GRAFT_LEASE")
  private def breakPath(lp: HPath): HPath =
    new HPath(lp.getParent, lp.getName + ".break")

  /** Run `body` holding the single-writer lease for the table at `loc`.
    *
    * [[createNewAtomic]] on the lease file is the exclusion primitive:
    * exactly one creator wins; losers get [[LeaseHeld]] carrying the
    * holder's id and the lease path. Re-entrant per thread.
    *
    * STALE-BREAK PROTOCOL (a crashed holder must not wedge the table
    * forever, but breaking must never delete a LIVE rival's lease —
    * the naive check-age-then-delete lets breaker A delete the fresh
    * lease breaker B just created in the window after A's age check):
    * a breaker first claims the exclusive right to break via create-new
    * on a sibling `.break` file — only one breaker proceeds; the rest
    * throw [[LeaseHeld]]. Acquirers treat an existing `.break` file as
    * lease-held, so while the break claim stands nobody can create a
    * fresh lease for the breaker to destroy. The break winner then
    * RE-READS the lease: only if it is still the same stale one does it
    * delete it; a lease that meanwhile vanished or changed aborts the
    * break. Finally the breaker releases its claim and races create-new
    * like everyone else. A `.break` file orphaned by a crashed breaker
    * is itself aged out the same way; deleting a break file never
    * deletes anyone's lease, so that recursion is safe — the residual
    * hole needs a fresh file to READ as older than `staleMs`, i.e.
    * half-hour clock skew between writers of one shared filesystem
    * (HDFS stamps mtimes namenode-side, collapsing that skew to one
    * clock; local POSIX is one host by construction).
    *
    * The lease content carries a per-acquisition TOKEN; commit points
    * call [[assertLeaseOwned]] so a holder whose lease WAS legitimately
    * broken (it overran `staleMs`) fails loudly before committing
    * instead of interleaving with the breaker's writes. */
  def withLease[T](loc: HPath, holder: String,
                   staleMs: Long = leaseStaleMs)(body: => T): T = {
    val fs = fsOf(loc)
    val norm = fs.makeQualified(loc)
    val key = norm.toString
    val reentrant = leaseHolders.get(key)
    if (reentrant != null && (reentrant.thread eq Thread.currentThread())) return body
    val lp = leasePath(norm)
    val bp = breakPath(lp)
    fs.mkdirs(norm.getParent)
    val token = s"$holder#${java.lang.ProcessHandle.current().pid()}" +
      s"#${System.nanoTime()}#${tokenSeq.incrementAndGet()}"
    def tryAcquire(): Boolean = {
      if (exists(fs, bp)) {
        // a break is in progress — count as held; an ORPHANED break
        // claim (crashed breaker) ages out harmlessly: removing it
        // deletes no one's lease
        if (ageOf(fs, bp) > staleMs) deleteIfExists(fs, bp)
        if (exists(fs, bp)) return false
      }
      // the conditional PUT is AMBIGUOUS under a transient fault (the
      // PUT may have landed before the error surfaced) — never blindly
      // re-issue: resolve by re-reading. Our token = we won after all;
      // a foreign token = held; unreadable + file absent = retry the
      // create. The one corner that must NOT silently resolve (r16
      // review finding #1): after an ambiguous fault, a create-false
      // (file exists) whose re-reads all blip could be OUR OWN landed
      // lease — concluding LeaseHeld there has the caller waiting out
      // its own orphan for the full stale threshold. A re-read that
      // stays null after an ambiguous fault therefore throws the
      // fault LOUDLY (infrastructure is down; fail the call, never
      // stall on a maybe-own lease).
      var attempt = 0
      var ambiguous: java.io.IOException = null
      while (true) {
        val won =
          try Some(createNewAtomic(fs, lp, s"$token\n$holder".getBytes("UTF-8")))
          catch { case e: java.io.IOException => ambiguous = e; None }
        won match {
          case Some(true) => return true
          case Some(false) if ambiguous == null => return false // clean loss
          case _ =>
            // faulted now, or create-false after an earlier fault:
            // ownership is unknown until a read lands
            val cur = retryRead(fs, lp)
            if (cur != null) return cur.startsWith(token + "\n")
            attempt += 1
            // file-exists-but-unreadable, or read+create both blipping
            // past the budget: loud, never a guessed verdict
            if (won.contains(false) || attempt >= storeOpAttempts)
              throw ambiguous
            try Thread.sleep(50L * attempt)
            catch { case _: InterruptedException =>
              Thread.currentThread().interrupt(); throw ambiguous }
        }
      }
      sys.error("unreachable")
    }
    def tryBreakStale(): Unit = {
      val staleContent = readOrNull(fs, lp)
      if (staleContent == null || ageOf(fs, lp) <= staleMs) return
      // a faulted break-claim PUT just loses the break this round —
      // the stale lease stays for the NEXT acquire attempt to break;
      // never let a store blip abort the whole acquire
      val claimed =
        try createNewAtomic(fs, bp, token.getBytes("UTF-8"))
        catch { case _: java.io.IOException => false }
      if (!claimed)
        return // another breaker owns the break (or the claim blipped)
      try {
        // re-read under the break claim: only the SAME stale lease dies
        val now = readOrNull(fs, lp)
        if (now != null && now == staleContent && ageOf(fs, lp) > staleMs)
          deleteIfExists(fs, lp)
      } finally deleteIfExists(fs, bp)
    }
    val acquired = tryAcquire() || { tryBreakStale(); tryAcquire() }
    if (!acquired) {
      val who = Option(readOrNull(fs, lp))
        .flatMap(_.linesIterator.toSeq.lift(1)).getOrElse("<gone>")
      throw new LeaseHeld(
        s"publish lease for ${norm.getName} held by '$who' ($lp); " +
          "one writer per published table — retry after it completes")
    }
    val held = Held(Thread.currentThread(), token)
    leaseHolders.put(key, held)
    // HEARTBEAT: refresh the lease at staleMs/4 while the body runs, so
    // a LIVE holder never reads as stale no matter how long its publish
    // takes — `staleMs` is thereby crash-DETECTION latency, not a
    // ceiling on legitimate publish duration (moving training under the
    // lease made long holds routine; without the heartbeat a train+write
    // longer than the threshold would be broken mid-run and die
    // LeaseLost at its commit gate after paying the full build).
    //
    // The refresh MECHANISM is per-scheme (r13 verdict ask #2 —
    // `setTimes` with a client-supplied timestamp re-imported
    // holder-vs-breaker clock skew on HDFS and silently no-ops on
    // object stores):
    //  - local — an mtime touch: one host, one clock, and a content
    //    rewrite would only make the holder race its OWN same-JVM
    //    readers for nothing.
    //  - everything else — a CONTENT BUMP: rewrite the lease as
    //    `token\nholder\nhb:<n>`. The store stamps the new mtime
    //    SERVER-side (an HDFS create is a namenode op; an object-store
    //    rewrite is a new PUT with the service's own Last-Modified), so
    //    no client clock enters the freshness judgment — and because
    //    the break protocol re-reads CONTENT under its claim, a bumped
    //    counter aborts a rival's break even on a store with no mtime
    //    semantics at all. Torn reads of an in-flight rewrite are
    //    break-safe by construction: a breaker whose claim-protected
    //    re-read sees partial content mismatches its first read and
    //    aborts, and the rewrite itself refreshed the mtime, failing
    //    the re-read's age gate too. The token stays on line 1, so
    //    assertLeaseOwned's startsWith contract is unchanged; same-JVM
    //    readers (the commit gates, the release) serialize with the
    //    bump on the Held monitor, so the holder never tears its own
    //    read.
    // Either mechanism can never keep a DEAD lease alive: ownership is
    // re-read before every bump, so once a breaker has legitimately
    // replaced this lease the heartbeat stops rather than refresh a
    // rival's file, and a crashed JVM stops heartbeating and ages out
    // as before. Two hazards close the remaining gaps:
    //  - a touch must be VERIFIED (mtime re-read, before vs after):
    //    FileSystem.setTimes is a documented NO-OP on the base class
    //    and on most object-store connectors — an unverified touch
    //    would count a no-op as a successful beat, silently masking
    //    total refresh failure behind the fallback path.
    //  - a beat NEVER writes to a lease older than staleMs/2: a lease
    //    that old means our refreshes have been failing and a rival's
    //    stale-break may be in flight — a rewrite landing just after
    //    the breaker's delete would resurrect this holder's ownership
    //    over the rival's fresh lease (cross-JVM check-then-write).
    //    Half the threshold (not a period-derived offset) keeps the
    //    guard margin at staleMs/2 regardless of beat frequency.
    //    Healthy beats keep age ≈ one period, so the guard never fires
    //    in normal operation; a holder stalled long enough to trip it
    //    stops refreshing for good and dies LeaseLost at its commit
    //    gate — availability, never two writers.
    // A heartbeat that CANNOT refresh (both mechanisms failing) must
    // be LOUD, not a silent downgrade (r13 advice #2): after 3
    // consecutive failed beats it warns once that `staleMs` has
    // degraded back to a ceiling on publish duration — an overrunning
    // publish may be broken and die LeaseLost at its commit gate
    // (availability, never corruption: the commit gates still hold).
    val isLocal = "file" == fs.getUri.getScheme
    val heartbeat = new Thread(() => {
      // staleMs/8, not /4: the holder survives any stall shorter than
      // staleMs/2 - period (last healthy beat at age ≈ period, the
      // break-window guard below refuses from staleMs/2), so halving
      // the period raises the tolerated GC/scheduler stall from
      // staleMs/4 to 3/8·staleMs — at the 30-minute default the cost
      // is one tiny lease rewrite per 225 s, and under shrunken probe
      // thresholds (2 s) it is what keeps a loaded test box from
      // breaking live holders.
      val period = math.max(250L, staleMs / 8)
      var beat = 0L
      var failedBeats = 0
      var warned = false
      def mtime(): Long =
        try fs.getFileStatus(lp).getModificationTime
        catch { case _: java.io.IOException => -1L }
      def touchVerified(): Unit = {
        val before = mtime()
        fs.setTimes(lp, System.currentTimeMillis(), -1)
        if (mtime() <= before)
          throw new java.io.IOException(s"setTimes on $lp is a no-op")
      }
      def bumpContent(): Unit =
        writeFile(fs, lp, s"$token\n$holder\nhb:$beat".getBytes("UTF-8"))
      try {
        var live = true
        while (live) {
          Thread.sleep(period)
          held.synchronized {
            val cur = readOrNull(fs, lp)
            // ONLY a readable lease carrying a FOREIGN token stops the
            // thread (a breaker+rival legitimately replaced us). A null
            // read is ambiguous — transient store fault OR deleted
            // lease — and must count as a FAILED BEAT, not lease loss:
            // one GET blip on a long hold would otherwise kill refresh
            // permanently (found designing the r15 fault campaign).
            // Beating on is safe because a beat only ever WRITES when
            // the re-read matches our own token — a deleted lease reads
            // null forever and is never resurrected by this loop.
            if (cur != null && !cur.startsWith(token + "\n")) live = false
            else {
              beat += 1
              val ok =
                if (cur == null) false // unreadable — never write blind
                else
                // break window at HALF the stale threshold, not a
                // period-derived offset: with period=staleMs/8 a
                // "staleMs - 2*period" guard would leave only 2 periods
                // between the last allowed write and a breaker's
                // earliest delete — a stall landing in that gap
                // overwrites a rival's fresh lease (the check-then-write
                // race this guard exists for). staleMs/2 keeps the old
                // guard margin (staleMs/2) while the shorter period
                // still lifts the survivable stall from staleMs/4 to
                // 3/8·staleMs (healthy beat at age ≈ period).
                if (System.currentTimeMillis() - mtime() >=
                    staleMs / 2) false // break window — no write
                else
                  try { if (isLocal) touchVerified() else bumpContent(); true }
                  catch {
                    case _: java.io.IOException | _: UnsupportedOperationException =>
                      // scheme-preferred refresh refused — try the other
                      // mechanism before calling the beat failed
                      try { if (isLocal) bumpContent() else touchVerified(); true }
                      catch {
                        case _: java.io.IOException |
                             _: UnsupportedOperationException => false
                      }
                  }
              failedBeats = if (ok) 0 else failedBeats + 1
              if (failedBeats >= 3 && !warned) {
                warned = true
                heartbeatDegradedWarnings.incrementAndGet()
                System.err.println("[graft] WARNING: lease heartbeat for " +
                  s"${norm.getName} cannot refresh ($failedBeats consecutive " +
                  "failures: the store rejects both setTimes and lease " +
                  s"rewrites) — the ${staleMs / 1000}s stale threshold is " +
                  "now a CEILING on this publish's duration; if it " +
                  "overruns, a rival may break the lease and this publish " +
                  "will die LeaseLost at its commit gate (never corrupting " +
                  "the table)")
              }
            }
          }
        }
      } catch { case _: InterruptedException => () }
    })
    heartbeat.setDaemon(true)
    heartbeat.setName(s"graft-lease-heartbeat-${norm.getName}")
    heartbeat.start()
    try body
    finally {
      heartbeat.interrupt()
      leaseHolders.remove(key)
      // release under the SAME .break claim the stale-break path uses:
      // lease deletion anywhere outside a claim reopens the
      // check-then-delete race (an overrun release could otherwise read
      // its own token, lose the CPU, and then delete the lease a
      // breaker+new-holder cycle just created). A LOST claim is retried
      // briefly — a breaker holds the claim only for a re-read + delete
      // (milliseconds), and a breaker that ABORTED (content changed
      // under it) leaves our live lease standing, which without the
      // retry would wedge the table for staleMs and starve waiting
      // attachers. If the claim stays contended past the retry budget,
      // fall back to leaving the lease to whoever owns the claim.
      var claimed = false
      var tries = 0
      var interrupted = false
      while (!claimed && !interrupted && tries < 20) {
        // a TRANSIENT store fault on the claim PUT must not abort the
        // release from inside this finally (it would mask a completed
        // body's result with an infrastructure blip); count it as a
        // failed attempt and retry — if the store stays down, the
        // un-released lease ages out via the stale break, an
        // availability cost, never a masked publish
        claimed =
          try createNewAtomic(fs, bp, ("release:" + token).getBytes("UTF-8"))
          catch { case _: java.io.IOException => false }
        if (!claimed) {
          tries += 1
          // an interrupt must not abort the release from inside this
          // finally (it would mask the body's result and skip cleanup);
          // stop retrying, leave the lease to the claim owner, re-flag
          try Thread.sleep(50)
          catch { case _: InterruptedException => interrupted = true }
        }
      }
      if (claimed) try held.synchronized {
        // on the Held monitor: an interrupted heartbeat can be mid-bump
        // (interrupt only breaks its sleep) and a torn self-read here
        // would skip the delete, leaking the lease until it ages out.
        // The verify-read RETRIES a couple of transient nulls (r15
        // fault campaign: one GET blip here leaked the lease and cost
        // a rival its whole wait budget); a read that stays null after
        // the retries still skips the delete — unreadable might mean
        // foreign, and a leak that ages out beats deleting blind. An
        // interrupt mid-retry must not abort the release from inside
        // this finally (it would mask the body's result AND leak the
        // lease): retryNullable converts it to the restored flag and
        // returns null, which lands on the skip-the-delete branch —
        // and the restored FLAG is then captured and CLEARED before
        // the deletes below run (r16 review finding #2: an RPC issued
        // with interrupt status pending throws InterruptedIOException
        // and deleteIfExists' retry sleeps abort instantly, so the
        // break-claim file would leak and wedge rivals for staleMs);
        // the trailing re-interrupt hands the flag back to the caller.
        val cur = retryNullable(readOrNull(fs, lp))
        if (Thread.interrupted()) interrupted = true
        if (cur != null && cur.startsWith(token + "\n")) deleteIfExists(fs, lp)
      } finally deleteIfExists(fs, bp)
      if (interrupted) Thread.currentThread().interrupt()
    }
  }

  /** Verify the on-disk lease still carries the CURRENT thread's token
    * for `loc` — called at commit points (the pre-swap gate, q124's
    * append) so a holder whose lease was broken mid-publish (it overran
    * `staleMs`) throws [[LeaseLost]] instead of committing over a
    * rival's writes. No-op when the thread holds no tracked lease (the
    * caller ran without withLease — nothing to verify against). */
  def assertLeaseOwned(loc: HPath): Unit = {
    val fs = fsOf(loc)
    val norm = fs.makeQualified(loc)
    val held = leaseHolders.get(norm.toString)
    if (held == null || (held.thread ne Thread.currentThread())) return
    // on the Held monitor: never interleave with the holder's own
    // heartbeat mid-content-bump — a torn self-read would be a
    // spurious LeaseLost at a commit gate.
    // A NULL read is ambiguous — transient store fault vs deleted
    // lease (the same lesson the heartbeat and release paths learned
    // in the r15 campaign; r15 advice #1): retryNullable re-reads a
    // couple of times before concluding LeaseLost, so a lone GET blip
    // landing exactly at a commit gate doesn't abort an otherwise-
    // healthy publish. A read that STAYS null still throws — abort,
    // never commit blind.
    val cur = retryNullable(
      held.synchronized { readOrNull(fs, leasePath(norm)) })
    if (cur == null || !cur.startsWith(held.token + "\n"))
      throw new LeaseLost(
        s"lease for ${norm.getName} no longer carries this holder's " +
          s"token — the publish overran the ${leaseStaleMs / 60000} min stale " +
          "threshold and was broken; aborting before the commit")
  }

  def tableLoc(spark: SparkSession, tbl: String): HPath =
    new HPath(spark.conf.get("spark.sql.warehouse.dir"), tbl)

  private val Marker = "_GRAFT_PUBLISHED"
  private def markerPath(loc: HPath): HPath = new HPath(loc, Marker)

  /** Recursive file walk via listStatus, NOT FileSystem.listFiles: the
    * latter wraps every entry in a LocatedFileStatus, whose
    * construction eagerly resolves per-file permissions — on the raw
    * local filesystem (no native hadoop lib) that is a per-file
    * attribute syscall or exec, turning a 200-file table listing into
    * seconds on the serve hot path (measured this round: q124 at 20×
    * 0.8 s → 3.2 s from exactly this). listStatus defers permission
    * loading, and the fingerprint/manifest only read name+size+mtime.
    * `descend` prunes subtrees (the manifest skips hidden dirs — an
    * in-flight append's `_temporary` tree can be large and every file
    * in it would be filtered anyway). */
  private def walkFiles(fs: FileSystem, root: HPath,
                        descend: String => Boolean = _ => true)
                       (f: org.apache.hadoop.fs.FileStatus => Unit): Unit =
    fs.listStatus(root).foreach { st =>
      if (st.isDirectory) {
        if (descend(st.getPath.getName)) walkFiles(fs, st.getPath, descend)(f)
      } else f(st)
    }

  /** Metadata-only snapshot fingerprint of a set of source paths (files
    * or directories of part files); `tag` folds in whatever else the
    * publish depends on (corpus dir, bucket count). */
  def fingerprint(tag: String, roots: Seq[HPath]): String = {
    val desc = roots.map { root =>
      val fs = fsOf(root)
      val qr = fs.makeQualified(root).toString
      val entries =
        if (fs.getFileStatus(root).isDirectory) {
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          walkFiles(fs, root) { st =>
            val rel = st.getPath.toString.stripPrefix(qr).stripPrefix("/")
            buf += s"$rel:${st.getLen}:${st.getModificationTime}"
          }
          buf.sorted.toSeq
        } else {
          val st = fs.getFileStatus(root)
          Seq(s":${st.getLen}:${st.getModificationTime}")
        }
      entries.mkString("|")
    }.mkString(s"$tag||", "||", "")
    java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(desc.getBytes("UTF-8")))
  }

  /** Hash of the DATA files currently at `loc` — the files a Spark scan
    * of the location would read (every file whose path has no `_`/`.`
    * hidden segment), as (relative name, size). Stamped into the marker
    * at publish/append commit, re-checked by [[ensure]] on every serve:
    * a location holding files the manifest does not account for — an
    * overrun appender's late job commit, a rival's stray part files —
    * is refused and rebuilt, never served. Size+name suffices: part
    * file names embed the writing job's UUID, so a foreign job's files
    * can't alias a manifest entry. */
  private[graft] def manifestHash(fs: FileSystem, loc: HPath): String = {
    val qr = fs.makeQualified(loc).toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(loc)) walkFiles(fs, loc,
      descend = d => !d.startsWith("_") && !d.startsWith(".")) { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        buf += s"${st.getPath.toString.stripPrefix(qr).stripPrefix("/")}:${st.getLen}"
    }
    java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(buf.sorted.mkString("|").getBytes("UTF-8")))
  }

  /** The manifest hash each session last SERVED a table at — the
    * staleness edge Spark's relation cache cannot see. A catalog table
    * resolves through SessionCatalog's tableRelationCache, whose file
    * index was listed when the table was last (re)planned; a FOREIGN
    * JVM's republish swaps the files underneath without touching this
    * session's catalog, so the next scan would read a deleted
    * generation's paths (FileNotFoundException at best). [[ensure]]
    * already re-reads the marker manifest on every serve — remembering
    * what it served last makes the swap detectable: manifest changed ⇒
    * `refreshTable` (drop the cached relation; next plan re-lists).
    * Keyed weakly per session: the relation cache being invalidated is
    * itself per-session state. */
  private val servedManifests =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]()

  private def manifestsOf(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, String] =
    servedManifests.synchronized {
      var mm = servedManifests.get(spark)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, String]()
        servedManifests.put(spark, mm)
      }
      mm
    }

  /** Record the manifest a fresh declare/publish just served — the
    * relation cache is fresh at this instant, no refresh needed. */
  private def recordServed(spark: SparkSession, tbl: String,
                           manifest: String): Unit =
    manifestsOf(spark).put(tbl, manifest)

  /** Catalog-hit path: the table was planned some time ago — if the
    * manifest moved since (or this session has no record of what it
    * planned), drop the cached relation so the next plan re-lists. One
    * extra LIST beats scanning a retired generation's deleted paths. */
  private def noteServed(spark: SparkSession, tbl: String,
                         manifest: String): Unit = {
    val prev = manifestsOf(spark).put(tbl, manifest)
    if (prev != manifest && spark.catalog.tableExists(tbl))
      spark.catalog.refreshTable(tbl)
  }

  /** Marker header (buckets, bucketCol, fp, manifest, schemaDdl) if
    * present and well-formed. */
  private def readMarker(fs: FileSystem, loc: HPath): Option[Array[String]] = {
    val mk = markerPath(loc)
    val content = readOrNull(fs, mk)
    if (content == null) None
    else content.split("\n", 5) match {
      case a @ Array(_, _, _, _, _) => Some(a)
      case _ => None
    }
  }

  private def markerBytes(buckets: Int, bucketCol: String, fp: String,
                          manifest: String, ddl: String): Array[Byte] =
    s"$buckets\n$bucketCol\n$fp\n$manifest\n$ddl".getBytes("UTF-8")

  /** The attach DDL — shared by the marker attach ([[ensure]]) and the
    * post-swap declaration ([[write]]): external parquet table over the
    * published location, re-stating the bucket spec the file names
    * already carry. */
  private def declare(spark: SparkSession, tbl: String, bucketCol: String,
                      buckets: Int, ddl: String, loc: HPath): Unit =
    spark.sql(
      s"""CREATE TABLE `$tbl` ($ddl)
         |USING parquet
         |CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`) INTO $buckets BUCKETS
         |LOCATION '${fsOf(loc).makeQualified(loc).toUri}'""".stripMargin)

  /** True iff `tbl` is, after this call, a catalog table serving THIS
    * request (bucket layout + source snapshot + a location whose data
    * files are exactly the marker's manifest). A catalog hit whose
    * marker does not match the request — a different corpus published
    * under the same fixed name, a corpus regenerated in place since the
    * publish, a location contaminated by a foreign writer's files — is
    * DROPPED (external table: files untouched) and the call returns
    * false. A marker match with no catalog entry attaches (new JVM).
    * No building happens here. */
  def ensure(spark: SparkSession, tbl: String, bucketCol: String,
             buckets: Int, fp: String): Boolean = {
    val loc = tableLoc(spark, tbl)
    val fs = fsOf(loc)
    // the manifest re-check lists the location on EVERY serve call —
    // deliberately uncached: a cache keyed on marker content would mask
    // exactly the contamination the manifest exists to catch (files
    // landing WITHOUT a marker change — the overrun appender). The cost
    // is one LIST of O(table files) per serve, the same metadata-RPC
    // class as Spark's own file-index refresh, and the file count is
    // bounded by the bucket layout plus q124's compaction — hundreds,
    // not parquet-lake millions.
    def tryMatch(): Option[Array[String]] =
      readMarker(fs, loc).filter(m =>
        m(0) == buckets.toString && m(1) == bucketCol && m(2) == fp &&
          m(3) == manifestHash(fs, loc))
    // IOException triage: with a WRITER ARTIFACT visible (lease/break
    // file), the failure is a rival mid-commit (its swap deleting the
    // location under our listing, its append renaming files out of
    // _temporary) — degrade to "not served now"; the caller waits out
    // the lease and retries. With NO writer visible, it is either the
    // tiny window after a writer's release or a transient store blip
    // (a bounded re-try settles both) or genuine infrastructure
    // failure (throttled LIST, expired credentials) — which must stay
    // LOUD: swallowing it would drop a healthy catalog table and loop
    // into a full rebuild on every transient blip.
    val matched =
      try tryMatch()
      catch { case e: java.io.IOException =>
        val lp = leasePath(fs.makeQualified(loc))
        val writerVisible =
          try exists(fs, lp) || exists(fs, breakPath(lp))
          catch { case _: java.io.IOException => false }
        if (writerVisible) None
        else {
          var res: Option[Option[Array[String]]] = None
          var tries = 0
          while (res.isEmpty && tries < 3) {
            tries += 1
            try res = Some(tryMatch())
            catch { case _: java.io.IOException =>
              if (tries >= 3) throw e
              try Thread.sleep(50L * tries)
              catch { case _: InterruptedException =>
                Thread.currentThread().interrupt(); throw e }
            }
          }
          res.getOrElse(throw e)
        }
      }
    if (spark.catalog.tableExists(tbl)) {
      if (matched.isDefined) {
        // the files can have been swapped by a FOREIGN JVM's republish
        // since this session last planned the table — same fp, new
        // manifest. The marker matches, but the cached relation's file
        // index would still point at the retired (deleted) generation:
        // refresh on manifest change so the next plan re-lists.
        noteServed(spark, tbl, matched.get(3))
        return true
      }
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      return false
    }
    matched match {
      case None => false
      case Some(m) =>
        // a torn schema line must degrade to `false` — the rebuild
        // clears the location and self-heals — not throw on every call
        try { declare(spark, tbl, bucketCol, buckets, m(4), loc)
              recordServed(spark, tbl, m(3)); true }
        catch {
          case scala.util.control.NonFatal(_) =>
            if (spark.catalog.tableExists(tbl)) spark.sql(s"DROP TABLE `$tbl`")
            false
        }
    }
  }

  /** One bucketed-table publish, under the table's single-writer lease
    * ([[withLease]] — a concurrent publisher of the same table throws
    * [[LeaseHeld]] instead of interleaving with this write). The write
    * lands in a PRIVATE per-token staging directory next to the serve
    * location; only after [[assertLeaseOwned]] re-verifies the lease is
    * the serve location cleared and the staged directory renamed into
    * place. Consequences: a holder that overran the stale threshold
    * fails LeaseLost with its files still in its own staging dir — the
    * serve location never holds two writers' files; a crash mid-write
    * leaves staging debris the next lease holder sweeps; and because
    * the marker is stamped INTO the stage before the swap, the rename
    * is the commit — no reader ever sees files without their marker or
    * a marker over foreign files. */
  def write(spark: SparkSession, tbl: String, bucketCol: String,
            buckets: Int, fp: String, df: => DataFrame): Unit =
    withLease(tableLoc(spark, tbl), s"write:$tbl:${pid()}") {
      // by-name frame, forced only under the held lease: a lease-race
      // LOSER must not evaluate its build at all — for the ANN tables
      // the frame CONSTRUCTION embeds the training collects, so a
      // strict parameter had the loser paying a full train before
      // throwing LeaseHeld and attaching the winner's publish anyway
      val frame = df
      val loc = tableLoc(spark, tbl)
      val fs = fsOf(loc)
      val qloc = fs.makeQualified(loc)
      val parent = qloc.getParent
      val stagePrefix = qloc.getName + "._GRAFT_STAGE_"
      val retirePrefix = qloc.getName + "._GRAFT_RETIRE_"
      // sweep stage/retire debris of crashed/overrun prior publishers —
      // safe under the lease: any live owner of these dirs already lost
      // its lease (we hold it), so its commit can only end in LeaseLost.
      // Best-effort under transient faults: debris costs disk, not
      // correctness (per-token names never collide with THIS publish),
      // so a sweep whose LIST/DELETE keeps blipping is warned and
      // skipped, never allowed to kill the build before it starts
      try retryIO() {
        if (fs.exists(parent))
          fs.listStatus(parent).iterator
            .filter(s => s.getPath.getName.startsWith(stagePrefix) ||
              s.getPath.getName.startsWith(retirePrefix))
            .foreach(s => fs.delete(s.getPath, true))
      } catch { case e: java.io.IOException =>
        System.err.println(s"[graft] debris sweep for $tbl skipped " +
          s"(transient store faults persisted): ${e.getMessage}")
      }
      val suffix = java.lang.Long.toHexString(graft.expressions.GraftHash.h60(
        Option(leaseHolders.get(qloc.toString)).map(_.token)
          .getOrElse(s"${pid()}#${System.nanoTime()}").getBytes("UTF-8")))
      val stage = new HPath(parent, stagePrefix + suffix)
      val stageTbl = s"${tbl}_stage_$suffix"
      // the staged build is idempotent (Overwrite into a per-token
      // private dir), so a job killed by a transient store fault —
      // task retries exhausted on a data-plane blip, or the driver-side
      // job commit's per-file renames drawing one (the committer has no
      // retry of its own) — is re-run whole, bounded. The ownership
      // gate runs before every re-run: a lease lost mid-build aborts
      // instead of paying another build. Non-IO failures (analysis,
      // OOM) rethrow immediately.
      retryJobIO(s"staged build of $tbl", () => assertLeaseOwned(loc)) {
        spark.sql(s"DROP TABLE IF EXISTS `$stageTbl`")
        frame.write.mode(SaveMode.Overwrite)
          .bucketBy(buckets, bucketCol).sortBy(bucketCol)
          .option("path", stage.toString)
          .format("parquet").saveAsTable(stageTbl)
      }
      spark.sql(s"DROP TABLE `$stageTbl`") // external: the files stay
      val stagedManifest = retryIO()(manifestHash(fs, stage))
      retryIO()(writeFile(fs, markerPath(stage), markerBytes(
        buckets, bucketCol, fp, stagedManifest, frame.schema.toDDL)))
      // commit gate: a publish that overran the stale threshold lost
      // its lease to a breaker — fail loudly BEFORE touching the serve
      // location; the staged files are this writer's private garbage
      assertLeaseOwned(loc)
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      // swap by RETIRE-aside, not recursive delete: the serve-absent
      // window is two metadata renames instead of O(old table files)
      // delete ops — on a 100 TB warehouse the old generation can hold
      // thousands of files, and a reader arriving mid-delete should
      // wait out two namenode ops, not a bulk delete. A crash between
      // the renames leaves the old generation intact in the retire dir
      // (recoverable debris the next lease holder sweeps) rather than
      // half-destroyed in place. The old generation's bytes are
      // dropped only AFTER the new marker is live. Both legs are
      // moveResumable — a transient fault mid-swap (one object of a
      // copy-rename store's emulation) resumes forward instead of
      // killing the publish, and the lease gate re-runs before every
      // resume so a retried swap can never land over a broken lease.
      val swapGate = () => assertLeaseOwned(loc)
      if (exists(fs, qloc)) {
        val retired = new HPath(parent, retirePrefix + suffix)
        moveResumable(fs, qloc, retired, swapGate)
        moveResumable(fs, stage, qloc, swapGate)
        try { fs.delete(retired, true); () }
        catch { case _: java.io.IOException => () } // debris; swept later
      } else moveResumable(fs, stage, qloc, swapGate)
      declare(spark, tbl, bucketCol, buckets, frame.schema.toDDL, qloc)
      // relative paths survive the swap rename, so the serve manifest
      // equals the one stamped into the stage's marker
      recordServed(spark, tbl, stagedManifest)
    }

  /** Re-stamp the marker's manifest hash over the location's CURRENT
    * data files — the append-path commit ([[manifestHash]]'s contract):
    * called by q124 after its bucketed append passes the post-append
    * ownership check, so the marker accounts for the appended files and
    * [[ensure]] keeps serving. An appender that dies (or loses its
    * lease) between the append job and this stamp leaves a manifest
    * mismatch — the table degrades to a rebuild, never serves the
    * unaccounted window. */
  def restampManifest(spark: SparkSession, tbl: String): Unit = {
    val loc = tableLoc(spark, tbl)
    val fs = fsOf(loc)
    val gate = () => assertLeaseOwned(loc)
    gate()
    // a marker read that blips reads as None (readOrNull swallows) —
    // retryNullable re-reads before concluding the marker is gone; a
    // PERSISTENT None still aborts loudly (never re-stamp blind)
    val m = Option(retryNullable(readMarker(fs, loc).orNull))
      .getOrElse(throw new IllegalStateException(
        s"restampManifest($tbl): no well-formed marker at $loc"))
    val tmp = new HPath(loc, Marker + ".tmp")
    val manifest = retryIO(gate)(manifestHash(fs, loc))
    retryIO(gate)(writeFile(fs, tmp,
      markerBytes(m(0).toInt, m(1), m(2), manifest, m(4))))
    replace(fs, tmp, markerPath(loc), gate)
    // the appender's own catalog entry planned the pre-append file set;
    // refresh it so this session's next scan sees the appended files
    noteServed(spark, tbl, manifest)
  }

  private def pid(): String =
    s"${java.lang.ProcessHandle.current().pid()}@${Thread.currentThread().getId}"

  /** One wait budget for every serve path (attachOrBuild and the ANN
    * pair publish) — a split constant is how one path times out while
    * the other still waits. Size to the longest legitimate build. */
  val defaultWaitMs: Long = 10L * 60 * 1000

  /** The publish lifecycle in one call: valid catalog hit → attach →
    * build. A build that loses the lease race WAITS for the winner and
    * attaches its publish instead of failing the job: this is a SERVE
    * path — two JVMs first-touching the same table (a Verify and a
    * Bench started together on a cold shared warehouse) both need the
    * table, and only one needs to build it. Rethrows [[LeaseHeld]]
    * only if the winner still holds the lease after `waitMs` — a
    * legitimately long build; the caller retries when it finishes. */
  def attachOrBuild(spark: SparkSession, tbl: String, bucketCol: String,
                    buckets: Int, fp: String, waitMs: Long = defaultWaitMs)
                   (build: => DataFrame): Unit = {
    val deadline = System.currentTimeMillis() + waitMs
    // LOOP, not a single retry: with three cold-starting JVMs (or a
    // winner whose build throws and releases markerless) the wait can
    // end in ANOTHER lease race, and the loser of that race must wait
    // again — a one-shot retry would die with budget remaining. Each
    // iteration: attach if the winner's marker landed, else try to be
    // the builder, else wait out whoever holds the lease (or a break
    // claim — LeaseHeld with no lease file).
    while (true) {
      if (ensure(spark, tbl, bucketCol, buckets, fp)) return
      try { write(spark, tbl, bucketCol, buckets, fp, build); return }
      catch { case held: LeaseHeld =>
        awaitNoWriter(Seq(tableLoc(spark, tbl)), deadline, held)
      }
    }
  }

  /** [[withLease]], waiting out rival writers up to `waitMs` instead of
    * failing on [[LeaseHeld]] — the serve-path loop shape
    * ([[attachOrBuild]]'s), reusable by publish paths that manage their
    * own ensure/build/append sequencing (q127's dashboard, its
    * streaming twin). Loops because the wait can end in ANOTHER lease
    * race; rethrows only once the budget is spent. */
  def withLeaseAwaiting[T](loc: HPath, holder: String,
                           waitMs: Long = defaultWaitMs)(body: => T): T = {
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      try return withLease(loc, holder)(body)
      catch { case held: LeaseHeld =>
        awaitNoWriter(Seq(loc), deadline, held)
      }
    }
    sys.error("unreachable")
  }

  /** The serve path's wait primitive ([[attachOrBuild]],
    * `Similarity.publishAssignPair`): poll until NO writer artifact —
    * lease file or break claim — exists for any of `locs`, rethrowing
    * `held` once `deadline` passes. The deadline is enforced even when
    * no artifact is (or remains) visible — `waitMs` is an UPPER BOUND
    * on the whole wait-and-retry call, not just on time spent watching
    * a lease: without the trailing check a winner that keeps failing
    * markerless would have the loser re-entering its own (train +)
    * build forever, silently ignoring the budget. */
  def awaitNoWriter(locs: Seq[HPath], deadline: Long,
                    held: LeaseHeld): Unit = {
    val watched = locs.map { l =>
      val fs = fsOf(l)
      val lp = leasePath(fs.makeQualified(l))
      (fs, Seq(lp, breakPath(lp)))
    }
    // a transient LIST/HEAD fault while polling reads as "writer still
    // present" — conservative: keep waiting (bounded by the deadline)
    // rather than racing into a build on a blip. An artifact OLDER than
    // the stale threshold does NOT count as a live writer (r15 fault
    // campaign): a leaked lease (release read blipped) otherwise wedges
    // every waiter for the full budget even though the write path could
    // stale-break it — returning early hands it to the caller's retry,
    // whose acquire re-verifies staleness UNDER a break claim before
    // deleting anything (a genuinely live holder's heartbeat keeps its
    // age low, so this never wakes on one)
    def writerVisible(): Boolean =
      try watched.exists { case (fs, ps) =>
        ps.exists(p => exists(fs, p) && ageOf(fs, p) <= leaseStaleMs) }
      catch { case _: java.io.IOException => true }
    while (writerVisible()) {
      if (System.currentTimeMillis() > deadline) throw held
      Thread.sleep(500)
    }
    if (System.currentTimeMillis() > deadline) throw held
  }
}
