package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.{Published, S3SimFileSystem, StoreFaults}

/** TRANSIENT store faults executed against the publish machinery (r14
  * verdict ask #1) — the retryable-error class a real object store
  * throws (500s, resets, throttling surfaced as IOException once the
  * connector's own retries are exhausted), injected at the FileSystem
  * API boundary by [[graft.sources.StoreFaults.maybeFault]].
  *
  * What becomes executed fact here:
  *
  *  - a lease heartbeat whose content-bump PUTs fail repeatedly
  *    degrades LOUDLY (the 3-consecutive-failures warning) while
  *    EXCLUSION holds — a rival still gets LeaseHeld, the holder still
  *    owns its commit gate, and the release leaves no debris;
  *  - one transient GET blip on the lease read does NOT kill the
  *    heartbeat thread (it counts as a failed beat and the next beat
  *    recovers) — a long publish must not lose its refresh to a single
  *    dropped read;
  *  - a publish-shaped rename whose per-object copies fault mid-swap
  *    never leaves a SERVE-able torn state: whatever the fault leaves
  *    at the destination fails the marker/manifest gate, and a retry
  *    once the store recovers serves exactly the staged bytes;
  *  - reads under GET/LIST faults either throw or return the exact
  *    fault-free answer — never a silently divergent one.
  *
  * The whole-engine campaign (Verify's q120–q124 lifecycle at a
  * nonzero env-driven fault rate, with Spark task retries absorbing
  * the data-plane faults) runs as a subprocess probe —
  * tools/fault_probes.sh — because the warehouse dir is a static conf
  * baked into the suite's shared session. */
class S3FaultSpec extends SparkSpec {

  private def freshBase(tag: String): HPath = {
    registerSchemeImpl("fs.s3a.impl", classOf[S3SimFileSystem])
    val dir = Files.createTempDirectory(s"s3fault_$tag")
    // scope injection to THIS test's temp base (r15 advice #2): even a
    // stray concurrent session in the suite JVM never draws a fault on
    // a foreign path
    StoreFaults.faultPathPrefix = Some(dir.toString)
    new HPath(s"s3a://graftbucket$dir")
  }

  /** Every test resets the injection globals — the suite JVM is shared
    * (and suites run SEQUENTIALLY; see [[StoreFaults]]'s scope note). */
  private def withFaults[A](body: => A): A =
    try body
    finally {
      StoreFaults.faultHook = (_, _) => false
      StoreFaults.faultPct = 0.0
      StoreFaults.faultOps = StoreFaults.defaultOps
      StoreFaults.faultPathPrefix = None
    }

  private def put(fs: org.apache.hadoop.fs.FileSystem, dir: HPath,
                  name: String, content: String): Unit =
    scala.util.Using.resource(fs.create(new HPath(dir, name), true))(
      _.write(content.getBytes("UTF-8")))

  test("sustained bump-PUT faults mid-hold: loud degrade warning fires, " +
      "rival is still excluded, release is clean") { withFaults {
    val base = freshBase("hbput")
    val fs = Published.fsOf(base)
    val loc = new HPath(base, "tbl")
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var ownedAtEnd = false
    val warnBase = Published.heartbeatDegradedWarnings.get()
    // staleMs=12000 -> beat period 1.5 s, break-window guard at age 6 s,
    // stale-break at 12 s: once bumps fault, the lease mtime never
    // refreshes again, so the threshold must comfortably outlast the
    // warning poll (<=8 s) + the rival attempt — at 4 s a loaded box let
    // the rival arrive past staleness and legitimately BREAK the live
    // holder (review finding, r15). The hook faults only PLAIN PUTs
    // ("put" — the heartbeat's content bumps); the rival's acquire
    // attempt is a conditional put ("putif") and must stay un-faulted
    // so its LeaseHeld is the protocol's verdict, not the fault's.
    val holder = new Thread(() =>
      Published.withLease(loc, "fault-holder", staleMs = 12000) {
        inBody.countDown()
        release.await(30, TimeUnit.SECONDS)
        Published.assertLeaseOwned(loc) // throws LeaseLost if exclusion broke
        ownedAtEnd = true
      })
    holder.start()
    assert(inBody.await(10, TimeUnit.SECONDS), "holder never entered the body")
    StoreFaults.faultHook = (op, p) =>
      op == "put" && p.getName.endsWith("._GRAFT_LEASE")
    try {
      // 3 consecutive failed beats land by ~4.5 s; poll the observable
      // counter (bump PUT faults -> setTimes fallback is a silent no-op
      // on this store -> beat failed)
      var polls = 0
      while (Published.heartbeatDegradedWarnings.get() == warnBase && polls < 80) {
        Thread.sleep(100); polls += 1
      }
      assert(Published.heartbeatDegradedWarnings.get() > warnBase,
        "the 3-consecutive-failed-beats warning never fired under sustained " +
          "bump-PUT faults")
      // exclusion holds mid-degrade: the lease file still carries the
      // holder's token (bumps failed, nothing overwrote it), so a rival
      // loses the acquire and cannot stale-break (age < staleMs)
      val rival = intercept[Published.LeaseHeld] {
        Published.withLease(loc, "rival", staleMs = 12000) {
          fail("rival must never enter the body while the degraded holder is live")
        }
      }
      assert(rival.getMessage.contains("held by"),
        s"unexpected LeaseHeld shape: ${rival.getMessage}")
    } finally {
      StoreFaults.faultHook = (_, _) => false
      release.countDown()
    }
    holder.join(20000)
    assert(!holder.isAlive, "holder thread wedged")
    assert(ownedAtEnd, "holder lost its commit gate despite never being broken")
    val leaseNio = java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE").toUri.getPath)
    assert(!Files.exists(leaseNio), "lease not released")
    assert(!Files.exists(java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE.break").toUri.getPath)),
      "break-claim debris left behind")
  }}

  test("one transient GET blip on the lease read does not kill the heartbeat") { withFaults {
    val base = freshBase("hbget")
    val fs = Published.fsOf(base)
    val loc = new HPath(base, "tbl")
    val nioLease = java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE").toUri.getPath)
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val warnBase = Published.heartbeatDegradedWarnings.get()
    def hbCount(): Long = {
      // nio read bypasses the fault taps; a torn mid-rewrite read just
      // yields an unparsable tail and the poll retries
      if (!Files.exists(nioLease)) -1L
      else new String(Files.readAllBytes(nioLease), "UTF-8").linesIterator
        .toSeq.lastOption.filter(_.startsWith("hb:"))
        .flatMap(l => scala.util.Try(l.stripPrefix("hb:").trim.toLong).toOption)
        .getOrElse(-1L)
    }
    val holder = new Thread(() =>
      Published.withLease(loc, "blip-holder", staleMs = 2000) {
        inBody.countDown()
        release.await(30, TimeUnit.SECONDS); ()
      })
    holder.start()
    try {
      assert(inBody.await(10, TimeUnit.SECONDS), "holder never entered the body")
      // wait for the FIRST healthy bump, so the blip lands on a beat
      // that is mid-cadence, not the acquire
      var polls = 0
      while (hbCount() < 1 && polls < 100) { Thread.sleep(50); polls += 1 }
      val atBlip = hbCount()
      assert(atBlip >= 1, "heartbeat never bumped before the blip")
      val once = new AtomicBoolean(false)
      StoreFaults.faultHook = (op, p) =>
        op == "get" && p.getName.endsWith("._GRAFT_LEASE") &&
          once.compareAndSet(false, true)
      // the blipped beat fails (no write); the NEXT beat must recover —
      // pre-fix, cur==null flipped live=false and refresh died for good
      polls = 0
      while (hbCount() <= atBlip + 1 && polls < 100) { Thread.sleep(50); polls += 1 }
      assert(once.get(), "the GET blip never fired (test is vacuous)")
      assert(hbCount() > atBlip + 1,
        s"heartbeat died after one GET blip (stuck at hb:${hbCount()})")
      assert(Published.heartbeatDegradedWarnings.get() == warnBase,
        "a single blip must not trip the 3-consecutive-failures warning")
    } finally {
      StoreFaults.faultHook = (_, _) => false
      release.countDown()
    }
    holder.join(20000)
    assert(!Files.exists(nioLease), "lease not released")
  }}

  test("GET blips on the release's verify-read do not leak the lease") { withFaults {
    // r15 fault campaign, attempt 2: ONE unlucky GET on the release
    // read left the lease behind, and the same JVM's retry then burned
    // its whole wait budget on the corpse. The release now retries the
    // read; two consecutive blips must still end in a clean delete.
    val base = freshBase("release")
    val loc = new HPath(base, "tbl")
    val nioLease = java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE").toUri.getPath)
    val blips = new java.util.concurrent.atomic.AtomicInteger(0)
    Published.withLease(loc, "release-blip", staleMs = 60000) {
      // staleMs=60 s -> heartbeat period 7.5 s; arming the hook just
      // before the body returns leaves the release's reads as the only
      // realistic GET consumers of the window
      StoreFaults.faultHook = (op, p) =>
        op == "get" && p.getName.endsWith("._GRAFT_LEASE") &&
          blips.incrementAndGet() <= 2
    }
    assert(blips.get() >= 2, "the release never consumed the two GET blips " +
      "(test is vacuous — did the release stop reading the lease?)")
    assert(!Files.exists(nioLease),
      "lease leaked: the release gave up after transient GET blips")
  }}

  test("publish-shaped rename under probabilistic copy faults: torn dst " +
      "never passes the manifest gate; retry after recovery serves exactly " +
      "the staged bytes") { withFaults {
    val base = freshBase("swap")
    val fs = Published.fsOf(base)
    val stage = new HPath(base, "stage")
    fs.mkdirs(stage)
    put(fs, stage, "_GRAFT_PUBLISHED", "marker")
    (1 to 6).foreach(i => put(fs, stage, s"part-0000$i", s"data-$i" * 20))
    val completeManifest = Published.manifestHash(fs, stage)
    val dst = new HPath(base, "tbl")
    val injectedBefore = StoreFaults.faultsInjected.get()
    // 25% per-object copy faults: each swap attempt copies marker + 6
    // parts, so most attempts die mid-copy; the schedule is seeded
    // (env/default), so the campaign is reproducible per JVM op order
    StoreFaults.faultOps = Set("copy")
    StoreFaults.faultPct = 25.0
    var renamed = false
    var attempts = 0
    var tornObserved = 0
    while (!renamed && attempts < 300) {
      attempts += 1
      try renamed = fs.rename(stage, dst)
      catch {
        case _: java.io.IOException =>
          // THE invariant: whatever the fault left at dst must not be
          // serve-able — marker present AND manifest matching is the
          // only state ensure() accepts
          val servable = fs.exists(new HPath(dst, "_GRAFT_PUBLISHED")) &&
            Published.manifestHash(fs, dst) == completeManifest
          assert(!servable,
            s"attempt $attempts left a torn dst that PASSES the manifest gate")
          tornObserved += 1
          // the sweep a next lease holder performs; stage is intact
          // (copy-phase faults never touch the source)
          fs.delete(dst, true)
          assert(fs.exists(new HPath(stage, "part-00006")),
            "copy-phase fault damaged the SOURCE")
      }
    }
    assert(renamed, s"swap never completed in $attempts attempts")
    assert(tornObserved >= 1,
      "campaign was vacuous — no attempt ever faulted mid-copy")
    assert(StoreFaults.faultsInjected.get() > injectedBefore, "no faults injected")
    assert(Published.manifestHash(fs, dst) == completeManifest,
      "completed swap does not carry exactly the staged data files")
    assert(!fs.exists(stage), "source not fully consumed by the final swap")
  }}

  test("a RETRIED commit still aborts on lease loss: the swap's " +
      "per-attempt ownership gate fires before the resume") { withFaults {
    // r15 verdict ask #1's safety half: the bounded retries that let a
    // publish absorb transient store faults must never let a retried
    // swap land over a lease a breaker took — the ownership gate runs
    // before EVERY moveResumable attempt, so losing the lease between
    // a faulted attempt and its resume aborts with the staged files
    // still private and the serve location still un-servable.
    val base = freshBase("leaseloss")
    val fs = Published.fsOf(base)
    val loc = new HPath(base, "tbl")
    val stage = new HPath(base, "tbl._GRAFT_STAGE_x")
    fs.mkdirs(stage)
    put(fs, stage, "_GRAFT_PUBLISHED", "marker")
    (1 to 6).foreach(i => put(fs, stage, s"part-0000$i", s"data-$i" * 20))
    val stagedManifest = Published.manifestHash(fs, stage)
    val nioLease = java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE").toUri.getPath)
    val fired = new AtomicBoolean(false)
    intercept[Published.LeaseLost] {
      Published.withLease(loc, "loss-holder", staleMs = 60000) {
        // first per-object copy of the swap: inject a transient fault
        // AND (a breaker+rival winning meanwhile) replace the lease
        // with a foreign token via nio — the retry's gate must see it
        StoreFaults.faultHook = (op, p) =>
          op == "copy" && p.toString.contains("/tbl/") &&
            fired.compareAndSet(false, true) && {
              Files.write(nioLease,
                "foreign-token\nrival".getBytes("UTF-8")); true
            }
        Published.moveResumable(fs, stage, loc,
          gate = () => Published.assertLeaseOwned(loc))
        fail("the resumed swap committed over a lost lease")
      }
    }
    assert(fired.get(), "the mid-swap fault never fired (test is vacuous)")
    assert(fs.exists(new HPath(stage, "part-00006")),
      "abort damaged the staged SOURCE files")
    val servable = fs.exists(new HPath(loc, "_GRAFT_PUBLISHED")) &&
      Published.manifestHash(fs, loc) == stagedManifest
    assert(!servable,
      "the aborted swap left a serve-able destination — torn state")
  }}

  test("the publish swap COMPLETES under a deterministic fault schedule " +
      "— finish-forward resume serves exactly the staged bytes") { withFaults {
    // the completion half of r15 verdict ask #1, at the moveResumable
    // unit: a fault mid-copy (torn dst), a fault mid-resume-PUT, and a
    // fault on the source delete (dst COMPLETE, src still present —
    // the state where delete-dst-and-re-rename would lose data) must
    // all be absorbed within the bounded attempt budget, ending with
    // the destination holding exactly the staged files.
    val base = freshBase("resume")
    val fs = Published.fsOf(base)
    val stage = new HPath(base, "stage")
    val dst = new HPath(base, "tbl")
    fs.mkdirs(stage)
    put(fs, stage, "_GRAFT_PUBLISHED", "marker")
    (1 to 8).foreach(i => put(fs, stage, s"part-0000$i", s"data-$i" * 20))
    val stagedManifest = Published.manifestHash(fs, stage)
    val copies = new java.util.concurrent.atomic.AtomicInteger(0)
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dels = new java.util.concurrent.atomic.AtomicInteger(0)
    StoreFaults.faultHook = (op, p) => op match {
      // attempt 1 (the rename): die on the 3rd per-object copy
      case "copy" if p.toString.contains("/tbl/") =>
        copies.incrementAndGet() == 3
      // attempt 2 (first resume): die on its 2nd manual PUT
      case "put" if p.toString.contains("/tbl/") =>
        puts.incrementAndGet() == 2
      // attempt 3: copies done — die on the SOURCE delete
      case "delete" if p.toString.contains("/stage") =>
        dels.incrementAndGet() == 1
      case _ => false
    }
    Published.moveResumable(fs, stage, dst)
    assert(copies.get() >= 3 && puts.get() >= 2 && dels.get() >= 1,
      s"fault schedule not consumed (copies=${copies.get()} " +
        s"puts=${puts.get()} dels=${dels.get()}) — test is vacuous")
    StoreFaults.faultHook = (_, _) => false
    assert(Published.manifestHash(fs, dst) == stagedManifest,
      "resumed swap does not serve exactly the staged bytes")
    assert(!fs.exists(stage), "source not consumed by the resumed swap")
  }}

  test("reads under GET/LIST faults: every successful read equals the " +
      "fault-free answer; failures are loud, never divergent") { withFaults {
    val base = freshBase("read")
    val fs = Published.fsOf(base)
    val tbl = new HPath(base, "tbl")
    fs.mkdirs(tbl)
    put(fs, tbl, "_GRAFT_PUBLISHED", "marker")
    (1 to 4).foreach(i => put(fs, tbl, s"part-0000$i", s"data-$i" * 20))
    val trueManifest = Published.manifestHash(fs, tbl)
    StoreFaults.faultOps = Set("get", "list")
    StoreFaults.faultPct = 20.0
    var ok = 0
    var failed = 0
    (1 to 60).foreach { _ =>
      try {
        val m = Published.manifestHash(fs, tbl) // LIST path
        val markerContent = scala.util.Using.resource( // GET path
          fs.open(new HPath(tbl, "_GRAFT_PUBLISHED"))) { in =>
          val buf = new Array[Byte]("marker".length)
          in.readFully(0, buf); new String(buf, "UTF-8")
        }
        assert(m == trueManifest, s"LIST under faults returned a DIVERGENT manifest $m")
        assert(markerContent == "marker", "GET under faults returned divergent bytes")
        ok += 1
      } catch { case _: java.io.IOException => failed += 1 }
    }
    assert(ok >= 1, "no read ever succeeded at a 20% fault rate (rate too hot)")
    assert(failed >= 1, "no read ever faulted (campaign vacuous)")
  }}
}
