package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.Published

/** The two storage-semantics contracts the lease protocol stands on,
  * pinned as EXECUTED schedules (r13 verdict asks #2 and #3):
  *
  *  1. HEARTBEAT on stores without a client touch — the refresh must be
  *     a content bump the store itself timestamps, never a
  *     client-clocked `setTimes`; and when a store refuses every
  *     refresh mechanism, the degradation (staleMs becomes a ceiling on
  *     publish duration) must be LOUD.
  *  2. CREATE-NEW atomicity — `createNewAtomic`'s scaladoc states that
  *     a check-then-put connector reopens the exclusion race and that
  *     the contract is conditional-put. Both sides run here under ONE
  *     deterministic thread schedule: the racy shape double-wins, the
  *     conditional-put shape excludes.
  *
  * All mock schemes back onto the local disk
  * ([[GraftMockFileSystem]]'s family), so specs inspect state with
  * java.nio while every engine operation goes through
  * `org.apache.hadoop.fs` resolution like a real connector. */
class LeaseContractSpec extends SparkSpec {

  private def register(scheme: String, cls: Class[_]): Unit =
    registerSchemeImpl(s"fs.$scheme.impl", cls)

  test("heartbeat on a setTimes-less store: content bump keeps a long hold alive " +
      "against a rival's break") {
    register("graftnomt", classOf[NoSetTimesFileSystem])
    val dir = Files.createTempDirectory("leasecontract_nomt")
    val loc = new HPath(s"graftnomt://$dir/tbl")
    val nioLease = dir.resolve("tbl._GRAFT_LEASE")
    NoSetTimesFileSystem.setTimesCalls.set(0)
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var ownedAtEnd = false
    @volatile var sawBump = false
    // staleMs=1s, hold ~3s: with a setTimes heartbeat this store would
    // age the lease past the threshold (setTimes throws here) and the
    // rival below would break a LIVE holder — the failure mode r13's
    // advice predicted for object stores. The content bump rewrites
    // the lease instead; the store stamps each rewrite's mtime itself.
    val holder = new Thread(() =>
      Published.withLease(loc, "slow-publisher", staleMs = 1000) {
        inBody.countDown()
        release.await(20, TimeUnit.SECONDS)
        Published.assertLeaseOwned(loc)
        ownedAtEnd = true
      })
    holder.start()
    assert(inBody.await(10, TimeUnit.SECONDS))
    Thread.sleep(2600) // ~3x the stale threshold, ≥10 heartbeat periods
    // the bump is observable on the backing store: token still line 1
    // (assertLeaseOwned's contract), a hb:<n> line appended by rewrites.
    // Poll a few times — a nio read can land mid-rewrite and see a torn
    // prefix (break-safe for the protocol, but not for this assertion)
    var content = ""
    var polls = 0
    while (!sawBump && polls < 20) {
      content = new String(Files.readAllBytes(nioLease), "UTF-8")
      sawBump = content.linesIterator.exists(_.startsWith("hb:"))
      if (!sawBump) { polls += 1; Thread.sleep(100) }
    }
    assert(sawBump, s"expected a content-bumped lease, got: $content")
    // a rival arriving well past staleMs must still lose: the rewrites
    // kept the store-stamped mtime young, and any break re-read that
    // straddles a bump sees changed content and aborts
    intercept[Published.LeaseHeld] {
      Published.withLease(loc, "rival", staleMs = 1000) { fail("must not run") }
    }
    release.countDown(); holder.join(10000)
    assert(ownedAtEnd, "holder must still own its lease after 3x staleMs")
    assert(!Files.exists(nioLease), "released cleanly after the long hold")
    assert(NoSetTimesFileSystem.setTimesCalls.get() == 0,
      "on a non-local store the content bump is PRIMARY — no client-" +
        "clocked setTimes may ever be attempted")
  }

  test("heartbeat that cannot refresh at all goes LOUD: staleMs degrades to a " +
      "publish-duration ceiling and says so") {
    register("graftnorf", classOf[NoRefreshFileSystem])
    val dir = Files.createTempDirectory("leasecontract_norf")
    val loc = new HPath(s"graftnorf://$dir/tbl")
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new java.io.PrintStream(
      new java.io.OutputStream {
        override def write(b: Int): Unit = { errBuf.write(b); oldErr.write(b) }
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          errBuf.write(b, off, len); oldErr.write(b, off, len)
        }
      }, true))
    try {
      // staleMs=1s → heartbeat period 250ms; both mechanisms refused →
      // 3 consecutive failed beats inside ~1s of a 2s hold
      Published.withLease(loc, "stuck-publisher", staleMs = 1000) {
        Thread.sleep(2000)
        // nobody broke it in this test — the degradation is about what
        // a rival COULD now do, and the holder still owns its lease
        Published.assertLeaseOwned(loc)
      }
    } finally System.setErr(oldErr)
    val err = errBuf.toString("UTF-8")
    assert(err.contains("cannot refresh") && err.contains("CEILING"),
      s"expected the loud staleMs-degradation warning, got: $err")
    assert(err.indexOf("cannot refresh") == err.lastIndexOf("cannot refresh"),
      "the warning must fire ONCE, not every beat")
  }

  test("a SILENT no-op setTimes cannot masquerade as a successful beat: the " +
      "ceiling warning still fires") {
    // Hadoop's FileSystem base setTimes is a documented no-op and most
    // object-store connectors inherit it: the fallback touch "succeeds"
    // without moving the mtime. An unverified heartbeat would count
    // every such beat as ok — no warning, lease quietly aging to
    // breakable. The verified touch must detect the unmoved mtime and
    // degrade LOUDLY, same contract as the throwing profile above.
    register("graftsmt", classOf[SilentMtimeFileSystem])
    val dir = Files.createTempDirectory("leasecontract_smt")
    val loc = new HPath(s"graftsmt://$dir/tbl")
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new java.io.PrintStream(
      new java.io.OutputStream {
        override def write(b: Int): Unit = { errBuf.write(b); oldErr.write(b) }
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          errBuf.write(b, off, len); oldErr.write(b, off, len)
        }
      }, true))
    try {
      Published.withLease(loc, "masked-publisher", staleMs = 1000) {
        Thread.sleep(2000)
        Published.assertLeaseOwned(loc)
      }
    } finally System.setErr(oldErr)
    val err = errBuf.toString("UTF-8")
    assert(err.contains("cannot refresh") && err.contains("CEILING"),
      s"a no-op touch must be detected as a FAILED beat, got: $err")
  }

  /** One deterministic schedule, replayed against both connector
    * shapes: racer A enters create-no-overwrite first and stalls at the
    * hook; racer B then runs its create to completion; A resumes. */
  private def raceOnce(scheme: String): (Boolean, Boolean, String) = {
    val dir = Files.createTempDirectory(s"leasecontract_$scheme")
    val p = new HPath(s"$scheme://$dir/claim")
    val fs = Published.fsOf(p)
    val aAtHook = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    val firstTaken = new AtomicBoolean(false)
    CreateContract.hook = () =>
      if (firstTaken.compareAndSet(false, true)) {
        aAtHook.countDown()
        bDone.await(10, TimeUnit.SECONDS); ()
      }
    try {
      @volatile var aWon = false
      val a = new Thread(() =>
        aWon = Published.createNewAtomic(fs, p, "A".getBytes("UTF-8")))
      a.start()
      assert(aAtHook.await(10, TimeUnit.SECONDS), "racer A never reached the hook")
      val bWon = Published.createNewAtomic(fs, p, "B".getBytes("UTF-8"))
      bDone.countDown()
      a.join(10000)
      val finalContent =
        new String(Files.readAllBytes(dir.resolve("claim")), "UTF-8")
      (aWon, bWon, finalContent)
    } finally CreateContract.hook = () => ()
  }

  test("an acquire whose conditional PUT LANDS but errors (response lost, " +
      "cleanup delete and re-reads blipping) resolves to OWNERSHIP, never " +
      "LeaseHeld against its own lease") {
    // r16 review finding #1, executed: the sims fault BEFORE the claim,
    // so only this mock reaches the landed-but-errored corner. Pre-fix,
    // the re-issued create hit the caller's own file, returned false,
    // and tryAcquire concluded LeaseHeld — the caller then waited out
    // its OWN orphan until the stale break.
    register("graftltt", classOf[LandThenThrowFileSystem])
    val dir = java.nio.file.Files.createTempDirectory("graft_ltt")
    val loc = new HPath(s"graftltt://$dir/tbl")
    val nioLease = dir.resolve("tbl._GRAFT_LEASE")
    LandThenThrow.getBlips.set(0)
    LandThenThrow.armed = true
    var entered = false
    try {
      Published.withLease(loc, "ltt-holder", staleMs = 60000) {
        LandThenThrow.armed = false // window over; release runs clean
        entered = true
        // the landed lease is OURS: the commit gate must agree
        Published.assertLeaseOwned(loc)
      }
    } finally LandThenThrow.armed = false
    assert(entered, "acquire never resolved to ownership")
    assert(LandThenThrow.getBlips.get() >= LandThenThrow.getBlipBudget,
      "the read blips never fired (test is vacuous)")
    assert(!java.nio.file.Files.exists(nioLease),
      "lease not released cleanly after the ambiguous acquire")
    // and the table is immediately re-acquirable — no orphan, no debris
    Published.withLease(loc, "ltt-second", staleMs = 60000) {
      Published.assertLeaseOwned(loc)
    }
    assert(!java.nio.file.Files.exists(nioLease))
  }

  test("check-then-put create-new DOUBLE-WINS under a racing schedule — the " +
      "documented object-store hazard, executed") {
    register("graftracy", classOf[RacyCreateFileSystem])
    val (aWon, bWon, finalContent) = raceOnce("graftracy")
    // both racers passed the existence check before either PUT landed:
    // both report victory, and A's late PUT silently clobbered B's —
    // exactly the torn-exclusion state the contract forbids trusting
    assert(aWon && bWon,
      s"the racy shape must double-win to demonstrate the hazard " +
        s"(a=$aWon b=$bWon)")
    assert(finalContent == "A",
      "the late PUT clobbers the first winner's lease — B holds a " +
        s"lease file that says '$finalContent'")
  }

  test("conditional-put create-new EXCLUDES under the same schedule — the " +
      "contract createNewAtomic requires") {
    register("graftcput", classOf[CondPutFileSystem])
    val (aWon, bWon, finalContent) = raceOnce("graftcput")
    // same schedule, atomic claim: B (who completed first) wins, A's
    // claim fails cleanly, and the winner's content is intact
    assert(!aWon && bWon,
      s"exactly one winner under conditional-put (a=$aWon b=$bWon)")
    assert(finalContent == "B", "the winner's content survives the race")
  }
}
