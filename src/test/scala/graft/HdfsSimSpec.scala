package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.{HdfsSimFileSystem, Published}

/** The publish machinery's non-`file`-scheme branches executed against
  * the HDFS-semantics sim ([[graft.sources.HdfsSimFileSystem]] — the
  * r13 verdict asked for MiniDFSCluster; this image has no
  * namenode/datanode classes and zero egress, so the sim enforces
  * HDFS's stricter documented semantics over local disk instead, and
  * these specs pin what that makes executable:
  *
  *  - `createNewAtomic`'s GENERIC branch (`fs.create(p, false)`) is
  *    genuinely exactly-one-winner under a real thread race — on HDFS
  *    that guarantee is the namenode's; here it is the sim's O_EXCL
  *    claim, and the spec holds either way because the CONTRACT is
  *    what the lease protocol consumes.
  *  - rename never clobbers (the semantic difference from POSIX most
  *    likely to bite a publish path ported from local testing).
  *  - the full lease lifecycle — content-bump heartbeat (hdfs is
  *    non-local, so the bump IS the primary mechanism), rival
  *    exclusion during a long hold, stale-break of a dead writer's
  *    lease — all through `hdfs://`-schemed paths.
  *
  * The whole-engine legs (Verify + oracle + bench + kill -9 crash
  * probe with an hdfs:// warehouse) run as subprocess probes — see
  * PLANS.md r14 — because the warehouse dir is a static conf baked
  * into the suite's shared session. */
class HdfsSimSpec extends SparkSpec {

  private def freshLoc(tag: String): HPath = {
    registerSchemeImpl("fs.hdfs.impl", classOf[HdfsSimFileSystem])
    val dir = Files.createTempDirectory(s"hdfssim_$tag")
    new HPath(s"hdfs://graftsim$dir/tbl")
  }

  test("create-new through hdfs:// is exactly-one-winner under a 16-thread race") {
    val loc = freshLoc("race")
    val fs = Published.fsOf(loc)
    assert(fs.isInstanceOf[HdfsSimFileSystem],
      s"hdfs:// must resolve to the sim, got ${fs.getClass}")
    val p = new HPath(loc.getParent, "claim")
    val start = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { i =>
      new Thread(() => {
        start.await(10, TimeUnit.SECONDS)
        if (Published.createNewAtomic(fs, p, s"racer-$i".getBytes("UTF-8")))
          wins.incrementAndGet()
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(10000))
    assert(wins.get() == 1, s"exactly one racer may win, got ${wins.get()}")
    // and the winner's content is intact — no late racer clobbered it
    val content = new String(Files.readAllBytes(
      java.nio.file.Paths.get(p.toUri.getPath)), "UTF-8")
    assert(content.startsWith("racer-"), s"winner's content torn: '$content'")
  }

  test("rename through hdfs:// never clobbers: file dst fails, dir dst moves into") {
    val loc = freshLoc("rename")
    val fs = Published.fsOf(loc)
    val base = loc.getParent
    def mk(name: String, content: String): HPath = {
      val p = new HPath(base, name)
      scala.util.Using.resource(fs.create(p, true))(
        _.write(content.getBytes("UTF-8")))
      p
    }
    val a = mk("a", "A")
    val b = mk("b", "B")
    // POSIX rename(2) would silently overwrite b with a; HDFS fails it
    assert(!fs.rename(a, b), "rename onto an existing file must fail")
    assert(fs.exists(a) && fs.exists(b), "both files intact after refusal")
    // dir dst: move INTO, not onto
    val d = new HPath(base, "d")
    fs.mkdirs(d)
    assert(fs.rename(a, d), "rename into an existing dir moves src inside")
    assert(fs.exists(new HPath(d, "a")) && !fs.exists(a))
    // taken name inside the dir: refuse again
    val a2 = mk("a", "A2")
    assert(!fs.rename(a2, d), "rename into a dir with the name taken must fail")
    // the swap shape replace()/write() use — rename dst ASIDE, then
    // rename the new content in — works without ever needing clobber
    val aside = new HPath(base, "b.old")
    assert(fs.rename(b, aside), "retire-aside rename succeeds")
    assert(fs.rename(a2, b), "rename to the vacated dst succeeds")
    fs.delete(aside, false)
  }

  test("long-held heartbeating lease on hdfs:// survives a rival; dead writer's " +
      "lease is stale-broken") {
    val loc = freshLoc("lease")
    val fs = Published.fsOf(loc)
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var ownedAtEnd = false
    // live holder, staleMs=1s, hold ~2.6s: hdfs is non-local so the
    // heartbeat content-bumps; each bump is a new create the backing
    // store timestamps, keeping the lease young without any client
    // clock in the judgment
    val holder = new Thread(() =>
      Published.withLease(loc, "hdfs-publisher", staleMs = 1000) {
        inBody.countDown()
        release.await(20, TimeUnit.SECONDS)
        Published.assertLeaseOwned(loc)
        ownedAtEnd = true
      })
    holder.start()
    assert(inBody.await(10, TimeUnit.SECONDS))
    Thread.sleep(2600)
    intercept[Published.LeaseHeld] {
      Published.withLease(loc, "rival", staleMs = 1000) { fail("must not run") }
    }
    release.countDown(); holder.join(10000)
    assert(ownedAtEnd, "holder must still own its lease after ~3x staleMs")
    // DEAD writer: fabricate the exact artifact a kill -9'd publisher
    // leaves — a lease file with a valid token and no process behind it
    val lp = new HPath(loc.getParent, loc.getName + "._GRAFT_LEASE")
    assert(Published.createNewAtomic(fs, lp,
      "deadtoken#999#0#0\ndead-publisher".getBytes("UTF-8")))
    Thread.sleep(600)
    @volatile var secondRan = false
    // a second client past staleMs must break the corpse and acquire
    Published.withLease(loc, "second-client", staleMs = 400) { secondRan = true }
    assert(secondRan, "stale-break must let the second client through")
    assert(!fs.exists(lp), "broken+released lease leaves no artifact")
  }
}
