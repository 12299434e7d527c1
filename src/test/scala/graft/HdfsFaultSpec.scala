package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.{HdfsSimFileSystem, Published, StoreFaults}

/** The hdfs:// face of the transient-fault campaign (r15 verdict ask
  * #2): [[graft.sources.StoreFaults]] is shared by both sims, so the
  * same post-retry IOException class a DataNode/RPC blip surfaces is
  * injected at the hdfs sim's FileSystem boundary. The scheme
  * difference under test: hdfs renames are ATOMIC metadata ops — a
  * faulted rename did nothing (no torn half-copy to resume), so the
  * retry policy's clean-rename branch re-issues it; everything else
  * (lease create ambiguity, read loudness) behaves exactly like the
  * s3 legs. The whole-engine hdfs campaign runs as a subprocess probe
  * (tools/fault_probes.sh hdfs). */
class HdfsFaultSpec extends SparkSpec {

  private def freshBase(tag: String): HPath = {
    registerSchemeImpl("fs.hdfs.impl", classOf[HdfsSimFileSystem])
    val dir = Files.createTempDirectory(s"hdfsfault_$tag")
    // scope injection to THIS test's temp base — the fault globals are
    // JVM-wide and the suite JVM is shared (StoreFaults' scope note)
    StoreFaults.faultPathPrefix = Some(dir.toString)
    new HPath(s"hdfs://graftsim$dir")
  }

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

  test("rename RPC blips through hdfs:// are absorbed: the atomic rename " +
      "is re-issued, never resumed over a torn state") { withFaults {
    val base = freshBase("rename")
    val fs = Published.fsOf(base)
    val src = new HPath(base, "stage")
    val dst = new HPath(base, "tbl")
    fs.mkdirs(src)
    put(fs, src, "_GRAFT_PUBLISHED", "marker")
    (1 to 4).foreach(i => put(fs, src, s"part-0000$i", s"data-$i" * 20))
    val staged = Published.manifestHash(fs, src)
    val blips = new java.util.concurrent.atomic.AtomicInteger(0)
    StoreFaults.faultHook = (op, _) =>
      op == "rename" && blips.incrementAndGet() <= 2
    Published.moveResumable(fs, src, dst)
    assert(blips.get() >= 2, "the rename blips never fired (vacuous)")
    assert(Published.manifestHash(fs, dst) == staged,
      "recovered rename does not carry exactly the staged files")
    assert(!fs.exists(src), "source survived the completed rename")
  }}

  test("lease acquire through hdfs:// survives a conditional-PUT blip: " +
      "the ambiguity loop re-reads before re-issuing") { withFaults {
    val base = freshBase("acquire")
    val loc = new HPath(base, "tbl")
    val nioLease = java.nio.file.Paths.get(
      new HPath(base, "tbl._GRAFT_LEASE").toUri.getPath)
    val blipped = new java.util.concurrent.atomic.AtomicBoolean(false)
    StoreFaults.faultHook = (op, p) =>
      op == "putif" && p.getName.endsWith("._GRAFT_LEASE") &&
        blipped.compareAndSet(false, true)
    var entered = false
    Published.withLease(loc, "hdfs-blip-holder", staleMs = 60000) {
      entered = true
      Published.assertLeaseOwned(loc) // the blipped acquire must OWN it
    }
    assert(blipped.get(), "the acquire blip never fired (vacuous)")
    assert(entered, "holder never entered the body")
    assert(!Files.exists(nioLease), "lease not released cleanly")
  }}

  test("reads under GET/LIST faults through hdfs://: successful reads " +
      "equal the fault-free answer; failures are loud") { withFaults {
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
        val m = Published.manifestHash(fs, tbl)
        val markerContent = scala.util.Using.resource(
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
