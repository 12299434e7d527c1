package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.sources.Published

/** The cross-JVM single-writer lease on published tables (r11 verdict
  * ask #2): two concurrent publishers of the same table must never
  * interleave a delete-walk with a bucketed write, and two concurrent
  * q124 compactors must never both read the same high-water mark and
  * double-append the window between them. `withLease` mechanizes the
  * previously-documented one-writer assumption with a CREATE_NEW lease
  * file — one writer wins, the other throws [[Published.LeaseHeld]]
  * loudly instead of corrupting the table. */
class PublishedSpec extends SparkSpec {

  private def tmpLoc() =
    Files.createTempDirectory("pubspec").resolve("some_table")

  test("concurrent lease claimants: exactly one wins, the loser throws LeaseHeld") {
    val loc = tmpLoc()
    val start = new CountDownLatch(1)
    val inBody = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def claimant(id: String) = new Thread(() => {
      start.await()
      try Published.withLease(loc, id) {
        inBody.countDown()
        Thread.sleep(150) // hold long enough that the loser overlaps
        results.add(s"$id:won")
      } catch {
        case _: Published.LeaseHeld => results.add(s"$id:lost")
      }
    })
    val a = claimant("a"); val b = claimant("b")
    a.start(); b.start(); start.countDown()
    a.join(10000); b.join(10000)
    val rs = results.toArray(Array.empty[String]).toSeq
    assert(rs.count(_.endsWith(":won")) == 1, s"exactly one winner, got $rs")
    assert(rs.count(_.endsWith(":lost")) == 1, s"exactly one loud loser, got $rs")
    // the winner's release leaves no lease behind
    assert(!Files.exists(loc.getParent.resolve(loc.getFileName.toString + "._GRAFT_LEASE")),
      "lease file must be deleted on release")
  }

  test("lease is re-entrant per thread (q124 bootstrap publishes under its own lease)") {
    val loc = tmpLoc()
    val out = Published.withLease(loc, "outer") {
      Published.withLease(loc, "inner") { 42 }
    }
    assert(out == 42)
  }

  test("a stale lease (crashed holder) is broken and re-taken") {
    val loc = tmpLoc()
    Files.createDirectories(loc.getParent)
    val lp = loc.getParent.resolve(loc.getFileName.toString + "._GRAFT_LEASE")
    Files.write(lp, "dead-holder\n0".getBytes("UTF-8"))
    Files.setLastModifiedTime(lp, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - Published.leaseStaleMs - 60000))
    val out = Published.withLease(loc, "taker") { "ran" }
    assert(out == "ran")
    assert(!Files.exists(lp), "released after takeover")
  }

  test("a fresh foreign lease blocks: claimant fails loudly, does not wait") {
    val loc = tmpLoc()
    Files.createDirectories(loc.getParent)
    val lp = loc.getParent.resolve(loc.getFileName.toString + "._GRAFT_LEASE")
    Files.write(lp, s"other-jvm\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    val e = intercept[Published.LeaseHeld] {
      Published.withLease(loc, "me") { fail("body must not run") }
    }
    assert(e.getMessage.contains("other-jvm"))
    Files.deleteIfExists(lp)
  }

  test("q124 compaction under a foreign lease fails loudly instead of double-appending") {
    import graft.operators.Similarity
    // first compaction bootstraps the compacted table (and proves the
    // happy path still goes through under its own lease)
    val before = Similarity.queries("q124_index_compact")(spark, sf).collect()
    val cTbl = Similarity.indexTableName(sf, "mbasec")
    val loc = Published.tableLoc(spark, cTbl)
    // another JVM's compactor holds the table lease: simulate by taking
    // it from a DIFFERENT thread (per-thread re-entrancy must not let
    // this thread slip through)
    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => Published.withLease(loc, "other-compactor") {
      held.countDown(); release.await(20, TimeUnit.SECONDS); ()
    })
    holder.start()
    assert(held.await(10, TimeUnit.SECONDS))
    try intercept[Published.LeaseHeld] {
      Similarity.queries("q124_index_compact")(spark, sf).collect()
    } finally { release.countDown(); holder.join(10000) }
    // once the foreign compactor releases, compaction replays idempotently
    val after = Similarity.queries("q124_index_compact")(spark, sf).collect()
    assert(after.toSeq == before.toSeq, "compaction must replay identically after contention")
  }

  test("publish marker is stamped atomically (no .tmp remains, marker complete)") {
    import spark.implicits._
    val tbl = "pubspec_atomic_marker"
    val fp = "deadbeef"
    Published.write(spark, tbl, "k", 2, fp,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val loc = Published.tableLoc(spark, tbl)
    assert(!Files.exists(loc.resolve("_GRAFT_PUBLISHED.tmp")),
      "temp marker must have been moved, not left behind")
    val marker = new String(Files.readAllBytes(loc.resolve("_GRAFT_PUBLISHED")), "UTF-8")
    assert(marker.split("\n", 4).length == 4, s"marker complete: $marker")
    assert(Published.ensure(spark, tbl, "k", 2, fp))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }
}
