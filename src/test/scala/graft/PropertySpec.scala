package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Geo, Skew}

/** Property-based invariants (SURVEY §5 item 4), ScalaCheck generators
  * driving batched checks: each property collects its generated cases
  * into ONE DataFrame job — per-case Spark jobs would be unusably slow. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = Session.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  import spark.implicits._

  private def scalaRegion(lon: Double, lat: Double): String =
    Geo.usaCatalog.sortBy(_.id).find(r =>
      lon >= math.min(r.east, r.west) && lon <= math.max(r.east, r.west) &&
        lat >= r.south && lat <= r.north).map(_.id).getOrElse("NONE")

  test("property: engine region assignment == pure containment for arbitrary points") {
    val pts = Gen.listOfN(300, Gen.zip(
      Gen.chooseNum(-180.0, 180.0), Gen.chooseNum(-90.0, 90.0))).sample.get
    val rows = pts.toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        Geo.regionIdFor(Geo.usaCatalog, col("lon"), col("lat")).as("r"))
      .collect()
    rows.foreach { row =>
      assert(row.getString(2) == scalaRegion(row.getDouble(0), row.getDouble(1)))
    }
  }

  test("property: to_json . from_json is identity on envelope structs") {
    val gen = Gen.listOfN(100, Gen.zip(
      Gen.alphaNumStr.map(_.take(12)), Gen.oneOf("USA0", "USA1"),
      Gen.alphaNumStr.map(_.take(30))))
    val rows = gen.sample.get.toDF("id", "region", "text")
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("region", StringType),
      StructField("text", StringType)))
    val roundTripped = rows
      .select(from_json(to_json(struct(col("id"), col("region"), col("text"))),
        schema).as("s"))
      .select(col("s.id"), col("s.region"), col("s.text"))
    assert(roundTripped.collect().toSeq.map(_.toSeq) ==
      rows.collect().toSeq.map(_.toSeq))
  }

  test("property: dropDuplicates is idempotent and keeps one row per key") {
    val gen = Gen.listOfN(400, Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0, 9)))
    val df = gen.sample.get.toDF("k", "v")
    val once = df.dropDuplicates("k")
    val twice = once.dropDuplicates("k")
    assert(once.count() == twice.count())
    assert(once.count() == df.select("k").distinct().count())
  }

  test("property: tumbling window counts always conserve the row total") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val gen = Gen.listOfN(500, Gen.chooseNum(0L, 600000L))
    val df = gen.sample.get.map(off => new java.sql.Timestamp(base + off))
      .toDF("ts")
    val windowed = df.groupBy(window(col("ts"), "30 seconds")).count()
    assert(windowed.agg(sum(col("count"))).head().getLong(0) == 500L)
  }

  test("property: salted join equals the plain join on skewed keys") {
    // heavily skewed: 90% of rows share one key — the USA0/USA1 shape
    val gen = Gen.listOfN(500, Gen.frequency(
      9 -> Gen.const("HOT"), 1 -> Gen.oneOf("a", "b", "c")))
    val big = gen.sample.get.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "id")
    val small = Seq(("HOT", 1), ("a", 2), ("b", 3), ("c", 4), ("unused", 5))
      .toDF("k2", "payload")
    val plain = big.join(small, col("k") === col("k2"))
      .select(col("id"), col("payload")).collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, "k", "k2", col("id"), salts = 8)
      .select(col("id"), col("payload")).collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("q86 skyline equals the brute-force dominance recompute") {
    val sf = "/root/testdata/sf0.001"
    val per = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").as("ok"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("price_c"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: keep (ok, p, q) iff no other row dominates it, where
    // dominate = (cheaper-or-equal and more qty) or (cheaper and >= qty)
    // and equal-(p,q) ties keep only the lowest ok
    val expected = per.filter { case (ok, p, q) =>
      !per.exists { case (ok2, p2, q2) =>
        (p2 <= p && q2 > q) || (p2 < p && q2 >= q) ||
          (p2 == p && q2 == q && ok2 < ok)
      }
    }.map(t => (t._2, t._3)).toSet
    val got = graft.operators.Relational.q86Skyline(spark, sf)
      .collect().map(r => (r.getAs[Long]("price_c"), r.getAs[Long]("qty"))).toSet
    assert(got == expected, s"frontier mismatch: extra=${got -- expected} missing=${expected -- got}")
  }

}
