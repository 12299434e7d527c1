package graft

import org.apache.spark.sql.functions._
import graft.operators.Geo
import graft.sources.Tables

class GeoSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala containment mirror (lowest-id tie-break), the spec oracle. */
  private def expectedRegion(lon: Double, lat: Double): String =
    Geo.usaCatalog.sortBy(_.id).find(r =>
      lon >= math.min(r.east, r.west) && lon <= math.max(r.east, r.west) &&
        lat >= r.south && lat <= r.north).map(_.id).getOrElse("NONE")

  test("shared USA0/USA1 boundary resolves to lowest region id") {
    val df = Seq((-96.5795, 30.0)).toDF("lon", "lat")
      .select(Geo.regionIdFor(Geo.usaCatalog, col("lon"), col("lat")).as("r"))
    assert(df.head().getString(0) == "USA0")
  }

  test("point outside every box maps to NONE") {
    val df = Seq((0.0, 0.0), (-130.0, 24.0)).toDF("lon", "lat")
      .select(Geo.regionIdFor(Geo.usaCatalog, col("lon"), col("lat")).as("r"))
    assert(df.collect().map(_.getString(0)).forall(_ == "NONE"))
  }

  test("region assignment matches pure-Scala containment on 400 seeded points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(400)((rnd.between(-130.0, -60.0), rnd.between(20.0, 55.0)))
    val got = pts.toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        Geo.regionIdFor(Geo.usaCatalog, col("lon"), col("lat")).as("r"))
      .collect()
    got.foreach { row =>
      assert(row.getString(2) == expectedRegion(row.getDouble(0), row.getDouble(1)),
        s"at (${row.getDouble(0)}, ${row.getDouble(1)})")
    }
  }

  test("q19 per-region counts conserve the event total") {
    val total = Tables.events(spark, sf).count()
    val counted = Geo.q19GeoAssign(spark, sf)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(counted == total)
  }

  test("q20 envelope: topic is raw-tweets-<region> and NONE rows are dropped") {
    val rows = Geo.q20Envelope(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val region = r.getAs[String]("region")
      assert(region == "USA0" || region == "USA1")
      assert(r.getAs[String]("topic") == s"raw-tweets-$region")
    }
  }

  test("join-based assignment (large-catalog form) equals the when-chain") {
    val events = Tables.events(spark, sf)
    val viaChain = Geo.assignRegion(spark, events)
      .select(col("event_id"), col("region"))
    val viaJoin = Geo.assignRegionViaJoin(spark, events, Geo.regions(spark))
      .select(col("event_id"), col("region"))
    assert(viaChain.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaChain).isEmpty)
  }

  test("locations.json-format catalog loads with the east/west quirk intact") {
    val tmp = java.nio.file.Files.createTempFile("locations", ".json")
    val json =
      """[{"name":"United States","ID":"USA0","centerLat":30.84,"centerLon":-111.07,
        |"north":49.31,"east":-125.56,"south":24.68,"west":-96.57}]""".stripMargin
    java.nio.file.Files.writeString(tmp, json)
    val cat = Geo.loadCatalog(spark, tmp.toString).collect()
    assert(cat.length == 1)
    val r = cat.head
    assert(r.getAs[String]("id") == "USA0")
    // east holds the SMALLER longitude — preserved, not "fixed"
    assert(r.getAs[Double]("east") < r.getAs[Double]("west"))
  }
}
