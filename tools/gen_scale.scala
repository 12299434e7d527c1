// Scale-corpus generator for the PLANS.md "Round 6" sweep — run with:
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.ui.enabled=false -I tools/gen_scale.scala
// then bench a subset against the output dirs:
//   SPARK_GRAFT_BENCH_FILTER="q73,q90,q87,q75,q101,q56,q95,q86" \
//   SPARK_GRAFT_SF_DIR=/tmp/graft_sf05 SPARK_GRAFT_CPUS=32 \
//   sbt -batch "runMain graft.Bench"
//
// SHARD REPLICATION: R disjoint key-space replicas of sf0.1, so per-shard
// density (dup rates, graph degree, vocab ratios, cluster sizes) stays
// CONSTANT while volume grows R-fold — the controlled experiment for
// ENGINE scaling. A naive R-fold copy would square planted dup-group pair
// counts inside every LSH bucket (R^2 growth the real corpus family does
// not have) and falsify the sweep with a data artifact. Replica texts are
// token-suffixed (disjoint vocab, no cross-replica near-dups), customer
// names suffixed (disjoint deletion neighborhoods), event user/event ids
// offset (disjoint streaming key universes).
//
// EMBEDDING JITTER (round 7): replicas r>0 get a deterministic per-element
// nudge of +/-5e-3 (hash(vec_id, dim, r) — ~5% of the mean |element|, tiny
// vs cluster structure). Round 6 kept the point cloud EXACTLY duplicated,
// which collapses a k-proportional-to-N trained quantizer: every replica
// of a seed is the same point, so Lloyd can't separate replicas into
// distinct cells and the scaled-k sweep point (q108) would be measuring a
// degenerate geometry no real corpus has. Jittered replicas stay
// near-duplicates (cos ~ 0.9999 — q99/q108 still count them as semantic
// dups) but are distinct points a bigger quantizer CAN split.
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"

def gen(out: String, reps: Int): Unit = {
  def acr(df: org.apache.spark.sql.DataFrame)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) =
    (0 until reps).map(r => f(df, r)).reduce(_ union _)

  val docs = spark.read.parquet(s"$src/documents.parquet")
  acr(docs) { (d, r) =>
    if (r == 0) d
    else d.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
      array_join(transform(split(col("text"), " "), t => concat(t, lit("_r" + r))), " ").as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.repartition(16).write.mode("overwrite").parquet(s"$out/documents.parquet")

  val emb = spark.read.parquet(s"$src/embeddings.parquet")
  acr(emb) { (e, r) =>
    if (r == 0) e
    else e.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1001)) - 500).cast("double") * 1e-5)
          .cast("float")).as("embedding"),
      col("label"))
  }.repartition(16).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

  val li = spark.read.parquet(s"$src/lineitem.parquet")
  acr(li) { (d, r) =>
    d.select((col("l_orderkey") + lit(r * 100000000L)).as("l_orderkey"),
      (col("l_partkey") + lit(r * 10000000L)).as("l_partkey"),
      (col("l_suppkey") + lit(r * 10000000L)).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"))
  }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

  val ord = spark.read.parquet(s"$src/orders.parquet")
  acr(ord) { (d, r) =>
    d.select((col("o_orderkey") + lit(r * 100000000L)).as("o_orderkey"),
      (col("o_custkey") + lit(r * 10000000L)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))
  }.repartition(16).write.mode("overwrite").parquet(s"$out/orders.parquet")

  val cust = spark.read.parquet(s"$src/customer.parquet")
  acr(cust) { (d, r) =>
    if (r == 0) d
    else d.select(((col("c_custkey") + lit(r * 10000000L)).as("c_custkey") +:
      concat(col("c_name"), lit("#r" + r)).as("c_name") +:
      d.columns.filter(c => c != "c_custkey" && c != "c_name").map(col).toSeq): _*)
  }.repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")

  val ev = spark.read.parquet(s"$src/events.parquet")
  acr(ev) { (d, r) =>
    d.select((col("event_id") + lit(r * 10000000L)).as("event_id"), col("ts"),
      (col("user_id") + lit(r * 10000000L)).as("user_id"),
      col("event_type"), col("value"), col("props"))
  }.repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")

  println("GEN_DONE " + out + " " +
    Seq("documents", "embeddings", "lineitem", "orders", "customer", "events")
      .map(t => t + "=" + spark.read.parquet(s"$out/$t.parquet").count()).mkString(" "))
}

// Embeddings-only tier (round 8): for the two-level-quantizer scale
// point the OTHER tables are dead weight — only embeddings.parquet is
// read by q108/q112. R=128 -> 256k vectors, deliberately PAST the flat
// k-proportional-to-N ceiling (ivfMaxCentroids * targetCellSize = 205k):
// flat k wants ceil(256k/50) = 5120 > 4096, so its coarse cells leave
// the band, while q112's per-cell sub-split keeps final cells at ~10.
def genEmb(out: String, reps: Int): Unit = {
  val emb = spark.read.parquet(s"$src/embeddings.parquet")
  (0 until reps).map { r =>
    if (r == 0) emb
    else emb.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1001)) - 500).cast("double") * 1e-5)
          .cast("float")).as("embedding"),
      col("label"))
  }.reduce(_ union _)
    .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  println("GEN_DONE " + out + " embeddings=" +
    spark.read.parquet(s"$out/embeddings.parquet").count())
}

gen("/tmp/graft_sf05", 5)
gen("/tmp/graft_sf1", 10)
// 20x tier (round 7): one more point for the steepest sweep queries
// (q75 wedges / q73 pagerank / q87 fuzzy join) and the scaled-k q108 curve
gen("/tmp/graft_sf2", 20)
genEmb("/tmp/graft_emb128", 128)
