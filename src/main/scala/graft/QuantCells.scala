package graft

import org.apache.spark.sql.functions._

/** Quantizer cell-size evidence for the PLANS.md scale sweeps: prints
  * the per-cell population distribution of the single-level k ∝ N
  * quantizer (q108 — capped at `ivfMaxCentroids`, so cells fatten ∝ N
  * past ~205k vectors) and the two-level quantizer (q112 — final cells
  * track `hierSubCellSize` at any N) on the same corpus. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_emb128 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.QuantCells"
  */
object QuantCells {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    def stats(label: String, cells: org.apache.spark.sql.DataFrame): Unit = {
      val r = cells.agg(count(lit(1)).as("k"), avg(col("n")).as("mean"),
        expr("percentile(n, 0.95)").as("p95"), max(col("n")).as("mx"))
        .collect()(0)
      println(f"QUANTCELLS $label%-8s N=$n%-8d cells=${r.getLong(0)}%-7d " +
        f"mean=${r.getDouble(1)}%8.2f p95=${r.getDouble(2)}%8.1f max=${r.getLong(3)}%6d")
    }
    stats("coarse", operators.Similarity.scaledCellSizes(spark, sfDir))
    stats("hier", operators.Similarity.hierCellSizes(spark, sfDir))
    spark.stop()
  }
}
