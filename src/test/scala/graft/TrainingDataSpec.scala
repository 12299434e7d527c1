package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingData

class TrainingDataSpec extends SparkSpec {

  test("q54 split accounting: train+val+test = sampled <= docs, targets honored") {
    val rows = TrainingData.queries("q54_stratified_sample")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, sampled) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))
      assert(sampled <= n)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") + r.getAs[Long]("n_test") == sampled)
    }
  }

  test("hash sampling is subset-stable: membership unchanged as the corpus grows") {
    // the frozen-eval-set property: a doc's sample/split decision is a pure
    // function of its id, so evaluating it on a 10% slice of the corpus
    // must agree with the full-corpus run doc-by-doc
    val d = graft.sources.Tables.documents(spark, sf)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          pmod(graft.functions.Text.h60(concat(lit("smp:"), col("doc_id").cast("string"))), lit(100L)).as("sb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = buckets(d)
    val slice = buckets(d.filter(col("doc_id") % 10 === 3))
    assert(slice.nonEmpty)
    slice.foreach { case (id, b) => assert(full(id) == b) }
  }

  test("q55 chunking conserves tokens and respects the window") {
    val chunks = TrainingData.queries("q55_chunking")(spark, sf)
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("total"), max(col("n_tokens")).as("mx"),
        count(lit(1)).as("n_chunks"))
    val truth = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val joined = perDoc.join(truth, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("total") == r.getAs[Int]("n_tok"), "token conservation")
      assert(r.getAs[Int]("mx") <= 32)
      assert(r.getAs[Long]("n_chunks") == (r.getAs[Int]("n_tok") + 31) / 32)
    }
  }
}
