package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew mitigation for hot join keys (SURVEY §7.2 step 7: the USA0/USA1
  * two-box split means half the continent lands on each region key — the
  * exact skew this engine's catalog guarantees at scale).
  *
  * AQE's skew-join splits oversized partitions after a shuffle
  * materializes; salting prevents the oversized partition from existing:
  * the big side spreads each hot key across `salts` sub-keys, the small
  * side is replicated `salts`×, and the join runs on (key, salt). Use for
  * shuffle joins where one side is modest (replication cost = |small| ×
  * salts) and AQE alone can't keep up — e.g. a hot-key fact⋈mid-size-dim.
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `bigKey = smallKey`, salted.
    * The salt on the big side is derived from `saltSource` (any column
    * that varies within a key group — an id, a timestamp) so the spread
    * is deterministic, not `rand()`: identical inputs give identical
    * partitioning, which keeps retries and the DuckDB oracle stable. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 saltSource: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** q51: the salted join, driver-gated against the PLAIN join's SQL —
    * salting spreads each hot key over (key, salt) sub-partitions and
    * must never change the answer. lineitem⋈supplier on suppkey, rolled
    * up per nation so the oracle compare is exact. */
  def q51SaltedJoin(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      "l_suppkey", "s_suppkey", saltSource = col("l_orderkey"), salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_nationkey"))

  val q51Sql: String =
    """SELECT s_nationkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_salted_join" -> q51SaltedJoin _,
  )

  val oracle: Map[String, String] = Map(
    "q51_salted_join" -> q51Sql,
  )
}
