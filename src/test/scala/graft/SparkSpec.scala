package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs (getOrCreate → one JVM-wide session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = Session.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** Smallest scale factor — specs verify invariants, not performance. */
  val sf = "/root/testdata/sf0.001"

  private val hijackedConfKeys =
    scala.collection.mutable.Map[String, Option[String]]()

  /** Register a `fs.<scheme>.impl` (or any Hadoop conf key) on the shared
    * session, recording the prior value the FIRST time a suite touches the
    * key; [[afterAll]] restores every hijacked key so a scheme hijack
    * cannot leak into later suites sharing the session JVM (r14 ADVICE).
    * Note the Hadoop FileSystem CACHE still holds instances created while
    * the hijack was live — suites use unique authorities/paths per test,
    * so a cached sim instance is unreachable once the conf is restored. */
  def registerSchemeImpl(key: String, cls: Class[_]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (!hijackedConfKeys.contains(key))
      hijackedConfKeys(key) = Option(conf.get(key))
    conf.set(key, cls.getName)
  }

  override protected def afterAll(): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    hijackedConfKeys.foreach { case (k, prev) =>
      prev.fold(conf.unset(k))(conf.set(k, _)) }
    hijackedConfKeys.clear()
    super.afterAll()
  }
}
