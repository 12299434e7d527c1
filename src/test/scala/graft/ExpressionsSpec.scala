package graft

import org.apache.spark.sql.functions._
import graft.expressions.DotProduct

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6)),
    (Array.fill(64)(0.25), Array.fill(64)(-0.5)))

  test("graft_dot matches the higher-order-function formula bit-for-bit") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        "native and HOF accumulation must be bit-identical for oracle parity")
    }
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = DotProduct(
      Literal.create(Array(1.5, 2.5), ArrayType(DoubleType)),
      Literal.create(Array(2.0, 4.0), ArrayType(DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(interpreted == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("graft_h60 equals the conv(substring(md5)) form on real corpus tokens") {
    val d = graft.sources.Tables.documents(spark, sf).limit(200)
    val mismatches = d
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(
        graft.functions.Text.h60(col("tok")).as("native"),
        graft.functions.Text.h60Legacy(col("tok")).as("legacy"))
      .filter(col("native") =!= col("legacy"))
      .count()
    assert(mismatches == 0)
  }

  test("graft_simhash64_bytes equals the hex-path column pipeline on the real corpus") {
    val native = graft.operators.Multimodal.q119NativeSigs(spark, sf)
    val hexPath = graft.operators.Multimodal.q119HexSigs(spark, sf)
    val mismatches = native.as("n")
      .join(hexPath.as("h"), Seq("doc_id"))
      .filter(col("n.sh") =!= col("h.sh"))
      .count()
    assert(mismatches == 0,
      "native byte kernel and hex column pipeline must be bit-identical " +
        "for the q119 oracle to stay valid")
  }

  test("graft_simhash64_bytes edge shingles: empty and <8-byte payloads") {
    // under 8 bytes the hex path's single shingle is the WHOLE shorter
    // hex string (greatest(len-15, 1)); empty payload shingles "" / "#2"
    val payloads = Seq("", "a", "1234567", "12345678", "123456789")
      .map(s => Tuple1(s.getBytes("UTF-8")))
    val df = payloads.toDF("b")
    val hx = hex(col("b"))
    val shingles = transform(
      sequence(lit(1), greatest(length(hx) - 15, lit(1)), lit(2)),
      i => hx.substr(i, lit(16)))
    val mismatches = df.select(
      call_function("graft_simhash64_bytes", col("b")).as("native"),
      call_function("graft_simhash64",
        transform(shingles, s => graft.functions.Text.h60(s)),
        transform(shingles, s =>
          graft.functions.Text.h60(concat(s, lit("#2"))))).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("graft_bigram_distinct equals the HOF bigram-string form on real docs") {
    val d = graft.sources.Tables.documents(spark, sf).limit(300)
    val t = split(col("text"), " ")
    val mismatches = d
      .select(
        call_function("graft_bigram_distinct", t).as("native"),
        graft.functions.Text.bigramDistinctReference(t).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("graft_bigram_distinct edge cases: empty, single, repeated tokens") {
    val rows = Seq("", "one", "a b", "a b a b a b", "x x x").toDF("text")
      .select(call_function("graft_bigram_distinct", split(col("text"), " ")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // "" splits to [""] -> 0; "one" -> 0; "a b" -> 1;
    // "a b a b a b" -> {"a b","b a"} = 2; "x x x" -> {"x x"} = 1
    assert(rows == Seq(0, 0, 1, 2, 1))
  }

  test("float arrays implicitly cast to double (embeddings column works raw)") {
    val d = graft.sources.Tables.embeddings(spark, sf).limit(3)
    val out = d.select(call_function("graft_dot", col("embedding"), col("embedding")).as("n2"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) > 0.0))
  }

  test("graft_zorder equals the per-bit fold reference on exhaustive small + random wide inputs") {
    import org.apache.spark.sql.functions._
    def fold(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, b) =>
        acc + (((x >> b) & 1L) << (2 * b)) + (((y >> b) & 1L) << (2 * b + 1))
      }
    val rnd = new scala.util.Random(42)
    val cases = (for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((65535L, 65535L), (0L, 0L), (65536L + 7L, 3L)) // mask truncation
    import spark.implicits._
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), call_function("graft_zorder", col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == fold(x, y), s"morton($x, $y)")
    }
    // interleave is a bijection on 16-bit pairs: no collisions among
    // IN-RANGE pairs (the deliberate truncation case collides with its
    // masked twin by design, so it is excluded from the count)
    val inRange = cases.distinct.filter(c => c._1 <= 65535 && c._2 <= 65535)
    val inRangeCodes = inRange.map { case (x, y) => fold(x, y) }.distinct
    assert(inRangeCodes.size == inRange.size, "distinct pairs -> distinct codes")
  }

}
