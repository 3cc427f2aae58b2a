package graft.plans

import graft.SparkSpec
import graft.functions.DotProduct
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

class FuseDotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, 0.5f), Array(2.0f, 2.0f))
  ).toDF("id", "a", "b")

  private def builtinDot = vecs.select(col("id"),
    Similarity.dot(col("a"), col("b")).as("dot"))

  test("rule rewrites aggregate(zip_with(*)) to native DotProduct") {
    val analyzed = builtinDot.queryExecution.analyzed
    val rewritten = FuseDotProduct(analyzed)
    val fusedCount = rewritten.expressions
      .map(_.collect { case _: DotProduct => 1 }.sum).sum
    assert(fusedCount == 1, s"expected one fused DotProduct in:\n$rewritten")

    val expect = builtinDot.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Bridge.ofRows(spark, rewritten).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect)
    assert(got(1L) == 32.0 && got(2L) == 2.0)
  }

  test("fused semantics match builtin on length mismatch and null element") {
    val tricky = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](3.0f)),                  // length mismatch
      (2L, Array[java.lang.Float](1.0f, null),
        Array[java.lang.Float](3.0f, 4.0f)),            // null element
      (3L, Array[java.lang.Float](2.0f, 3.0f),
        Array[java.lang.Float](4.0f, 5.0f))             // clean
    ).toDF("id", "a", "b")
    val b = tricky.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getDouble(1))).toMap
    val f = tricky.select(col("id"),
        DotProduct(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getDouble(1))).toMap
    assert(b == f)
    assert(b(1L) == null && b(2L) == null && b(3L) == 23.0)
  }

  test("extension registration fuses automatically in the optimizer") {
    // same SparkContext, fresh session state with the extensions installed
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      // parquet-backed so ConvertToLocalRelation can't fold the input away
      val p = java.nio.file.Files.createTempDirectory("fuse").toString + "/v"
      Seq((1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
        .toDF("id", "a", "b").write.parquet(p)
      val df = s2.read.parquet(p)
        .select(Similarity.dot(col("a"), col("b")).as("dot"))
      val fused = df.queryExecution.optimizedPlan.expressions
        .map(_.collect { case _: DotProduct => 1 }.sum).sum
      assert(fused == 1,
        s"optimizer should fuse:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect()(0).getDouble(0) == 11.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
