package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registration of the native functions, two ways:
  *
  *   - [[register]] — runtime, on an existing session (what the harness
  *     entry points use);
  *   - [[GraftExtensions]] — builder-time `SparkSessionExtensions`
  *     injection (`.withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.functions.GraftExtensions`), the
  *     mechanism a deployment would configure cluster-wide.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => MinHashSigs(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    registry.createOrReplaceTempFunction(
      "gram_hashes",
      exprs => GramHashes(exprs.head,
        org.apache.spark.sql.catalyst.expressions.Literal(42L),
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        distinct = false),
      "built-in")
    registry.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => HeavyHitters(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())
        .toAggregateExpression(),
      "built-in")
    registry.createOrReplaceTempFunction(
      "bounded_collect",
      exprs => BoundedCollect(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())
        .toAggregateExpression(),
      "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSigs(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramHashes(exprs.head,
          org.apache.spark.sql.catalyst.expressions.Literal(42L),
          exprs(1).eval(null).asInstanceOf[Number].intValue(),
          distinct = false)))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HeavyHitters(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect"),
      new ExpressionInfo(classOf[BoundedCollect].getName, "bounded_collect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BoundedCollect(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())
          .toAggregateExpression()))
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }
}
