package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-table readers (TESTDATA.md). One parquet file per table under the
  * sf directory. All reads go through here so scan options stay uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Decouple downstream parallelism from input split count for
    * compute-bound stages: the harness tables are single-row-group parquet
    * (one scan task), so hash/regex/vector-heavy work after a skinny scan
    * would otherwise run on one core. No-op when the scan already yields
    * enough partitions (the real many-file case at cluster scale).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles is pure file-index metadata — unlike df.rdd, it forces no
    // plan-to-RDD conversion. At cluster scale (files ≥ cores) the scan
    // already parallelizes and this is a no-op; the single-file harness
    // tables get an explicit spread.
    if (df.inputFiles.length >= target) df else df.repartition(target)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.ts` has shipped in two physical forms across testdata drops:
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
    * ([PARQUET_TYPE_ILLEGAL]), so the legacy flag reads it as epoch-nanos
    * LONG — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    * TIMESTAMP_NTZ. Either way the engine presents one schema downstream:
    * a micros session-zone TimestampType. ns→µs `div 1000` truncates
    * exactly like DuckDB's formatting, and the NTZ cast under the UTC
    * session zone is a pure reinterpretation — oracle parity holds in both
    * regimes.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case LongType => df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
