package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The events `ts` column has shipped as TIMESTAMP(NANOS) (read as
  * epoch-nanos LONG under the legacy flag) and as TIMESTAMP(MICROS, NTZ)
  * across testdata drops; [[Tables.normalizeTs]] must map either to the
  * same session-zone TimestampType instant.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTs maps epoch-nanos longs and NTZ micros to the same " +
      "TimestampType instant") {
    val fromNanos = Tables.normalizeTs(
      Seq(1704067207179575000L).toDF("ts"))
    val fromNtz = Tables.normalizeTs(
      Seq("2024-01-01 00:00:07.179575").toDF("s")
        .select(col("s").cast(TimestampNTZType).as("ts")))
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    val Array(a) = fromNanos.collect()
    val Array(b) = fromNtz.collect()
    assert(a.getTimestamp(0) == b.getTimestamp(0),
      s"nanos path ${a.getTimestamp(0)} != ntz path ${b.getTimestamp(0)}")
  }

  test("normalizeTs leaves an already-TimestampType column untouched") {
    val df = Seq("2024-01-01 00:00:07.179575").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.collect().head.getTimestamp(0) ==
      df.collect().head.getTimestamp(0))
  }
}
