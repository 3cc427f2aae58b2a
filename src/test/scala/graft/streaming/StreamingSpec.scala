package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** True Structured Streaming checks: the streaming windowed agg over the
  * events file source must converge to the batch answer, and the chunked
  * foreachBatch load (S6 analogue) must land every row.
  */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Stage an events-only landing directory (the file stream source tails a
    * directory; the harness keeps all tables in one dir).
    */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming hourly agg converges to the batch result") {
    val q = StreamingOps.streamingHourlyAgg(spark, eventsDir, "hourly_test")
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT * FROM hourly_test ORDER BY window_start, event_type")
      .collect().toSeq
    val batch = StreamingOps.hourlyAgg(Tables.events(spark, sfDir))
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(streamed == batch)
  }

  test("chunked incremental load lands all rows in the sink") {
    val out = java.nio.file.Files
      .createTempDirectory("chunked").toString + "/events_out"
    val q = StreamingOps.chunkedLoad(spark, eventsDir, out)
    q.awaitTermination(120000)
    val n = spark.read.parquet(out).count()
    val exp = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(n == exp)
  }
}
