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

  test("streaming count-min cells are bit-equal to the batch sketch") {
    val streamed = StreamingOps.streamCountMin(
      spark, eventsDir, "user_id", 4, 32, "cms_test")
    val batch = graft.functions.CountMin.sketch(
      Tables.events(spark, sfDir).select(col("user_id")), "user_id", 4, 32)
    val s = streamed.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = batch.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s == b, s"streamed cells must equal batch: ${s.size}/${b.size}")
    assert(b.nonEmpty && b.values.sum == 4 * 1000,
      "4 rows x 1000 events of cell mass")
  }

  test("mapGroupsWithState totals accumulate across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingOps.UserEvent
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamingOps.runningUserTotals(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("totals_test").start()

    in.addData(UserEvent(1L, t("2024-01-01 10:00:00"), 2.0),
      UserEvent(1L, t("2024-01-01 10:05:00"), 3.0))
    q.processAllAvailable()
    val afterB1 = spark.sql(
      "SELECT n_events, total_value FROM totals_test WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(afterB1 == Set((2L, 5.0)))

    in.addData(UserEvent(1L, t("2024-01-01 10:10:00"), 10.0),
      UserEvent(2L, t("2024-01-01 11:00:00"), 7.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, n_events, total_value FROM totals_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    q.stop()
    // update mode re-emits user 1 with state folded across both batches
    assert(rows.contains((1L, 3L, 15.0)))
    assert(rows.contains((2L, 1L, 7.0)))
  }

  test("flatMapGroupsWithState sessions close on gap and on watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingOps.UserTick
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserTick]
    val q = StreamingOps.statefulSessionize(
        in.toDS().withWatermark("ts", "0 seconds").as[UserTick],
        "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_test").start()
    def sessions() = spark.sql(
      "SELECT user_id, session_start, n_events FROM sessions_test")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString.stripSuffix(".0"), r.getLong(2))).toSet

    // batch 1: two events inside one session
    in.addData(UserTick(1L, t("2024-01-01 10:00:00")),
      UserTick(1L, t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    assert(sessions().isEmpty)          // session still open

    // batch 2: event past the gap closes the first session inline
    in.addData(UserTick(1L, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    assert(sessions() == Set((1L, "2024-01-01 10:00:00", 2L)))

    // batch 3+: watermark passes 11:00+gap → idle session times out
    in.addData(UserTick(2L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    in.addData(UserTick(2L, t("2024-01-01 12:01:00")))
    q.processAllAvailable()
    q.stop()
    assert(sessions().contains((1L, "2024-01-01 11:00:00", 1L)),
      s"watermark-driven timeout should close user 1: ${sessions()}")
  }

  test("watermarked stream-stream interval join matches within lookback") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingOps.UserEvent
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val views = MemoryStream[UserEvent]
    val joined = StreamingOps.intervalJoin(
        clicks.toDS().toDF().withWatermark("ts", "0 seconds"),
        views.toDS().toDF().withWatermark("ts", "0 seconds"),
        "user_id", "ts", "10 minutes")
      .select(col("user_id"), col("value").as("click_v"),
        col("r_value").as("view_v"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_test").start()

    views.addData(UserEvent(1L, t("2024-01-01 10:00:00"), 100.0))
    clicks.addData(
      UserEvent(1L, t("2024-01-01 10:05:00"), 1.0),   // within 10 min
      UserEvent(1L, t("2024-01-01 10:20:00"), 2.0),   // view too old
      UserEvent(2L, t("2024-01-01 10:05:00"), 3.0))   // other user
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, click_v, view_v FROM ssjoin_test")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    q.stop()
    assert(rows == Set((1L, 1.0, 100.0)),
      s"only the in-window same-user pair should join: $rows")
  }

  test("streamDecontaminate fails loudly when even the Bloom form " +
      "exceeds its size gate") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    val docsDir = java.nio.file.Files
      .createTempDirectory("sdecon_gate").toString + "/docs"
    docs.write.parquet(docsDir)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.streamDecontaminate(spark, docsDir, docs,
        "doc_id", "text", 3, "sdecon_gate_test", maxGrams = 1L,
        maxBloomBytes = 1L)
    }
    assert(e.getMessage.contains("maxBloomBytes"),
      s"gate should name the cap: ${e.getMessage}")
  }

  test("streamDecontaminate past maxGrams degrades to the Bloom gate " +
      "with no false negatives") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val bench = docs.limit(8)
    val docsDir = java.nio.file.Files
      .createTempDirectory("sdecon_bloom").toString + "/docs"
    docs.write.parquet(docsDir)
    // exact batch pass over the same inputs = ground truth
    val exact = StreamingOps.streamDecontaminate(spark, docsDir, bench,
      "doc_id", "text", 3, "sdecon_exact_ref")
      .collect().map(_.getLong(0)).toSet
    // force the Bloom branch (maxGrams=1) with a roomy byte cap
    val bloom = StreamingOps.streamDecontaminate(spark, docsDir, bench,
      "doc_id", "text", 3, "sdecon_bloom_test", maxGrams = 1L)
      .collect().map(_.getLong(0)).toSet
    // Bloom keeps a SUBSET of the exact survivors: false positives may
    // over-drop clean docs, but every contaminated doc the exact pass
    // drops must be gone here too (no false negatives)
    assert(bloom.subsetOf(exact),
      s"bloom kept docs the exact gate dropped: ${bloom -- exact}")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = all -- exact
    assert((bloom & contaminated).isEmpty,
      s"contaminated docs survived the Bloom gate: ${bloom & contaminated}")
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
