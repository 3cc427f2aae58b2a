package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

/** Proves the JDBC sink (S5/S7, challenge.py:305-325) actually round-trips:
  * append-mode write into an in-process embedded Derby database (the same
  * `DataFrameWriter.jdbc` path a Postgres URL would take — Spark picks the
  * dialect from the URL) and read-back of counts/values. Two writes verify
  * append semantics (`to_sql(if_exists='append')`), matching the reference's
  * chunked append loop.
  */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC sink: append-mode write + read-back (embedded Derby)") {
    val url = "jdbc:derby:memory:graftload;create=true"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")

    Load.jdbc(df, url, "movies_rt", "", "", numPartitions = 2)
    // second write must append, not replace
    Load.jdbc(df, url, "movies_rt", "", "", numPartitions = 2)

    val back = spark.read.jdbc(url, "movies_rt", new java.util.Properties())
    assert(back.count() == 6)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("id", "name", "score"))
    assert(back.agg(sum("id")).collect().head.getLong(0) == 12L)
    // Derby maps StringType → CLOB, which rejects pushed-down string
    // equality — filter on the numeric key instead
    assert(back.filter($"id" === 2L).agg(sum("score"))
      .collect().head.getDouble(0) == 5.0)
  }

  // the reference's rerun protocol is DELETE FROM each table, then the
  // append load (challenge.py:19-30) — jdbcReplace is that as one call.
  // Only Derby is embeddable in this sandbox (no H2/HSQLDB jar ships with
  // Spark and the build is offline); truncate-mode overwrite takes the
  // same dialect-generic DataFrameWriter path a Postgres URL would.
  test("JDBC replace: truncate-mode overwrite resets table contents") {
    val url = "jdbc:derby:memory:graftreplace;create=true"
    val df = Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).toDF("id", "score")
    Load.jdbc(df, url, "movies_rt", "", "", numPartitions = 2)
    Load.jdbc(df, url, "movies_rt", "", "", numPartitions = 2)
    val props = new java.util.Properties()
    assert(spark.read.jdbc(url, "movies_rt", props).count() == 6)
    // truncate path: table survives, stale rows do not
    Load.jdbcReplace(df, url, "movies_rt", "", "", numPartitions = 2)
    val afterTrunc = spark.read.jdbc(url, "movies_rt", props)
    assert(afterTrunc.count() == 3)
    assert(afterTrunc.agg(sum("id")).collect().head.getLong(0) == 6L)
    // drop-and-recreate path: same observable contents
    Load.jdbcReplace(df, url, "movies_rt", "", "", numPartitions = 2,
      truncate = false)
    assert(spark.read.jdbc(url, "movies_rt", props).count() == 3)
    // and a subsequent append still appends onto the replaced table
    Load.jdbc(df, url, "movies_rt", "", "", numPartitions = 2)
    assert(spark.read.jdbc(url, "movies_rt", props).count() == 6)
  }

  test("partitioned parquet write prunes partitions on read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq(
      ("click", 1L, 0.5), ("click", 2L, 1.5),
      ("view", 3L, 2.5), ("purchase", 4L, 3.5)
    ).toDF("event_type", "event_id", "value")
    Load.partitionedParquet(df, dir, Seq("event_type"), Seq("event_id"))

    val layout = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(Set("event_type=click", "event_type=view",
      "event_type=purchase").subsetOf(layout), layout.toString)

    val filtered = spark.read.parquet(dir)
      .filter($"event_type" === "click")
    assert(filtered.count() == 2)
    // the equality filter must resolve as directory pruning, not data scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"), plan.take(1500))
  }
}
