package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed by the join key
  * into the same bucket count join WITHOUT a shuffle — the scale story for
  * repeated fact-fact joins (pay the partitioning once at write time).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "a")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_left")
    (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "b")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_right")

    val joined = spark.table("bkt_left")
      .join(spark.table("bkt_right").hint("merge"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000)

    // contrast: the same join on unbucketed data does shuffle
    val l = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "a")
    val r = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "b")
    val shuffled = l.join(r.hint("merge"), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(shuffled.contains("Exchange"))
  }
}
