package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest right at-or-before left ts, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:30"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3")
    ).toDF("acct", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0),  // equal ts → inclusive
      (1L, ts("2024-01-01 10:00:40"), 102.0),  // after t2 → never matched
      (3L, ts("2024-01-01 09:00:00"), 999.0)   // other key
    ).toDF("acct", "ts", "quote")

    val got = Joins.asOfJoin(trades, quotes, "acct", "ts", Seq("quote"))
      .collect().map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(got("t1") == Some(100.0))
    assert(got("t2") == Some(101.0))   // backward-inclusive at equal ts
    assert(got("t3") == None)          // key 2 has no quotes
  }

  test("asOfJoinForward: earliest right at-or-after left ts, per key") {
    val imps = Seq(
      (1L, ts("2024-01-01 10:00:05"), "i1"),
      (1L, ts("2024-01-01 10:00:30"), "i2"),
      (2L, ts("2024-01-01 10:00:10"), "i3")
    ).toDF("acct", "ts", "imp")
    val convs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),   // before i1 → never matched
      (1L, ts("2024-01-01 10:00:30"), 101.0),  // equal ts → inclusive for i2
      (1L, ts("2024-01-01 10:00:10"), 100.0),  // first after i1
      (3L, ts("2024-01-01 11:00:00"), 999.0)   // other key
    ).toDF("acct", "ts", "conv")

    val got = Joins.asOfJoinForward(imps, convs, "acct", "ts", Seq("conv"))
      .collect().map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(got("i1") == Some(100.0))   // earliest at-or-after, not 101
    assert(got("i2") == Some(101.0))   // forward-inclusive at equal ts
    assert(got("i3") == None)          // key 2 has no conversions

    // tolerance caps the look-ahead
    val tight = Joins.asOfJoinForward(imps, convs, "acct", "ts",
        Seq("conv"), tolerance = Some("1 second"))
      .collect().map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(tight("i1") == None)        // 10:00:10 is > 1s after 10:00:05
    assert(tight("i2") == Some(101.0)) // equal ts within any tolerance
  }

  test("asOfJoin: tolerance nulls out stale matches") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("k", "ts", "v")
    val wide = Joins.asOfJoin(left, right, "k", "ts", Seq("v"),
      Some("3 hours")).collect()(0)
    val tight = Joins.asOfJoin(left, right, "k", "ts", Seq("v"),
      Some("30 minutes")).collect()(0)
    assert(wide.getDouble(4) == 5.0)
    assert(tight.isNullAt(4))
  }

  test("asOfJoin: equal-ts right duplicates resolve to greatest payload") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    val r = Joins.asOfJoin(left, right, "k", "ts", Seq("v")).collect()(0)
    assert(r.getDouble(4) == 9.0)
  }

  test("saltedJoin: identical rows to a plain join on a skewed key") {
    // one hot key (90% of rows) + tail
    val skewed = ((1 to 90).map(i => (7L, i.toDouble)) ++
      (1 to 10).map(i => (i.toLong, 0.5))).toDF("k", "v")
    val dim = Seq((7L, "hot"), (3L, "cold"), (99L, "absent"))
      .toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    val salted = Joins.saltedJoin(skewed, dim, "k", 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 92)  // 90 hot + tail key 7 (v=0.5) + key 3
  }

  test("rangeJoin: value lands in its [lo, hi) band") {
    val fact = Seq((1L, 3.0), (2L, 8.0), (3L, 15.9), (4L, 99.0))
      .toDF("id", "value")
    val bands = Seq(("low", 0.0, 8.0), ("mid", 8.0, 16.0),
      ("high", 16.0, 1e9)).toDF("band", "lo", "hi")
    val got = Joins.rangeJoin(fact, bands, "value", "lo", "hi")
      .select("id", "band").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "low", 2L -> "mid", 3L -> "mid", 4L -> "high"))
  }

  test("bucketedRangeJoin: equals rangeJoin incl. boundaries, hash join only") {
    // boundary values sit exactly on band edges (8.0 → mid, not low) and
    // on bucket edges for several widths; results must match the
    // nested-loop reference join bit-for-bit
    val fact = ((0 to 200).map(i => (i.toLong, i * 0.31)) ++
      Seq((900L, 8.0), (901L, 16.0), (902L, 0.0))).toDF("id", "value")
    val bands = Seq(("low", 0.0, 8.0), ("mid", 8.0, 16.0),
      ("high", 16.0, 64.0)).toDF("band", "lo", "hi")
    val ref = Joins.rangeJoin(fact, bands, "value", "lo", "hi")
      .select("id", "band").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    for (w <- Seq(0.1, 1.0, 7.0, 64.0)) {
      val bkt = Joins.bucketedRangeJoin(fact, bands, "value", "lo", "hi", w)
      val got = bkt.select("id", "band").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == ref, s"width $w diverges from rangeJoin")
    }
    val plan = Joins.bucketedRangeJoin(fact, bands, "value", "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("intervalOverlapJoin: equals brute force, one row per pair, " +
    "hash join only") {
    import spark.implicits._
    // spans from sub-bucket to many-bucket (width 10): exercises the
    // canonical-first-shared-bucket dedup on pairs sharing several cells
    val iv = Seq(
      (1L, 0L, 5L), (2L, 3L, 40L), (3L, 38L, 42L), (4L, 40L, 45L),
      (5L, 7L, 31L), (6L, 100L, 101L), (7L, 90L, 100L))
      .toDF("id", "lo", "hi")
    val a = iv.select(col("id").as("id_a"), col("lo").as("lo_a"),
      col("hi").as("hi_a"))
    val b = iv.select(col("id").as("id_b"), col("lo").as("lo_b"),
      col("hi").as("hi_b"))
    val got = Joins.intervalOverlapJoin(a, b,
        "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 10L)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no duplicates: 2-5 share buckets 0..3 yet must appear once
    assert(got.size == got.toSet.size, s"duplicated pairs: $got")
    val truth = (for {
      x <- iv.collect(); y <- iv.collect()
      if x.getLong(0) < y.getLong(0) &&
        x.getLong(1) < y.getLong(2) && y.getLong(1) < x.getLong(2)
    } yield (x.getLong(0), y.getLong(0))).toSet
    assert(got.toSet == truth, s"got ${got.toSet} want $truth")
    // half-open: [90,100) and [100,101) touch but do not overlap
    assert(!got.toSet.contains((6L, 7L)))
    val plan = Joins.intervalOverlapJoin(a, b,
        "lo_a", "hi_a", "lo_b", "hi_b", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }
}
