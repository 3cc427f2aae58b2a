package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // three groups with 1:4:16 natural proportions; the group pattern
  // repeats every 21 ids, so sequential ids are uniform modulo a
  // granularity that is a multiple of 21 and spans the id range (the
  // operators' documented precondition: ids uniform mod granularity)
  private lazy val docs = (0 until 2100).map { i =>
    val g = if (i % 21 < 1) "small" else if (i % 21 < 5) "mid" else "big"
    (i.toLong, g)
  }.toDF("doc_id", "lang")
  private val gran = 2100

  private def sizes(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("groupCap keeps at most cap rows per group, best score first") {
    val scored = (0 until 60).map { i =>
      (i.toLong, if (i < 40) "big" else "small", (i % 7).toDouble)
    }.toDF("doc_id", "src", "score")
    val kept = Sampling.groupCap(scored, "src", "doc_id", col("score"), 5)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("big") == 5 && bySrc("small") == 5, bySrc)
    // "big" holds scores 0..6 repeating: the 5 kept must all score >= 5
    val bigKept = kept.filter(col("src") === "big")
      .select("doc_id", "score").collect()
    assert(bigKept.forall(_.getDouble(1) >= 5.0), bigKept.mkString(","))
    // ties break by id ascending: score 5 appears at ids 5,12,19,26,33 and
    // score 6 at 6,13,20,27,34 — top-5 = all of 6's, none of 5's... both
    // fives: 5 sixes fill the cap exactly
    assert(bigKept.map(_.getLong(0)).sorted.toSeq ==
      Seq(6L, 13L, 20L, 27L, 34L), bigKept.mkString(","))
    // no cap_rank helper column leaks into the output
    assert(kept.columns.toSeq == scored.columns.toSeq)
  }

  test("rebalanceToMin flattens every group to ~the smallest") {
    val got = sizes(Sampling.rebalanceToMin(docs, "lang", "doc_id", gran))
    val minN = sizes(docs).values.min
    got.values.foreach(n => assert(math.abs(n - minN) <= minN / 5, got))
  }

  test("temperature alpha=0 equals rebalanceToMin, alpha=1 is identity") {
    val flat = Sampling.rebalanceToMin(docs, "lang", "doc_id", gran)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val t0 = Sampling.temperatureRebalance(docs, "lang", "doc_id", 0.0, gran)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same slot arithmetic up to the one rounding: keep sets agree
    assert((t0 diff flat).size + (flat diff t0).size <= docs.count() / 100,
      s"alpha=0 must match the uniform rebalance: ${t0.size} vs ${flat.size}")
    val t1 = Sampling.temperatureRebalance(docs, "lang", "doc_id", 1.0, gran)
    assert(t1.count() == docs.count(), "alpha=1 must keep everything")
  }

  test("temperature interpolates: shares flatten monotonically in alpha") {
    val natural = sizes(docs)
    val a25 = sizes(Sampling.temperatureRebalance(docs, "lang", "doc_id",
      0.25, gran))
    val a75 = sizes(Sampling.temperatureRebalance(docs, "lang", "doc_id",
      0.75, gran))
    // the smallest group is never cut
    assert(a25("small") == natural("small"))
    assert(a75("small") == natural("small"))
    // larger alpha keeps more of the big group (closer to natural)
    assert(a25("big") < a75("big"))
    assert(a75("big") < natural("big"))
    // expected keep fraction for the big group at alpha: (min/n)^(1-a)
    def expected(a: Double) =
      math.pow(natural("small").toDouble / natural("big"), 1 - a) *
        natural("big")
    assert(math.abs(a25("big") - expected(0.25)) < natural("big") * 0.05)
    assert(math.abs(a75("big") - expected(0.75)) < natural("big") * 0.05)
  }

  test("tokenBudgetSample: groups land near an equal token share of the " +
      "budget; short-of-target groups are kept whole") {
    // long docs in "big", short docs elsewhere — token mass is what must
    // equalize, not doc counts
    val withToks = docs.withColumn("n_toks",
      when(col("lang") === "big", 100L).otherwise(10L))
    val kept = Sampling.tokenBudgetSample(withToks, "lang", "doc_id",
      col("n_toks"), budgetFrac = 0.5, granularity = gran)
    val mass = kept.groupBy("lang").agg(sum("n_toks").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = 2100 / 21 * (1 * 10 + 4 * 10 + 16 * 100)
    val target = 0.5 * total / 3
    // "big" (160k tokens natural) is cut to ~target
    assert(math.abs(mass("big") - target) < target * 0.1,
      s"big=${mass("big")} target=$target")
    // "small" (1k) and "mid" (4k) are below target → kept in full
    assert(mass("small") == 100 * 10L, mass)
    assert(mass("mid") == 400 * 10L, mass)
  }

  test("qualityPareto: survival sums are suffix-cumulative over buckets") {
    val scored = Seq(
      (1L, 0.10, 10L), (2L, 0.12, 20L),   // bucket 2
      (3L, 0.55, 30L),                    // bucket 11
      (4L, 0.95, 40L), (5L, 1.00, 50L)    // buckets 19, 19 (clamped)
    ).toDF("doc_id", "quality", "n_toks")
    val got = Sampling.qualityPareto(scored, "quality", col("n_toks"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSet == Set(
      (0.1, 2L, 30L, 5L, 150L),     // keep ≥ 0.10 → everything
      (0.55, 1L, 30L, 3L, 120L),
      (0.95, 2L, 90L, 2L, 90L)))
  }

  test("epochSchedule: capped groups serve maxEpochs, others hit target") {
    // small: 100 tokens, big: 1000 → total 1100; budget 2.0× spread over
    // 2 groups → target 1100 each; small caps at 4 epochs (400 tokens),
    // big serves 1.1 epochs = the full target
    val df = Seq(("small", 100L), ("big", 1000L))
      .toDF("lang", "n_toks")
    val got = Sampling.epochSchedule(df, "lang", col("n_toks"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got("small") == ((100L, 1100L, 4.0, 400L)), got)
    assert(got("big") == ((1000L, 1100L, 1.1, 1100L)), got)
  }

  test("snakeShards matches the reference snake and balances mass") {
    val rows = (1L to 40L).map(i => (i, 41L - i))
    // multi-partition input exercises the distributed-rank path
    val df = rows.toDF("doc_id", "w").repartition(7)
    val got = Sampling.snakeShards(df, "doc_id", col("w"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: global rank by (w desc, id), snake-dealt over 2n cycle
    val exp = rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex.map {
      case ((id, w), rk) =>
        val c = rk % 8
        (id, w, if (c < 4) c.toLong else 7L - c)
    }.toSet
    assert(got.toSet == exp)
    val sums = got.groupBy(_._3).values.map(_.map(_._2).sum)
    assert(sums.max - sums.min <= rows.map(_._2).max,
      s"snake must balance within one max weight: $sums")
  }

  test("hashSplit: assignment is a pure function of the id (growth-stable)") {
    val small = (1L to 100L).toDF("doc_id")
    val large = (1L to 1000L).toDF("doc_id")
    val a = Sampling.hashSplit(small, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(large, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s },
      "adding documents must not move existing split assignments")
    // the Knuth-hash buckets match the scala-side reference formula
    val ref = (1L to 100L).map { id =>
      val bucket = (id * 2654435761L) % 4294967296L % 100
      id -> (if (bucket < 90) "train" else if (bucket < 95) "val"
             else "test")
    }.toMap
    assert(a == ref)
    assert(b.values.toSeq.count(_ == "train") > 800,
      "train share should dominate")
  }

  test("quantileCalibrate: per-group percent rank with id tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 40.0),
      (5L, "b", 99.0)).toDF("doc_id", "source", "quality")
    val got = Sampling.quantileCalibrate(df, "quality", "source", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // ties (20, 20) split by the doc_id tie-break → distinct ranks;
    // a single-row group calibrates to 0.0 by (rank−1)/(n−1)
    val third = BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val twoThirds = BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 0.0), (2L, third), (3L, twoThirds),
      (4L, 1.0), (5L, 0.0)), got.toSeq)
  }

  test("topP: strict mass boundary — the doc landing exactly on p drops") {
    import spark.implicits._
    val df = Seq(
      (1L, "g", 0.9, 50L), (2L, "g", 0.8, 30L), (3L, "g", 0.7, 20L))
      .toDF("doc_id", "grp", "quality", "w")
    // total 100, p = 4/5: doc1 (cum_before 0), doc2 (50) kept;
    // doc3 has cum_before 80 and 80·5 = 100·4 → NOT < → dropped
    val kept = Sampling.topP(df, "grp", "doc_id", "quality", "w", 4, 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L), kept.toSeq)
    // p = 1 keeps everything (cum_before < total always, strict)
    assert(Sampling.topP(df, "grp", "doc_id", "quality", "w", 1, 1)
      .count() == 3)
  }
}
