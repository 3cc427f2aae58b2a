package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixture sampling for training-data pipelines. */
object Sampling {

  /** Uniform domain rebalancing: deterministically downsample every group
    * to ≈ the smallest group's size (the DoReMi-ish "flatten the mixture"
    * baseline). The keep decision is integer-exact —
    * `(id % granularity) * group_n < min_n * granularity` — so the sample
    * is reproducible across engines and runs with no float thresholds or
    * RNG; it assumes ids are roughly uniform modulo `granularity`
    * (sequential or hashed ids both qualify). Group counts are a tiny
    * relation → broadcast to every row; the op adds NO shuffle beyond the
    * one count aggregate, and the filter is row-local, so it composes
    * map-side into any downstream pipeline.
    */
  def rebalanceToMin(df: DataFrame, groupCol: String, idCol: String,
      granularity: Int = 10000): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("grp_n"))
    val minc = counts.agg(min(col("grp_n")).as("min_n"))
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(minc))
      .filter((col(idCol) % granularity) * col("grp_n") <
        col("min_n") * granularity)
      .drop("grp_n", "min_n")
  }

  /** Temperature-flattened domain mixture (the multilingual sampling rule
    * from XLM-R / mT5: target share ∝ (n_g/N)^α): each group keeps a
    * deterministic slot fraction r_g = (min_n / n_g)^(1−α), which realizes
    * the α-tempered proportions WITHOUT upsampling — the smallest group
    * keeps everything, larger groups are flattened toward it. α = 0
    * degenerates to [[rebalanceToMin]] (uniform mixture), α = 1 keeps the
    * natural mixture unchanged. The keep decision is the same
    * mod-`granularity` slot test as [[rebalanceToMin]] (reproducible, no
    * RNG; the slot count per group is rounded once, so the only float op
    * is one `pow` on two broadcast integers). Group counts are a tiny
    * broadcast; the filter is row-local — no shuffle beyond the one count
    * aggregate, map-side composable at 100 TB.
    */
  def temperatureRebalance(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, granularity: Int = 10000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0, 1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("grp_n"))
    val minc = counts.agg(min(col("grp_n")).as("min_n"))
    val slots = round(
      pow(col("min_n").cast("double") / col("grp_n"), 1.0 - alpha) *
        granularity).cast("long")
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(minc))
      .filter(col(idCol) % granularity < slots)
      .drop("grp_n", "min_n")
  }

  /** Deterministic train/val/test assignment by multiplicative (Knuth)
    * hashing of a numeric id: `bucket = id * 2654435761 mod 2^32 mod 100`,
    * then thresholded into the three splits. Pure row-local projection —
    * no shuffle, no RNG state — and stable under corpus growth: a
    * document's split never changes when new documents arrive, which is
    * the property that keeps a held-out eval set uncontaminated across
    * corpus snapshots (a fractional `sample()` reshuffles membership every
    * time the row count moves). Integer arithmetic only → bit-exact across
    * engines; ids up to ~2^31 stay far inside BIGINT range after the
    * multiply.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"split percentages must partition 100, got $trainPct/$valPct")
    val bucket = (col(idCol) * lit(2654435761L)) % lit(4294967296L) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Contiguous global id assignment without a single-task sort — the
    * two-pass layout op every ingestion pipeline needs (stable dense row
    * ids for shard manifests, example indexing, resumable ordering).
    *
    * Pass 1 range-partitions and locally sorts on the key, then counts
    * rows per partition — a tiny (#partitions)-row relation whose running
    * offsets come from a window over THAT relation (single-task, but over
    * hundreds of rows, never the corpus). Pass 2 joins the broadcast
    * offsets back and numbers rows per partition: `row_id = offset +
    * row_number() over (partition by pid order by key)` — every
    * corpus-sized window is partition-local. The sorted relation feeds
    * both passes, so it is persisted (also pinning one partition-id
    * assignment; range boundaries are sample-derived, and ids must come
    * from a single layout). Ids are dense 1..N in global key order
    * regardless of where the sampled range boundaries land.
    */
  def contiguousIds(df: DataFrame, keyCol: String): DataFrame = {
    val parts = df
      .repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("n"))
    val offsets = counts.withColumn("offset",
      coalesce(sum(col("n")).over(Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wp = Window.partitionBy(col("pid")).orderBy(col(keyCol))
    parts.join(broadcast(offsets), "pid")
      .withColumn("row_id", col("offset") + row_number().over(wp))
      .drop("pid", "n", "offset")
  }

  /** Token-budget mixture: downsample each group so its TOKEN mass (not
    * its doc count — docs vary wildly in length, and the training budget
    * is counted in tokens) lands at an equal share of
    * `budgetFrac · total_tokens`. The final static data-mixing step
    * before sequence chunking: "train on 40% of the corpus, spread evenly
    * across domains". Per group, keep-rate
    * r_g = min(1, (budgetFrac · T / n_groups) / T_g); the keep decision
    * is the same deterministic mod-`granularity` slot test as
    * [[rebalanceToMin]] (no RNG, reproducible cross-engine; the slot
    * count is rounded once per group). Selection is document-level, so a
    * group's realized mass tracks its target in expectation — exact
    * token-level packing belongs to [[TextOps.sequenceChunks]] downstream.
    * Two scalar-sized aggregates broadcast back; the filter is row-local —
    * no shuffle of the corpus itself, map-side composable at 100 TB.
    */
  def tokenBudgetSample(df: DataFrame, groupCol: String, idCol: String,
      tokens: Column, budgetFrac: Double, granularity: Int = 10000)
  : DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetFrac in (0, 1], got $budgetFrac")
    val toks = df.withColumn("__toks", tokens)
    val grp = toks.groupBy(col(groupCol))
      .agg(sum(col("__toks")).as("grp_toks"))
    val tot = grp.agg(sum(col("grp_toks")).as("total"),
      count(lit(1)).as("n_groups"))
    val slots = round(
      least(lit(1.0),
        (lit(budgetFrac) * col("total") / col("n_groups")) /
          col("grp_toks")) * granularity).cast("long")
    toks.join(broadcast(grp), Seq(groupCol))
      .crossJoin(broadcast(tot))
      .filter(col(idCol) % granularity < slots)
      .drop("grp_toks", "total", "n_groups", "__toks")
  }

  /** Quality-threshold survival curve ("pareto" accounting): bucket every
    * doc by its (already-rounded) quality score and report, per bucket
    * lower edge, the doc/token mass that survives a keep-everything-
    * ≥-threshold cut — the table a curation run reads to pick its quality
    * cutoff (quality-vs-quantity tradeoff). One map-side-combined bucket
    * aggregate; the cumulative sums run on the ≤`buckets`-row bucket
    * relation (a single-task window over a constant-size input, the same
    * shape as [[snakeShards]]' offsets), never on the corpus.
    */
  def qualityPareto(df: DataFrame, qualityCol: String, tokens: Column,
      buckets: Int = 20): DataFrame = {
    val b = least(floor(col(qualityCol) * buckets), lit(buckets - 1))
      .cast("long")
    val perBucket = df.withColumn("__toks", tokens)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("threshold",
        round(col("bucket").cast("double") / buckets, 4))
      .withColumn("surviving_docs", sum(col("n_docs")).over(w))
      .withColumn("surviving_tokens", sum(col("n_tokens")).over(w))
      .select(col("threshold"), col("n_docs"), col("n_tokens"),
        col("surviving_docs"), col("surviving_tokens"))
  }

  /** Data-constrained epoch schedule (the repetition-planning step when
    * the token budget exceeds the corpus): aim every group at an EQUAL
    * share of `budgetFrac · total_tokens` and report how many epochs
    * (repeats) of each group that takes, capped at `maxEpochs` — past ~4
    * epochs repeated data stops helping, so the cap models the
    * data-constrained regime and `served < target` exposes the deficit
    * the mixture planner must reallocate. Epochs are rounded once (4 dp)
    * and served mass is derived from the ROUNDED epochs, so the whole
    * schedule replays exactly cross-engine. One group aggregate + one
    * scalar total; arithmetic on the tiny group relation.
    */
  def epochSchedule(df: DataFrame, groupCol: String, tokens: Column,
      budgetFrac: Double = 2.0, maxEpochs: Double = 4.0): DataFrame = {
    val grp = df.withColumn("__toks", tokens)
      .groupBy(col(groupCol)).agg(sum(col("__toks")).as("t_tokens"))
    val tot = grp.agg(sum(col("t_tokens")).as("total"),
      count(lit(1)).as("n_groups"))
    grp.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        floor(lit(budgetFrac) * col("total") / col("n_groups"))
          .cast("long"))
      .withColumn("epochs",
        round(least(lit(maxEpochs),
          col("target_tokens").cast("double") / col("t_tokens")), 4))
      .withColumn("served_tokens",
        round(col("epochs") * col("t_tokens")).cast("long"))
      .select(col(groupCol), col("t_tokens"), col("target_tokens"),
        col("epochs"), col("served_tokens"))
  }

  /** Balanced training-shard assignment by SNAKE placement: rank rows by
    * weight (token count) descending and deal rank r to shard
    * `r mod 2n < n ? r mod 2n : 2n-1-(r mod 2n)` — the boustrophedon
    * round-robin that keeps every shard's total weight within one
    * max-document of the others (plain `r mod n` systematically loads
    * shard 0 with the heavier row of every cycle). This is the writer-side
    * step that makes training shards equal-work, so no reader stalls on a
    * fat shard.
    *
    * The global rank is computed WITHOUT a single-task sort: `orderBy`
    * range-partitions the (id, weight) projection across tasks; each
    * task's rows get a local `row_number` (per-partition window), and the
    * global rank is local rank + the broadcast cumulative count of the
    * preceding partitions — the standard distributed-rank decomposition.
    * The sorted projection is persisted so the count pass and the rank
    * pass see the SAME range boundaries (sampling is re-drawn per
    * evaluation otherwise). The ordering key (weight desc, id) is unique
    * per row, so ranks — and therefore shard assignments — are
    * deterministic regardless of where the range boundaries land.
    */
  def snakeShards(df: DataFrame, idCol: String, weight: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards >= 1, got $nShards")
    val sorted = df.select(col(idCol), weight.cast("long").as("__w"))
      .orderBy(col("__w").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val lw = Window.partitionBy(col("__pid"))
      .orderBy(col("__w").desc, col(idCol))
    val cycle = pmod(col("__off") + col("__lrk"), lit(2L * nShards))
    sorted
      .withColumn("__lrk", row_number().over(lw).cast("long") - 1L)
      .join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), col("__w").as("weight"),
        when(cycle < nShards, cycle)
          .otherwise(lit(2L * nShards - 1L) - cycle).cast("long")
          .as("shard"))
  }

  /** Cross-source quantile calibration: replace each raw score by its
    * per-group percent rank — the rank-normalization that makes quality
    * scores COMPARABLE across heterogeneous sources (every source's
    * scorer has its own scale and bias; "top decile of its own source" is
    * the statement a mixture policy can actually act on). Deterministic:
    * ties broken by id, so the replay is exact; single-row groups map
    * to 0.0 (percent_rank's (rank−1)/(n−1) convention).
    *
    * Scale shape: one per-group window sort — the rank transform's
    * irreducible cost; groups (sources) partition the corpus, so the sort
    * parallelizes per group and no global order is imposed.
    */
  def quantileCalibrate(df: DataFrame, scoreCol: String, groupCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("calibrated", round(percent_rank().over(w), 6))
  }

  /** Per-group top-p (nucleus) selection: walk each group in quality-desc
    * order and keep documents while the cumulative weight BEFORE the
    * current one is under p of the group total — the crossing document is
    * kept, mirroring nucleus sampling's "smallest prefix covering p mass".
    * p is a RATIONAL (`pNum/pDen`) and weights are integers, so the keep
    * predicate `cum_before · pDen < total · pNum` is integer-exact — no
    * float threshold to drift cross-engine. The mass-targeted complement
    * of [[qualityPareto]]'s threshold sweep: Pareto asks "what survives
    * cut q", top-p asks "which docs cover the best p of the mass".
    */
  def topP(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, weightCol: String, pNum: Int, pDen: Int)
  : DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val cumBefore = sum(col(weightCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val total = sum(col(weightCol))
      .over(Window.partitionBy(col(groupCol)))
    df.withColumn("cum_before", coalesce(cumBefore, lit(0L)))
      .withColumn("grp_total", total)
      .filter(col("cum_before") * pDen < col("grp_total") * pNum)
      .drop("cum_before", "grp_total")
  }

  /** Per-group frequency cap: keep at most `cap` rows of each group, best
    * `score` first, ties broken by `idCol` — the Common-Crawl-style domain
    * cap that stops a single over-represented source from dominating a
    * training mixture. The `row_number ≤ cap` shape compiles to
    * WindowGroupLimit, so each map task keeps only its local top-`cap`
    * per group BEFORE the shuffle — the exchange carries O(groups · cap)
    * rows, not the corpus, no matter how skewed the big sources are.
    */
  def groupCap(df: DataFrame, groupCol: String, idCol: String,
      score: Column, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.desc, col(idCol))
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= cap)
      .drop("cap_rank")
  }
}
