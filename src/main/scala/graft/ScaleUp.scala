package graft

import org.apache.spark.sql.functions._

/** Scale-rehearsal corpus generator: synthesize N× `documents`,
  * `embeddings`, `events`, and `part` tables from an existing sf
  * directory, for measuring how the dedup/ANN headliners scale
  * (BENCH_SCALE.json).
  *
  * The replication is structure-preserving, which is what makes the
  * scaling exponent meaningful:
  *  - each document replica re-keys `doc_id` and suffixes EVERY token with
  *    a replica tag, so all shingles/grams/fingerprints differ across
  *    replicas — no cross-replica similarity is fabricated, and the
  *    per-replica duplicate structure is exactly the source corpus's. An
  *    N× corpus then carries exactly N× the true pairs: a linear-scaling
  *    workload by construction, so any super-linear wall-time growth is
  *    the ENGINE's, not the data's.
  *  - each embedding replica re-keys `vec_id` and applies a PER-REPLICA
  *    ISOMETRY — a deterministic signed permutation of the components
  *    (cyclic shift by the replica index + a Weyl-pattern sign flip).
  *    A signed permutation is an orthogonal transform, so every
  *    intra-replica cosine is EXACTLY the base corpus's (each replica is
  *    the same point cloud in a rotated frame), while cross-replica
  *    similarity is that of unrelated vectors. The earlier construction
  *    (small additive perturbation) kept replicas of the same base vector
  *    mutually near-identical — cross-replica TRUE pairs grew as
  *    factor², and the 30× rehearsal decade showed it: sim17's LSH
  *    buckets filled with fabricated co-replica stacks and the candidate
  *    verify went quadratic. The data was violating the linear-workload
  *    contract, not the engine.
  *
  * Output is written multi-file so scans parallelize like a real
  * many-file lake table (Tables.fanOut then keeps the scan's own
  * partitioning — the production path, not the single-file harness path).
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-table idempotence: a corpus generated before a new table was
    // added to the rehearsal set is UPGRADED in place (only the missing
    // table is synthesized) instead of regenerated wholesale — a 100×
    // corpus write is minutes of IO.
    def missing(table: String): Boolean =
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/$table.parquet"))

    if (missing("documents")) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCopies = (0 until factor).map { i =>
      if (i == 0) docs
      else {
        val text = array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"_r$i"))),
          " ")
        docs.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
    }
    docCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    if (missing("embeddings")) {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embCopies = (0 until factor).map { i =>
      if (i == 0) emb
      else {
        // signed permutation: out[j] = s(i,j) · in[(j + i) mod dim] —
        // orthogonal, so intra-replica geometry is bit-for-bit the base
        // corpus's; the (37i + 57j) mod 83 sign pattern is the same
        // full-period affine-sweep trick the SRP hyperplanes use
        val dim = size(col("embedding"))
        emb.select(
          (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          transform(col("embedding"), (_, j) =>
            (element_at(col("embedding"), pmod(j + lit(i), dim) + 1) *
              when(pmod(lit(37 * i) + j * 57, lit(83)) < 42, lit(1.0f))
                .otherwise(lit(-1.0f))).cast("float")).as("embedding"),
          col("label"))
      }
    }
    embCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    if (missing("events")) {
    // events: replicas re-key event_id AND user_id (the grid/sketch/
    // sessionization dimensions grow linearly — user count scales with
    // the log, matching a real fleet), keep the ts distribution so
    // windows/watermarks see the same time density per user.
    val ev = Tables.events(spark, src)
    val evCopies = (0 until factor).map { i =>
      if (i == 0) ev
      else ev.select(
        (col("event_id") + lit(i * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    evCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    if (missing("part")) {
    // part (dd18's fuzzy-linkage input): replicas re-key p_partkey with
    // an offset that is a multiple of 50, so the query's `id % 50` typo
    // injection selects the same rows in every replica, and append a
    // per-replica 9-char suffix "-ii-ii-ii" to p_name. Appending a
    // COMMON suffix preserves every intra-replica levenshtein exactly
    // (common-affix trimming is an exact property of edit distance),
    // while any two DISTINCT replica suffixes are ≥ 3 edits apart: the
    // three 2-digit blocks each differ under the identity alignment,
    // and any shifted alignment pays at least its own indels — above
    // dd18's maxDist = 2, so no cross-replica fuzzy pair is fabricated
    // and the N× corpus carries exactly N× the true pairs.
    val pt = spark.read.parquet(s"$src/part.parquet")
    val ptCopies = (0 until factor).map { i =>
      if (i == 0) pt
      else pt
        .withColumn("p_partkey", col("p_partkey") + lit(i * 10000000L))
        .withColumn("p_name", concat(col("p_name"), lit(f"-$i%02d" * 3)))
    }
    ptCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    }

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    val nv = spark.read.parquet(s"$out/events.parquet").count()
    val np = spark.read.parquet(s"$out/part.parquet").count()
    println(s"[scaleup] wrote $out: documents=$nd embeddings=$ne " +
      s"events=$nv part=$np (${factor}x of $src)")
    spark.stop()
  }
}
