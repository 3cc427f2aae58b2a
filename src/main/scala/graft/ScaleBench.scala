package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Scale-rehearsal driver: regenerates BENCH_SCALE.json reproducibly.
  *
  * For each of the heaviest headline queries, times the query (fork-per-
  * query, 1 warmup + min of 3 — Bench's protocol) at the source scale and
  * at each synthesized ScaleUp factor, and records BOTH wall-time and the
  * task-metrics profile of the run (total shuffle read/write bytes, spill,
  * peak per-task execution memory). Shuffle growth across scales is the
  * direct evidence for "this plan survives a 100× scale-up": a query whose
  * wall-time looks flat but whose shuffle bytes grow super-linearly is
  * living on borrowed single-node cache locality, and this artifact makes
  * that visible.
  *
  * Scaling exponent = least-squares slope of log10(time) vs log10(factor)
  * over all measured points (2 points = the round-8 ratio formula; a
  * third decade tightens the fit). 1.0 = linear; > 1.301 reproduces the
  * judge's ">2× super-linear at 10×" flag.
  *
  * Usage: runMain graft.ScaleBench <srcSfDir> <outJson>
  *  - SPARK_GRAFT_FACTORS: comma list of ScaleUp factors (default "10")
  *  - SPARK_GRAFT_DEEP_FACTORS / SPARK_GRAFT_DEEP_QUERIES: extra, larger
  *    factors run only for the named queries (third/fourth decades for
  *    the headliners without paying them for all 18). The legacy
  *    singular SPARK_GRAFT_DEEP_FACTOR still works. The 100x corpus
  *    needs SPARK_DRIVER_MEM=24g — the default 8g fork heap dies
  *    mid-query (single-JVM local mode carries all 32 executor threads'
  *    shuffle + the persisted corpus on one heap; a real cluster spreads
  *    this over executors)
  *  - SPARK_GRAFT_ONLY: narrow the query set (same contract as Bench)
  * Synthesized corpora land under target/scale_sf<factor> and are reused
  * if already present.
  */
object ScaleBench {

  /** The heaviest dedup/ANN/graph/text headliners — the queries whose
    * scaling behaviour carries the 100 TB claim.
    */
  val scaleQueries: Seq[String] = Seq(
    "dd10_dup_clusters", "dd12_neardup_dedup", "dd15_minhash_dedup",
    "dd16_quality_dedup", "sim3_ivf_topk", "sim9_persisted_ann",
    "dd24_pagerank", "ts21_ngram_novelty", "dd25_prefix_pairs",
    "dd27_label_propagation", "lm2_kneser_ney", "tc6_semantic_decontam",
    "tc7_semantic_screen", "sim17_srp_lsh", "dd28_kcore",
    "dd29_containment", "ev10_gapfill_resample", "a18_countmin",
    "dd30_corpus_overlap", "dd26_threshold_curve", "dd18_fuzzy_pairs",
    "dd18b_skew_pairs", "sim16b_ann_contrastive",
    // r14: the verbatim-decontamination heavies — their size-GATED
    // broadcasts (gram blacklist / span relation) had never been measured
    // past sf0.1, and a mis-set gate threshold only shows at a decade
    "tc1_decontam_report", "tc3_span_decontam")

  private def ensureCorpus(src: String, factor: Int): String = {
    val out = s"target/scale_sf$factor"
    // ScaleUp is per-table idempotent: a corpus from before a table was
    // added to the rehearsal set is upgraded in place
    val tables = Seq("documents", "embeddings", "events", "part")
    if (tables.exists(t => !Files.exists(Paths.get(s"$out/$t.parquet")))) {
      System.err.println(s"[scalebench] synthesizing ${factor}x corpus at $out")
      ScaleUp.main(Array(src, out, factor.toString))
    }
    out
  }

  private def slope(points: Seq[(Double, Double)]): Double = {
    // least-squares slope of log10(t) on log10(factor)
    val xs = points.map(p => math.log10(p._1))
    val ys = points.map(p => math.log10(p._2))
    val n = xs.size
    val mx = xs.sum / n
    val my = ys.sum / n
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    if (den == 0) 0.0 else num / den
  }

  def main(args: Array[String]): Unit = {
    val (src, outJson) = args match {
      case Array(s, o) => (s, o)
      case _ =>
        System.err.println(
          "usage: runMain graft.ScaleBench <srcSfDir> <outJson>")
        sys.exit(2)
    }
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "10")
      .split(",").map(_.trim.toInt).toSeq
    val deepFactors = sys.env.get("SPARK_GRAFT_DEEP_FACTORS")
      .orElse(sys.env.get("SPARK_GRAFT_DEEP_FACTOR"))
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Nil)
    val deepQueries = sys.env.get("SPARK_GRAFT_DEEP_QUERIES")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(scaleQueries)(s => scaleQueries.filter(s))

    val scaleDirs: Seq[(Int, String)] =
      (1, src) +: factors.map(f => f -> ensureCorpus(src, f))
    val deepDirs = deepFactors.map(f => f -> ensureCorpus(src, f))

    def fmtQuery(name: String,
        measured: Seq[(Int, Bench.Detail)]): String = {
      val pts = measured.filter(_._2.value > 0)
        .map { case (f, d) => (f.toDouble, d.value) }
      val exp = if (pts.size >= 2) slope(pts) else Double.NaN
      val base = measured.find(_._1 == 1).map(_._2.value).getOrElse(-1.0)
      val at10 = measured.find(_._1 == 10).map(_._2.value).getOrElse(-1.0)
      val ratio = if (base > 0 && at10 > 0) at10 / base else Double.NaN
      val scales = measured.map { case (f, d) =>
        val m = d.metrics.fold("")("," + _.json)
        f""""${f}x":{"sec":${d.value}%.3f,"runs":[${d.times
          .map(t => f"$t%.3f").mkString(",")}],"warmup":${d.warmup}%.3f$m${
          d.attributionJson}}"""
      }.mkString(",")
      val expS = if (exp.isNaN) "null" else f"$exp%.3f"
      val ratioS = if (ratio.isNaN) "null" else f"$ratio%.2f"
      val flag = !exp.isNaN && exp > 1.301
      s""""$name":{"scaling_exponent":$expS,"ratio_at_10x":$ratioS,""" +
        s""""super_linear_2x":$flag,$scales}"""
    }

    // Flushed after EVERY completed query, not once at the end: a scale
    // run is tens of minutes, and losing the whole artifact to a killed
    // JVM (observed twice at session boundaries) costs more than the
    // redundant small-file writes.
    def writeJson(perQuery: Seq[(String, Seq[(Int, Bench.Detail)])])
        : Unit = {
    val flagged = perQuery.collect {
      case (n, m) if {
        val pts = m.filter(_._2.value > 0)
          .map { case (f, d) => (f.toDouble, d.value) }
        pts.size >= 2 && slope(pts) > 1.301
      } => "\"" + n + "\""
    }
    val json =
      s"""{
         | "protocol": {
         |  "description": "scale rehearsal: heaviest dedup/ANN/graph/text headliners at the source scale and structure-preserving ScaleUp synth corpora (per-replica re-keyed ids, replica-suffixed tokens, signed-permutation isometry embedding replicas -- intra-replica geometry exact, cross-replica cosine ~random, so no similarity is fabricated -- re-keyed event users): the workload carries exactly Nx the true pairs by construction, so growth is the engine's. Regenerate: sbt 'runMain graft.ScaleBench ${src} ${outJson}'",
         | "timing": "fork-per-query, 1 warmup + min of 3 (Bench protocol)",
         |  "metrics": "task-metrics profile of the final timed run: total shuffle read/write MB, total spill MB, max per-task peak execution memory MB; gc_sec/steal_sec decompose each timed run's wall clock (whole-JVM GC + host CPU-steal) so outlier runs are attributable without a re-run",
         |  "factors": [${scaleDirs.map(_._1).mkString(",")}],
         |  "deep": ${if (deepFactors.isEmpty) "null"
            else s"""{"factors":[${deepFactors.mkString(",")}],""" +
              s""""queries":[${deepQueries.map("\"" + _ + "\"")
                .mkString(",")}]}"""},
         |  "exponent": "least-squares slope of log10(sec) vs log10(factor); 1.0 = linear, >1.301 = the >2x-super-linear flag"
         | },
         | "queries": {
         |  ${perQuery.map { case (n, m) => fmtQuery(n, m) }
            .mkString(",\n  ")}
         | },
         | "summary": {
         |  "n_queries": ${perQuery.size},
         |  "super_linear_2x_flagged": [${flagged.mkString(",")}]
         | }
         |}
         |""".stripMargin
    Files.write(Paths.get(outJson), json.getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[scalebench] wrote $outJson")
    }

    val perQuery =
      scala.collection.mutable.ArrayBuffer
        .empty[(String, Seq[(Int, Bench.Detail)])]
    selected.foreach { name =>
      val dirs = scaleDirs ++
        (if (deepQueries.contains(name)) deepDirs else Nil)
      val measured = dirs.map { case (factor, dir) =>
        System.err.println(s"[scalebench] $name @ ${factor}x ($dir)")
        (factor, Bench.forkOne(name, dir))
      }
      perQuery += (name -> measured)
      writeJson(perQuery.toSeq)
    }
  }
}
