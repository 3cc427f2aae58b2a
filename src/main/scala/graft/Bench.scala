package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results are forced with a noop-format write (full
  * plan execution incl. projected columns — `count()` would let Spark prune
  * the very expressions being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // one ~20 MB parquet file per table would yield <4 input splits under
      // the 128 MB default — split finer so all cores scan in parallel
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_region_volume",
      "q6_revenue_delta",
      "j1_inner_join", "j2_left_join_fill", "j5_asof_join",
      "a2_pivot", "w1_row_number", "x7_parse_dollars", "x13_date_cascade",
      "dd2_minhash_sig", "dd5_ngram_jaccard", "dd6_embedding_neardup",
      "dd7_simhash_neardup", "ts2_quality",
      "sim1_cosine_topk", "sim2_threshold_pairs",
      "st1_hourly_window", "st2_sessionize",
      "mm1_binary_meta")

    val all = SparkEntry.queries
    // steady-state timing: one warmup run pays whole-stage-codegen JIT +
    // file-index setup, then min of three timed runs (what a resident
    // cluster would see; min damps this host's up-to-5× CPU-steal spikes).
    val results = headline.filter(all.contains).map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try { once(); Seq(once(), once(), once()).min } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
