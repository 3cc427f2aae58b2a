package graft

/** Plan-dump main: writes each named query's `.explain("formatted")`
  * output to `<outDir>/<query>_<tag>.txt` — the per-query plan evidence
  * the optimization rounds commit under `plans/rNN/` so a reviewer can
  * check plan-shape claims (Exchange counts, join strategies, pushdown)
  * without running Spark. Building a query executes its driver-side
  * sizing jobs and iterative fixpoints (connectedComponents, kCore, …),
  * so the dump reflects exactly the plan the bench's noop sink executes;
  * for the iterative ops the loop itself runs BEFORE the returned plan
  * (its result enters as a localCheckpoint leaf) — loop-shape evidence
  * lives in the per-round job profile, not here.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      try spark.sharedState.cacheManager.clearCache()
      catch { case _: IllegalStateException => }
    }
    spark.stop()
  }
}
