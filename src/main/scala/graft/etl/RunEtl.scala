package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry: run the full movie pipeline against real input files.
  *
  *   runMain graft.etl.RunEtl <wiki.json> <kaggle.csv> <ratings.csv> <outDir>
  *
  * Writes parquet tables movies/, movies_ratings/, ratings/ under outDir —
  * the harness-substitute for the reference's PostgreSQL load (S5); set
  * GRAFT_JDBC_URL/USER/PASSWORD to append to a database instead.
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    val Array(wiki, kaggle, ratings, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val result = MovieEtl.run(spark, wiki, kaggle, ratings)

    sys.env.get("GRAFT_JDBC_URL") match {
      case Some(url) =>
        val (user, pass) = (sys.env.getOrElse("GRAFT_JDBC_USER", ""),
          sys.env.getOrElse("GRAFT_JDBC_PASSWORD", ""))
        Load.jdbc(result.movies, url, "movies", user, pass)
        Load.jdbc(result.moviesWithRatings, url, "movies_ratings", user, pass)
        Load.jdbc(result.ratings, url, "ratings", user, pass)
      case None =>
        Load.parquet(result.movies, s"$outDir/movies")
        Load.parquet(result.moviesWithRatings, s"$outDir/movies_ratings")
        Load.parquet(result.ratings, s"$outDir/ratings")
    }
    println(s"movies=${result.movies.count()} " +
      s"movies_ratings=${result.moviesWithRatings.count()} " +
      s"ratings=${result.ratings.count()}")
    spark.stop()
  }
}
