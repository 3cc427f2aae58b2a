package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ratings aggregation + attach (challenge.py:290-302): group counts per
  * (movieId, rating), pivot the 10 rating values to columns, left-join onto
  * movies by kaggle_id, fill unmatched with 0.
  */
object Ratings {

  /** The 10 rating values, pivoted in ascending order (pandas emits columns
    * sorted by value; explicit list pins Spark's column order — SURVEY H4).
    */
  val ratingValues: Seq[Double] =
    Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0)

  val ratingColumns: Seq[String] = ratingValues.map(v => s"rating_$v")

  /** A1+A2 — one-step groupBy+pivot (pandas' two-step groupby+pivot,
    * challenge.py:293). The count aggregates userId (the reference renames
    * userId→count), so null userIds would not count — count("userId").
    */
  def ratingCounts(ratings: DataFrame): DataFrame = {
    val pivoted = ratings
      .groupBy(col("movieId"))
      .pivot("rating", ratingValues)
      .agg(count(col("userId")))
    // rename value columns 0.5..5.0 → rating_0.5..rating_5.0 (:296)
    ratingValues.foldLeft(pivoted)((d, v) =>
      d.withColumnRenamed(v.toString, s"rating_$v"))
  }

  /** J2 — left join + fillna(0) on the rating columns only
    * (challenge.py:299-302). kaggle_id (a TMDB id) is joined against
    * movieId (a MovieLens id) exactly as the reference does.
    */
  def attach(movies: DataFrame, counts: DataFrame): DataFrame = {
    val joined = movies
      .join(counts, movies("kaggle_id") === counts("movieId"), "left")
      .drop("movieId")
    // fillna(0) restricted to the rating columns; the names contain dots
    // ("rating_0.5"), which na.fill would resolve as nested fields — use
    // explicit coalesce with backticked refs instead.
    ratingColumns.foldLeft(joined)((d, rc) =>
      d.withColumn(rc, coalesce(col(s"`$rc`"), lit(0L))))
  }
}
