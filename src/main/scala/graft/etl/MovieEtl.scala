package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full reference pipeline (challenge.py:38-325, E1), Spark-first.
  *
  * Unlike the reference, the entry point honors its arguments (quirk Q1:
  * transform_and_load shadows its parameters with hardcoded paths). Dead
  * computations (Q2) are skipped. The ratings epoch column is loaded raw
  * (Q4: the to_datetime result is discarded in the reference).
  *
  * @param dedupWiki   DC behavior (drop_duplicates imdb_id, DC:3696);
  *                    false = challenge.py (Q5: join may fan out on dups)
  * @param dropOutlier documented-intent outlier drop at the DC position;
  *                    false = challenge.py (Q3: dead code, nothing dropped)
  */
final case class EtlConfig(
    dedupWiki: Boolean = false,
    dropOutlier: Boolean = false)

final case class EtlResult(
    movies: DataFrame,
    moviesWithRatings: DataFrame,
    ratings: DataFrame)

object MovieEtl {

  def run(spark: SparkSession, wikiPath: String, kagglePath: String,
      ratingsPath: String, config: EtlConfig = EtlConfig()): EtlResult = {
    // EXTRACT (S1-S3)
    val wikiRaw = Extract.readWikiJson(spark, wikiPath)
    val kaggleRaw = Extract.readCsv(spark, kagglePath)
    val ratings = Extract.readCsv(spark, ratingsPath)

    // TRANSFORM: wiki (F1, P5, X1-X10, P1), kaggle (F2, X12-X14)
    val wiki = WikiClean.clean(wikiRaw, dedup = config.dedupWiki)
    val kaggle = Merge.cleanKaggle(kaggleRaw)

    // MERGE (J1, X11, P2-P4)
    val joined = Merge.join(wiki, kaggle)
    val outlierHandled =
      if (config.dropOutlier) Merge.dropMergeOutlier(joined) else joined
    val movies = Merge.project(Merge.fillMissingKaggle(outlierHandled))

    // RATINGS (A1, A2, J2)
    val withRatings = Ratings.attach(movies, Ratings.ratingCounts(ratings))

    EtlResult(movies, withRatings, ratings)
  }
}
