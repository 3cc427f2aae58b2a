package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * The engine's query surface is assembled from:
  *   - [[QueriesCore]] — scans/filters/projections/scalar-ops/joins/aggs/
  *     ordering/windows (SURVEY §2 operator inventory);
  *   - [[QueriesScale]] — dedup, similarity search, text analysis,
  *     multimodal plumbing, stream-shaped windows (training-data ops).
  * The movie-domain reference pipeline itself lives in `graft.etl`; it is
  * exercised end-to-end by [[QueriesEtl]] (driver-verified over the
  * synthesized fixtures — the reference's data files are missing blobs)
  * and branch-by-branch by the ScalaTest golden suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ scale ops,
    * + the reference pipeline end-to-end).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesScale.queries ++ QueriesEtl.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (the e1 oracle reads the fixture files
    * directly). Omitted for hash-seeded/approximate ops (minhash, simhash,
    * LSH, IVF, rolling-hash) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesScale.oracles ++ QueriesEtl.oracles
}
