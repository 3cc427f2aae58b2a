package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as two composable relational passes — the
  * fixed-memory frequency estimator that completes the sketch triad next
  * to Misra-Gries heavy hitters ([[HeavyHitters]] / a4b) and HLL++
  * distinct counts (a7b): point-queryable counts over unbounded key
  * domains in depth·width cells, ε = e/width overestimate (never under),
  * merged across shards by plain cell addition.
  *
  * Relational formulation (all codegen'd builtins, no UDF/UDAF): the
  * BUILD explodes each row into `depth` (row, bucket) cells — bucket r =
  * xxhash64(key, r) mod width — and runs ONE map-side-combinable count
  * aggregate whose result is ≤ depth·width rows no matter the input
  * cardinality; at 100 TB the shuffle carries partial cell counts from
  * each task, i.e. O(tasks · depth · width) bytes, never the data. The
  * PROBE re-derives each queried key's `depth` buckets row-locally and
  * takes the min of the matching cells from the broadcast sketch.
  */
object CountMin {

  /** The r-th row's bucket for `key` — pmod keeps ANSI mode happy on the
    * signed hash.
    */
  private def bucket(key: Column, r: Int, width: Int): Column =
    pmod(xxhash64(key, lit(r)), lit(width))

  /** Build the sketch: (r, b, c) cell relation, ≤ depth·width rows. */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int)
  : DataFrame =
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col(keyCol), r, width).as("b"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point-query estimates for every key in `keys` (one row per key):
    * est = min over the key's depth cells. The sketch is broadcast — it
    * is depth·width rows by construction.
    */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col(keyCol), r, width).as("b"))): _*))
        .as("rb"))
      .join(broadcast(sk),
        col("rb.r") === col("r") && col("rb.b") === col("b"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("est"))
}
