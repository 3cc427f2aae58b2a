package graft.ops

import org.apache.spark.sql.DataFrame
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
}
