package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators: Z-order (Morton) clustering
  * keys and the per-file min/max audit a lakehouse layout job emits.
  *
  * Why this exists at 100 TB: a table range-partitioned on ONE column
  * skips files only for filters on that column. Interleaving the bits of
  * two bucketed dimensions into one sort key keeps rows that are close in
  * EITHER dimension close in the file order, so per-file min/max zone
  * maps stay tight on both — the same layout trick Delta/Iceberg
  * `OPTIMIZE ZORDER BY` applies before writing. Everything here is plain
  * integer arithmetic (shifts/and/or), codegen-friendly, zero shuffles
  * for the key itself; only the audit aggregates.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative bucketed
    * dimensions: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Pure bit arithmetic → identical in any engine (the oracle
    * replays the same 2·bits-term expression in SQL).
    */
  def zOrderKey(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits > 0 && bits <= 16, s"bits must be in [1,16], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Zone-map audit of a z-ordered layout: rows are assigned to their
    * target file by the top z bits (`zKey >> fileShift` — contiguous
    * z-ranges, exactly what a range-partitioned writer produces) and each
    * file reports its row count and per-dimension min/max. Tight spans on
    * BOTH dimension columns are the evidence the layout skips; a
    * single-dimension sort would show full-range spans on the other
    * column. Output is one small row per file — integer-only, fully
    * deterministic.
    */
  def zOrderAudit(df: DataFrame, x: Column, y: Column, bits: Int = 8,
      fileShift: Int = 10): DataFrame = {
    val z = zOrderKey(x, y, bits)
    df.select(x.as("bx"), y.as("by"), z.as("z"))
      .groupBy(shiftright(col("z"), fileShift).cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("bx")).as("min_x"), max(col("bx")).as("max_x"),
        min(col("by")).as("min_y"), max(col("by")).as("max_y"))
  }
}
