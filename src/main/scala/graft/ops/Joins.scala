package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join flavors Spark lacks as built-ins, composed from built-in operators
  * (preference (a) of the engine's custom-operator policy — no custom
  * SparkStrategy is warranted because both reduce to shapes Catalyst
  * already plans well).
  *
  * The reference itself needs only plain equi-joins (SURVEY §2.5 J1/J2);
  * these are engine extras for the time-keyed `events` table.
  */
object Joins {

  /** Backward as-of join: for every left row, the latest right row with
    * `right.ts <= left.ts` for the same key (inclusive), optionally within
    * a tolerance interval.
    *
    * Implemented as union + running `last(_, ignoreNulls)` window — ONE
    * shuffle keyed by `keyCol` (both sides co-partitioned by the window),
    * no point-interval explosion and no per-row probe join. This is the
    * 100 TB shape: cost is a sort within key partitions, skew follows the
    * key distribution exactly like any keyed window.
    *
    * Ties: right rows sharing (key, ts) are resolved to the greatest
    * payload struct (deterministic); right rows at exactly left.ts match
    * (backward-inclusive, like pandas merge_asof and DuckDB ASOF JOIN).
    *
    * @param valueCols right columns to attach (must not collide with left
    *                  column names — rename on the right side first)
    * @param tolerance e.g. `"30 minutes"`: matches older than
    *                  `left.ts - tolerance` are nulled out
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val leftRest = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val lpay = struct(leftRest.map(col): _*)
    val rpay = struct((col(tsCol).as("_rts") +: valueCols.map(col)): _*)
    val lpayType = left.select(lpay).schema.head.dataType
    val rpayType = right.select(rpay).schema.head.dataType

    val l = left.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      lpay.as("_lpay"), lit(null).cast(rpayType).as("_rpay"))
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      lit(null).cast(lpayType).as("_lpay"), rpay.as("_rpay"))

    // right (_side 0) sorts before left at equal ts → inclusive match;
    // _rpay in the ordering makes equal-ts right rows resolve greatest-last
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_rpay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.union(r)
      .withColumn("_m", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(t) => matched.withColumn("_m",
        when(col("_m._rts") >= col(tsCol) - expr(s"INTERVAL '$t'"),
          col("_m")))
      case None => matched
    }
    bounded.select(
      (col(keyCol) +: col(tsCol) +: leftRest.map(c => col(s"_lpay.$c"))) ++
        (col("_m._rts").as("matched_ts") +:
          valueCols.map(c => col(s"_m.$c"))): _*)
  }

  /** Forward as-of join — [[asOfJoin]]'s mirror: attach the EARLIEST right
    * row at-or-after left.ts per key, the label-construction shape
    * ("next purchase after this impression"). Same single-shuffle
    * union+window layout, with the frame flipped to `[current, ∞)` and
    * `first(ignoreNulls)`; left sorts before right at equal ts →
    * forward-inclusive. Ties among right rows at one ts resolve to the
    * LEAST payload struct (deterministic, mirroring backward's greatest).
    * `tolerance` nulls out matches later than `left.ts + tolerance`.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val leftRest = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val lpay = struct(leftRest.map(col): _*)
    val rpay = struct((col(tsCol).as("_rts") +: valueCols.map(col)): _*)
    val lpayType = left.select(lpay).schema.head.dataType
    val rpayType = right.select(rpay).schema.head.dataType

    val l = left.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      lpay.as("_lpay"), lit(null).cast(rpayType).as("_rpay"))
    val r = right.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      lit(null).cast(lpayType).as("_lpay"), rpay.as("_rpay"))

    // left (_side 0) sorts before right at equal ts → the equal-ts right
    // row is inside the forward frame (inclusive); _rpay in the ordering
    // makes equal-ts right rows resolve least-first
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_rpay"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.union(r)
      .withColumn("_m", first(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val bounded = tolerance match {
      case Some(t) => matched.withColumn("_m",
        when(col("_m._rts") <= col(tsCol) + expr(s"INTERVAL '$t'"),
          col("_m")))
      case None => matched
    }
    bounded.select(
      (col(keyCol) +: col(tsCol) +: leftRest.map(c => col(s"_lpay.$c"))) ++
        (col("_m._rts").as("matched_ts") +:
          valueCols.map(c => col(s"_m.$c"))): _*)
  }

  /** Interval/range join: attach the dimension row whose
    * `[loCol, hiCol)` interval contains `fact.valueCol`. The dimension side
    * is explicitly broadcast — the physical plan is a
    * BroadcastNestedLoopJoin whose inner loop is the (tiny) interval list,
    * i.e. a map-side lookup at any fact scale. For large interval sets,
    * bucket both sides by `floor(value / bucketWidth)` first and equi-join
    * on the bucket to bound the nested-loop width.
    */
  def rangeJoin(fact: DataFrame, dims: DataFrame, valueCol: String,
      loCol: String, hiCol: String): DataFrame =
    fact.join(broadcast(dims),
      fact(valueCol) >= dims(loCol) && fact(valueCol) < dims(hiCol))

  /** Bucketed range join — the large-interval-set variant of [[rangeJoin]]:
    * both sides bucket by `floor(value / bucketWidth)`. A dim interval
    * `[lo, hi)` is replicated to every bucket it overlaps (span/width + 1
    * rows), a fact lands in exactly one bucket, and the join becomes an
    * EQUI-join on the bucket id with interval containment as a residual
    * filter — Catalyst plans a hash join (broadcast or shuffled), never a
    * nested loop, so cost is O(facts + dims·span/width + matches) at any
    * dim cardinality. Pick `bucketWidth` near the median interval span so
    * dim replication stays O(1) per interval. Floor-division monotonicity
    * guarantees a fact's bucket always lies within its matching interval's
    * bucket range, so results are identical to [[rangeJoin]].
    */
  def bucketedRangeJoin(fact: DataFrame, dims: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    val fb = fact.withColumn("_bkt",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val db = dims.withColumn("_bkt", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    fb.join(db, Seq("_bkt"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bkt")
  }

  /** Interval-OVERLAP join (the genomics / session-collision shape):
    * emits (a, b) row pairs whose half-open intervals intersect —
    * `lo_a < hi_b && lo_b < hi_a`. Both sides replicate to the integer
    * buckets their span covers (`span/bucketWidth + 1` rows each) and the
    * join becomes an EQUI-join on the bucket id, with overlap as a
    * row-local residual — a hash join at any cardinality, never a nested
    * loop. A pair sharing several buckets would duplicate, so each pair
    * is emitted ONLY in the bucket containing `max(lo_a, lo_b)` (its
    * first shared bucket — both sides cover it whenever the intervals
    * overlap): the canonical-bucket trick makes the result
    * duplicate-free WITHOUT a distinct, so the pair relation never
    * re-shuffles. Bucket ids use integer `div` (no double rounding at
    * epoch-micros magnitudes). The two sides must carry DISJOINT column
    * names (rename before calling — self-joins are the common case);
    * `bucketWidth` near the median span keeps replication O(1) per row.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      bucketWidth: Long): DataFrame = {
    val lb = left.withColumn("_bkt", explode(sequence(
      expr(s"$loA div $bucketWidth"), expr(s"$hiA div $bucketWidth"))))
    val rb = right.withColumn("_bkt", explode(sequence(
      expr(s"$loB div $bucketWidth"), expr(s"$hiB div $bucketWidth"))))
    lb.join(rb, Seq("_bkt"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .filter(expr(s"greatest($loA, $loB) div $bucketWidth") === col("_bkt"))
      .drop("_bkt")
  }

  /** Salted equi-join for skewed key distributions: the skewed side gets a
    * uniform salt in `[0, salts)`, the other side is replicated once per
    * salt value, and the shuffle key becomes (key, salt) — a hot key's rows
    * spread over `salts` reducers instead of one straggler. The salt never
    * appears in the output, so results are identical to a plain equi-join
    * (the catalog query oracle-checks exactly that).
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; explicit
    * salting is for when the skew is known up front, the join isn't a
    * sort-merge, or a downstream keyed op (window/groupBy) inherits the
    * hot key. Cost: `other` is replicated ×salts — keep `salts` modest or
    * salt only the hot keys (filter + union) at extreme skew.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keyCol: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("_salt",
      (rand(42) * salts).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(keyCol, "_salt"), joinType).drop("_salt")
  }
}
