package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every word k-gram of a token array, in ONE compiled pass:
  * the fused replacement for `transform(wordGrams(toks, k), g =>
  * xxhash64(g))` (seed 42 — Spark's `xxhash64` builtin), and — via the
  * per-row `seed` child — for the blocked form `transform(wordGrams(toks,
  * n), g => xxhash64(blockCols..., g))`: Spark's multi-child xxhash64
  * chains `result = hash(child, result)` left to right, so hashing the
  * gram bytes with seed `xxhash64(blockCols...)` is bit-identical to
  * putting the block columns in front of the gram. `distinct = true`
  * additionally dedups the HASH values keeping first occurrence — the
  * blocked form applies `array_distinct` to the hash array, so that too
  * replays bit-exact.
  *
  * Why it exists (r15 measurement): every higher-order array function in
  * the builtin chain — the k `slice`s, the k−1 `zip_with`s with their
  * per-element `concat`, `array_distinct`, and the hashing `transform` —
  * is CodegenFallback, so the whole gram pipeline runs INTERPRETED per
  * element (boxed lambda variables, a Catalyst eval tree per token).
  * Measured on the sf0.1 corpus that is 2-4 ms/doc — 13-25 CPU-seconds
  * per evaluation of a 5,500-doc relation — where this expression's
  * single compiled loop does the identical arithmetic in ~20 µs/doc.
  * The per-gram work is: copy the k tokens' UTF-8 bytes around single
  * 0x20 separators into a reused buffer, then one
  * `XXH64.hashUnsafeBytes(..., seed)` — byte-identical to hashing the
  * builtin `concat`-built gram string.
  *
  * Bit-parity contract (DedupSpec asserts it against the builtin chain):
  *
  *   - k ≥ 2 follows [[graft.ops.Dedup.wordGrams]]: n ≥ k tokens yield
  *     the n−k+1 sliding grams; n < k yields ONE gram joining all tokens
  *     (`concat_ws` semantics: null tokens are SKIPPED); a null token
  *     inside a sliding gram nulls that gram, and xxhash64 over a null
  *     child leaves the running hash unchanged — so those grams hash to
  *     the seed, exactly as the builtins produce. (Token arrays from
  *     `split` never contain nulls; the cases are covered for
  *     faithfulness, not reachability.)
  *   - k = 1 follows plain `transform(toks, t => xxhash64(t))` (the
  *     [[graft.ops.Dedup.simhash64]] shape): empty array → empty array,
  *     null token → seed.
  *   - null token ARRAY → null either way; a null seed → null (never
  *     produced by xxhash64, which is non-nullable).
  *
  * Without `distinct` the output keeps duplicates (the plain minhash
  * path `array_distinct`s the gram STRINGS first): its consumers fold
  * with duplicate-insensitive reductions — MinHashSigs takes per-slot
  * minima, and min over a multiset equals min over its support — so
  * dedup would cost a hash set per row and change nothing. Do NOT feed
  * the non-distinct form into duplicate-SENSITIVE consumers (counts,
  * sums). Registered for SQL as `gram_hashes(toks, k)`.
  */
case class GramHashes(child: Expression, seed: Expression, k: Int,
    distinct: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = seed

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, seed.dataType) match {
      case (ArrayType(StringType, _), LongType) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (c, s) => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes expects (array<string>, bigint) and k > 0, got " +
          s"(${c.simpleString}, ${s.simpleString}) / $k")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, s: Any): Any =
    GramHashes.compute(a.asInstanceOf[ArrayData], k,
      s.asInstanceOf[Long], distinct)

  // Deliberately CodegenFallback, NOT a doGenCode static call (r15
  // measurement): the whole per-row loop already runs as one compiled
  // Scala call either way, so fallback costs only the boxed glue call —
  // but a fully-codegen array-producing expression whose output is then
  // extracted 64× (minhashSignatures' h0..h63 projection) was observed
  // re-evaluated PER EXTRACTION inside the fused whole-stage-codegen
  // span (5,000 docs: 0.2 s as one array column, 2.3 s as 64 columns —
  // the interpreted-HOF chain it replaced was immune precisely because
  // HOFs are CodegenFallback and break that fusion). Fallback restores
  // the old compute-once physical shape while keeping the fused loop;
  // DedupSpec's parity tests pin the semantics.

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, seed = newRight)
}

object GramHashes {

  /** Hash one gram: tokens [from, from+k) joined by ' ' into `buf`,
    * then XXH64 over the written bytes. Returns the seed when any token
    * in the window is null — matching `xxhash64(seedCols..., concat(...))`
    * on a null-propagated gram (null children leave the hash unchanged).
    */
  private def hashWindow(ss: Array[UTF8String], from: Int, k: Int,
      buf: Array[Byte], seed: Long): Long = {
    var pos = 0
    var j = from
    while (j < from + k) {
      val s = ss(j)
      if (s == null) return seed
      if (j > from) { buf(pos) = ' '; pos += 1 }
      Platform.copyMemory(s.getBaseObject, s.getBaseOffset,
        buf, Platform.BYTE_ARRAY_OFFSET + pos, s.numBytes.toLong)
      pos += s.numBytes
      j += 1
    }
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, seed)
  }

  /** First-occurrence dedup of the hash array — `array_distinct` over
    * the long values, as the blocked builtin form applies it.
    */
  private def dedup(xs: Array[Long], m: Int): Array[Long] = {
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var w = 0
    var i = 0
    while (i < m) {
      if (seen.add(xs(i))) { out(w) = xs(i); w += 1 }
      i += 1
    }
    if (w == m) out else java.util.Arrays.copyOf(out, w)
  }

  def compute(toks: ArrayData, k: Int, seed: Long, distinct: Boolean)
  : ArrayData = {
    val n = toks.numElements()
    val ss = new Array[UTF8String](n)
    var i = 0
    var maxTok = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      ss(i) = s
      if (s != null && s.numBytes > maxTok) maxTok = s.numBytes
      i += 1
    }
    val raw: Array[Long] =
      if (k == 1) {
        // transform(toks, xxhash64) semantics: per-token hashes, empty
        // in → empty out, null token → seed
        val out = new Array[Long](n)
        i = 0
        while (i < n) {
          val s = ss(i)
          out(i) =
            if (s == null) seed
            else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
              s.numBytes, seed)
          i += 1
        }
        out
      } else if (n < k) {
        // wordGrams' short-doc path: ONE gram, concat_ws(" ", toks) —
        // null tokens skipped, empty array → empty string
        var len = 0
        i = 0
        while (i < n) { if (ss(i) != null) len += ss(i).numBytes + 1; i += 1 }
        val buf = new Array[Byte](math.max(len, 0))
        var pos = 0
        i = 0
        while (i < n) {
          val s = ss(i)
          if (s != null) {
            if (pos > 0) { buf(pos) = ' '; pos += 1 }
            Platform.copyMemory(s.getBaseObject, s.getBaseOffset,
              buf, Platform.BYTE_ARRAY_OFFSET + pos, s.numBytes.toLong)
            pos += s.numBytes
          }
          i += 1
        }
        Array(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos,
          seed))
      } else {
        val m = n - k + 1
        val out = new Array[Long](m)
        val buf = new Array[Byte](k * (maxTok + 1))
        var g = 0
        while (g < m) {
          out(g) = hashWindow(ss, g, k, buf, seed)
          g += 1
        }
        out
      }
    new GenericArrayData(if (distinct) dedup(raw, raw.length) else raw)
  }

  /** Plain form: xxhash64(gram) at Spark's default seed 42, duplicates
    * kept — the minhash/simhash shape.
    */
  def apply(c: Column, k: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(c),
      Literal(42L, LongType), k, distinct = false))

  /** Blocked form: per-row seed column (e.g. `xxhash64(blockCols...)`),
    * first-occurrence hash dedup — the blockedGramKeys shape.
    */
  def apply(c: Column, k: Int, seed: Column, distinct: Boolean): Column =
    Bridge.column(GramHashes(Bridge.expression(c),
      Bridge.expression(seed), k, distinct))
}
