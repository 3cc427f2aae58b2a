package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, re-expressed
  * relationally — the "train a tokenizer on the corpus" step that sits
  * between curation and sequence chunking in an LM pipeline.
  *
  * Shape at scale: ONE pass over the corpus builds the word-frequency
  * relation (token explode → map-side-combined count). Everything after
  * runs on that relation, whose size is the corpus VOCABULARY (distinct
  * words), not the corpus — the classic reason BPE training is feasible
  * at any corpus size. Per merge round: a row-local pair explode, one
  * pair-keyed count aggregate (map-side combined), and a 1-row argmax
  * pull to the driver (count desc, then lexicographic — fully
  * deterministic), after which the merge is applied row-locally. The
  * driver round trip per round is the k-means-centroid pattern
  * (Similarity.kmeansAssign); `localCheckpoint` truncates the per-round
  * lineage exactly as in [[Dedup.connectedComponents]].
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (l, r) symbol pairs in one
    * fold over the symbol array: whenever the accumulated tail is `l`
    * and the current symbol is `r`, the tail is replaced by `l+r` —
    * matching the standard BPE convention that "aaa" under merge (a,a)
    * becomes [aa, a], and a just-merged symbol does not immediately
    * re-merge.
    */
  def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s))))

  /** Symbol-boundary sentinel for the string-encoded symbol form: a word's
    * symbols ride as `␁s1␁s2␁…␁sn␁` (U+0001 between and around symbols —
    * stripped from source words, so it can never occur inside one). A
    * merge of (l, r) is then ONE codegen'd linear regexp pass —
    * `␁l␁r(?=␁)` → `␁lr` — instead of a per-element interpreted array
    * fold: the lookahead keeps the trailing boundary unconsumed so runs
    * like [a,b,a,b] merge at every site in a single left-to-right scan,
    * while symbol-internal text can't false-match (every symbol edge in
    * the pattern is a sentinel). Left-to-right non-overlapping regex
    * semantics are exactly BPE's greedy-no-remerge convention.
    */
  private val SEP = "\u0001"

  private def applyMergeStr(j: Column, l: String, r: String): Column =
    regexp_replace(j,
      lit(java.util.regex.Pattern.quote(SEP + l + SEP + r) + "(?=" + SEP +
        ")"),
      lit(java.util.regex.Matcher.quoteReplacement(SEP + l + r)))

  private def joinedSyms: Column =
    concat(lit(SEP), array_join(col("syms"), SEP), lit(SEP))

  private def splitSyms(j: Column): Column =
    array_remove(split(j, SEP), "")

  /** The word-frequency relation BPE trains on: distinct lowercased
    * whitespace words with counts and initial character-level symbol
    * arrays.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w0"))
      .select(translate(col("w0"), SEP, "").as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))

  /** Adjacent symbol pairs of each word, count-weighted — the relation
    * each round's argmax reads. Row-local (zip_with of two shifted
    * slices); words reduced to one symbol contribute nothing.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** Train `numMerges` BPE merges. Returns the ordered merge table
    * (rank, left, right, pair_count) — the tokenizer artifact. Stops
    * early when no adjacent pair remains. Deterministic: ties break
    * (count desc, left, right).
    *
    * Rounds are BATCHED, greedy-EQUIVALENTLY. Each driver round pulls the
    * top of the ranked pair list (a ≤ 2·cap+1-row pull) and accepts a
    * consecutive prefix that provably reproduces one-merge-at-a-time
    * greedy:
    *  - prefix pairs must be pairwise DISJOINT — no shared symbol and no
    *    symbol equal to an earlier prefix pair's concatenation — which
    *    makes their counts mutually invariant (a merge of (a,b) only
    *    destroys/creates adjacencies involving a, b, or the new string
    *    "ab"), so each accepted pair's recorded count is its true
    *    greedy-round count and rank order within the batch is greedy's
    *    order;
    *  - let cStop = the count of the first NON-accepted pair (overlap,
    *    cap, or window edge). Every non-accepted pair starts ≤ cStop, and
    *    one merge can raise any pair's count by at most cStop (each new
    *    (x, ab) occurrence consumes an existing (x, a) adjacency, and
    *    (x, a) overlaps the merge so it is itself ≤ cStop) — so after i
    *    batch merges no unaccepted pair can exceed (i+1)·cStop. Position
    *    i (0-based) is therefore kept only if its count is STRICTLY >
    *    (i+1)·cStop, which also rules out lexicographic-tie upsets.
    * Degenerate case (immediate tie or overlap) falls back to the plain
    * 1-pair greedy step, so progress is guaranteed. A 32k-merge
    * production vocabulary schedules ~32k/cap driver rounds instead of
    * 32k Spark jobs on a Zipfian pair distribution; per round the cost
    * stays one vocab-sized pair aggregate + one bounded driver pull (the
    * k-means-centroid pattern), with `localCheckpoint` truncating
    * lineage every `checkpointEvery` merges as in
    * [[Dedup.connectedComponents]].
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      batchCap: Int = 16): Seq[(Int, String, String, Long)] =
    trainFromWords(
      // one corpus scan; rounds run on vocab only
      wordTable(docs, textCol).localCheckpoint(true),
      numMerges, batchCap)

  /** [[train]] on an already-materialized word table — callers that train
    * twice over one corpus (ts11's batched-vs-sequential verification
    * twin) share the corpus scan instead of paying it per train. The
    * input must be checkpointed/materialized; rounds only ever touch the
    * vocabulary relation.
    *
    * Lineage is truncated with a LAZY localCheckpoint every
    * `checkpointEvery` merges: materialization piggybacks on the next
    * round's pair-count job (no separate eager job per round), and the
    * constant one-batch-deep plan shape keeps the codegen cache warm
    * across rounds. A 32k-merge production run keeps the same bound:
    * O(checkpointEvery) regexp passes recomputed per round, never O(k).
    */
  def trainFromWords(table: DataFrame, numMerges: Int,
      batchCap: Int = 16, checkpointEvery: Int = 1)
  : Seq[(Int, String, String, Long)] = {
    var words = table
    var sinceCheckpoint = 0
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batchCap, numMerges - merges.size)
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(2 * want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // maximal consecutive disjoint prefix, capped at `want`; `used`
        // also carries each accepted pair's concatenation so no later
        // batch pair touches a symbol an earlier merge creates
        val used = scala.collection.mutable.Set.empty[String]
        var m = 0
        while (m < top.length && m < want &&
            !used.contains(top(m)._1) && !used.contains(top(m)._2)) {
          used += top(m)._1; used += top(m)._2
          used += top(m)._1 + top(m)._2
          m += 1
        }
        // the first non-accepted pair's count bounds (per merge applied)
        // how high any unaccepted pair can climb — keep position i only
        // while strictly above (i+1)·cStop
        val cStop = if (m < top.length) top(m)._3 else 0L
        val prefix = top.take(m)
        val batch = {
          val safe = prefix.zipWithIndex
            .takeWhile { case ((_, _, c), i) => c > (i + 1) * cStop }
            .map(_._1)
          if (safe.nonEmpty) safe else prefix.take(1) // plain greedy step
        }
        batch.foreach { case (l, r, c) =>
          merges += ((merges.size + 1, l, r, c))
        }
        // apply the batch on the sentinel-string form: one linear
        // codegen'd regexp pass per merge (vs the O(n²) interpreted
        // array fold of [[mergePair]])
        words = words
          .withColumn("syms", splitSyms(batch.foldLeft(joinedSyms) {
            case (j, (l, r, _)) => applyMergeStr(j, l, r)
          }))
        sinceCheckpoint += batch.length
        if (sinceCheckpoint >= checkpointEvery) {
          // LAZY checkpoint: materializes inside the next round's
          // pair-count job instead of scheduling its own eager job —
          // at batchCap=1 this halves the Spark jobs per train, and the
          // constant one-regexp-deep plan shape keeps the codegen cache
          // warm across rounds (an eager per-round job was measured at
          // no benefit; a growing 8-deep lineage recompiled per round)
          words = words.localCheckpoint(false)
          sinceCheckpoint = 0
        }
      }
    }
    merges.toSeq
  }

  /** Textbook one-merge-at-a-time greedy BPE on the DRIVER over a
    * collected word table — the independent reference oracle ts11's
    * enforced verdict compares [[trainFromWords]] against. Same
    * determinism contract (count desc, then lexicographic (l, r)) and
    * the same greedy-no-remerge application as [[mergePair]]'s fold.
    *
    * This is an ORACLE, not an engine path: collecting the vocabulary is
    * exactly the brute-force-the-truth-set move the dd-entry oracles
    * make, and is bounded by `maxVocab` (a verification corpus fits; a
    * production corpus never runs its verifier). Replacing the former
    * distributed batchCap=1 verification twin with this cut the ts11
    * headline roughly in half: the twin re-ran one ~150 ms driver
    * round-trip per merge (plan analysis + AQE stage orchestration on a
    * vocab-sized relation — pure per-query overhead), where the driver
    * reference is microseconds on the same data and is MORE independent
    * of the machinery it checks.
    */
  def referenceTrain(table: DataFrame, numMerges: Int,
      maxVocab: Int = 2000000): Seq[(Int, String, String, Long)] = {
    val rows = table.select(col("w"), col("cnt")).limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"referenceTrain is a verification oracle, capped at $maxVocab " +
        "distinct words")
    var words: Array[(Array[String], Long)] = rows.map(r =>
      (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + cnt
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((merges.size + 1, l, r, c))
        words = words.map { case (syms, cnt) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (out.nonEmpty && out.last == l && s == r)
              out(out.length - 1) = l + r
            else out += s
          (out.toArray, cnt)
        }
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge list to a corpus: each word folded through
    * every merge in rank order on the sentinel-string form (the merges
    * are plan literals — broadcast by construction, the application is
    * entirely row-local). Output: the word relation with final `syms`.
    */
  def segment(docs: DataFrame, textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame =
    segmentWords(wordTable(docs, textCol), merges)

  /** [[segment]] on an existing word table — pairs with [[trainFromWords]]
    * so train+segment over one corpus shares a single scan.
    */
  def segmentWords(table: DataFrame,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val applied = merges.foldLeft(joinedSyms) {
      case (j, (_, l, r, _)) => applyMergeStr(j, l, r)
    }
    table.withColumn("syms", splitSyms(applied))
  }
}
