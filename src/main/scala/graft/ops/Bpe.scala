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

  /** The word-frequency relation BPE trains on: distinct lowercased
    * whitespace words with counts and initial character-level symbol
    * arrays.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
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
    * (rank, left, right, pair_count) — the tokenizer artifact — built
    * from one 3-column driver pull per round. Stops early when no
    * adjacent pair remains. Deterministic: ties break (count desc,
    * left, right).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
  : Seq[(Int, String, String, Long)] = {
    var words = wordTable(docs, textCol)
      .localCheckpoint(true) // one corpus scan; rounds run on vocab only
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    for (k <- 1 to numMerges if !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((k, l, r, c))
        words = words
          .withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge list to a corpus: each word's symbol array
    * folded through every merge in rank order (the merges are plan
    * literals — broadcast by construction, the application is entirely
    * row-local). Output: the word relation with final `syms`.
    */
  def segment(docs: DataFrame, textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val applied = merges.foldLeft(col("syms")) {
      case (c, (_, l, r, _)) => mergePair(c, l, r)
    }
    wordTable(docs, textCol).withColumn("syms", applied)
  }
}
