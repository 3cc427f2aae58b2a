package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the expected merges and stops when pairs run out") {
    // "ab" ×3, "ac" ×1: round 1 must merge (a,b) at count 3; round 2
    // the only remaining pair is (a,c); round 3 has no pairs → early stop
    val docs = Seq((1L, "ab ab ab ac")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5)
    assert(merges == Seq((1, "a", "b", 3L), (2, "a", "c", 1L)), merges)
  }

  test("argmax ties break lexicographically (deterministic training)") {
    // (a,b) and (c,d) both occur twice → (a,b) wins the tie
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 1)
    assert(merges == Seq((1, "a", "b", 2L)), merges)
  }

  test("greedy left-to-right merge: aaa -> [aa, a], aaaa -> [aa, aa]") {
    val df = Seq("aaa", "aaaa").toDF("w")
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .withColumn("merged", Bpe.mergePair(col("syms"), "a", "a"))
    val got = df.select("w", "merged").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("aaa") == List("aa", "a"), got)
    assert(got("aaaa") == List("aa", "aa"), got)
  }

  test("batched rounds reproduce 1-at-a-time greedy exactly") {
    // a corpus with colliding created symbols and tie-heavy tails — the
    // regimes where unsafe batching diverges from greedy: merging (a,b)
    // boosts pairs involving the created "ab" string, ties force the
    // single-step fallback
    val docs = Seq(
      (1L, "the cat sat on the mat the cat saw the rat"),
      (2L, "that thin thing thought the thick cat chased the rat"),
      (3L, "abab abab ababab ab ab cd cd cdcd the the then than"),
      (4L, "sat mat rat cat bat that chat what a ab abc abcd")
    ).toDF("doc_id", "text")
    val greedy = Bpe.train(docs, "text", numMerges = 24, batchCap = 1)
    val batched = Bpe.train(docs, "text", numMerges = 24)
    // the driver-side reference oracle (ts11's verdict source) must agree
    // with BOTH distributed trains on the same adversarial corpus
    val reference = Bpe.referenceTrain(
      Bpe.wordTable(docs, "text"), numMerges = 24)
    assert(reference == greedy,
      s"driver reference diverged from greedy:\n$reference\nvs\n$greedy")
    assert(batched == greedy,
      s"batched diverged from greedy:\n$batched\nvs\n$greedy")
  }

  test("sentinel-string merge application equals the mergePair array fold") {
    // overlapping runs, created-symbol collisions, symbol-internal text
    // that must NOT false-match (xa·by under merge (a,b)): the regimes
    // where a string-rewrite shortcut could diverge from the fold
    val docs = Seq((1L,
      "aaa aaaa abab ababab xaby ab ba aab abb the then")).toDF("d", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val viaString = Bpe.segment(docs, "text", merges)
      .select(col("w"), col("syms").as("via_string"))
    val viaFold = Bpe.wordTable(docs, "text")
      .select(col("w"), merges.foldLeft(col("syms")) {
        case (c, (_, l, r, _)) => Bpe.mergePair(c, l, r)
      }.as("via_fold"))
    val both = viaString.join(viaFold, "w")
    assert(both.filter(not(col("via_string") === col("via_fold")))
      .count() == 0,
      both.collect().mkString("\n"))
  }

  test("segment preserves concatenation and compresses the stream") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the thin thing that the cat saw"),
      (3L, "mat cat that thin on saw the the")
    ).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 8)
    assert(merges.nonEmpty && merges.size <= 8)
    val seg = Bpe.segment(docs, "text", merges)
    val broken = seg
      .filter(array_join(col("syms"), "") =!= col("w")).count()
    assert(broken == 0, "merge application must preserve every word")
    val Array(toks, chars) = seg
      .agg(sum(col("cnt") * size(col("syms"))),
        sum(col("cnt") * length(col("w"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(toks < chars, s"expected compression: $toks tokens vs $chars")
    // the most frequent word must have fused into few symbols
    val theSyms = seg.filter(col("w") === "the")
      .select("syms").collect()(0).getSeq[String](0)
    assert(theSyms.size <= 2, s"'the' should be mostly fused: $theSyms")
  }
}
