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
