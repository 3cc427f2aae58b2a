package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("language id picks the language with most marker hits") {
    val df = Seq(
      "the cat of the house is a friend of the dog",
      "le chat et la maison et les amis des chiens",
      "el gato y los perros y las casas que existen",
      "xyzzy qwerty plugh").toDF("text")
    val got = df.select(TextOps.languageId(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "fr", "es", "und"))
  }

  test("quality features: counts and ratios from integer arithmetic") {
    val df = Seq("the quick fox! runs.").toDF("text")
    val feats = TextOps.qualityFeatures(col("text"))
      .map { case (n, c) => c.as(n) }
    val r = df.select(feats: _*).collect().head
    assert(r.getAs[Long]("n_chars_q") == 20L)
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Double]("punct_ratio") == 0.1) // '!' and '.'
  }

  test("token counts: whitespace vs regex tokens") {
    val df = Seq("a b  c-d").toDF("text")
    val r = df.select(
      TextOps.wordCount(col("text")).as("ws"),
      TextOps.regexTokenCount(col("text")).as("re")).collect().head
    assert(r.getAs[Int]("ws") == 3)   // a, b, c-d
    assert(r.getAs[Int]("re") == 5)   // a, b, c, -, d
  }

  test("fingerprints: md5 distinct on edit, rolling minhash deterministic") {
    val df = Seq("abcdefghijklmnop", "abcdefghijklmnoX", "abcdefghijklmnop")
      .toDF("text")
    val r = df.select(TextOps.fingerprintMd5(col("text")).as("m"),
      TextOps.rollingMinHash(col("text")).as("r")).collect()
    assert(r(0).getString(0) != r(1).getString(0))
    assert(r(0).getLong(1) == r(2).getLong(1)) // same text → same fingerprint
  }
}
