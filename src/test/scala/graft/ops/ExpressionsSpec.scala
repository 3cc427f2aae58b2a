package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.Expressions._

/** Exhaustive example tables for the scalar parsers (SURVEY §5.1), lifted
  * from the regex branches of challenge.py:125-155 (parse_dollars),
  * :182-189 (dates), :193-199 (running time).
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(col2: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      inputs: Seq[String]): Seq[Option[Double]] = {
    val df = inputs.toDF("s")
    df.select(col2(col("s")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("parseDollars: million / billion / comma / junk branches") {
    val cases = Seq(
      "$20 million" -> Some(2.0e7),
      "$12.5 million" -> Some(1.25e7),
      "$12.5 millon" -> Some(1.25e7),      // abbreviated spelling
      "$ 3 million" -> Some(3.0e6),
      "$1.2 billion" -> Some(1.2e9),
      "$1.1 billon" -> Some(1.1e9),
      "$123,456,789" -> Some(1.23456789e8),
      "$2,500,000" -> Some(2.5e6),
      "$900,000" -> Some(9.0e5),
      // dot-grouped: comma-strip leaves "1.234.567", where the reference's
      // float() raises — our total form yields null instead of throwing
      "$1.234.567" -> None,
      "$1.234" -> Some(1.234),              // single dot = decimal, like ref
      "$99" -> None,                        // matches neither form
      "N/A" -> None,
      "twenty bucks" -> None)
    val got = parse(parseDollars, cases.map(_._1))
    cases.zip(got).foreach { case ((in, exp), g) =>
      assert(g == exp, s"parseDollars($in)")
    }
  }

  test("parseDollars null-safe on null input") {
    val got = Seq((null: String)).toDF("s")
      .select(parseDollars(col("s"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("money range collapse keeps upper bound; citations stripped") {
    val df = Seq("$10–15 million", "$10-20 million", "$200 million[2] ")
      .toDF("s")
    val got = df.select(parseDollars(extractMoney(
      stripCitations(collapseMoneyRange(col("s"))))).as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.5e7, 2.0e7, 2.0e8))
  }

  test("extractImdbId: tt + 7 digits, null on no match") {
    val df = Seq("https://www.imdb.com/title/tt0098987/", "no id here")
      .toDF("s")
    val got = df.select(extractImdbId(col("s"))).collect()
    assert(got(0).getString(0) == "tt0098987")
    assert(got(1).isNullAt(0))
  }

  test("parseRunningTime: minute/hour/h-m forms; unparseable → null") {
    val cases = Seq(
      "102 minutes" -> Some(102.0),
      "1 hour 42 minutes" -> Some(102.0),
      "2 h 15 m" -> Some(135.0),
      "90 m" -> Some(90.0),
      "0 hours 47 minutes" -> Some(47.0),
      "eighty minutes" -> None)
    val got = parse(parseRunningTime, cases.map(_._1))
    cases.zip(got).foreach { case ((in, exp), g) =>
      assert(g == exp, s"parseRunningTime($in)")
    }
  }

  test("date cascade parses all four generalized shapes") {
    val df = Seq("July 11, 1990", "1990-07-11", "March 1987", "1991")
      .toDF("s")
    val got = df
      .select(date_format(parseDateCascade(col("s")), "yyyy-MM-dd").as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1990-07-11", "1990-07-11", "1987-03-01", "1991-01-01"))
  }

  test("flattenListString joins JSON arrays with spaces, passes strings") {
    val df = Seq("""["$5", "million"]""", "$7 million", null)
      .toDF("s")
    val got = df.select(flattenListString(col("s"))).collect()
    assert(got(0).getString(0) == "$5 million")
    assert(got(1).getString(0) == "$7 million")
    assert(got(2).isNullAt(0))
  }

  test("coalesceIfZero: only zero (not null) takes the fallback") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (0.0, 5.0), (3.0, 5.0), (null, 5.0))
      .toDF("k", "w")
    val got = df.select(coalesceIfZero(col("k"), col("w"))).collect()
    assert(got(0).getDouble(0) == 5.0)  // zero → fallback
    assert(got(1).getDouble(0) == 3.0)  // value kept
    assert(got(2).isNullAt(0))          // null stays null (quirk Q7)
  }
}
