package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.Expressions._

/** Property-style tests (SURVEY §5.1): the parsers must be TOTAL — any
  * string yields a value or null, never an exception (Spark 4 runs ANSI
  * mode, so an unguarded cast would throw) — and parse_dollars must scale
  * million/billion forms for arbitrary amounts. Inputs are generated from a
  * fixed seed (deterministic CI) over printable ASCII plus adversarial
  * near-miss money/date/time shapes.
  */
class ExpressionsPropSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private def randomString(): String = {
    val n = rnd.nextInt(24)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb += (32 + rnd.nextInt(95)).toChar)
    sb.result()
  }
  private val adversarial = Seq(
    "$", "$$", "$ million", "[1]", "–", "1 h", "$1.2.3 million",
    "$999,99", "$1,000 thousand", "$,", "$1,000,00.0 billion",
    "$–15 million", "million $5", "$5million[12]", "99999999 m",
    "July 32, 1999", "0000-00-00", "January", "12345", " $ 1 , 0 0 0 ")

  test("all parsers are total over arbitrary + adversarial strings") {
    val inputs = adversarial ++ Seq.fill(400)(randomString())
    val df = inputs.toDF("s")
    // throws (failing the test) if any expression is non-total under ANSI
    val n = df.select(
      parseDollars(col("s")).as("pd"),
      parseDollars(extractMoney(stripCitations(collapseMoneyRange(col("s")))))
        .as("chain"),
      parseRunningTime(col("s")).as("rt"),
      parseDateCascade(extractDate(col("s"))).as("dt"),
      extractImdbId(col("s")).as("id"),
      flattenListString(col("s")).as("fl")).collect().length
    assert(n == inputs.length)
  }

  test("parseDollars scales million/billion for arbitrary amounts") {
    val ns = Seq.fill(200)(rnd.nextInt(100000))
    val df = ns.map(v => (v, s"$$$v million", s"$$$v billion"))
      .toDF("n", "m", "b")
    df.select(col("n"), parseDollars(col("m")).as("pm"),
        parseDollars(col("b")).as("pb")).collect()
      .foreach { r =>
        val v = r.getInt(0)
        assert(r.getDouble(1) == v * 1e6, s"million $v")
        assert(r.getDouble(2) == v * 1e9, s"billion $v")
      }
  }

  test("decimal amounts round-trip through the million branch") {
    val vals = Seq.fill(100)(rnd.nextInt(10000) / 10.0)
    val df = vals.map(v => (v, f"$$$v%.1f million")).toDF("v", "s")
    df.select(col("v"), parseDollars(col("s")).as("p")).collect()
      .foreach(r => assert(r.getDouble(1) == r.getDouble(0) * 1e6))
  }
}
