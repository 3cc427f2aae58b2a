package graft

import org.apache.spark.sql.functions._

/** The self-check enforcement is itself load-bearing: if it silently
  * stopped withholding failed dumps, a regressed streaming/ANN entry would
  * report green forever. These cases drive [[Verify.enforceSelfCheck]]
  * through the same written-parquet path `Verify.main` uses.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  private def dump(df: org.apache.spark.sql.DataFrame): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_verify_spec_").toString + "/entry"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  test("a false `equal` verdict withholds the dump (driver sees an err)") {
    val path = dump(Seq((1L, false)).toDF("n", "equal"))
    assert(!Verify.enforceSelfCheck(spark, "spec_entry", path))
    assert(!new java.io.File(path).exists(), "failed dump must be deleted")
  }

  test("a false `recall_ok` verdict withholds the dump") {
    val path = dump(Seq((0.42, false)).toDF("recall", "recall_ok"))
    assert(!Verify.enforceSelfCheck(spark, "spec_entry", path))
    assert(!new java.io.File(path).exists())
  }

  test("a NULL verdict counts as failed (no vacuous green)") {
    val path = dump(Seq((1L, Some(true)), (2L, Option.empty[Boolean]))
      .toDF("n", "equal"))
    assert(!Verify.enforceSelfCheck(spark, "spec_entry", path))
    assert(!new java.io.File(path).exists())
  }

  test("all-true verdicts and verdict-free dumps are retained") {
    val ok = dump(Seq((1L, true), (2L, true)).toDF("n", "equal"))
    assert(Verify.enforceSelfCheck(spark, "spec_entry", ok))
    assert(new java.io.File(ok).exists(), "passing dump must survive")

    // a non-boolean column named `equal` is NOT a verdict column
    val notVerdict = dump(Seq((1L, "yes")).toDF("n", "equal"))
    assert(Verify.enforceSelfCheck(spark, "spec_entry", notVerdict))
    assert(new java.io.File(notVerdict).exists())

    val plain = dump(Seq((1L, 2L)).toDF("a", "b"))
    assert(Verify.enforceSelfCheck(spark, "spec_entry", plain))
    assert(new java.io.File(plain).exists())
  }
}
