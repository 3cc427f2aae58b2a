package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source readers (SURVEY §2.1 S1-S3).
  *
  * Wiki JSON (S1, challenge.py:44-45): one top-level array of heterogeneous
  * objects whose fields are per-record polymorphic (string OR array-of-string
  * OR nested object — SURVEY §7.5 H1). Strategy: first pass infers the union
  * schema (the analogue of pandas' dict-key union at challenge.py:103), then
  * the file is re-read with every field forced to StringType — Spark then
  * yields the raw JSON text for arrays/objects ("["a","b"]"), which the
  * expression layer flattens with
  * [[graft.ops.Expressions.flattenListString]] exactly like the reference's
  * `' '.join(x) if type(x) == list else x` (challenge.py:117).
  */
object Extract {

  def readWikiJson(spark: SparkSession, path: String): DataFrame = {
    // pandas dict keys are case-sensitive and the wiki data carries both
    // "Release date" AND "Release Date" (the :89-90 rename chain depends on
    // it) — Spark's default case-insensitive resolution rejects that schema.
    spark.conf.set("spark.sql.caseSensitive", "true")
    val inferred = spark.read.option("multiLine", true).json(path).schema
    val allString = StructType(
      inferred.fieldNames.map(StructField(_, StringType, nullable = true)))
    spark.read.option("multiLine", true).schema(allString).json(path)
  }

  /** CSV with whole-file schema inference — the Spark analogue of
    * `low_memory=False` (challenge.py:47: full-pass dtype inference).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("inferSchema", true)
      // RFC-4180 doubled-quote escaping ("" inside quoted fields) — the
      // kaggle file embeds JSON-literal strings with quotes; pandas' C
      // parser handles this natively, Spark needs escape = quote char.
      .option("escape", "\"")
      .csv(path)
}
