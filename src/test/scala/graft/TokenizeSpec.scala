package graft

import org.apache.spark.sql.functions._
import graft.plans.{AlnumNormalize, AlnumTokens}

/** Native AlnumTokens/AlnumNormalize vs the regex chains they replace:
  * byte-exact equality on ASCII, unicode (incl. special-casing
  * lowercase expansions like İ and dotless forms), supplementary code
  * points, whitespace variants, empties and nulls — compared through
  * the ACTUAL former expressions, not a re-implementation.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "The Quick  Brown-Fox, JUMPS! over 42 lazy dogs.",
    "  leading and trailing  ",
    "punct...only!!!",
    "",
    "a",
    "ALLCAPS WITH 123 NUMBERS",
    "tabs\tand\nnewlines\rhere",
    "unicode İstanbul STRASSE ß Σίσυφος",
    "emoji 😀 inside 😀text",
    "mixed汉字chinese 汉 字 tokens",
    "double  space   runs    everywhere",
    "1a2b3c"
  )

  test("AlnumTokens == filter(split(regexp_replace(lower(...)))) chain") {
    val df = (texts :+ null).toDF("text")
    val out = df.select(
      AlnumTokens($"text").as("native"),
      filter(split(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "),
        "\\s+"), x => x =!= "").as("chain")).collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} chain=${r.getSeq[String](1)}")
    }
  }

  test("AlnumNormalize == trim(regexp_replace(regexp_replace(lower)))") {
    val df = (texts :+ null).toDF("text")
    val out = df.select(
      AlnumNormalize($"text").as("native"),
      trim(regexp_replace(regexp_replace(lower($"text"),
        "[^a-z0-9 ]", ""), " +", " ")).as("chain")).collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getString(0) == r.getString(1),
        s"native='${r.getString(0)}' chain='${r.getString(1)}'")
    }
  }

  test("executes inside whole-stage codegen over a generated corpus") {
    val df = spark.range(2000).select(concat_ws(" ",
      lit("Prefix-Text!"),
      col("id").cast("string"),
      lit("MIXED case,tokens;here"),
      (col("id") % 97).cast("string")).as("text"))
    val a = df.select(explode(AlnumTokens($"text")).as("t"))
      .groupBy("t").count().agg(count(lit(1)), sum("count")).head()
    val b = df.select(explode(filter(split(regexp_replace(lower($"text"),
        "[^a-z0-9 ]", " "), "\\s+"), x => x =!= "")).as("t"))
      .groupBy("t").count().agg(count(lit(1)), sum("count")).head()
    assert(a == b)
    val na = df.select(AlnumNormalize($"text").as("n"))
      .agg(sum(length($"n")), count(lit(1))).head()
    val nb = df.select(trim(regexp_replace(regexp_replace(lower($"text"),
        "[^a-z0-9 ]", ""), " +", " ")).as("n"))
      .agg(sum(length($"n")), count(lit(1))).head()
    assert(na == nb)
  }
}
