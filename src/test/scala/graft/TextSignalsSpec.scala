package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, TextAnalysis}

/** Repetition quality signals and benchmark decontamination. */
class TextSignalsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupLineFrac / dupLineCharFrac closed-form cases") {
    val df = Seq(
      (1L, "aaa\nbbb\nccc"), // no dups
      (2L, "aaa\nbbb\naaa"), // 1 of 3 lines duplicated, 3 of 9 chars
      (3L, "x\n\n \nx\nx"), // blank lines dropped; 3 copies of "x"
      (4L, ""), (5L, "single")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.dupLineFrac(col("text")).as("f"),
        TextAnalysis.dupLineCharFrac(col("text")).as("cf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(df(1L) == (0.0, 0.0))
    assert(df(2L) == (1.0 / 3.0, 3.0 / 9.0))
    assert(df(3L) == (2.0 / 3.0, 2.0 / 3.0))
    assert(df(4L) == (0.0, 0.0))
    assert(df(5L) == (0.0, 0.0))
  }

  test("topNgramCharCoverage: repeated bigram dominates; short docs get 0") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham"), // "spam ham" ×3 over 26 chars → 24/26
      (2L, "one"), // < 2 tokens
      (3L, "all words here differ fully")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgramCharCoverage(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 3.0 * 8 / 26)
    assert(got(2L) == 0.0)
    // all bigrams occur once → the longest one ("differ fully") wins coverage
    assert(got(3L) == ("differ fully".length.toDouble / "all words here differ fully".length))
  }

  test("decontaminate removes exactly the docs sharing an 8-gram with the bench set") {
    val mk = (i: Long, s: String) => (i, s)
    val common = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val train = Seq(
      mk(1L, s"prefix words here $common suffix tail"), // contains the 8-gram
      mk(2L, "totally unrelated sentence with many distinct words inside it"),
      mk(3L, common) // exactly the bench text
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(common)).toDF("text")
    val contam = Dedup.contaminated(train, "doc_id", "text", bench, "text", n = 8)
      .as[Long].collect().sorted.toSeq
    assert(contam == Seq(1L, 3L))
    val clean = Dedup.decontaminate(train, "doc_id", "text", bench, "text", n = 8)
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
  }
}
