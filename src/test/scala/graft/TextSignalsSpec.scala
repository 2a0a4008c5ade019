package graft

import org.apache.spark.sql.Column
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

  test("dupLineCharFrac: linear-time UDF matches the lambda formula, 10k lines bounded") {
    // old O(distinct × total) array-lambda formula, inlined as the test oracle
    def lambdaTier(text: Column): Column = {
      val ls = filter(transform(split(text, "\n", -1), l => trim(l)), l => length(l) > 0)
      val totalChars = aggregate(ls, lit(0), (acc, l) => acc + length(l))
      val dupChars = aggregate(array_distinct(ls), lit(0), (acc, d) =>
        acc + (size(filter(ls, x => x === d)) - 1) * length(d))
      when(totalChars > 0, dupChars.cast("double") / totalChars.cast("double"))
        .otherwise(lit(0.0))
    }
    val rnd = new scala.util.Random(7)
    val randomDocs = (1 to 40).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ =>
        Seq("  aa", "bb ", " c c ", "", "\tdd", "ee  ee")(rnd.nextInt(6))).mkString("\n"))
    }
    val rows = randomDocs.toDF("id", "text")
      .select(TextAnalysis.dupLineCharFrac(col("text")).as("fast"),
        lambdaTier(col("text")).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
    // 10k-line doc: 5k distinct + 5k repeats → exactly half the chars are
    // duplicate copies; the old quadratic form would do ~10⁸ comparisons here
    val big = ((0 until 5000).map(i => s"line-$i-" + "x" * 20) ++
      (0 until 5000).map(i => s"line-$i-" + "x" * 20)).mkString("\n")
    val t0 = System.nanoTime()
    val v = Seq(Tuple1(big)).toDF("text")
      .select(TextAnalysis.dupLineCharFrac(col("text"))).head().getDouble(0)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(v == 0.5, s"got $v")
    assert(elapsedMs < 10000, s"10k-line doc took ${elapsedMs}ms")
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

  test("meanWordLength counts word chars, not separators") {
    val m = Seq(
      (1L, "ab cd"),        // 4 chars / 2 tokens = 2.0
      (2L, "ab   cd"),      // repeated spaces must not inflate: still 2.0
      (3L, "ab\r\ncd\n\n"), // CRLF + trailing newlines: still 2.0
      (4L, "abc"), (5L, ""), (6L, "   ")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.meanWordLength(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 2.0 && m(2L) == 2.0 && m(3L) == 2.0)
    assert(m(4L) == 3.0 && m(5L) == 0.0 && m(6L) == 0.0)
  }

  test("CRLF documents pass the line-based gates identically to LF ones") {
    // a trailing '\r' on every line used to defeat the C4
    // punctuation-ending gate and the line-repeat signals
    val lf = "A good sentence here and more words to say.\nAnother good one with plenty of words.\n"
    val crlf = lf.replace("\n", "\r\n")
    val df = Seq((1L, lf), (2L, crlf)).toDF("id", "text")
    val out = df.select($"id",
      graft.pipeline.TextAnalysis.c4KeepLines($"text").as("c4"),
      graft.pipeline.TextAnalysis.dupLineFrac($"text").as("dlf"),
      graft.pipeline.TextAnalysis.ellipsisLineFrac($"text").as("elf"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === out(2L), s"CRLF diverged: $out")
    assert(out(1L)._1.nonEmpty, "C4 gate dropped clean sentences")
  }
}
