package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual probe (r17, VERDICT r16 #2): is pipe_minhash's ~1.7×-vs-r15
  * reading the r16 banding refactor or the environment?
  *
  * The r16 refactor's only plan delta on the self-join door (verified by
  * the r16 judge's plan diff) is the `sig.isNotNull` filter bandExplode
  * inserts before banding. A/B alternates, in one JVM over the exact
  * pipe_minhash fixture:
  *  - A: the current door, `Dedup.minhashCandidates`
  *  - B: the r15 shape — identical signature pass and banding but NO
  *    null filter (reconstructed inline; the fixture has no null text,
  *    so results are identical)
  *  - C: the shared signature pass alone (where does the time live?)
  *
  * A ≈ B exonerates the refactor: the residual inflation is then the
  * same environment factor the untouched keys (pipe_audio,
  * pipe_ann_ivfpq, geo_scan_overlay) show in the same windows.
  *
  * Run: SPARK_GRAFT_SF_DIR=… Test/runMain graft.ProbeMinhashAB
  */
object ProbeMinhashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = d.unionAll(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))

    def force(df: DataFrame): Unit = { df.agg(count(lit(1))).collect(); () }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // A: the current door
    def variantA(): DataFrame =
      graft.pipeline.Dedup.minhashCandidates(all, "doc_id", "text")

    // the r15 stages, parameterized: `withFilter` replays bandExplode's
    // sig.isNotNull (absent in r15), `withCap` replays capBuckets
    // (present in r15) — isolating which one carries the regression
    def variant(withFilter: Boolean, withCap: Boolean): DataFrame = {
      val numHashes = 64; val bands = 8; val shingleK = 5
      val r = numHashes / bands
      val withSig = all
        .select(col("doc_id").as("id"),
          graft.pipeline.TextAnalysis.normalized(col("text")).as("__norm"))
        .select(col("id"), graft.pipeline.Dedup.minhashSigNative(
          col("__norm"), shingleK, numHashes).as("sig"))
      val src = if (withFilter) withSig.filter(col("sig").isNotNull) else withSig
      val banded = src.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
        .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
      val capped = if (!withCap) banded else {
        val sizes = banded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bsz"))
        banded.join(sizes.filter(col("__bsz") <= 100000),
          Seq("band", "bucket")).drop("__bsz")
      }
      val l = capped.select(col("band"), col("bucket"),
        col("id").as("id_a"), col("sig").as("sig_a"))
      val rgt = capped.select(col("band"), col("bucket"),
        col("id").as("id_b"), col("sig").as("sig_b"))
      l.join(rgt, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => (x === y).cast("int")),
            lit(0), (acc, v) => acc + v).cast("double") / numHashes)
            .as("jaccard_est"))
    }
    def variantB(): DataFrame = variant(withFilter = false, withCap = true)
    def variantE(): DataFrame = variant(withFilter = true, withCap = false)

    // C: the signature pass alone
    def variantC(): DataFrame = all
      .select(col("doc_id").as("id"),
        graft.pipeline.TextAnalysis.normalized(col("text")).as("__norm"))
      .select(col("id"), graft.pipeline.Dedup.minhashSigNative(
        col("__norm"), 5, 64).as("sig"))
      .select(col("id"), element_at(col("sig"), 1).as("s0"))

    // result parity first (no nulls in the fixture → A == B)
    val na = variantA().count(); val nb = variantB().count()
    require(na == nb, s"A=$na B=$nb diverged — fixture has nulls?")

    force(variantA()); force(variantB()); force(variantC()); force(variantE())
    var (ta, tb, tc, te) = (List.empty[Double], List.empty[Double],
      List.empty[Double], List.empty[Double])
    for (_ <- 1 to 4) {
      ta ::= time(force(variantA()))
      tb ::= time(force(variantB()))
      tc ::= time(force(variantC()))
      te ::= time(force(variantE()))
    }
    def fmt(l: List[Double]) =
      l.reverse.map(v => f"$v%.2f").mkString(" ") + f" (min ${l.min}%.2f)"
    println(s"[ProbeMinhashAB] sf=$sfDir pairs=$na")
    println(s"[ProbeMinhashAB] A current door (filter+cap): ${fmt(ta)}")
    println(s"[ProbeMinhashAB] B r15 shape    (cap only)  : ${fmt(tb)}")
    println(s"[ProbeMinhashAB] E filter only              : ${fmt(te)}")
    println(s"[ProbeMinhashAB] C signature job            : ${fmt(tc)}")
    println(f"[ProbeMinhashAB] A/B ratio = ${ta.min / tb.min}%.3f — " +
      "above ~1.1 convicts the sig.isNotNull filter (pushed below the " +
      "projection, it re-evaluates normalize+sign per row)")
    spark.stop()
  }
}
