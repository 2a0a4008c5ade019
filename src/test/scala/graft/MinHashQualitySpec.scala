package graft

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHash quality harness — the dedup analog of the ANN recall@k sweep:
  * estimated-vs-exact Jaccard and band-collision recall over the (r, b)
  * banding grid, on a seeded fixture of planted pairs spanning the
  * similarity range. Drives the SHIPPED text path end to end
  * ([[Dedup.minhashCandidates]]: normalize → native signature → banding →
  * bucket join), not a parallel reimplementation. Summary numbers land in
  * PERF.md ("MinHash banding sweep"). */
class MinHashQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NumHashes = 64
  private val ShingleK = 5

  /** Planted pairs: doc B shares a prefix of doc A (char shingles of the
    * shared prefix coincide), with a fresh random suffix. `frac` sweeps
    * the overlap, giving pairs across the whole true-jaccard range; the
    * TRUE jaccard per pair is computed exactly from the shipped shingle
    * sets, not assumed from the construction. */
  private lazy val corpus = {
    val rng = new scala.util.Random(0xded09L)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def randText(n: Int): String =
      (0 until n).map(_ => alpha(rng.nextInt(26))).mkString
    val docLen = 240
    val rows = for {
      (frac, tier) <- Seq(0.25, 0.45, 0.65, 0.85, 1.0).zipWithIndex
      p <- 0 until 30
    } yield {
      val a = randText(docLen)
      val keep = (docLen * frac).toInt
      val b = if (frac >= 1.0) a else a.take(keep) + randText(docLen - keep)
      val pid = tier * 1000 + p
      Seq((pid * 2L, a, pid), (pid * 2L + 1, b, pid))
    }
    rows.flatten.toDF("doc_id", "text", "pair")
  }

  /** (pair id, exact jaccard) of every planted pair, via the shipped
    * shingle sets. */
  private lazy val exactJ: Map[Int, Double] = {
    val sh = corpus
      .select(col("doc_id"), col("pair"),
        TextAnalysis.normalized(col("text")).as("__norm"))
      .select(col("doc_id"), col("pair"),
        Dedup.shingleHashesNorm(col("__norm"), ShingleK).as("sh"))
    val a = sh.filter(col("doc_id") % 2 === 0)
      .select(col("pair"), col("sh").as("sh_a"))
    val b = sh.filter(col("doc_id") % 2 === 1)
      .select(col("pair"), col("sh").as("sh_b"))
    a.join(b, "pair")
      .select(col("pair"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .as[(Int, Double)].collect().toMap
  }

  /** pair → (collided?, |est − exact|) under one banding config. */
  private def sweep(bands: Int): Map[Int, (Boolean, Double)] = {
    val cands = Dedup.minhashCandidates(corpus, "doc_id", "text",
        numHashes = NumHashes, bands = bands, shingleK = ShingleK)
      .filter((col("id_a") / 2).cast("long") ===
        (col("id_b") / 2).cast("long")) // planted pairs only
      .select((col("id_a") / 2).cast("int").as("pair"), col("jaccard_est"))
      .as[(Int, Double)].collect().toMap
    exactJ.map { case (p, j) =>
      p -> (cands.contains(p), cands.get(p).map(e => math.abs(e - j)).getOrElse(0.0))
    }
  }

  test("banding sweep: empirical collision recall tracks 1-(1-j^r)^b per tier") {
    val bins = Seq((0.0, 0.2), (0.2, 0.4), (0.4, 0.6), (0.6, 0.8), (0.8, 1.01))
    val table = for (b <- Seq(4, 8, 16, 32)) yield {
      val r = NumHashes / b
      val res = sweep(b)
      val perBin = bins.map { case (lo, hi) =>
        val pairs = exactJ.filter { case (_, j) => j >= lo && j < hi }.keys.toSeq
        if (pairs.isEmpty) (0, Double.NaN, Double.NaN)
        else {
          val rec = pairs.count(res(_)._1).toDouble / pairs.size
          val theo = pairs.map(p => 1.0 - math.pow(1.0 - math.pow(exactJ(p), r), b))
            .sum / pairs.size
          (pairs.size, rec, theo)
        }
      }
      (b, r, perBin)
    }
    info(f"MinHash banding sweep (64 hashes, k=$ShingleK char shingles, " +
      "150 planted pairs):")
    info("bands r | j-bin: n empirical theoretical")
    for ((b, r, perBin) <- table; ((lo, hi), (n, rec, theo)) <- bins.zip(perBin)
        if n > 0)
      info(f"b=$b%2d r=$r%2d | [$lo%.1f,$hi%.1f): n=$n%3d rec=$rec%.3f theo=$theo%.3f")
    for ((b, r, perBin) <- table; ((n, rec, theo)) <- perBin if n >= 10) {
      // binomial noise over n pairs: pin to the theory curve within a
      // generous band — this is a drift canary, not a statistics exam
      val tol = 0.12 + 1.5 * math.sqrt(math.max(theo * (1 - theo), 0.01) / n)
      assert(math.abs(rec - theo) <= tol,
        f"b=$b r=$r: empirical $rec%.3f vs theoretical $theo%.3f (tol $tol%.3f)")
    }
    // more bands = more candidates, monotonically (same pairs, wider net):
    // recall per bin must not DROP as b grows, within binomial slack
    for (((lo, hi), i) <- bins.zipWithIndex) {
      val recs = table.map(_._3(i)).collect { case (n, rec, _) if n >= 10 => rec }
      for (Seq(lo2, hi2) <- recs.sliding(2).toSeq if recs.size >= 2)
        assert(hi2 >= lo2 - 0.15, s"recall not ~monotone in bands at bin $i: $recs")
    }
  }

  test("estimator quality: |jaccard_est - exact| small at 64 hashes") {
    // the estimator's std is sqrt(j(1-j)/64) <= 0.0625; pin mean abs error
    // over recalled pairs and a hard per-pair cap at 4 sigma
    val res = sweep(16)
    val errs = res.collect { case (_, (true, e)) => e }
    assert(errs.nonEmpty)
    val mae = errs.sum / errs.size
    info(f"estimator MAE over ${errs.size} recalled pairs: $mae%.4f")
    assert(mae <= 0.06, f"MinHash estimator MAE $mae%.4f > 0.06")
    assert(errs.max <= 0.25, f"worst estimator error ${errs.max}%.4f > 0.25")
  }

  test("operating point: default 8x8 banding separates near-dups from background") {
    val res = sweep(8) // threshold (1/8)^(1/8) ~ 0.77
    val hi = exactJ.filter(_._2 >= 0.8).keys.toSeq
    val lo = exactJ.filter(_._2 <= 0.3).keys.toSeq
    assert(hi.nonEmpty && lo.nonEmpty)
    val hiRec = hi.count(res(_)._1).toDouble / hi.size
    val loRec = lo.count(res(_)._1).toDouble / lo.size
    info(f"8x8: recall(j>=0.8)=$hiRec%.3f, recall(j<=0.3)=$loRec%.3f")
    assert(hiRec >= 0.9, f"near-dups missed at the operating point: $hiRec%.3f")
    assert(loRec <= 0.2, f"background flood at the operating point: $loRec%.3f")
  }
}
