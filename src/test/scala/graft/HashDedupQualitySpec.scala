package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality pins for the two hash-sketch dedup tiers, completing the
  * evidence-backed-parameters theme (ANN recall sweeps, MinHash banding
  * sweep):
  *
  *  - **SimHash chunk bucketing is EXACT, not probabilistic**: by the
  *    pigeonhole argument a pair within hamming ≤ 3 of a 64-bit hash must
  *    agree on one of the four 16-bit chunks, so `nearDupSimhash` must
  *    return exactly the brute-force pair set — pinned with set equality
  *    (no tolerance) on a 200-doc corpus.
  *  - **Sign-LSH OR-amplification follows 1-(1-p^bits)^tables** with
  *    p = 1 - acos(c)/π (the random-hyperplane collision law the
  *    `nearDupEmbedding` scaladoc quotes): planted pairs at EXACT cosine
  *    (orthonormal construction) swept over table counts, empirical
  *    recall pinned to the law within binomial noise and monotone in
  *    tables. */
class HashDedupQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash chunk-bucket candidates == brute force over all pairs (pigeonhole)") {
    val rng = new scala.util.Random(411)
    val vocab = (0 until 400).map(i => s"tok$i")
    // clusters of near-identical docs (a few token swaps) + background
    val docs = (0 until 40).flatMap { c =>
      val base = Seq.fill(60)(vocab(rng.nextInt(vocab.size)))
      (0 until 5).map { v =>
        val mutated = base.map(t =>
          if (rng.nextInt(20) == 0) vocab(rng.nextInt(vocab.size)) else t)
        (c * 5L + v, mutated.mkString(" "))
      }
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.nearDupSimhash(df, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // brute force from the same shipped fingerprints
    val sims = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("sim"))
      .as[(Long, Long)].collect()
    val expected = (for {
      i <- sims.indices; j <- (i + 1) until sims.length
      h = java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2)
      if h <= 3
    } yield {
      val (a, b) = if (sims(i)._1 < sims(j)._1) (sims(i)._1, sims(j)._1)
        else (sims(j)._1, sims(i)._1)
      (a, b, h)
    }).toSet
    assert(expected.nonEmpty, "fixture produced no close pairs — weaken mutation")
    assert(got == expected,
      s"simhash candidates not exact: missing=${expected -- got}, extra=${got -- expected}")
  }

  test("sign-LSH recall tracks 1-(1-p^bits)^tables across table counts") {
    val dims = 32
    val bits = 12
    val rng = new scala.util.Random(917)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def randUnit(): Array[Double] = unit(Array.fill(dims)(rng.nextGaussian()))
    // b = c·a + √(1-c²)·u with u ⊥ a (Gram-Schmidt) → cosine(a,b) = c EXACTLY
    def mate(a: Array[Double], c: Double): Array[Double] = {
      val r = randUnit()
      val dot = a.zip(r).map { case (x, y) => x * y }.sum
      val u = unit(r.zip(a).map { case (x, y) => x - dot * y })
      a.zip(u).map { case (x, y) => c * x + math.sqrt(1 - c * c) * y }
    }
    val tiers = Seq(0.99, 0.95, 0.9, 0.8, 0.6)
    val pairs = for {
      (c, tier) <- tiers.zipWithIndex
      p <- 0 until 40
    } yield {
      val a = randUnit()
      val pid = tier * 1000 + p
      (pid, c, Seq((pid * 2L, a.toSeq), (pid * 2L + 1, mate(a, c).toSeq)))
    }
    val df = pairs.flatMap(_._3).toDF("vec_id", "embedding")
    val cOf: Map[Int, Double] = pairs.map(p => (p._1, p._2)).toMap

    val results = for (tables <- Seq(1, 2, 4, 8)) yield {
      val found = Dedup.nearDupEmbedding(df, "vec_id", "embedding",
          threshold = 0.5, bits = bits, tables = tables)
        .filter((col("id_a") / 2).cast("long") === (col("id_b") / 2).cast("long"))
        .select((col("id_a") / 2).cast("int"))
        .as[Int].collect().toSet
      val perTier = tiers.zipWithIndex.map { case (c, tier) =>
        val ids = cOf.keys.filter(_ / 1000 == tier).toSeq
        val rec = ids.count(found).toDouble / ids.size
        val p = 1.0 - math.acos(c) / math.Pi
        val theo = 1.0 - math.pow(1.0 - math.pow(p, bits), tables)
        (c, rec, theo)
      }
      (tables, perTier)
    }
    info(s"sign-LSH recall (bits=$bits, 40 pairs/tier):")
    for ((t, perTier) <- results; (c, rec, theo) <- perTier)
      info(f"tables=$t%2d cos=$c%.2f rec=$rec%.3f theo=$theo%.3f")
    for ((t, perTier) <- results; (c, rec, theo) <- perTier) {
      val tol = 0.12 + 1.5 * math.sqrt(math.max(theo * (1 - theo), 0.01) / 40)
      assert(math.abs(rec - theo) <= tol,
        f"tables=$t cos=$c%.2f: rec $rec%.3f vs theo $theo%.3f (tol $tol%.3f)")
    }
    // OR-amplification is monotone in tables per tier (within noise)
    for (i <- tiers.indices) {
      val recs = results.map(_._2(i)._2)
      for (Seq(a, b) <- recs.sliding(2).toSeq)
        assert(b >= a - 0.15, s"recall not ~monotone in tables at tier $i: $recs")
    }
  }
}
