package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, Similarity}

/** SemDeDup-style semantic deduplication: cluster → within-cluster
  * cosine pairs → connected duplicate groups → one representative per
  * group (lowest centroid cosine, ties to smaller id). The spec
  * reconstructs the expected partition with a test-side union-find over
  * brute-force within-cell pairs and pins the representative rule and
  * the hot-cell backstop. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Threshold = 0.95

  /** 3 well-separated directions; per direction a tight near-dup group
    * (ids 0-2 / 10-12 / 20-22 rotated by small angles) plus one clearly
    * distinct member (ids 3 / 13 / 23 at 45°-ish). Deterministic. */
  private def fixture: Seq[(Long, Seq[Float])] = {
    def rot(base: Int, eps: Double): Seq[Float] = {
      val v = Array.fill(6)(0.0)
      v(base) = math.cos(eps); v((base + 1) % 6) = math.sin(eps)
      v.map(_.toFloat).toSeq
    }
    (for (g <- 0 to 2) yield {
      val base = g * 2
      Seq(
        (g * 10L, rot(base, 0.0)),
        (g * 10L + 1, rot(base, 0.05)),
        (g * 10L + 2, rot(base, 0.09)),
        (g * 10L + 3, rot(base, 0.7))) // cos(0.7)≈0.76 < threshold to id0
    }).flatten
  }

  test("components match a brute-force union-find; one rep per group") {
    val df = fixture.toDF("vec_id", "embedding")
    val index = Similarity.trainIvf(df, "vec_id", "embedding", nlist = 3,
      seed = 7L, maxTrainRows = 1000)
    val out = Similarity.semDedup(df, "vec_id", "embedding", index, Threshold)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.length === fixture.length, "every row labeled exactly once")

    // test-side brute force: pairs within the SAME assigned cell with
    // cosine >= threshold, then union-find with min-id labels
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val vecOf = fixture.toMap.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      id -> v.map(_ / n)
    }
    def cos(a: Long, b: Long): Double =
      vecOf(a).zip(vecOf(b)).map { case (x, y) => x * y }.sum
    val ids = fixture.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b && cellOf(a) == cellOf(b) &&
        cos(a, b) >= Threshold) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedComp = ids.map(i => i -> find(i)).toMap
    out.foreach { case (id, _, _, comp, _) =>
      assert(comp === expectedComp(id), s"component of $id")
    }
    // the tight trios must actually have merged (fixture sanity)
    assert(expectedComp(1L) === expectedComp(0L) &&
      expectedComp(2L) === expectedComp(0L))
    assert(expectedComp(3L) === 3L, "the distinct member stays a singleton")

    // representative rule: kept row = min (centroid_cos, id) per component
    out.groupBy(_._4).foreach { case (comp, members) =>
      val kept = members.filter(_._5)
      assert(kept.length === 1, s"component $comp: ${kept.length} kept")
      val want = members.minBy(m => (m._3, m._1))
      assert(kept.head._1 === want._1,
        s"component $comp kept ${kept.head._1}, expected ${want._1}")
    }
    // no two survivors in the same cell are still near-dups
    val keptRows = out.filter(_._5)
    for (a <- keptRows; b <- keptRows if a._1 < b._1 && a._2 == b._2)
      assert(cos(a._1, b._1) < Threshold, s"kept pair ${a._1},${b._1}")

    // the filter view returns exactly the kept ids with original columns
    val filtered = Similarity.semDedupFilter(df, "vec_id", "embedding",
      index, Threshold)
    assert(filtered.columns.toSeq === Seq("vec_id", "embedding"))
    assert(filtered.select("vec_id").as[Long].collect().toSet ===
      keptRows.map(_._1).toSet)
  }

  test("hot-cell backstop: an over-cap cell contributes no edges, keeps all") {
    val df = fixture.toDF("vec_id", "embedding")
    val index = Similarity.trainIvf(df, "vec_id", "embedding", nlist = 3,
      seed = 7L, maxTrainRows = 1000)
    val out = Similarity.semDedup(df, "vec_id", "embedding", index,
      Threshold, maxCellRows = 1)
    assert(out.filter(col("kept")).count() === fixture.length.toLong,
      "capped cells must degrade to no-dedup, never drop rows")
  }

  test("exact duplicates always collapse to one survivor") {
    val base = fixture.toDF("vec_id", "embedding")
    val twins = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val df = base.unionAll(twins)
    val index = Similarity.trainIvf(base, "vec_id", "embedding", nlist = 3,
      seed = 7L, maxTrainRows = 1000)
    val out = Similarity.semDedup(df, "vec_id", "embedding", index, Threshold)
    val byId = out.collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    fixture.map(_._1).foreach { id =>
      val (c0, k0) = byId(id)
      val (c1, k1) = byId(id + 1000)
      assert(c0 === c1, s"twin of $id landed in another component")
      assert(!(k0 && k1), s"both twins of $id kept")
      // the smaller id wins the tie (identical centroid cosine)
      assert(k0 || byId.exists { case (_, (c, k)) => c == c0 && k },
        s"component of $id has no survivor")
    }
  }
}
