package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._
import graft.join.SpatialJoin

/** Randomized brute-force equivalence for the nearest-join family: mixed
  * point/rectangle frames with duplicated coordinates (tie pressure),
  * random k / maxDistance / cellSize / exclusive, checked against a
  * driver-side ties-inclusive kNN computed with the same JTS distance.
  * Fixed seed — failures reproduce. Complements SpatialJoinSpec's
  * hand-built cases by sweeping fixture shapes no one thought to write:
  * boundary-straddling rects, equidistant clusters, degenerate
  * empty-result radii. */
class NearestRandomSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteNearest(
      probe: Seq[(Long, org.locationtech.jts.geom.Geometry)],
      build: Seq[(Long, org.locationtech.jts.geom.Geometry)],
      k: Int, maxD: Double, exclusive: Boolean): Set[(Long, Long)] =
    probe.flatMap { case (pid, pg) =>
      val cands = build.flatMap { case (bid, bg) =>
        val d = pg.distance(bg)
        if (d <= maxD && !(exclusive && d == 0.0 && pg.equalsTopo(bg)))
          Some((bid, d))
        else None
      }.sortBy(_._2)
      if (cands.isEmpty) Nil
      else {
        val dk = if (cands.length <= k) cands.last._2 else cands(k - 1)._2
        cands.takeWhile(_._2 <= dk).map { case (bid, _) => (pid, bid) }
      }
    }.toSet

  test("random fixtures: partitioned and broadcast tiers match brute force") {
    val rnd = new java.util.Random(0xC0FFEE)
    // half-integer lattice: duplicated coordinates and exact ties are
    // COMMON, which is where ties-inclusive rank bugs would hide
    def coord(): Double = rnd.nextInt(41) * 0.5
    def geomRows(n: Int): Seq[(Long, Array[Byte])] = (0 until n).map { i =>
      val g =
        if (rnd.nextBoolean()) EWKBFactories.point(coord(), coord())
        else {
          val x = coord(); val y = coord()
          EWKBFactories.rect(x, y, x + 1 + rnd.nextInt(4) * 0.5,
            y + 1 + rnd.nextInt(4) * 0.5)
        }
      (i.toLong, g)
    }
    for (round <- 1 to 5) {
      val probeRows = geomRows(50 + rnd.nextInt(50))
      val buildRows = geomRows(50 + rnd.nextInt(50))
      val k = 1 + rnd.nextInt(3)
      val maxD = Seq(0.7, 2.5, 6.0)(rnd.nextInt(3))
      val cellSize = Seq(1.5, 4.0, 50.0)(rnd.nextInt(3))
      val exclusive = rnd.nextBoolean()
      val probe = probeRows.toDF("pid", "geometry")
      val build = buildRows.toDF("bid", "geometry")
      val expected = bruteNearest(
        probeRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        buildRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        k, maxD, exclusive)
      val grid = SpatialJoin.sjoinNearestPartitioned(probe, build, k = k,
          maxDistance = maxD, cellSize = cellSize, exclusive = exclusive)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(grid.toSet === expected,
        s"round $round (k=$k maxD=$maxD cs=$cellSize excl=$exclusive): grid tier diverged")
      assert(grid.length === expected.size,
        s"round $round: grid tier duplicated pairs (ownership)")
      val bcast = SpatialJoin.sjoinNearest(probe, build, k = k,
          maxDistance = maxD, exclusive = exclusive)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(bcast.toSet === expected,
        s"round $round: broadcast tier diverged")
      assert(bcast.length === expected.size,
        s"round $round: broadcast tier duplicated pairs")
      // how=right swaps the probe role: each BUILD row takes its k
      // nearest PROBE rows — brute force with the sides exchanged
      val expectedR = bruteNearest(
        buildRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        probeRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        k, maxD, exclusive)
      val gridR = SpatialJoin.sjoinNearestPartitioned(probe, build, k = k,
          maxDistance = maxD, cellSize = cellSize, exclusive = exclusive,
          how = "right")
        .select($"bid", $"pid").as[(Long, Option[Long])].collect()
      val gridRPairs = gridR.collect { case (b, Some(p)) => (b, p) }
      assert(gridRPairs.toSet === expectedR,
        s"round $round: how=right grid tier diverged")
      assert(gridRPairs.length === expectedR.size,
        s"round $round: how=right duplicated pairs")
      // right join keeps unmatched build rows, exactly once, null probe
      val unmatched = gridR.collect { case (b, None) => b }
      assert(unmatched.toSet === buildRows.map(_._1).toSet -- expectedR.map(_._1),
        s"round $round: how=right unmatched build rows wrong")
      assert(unmatched.distinct.length === unmatched.length)
    }
  }

  test("partitioned tier with k past the build size returns everything in range") {
    val rnd = new java.util.Random(0xA11CE)
    val probeRows = (0 until 40).map(i => (i.toLong,
      EWKBFactories.point(rnd.nextInt(21) * 0.5, rnd.nextInt(21) * 0.5)))
    val buildRows = (0 until 3).map(i => (i.toLong,
      EWKBFactories.point(i * 2.0, i * 2.0)))
    val expected = bruteNearest(
      probeRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
      buildRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
      k = 50, maxD = 8.0, exclusive = false)
    val got = SpatialJoin.sjoinNearestPartitioned(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 50, maxDistance = 8.0, cellSize = 4.0)
      .select($"pid", $"bid").as[(Long, Long)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }

  test("non-dyadic grid: decimal coordinates on decimal cell boundaries") {
    // cellSize 0.3 / coordinates in 0.1 steps: neither is exactly
    // representable in binary, so cell boundaries land within an ulp of
    // many coordinates — the regime where the interval ownership form
    // (`ix >= cellIdx*cs && ix < (cellIdx+1)*cs`) can disagree with the
    // floor(ix/cs) assignment arithmetic and drop or double-emit a pair
    // (ADVICE r15). ownsCorner keeps ownership bit-identical to
    // assignment; this round fails if anyone reintroduces the interval
    // form.
    val rnd = new java.util.Random(0x0DDBA11)
    def coord(): Double = rnd.nextInt(61) * 0.1 // 0.0, 0.1, ..., 6.0
    for ((cellSize, round) <- Seq(0.3, 0.1, 0.7).zipWithIndex) {
      val probeRows = (0 until 70).map { i =>
        val g =
          if (rnd.nextBoolean()) EWKBFactories.point(coord(), coord())
          else {
            val x = coord(); val y = coord()
            EWKBFactories.rect(x, y, x + 0.1 + rnd.nextInt(5) * 0.1,
              y + 0.1 + rnd.nextInt(5) * 0.1)
          }
        (i.toLong, g)
      }
      val buildRows = (0 until 70).map(i =>
        (i.toLong, EWKBFactories.point(coord(), coord())))
      val k = 1 + rnd.nextInt(2)
      val maxD = 0.4
      val expected = bruteNearest(
        probeRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        buildRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
        k, maxD, exclusive = false)
      val got = SpatialJoin.sjoinNearestPartitioned(
          probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
          k = k, maxDistance = maxD, cellSize = cellSize)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet === expected,
        s"non-dyadic round $round (cs=$cellSize k=$k): nearest grid tier diverged")
      assert(got.length === expected.size,
        s"non-dyadic round $round (cs=$cellSize): duplicated pairs (ownership)")
      // the predicate grid tier shares the ownership arithmetic — pin it
      // on the same non-dyadic grid (rect probes straddle the 0.1/0.3
      // boundaries, so ownership decides which cell reports each pair)
      val expectedPred = (for {
        (pid, pb) <- probeRows; (bid, bb) <- buildRows
        if graft.serde.EWKB.read(pb).intersects(graft.serde.EWKB.read(bb))
      } yield (pid, bid)).toSet
      val gotPred = SpatialJoin.sjoinPartitioned(
          probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
          predicate = "intersects", cellSize = cellSize)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(gotPred.toSet === expectedPred,
        s"non-dyadic round $round (cs=$cellSize): predicate grid tier diverged")
      assert(gotPred.length === expectedPred.size,
        s"non-dyadic round $round (cs=$cellSize): predicate tier duplicated pairs")
    }
  }

  test("random fixture through the bucketed store tier") {
    val rnd = new java.util.Random(0xBEEF)
    def coord(): Double = rnd.nextInt(41) * 0.5
    val buildRows = (0 until 80).map(i => (i.toLong,
      EWKBFactories.point(coord(), coord())))
    val probeRows = (0 until 60).map { i =>
      val x = coord(); val y = coord()
      (i.toLong, EWKBFactories.rect(x, y, x + 1.5, y + 1.5))
    }
    val expected = bruteNearest(
      probeRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
      buildRows.map { case (i, b) => (i, graft.serde.EWKB.read(b)) },
      k = 2, maxD = 3.0, exclusive = false)
    SpatialJoin.dropBucketedTable(spark, "graft_bkt_nn_rand")
    try {
      SpatialJoin.writeSpatialBucketed(buildRows.toDF("bid", "geometry"),
        "graft_bkt_nn_rand", cellSize = 4.0, buckets = 2)
      val got = SpatialJoin.sjoinNearestBucketed(spark,
          probeRows.toDF("pid", "geometry"), "graft_bkt_nn_rand",
          cellSize = 4.0, k = 2, maxDistance = 3.0)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet === expected)
      assert(got.length === expected.size, "bucketed tier duplicated pairs")
    } finally SpatialJoin.dropBucketedTable(spark, "graft_bkt_nn_rand")
  }
}

/** Tiny driver-side EWKB builders for the random fixtures. */
private object EWKBFactories {
  private val fact = graft.serde.EWKB.geometryFactory
  def point(x: Double, y: Double): Array[Byte] =
    graft.serde.EWKB.write(fact.createPoint(
      new org.locationtech.jts.geom.Coordinate(x, y)))
  def rect(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    graft.serde.EWKB.write(fact.toGeometry(
      new org.locationtech.jts.geom.Envelope(x0, x1, y0, y1)))
}
