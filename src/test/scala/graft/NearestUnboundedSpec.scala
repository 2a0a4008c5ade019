package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._
import graft.join.{CellSummary, SpatialJoin}

/** The unbounded-maxDistance distributed nearest tier
  * ([[SpatialJoin.sjoinNearestUnbounded]]): brute-force equivalence on
  * heterogeneous-density fixtures (the regime the per-probe bound
  * discovery exists for — dense clusters next to deserts), the
  * many-rings-away probe, the exclusive escalation loop under duplicate
  * pressure, outer-join shapes, the bound's soundness, and the
  * `sjoinNearest(maxDistance = ∞)` routing past the broadcast guards. */
class NearestUnboundedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def geom(b: Array[Byte]) = graft.serde.EWKB.read(b)

  private def brute(
      probe: Seq[(Long, Array[Byte])], build: Seq[(Long, Array[Byte])],
      k: Int, exclusive: Boolean): Set[(Long, Long)] =
    EWKBFixtures.brute(probe, build, k, exclusive)

  private def heterogeneous(rnd: java.util.Random, n: Int): Seq[(Long, Array[Byte])] =
    EWKBFixtures.heterogeneous(rnd, n)

  test("heterogeneous density: unbounded tier matches brute force") {
    val rnd = new java.util.Random(0x5EED16)
    for (round <- 1 to 4) {
      val probeRows = heterogeneous(rnd, 60 + rnd.nextInt(40))
      val buildRows = heterogeneous(rnd, 60 + rnd.nextInt(40))
      val k = 1 + rnd.nextInt(3)
      val expected = brute(probeRows, buildRows, k, exclusive = false)
      val got = SpatialJoin.sjoinNearestUnbounded(
          probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
          k = k)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet === expected, s"round $round (k=$k): diverged")
      assert(got.length === expected.size,
        s"round $round (k=$k): duplicated pairs (ownership)")
    }
  }

  test("rectangles and mixed shapes through the unbounded tier") {
    val rnd = new java.util.Random(0xFACADE)
    def shape(): Array[Byte] =
      if (rnd.nextBoolean()) EWKBFixtures.point(rnd.nextInt(41) * 0.5,
        rnd.nextInt(41) * 0.5)
      else {
        val x = rnd.nextInt(41) * 0.5; val y = rnd.nextInt(41) * 0.5
        EWKBFixtures.rect(x, y, x + 1 + rnd.nextInt(4) * 0.5,
          y + 1 + rnd.nextInt(4) * 0.5)
      }
    val probeRows = (0 until 60).map(i => (i.toLong, shape()))
    val buildRows = (0 until 60).map(i => (i.toLong, shape()))
    for (k <- Seq(1, 3)) {
      val expected = brute(probeRows, buildRows, k, exclusive = false)
      val got = SpatialJoin.sjoinNearestUnbounded(
          probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
          k = k)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet === expected, s"k=$k: diverged")
      assert(got.length === expected.size, s"k=$k: duplicated pairs")
    }
  }

  test("desert probe: the k-th neighbor many rings away") {
    // 200 build points packed at the origin, 3 lone points thousands of
    // units out; probes sit in the empty middle — their bound discovery
    // must reach across hundreds of coarse rings, and the coverage
    // filter must keep the cell explosion to the few occupied regions
    val buildRows =
      (0 until 200).map(i => (i.toLong,
        EWKBFixtures.point((i % 20) * 0.25, (i / 20) * 0.25))) ++
      Seq((200L, EWKBFixtures.point(9000.0, 0.0)),
        (201L, EWKBFixtures.point(9500.0, 400.0)),
        (202L, EWKBFixtures.point(-3000.0, -2000.0)))
    val probeRows = Seq(
      (0L, EWKBFixtures.point(6000.0, 0.0)),   // nearest is the 9000 outlier
      (1L, EWKBFixtures.point(4000.0, 100.0)), // nearest is the origin cluster
      (2L, EWKBFixtures.point(-2999.0, -2000.0)), // right next to an outlier
      (3L, EWKBFixtures.point(0.5, 0.5)))      // inside the cluster
    for (k <- Seq(1, 4)) {
      val expected = brute(probeRows, buildRows, k, exclusive = false)
      val got = SpatialJoin.sjoinNearestUnbounded(
          probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
          k = k)
        .select($"pid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet === expected, s"k=$k: desert probe diverged")
      assert(got.length === expected.size, s"k=$k: duplicated pairs")
    }
  }

  test("exclusive escalation: duplicates consume the anchor budget") {
    // 10 copies of the probe geometry (all excluded) + 3 real neighbors
    // far away: the first pass's k+1 anchor target lands entirely on the
    // duplicate pile, so the loop must escalate until the bound reaches
    // the real neighbors
    val buildRows = (0 until 10).map(i =>
        (i.toLong, EWKBFixtures.point(0.0, 0.0))) ++
      Seq((10L, EWKBFixtures.point(100.0, 0.0)),
        (11L, EWKBFixtures.point(101.0, 0.0)),
        (12L, EWKBFixtures.point(102.0, 0.0)))
    val probeRows = Seq((0L, EWKBFixtures.point(0.0, 0.0)),
      (1L, EWKBFixtures.point(100.5, 0.0)))
    val expected = brute(probeRows, buildRows, k = 2, exclusive = true)
    val got = SpatialJoin.sjoinNearestUnbounded(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 2, exclusive = true)
      .select($"pid", $"bid").as[(Long, Long)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
    // sanity on the fixture: probe 0's nearest non-equal rows are the
    // distant trio, not the duplicate pile
    assert(expected.contains((0L, 10L)) && expected.contains((0L, 11L)))
  }

  test("exclusive: all build rows equal to the probe leaves it unmatched") {
    val buildRows = (0 until 5).map(i =>
      (i.toLong, EWKBFixtures.point(1.0, 1.0)))
    val probeRows = Seq((0L, EWKBFixtures.point(1.0, 1.0)))
    val inner = SpatialJoin.sjoinNearestUnbounded(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 1, exclusive = true)
      .collect()
    assert(inner.isEmpty)
    val left = SpatialJoin.sjoinNearestUnbounded(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 1, exclusive = true, how = "left")
      .select($"pid", $"bid").as[(Long, Option[Long])].collect()
    assert(left.toSeq === Seq((0L, None)))
  }

  test("how=left / how=right / distanceCol / empty build side") {
    val probeRows = Seq((0L, EWKBFixtures.point(0.0, 0.0)),
      (1L, EWKBFixtures.point(10.0, 0.0)),
      (2L, null.asInstanceOf[Array[Byte]]))
    val buildRows = Seq((0L, EWKBFixtures.point(1.0, 0.0)),
      (1L, EWKBFixtures.point(12.0, 0.0)))
    val probe = probeRows.toDF("pid", "geometry")
    val build = buildRows.toDF("bid", "geometry")
    // left keeps the null-geometry probe with null build columns
    val left = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 1,
        how = "left", distanceCol = Some("d"))
      .select($"pid", $"bid", $"d").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(left.toSeq === Seq((0L, Some(0L), Some(1.0)),
      (1L, Some(1L), Some(2.0)), (2L, None, None)))
    // right: each BUILD row takes its nearest probe
    val right = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 1,
        how = "right", distanceCol = Some("d"))
      .select($"bid", $"pid", $"d").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(right.toSeq === Seq((0L, Some(0L), Some(1.0)),
      (1L, Some(1L), Some(2.0))))
    // empty build side: inner empty, left keeps everything unmatched
    val empty = Seq.empty[(Long, Array[Byte])].toDF("bid", "geometry")
    assert(SpatialJoin.sjoinNearestUnbounded(probe, empty, k = 1).isEmpty)
    val leftEmpty = SpatialJoin.sjoinNearestUnbounded(probe, empty, k = 1,
        how = "left")
      .select($"pid", $"bid").as[(Long, Option[Long])].collect()
    assert(leftEmpty.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L))
    assert(leftEmpty.forall(_._2.isEmpty))
  }

  test("sjoinNearest routes unbounded searches past the broadcast guards") {
    val rnd = new java.util.Random(0x0B0E16)
    val probeRows = heterogeneous(rnd, 50)
    val buildRows = heterogeneous(rnd, 50)
    val expected = brute(probeRows, buildRows, k = 2, exclusive = false)
    // maxBuildRows = 1 forces the build side past the guards; the old
    // behavior here was a loud error
    val got = SpatialJoin.sjoinNearest(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 2, maxBuildRows = 1)
      .select($"pid", $"bid").as[(Long, Long)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }

  test("buildSummary door: pre-computed summary == fresh, both orientations") {
    val rnd = new java.util.Random(0x5B1157)
    val probeRows = heterogeneous(rnd, 60)
    val buildRows = heterogeneous(rnd, 60)
    val probe = probeRows.toDF("pid", "geometry")
    val build = buildRows.toDF("bid", "geometry")
    val fresh = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 2)
      .select($"pid", $"bid").as[(Long, Long)].collect().toSet
    val summary = SpatialJoin.summarizeBuild(build)
    assert(summary.isDefined)
    val supplied = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 2,
        buildSummary = summary)
      .select($"pid", $"bid").as[(Long, Long)].collect().toSet
    assert(supplied === fresh, "supplied-summary results diverged")
    assert(fresh === brute(probeRows, buildRows, 2, exclusive = false))
    // how=right flips the build side to the LEFT frame — the summary
    // must describe it, not the right frame
    val freshR = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 1,
        how = "right")
      .select($"pid", $"bid").as[(Long, Long)].collect().toSet
    val suppliedR = SpatialJoin.sjoinNearestUnbounded(probe, build, k = 1,
        how = "right", buildSummary = SpatialJoin.summarizeBuild(probe))
      .select($"pid", $"bid").as[(Long, Long)].collect().toSet
    assert(suppliedR === freshR, "how=right supplied-summary diverged")
  }

  test("CellSummary.boundFor is a sound k-th-distance bound") {
    val rnd = new java.util.Random(0xB0D16)
    val buildRows = heterogeneous(rnd, 150)
    val summary = CellSummary.compute(
      buildRows.toDF("bid", "geometry"), "geometry").get
    assert(summary.totalAnchors === 150L)
    val builds = buildRows.map { case (_, b) => geom(b) }
    for (_ <- 1 to 50; k <- Seq(1, 3, 7)) {
      val px = rnd.nextDouble() * 4000 - 1000
      val py = rnd.nextDouble() * 2000 - 500
      val pg = graft.serde.EWKB.geometryFactory.createPoint(
        new org.locationtech.jts.geom.Coordinate(px, py))
      val bound = summary.boundFor(pg.getEnvelopeInternal, k)
      val kth = builds.map(pg.distance).sorted.apply(k - 1)
      assert(kth <= bound,
        s"bound $bound below k-th distance $kth at ($px,$py) k=$k")
    }
  }

  test("curved geometries ride the unbounded tier (linearized consistently)") {
    // CircularStrings parse through EWKB.read's auto-linearization; the
    // summary's anchors, the STRtree distances, and the brute oracle all
    // consume that same parse, so equality must hold end to end
    def arc(x: Double, y: Double): Array[Byte] = {
      val wkt = s"CIRCULARSTRING ($x $y, ${x + 1} ${y + 1}, ${x + 2} $y)"
      spark.sql(s"SELECT st_geomfromtext('$wkt')").collect()(0)
        .getAs[Array[Byte]](0)
    }
    val rnd = new java.util.Random(0xCA11)
    val probeRows = (0 until 25).map(i => (i.toLong,
      if (i % 3 == 0) arc(rnd.nextInt(21) * 1.0, rnd.nextInt(21) * 1.0)
      else EWKBFixtures.point(rnd.nextInt(41) * 0.5, rnd.nextInt(41) * 0.5)))
    val buildRows = (0 until 25).map(i => (i.toLong,
      if (i % 4 == 0) arc(rnd.nextInt(21) * 1.0, rnd.nextInt(21) * 1.0)
      else EWKBFixtures.point(rnd.nextInt(41) * 0.5, rnd.nextInt(41) * 0.5)))
    val expected = brute(probeRows, buildRows, k = 2, exclusive = false)
    val got = SpatialJoin.sjoinNearestUnbounded(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 2)
      .select($"pid", $"bid").as[(Long, Long)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }

  test("non-dyadic world: unbounded tier on 0.1-step coordinates") {
    val rnd = new java.util.Random(0x171717)
    def c(): Double = rnd.nextInt(101) * 0.1
    val probeRows = (0 until 60).map(i => (i.toLong, EWKBFixtures.point(c(), c())))
    val buildRows = (0 until 60).map(i => (i.toLong, EWKBFixtures.point(c(), c())))
    val expected = brute(probeRows, buildRows, k = 2, exclusive = false)
    val got = SpatialJoin.sjoinNearestUnbounded(
        probeRows.toDF("pid", "geometry"), buildRows.toDF("bid", "geometry"),
        k = 2, cellSize = 0.3)
      .select($"pid", $"bid").as[(Long, Long)].collect()
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }
}

/** EWKB builders + oracles shared by the unbounded-nearest specs
  * ([[NearestUnboundedSpec]], [[NearestBucketedUnboundedSpec]]). */
private object EWKBFixtures {
  private val fact = graft.serde.EWKB.geometryFactory
  def point(x: Double, y: Double): Array[Byte] =
    graft.serde.EWKB.write(fact.createPoint(
      new org.locationtech.jts.geom.Coordinate(x, y)))
  def rect(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    graft.serde.EWKB.write(fact.toGeometry(
      new org.locationtech.jts.geom.Envelope(x0, x1, y0, y1)))

  /** Ties-inclusive k-nearest brute-force oracle (the geopandas
    * contract both unbounded tiers implement). */
  def brute(
      probe: Seq[(Long, Array[Byte])], build: Seq[(Long, Array[Byte])],
      k: Int, exclusive: Boolean): Set[(Long, Long)] =
    probe.flatMap { case (pid, pb) =>
      val pg = if (pb == null) null else graft.serde.EWKB.read(pb)
      if (pg == null || pg.isEmpty) Nil
      else {
        val cands = build.flatMap { case (bid, bb) =>
          val bg = if (bb == null) null else graft.serde.EWKB.read(bb)
          if (bg == null || bg.isEmpty) None
          else {
            val d = pg.distance(bg)
            if (exclusive && d == 0.0 && pg.equalsTopo(bg)) None
            else Some((bid, d))
          }
        }.sortBy(_._2)
        if (cands.isEmpty) Nil
        else {
          val dk = if (cands.length <= k) cands.last._2 else cands(k - 1)._2
          cands.takeWhile(_._2 <= dk).map { case (bid, _) => (pid, bid) }
        }
      }
    }.toSet

  /** Dense cluster + sparse band + far outliers: per-probe bounds differ
    * by orders of magnitude within one frame. */
  def heterogeneous(rnd: java.util.Random, n: Int): Seq[(Long, Array[Byte])] =
    (0 until n).map { i =>
      val g = rnd.nextInt(10) match {
        case d if d < 6 => // dense cluster near the origin
          point(rnd.nextInt(9) * 0.5, rnd.nextInt(9) * 0.5)
        case d if d < 9 => // sparse mid band
          point(50.0 + rnd.nextInt(41) * 2.0, rnd.nextInt(21) * 1.5)
        case _ => // far outliers
          point(2000.0 + rnd.nextInt(5) * 100.0,
            1000.0 + rnd.nextInt(5) * 50.0)
      }
      (i.toLong, g)
    }
}
