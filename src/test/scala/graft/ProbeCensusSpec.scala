package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.join.SpatialJoin

/** The persisted probe census door ([[SpatialJoin.censusProbe]] +
  * `sjoinNearestBucketed(probeCensus = ...)`): a probe frame joined
  * repeatedly pre-pays its heavy-cell census once instead of per call.
  * Pins: (1) the pre-computed census is bit-identical to the join-time
  * one over the join's own exploded cells (same counts → same salting
  * decisions, by construction); (2) join results are identical fresh vs
  * persisted on a fixture whose hot cell actually salts; (3) a census
  * from a different grid is refused loudly. */
class ProbeCensusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fact = graft.serde.EWKB.geometryFactory
  private def pt(x: Double, y: Double): Array[Byte] =
    graft.serde.EWKB.write(fact.createPoint(
      new org.locationtech.jts.geom.Coordinate(x, y)))

  // hot fixture: 3000 probe points piled into one cell (past the
  // HeavyCellMinRows floor and, with the small hotPairsBound below, past
  // the pair bound against the 200-row store cell), plus background
  private def probeFrame = {
    val hot = (0 until 3000).map(i => (i.toLong, pt((i % 50) * 0.01, (i / 50) * 0.01)))
    val bg = (0 until 100).map(i => (3000L + i, pt(100.0 + i * 4.0, 50.0)))
    (hot ++ bg).toDF("pid", "geometry")
  }
  private def buildFrame = {
    val hot = (0 until 200).map(i => (i.toLong, pt((i % 20) * 0.02, (i / 20) * 0.02)))
    val bg = (0 until 100).map(i => (200L + i, pt(100.0 + i * 4.0, 50.5)))
    (hot ++ bg).toDF("bid", "geometry")
  }

  test("pre-computed census equals the join-time census over the join's cells") {
    val cs = 4.0; val pad = 1.0
    val census = SpatialJoin.censusProbe(probeFrame, "geometry", cs, pad)
    assert(census.cellSize === cs && census.pad === pad)
    // the join explodes probe cells with gridCellsOf(bytes, cs, pad) —
    // reproduce that exactly and census it through the join's own path
    val cellsUdf = udf((b: Array[Byte]) => SpatialJoin.gridCellsOf(b, cs, pad = pad))
    val joinCells = probeFrame
      .select(explode(cellsUdf(col("geometry"))).as(SpatialJoin.CellCol))
    val fresh = SpatialJoin.probeCellHist(joinCells)
    assert(census.hist === fresh)
    assert(census.hist.cells.nonEmpty, "fixture never crossed the census floor")
  }

  test("join results identical fresh vs persisted census on a salted fixture") {
    SpatialJoin.dropBucketedTable(spark, "graft_census_store")
    try {
      SpatialJoin.writeSpatialBucketed(buildFrame, "graft_census_store",
        cellSize = 4.0, buckets = 2)
      val census = SpatialJoin.censusProbe(probeFrame, "geometry", 4.0, 1.0)
      def run(pc: Option[SpatialJoin.ProbeCensus]) =
        SpatialJoin.sjoinNearestBucketed(spark, probeFrame,
            "graft_census_store", cellSize = 4.0, k = 2, maxDistance = 1.0,
            distanceCol = Some("d"), hotPairsBound = 1000, probeCensus = pc)
          .select($"pid", $"bid", $"d").as[(Long, Long, Double)]
          .collect().sorted.toSeq
      val fresh = run(None)
      val persisted = run(Some(census))
      assert(fresh === persisted)
      assert(fresh.nonEmpty)
      // the fixture really is hot: 3000 × 200 in the shared cell crosses
      // the 1000-pair bound, so both runs exercised the salted path
      assert(census.hist.cells.values.max >= 3000L)
    } finally SpatialJoin.dropBucketedTable(spark, "graft_census_store")
  }

  test("a census from a different grid is refused") {
    SpatialJoin.dropBucketedTable(spark, "graft_census_store2")
    try {
      SpatialJoin.writeSpatialBucketed(buildFrame, "graft_census_store2",
        cellSize = 4.0, buckets = 2)
      val wrongCell = SpatialJoin.censusProbe(probeFrame, "geometry", 8.0, 1.0)
      val e1 = intercept[IllegalArgumentException](
        SpatialJoin.sjoinNearestBucketed(spark, probeFrame,
          "graft_census_store2", cellSize = 4.0, k = 1, maxDistance = 1.0,
          probeCensus = Some(wrongCell)))
      assert(e1.getMessage.contains("mixed-grid census"))
      val wrongPad = SpatialJoin.censusProbe(probeFrame, "geometry", 4.0, 2.0)
      val e2 = intercept[IllegalArgumentException](
        SpatialJoin.sjoinNearestBucketed(spark, probeFrame,
          "graft_census_store2", cellSize = 4.0, k = 1, maxDistance = 1.0,
          probeCensus = Some(wrongPad)))
      assert(e2.getMessage.contains("mixed-grid census"))
    } finally SpatialJoin.dropBucketedTable(spark, "graft_census_store2")
  }
}
