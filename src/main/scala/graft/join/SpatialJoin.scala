package graft.join

import graft.serde.EWKB
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.broadcast.Broadcast
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

import scala.jdk.CollectionConverters._

/** Distributed spatial join (reference §2.10: STRtree over the left side +
  * prepared-geometry predicate refinement, `/root/reference/src/
  * functions.rs:1804-1866`, frame layer `polars_st/geolazyframe.py:64-158`).
  *
  * Two tiers:
  *
  * 1. [[SpatialJoin.sjoin]] — **broadcast STRtree join**: the reference's
  *    exact algorithm, distributed over the probe side. The left frame's
  *    (row-id, geometry) pairs are broadcast; each executor builds the
  *    STRtree of prepared geometries once (cached per broadcast); right
  *    partitions probe it in parallel and emit (left-id, right-id) match
  *    pairs; two hash joins re-attach the full rows (the reference does the
  *    same with `with_row_index` + joins). Use when one side fits in
  *    executor memory (like the reference, which is single-node in-memory).
  *
  * 2. [[SpatialJoin.sjoinPartitioned]] — **grid-partitioned join** for the
  *    large×large case: both sides flatMap to covering grid cells, shuffle
  *    on cell id, per-cell STRtree join, duplicate pairs removed with the
  *    reference-point rule (a pair is reported only by the cell containing
  *    the top-left corner of the envelope intersection) — the published
  *    GeoSpark/Sedona design (PAPERS.md).
  *
  * Supported predicates (reference `args.rs:172-185`), applied as
  * `predicate(leftGeom, rightGeom)`: intersects_bbox, intersects, within,
  * contains, overlaps, crosses, touches, covers, covered_by,
  * contains_properly.
  */
object SpatialJoin {

  private val LIdx = "__graft_lidx"
  private val RIdx = "__graft_ridx"

  private[join] def applyPred(name: String, prep: PreparedGeometry, right: Geometry): Boolean =
    name match {
      case "intersects_bbox" => true // envelope hit already established
      case "intersects" => prep.intersects(right)
      case "within" => prep.within(right)
      case "contains" => prep.contains(right)
      case "contains_properly" => prep.containsProperly(right)
      case "overlaps" => prep.overlaps(right)
      case "crosses" => prep.crosses(right)
      case "touches" => prep.touches(right)
      case "covers" => prep.covers(right)
      case "covered_by" => prep.coveredBy(right)
      case other => throw new IllegalArgumentException(s"unknown sjoin predicate: $other")
    }

  /** Executor-local cache: one prepared STRtree per broadcast variable. */
  private object TreeCache {
    private val cache = new java.util.concurrent.ConcurrentHashMap[Long, STRtree]()
    def get(bc: Broadcast[Array[(Long, Array[Byte])]]): STRtree =
      cache.computeIfAbsent(bc.id, _ => {
        val tree = new STRtree()
        bc.value.foreach { case (id, bytes) =>
          val g = EWKB.read(bytes)
          if (!g.isEmpty)
            tree.insert(g.getEnvelopeInternal, (id, PreparedGeometryFactory.prepare(g)))
        }
        tree.build()
        tree
      })
  }

  /** Broadcast STRtree spatial join.
    *
    * @param how "inner" | "left" | "right" | "full" (reference
    *            `geolazyframe.py:96-98`; "cross" is rejected there too)
    * @param suffix appended to right-side columns that clash with left
    */
  def sjoin(left: DataFrame, right: DataFrame,
      predicate: String = "intersects", how: String = "inner",
      leftGeom: String = "geometry", rightGeom: String = "geometry",
      suffix: String = "_right"): DataFrame = {
    require(Set("inner", "left", "right", "full")(how),
      s"unsupported how: $how (cross is not a spatial join)")
    val spark = left.sparkSession
    import spark.implicits._

    val leftIdx = left.withColumn(LIdx, monotonically_increasing_id())
    val rightIdx = right.withColumn(RIdx, monotonically_increasing_id())

    val buildData: Array[(Long, Array[Byte])] = leftIdx
      .select(col(LIdx), col(leftGeom))
      .as[(Long, Array[Byte])]
      .collect()
      .filter(_._2 != null)
    val bc = spark.sparkContext.broadcast(buildData)
    val pred = predicate

    val pairs = rightIdx
      .select(col(RIdx), col(rightGeom))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val tree = TreeCache.get(bc)
        it.flatMap { case (rid, bytes) =>
          if (bytes == null) Iterator.empty
          else {
            val g = EWKB.read(bytes)
            if (g.isEmpty) Iterator.empty
            else tree.query(g.getEnvelopeInternal).asScala.iterator
              .map(_.asInstanceOf[(Long, PreparedGeometry)])
              .filter { case (_, prep) => applyPred(pred, prep, g) }
              .map { case (lid, _) => (lid, rid) }
          }
        }
      }
      .toDF(LIdx, RIdx)

    assemble(leftIdx, rightIdx, pairs, how, suffix)
  }

  /** Grid-partitioned spatial join for large×large inputs (inner join).
    *
    * @param cellSize grid cell edge length in coordinate units. Choose ≈ the
    *                 median geometry envelope size; smaller cells → more
    *                 duplication, larger cells → more per-cell work.
    */
  def sjoinPartitioned(left: DataFrame, right: DataFrame, cellSize: Double,
      predicate: String = "intersects",
      leftGeom: String = "geometry", rightGeom: String = "geometry",
      suffix: String = "_right"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val pred = predicate
    val cs = cellSize

    val leftIdx = left.withColumn(LIdx, monotonically_increasing_id())
    val rightIdx = right.withColumn(RIdx, monotonically_increasing_id())

    def cellsOf(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
      if (bytes == null) return Nil
      val e = EWKB.read(bytes).getEnvelopeInternal
      if (e.isNull) return Nil
      val (x0, x1) = (math.floor(e.getMinX / cs).toLong, math.floor(e.getMaxX / cs).toLong)
      val (y0, y1) = (math.floor(e.getMinY / cs).toLong, math.floor(e.getMaxY / cs).toLong)
      for (cx <- x0 to x1; cy <- y0 to y1)
        yield ((cx << 32) | (cy & 0xffffffffL), bytes)
    }

    val lCells = leftIdx.select(col(LIdx), col(leftGeom)).as[(Long, Array[Byte])]
      .flatMap { case (id, b) => cellsOf(b).map { case (c, bb) => (c, id, bb) } }
    val rCells = rightIdx.select(col(RIdx), col(rightGeom)).as[(Long, Array[Byte])]
      .flatMap { case (id, b) => cellsOf(b).map { case (c, bb) => (c, id, bb) } }

    // cogroup by cell: per-cell STRtree over the left slice, streamed probe
    // of the right slice. No cross product is ever materialized, and the
    // reference-point rule makes each pair unique without a distinct().
    val pairs = lCells.groupByKey(_._1).cogroup(rCells.groupByKey(_._1)) {
      (cell, lit, rit) =>
        val tree = new STRtree()
        var n = 0
        lit.foreach { case (_, lid, bytes) =>
          val g = EWKB.read(bytes)
          if (!g.isEmpty) {
            tree.insert(g.getEnvelopeInternal, (lid, PreparedGeometryFactory.prepare(g)))
            n += 1
          }
        }
        if (n == 0) Iterator.empty
        else {
          tree.build()
          val cx = (cell >> 32).toDouble * cs
          val cy = (cell << 32 >> 32).toDouble * cs
          rit.flatMap { case (_, rid, bytes) =>
            val rg = EWKB.read(bytes)
            if (rg.isEmpty) Iterator.empty
            else {
              val re = rg.getEnvelopeInternal
              tree.query(re).asScala.iterator
                .map(_.asInstanceOf[(Long, PreparedGeometry)])
                .filter { case (_, prep) =>
                  // reference-point dedup: only the cell containing the
                  // bottom-left corner of the envelope intersection reports
                  val le = prep.getGeometry.getEnvelopeInternal
                  val ix = math.max(le.getMinX, re.getMinX)
                  val iy = math.max(le.getMinY, re.getMinY)
                  ix >= cx && ix < cx + cs && iy >= cy && iy < cy + cs
                }
                .filter { case (_, prep) => applyPred(pred, prep, rg) }
                .map { case (lid, _) => (lid, rid) }
            }
          }
        }
    }.toDF(LIdx, RIdx)

    assemble(leftIdx, rightIdx, pairs, "inner", suffix)
  }

  /** Reattach full rows to the (left-id, right-id) pair table, mirroring
    * the reference's index-join finish (`geolazyframe.py:133-158`). */
  private def assemble(leftIdx: DataFrame, rightIdx: DataFrame, pairs: DataFrame,
      how: String, suffix: String): DataFrame = {
    val leftCols = leftIdx.columns.filterNot(_ == LIdx)
    val rightRenamed = rightIdx.columns.foldLeft(rightIdx) { (df, c) =>
      if (c != RIdx && leftCols.contains(c)) df.withColumnRenamed(c, c + suffix) else df
    }
    val joined = how match {
      case "inner" =>
        leftIdx.join(pairs, LIdx).join(rightRenamed, RIdx)
      case "left" =>
        leftIdx.join(pairs, Seq(LIdx), "left")
          .join(rightRenamed, Seq(RIdx), "left")
      case "right" =>
        leftIdx.join(pairs, Seq(LIdx), "inner")
          .join(rightRenamed, Seq(RIdx), "right")
      case "full" =>
        leftIdx.join(pairs, Seq(LIdx), "full")
          .join(rightRenamed, Seq(RIdx), "full")
    }
    joined.drop(LIdx, RIdx)
  }
}
