package graft.aggs

import graft.serde.{EWKB, GeoCodec}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.{col, monotonically_increasing_id, udaf}
import org.locationtech.jts.geom._
import org.locationtech.jts.operation.polygonize.Polygonizer
import org.locationtech.jts.operation.union.UnaryUnionOp
import org.locationtech.jts.triangulate.{DelaunayTriangulationBuilder, VoronoiDiagramBuilder}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Geometry aggregations (reference §2.7, `/root/reference/polars_st/
  * geoexpr.py:899-954`, kernels `expressions.rs:873-1035`).
  *
  * Distributed design notes (100 TB target):
  * - every aggregator does partial aggregation on executors (Spark calls
  *   `reduce` per row and `merge` across partitions — map-side combine);
  * - geometry-accumulating buffers are **compacted** once they exceed a
  *   threshold so executor memory stays bounded per group;
  * - `difference_all` is a row-order left fold in the reference
  *   (`expressions.rs:873-886`) and therefore inherently order-sensitive:
  *   distributed results are deterministic only per-partition — documented
  *   divergence (SURVEY.md §7).
  *
  * Identity on empty/all-null input: `GEOMETRYCOLLECTION EMPTY` for
  * geometry aggs, `[NaN,NaN,NaN,NaN]` for total_bounds
  * (`/root/reference/tests/test_expressions.py:293-307`). */
object GeoAggs {

  // Buffer-compaction threshold: buffers exceeding this many geometries
  // collapse to one. Compaction exists ONLY to bound executor memory —
  // every firing is pure O(buffer) JTS overhead the finish-time union
  // would have done anyway — so the count threshold sits high and a
  // BYTE backstop (checked every 128 appends) catches the
  // few-huge-geometries case the count cannot see. r10 cadence sweep on
  // the 10× fixture (1024 groups × ~1.5k rects): compactAt 128 → 40.6 s,
  // 512 → 17.3 s, 2048 → 8.6 s — each halving of compaction frequency
  // ~halves the key, because mid-stream unions re-union an ever-growing
  // multipolygon. Overridable via GRAFT_AGGS_COMPACT_AT /
  // -Dgraft.aggs.compactAt (read once at class init).
  private val CompactAt =
    sys.env.get("GRAFT_AGGS_COMPACT_AT")
      .orElse(sys.props.get("graft.aggs.compactAt"))
      .map { s =>
        val v = try s.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"GRAFT_AGGS_COMPACT_AT must be a positive integer, got '$s'")
        }
        require(v > 0, s"GRAFT_AGGS_COMPACT_AT must be positive, got $v")
        v
      }.getOrElse(2048)
  // byte backstop per group buffer (pre-compaction estimate of EWKB
  // payload held): 16 MiB keeps worst-case ObjectHashAggregate maps well
  // inside executor memory even with thousands of concurrent groups
  private val CompactBytes = 16L << 20

  private def fact: GeometryFactory = EWKB.geometryFactory
  private def emptyGC: Array[Byte] = EWKB.write(GeoCodec.emptyCollection)

  private def readAll(parts: ArrayBuffer[Array[Byte]]): Seq[Geometry] =
    parts.map(EWKB.read).toSeq

  private def sridOf(gs: Seq[Geometry]): Int =
    gs.iterator.map(_.getSRID).find(_ != 0).getOrElse(0)

  private def writeWithSrid(g: Geometry, srid: Int): Array[Byte] = {
    if (srid != 0) g.setSRID(srid)
    EWKB.write(g)
  }

  private def unionGeoms(geoms: Seq[Geometry], gridSize: Double): Geometry = {
    val u =
      if (gridSize > 0) {
        val pm = new PrecisionModel(1.0 / gridSize)
        if (geoms.lengthCompare(1) == 0)
          // UnaryUnionNG short-circuits a lone geometry without snap-rounding
          // (probed); GEOS-style *_Prec semantics snap every input, so reduce
          // explicitly here. Multi-input unions snap inside OverlayNG.
          org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(geoms.head, pm)
        else
          org.locationtech.jts.operation.overlayng.UnaryUnionNG.union(
            geoms.asJava.asInstanceOf[java.util.Collection[Geometry]], pm)
      } else UnaryUnionOp.union(geoms.asJava.asInstanceOf[java.util.Collection[Geometry]])
    if (u == null) GeoCodec.emptyCollection else u
  }

  private def unionOf(parts: ArrayBuffer[Array[Byte]], gridSize: Double = 0.0): Array[Byte] =
    if (parts.isEmpty) emptyGC
    else {
      val geoms = readAll(parts)
      writeWithSrid(unionGeoms(geoms, gridSize), sridOf(geoms))
    }

  /** Pairwise overlay op, snapped to a precision grid when gridSize > 0
    * (reference `union_all(grid_size)` et al., `expressions.rs:873-999`). */
  private def overlayOp(op: Int, gridSize: Double)(a: Geometry, b: Geometry): Geometry =
    if (gridSize > 0)
      org.locationtech.jts.operation.overlayng.OverlayNG.overlay(
        a, b, op, new PrecisionModel(1.0 / gridSize))
    else op match {
      case org.locationtech.jts.operation.overlayng.OverlayNG.INTERSECTION => a intersection b
      case org.locationtech.jts.operation.overlayng.OverlayNG.SYMDIFFERENCE => a symDifference b
      case org.locationtech.jts.operation.overlayng.OverlayNG.DIFFERENCE => a difference b
      case _ => a union b
    }

  /** Base class for list-buffered aggregations with bounded compaction. */
  abstract class ListAgg extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], Array[Byte]] {
    /** Collapse a full buffer into a smaller equivalent one; identity = no
      * compaction (for order- or multiplicity-sensitive finishes). */
    protected def compactBuffer(b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = b
    final def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
    /** Count threshold, plus the byte backstop. The byte sum (O(buffer)
      * length reads) runs when any of these fire — each chosen so the
      * few-huge-geometries case the count cap cannot see is caught
      * without per-row O(buffer) work:
      *  - every 16 appends (amortized O(1)/row; the count cap bounds the
      *    sum at CompactAt reads);
      *  - the appended element alone is ≥ 1 MiB (huge geometries trip
      *    the check immediately, even in buffers far below 16);
      *  - after EVERY merge (merged buffers jump over sample points). */
    private def overBytes(b: ArrayBuffer[Array[Byte]]): Boolean =
      b.iterator.map(g => if (g == null) 0L else g.length.toLong).sum >= CompactBytes
    final def reduce(b: ArrayBuffer[Array[Byte]], a: Array[Byte]): ArrayBuffer[Array[Byte]] = {
      if (a != null) b += a
      if (b.length >= CompactAt ||
          (((b.length & 15) == 0 || (a != null && a.length >= (1 << 20))) &&
            b.nonEmpty && overBytes(b)))
        compactBuffer(b)
      else b
    }
    final def merge(b1: ArrayBuffer[Array[Byte]], b2: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = {
      b1 ++= b2
      if (b1.length >= CompactAt || (b1.nonEmpty && overBytes(b1)))
        compactBuffer(b1)
      else b1
    }
    /** Catalyst array-of-binary, NOT kryo: buffers serialize at every
      * partial-agg shuffle, at ObjectHashAggregate's sort-based fallback
      * (once per ROW past the fallback threshold), and at SortAggregate
      * partials — kryo's per-object overhead on a Seq of byte arrays was
      * the measured reason wide-group aggregation paid for raising the
      * fallback threshold (r11 sweep in PERF.md). */
    def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] =
      ExpressionEncoder[ArrayBuffer[Array[Byte]]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Cascaded union (reference `union_all`, `expressions.rs:984-999`).
    * `gridSize > 0` snaps to a precision grid — snapped coordinates stay on
    * the grid, so partial (compaction) unions commute with the final one. */
  class UnionAllAgg(gridSize: Double = 0.0) extends ListAgg {
    override protected def compactBuffer(b: ArrayBuffer[Array[Byte]]) = {
      val u = unionOf(b, gridSize); b.clear(); b += u
    }
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) emptyGC else unionOf(b, gridSize)
  }

  /** Gather into a multi-geometry or GC with supertype inference
    * (reference `collect`, `functions.rs:1238-1276`). */
  class CollectAgg extends ListAgg {
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      if (b.isEmpty) return emptyGC
      val gs = readAll(b)
      val srid = sridOf(gs)
      val types = gs.map(_.getGeometryType).toSet
      val out: Geometry =
        if (types == Set("Point")) fact.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
        else if (types == Set("LineString"))
          fact.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
        else if (types == Set("Polygon"))
          fact.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
        else fact.createGeometryCollection(gs.toArray)
      writeWithSrid(out, srid)
    }
  }

  /** Fold by pairwise op with a running single-geometry buffer
    * (associative + commutative: intersection, symmetric difference). */
  abstract class FoldAgg(op: (Geometry, Geometry) => Geometry)
      extends Aggregator[Array[Byte], Option[Array[Byte]], Array[Byte]] {
    def zero: Option[Array[Byte]] = None
    private def combine(acc: Option[Array[Byte]], g: Array[Byte]): Option[Array[Byte]] =
      acc match {
        case None => Some(g)
        case Some(prev) =>
          val (a, b) = (EWKB.read(prev), EWKB.read(g))
          Some(writeWithSrid(op(a, b), sridOf(Seq(a, b))))
      }
    def reduce(acc: Option[Array[Byte]], a: Array[Byte]): Option[Array[Byte]] =
      if (a == null) acc else combine(acc, a)
    def merge(a: Option[Array[Byte]], b: Option[Array[Byte]]): Option[Array[Byte]] =
      b.fold(a)(combine(a, _))
    def finish(acc: Option[Array[Byte]]): Array[Byte] = acc.getOrElse(emptyGC)
    def bufferEncoder: Encoder[Option[Array[Byte]]] =
      ExpressionEncoder[Option[Array[Byte]]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class IntersectionAllAgg(gridSize: Double = 0.0) extends FoldAgg(
    overlayOp(org.locationtech.jts.operation.overlayng.OverlayNG.INTERSECTION, gridSize))

  /** Symmetric difference (plain or grid-snapped) as a BALANCED pairwise
    * fold.
    *
    * The naive running-accumulator fold is O(n²): every step overlays the
    * whole accumulated multipolygon with one more row — fatal with
    * snap-rounding, where each step also re-noids all accumulated
    * vertices (SnapRoundingNoder rebuilds its hot-pixel KdTree; measured
    * ~30 s for a single 900-row group at sf0.01, ~8 CPU-minutes for the
    * 16-group oracle query — a verify-harness killer and a 100 TB
    * non-starter), and still quadratic with the cheaper plain overlay.
    * The balanced tree does O(n log n) overlay work: each input
    * participates in log₂ n overlays instead of feeding an ever-growing
    * accumulator.
    *
    * Results: symmetric difference is associative + commutative (region
    * parity), so over EXACT arithmetic any fold shape defines the same
    * region, and distributed merge order was never deterministic to begin
    * with (partials combine in task-completion order). With snap-rounding
    * the claim is weaker: OverlayNG inserts hot pixels at intersection
    * points, so different pairings can in principle snap off-lattice
    * inputs differently — fold-shape invariance is guaranteed only for
    * inputs whose vertices already sit on the grid lattice (then every
    * intermediate stays on-lattice). SurfaceSpec pins tree == strict
    * linear fold as a multi-seed / multi-partitioning property test on
    * dyadic inputs; off-lattice inputs should be compared with an area
    * tolerance, not bit equality. Buffer compaction preserves
    * correctness because a compacted partial is just a subtree. */
  class SymmetricDifferenceAllAgg(gridSize: Double = 0.0) extends ListAgg {
    private def tree(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      val geoms = readAll(b)
      val srid = sridOf(geoms)
      val op = overlayOp(
        org.locationtech.jts.operation.overlayng.OverlayNG.SYMDIFFERENCE, gridSize) _
      var layer = geoms
      while (layer.lengthCompare(1) > 0)
        layer = layer.grouped(2).map {
          case Seq(a, bb) => op(a, bb)
          case Seq(a) => a
        }.toSeq
      writeWithSrid(layer.head, srid)
    }
    override protected def compactBuffer(b: ArrayBuffer[Array[Byte]]) = {
      val u = tree(b); b.clear(); b += u
    }
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) emptyGC else tree(b)
  }

  /** Left fold of difference: g0 \ g1 \ g2 … = g0 \ union(g1..gn)
    * (reference `expressions.rs:873-886`). The minuend is the first row in
    * encounter order; subtrahends are union-compacted. */
  class DifferenceAllAgg(gridSize: Double = 0.0) extends ListAgg {
    override protected def compactBuffer(b: ArrayBuffer[Array[Byte]]) = {
      if (b.length >= 3) {
        val head = b.head
        val rest = b.tail.clone()
        val u = unionOf(rest, gridSize)
        b.clear(); b += head; b += u
      }
      b
    }
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) emptyGC
      else if (b.length == 1) b.head
      else {
        val gs = readAll(b)
        val sub = unionGeoms(gs.tail, gridSize)
        writeWithSrid(
          overlayOp(org.locationtech.jts.operation.overlayng.OverlayNG.DIFFERENCE,
            gridSize)(gs.head, sub), sridOf(gs))
      }
  }

  /** Deterministic ordered `difference_all`: the minuend is the row with
    * the smallest value of an explicit order column (the reference folds in
    * strict row order, `expressions.rs:873-886`; Spark has no row order
    * after a shuffle, so the order is a parameter). Since
    * g0 \ g1 \ … \ gn ≡ g0 \ (g1 ∪ … ∪ gn), only the minuend needs order
    * bookkeeping; subtrahends union-compact freely. */
  class DifferenceAllOrderedAgg(gridSize: Double = 0.0)
      extends Aggregator[(Array[Byte], Long), (Long, Array[Byte], ArrayBuffer[Array[Byte]]), Array[Byte]] {
    def zero: (Long, Array[Byte], ArrayBuffer[Array[Byte]]) =
      (Long.MaxValue, null, ArrayBuffer.empty)
    private def compact(rest: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
      if (rest.length >= CompactAt) { val u = unionOf(rest, gridSize); rest.clear(); rest += u }
      else rest
    def reduce(b: (Long, Array[Byte], ArrayBuffer[Array[Byte]]),
        in: (Array[Byte], Long)): (Long, Array[Byte], ArrayBuffer[Array[Byte]]) = {
      val (g, idx) = in
      if (g == null) b
      else {
        val (mi, mg, rest) = b
        // mg == null disambiguates the sentinel: a REAL order value of
        // Long.MaxValue must still claim the empty minuend slot (idx < mi
        // alone would misfile it into the subtrahends and discard it)
        if (idx < mi || mg == null) {
          if (mg != null) rest += mg
          (idx, g, compact(rest))
        } else {
          rest += g
          (mi, mg, compact(rest))
        }
      }
    }
    def merge(a: (Long, Array[Byte], ArrayBuffer[Array[Byte]]),
        b: (Long, Array[Byte], ArrayBuffer[Array[Byte]])): (Long, Array[Byte], ArrayBuffer[Array[Byte]]) = {
      // a side with no minuend can never win the keep slot — at the
      // Long.MaxValue sentinel an index tie against the EMPTY buffer
      // would otherwise demote the real minuend to a subtrahend
      val (keep, drop) =
        if (a._2 == null && b._2 != null) (b, a)
        else if (b._2 == null && a._2 != null) (a, b)
        else if (a._1 <= b._1) (a, b) else (b, a)
      val rest = keep._3
      if (drop._2 != null) rest += drop._2
      rest ++= drop._3
      (keep._1, keep._2, compact(rest))
    }
    def finish(b: (Long, Array[Byte], ArrayBuffer[Array[Byte]])): Array[Byte] = {
      val (_, mg, rest) = b
      if (mg == null) emptyGC
      else if (rest.isEmpty) mg
      else {
        val m = EWKB.read(mg)
        val restGs = readAll(rest)
        val sub = unionGeoms(restGs, gridSize)
        // first-nonzero SRID over ALL inputs, like DifferenceAllAgg
        writeWithSrid(
          overlayOp(org.locationtech.jts.operation.overlayng.OverlayNG.DIFFERENCE,
            gridSize)(m, sub), sridOf(m +: restGs))
      }
    }
    def bufferEncoder: Encoder[(Long, Array[Byte], ArrayBuffer[Array[Byte]])] =
      ExpressionEncoder[(Long, Array[Byte], ArrayBuffer[Array[Byte]])]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Collect then single coverage union (reference `coverage_union_all`,
    * `functions.rs:1213-1219`); inputs must form a coverage, so partial
    * coverage-union compaction is valid. */
  class CoverageUnionAllAgg extends ListAgg {
    private def cu(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      val gs = readAll(b)
      val gc = fact.createGeometryCollection(gs.toArray)
      val u = org.locationtech.jts.operation.overlayng.CoverageUnion.union(gc)
      writeWithSrid(u, sridOf(gs))
    }
    override protected def compactBuffer(b: ArrayBuffer[Array[Byte]]) = {
      val u = cu(b); b.clear(); b += u
    }
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) emptyGC else cu(b)
  }

  /** Polygonize all rows' linework (reference `functions.rs:1221-1226`);
    * returns a GeometryCollection of polygons like GEOS. */
  class PolygonizeAgg extends ListAgg {
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      if (b.isEmpty) return emptyGC
      val gs = readAll(b)
      val p = new Polygonizer()
      gs.foreach(p.add)
      val polys = p.getPolygons.asScala.toSeq.map(_.asInstanceOf[Geometry])
      writeWithSrid(fact.createGeometryCollection(polys.toArray), sridOf(gs))
    }
  }

  /** Compaction for vertex-set aggregations: only distinct vertices matter,
    * so a full buffer collapses to one MultiPoint of unique coords. */
  abstract class VertexSetAgg extends ListAgg {
    override protected def compactBuffer(b: ArrayBuffer[Array[Byte]]) = {
      val gs = readAll(b)
      val srid = sridOf(gs)
      val seen = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      gs.foreach(_.apply(new CoordinateSequenceFilter {
        override def filter(cs: CoordinateSequence, i: Int): Unit =
          seen += ((cs.getX(i), cs.getY(i)))
        override def isDone = false
        override def isGeometryChanged = false
      }))
      val mp = fact.createMultiPoint(
        seen.toArray.map { case (x, y) => fact.createPoint(new Coordinate(x, y)) })
      val bytes = writeWithSrid(mp, srid)
      b.clear(); b += bytes
      b
    }
    protected def sites(b: ArrayBuffer[Array[Byte]]): (Geometry, Int) = {
      compactBuffer(b)
      val g = EWKB.read(b.head)
      (g, g.getSRID)
    }
  }

  /** Voronoi diagram of all vertices (reference `functions.rs:1791-1802`).
    * `extendTo` (xmin, ymin, xmax, ymax) clips the diagram to that envelope
    * instead of the default expanded site envelope (reference kwarg
    * `extend_to`, `geoexpr.py:937-945`). */
  class VoronoiPolygonsAgg(tolerance: Double, onlyEdges: Boolean,
      extendTo: Seq[Double] = null) extends VertexSetAgg {
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      if (b.isEmpty) return emptyGC
      val (pts, srid) = sites(b)
      if (pts.isEmpty) return emptyGC
      val builder = new VoronoiDiagramBuilder()
      builder.setSites(pts)
      builder.setTolerance(tolerance)
      if (extendTo != null) {
        require(extendTo.length == 4, "extend_to must be (xmin, ymin, xmax, ymax)")
        builder.setClipEnvelope(new Envelope(extendTo(0), extendTo(2), extendTo(1), extendTo(3)))
      }
      val diagram = builder.getDiagram(fact)
      val out = if (onlyEdges) {
        val lines = org.locationtech.jts.geom.util.LinearComponentExtracter.getLines(diagram)
        fact.createMultiLineString(
          lines.asScala.toArray.map(_.asInstanceOf[LineString]))
      } else diagram
      writeWithSrid(out, srid)
    }
  }

  /** Delaunay triangulation of all vertices (reference
    * `functions.rs:1364-1373`). */
  class DelaunayTrianglesAgg(tolerance: Double, onlyEdges: Boolean) extends VertexSetAgg {
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      if (b.isEmpty) return emptyGC
      val (pts, srid) = sites(b)
      if (pts.isEmpty) return emptyGC
      val builder = new DelaunayTriangulationBuilder()
      builder.setSites(pts)
      builder.setTolerance(tolerance)
      val out = if (onlyEdges) builder.getEdges(fact) else builder.getTriangles(fact)
      writeWithSrid(out, srid)
    }
  }

  /** Fold of per-row bounds → [minx, miny, maxx, maxy]; NaN identity
    * (reference `total_bounds`, `expressions.rs:512-527`). */
  class TotalBoundsAgg extends Aggregator[Array[Byte], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    private def mergeIn(b: Array[Double], xmin: Double, ymin: Double,
        xmax: Double, ymax: Double): Array[Double] = {
      def mn(a: Double, c: Double) = if (a.isNaN) c else if (c.isNaN) a else math.min(a, c)
      def mx(a: Double, c: Double) = if (a.isNaN) c else if (c.isNaN) a else math.max(a, c)
      b(0) = mn(b(0), xmin); b(1) = mn(b(1), ymin)
      b(2) = mx(b(2), xmax); b(3) = mx(b(3), ymax)
      b
    }
    def reduce(b: Array[Double], a: Array[Byte]): Array[Double] = {
      if (a == null) b
      else {
        val g = EWKB.read(a)
        if (g.isEmpty) b
        else {
          val e = g.getEnvelopeInternal
          mergeIn(b, e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
        }
      }
    }
    def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
      mergeIn(b1, b2(0), b2(1), b2(2), b2(3))
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  val unionAll: UserDefinedFunction = udaf(new UnionAllAgg)
  val totalBounds: UserDefinedFunction = udaf(new TotalBoundsAgg)
  val collect: UserDefinedFunction = udaf(new CollectAgg)
  val intersectionAll: UserDefinedFunction = udaf(new IntersectionAllAgg)
  val differenceAll: UserDefinedFunction = udaf(new DifferenceAllAgg)
  val differenceAllOrdered: UserDefinedFunction = udaf(new DifferenceAllOrderedAgg)
  val symmetricDifferenceAll: UserDefinedFunction = udaf(new SymmetricDifferenceAllAgg)
  val coverageUnionAll: UserDefinedFunction = udaf(new CoverageUnionAllAgg)
  val polygonize: UserDefinedFunction = udaf(new PolygonizeAgg)
  val voronoiPolygons: UserDefinedFunction = udaf(new VoronoiPolygonsAgg(0.0, false))
  val delaunayTriangles: UserDefinedFunction = udaf(new DelaunayTrianglesAgg(0.0, false))

  /** Parameterized variants (tolerance / extend_to / only_edges / grid_size),
    * reference `geoexpr.py:899-954`. */
  def voronoiPolygonsUdaf(tolerance: Double, onlyEdges: Boolean,
      extendTo: Seq[Double] = null): UserDefinedFunction =
    udaf(new VoronoiPolygonsAgg(tolerance, onlyEdges, extendTo))
  def delaunayTrianglesUdaf(tolerance: Double, onlyEdges: Boolean): UserDefinedFunction =
    udaf(new DelaunayTrianglesAgg(tolerance, onlyEdges))
  def unionAllUdaf(gridSize: Double): UserDefinedFunction =
    udaf(new UnionAllAgg(gridSize))
  def intersectionAllUdaf(gridSize: Double): UserDefinedFunction =
    udaf(new IntersectionAllAgg(gridSize))
  def differenceAllUdaf(gridSize: Double): UserDefinedFunction =
    udaf(new DifferenceAllAgg(gridSize))
  def differenceAllOrderedUdaf(gridSize: Double): UserDefinedFunction =
    udaf(new DifferenceAllOrderedAgg(gridSize))
  def symmetricDifferenceAllUdaf(gridSize: Double): UserDefinedFunction =
    udaf(new SymmetricDifferenceAllAgg(gridSize))

  /** Frame-level door for the ordered difference fold (r15, VERDICT r14
    * #5): "first ROW of this frame is the minuend, in the frame's
    * current row order" as ONE call. Spark's analyzer rejects
    * nondeterministic expressions inside aggregate-function arguments,
    * so a Column-level aggregate can never inject its own order key —
    * this door stamps `monotonically_increasing_id()` UPSTREAM (a plain
    * projection, where it is legal; ids are ordered by partition index
    * then row position, i.e. the frame's encounter order, and priced
    * free — PERF.md r14, 0.99×) and runs [[differenceAllOrdered]] over
    * it. Optional grouping columns fold each group independently;
    * `gridSize > 0` snaps operands to the precision grid first.
    * Output: the group columns plus `difference_all` (EWKB).
    *
    * The encounter-order caveat stays real at the edges: a frame fresh
    * off a shuffle has no defined row order, so order it (or group it)
    * explicitly first — same contract as the two-step recipe this
    * replaces (see `st_difference_all`'s scaladoc). */
  def differenceAllByRow(df: DataFrame, geom: Column,
      groupCols: Seq[Column] = Nil, gridSize: Double = 0.0): DataFrame = {
    val mid = "__graft_diff_mid"
    require(!df.columns.contains(mid),
      s"differenceAllByRow: input already carries a $mid column")
    val stamped = df.withColumn(mid, monotonically_increasing_id())
    val agg = (if (gridSize > 0)
        differenceAllOrderedUdaf(gridSize)(geom, col(mid))
      else differenceAllOrdered(geom, col(mid))).as("difference_all")
    stamped.groupBy(groupCols: _*).agg(agg)
  }

  /** SQL name → aggregator UDF. */
  val all: Seq[(String, UserDefinedFunction)] = Seq(
    "st_union_all" -> unionAll,
    "st_total_bounds" -> totalBounds,
    "st_collect" -> collect,
    "st_intersection_all" -> intersectionAll,
    "st_difference_all" -> differenceAll,
    "st_difference_all_ordered" -> differenceAllOrdered,
    "st_symmetric_difference_all" -> symmetricDifferenceAll,
    "st_coverage_union_all" -> coverageUnionAll,
    "st_polygonize" -> polygonize,
    "st_voronoi_polygons" -> voronoiPolygons,
    "st_delaunay_triangles" -> delaunayTriangles)
}
