package graft.serde

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.impl.CoordinateArraySequence

/** Coordinate-level geometry rebuild helpers used by dimension-changing and
  * affine operations (reference kernels `/root/reference/src/functions.rs:
  * 1451-1698`). */
object GeomUtil {

  /** A coordinate transform: (x, y, z) -> (x, y, z); z may be NaN. */
  type CoordFn = (Double, Double, Double) => (Double, Double, Double)

  /** Rebuild a geometry applying `f` to every coordinate. `forceDim` of 2
    * drops Z, 3 keeps/creates Z, 0 preserves the input dimensionality. */
  def mapCoords(g: Geometry, f: CoordFn, forceDim: Int = 0): Geometry = {
    val factory = g.getFactory
    val keepZ = forceDim match {
      case 2 => false
      case 3 => true
      case _ => EWKB.hasZ(g)
    }

    def seq(cs: CoordinateSequence): CoordinateSequence = {
      val n = cs.size()
      val dim = if (keepZ) 3 else 2
      val out = new CoordinateArraySequence(n, dim)
      var i = 0
      while (i < n) {
        val z0 = if (cs.hasZ) cs.getZ(i) else Double.NaN
        val (x, y, z) = f(cs.getX(i), cs.getY(i), z0)
        out.setOrdinate(i, 0, x)
        out.setOrdinate(i, 1, y)
        if (keepZ) out.setOrdinate(i, 2, z)
        i += 1
      }
      out
    }

    def rebuild(g: Geometry): Geometry = g match {
      case p: Point =>
        if (p.isEmpty) factory.createPoint()
        else factory.createPoint(seq(p.getCoordinateSequence))
      case r: LinearRing =>
        if (r.isEmpty) factory.createLinearRing()
        else factory.createLinearRing(seq(r.getCoordinateSequence))
      case l: LineString =>
        if (l.isEmpty) factory.createLineString()
        else factory.createLineString(seq(l.getCoordinateSequence))
      case p: Polygon =>
        if (p.isEmpty) factory.createPolygon()
        else {
          val shell = rebuild(p.getExteriorRing).asInstanceOf[LinearRing]
          val holes = Array.tabulate(p.getNumInteriorRing)(i =>
            rebuild(p.getInteriorRingN(i)).asInstanceOf[LinearRing])
          factory.createPolygon(shell, holes)
        }
      case m: MultiPoint =>
        factory.createMultiPoint(
          Array.tabulate(m.getNumGeometries)(i => rebuild(m.getGeometryN(i)).asInstanceOf[Point]))
      case m: MultiLineString =>
        factory.createMultiLineString(
          Array.tabulate(m.getNumGeometries)(i => rebuild(m.getGeometryN(i)).asInstanceOf[LineString]))
      case m: MultiPolygon =>
        factory.createMultiPolygon(
          Array.tabulate(m.getNumGeometries)(i => rebuild(m.getGeometryN(i)).asInstanceOf[Polygon]))
      case c: GeometryCollection =>
        factory.createGeometryCollection(
          Array.tabulate(c.getNumGeometries)(i => rebuild(c.getGeometryN(i))))
      case other => other.copy()
    }

    val out = rebuild(g)
    out.setSRID(g.getSRID)
    out
  }

  /** Drop consecutive coordinates closer than `tol` (reference
    * `remove_repeated_points`, `functions.rs:1419-1428`). Rings keep their
    * closing coordinate. Points and empties pass through. */
  def mapCoordsFilterRepeated(g: Geometry, tol: Double): Geometry = {
    val factory = g.getFactory
    def filterCoords(cs: Array[Coordinate], isRing: Boolean): Array[Coordinate] = {
      if (cs.length == 0) return cs
      val out = scala.collection.mutable.ArrayBuffer(cs.head)
      for (c <- cs.tail) if (c.distance(out.last) > tol) out += c
      if (isRing) {
        // re-close; a ring needs >= 4 points
        if (out.last.distance(cs.head) > 0) out += new Coordinate(cs.head)
        while (out.length < 4) out.insert(out.length - 1, new Coordinate(cs.head))
      } else if (out.length < 2) out += new Coordinate(cs.head)
      out.toArray
    }
    def rebuild(g: Geometry): Geometry = g match {
      case p: Point => p.copy()
      case r: LinearRing =>
        if (r.isEmpty) r.copy()
        else factory.createLinearRing(filterCoords(r.getCoordinates, isRing = true))
      case l: LineString =>
        if (l.isEmpty) l.copy()
        else factory.createLineString(filterCoords(l.getCoordinates, isRing = false))
      case p: Polygon =>
        if (p.isEmpty) p.copy()
        else factory.createPolygon(
          rebuild(p.getExteriorRing).asInstanceOf[LinearRing],
          Array.tabulate(p.getNumInteriorRing)(i =>
            rebuild(p.getInteriorRingN(i)).asInstanceOf[LinearRing]))
      case c: GeometryCollection =>
        val parts = Array.tabulate(c.getNumGeometries)(i => rebuild(c.getGeometryN(i)))
        c match {
          case _: MultiPoint => factory.createMultiPoint(parts.map(_.asInstanceOf[Point]))
          case _: MultiLineString => factory.createMultiLineString(parts.map(_.asInstanceOf[LineString]))
          case _: MultiPolygon => factory.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]))
          case _ => factory.createGeometryCollection(parts)
        }
      case other => other.copy()
    }
    val out = rebuild(g)
    out.setSRID(g.getSRID)
    out
  }

  /** All coordinates of a geometry as [x, y] or [x, y, z] rows, recursive
    * over parts (reference `coordinates`, `functions.rs:556-621`). */
  def coordinateRows(g: Geometry, forceDim: Option[Int]): Seq[Seq[Double]] = {
    val want3 = forceDim.map(_ == 3).getOrElse(EWKB.hasZ(g))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    g.apply(new CoordinateSequenceFilter {
      override def filter(cs: CoordinateSequence, i: Int): Unit = {
        if (want3) buf += Seq(cs.getX(i), cs.getY(i), if (cs.hasZ) cs.getZ(i) else Double.NaN)
        else buf += Seq(cs.getX(i), cs.getY(i))
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = false
    })
    buf.toSeq
  }

  /** Structural 3D-aware equality: same type, same parts, same coordinates
    * in order with NaN==NaN (reference `equals_identical`,
    * `functions.rs:1032-1038`; shapely `equals_identical` semantics). */
  def equalsIdentical(a: Geometry, b: Geometry): Boolean = {
    if (a.getGeometryType != b.getGeometryType) return false
    if (a.getNumGeometries != b.getNumGeometries) return false
    (a, b) match {
      case (pa: Polygon, pb: Polygon) =>
        pa.getNumInteriorRing == pb.getNumInteriorRing &&
          equalsIdentical(pa.getExteriorRing, pb.getExteriorRing) &&
          (0 until pa.getNumInteriorRing).forall(i =>
            equalsIdentical(pa.getInteriorRingN(i), pb.getInteriorRingN(i)))
      case (ca: GeometryCollection, cb: GeometryCollection) =>
        (0 until ca.getNumGeometries).forall(i =>
          equalsIdentical(ca.getGeometryN(i), cb.getGeometryN(i)))
      case _ =>
        // full XYZM comparison: comparing only xyz made geometries
        // differing solely in M (or in M presence) compare equal, where
        // the reference's equals_identical distinguishes them. A missing
        // ordinate reads as NaN and NaN == NaN here — dimension presence
        // in this engine's value domain is equivalent to NaN content
        // (EWKB flags key on actual ordinate values).
        def xyzm(g: Geometry): Seq[(Double, Double, Double, Double)] = {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(Double, Double, Double, Double)]
          g.apply(new CoordinateSequenceFilter {
            override def filter(cs: CoordinateSequence, i: Int): Unit =
              buf += ((cs.getX(i), cs.getY(i),
                if (cs.hasZ) cs.getZ(i) else Double.NaN,
                if (cs.hasM) cs.getM(i) else Double.NaN))
            override def isDone: Boolean = false
            override def isGeometryChanged: Boolean = false
          })
          buf.toSeq
        }
        def eqNaN(x: Double, y: Double): Boolean = x == y || (x.isNaN && y.isNaN)
        val sa = xyzm(a)
        val sb = xyzm(b)
        sa.length == sb.length && sa.zip(sb).forall { case (ra, rb) =>
          eqNaN(ra._1, rb._1) && eqNaN(ra._2, rb._2) &&
            eqNaN(ra._3, rb._3) && eqNaN(ra._4, rb._4)
        }
    }
  }
}
