package graft.join

import org.locationtech.jts.geom.Envelope

/** Sample-adaptive quadtree space partitioning for the large×large spatial
  * join (the published GeoSpark/Sedona design): leaves subdivide where the
  * sampled data is dense, so a skewed dataset (city-center cluster + rural
  * tail) gets many small cells in the hot spot and few large ones
  * elsewhere — a uniform grid would put the whole cluster in one straggler
  * cell.
  *
  * Leaves partition the root extent with half-open boxes
  * `[minX, maxX) × [minY, maxY)` (closed on the global max edges), so every
  * clamped point belongs to exactly one leaf — the property the
  * reference-point dedup rule needs. Points outside the sampled extent
  * clamp onto the boundary, so boundary leaves own the outside world. */
final case class QuadTree(root: QuadTree.Node, extent: Envelope) extends Serializable {

  import QuadTree._

  /** Leaf ids whose box intersects the (clamped) envelope. */
  def leavesFor(e: Envelope): Seq[Int] = {
    val minX = clamp(e.getMinX, extent.getMinX, extent.getMaxX)
    val maxX = clamp(e.getMaxX, extent.getMinX, extent.getMaxX)
    val minY = clamp(e.getMinY, extent.getMinY, extent.getMaxY)
    val maxY = clamp(e.getMaxY, extent.getMinY, extent.getMaxY)
    val out = Seq.newBuilder[Int]
    // the mid-value comparisons fully decide the descent — node bounds
    // need no threading (a past version passed four dead parameters that
    // suggested an envelope test which never existed)
    def walk(n: Node): Unit =
      n match {
        case Leaf(id) => out += id
        case Branch(midX, midY, sw, se, nw, ne) =>
          if (minX < midX && minY < midY) walk(sw)
          if (maxX >= midX && minY < midY) walk(se)
          if (minX < midX && maxY >= midY) walk(nw)
          if (maxX >= midX && maxY >= midY) walk(ne)
      }
    walk(root)
    out.result()
  }

  /** The unique leaf owning the (clamped) point — half-open semantics. */
  def leafOf(x0: Double, y0: Double): Int = {
    val x = clamp(x0, extent.getMinX, extent.getMaxX)
    val y = clamp(y0, extent.getMinY, extent.getMaxY)
    var n = root
    while (true) {
      n match {
        case Leaf(id) => return id
        case Branch(midX, midY, sw, se, nw, ne) =>
          n = if (x < midX) { if (y < midY) sw else nw }
              else { if (y < midY) se else ne }
      }
    }
    -1 // unreachable
  }
}

object QuadTree {

  sealed trait Node extends Serializable
  final case class Leaf(id: Int) extends Node
  final case class Branch(midX: Double, midY: Double,
      sw: Node, se: Node, nw: Node, ne: Node) extends Node

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    // nextDown on the high edge keeps clamped points inside the half-open
    // partition (the closing edge belongs to the outermost leaves anyway)
    if (v < lo) lo else if (v >= hi) math.nextDown(hi) else v

  /** Build from sample points (envelope centers): split while a node holds
    * more than `capacity` samples and `maxDepth` allows. */
  def build(samples: Seq[(Double, Double)], capacity: Int, maxDepth: Int): QuadTree = {
    require(samples.nonEmpty, "quadtree needs a non-empty sample")
    val minX = samples.iterator.map(_._1).min
    val maxX0 = samples.iterator.map(_._1).max
    val minY = samples.iterator.map(_._2).min
    val maxY0 = samples.iterator.map(_._2).max
    // degenerate extents (single point / line) get a tiny positive span
    val maxX = if (maxX0 > minX) maxX0 else minX + 1.0
    val maxY = if (maxY0 > minY) maxY0 else minY + 1.0
    var nextId = 0
    def split(pts: Seq[(Double, Double)], nMinX: Double, nMinY: Double,
        nMaxX: Double, nMaxY: Double, depth: Int): Node = {
      if (pts.length <= capacity || depth >= maxDepth) {
        val id = nextId; nextId += 1; Leaf(id)
      } else {
        val midX = (nMinX + nMaxX) / 2
        val midY = (nMinY + nMaxY) / 2
        val (lo, hi) = pts.partition(_._2 < midY)
        val (sw, se) = lo.partition(_._1 < midX)
        val (nw, ne) = hi.partition(_._1 < midX)
        Branch(midX, midY,
          split(sw, nMinX, nMinY, midX, midY, depth + 1),
          split(se, midX, nMinY, nMaxX, midY, depth + 1),
          split(nw, nMinX, midY, midX, nMaxY, depth + 1),
          split(ne, midX, midY, nMaxX, nMaxY, depth + 1))
      }
    }
    val env = new Envelope(minX, maxX, minY, maxY)
    QuadTree(split(samples, minX, minY, maxX, maxY, 0), env)
  }
}
