package graft

import org.locationtech.jts.geom._
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.jdk.CollectionConverters._

/** Scratch probe: raw JTS cascaded-union scaling on the bench layout. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val fact = new GeometryFactory()
    def rects(n: Int): Seq[Geometry] = (0 until n).map { i =>
      // the bench layout: stride-16 grid columns, only 16 distinct rows
      val x = (i % 10000) * 16.0
      val y = (i % 16) * 16.0
      fact.toGeometry(new Envelope(x, x + 2, y, y + 2))
    }
    for (n <- Seq(146, 1000, 4000, 9400)) {
      val rs = rects(n)
      val t0 = System.nanoTime()
      val u = UnaryUnionOp.union(rs.asJava.asInstanceOf[java.util.Collection[Geometry]])
      println(f"n=$n%6d  ${(System.nanoTime() - t0) / 1e9}%.3f s  parts=${u.getNumGeometries}")
    }
  }
}
