package graft.aggs

import graft.serde.{EWKB, GeoCodec}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Geometry aggregations (reference §2.7, `/root/reference/polars_st/
  * geoexpr.py:899-954`). Distributed design: partial aggregation on
  * executors (update/merge are commutative+associative for these ops),
  * buffers hold EWKB byte arrays and are **compacted** (unioned) once they
  * exceed a threshold so executor memory stays bounded at 100 TB scale
  * instead of accumulating every row.
  *
  * Identity on empty/all-null input: `GEOMETRYCOLLECTION EMPTY`
  * (`/root/reference/tests/test_expressions.py:293-307`). */
object GeoAggs {

  private val CompactAt = 64

  private def emptyGC: Array[Byte] = EWKB.write(GeoCodec.emptyCollection)

  private def unionOf(parts: ArrayBuffer[Array[Byte]]): Array[Byte] =
    if (parts.isEmpty) emptyGC
    else {
      val geoms = parts.map(EWKB.read).toList
      val srid = geoms.iterator.map(_.getSRID).find(_ != 0).getOrElse(0)
      val u = UnaryUnionOp.union(geoms.asJava.asInstanceOf[java.util.Collection[Geometry]])
      val r = if (u == null) GeoCodec.emptyCollection else u
      if (srid != 0) r.setSRID(srid)
      EWKB.write(r)
    }

  /** Cascaded union (reference `union_all`, `expressions.rs:984-999`). */
  class UnionAllAgg extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], Array[Byte]] {
    def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Array[Byte]], a: Array[Byte]): ArrayBuffer[Array[Byte]] = {
      if (a != null) b += a
      compact(b)
    }
    def merge(b1: ArrayBuffer[Array[Byte]], b2: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
      compact(b1 ++= b2)
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) emptyGC else unionOf(b)
    private def compact(b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
      if (b.length >= CompactAt) { val u = unionOf(b); b.clear(); b += u } else b
    def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] =
      Encoders.kryo[ArrayBuffer[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
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
    def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  val unionAll: UserDefinedFunction = udaf(new UnionAllAgg)
  val totalBounds: UserDefinedFunction = udaf(new TotalBoundsAgg)
}
