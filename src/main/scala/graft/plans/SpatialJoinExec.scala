package graft.plans

import graft.serde.EWKB
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

import scala.jdk.CollectionConverters._

/** Planner strategy: `left.join(right, st_intersects(lGeom, rGeom))`
  * auto-plans as a broadcast STRtree spatial join instead of Spark's
  * default Cartesian/BroadcastNestedLoopJoin (O(n·m) with a full predicate
  * evaluation per pair). Injected by [[GraftExtensions]].
  *
  * Applies to INNER joins whose condition is a single named spatial
  * predicate UDF with one geometry expression per side, when one side's
  * size estimate fits the broadcast threshold. Asymmetric predicates flip
  * to their converse when the build side must swap (contains ↔ within,
  * covers ↔ covered_by); non-flippable cases simply decline and Spark's
  * default strategies take over — semantics never change, only the
  * algorithm. */
object SpatialJoinStrategy extends SparkStrategy {

  /** predicate name → converse when probe/build sides swap. */
  private val Converse: Map[String, String] = Map(
    "st_intersects" -> "st_intersects",
    "st_overlaps" -> "st_overlaps",
    "st_touches" -> "st_touches",
    "st_equals" -> "st_equals",
    "st_contains" -> "st_within",
    "st_within" -> "st_contains",
    "st_covers" -> "st_covered_by",
    "st_covered_by" -> "st_covers")

  /** sjoin predicate key for SpatialJoin.applyPred(build, probe). */
  private def predKey(name: String): String = name.stripPrefix("st_")

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(u: ScalaUDF), _)
        if u.udfName.exists(Converse.contains) && u.children.length == 2 =>
      val Seq(a, b) = u.children
      val name = u.udfName.get
      val threshold = SQLConf.get.autoBroadcastJoinThreshold max (64L << 20)
      def fits(p: LogicalPlan) = p.stats.sizeInBytes <= threshold

      // condition arguments must split cleanly across the two sides
      val straight = a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)
      val crossed = a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)

      if (straight) {
        // predicate is pred(leftGeom, rightGeom)
        if (fits(l))
          // build left, probe right: applyPred(build=left, probe=right) = pred
          SpatialJoinExec(planLater(l), planLater(r), a, b,
            predKey(name), buildLeft = true) :: Nil
        else if (fits(r))
          // build right, probe left: applyPred(build=right, probe=left)
          // must be the converse predicate
          SpatialJoinExec(planLater(l), planLater(r), a, b,
            predKey(Converse(name)), buildLeft = false) :: Nil
        else Nil
      } else if (crossed) {
        // pred(rightGeom, leftGeom): same with roles pre-swapped
        if (fits(l))
          SpatialJoinExec(planLater(l), planLater(r), b, a,
            predKey(Converse(name)), buildLeft = true) :: Nil
        else if (fits(r))
          SpatialJoinExec(planLater(l), planLater(r), b, a,
            predKey(name), buildLeft = false) :: Nil
        else Nil
      } else Nil
    case _ => Nil
  }
}

/** Broadcast STRtree spatial join exec: collect + broadcast the build side,
  * per-executor prepared STRtree (cached per broadcast), streamed probe.
  * `leftGeom`/`rightGeom` are the condition's geometry expressions for the
  * left/right child; `predicate` is pre-oriented as
  * `applyPred(buildGeom, probeGeom)`. */
case class SpatialJoinExec(left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression, predicate: String,
    buildLeft: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SpatialJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (build, probe) = if (buildLeft) (left, right) else (right, left)
    val (buildGeomExpr, probeGeomExpr) =
      if (buildLeft) (leftGeom, rightGeom) else (rightGeom, leftGeom)
    val boundBuild = BindReferences.bindReference(buildGeomExpr, build.output)
    val buildRows = build.executeCollect() // stats-guarded by the strategy
    val data: Array[(Array[Byte], InternalRow)] = buildRows.flatMap { row =>
      Option(boundBuild.eval(row)).map(b => (b.asInstanceOf[Array[Byte]], row))
    }
    val bc: Broadcast[Array[(Array[Byte], InternalRow)]] =
      sparkContext.broadcast(data)
    val boundProbe = BindReferences.bindReference(probeGeomExpr, probe.output)
    val pred = predicate
    val buildOnLeft = buildLeft
    val outAttrs = output

    probe.execute().mapPartitions { it =>
      val tree = SpatialJoinExec.treeFor(bc)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      it.flatMap { probeRow =>
        val bytes = boundProbe.eval(probeRow)
        if (bytes == null) Iterator.empty
        else {
          val g = EWKB.read(bytes.asInstanceOf[Array[Byte]])
          if (g.isEmpty) Iterator.empty
          else tree.query(g.getEnvelopeInternal).asScala.iterator
            .map(_.asInstanceOf[(PreparedGeometry, InternalRow)])
            .filter { case (prep, _) => graft.join.SpatialJoin.applyPred(pred, prep, g) }
            .map { case (_, buildRow) =>
              if (buildOnLeft) proj(joined(buildRow, probeRow))
              else proj(joined(probeRow, buildRow))
            }
        }
      }
    }
  }
}

object SpatialJoinExec {
  /** per-executor tree cache keyed by the broadcast OBJECT with weak keys —
    * broadcast ids restart per SparkContext, so an id-keyed map can serve a
    * stale tree after a context restart; weak keys also let trees age out
    * with their broadcasts on long-lived executors. */
  private val trees = new java.util.WeakHashMap[Broadcast[_], STRtree]()

  private def treeFor(bc: Broadcast[Array[(Array[Byte], InternalRow)]]): STRtree =
    trees.synchronized {
      var t = trees.get(bc)
      if (t == null) {
        t = new STRtree()
        bc.value.foreach { case (bytes, row) =>
          val g = EWKB.read(bytes)
          if (!g.isEmpty)
            t.insert(g.getEnvelopeInternal, (PreparedGeometryFactory.prepare(g), row))
        }
        t.build()
        trees.put(bc, t)
      }
      t
    }
}
