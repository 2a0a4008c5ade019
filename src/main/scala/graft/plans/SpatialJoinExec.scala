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
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      def fits(p: LogicalPlan) = threshold > 0 && p.stats.sizeInBytes <= threshold

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
        else
          // large × large: quadtree-partitioned shuffle join (per-cell tree
          // over the left slice, applyPred(left, right) = pred)
          SpatialJoinQuadtreeExec(planLater(l), planLater(r), a, b, predKey(name)) :: Nil
      } else if (crossed) {
        // pred(rightGeom, leftGeom): same with roles pre-swapped
        if (fits(l))
          SpatialJoinExec(planLater(l), planLater(r), b, a,
            predKey(Converse(name)), buildLeft = true) :: Nil
        else if (fits(r))
          SpatialJoinExec(planLater(l), planLater(r), b, a,
            predKey(name), buildLeft = false) :: Nil
        else
          SpatialJoinQuadtreeExec(planLater(l), planLater(r), b, a,
            predKey(Converse(name))) :: Nil
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

/** Large×large spatial join: sample-adaptive [[graft.join.QuadTree]]
  * partitioning at the physical level. Both children flatMap their rows to
  * covering quadtree leaves, an RDD cogroup shuffles on leaf id, each cell
  * builds a prepared STRtree over its left slice and streams its right
  * slice; the reference-point rule keeps each pair unique. The quadtree is
  * built from a driver-side sample of the left child (correctness never
  * depends on the sample — only balance does). */
case class SpatialJoinQuadtreeExec(left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression, predicate: String)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SpatialJoinQuadtreeExec =
    copy(left = newLeft, right = newRight)

  private val SampleTarget = 20000

  override protected def doExecute(): RDD[InternalRow] = {
    val boundL = BindReferences.bindReference(leftGeom, left.output)
    val boundR = BindReferences.bindReference(rightGeom, right.output)

    // driver-side sample of left envelope centers (partition-prefix biased —
    // acceptable: the tree only drives balance, never correctness)
    val sample = left.execute().mapPartitions { it =>
      val bound = boundL // per-task copy
      it.flatMap { row =>
        Option(bound.eval(row)).map { b =>
          val e = EWKB.read(b.asInstanceOf[Array[Byte]]).getEnvelopeInternal
          ((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2)
        }
      }
    }.take(SampleTarget)
    if (sample.isEmpty) return sparkContext.emptyRDD[InternalRow]
    val tree = graft.join.QuadTree.build(sample.toSeq, capacity = 256, maxDepth = 12)
    val bcTree = sparkContext.broadcast(tree)
    val pred = predicate
    val outAttrs = output
    val parts = conf.numShufflePartitions

    def cells(rdd: RDD[InternalRow], bound: Expression): RDD[(Int, InternalRow)] =
      rdd.mapPartitions { it =>
        val qt = bcTree.value
        it.flatMap { row =>
          val bytes = bound.eval(row)
          if (bytes == null) Iterator.empty
          else {
            val e = EWKB.read(bytes.asInstanceOf[Array[Byte]]).getEnvelopeInternal
            if (e.isNull) Iterator.empty
            else {
              val copy = row.copy() // rows are reused by the scan iterator
              qt.leavesFor(e).iterator.map(c => (c, copy))
            }
          }
        }
      }

    cells(left.execute(), boundL).cogroup(cells(right.execute(), boundR), parts)
      .mapPartitions { cellIt =>
        val qt = bcTree.value
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val bl = boundL
        val br = boundR
        cellIt.flatMap { case (cell, (lRows, rRows)) =>
          val tree = new STRtree()
          var n = 0
          lRows.foreach { row =>
            val bytes = bl.eval(row)
            if (bytes != null) {
              val g = EWKB.read(bytes.asInstanceOf[Array[Byte]])
              if (!g.isEmpty) {
                tree.insert(g.getEnvelopeInternal, (PreparedGeometryFactory.prepare(g), row))
                n += 1
              }
            }
          }
          if (n == 0) Iterator.empty
          else {
            tree.build()
            rRows.iterator.flatMap { rrow =>
              val bytes = br.eval(rrow)
              if (bytes == null) Iterator.empty
              else {
                val g = EWKB.read(bytes.asInstanceOf[Array[Byte]])
                if (g.isEmpty) Iterator.empty
                else {
                  val re = g.getEnvelopeInternal
                  tree.query(re).asScala.iterator
                    .map(_.asInstanceOf[(PreparedGeometry, InternalRow)])
                    .filter { case (prep, _) =>
                      val le = prep.getGeometry.getEnvelopeInternal
                      qt.leafOf(math.max(le.getMinX, re.getMinX),
                        math.max(le.getMinY, re.getMinY)) == cell
                    }
                    .filter { case (prep, _) =>
                      graft.join.SpatialJoin.applyPred(pred, prep, g) }
                    .map { case (_, lrow) => proj(joined(lrow, rrow)) }
                }
              }
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
