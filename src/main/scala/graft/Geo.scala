package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal

/** SQL-name registration for the full `ST_*` surface, the Spark analog of
  * the reference's plugin registration (`/root/reference/polars_st/
  * geoexpr.py:35-58`). Call once per session; after that every function is
  * usable from `spark.sql` and, via [[graft.functions]], the Column API.
  *
  * Deliberate shadowing: Spark 4.1 ships a handful of built-in `st_*`
  * names (`st_geomfromwkb`, `st_srid`, …) with geography-flavored
  * semantics. `registerAll` REPLACES them in the session registry so that
  * SQL behaves exactly like this library's Column API and the reference
  * (EWKB in/out, reference null/NaN conventions). Scala code that imports
  * both `org.apache.spark.sql.functions._` and `graft.functions._` must
  * qualify those two names (see SurfaceSpec). */
object Geo {

  /** SQL names that accept the reference's optional keyword arguments:
    * name → (full-arity UDF, trailing-argument defaults). A call may omit
    * any suffix of the defaults — `st_buffer(g, 1.0)` in SQL behaves like
    * the Column API / reference default form. Defaults mirror
    * `graft.functions` (which mirrors the reference's kwargs). */
  private def defaultedUdfs: Seq[(String, Int,
      org.apache.spark.sql.expressions.UserDefinedFunction,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression])] = {
    val u = graft.functions.GeoUDFs
    Seq(
      ("st_buffer", 7, u.buffer, Seq(Literal(8), Literal("round"), Literal("round"), Literal(5.0), Literal(false))),
      ("st_offset_curve", 5, u.offsetCurve, Seq(Literal(8), Literal("round"), Literal(5.0))),
      ("st_concave_hull", 3, u.concaveHull, Seq(Literal(false))),
      ("st_simplify", 3, u.simplify, Seq(Literal(true))),
      ("st_force_3d", 2, u.force3d, Seq(Literal(0.0))),
      ("st_translate", 4, u.translate, Seq(Literal(0.0))),
      ("st_rotate", 3, u.rotate, Seq(Literal("center"))),
      ("st_scale", 5, u.scale, Seq(Literal(1.0), Literal("center"))),
      ("st_skew", 4, u.skew, Seq(Literal("center"))),
      ("st_interpolate", 3, u.interpolate, Seq(Literal(false))),
      ("st_project", 3, u.project, Seq(Literal(false))),
      ("st_line_merge", 2, u.lineMerge, Seq(Literal(false))),
      ("st_set_precision", 3, u.setPrecision, Seq(Literal("valid_output"))),
      ("st_linearize", 2, u.linearize, Seq(Literal(32))),
      ("st_aswkb", 4, u.asWkb, Seq(Literal(3), Literal(false), Literal(false))))
  }

  def registerAll(spark: SparkSession): Unit = {
    val r = spark.udf
    graft.functions.GeoUDFs.all.foreach { case (name, f) => r.register(name, f) }
    graft.aggs.GeoAggs.all.foreach { case (name, f) => r.register(name, f) }
    // overwrite the kwargs-bearing names with arity-flexible builders that
    // pad omitted trailing arguments with the reference defaults
    defaultedUdfs.foreach { case (name, full, udfF, defaults) =>
      val min = full - defaults.length
      val builder = (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length < min || children.length > full)
          throw new IllegalArgumentException(
            s"$name expects between $min and $full arguments, got ${children.length}")
        val padded = children ++ defaults.drop(children.length - min)
        org.apache.spark.sql.graft.ColumnBridge.scalaUDF(udfF, padded)
      }
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF].getName, name),
        builder)
    }
    // native codegen expressions (st_*_native) — same surface the
    // GraftExtensions injection provides, for sessions built without it
    graft.plans.GeoExpressions.registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // Optimizer rules + spatial-join strategy for sessions built WITHOUT
    // `withExtensions(new GraftExtensions)`: Spark's experimental hooks
    // retrofit the same tiers. Safe when extensions are present too — both
    // rules are idempotent (fused chains are skipped on a second pass; the
    // bbox rule fires only while the filter doesn't reference the covering
    // column) and a duplicate strategy just never gets asked second.
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(graft.plans.GeoFusionRule))
      exp.extraOptimizations = exp.extraOptimizations ++
        Seq(graft.plans.BboxFilterRule, graft.plans.GeoFusionRule)
    if (!exp.extraStrategies.contains(graft.plans.SpatialJoinStrategy))
      exp.extraStrategies = exp.extraStrategies ++ Seq(graft.plans.SpatialJoinStrategy)
  }

  /** All registered SQL function names (for the API-consistency spec). */
  def sqlNames: Seq[String] =
    graft.functions.GeoUDFs.all.map(_._1) ++ graft.aggs.GeoAggs.all.map(_._1) ++
      graft.plans.GeoExpressions.registrations.map(_._1.funcName)
}
