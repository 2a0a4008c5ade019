package graft

import org.apache.spark.sql.SparkSession

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
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.udf
    graft.functions.GeoUDFs.all.foreach { case (name, f) => r.register(name, f) }
    graft.aggs.GeoAggs.all.foreach { case (name, f) => r.register(name, f) }
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
