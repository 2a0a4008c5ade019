package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Geometry inputs for oracle-checked queries are derived from integer table
  * keys with **dyadic-rational** coordinates (k/4, k/8 …): every derived
  * coordinate, area, length and midpoint is then exactly representable in
  * IEEE double, so the DuckDB oracle recomputing the same value closed-form
  * in plain SQL hash-matches bit-for-bit (DuckDB has no spatial extension in
  * this environment).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // Derived rectangle from an integer key, disjoint across distinct keys:
  // anchored on a stride-16 grid, w in [1,4], h in [1,3.5] (dyadic quarters).
  private def boxCols(key: Column): (Column, Column, Column, Column) = {
    val xmin = (key % 1000000).cast("double") * 16.0
    val ymin = (key % 16).cast("double") * 16.0
    val w = lit(1.0) + (key % 13).cast("double") / 4.0
    val h = lit(1.0) + (key % 11).cast("double") / 4.0
    (xmin, ymin, xmin + w, ymin + h)
  }

  /** Flagship query on sf=0.001 (README flagship shape,
    * `/root/reference/README.md:19-29`): build geometries, group, spatially
    * aggregate, measure, serialize. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = t(spark, dir, "orders")
    val (xmin, ymin, xmax, ymax) = boxCols(col("o_orderkey"))
    o.select(col("o_orderpriority"), st_rectangle(xmin, ymin, xmax, ymax).as("geometry"))
      .groupBy(col("o_orderpriority"))
      .agg(st_union_all(col("geometry")).as("geometry"))
      .withColumn("area", st_area(col("geometry")))
      .withColumn("wkt", substring(st_aswkt(col("geometry")), 1, 60))
      .drop("geometry")
  }

  /** One entry per implemented operator from SURVEY.md §2 (geometry surface
    * in [[GeoQueries]], LLM-pipeline surface in [[PipelineQueries]]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ GeoQueries.queries ++ PipelineQueries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      // revenue in exact integer "cent·percent" units: price and discount
      // both have 2 decimals, so round(×100) recovers exact integers and
      // the sum is order-independent — a double sum would depend on the
      // nondeterministic partial-aggregation order and can miss the
      // oracle's exact compare.
      val p100 = round(col("l_extendedprice") * 100).cast("long")
      val d100 = round(col("l_discount") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(p100 * (lit(100L) - d100)).as("revenue_u"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // st_rectangle + st_area: oracle recomputes w*h closed-form. The
    // rectangle is constructed once in a prior projection (UDF CSE is not
    // guaranteed, so a repeated st_rectangle would cost 2×).
    "geo_rect_area" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val (xmin, ymin, xmax, ymax) = boxCols(col("o_orderkey"))
      o.select(col("o_orderkey"), st_rectangle(xmin, ymin, xmax, ymax).as("g"))
        .select(
          col("o_orderkey"),
          st_area(col("g")).as("area"),
          st_length(col("g")).as("perimeter"))
        .orderBy(col("o_orderkey"))
    }),

    // event-time bucketing over the events stream table (the batch shape of
    // graft.streaming.GeoStreaming.windowedStats): hour buckets + order-
    // independent stats (count/min/max/sum-of-long are FP-order-safe).
    "q_events_window" -> ((s, dir) => {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) — read as raw
      // nanosecond longs via nanosAsLong — and TIMESTAMP(MICROS) — read as a
      // timestamp type. Bucket with exact integer division in either case (a
      // double division would lose low bits at bucket boundaries); the
      // session timezone is pinned to UTC so unix_micros on the cast
      // timestamp matches DuckDB's epoch_ns on the same naive value.
      val ev = t(s, dir, "events")
      val bucket = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 3600000000000")
        case _ => expr("unix_micros(cast(ts as timestamp)) div 3600000000")
      }
      ev
        .select(
          bucket.as("bucket"),
          col("event_type"), col("value"), col("user_id"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("vmin"),
          max(col("value")).as("vmax"),
          sum(col("user_id")).as("uid_sum"))
        .orderBy(col("bucket"), col("event_type"))
    }),

    // groupBy + st_union_all of disjoint boxes: union area == sum of areas.
    "geo_union_area" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val (xmin, ymin, xmax, ymax) = boxCols(col("o_orderkey"))
      o.select((col("o_orderkey") % 16).as("grp"),
          st_rectangle(xmin, ymin, xmax, ymax).as("geometry"))
        .groupBy(col("grp"))
        .agg(st_area(st_union_all(col("geometry"))).as("area"))
        .orderBy(col("grp"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    coreOracleSql ++ GeoQueries.oracleSql ++ PipelineQueries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |     * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_u,
        | count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "geo_rect_area" ->
      """SELECT o_orderkey,
        | (1+(o_orderkey%13)/4.0) * (1+(o_orderkey%11)/4.0) AS area,
        | 2*((1+(o_orderkey%13)/4.0) + (1+(o_orderkey%11)/4.0)) AS perimeter
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_events_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS bucket, event_type,
        | count(*) AS n, min(value) AS vmin, max(value) AS vmax,
        | CAST(sum(user_id) AS BIGINT) AS uid_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "geo_union_area" ->
      """SELECT o_orderkey%16 AS grp,
        | sum((1+(o_orderkey%13)/4.0) * (1+(o_orderkey%11)/4.0)) AS area
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
