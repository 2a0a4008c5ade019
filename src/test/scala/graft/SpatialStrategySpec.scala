package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** SpatialJoinStrategy: `df.join(df2, st_pred(...))` auto-plans as the
  * STRtree exec node, with results identical to Spark's default plan. */
class SpatialStrategySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rects = {
    import spark.implicits._
    (1 to 200).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 5.0, lit(5.0)).as("geometry"))
  }
  private def points = {
    import spark.implicits._
    (1 to 200).toDF("p")
      .select(col("p"), st_point(col("p") * 10.0 + 2.0, lit(2.0)).as("pgeom"))
  }

  test("join with st_contains plans as SpatialJoinExec and matches brute force") {
    import spark.implicits._
    val l = rects
    val r = points
    val joined = l.join(r, st_contains(col("geometry"), col("pgeom")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"strategy did not fire:\n$plan")
    val got = joined.select("k", "p").as[(Int, Int)].collect().toSet
    // brute force via cross join (default planner path — no named UDF match)
    val brute = l.crossJoin(r)
      .filter(st_contains(col("geometry"), col("pgeom")))
      .select("k", "p").as[(Int, Int)].collect().toSet
    assert(got === brute)
    assert(got === (1 to 200).map(i => (i, i)).toSet)
  }

  test("asymmetric predicate written right-side first still plans and matches") {
    import spark.implicits._
    // pred(rightGeom, leftGeom): within(point, rect)
    val joined = rects.join(points, st_within(col("pgeom"), col("geometry")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"strategy did not fire:\n$plan")
    val got = joined.select("k", "p").as[(Int, Int)].collect().toSet
    assert(got === (1 to 200).map(i => (i, i)).toSet)
  }

  test("extra conjuncts split by the optimizer; spatial join still plans") {
    // PushDownPredicates pushes the k-filter below the join, so the join
    // condition reduces to the bare spatial predicate and the strategy fires
    val joined = rects.join(points,
      st_contains(col("geometry"), col("pgeom")) && col("k") % 2 === 0, "inner")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"expected spatial plan:\n$plan")
    assert(joined.count() === 100)
  }

  test("large×large falls to the quadtree exec, not nested loop") {
    import spark.implicits._
    // force the broadcast threshold off so neither side "fits"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = rects.join(points, st_contains(col("geometry"), col("pgeom")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SpatialJoinQuadtree"), s"expected quadtree plan:\n$plan")
      val got = joined.select("k", "p").as[(Int, Int)].collect().toSet
      assert(got === (1 to 200).map(i => (i, i)).toSet)
      // crossed arg order too
      val crossed = rects.join(points, st_within(col("pgeom"), col("geometry")))
      assert(crossed.queryExecution.executedPlan.toString.contains("SpatialJoinQuadtree"))
      assert(crossed.select("k", "p").as[(Int, Int)].collect().toSet ===
        (1 to 200).map(i => (i, i)).toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def pointsTo(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("p")
      .select(col("p"), st_point(col("p") * 10.0 + 2.0, lit(2.0)).as("pgeom"))
  }

  test("left outer join plans as SpatialJoinExec and keeps unmatched left rows") {
    import spark.implicits._
    // points only up to 150 → rects 151..200 have no match
    val joined = rects.join(pointsTo(150),
      st_contains(col("geometry"), col("pgeom")), "left")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"strategy did not fire for left join:\n$plan")
    val got = joined.select(col("k"), col("p")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    val expect = (1 to 150).map(i => (i, Some(i))).toSet ++
      (151 to 200).map(i => (i, None)).toSet
    assert(got === expect)
  }

  test("right outer join plans as SpatialJoinExec and keeps unmatched right rows") {
    // points 151..250 fall beyond the last rect → unmatched right rows
    val joined = rects.join(pointsTo(250),
      st_contains(col("geometry"), col("pgeom")), "right")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"strategy did not fire for right join:\n$plan")
    val got = joined.select(col("k"), col("p")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getInt(1))).toSet
    val expect = (1 to 200).map(i => (Some(i), i)).toSet ++
      (201 to 250).map(i => (None, i)).toSet
    assert(got === expect)
  }

  test("outer join with the outer side on the build side declines to Spark's planner") {
    // a LEFT join can only stream the left side; with broadcasting disabled
    // nothing fits, the strategy declines, and Spark's BNLJ keeps semantics
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = rects.join(pointsTo(150),
        st_contains(col("geometry"), col("pgeom")), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("SpatialJoin "), s"strategy must decline:\n$plan")
      assert(joined.count() === 200) // every rect row kept
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("full outer join plans as SpatialJoinExec and keeps both unmatched sides") {
    // rects 1..100 vs points 1..250: points 101..250 are unmatched on the
    // BUILD side (right is broadcast) — exercises the matched-bitset pass
    val joined = rects.filter(col("k") <= 100).join(pointsTo(250),
      st_contains(col("geometry"), col("pgeom")), "full")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialJoin "), s"strategy did not fire for full join:\n$plan")
    val got = joined.select(col("k"), col("p")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    val expect = (1 to 100).map(i => (Some(i), Some(i))).toSet ++
      (101 to 250).map(i => (None: Option[Int], Some(i))).toSet
    assert(got === expect)

    // and the mirror: unmatched BUILD-side rows survive too
    val joined2 = rects.join(pointsTo(150),
      st_contains(col("geometry"), col("pgeom")), "full")
    assert(joined2.queryExecution.executedPlan.toString.contains("SpatialJoin "))
    val got2 = joined2.select(col("k"), col("p")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    val expect2 = (1 to 150).map(i => (Some(i), Some(i))).toSet ++
      (151 to 200).map(i => (Some(i), None: Option[Int])).toSet
    assert(got2 === expect2)

    // cross-check against Spark's own full-outer BNLJ with the strategy off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bnlj = rects.join(pointsTo(150),
        st_contains(col("geometry"), col("pgeom")), "full")
      assert(!bnlj.queryExecution.executedPlan.toString.contains("SpatialJoin "))
      val got3 = bnlj.select(col("k"), col("p")).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
          if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
      assert(got3 === got2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plain join between two bucketed stores auto-plans exchange-free") {
    // VERDICT r8 #1: df.join(st_contains) over two same-grid bucketed
    // store tables must get sjoinBucketed's plan — cell equi-join over
    // co-located buckets (ZERO exchanges) + reference-point refinement —
    // with sjoinBucketed's answer (one row per matching geometry pair).
    import spark.implicits._
    val sj = graft.join.SpatialJoin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      sj.dropBucketedTable(spark, "graft_auto_l")
      sj.dropBucketedTable(spark, "graft_auto_r")
      sj.writeSpatialBucketed(rects, "graft_auto_l", cellSize = 64.0, buckets = 8)
      sj.writeSpatialBucketed(points, "graft_auto_r", cellSize = 64.0, buckets = 8,
        geom = "pgeom")
      val joined = spark.table("graft_auto_l").join(spark.table("graft_auto_r"),
        st_contains(col("geometry"), col("pgeom")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"auto-planned bucketed join shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected an equi-join over buckets:\n$plan")
      assert(!plan.contains("SpatialJoin "),
        s"broadcast tier fired instead of the bucketed rewrite:\n$plan")
      val got = joined.select("k", "p").as[(Int, Int)].collect().toSet
      assert(got === (1 to 200).map(i => (i, i)).toSet)
      // crossed operand order flips to the converse and still auto-plans
      val crossed = spark.table("graft_auto_l").join(spark.table("graft_auto_r"),
        st_within(col("pgeom"), col("geometry")))
      assert(!crossed.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(crossed.select("k", "p").as[(Int, Int)].collect().toSet === got)
      // mismatched grids must NOT rewrite (the cell columns mean different
      // things); the plain spatial tiers take over and the answer is the same
      sj.dropBucketedTable(spark, "graft_auto_r2")
      sj.writeSpatialBucketed(points, "graft_auto_r2", cellSize = 32.0, buckets = 8,
        geom = "pgeom")
      val mixed = spark.table("graft_auto_l").join(spark.table("graft_auto_r2"),
        st_contains(col("geometry"), col("pgeom")))
      val mixedPlan = mixed.queryExecution.executedPlan.toString
      assert(mixedPlan.contains("SpatialJoin") || mixedPlan.contains("Exchange"),
        s"mismatched grids should not take the bucketed rewrite:\n$mixedPlan")
      assert(mixed.select("k", "p").as[(Int, Int)].collect().toSet === got)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      sj.dropBucketedTable(spark, "graft_auto_l")
      sj.dropBucketedTable(spark, "graft_auto_r")
      sj.dropBucketedTable(spark, "graft_auto_r2")
    }
  }

  test("bucketed rewrite declines unless operands ARE the stamped geometry columns") {
    // review r9: the store's cells were exploded from its STAMPED
    // geometry column — a join over a second geometry column or a derived
    // expression must not take the cell equi-join (pairs not sharing a
    // primary-geometry cell would silently vanish). It falls back to the
    // ordinary spatial tiers, whose answer on the exploded store rows is
    // still set-correct.
    import spark.implicits._
    val sj = graft.join.SpatialJoin
    try {
      sj.dropBucketedTable(spark, "graft_decl_l")
      sj.dropBucketedTable(spark, "graft_decl_r")
      // second geometry column g2 sits 1000 units away from `geometry`
      val l2 = rects.withColumn("g2",
        st_point(col("k") * 10.0 + 1000.0, lit(2.0)))
      sj.writeSpatialBucketed(l2, "graft_decl_l", cellSize = 64.0, buckets = 4)
      sj.writeSpatialBucketed(
        points.withColumn("pg2", st_rectangle(col("p") * 10.0 + 998.0, lit(0.0),
          col("p") * 10.0 + 1003.0, lit(5.0))),
        "graft_decl_r", cellSize = 64.0, buckets = 4, geom = "pgeom")
      // join over the NON-stamped columns: g2 (points) within pg2 (rects)
      val j = spark.table("graft_decl_l").join(spark.table("graft_decl_r"),
        st_within(col("g2"), col("pg2")))
      val got = j.select("k", "p").as[(Int, Int)].collect().toSet
      assert(got === (1 to 200).map(i => (i, i)).toSet,
        "fallback answer wrong for the non-stamped geometry join")
      // and a derived expression over the stamped column also declines —
      // detectable because the result still matches (the bucketed rewrite
      // would drop cross-cell pairs of the buffered envelopes)
      // buffered rect k = [10k-3, 10k+8]×[-3, 8] contains point p =
      // (10p+2, 2) iff p == k
      val jb = spark.table("graft_decl_l").join(spark.table("graft_decl_r"),
        st_contains(st_buffer(col("geometry"), lit(3.0)), col("pgeom")))
      assert(jb.select("k", "p").as[(Int, Int)].collect().toSet
        === (1 to 200).map(i => (i, i)).toSet)
    } finally {
      sj.dropBucketedTable(spark, "graft_decl_l")
      sj.dropBucketedTable(spark, "graft_decl_r")
    }
  }

  test("writeSpatialBucketed stamps properties for db-qualified table names") {
    // review r9: ALTER TABLE `db.tbl` parsed the backticked whole string
    // as one dotted identifier and threw after the write; parts are now
    // quoted separately
    val sj = graft.join.SpatialJoin
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_qdb")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_qdb.qstore")
      sj.writeSpatialBucketed(rects, "graft_qdb.qstore", cellSize = 64.0, buckets = 4)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("qstore", Some("graft_qdb")))
      assert(meta.properties.get(sj.CellSizeProp).contains("64.0"),
        meta.properties.toString)
      // review r9 round 2: the geo footer stamp must also survive the
      // qualified name (TableIdentifier(raw) mis-parsed db.tbl before)
      val geo = graft.io.ParquetFooter.readKeyValueMetadata(spark,
        meta.location.toString, "geo")
      assert(geo.isDefined && geo.get.contains("\"primary_column\":\"geometry\""),
        s"geo footer missing on qualified store: $geo")
      // append with a DIFFERENT grid must refuse before writing anything
      val ex = intercept[IllegalArgumentException] {
        sj.writeSpatialBucketed(rects, "graft_qdb.qstore", cellSize = 32.0,
          buckets = 4, mode = "append")
      }
      assert(ex.getMessage.contains("cellSize"), ex.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_qdb.qstore")
      spark.sql("DROP DATABASE IF EXISTS graft_qdb")
    }
  }
}
