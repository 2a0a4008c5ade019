package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch probe: why does the bucketed sjoin plan carry an Exchange in
  * the Verify-shaped session? */
object BktProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("bkt-probe")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Geo.registerAll(spark)
    import spark.implicits._
    val left = spark.range(200).select($"id".as("lk"),
      st_rectangle(($"id" % 20).cast("double") * 4.0, ($"id" % 10).cast("double") * 4.0,
        ($"id" % 20).cast("double") * 4.0 + lit(3.0),
        ($"id" % 10).cast("double") * 4.0 + lit(3.0)).as("geometry"))
    val right = spark.range(500).select($"id".as("rk"),
      st_point(($"id" % 83).cast("double"), ($"id" % 41).cast("double")).as("geometry"))
    Seq("bp_l", "bp_r")
      .foreach(graft.join.SpatialJoin.dropBucketedTable(spark, _))
    graft.join.SpatialJoin.writeSpatialBucketed(left, "bp_l", 16.0, 32)
    graft.join.SpatialJoin.writeSpatialBucketed(right, "bp_r", 16.0, 32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = graft.join.SpatialJoin.sjoinBucketed(spark, "bp_l", "bp_r", 16.0, "contains")
    println("=== plan ===")
    println(j.queryExecution.executedPlan.toString)
  }
}
