package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch driver: bisect the geo_agg_prec sf0.01 stall (round-6 session).
  * Variants isolate (a) the r4 3-column shape, (b) + registerAll,
  * (c) + the r5 SQL-path columns, (d) sa alone. */
object ProbePrec {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variant = if (args.nonEmpty) args(0) else "r4"

    val k = col("k")
    val xmin = (k % 1000000).cast("double") * 16.0
    val ymin = (k % 16).cast("double") * 16.0
    val w = lit(1.0) + (k % 13).cast("double") / 4.0
    val h = lit(1.0) + (k % 11).cast("double") / 4.0
    val ax = (k % 5).cast("double") / 16.0
    val ay = (k % 7).cast("double") / 16.0
    val g = st_rectangle(xmin, ymin, xmin + w + ax, ymin + h + ay)
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    println(s"== variant $variant rows=${base.count()}")

    def run(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.collect().foreach(r => println(r))
      println(f"== ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    variant match {
      case "r4" =>
        run(base.select((k % 16).as("grp"), g.as("g"))
          .groupBy(col("grp"))
          .agg(st_area(st_symmetric_difference_all(col("g"), 0.25)).as("sa"))
          .orderBy(col("grp")))
      case "reg" =>
        graft.Geo.registerAll(spark)
        run(base.select((k % 16).as("grp"), g.as("g"))
          .groupBy(col("grp"))
          .agg(st_area(st_symmetric_difference_all(col("g"), 0.25)).as("sa"))
          .orderBy(col("grp")))
      case "sa1" => // one group only, bounded row count
        run(base.filter(k % 16 === 0).limit(200)
          .select(lit(0).as("grp"), g.as("g"))
          .groupBy(col("grp"))
          .agg(st_area(st_symmetric_difference_all(col("g"), 0.25)).as("sa")))
      case "scale" => // scaling curve for the single-group fold
        for (n <- Seq(100, 200, 400, 800)) {
          val t0 = System.nanoTime()
          val r = base.filter(k % 16 === 0).limit(n)
            .select(lit(0).as("grp"), g.as("g"))
            .groupBy(col("grp"))
            .agg(st_area(st_symmetric_difference_all(col("g"), 0.25)).as("sa"))
            .collect()
          println(f"== n=$n sa=${r(0).getDouble(1)}%.2f t=${(System.nanoTime() - t0) / 1e9}%.1f s")
        }
      case "plain" => // no grid size
        run(base.select((k % 16).as("grp"), g.as("g"))
          .groupBy(col("grp"))
          .agg(st_area(st_symmetric_difference_all(col("g"))).as("sa"))
          .orderBy(col("grp")))
    }
    spark.stop()
  }
}
