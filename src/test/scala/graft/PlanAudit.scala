package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Plan audit: print the physical plans of the bench queries and check the
  * properties that matter at 100 TB — whole-stage codegen coverage, scan
  * column pruning, broadcast vs shuffle joins, partial aggregation. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    for ((name, fn) <- Bench.benchQueries.toSeq.sortBy(_._1)) {
      println(s"\n================ $name ================")
      fn(spark, dir).explain("formatted")
    }

    // column pruning check: a 2-column projection over a wide table
    println("\n================ pruning check ================")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
      .explain("formatted")
    spark.stop()
  }
}
