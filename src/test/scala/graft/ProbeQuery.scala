package graft

import org.apache.spark.sql.SparkSession

/** Manual probe: run one named SparkEntry query against a sf dir and show
  * the head — `Test/runMain graft.ProbeQuery <name> [sfDir] [nRows]`. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeQuery <queryName> [sfDir] [nRows]")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 5
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.show(n, false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
