package graft

import org.apache.spark.sql.SparkSession

/** Manual probe: run the pipe_stream_audio oracle query at sf0.001/sf0.01
  * and print the result frame (win_min, n_docs, sum_dominant_hz,
  * n_sym_diff — the last must be 0 in every row). */
object ProbeStreamAudio {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries("pipe_stream_audio")(spark, dir)
    df.show(20, false)
    spark.stop()
  }
}
