package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The batch≡stream drain the oracle queries share: write a batch frame
  * to a temp parquet dir, stream it back as a file source, run the
  * caller's streaming transform, drain AvailableNow into an append-mode
  * memory sink, and return the sink's table — with the query STOPPED on
  * every path (a timed-out drain previously leaked the running query and
  * its file-source listing thread for the session) and the temp input
  * deleted once the drain has finished (the results live in the memory
  * sink). Five oracle rows (pipe_stream_minhash / simhash / embedding /
  * audio, geo_stream_sjoin) previously carried drifting copies of this
  * boilerplate. */
object StreamDrain {

  def availableNow(s: SparkSession, input: DataFrame, namePrefix: String,
      transform: DataFrame => DataFrame,
      timeoutMs: Long = 600000): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_" + namePrefix).toString
    input.write.mode("overwrite").parquet(tmp + "/in")
    val streamIn = s.readStream.schema(input.schema).parquet(tmp + "/in")
    val qn = namePrefix + "_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = transform(streamIn).writeStream.format("memory").queryName(qn)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try require(q.awaitTermination(timeoutMs), s"$namePrefix drain timed out")
    finally {
      if (q.isActive) q.stop()
      // results are materialized in the memory sink; the input copy can go
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    s.table(qn)
  }
}
