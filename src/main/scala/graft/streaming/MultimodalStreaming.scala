package graft.streaming

import graft.pipeline.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the spectral audio plane
  * ([[graft.pipeline.Multimodal.audioSpectral]]) — the audio analog of the
  * streaming dedup tiers: one declarative code path that runs identically
  * over a batch DataFrame and a `readStream` source, so batch ≡ stream is
  * checkable in-query (pinned by the `pipe_stream_audio` oracle row).
  *
  * Scale shape: the spectral UDF is per-row scan compute (no shuffle); the
  * windowed aggregation is a standard watermarked tumbling-window state,
  * bounded by the watermark delay — late rows beyond the delay are
  * dropped, closed windows are emitted once in append mode.
  */
object MultimodalStreaming {

  /** Tumbling-window spectral aggregation over WAV bytes in `wavCol`:
    * per `windowDur` window of `eventTimeCol`, the number of rows, the
    * sum of dominant frequencies (exact for bin-aligned fixtures — a sum
    * of exact doubles, unlike an average) and the max spectral centroid.
    * On a streaming input the event-time column is watermarked with
    * `watermarkDelay` (append-mode emission of closed windows only); on a
    * batch input the SAME plan runs without watermark — the batch≡stream
    * contract. Rows with null/undecodable WAV bytes count toward `n`
    * but contribute nothing to the spectral aggregates (null-skipping
    * SQL aggregate semantics). */
  def spectralWindowed(df: DataFrame, wavCol: String, eventTimeCol: String,
      windowDur: String, frameSize: Int = 1024,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val in = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    in.withColumn("__sp", Multimodal.audioSpectral(frameSize)(col(wavCol)))
      .groupBy(window(col(eventTimeCol), windowDur))
      .agg(count(lit(1)).as("n"),
        sum(col("__sp.dominantHz")).as("sum_dominant_hz"),
        max(col("__sp.centroidHz")).as("max_centroid_hz"))
      .select(col("window.start").as("win_start"), col("n"),
        col("sum_dominant_hz"), col("max_centroid_hz"))
  }
}
