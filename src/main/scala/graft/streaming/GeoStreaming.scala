package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference has no streaming engine
  * (SURVEY.md §2.14) — this is the Spark-native extension the 100 TB
  * training-data pipeline needs: the same operators (geometry UDFs,
  * text stats, dedup fingerprints) run inside `readStream` → transform →
  * `writeStream` because they are ordinary Catalyst expressions/UDAFs.
  *
  * Everything here is shape, not new semantics: watermarked event-time
  * windows, streaming exact-dedup, and session windows via
  * `flatMapGroupsWithState` (the custom-state escape hatch).
  */
object GeoStreaming {

  /** Watermarked tumbling-window aggregation over an event stream:
    * (window, keyCol) → count + min/max of `valueCol`. Late rows beyond
    * `watermark` are dropped, so state is bounded. */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Windowed *spatial* aggregation: per (window, key), the union of the
    * row geometries — the geometry UDAFs work unchanged under streaming
    * because they are standard `Aggregator`s with partial merge. */
  def windowedUnion(events: DataFrame, tsCol: String, keyCol: String,
      geomCol: String, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(graft.functions.st_union_all(col(geomCol)).as("geometry"),
        count(lit(1)).as("n"))

  /** Streaming exact-dedup on a fingerprint column: `dropDuplicates`
    * scoped by watermark so the dedup state ages out (unbounded dedup
    * state is the classic streaming OOM). */
  def dedupStream(events: DataFrame, tsCol: String, fingerprint: Column,
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("__fp", fingerprint)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** One closed session per (user, gap): event-time sessionization with
    * `flatMapGroupsWithState` — the custom-state path the reference lacks
    * and Spark provides natively. Emits (user, start, end, n) when a
    * session closes via timeout. */
  case class SessionEvent(userId: Long, tsMillis: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(userId: Long, startMillis: Long, endMillis: Long, n: Long)

  /** @param idleTimeoutMillis > 0 → also close sessions after this much
    *   processing-time inactivity (production shape); 0 → close only on
    *   the event-time gap (deterministic, used by tests) */
  def sessionize(events: Dataset[SessionEvent], gapMillis: Long,
      idleTimeoutMillis: Long = 0): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMillis > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsMillis)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMillis - s.last <= gapMillis =>
                  cur = Some(s.copy(last = e.tsMillis, n = s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
                case None =>
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleTimeoutMillis > 0) state.setTimeoutDuration(idleTimeoutMillis)
            }
            closed.reverseIterator
          }
      }
  }
}
