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

  /** Executor-local cache of the prepared static tree: one build per
    * broadcast per executor (not per task per micro-batch — a 1-second
    * trigger would otherwise re-parse and re-prepare the whole static
    * side continuously). */
  private val streamTreeCache =
    new graft.join.BroadcastCache[org.locationtech.jts.index.strtree.STRtree]()

  /** The converse relation, for evaluating stream.pred(static) through
    * the PREPARED static geometry: a.within(b) ⟺ b.contains(a), etc.
    * Symmetric predicates map to themselves. */
  private val conversePred = Map(
    "within" -> "contains", "contains" -> "within",
    "covers" -> "covered_by", "covered_by" -> "covers")

  /** Spatial join of a *stream* against a *static* geometry table: the
    * static side is collected and broadcast once (row- AND byte-guarded
    * like the batch tier), each micro-batch probes the per-EXECUTOR
    * prepared STRtree (cached per broadcast — not rebuilt per
    * micro-batch). Output = stream columns + matched static columns
    * (inner semantics; unmatched stream rows drop). This is the
    * points-into-zones enrichment shape (events × geofences) that a
    * streaming pipeline needs and the batch `sjoin` cannot provide
    * (it counts/collects the left side, which is illegal on a stream).
    *
    * Predicate direction matches the batch tier's ARGUMENT ORDER:
    * `sjoinStream(events, zones, "within")` keeps events WITHIN zones —
    * the same pairs `sjoin(events, zones, "within")` returns. Internally
    * the prepared static side evaluates the converse relation
    * (a.within(b) ⟺ b.contains(a)); `contains_properly`, which has no
    * converse in the predicate set, is evaluated plain per pair. */
  def sjoinStream(stream: DataFrame, static: DataFrame,
      predicate: String = "intersects",
      streamGeom: String = "geometry", staticGeom: String = "geometry",
      suffix: String = "_static",
      maxBuildRows: Long = graft.join.SpatialJoin.MaxBroadcastRows,
      maxBuildBytes: Long = graft.join.SpatialJoin.MaxBroadcastBytes): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.types.StructType
    import graft.serde.EWKB
    import org.locationtech.jts.geom.prep.PreparedGeometryFactory
    import org.locationtech.jts.index.strtree.STRtree
    import scala.jdk.CollectionConverters._

    val renamed = graft.join.SpatialJoin.renameClashes(
      static, stream.columns.toSeq, suffix)
    val sgName = if (stream.columns.contains(staticGeom)) staticGeom + suffix else staticGeom
    val sgPos = renamed.columns.indexOf(sgName)
    require(sgPos >= 0, s"no column $staticGeom in static frame")
    // row AND byte guards via the shared bounded collect (stats-guided:
    // a wide-row static side aborts the stream through toLocalIterator
    // BEFORE the driver materializes it, not after)
    val staticRows = graft.join.SpatialJoin.collectBounded(
      renamed, maxBuildRows, maxBuildBytes).getOrElse(
      throw new IllegalArgumentException(
        s"sjoinStream: static side exceeds the broadcast guards " +
          s"($maxBuildRows rows / $maxBuildBytes bytes). For a big static " +
          "side, take the scale path instead: lay it out once with " +
          "SpatialJoin.writeSpatialBucketed and join each micro-batch " +
          "with sjoinBucketed (exchange-free stream-static equi-join on " +
          "the grid cell), or pre-filter the static frame (bbox/column " +
          "predicates) under the guard"))
    val bc = stream.sparkSession.sparkContext.broadcast(staticRows.map { r =>
      (r.get(sgPos).asInstanceOf[Array[Byte]], r)
    })
    val gPos = stream.columns.indexOf(streamGeom)
    require(gPos >= 0, s"no column $streamGeom in stream frame")
    val pred = predicate
    val prepPred = conversePred.getOrElse(pred, pred)

    val outSchema = StructType(stream.schema.fields ++ renamed.schema.fields)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    stream.mapPartitions { it =>
      val tree = streamTreeCache.getOrBuild(bc) {
        val t = new STRtree()
        bc.value.foreach { case (bytes, row) =>
          if (bytes != null) {
            val g = EWKB.read(bytes)
            if (!g.isEmpty)
              t.insert(g.getEnvelopeInternal, (PreparedGeometryFactory.prepare(g), row))
          }
        }
        t.build()
        t
      }
      it.flatMap { row =>
        val bytes = row.get(gPos).asInstanceOf[Array[Byte]]
        if (bytes == null) Iterator.empty
        else {
          val g = EWKB.read(bytes)
          if (g.isEmpty) Iterator.empty
          else {
            val base = row.toSeq // once per stream row, not once per match
            tree.query(g.getEnvelopeInternal).asScala.iterator
              .map(_.asInstanceOf[(org.locationtech.jts.geom.prep.PreparedGeometry, Row)])
              .filter { case (prep, _) =>
                // stream.pred(static), via the prepared converse when one
                // exists; contains_properly evaluates plain
                if (pred == "contains_properly")
                  graft.join.SpatialJoin.applyPredPlain(pred, g, prep.getGeometry)
                else graft.join.SpatialJoin.applyPred(prepPred, prep, g)
              }
              .map { case (_, srow) => Row.fromSeq(base ++ srow.toSeq) }
          }
        }
      }
    }(enc)
  }

  /** Executor-local cache of the stream-nearest tier's plain-geometry
    * tree: items are (index-into-broadcast, Geometry), so
    * [[graft.join.SpatialJoin.nearestOf]]'s branch-and-bound kNN runs
    * unchanged and matches map back to full static rows by index. */
  private val nearestTreeCache =
    new graft.join.BroadcastCache[org.locationtech.jts.index.strtree.STRtree]()

  /** Stream-static k-NEAREST enrichment — [[sjoinStream]]'s distance
    * sibling and [[graft.join.SpatialJoin.sjoinNearest]]'s streaming
    * twin: each stream row takes its ties-inclusive k nearest static
    * geometries (`rank() <= k` — every static row at the kth distance
    * kept), STATELESS (a probe's whole answer comes from the broadcast
    * static tree, so append mode needs no state store, no watermark, and
    * batch ≡ stream row-for-row).
    *
    * The static side lives under the same broadcast guards as
    * [[sjoinStream]]; past them the scale path is
    * [[sjoinNearestStoreStream]] — `foreachBatch` +
    * [[graft.join.SpatialJoin.sjoinNearestBucketed]] over a
    * `writeSpatialBucketed` store (the exchange-free per-batch join),
    * which also carries maxDistance = ∞ through the store's unbounded
    * door. `maxDistance` may be infinite here too — the broadcast tree
    * bounds the search, exactly like the batch broadcast tier.
    *
    * @param how "inner" drops unmatched stream rows; "left" keeps them
    *        with null static columns (static-side outer over a stream is
    *        unbounded and not offered). */
  def sjoinNearestStream(stream: DataFrame, static: DataFrame, k: Int = 1,
      maxDistance: Double = Double.PositiveInfinity, how: String = "inner",
      streamGeom: String = "geometry", staticGeom: String = "geometry",
      suffix: String = "_static", distanceCol: Option[String] = None,
      exclusive: Boolean = false,
      maxBuildRows: Long = graft.join.SpatialJoin.MaxBroadcastRows,
      maxBuildBytes: Long = graft.join.SpatialJoin.MaxBroadcastBytes): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.types.{StructField, StructType, DoubleType}
    import graft.serde.EWKB
    import org.locationtech.jts.index.strtree.STRtree

    require(k >= 1, s"sjoinNearestStream: k must be >= 1, got $k")
    require(!maxDistance.isNaN && maxDistance > 0,
      s"sjoinNearestStream: maxDistance must be positive, got $maxDistance")
    require(Set("inner", "left")(how),
      s"unsupported how: $how (sjoinNearestStream supports inner and left)")
    val renamed = graft.join.SpatialJoin.renameClashes(
      static, stream.columns.toSeq, suffix)
    val sgName = if (stream.columns.contains(staticGeom)) staticGeom + suffix else staticGeom
    val sgPos = renamed.columns.indexOf(sgName)
    require(sgPos >= 0, s"no column $staticGeom in static frame")
    val gPos = stream.columns.indexOf(streamGeom)
    require(gPos >= 0, s"no column $streamGeom in stream frame")
    distanceCol.foreach { n =>
      require(!(stream.columns.toSet ++ renamed.columns).contains(n),
        s"sjoinNearestStream: distanceCol '$n' clashes with an output column")
    }
    // same shared bounded collect as sjoinStream (wide rows abort
    // through toLocalIterator before the driver materializes them)
    val staticRows = graft.join.SpatialJoin.collectBounded(
      renamed, maxBuildRows, maxBuildBytes).getOrElse(
      throw new IllegalArgumentException(
        s"sjoinNearestStream: static side exceeds the broadcast guards " +
          s"($maxBuildRows rows / $maxBuildBytes bytes). For a big static " +
          "side, take the scale path instead: lay it out once with " +
          "SpatialJoin.writeSpatialBucketed (+ stampCellSummary) and join " +
          "each micro-batch via GeoStreaming.sjoinNearestStoreStream — " +
          "the exchange-free per-batch nearest join, unbounded " +
          "maxDistance included — or pre-filter the static frame under " +
          "the guard"))
    val bc = stream.sparkSession.sparkContext.broadcast(staticRows.map { r =>
      (r.get(sgPos).asInstanceOf[Array[Byte]], r)
    })
    val kk = k; val maxD = maxDistance; val excl = exclusive
    val keepUnmatched = how == "left"
    val nullableStatic = renamed.schema.fields.map(f =>
      if (keepUnmatched) f.copy(nullable = true) else f)
    val outSchema = StructType(stream.schema.fields ++ nullableStatic ++
      distanceCol.map(n => StructField(n, DoubleType, nullable = true)).toSeq)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val emitD = distanceCol.isDefined
    val nStaticCols = renamed.columns.length
    stream.mapPartitions { it =>
      // bc.value hoisted out of the per-match loop: TorrentBroadcast's
      // value() is a block-manager lookup, not a field read
      val staticData = bc.value
      val tree = nearestTreeCache.getOrBuild(bc) {
        val t = new STRtree()
        staticData.zipWithIndex.foreach { case ((bytes, _), i) =>
          if (bytes != null) {
            val g = EWKB.read(bytes)
            if (!g.isEmpty) t.insert(g.getEnvelopeInternal, (i.toLong, g))
          }
        }
        t.build()
        t
      }
      val n = tree.size()
      val nullTail: Seq[Any] =
        Seq.fill[Any](nStaticCols)(null) ++ (if (emitD) Seq[Any](null) else Nil)
      it.flatMap { row =>
        val bytes = row.get(gPos).asInstanceOf[Array[Byte]]
        val matches =
          if (bytes == null) Array.empty[(Long, Double, org.locationtech.jts.geom.Geometry)]
          else {
            val g = EWKB.read(bytes)
            if (g.isEmpty) Array.empty[(Long, Double, org.locationtech.jts.geom.Geometry)]
            else graft.join.SpatialJoin.nearestOf(tree, n, g, kk, maxD, excl)
          }
        if (matches.isEmpty) {
          if (keepUnmatched) Iterator.single(Row.fromSeq(row.toSeq ++ nullTail))
          else Iterator.empty
        } else {
          val base = row.toSeq // once per stream row, not once per match
          matches.iterator.map { case (idx, d, _) =>
            Row.fromSeq(base ++ staticData(idx.toInt)._2.toSeq ++
              (if (emitD) Seq[Any](d) else Nil))
          }
        }
      }
    }(enc)
  }

  /** Stream-vs-STORE k-nearest — the scale path [[sjoinNearestStream]]'s
    * broadcast guard points at, packaged: each micro-batch joins against
    * a [[graft.join.SpatialJoin.writeSpatialBucketed]] store via
    * [[graft.join.SpatialJoin.sjoinNearestBucketed]] (exchange-free on
    * the store side), so the static side may be arbitrarily large AND
    * `maxDistance` may be omitted entirely — the default ∞ rides the
    * store's unbounded door (per-probe bounds from the stamped
    * cell-summary sidecar; run
    * [[graft.join.SpatialJoin.stampCellSummary]] after writing the store
    * so the per-batch joins skip the summary passes). Returns a
    * configured `DataStreamWriter`: the caller supplies the `sink`
    * consuming each joined micro-batch (write to a table, a file sink,
    * …), then sets trigger/checkpoint and `.start()`s. Semantics are the
    * batch door's, per micro-batch — ties-inclusive kNN, inner/left,
    * distanceCol, exclusive — so batch ≡ stream row-for-row over the
    * same input split any way into batches (the join is stateless: a
    * probe's whole answer comes from the store). */
  def sjoinNearestStoreStream(stream: DataFrame, buildTable: String,
      cellSize: Double, k: Int = 1,
      maxDistance: Double = Double.PositiveInfinity, how: String = "inner",
      streamGeom: String = "geometry", buildGeom: String = "geometry",
      suffix: String = "_right", distanceCol: Option[String] = None,
      exclusive: Boolean = false)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.join.SpatialJoin.sjoinNearestBucketed(
        batch.sparkSession, batch, buildTable, cellSize = cellSize, k = k,
        maxDistance = maxDistance, how = how, probeGeom = streamGeom,
        buildGeom = buildGeom, suffix = suffix, distanceCol = distanceCol,
        exclusive = exclusive), batchId)
    }

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
                  // late events must never REWIND the session: last only
                  // moves forward, start only backward (events are sorted
                  // within a micro-batch, not across batches)
                  cur = Some(s.copy(start = math.min(s.start, e.tsMillis),
                    last = math.max(s.last, e.tsMillis), n = s.n + 1))
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
