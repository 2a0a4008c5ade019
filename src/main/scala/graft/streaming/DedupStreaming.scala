package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.pipeline.{Dedup, TextAnalysis}

/** Streaming MinHash near-duplicate detection — the streaming tier of
  * [[graft.pipeline.Dedup.nearDupMinhash]] (the reference has no streaming
  * engine; this is the Spark-native extension the LLM-pipeline brief asks
  * for: near-dup hits as documents ARRIVE, without re-running the batch
  * pipeline per increment).
  *
  * Design: the batch tier's exact signature/banding math ([[graft.plans
  * .MinHashSig]] via [[Dedup.minhashSigNative]], same band/bucket hash)
  * feeds `flatMapGroupsWithState` keyed by (band, bucket). Each bucket's
  * state holds the (id, signature, shingle-set) of the documents seen so
  * far (capped, mirroring [[Dedup.capBuckets]]'s join-bomb guard); a new
  * arrival pairs against the stored members, verifies exact shingle
  * Jaccard ≥ threshold, and appends itself. So each verified pair is
  * emitted in the micro-batch where its SECOND member arrives — the
  * incremental analog of the batch bucket self-join.
  *
  * Semantics vs batch, on the same (drained) input:
  * - Same pairs, same `jaccard_est` / `jaccard` values (same signature,
  *   banding, and shingle math) for buckets within the cap.
  * - A pair colliding in several bands is emitted once PER colliding band
  *   (bands have independent state; the batch tier dedups candidates
  *   globally before verifying). Callers needing exactly-once pairs
  *   dedup on (id_a, id_b) downstream — chaining a stateful
  *   dropDuplicates after flatMapGroupsWithState inside this query is
  *   not supported by Spark.
  * - Bucket cap: the batch tier drops over-cap buckets wholesale; a
  *   stream cannot retract, so a bucket that REACHES the cap stops
  *   admitting members (pairs already emitted stand, nothing further is
  *   emitted from that bucket).
  *
  * State size: ≤ cap members × (numHashes + shingles) longs per hot
  * bucket; normal buckets hold a handful of docs. For unbounded streams
  * pair this with an upstream watermark + window repartitioning of the id
  * space, or periodically restart from a batch-deduped checkpoint.
  */
object DedupStreaming {

  final case class MinhashBucketRow(band: Int, bucket: Int, id: Long,
      sig: Seq[Long], sh: Seq[Long])
  final case class MinhashMember(id: Long, sig: Seq[Long], sh: Seq[Long])
  final case class MinhashBucketState(members: List[MinhashMember], saturated: Boolean)
  final case class NearDupHit(id_a: Long, id_b: Long, jaccard_est: Double, jaccard: Double)

  final case class SimhashBucketRow(chunk: Int, bucket: Long, id: Long, sim: Long)
  final case class SimhashBucketState(members: List[(Long, Long)], saturated: Boolean)
  final case class SimhashHit(id_a: Long, id_b: Long, hamming: Int)

  final case class EmbBucketRow(t: Int, sig: Long, id: Long, vec: Seq[Double])
  final case class EmbMember(id: Long, vec: Seq[Double])
  final case class EmbBucketState(members: List[EmbMember], saturated: Boolean)
  final case class EmbHit(id_a: Long, id_b: Long, cosine: Double)

  /** @param events streaming DataFrame with `idCol` (castable to long) and
    *               `textCol` (string)
    * @return append-mode stream of verified near-dup hits */
  def nearDupMinhashStream(events: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 0, shingleK: Int = 5,
      maxBucketSize: Int = 100000): Dataset[NearDupHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val b = if (bands > 0) bands else Dedup.autoBands(numHashes, threshold)
    require(numHashes % b == 0, "numHashes must be divisible by bands")
    val r = numHashes / b

    // identical projection chain to the batch tier: normalize (attribute,
    // so lambdas never re-run the regex), native one-pass signature,
    // hashed shingle set for the exact verify
    val base = events
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.normalized(col(textCol)).as("__norm"))
      .select(col("id"),
        Dedup.minhashSigNative(col("__norm"), shingleK, numHashes).as("sig"),
        Dedup.shingleHashesNorm(col("__norm"), shingleK).as("sh"))
    val banded = base.select(
      col("id"), col("sig"), col("sh"),
      explode(transform(sequence(lit(0), lit(b - 1)),
        bb => struct(bb.as("band"),
          hash(slice(col("sig"), bb * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("sig"), col("sh"))
      .as[MinhashBucketRow]

    val nh = numHashes
    val th = threshold
    val cap = maxBucketSize
    banded.groupByKey(row => (row.band, row.bucket))
      .flatMapGroupsWithState[MinhashBucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          var st = state.getOption.getOrElse(MinhashBucketState(Nil, saturated = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          // id-sorted within the micro-batch: emission order (and which
          // member is "already present" for within-batch pairs) is
          // deterministic under source repartitioning
          rows.toSeq.sortBy(_.id).foreach { row =>
            if (!st.saturated) {
              if (st.members.lengthCompare(cap) >= 0) {
                st = st.copy(saturated = true)
              } else {
                st.members.foreach { m =>
                  if (m.id != row.id) {
                    var eq = 0
                    var i = 0
                    while (i < nh) { if (m.sig(i) == row.sig(i)) eq += 1; i += 1 }
                    val sa = m.sh.toSet
                    val sb = row.sh.toSet
                    val uni = sa.union(sb).size
                    val jac = if (uni > 0) sa.intersect(sb).size.toDouble / uni else 0.0
                    if (jac >= th)
                      out += NearDupHit(math.min(m.id, row.id), math.max(m.id, row.id),
                        eq.toDouble / nh, jac)
                  }
                }
                st = st.copy(members = MinhashMember(row.id, row.sig, row.sh) :: st.members)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming SimHash near-dup: the streaming tier of
    * [[Dedup.nearDupSimhash]]. Bucket keys are the four 16-bit chunks of
    * the 64-bit SimHash (pigeonhole: hamming ≤ 3 pairs agree on ≥ 1
    * chunk); state per (chunk, bucket) holds (id, simhash); a new arrival
    * verifies `bitCount(xor) ≤ maxHamming` against stored members. Same
    * at-least-once-per-colliding-chunk and cap semantics as
    * [[nearDupMinhashStream]]. */
  def nearDupSimhashStream(events: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 100000): Dataset[SimhashHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val banded = events
      .select(col(idCol).cast("long").as("id"),
        Dedup.simhash64(col(textCol)).as("sim"))
      .select(col("id"), col("sim"), explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("bucket", expr("(sim >> (chunk * 16)) & 65535"))
      .select(col("chunk"), col("bucket"), col("id"), col("sim"))
      .as[SimhashBucketRow]
    val mh = maxHamming
    val cap = maxBucketSize
    banded.groupByKey(r => (r.chunk, r.bucket))
      .flatMapGroupsWithState[SimhashBucketState, SimhashHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          var st = state.getOption.getOrElse(SimhashBucketState(Nil, saturated = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[SimhashHit]
          rows.toSeq.sortBy(_.id).foreach { row =>
            if (!st.saturated) {
              if (st.members.lengthCompare(cap) >= 0) st = st.copy(saturated = true)
              else {
                st.members.foreach { case (mid, msim) =>
                  if (mid != row.id) {
                    val d = java.lang.Long.bitCount(msim ^ row.sim)
                    if (d <= mh)
                      out += SimhashHit(math.min(mid, row.id), math.max(mid, row.id), d)
                  }
                }
                st = st.copy(members = (row.id, row.sim) :: st.members)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming embedding-cosine near-dup: the streaming tier of
    * [[Dedup.nearDupEmbedding]]. OR-amplified sign-LSH bucket keys
    * ((table, signature), same planes as batch via
    * [[graft.pipeline.Similarity.signSignatureSeeded]]); state holds the
    * (id, vector) members; a new arrival verifies exact cosine ≥
    * threshold against stored members. At-least-once per colliding
    * table; cap semantics as [[nearDupMinhashStream]]. */
  def nearDupEmbeddingStream(events: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 12, tables: Int = 4,
      maxBucketSize: Int = 100000): Dataset[EmbHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sigCols = (0 until tables).map(t =>
      struct(lit(t).as("t"),
        graft.pipeline.Similarity.signSignatureSeeded(bits, t)(col("vec")).as("sig")))
    val banded = events
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .select(col("id"), col("vec"), explode(array(sigCols: _*)).as("ts"))
      .select(col("ts.t").as("t"), col("ts.sig").as("sig"), col("id"), col("vec"))
      .as[EmbBucketRow]
    val th = threshold
    val cap = maxBucketSize
    banded.groupByKey(r => (r.t, r.sig))
      .flatMapGroupsWithState[EmbBucketState, EmbHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          var st = state.getOption.getOrElse(EmbBucketState(Nil, saturated = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[EmbHit]
          def dot(a: Seq[Double], b: Seq[Double]): Double = {
            var s = 0.0; var i = 0
            val n = math.min(a.length, b.length)
            while (i < n) { s += a(i) * b(i); i += 1 }
            s
          }
          rows.toSeq.sortBy(_.id).foreach { row =>
            if (!st.saturated) {
              if (st.members.lengthCompare(cap) >= 0) st = st.copy(saturated = true)
              else {
                st.members.foreach { m =>
                  if (m.id != row.id) {
                    val c = dot(m.vec, row.vec) /
                      (math.sqrt(dot(m.vec, m.vec)) * math.sqrt(dot(row.vec, row.vec)))
                    if (c >= th)
                      out += EmbHit(math.min(m.id, row.id), math.max(m.id, row.id), c)
                  }
                }
                st = st.copy(members = EmbMember(row.id, row.vec) :: st.members)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
