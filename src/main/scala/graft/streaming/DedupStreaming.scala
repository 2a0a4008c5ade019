package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
  * - A pair colliding in several bands is emitted EXACTLY ONCE: all the
  *   colliding groups discover the pair in the same micro-batch (pairs
  *   are emitted at the newer member's arrival), and only the group
  *   owning the pair's CANONICAL band — the first band where the two
  *   signatures agree ([[canonicalBand]]) — emits it. Stateless and
  *   deterministic, so no second stateful operator is needed (Spark
  *   disallows one after flatMapGroupsWithState here).
  * - Bucket cap: the batch tier drops over-cap buckets wholesale; a
  *   stream cannot retract, so a bucket that REACHES the cap stops
  *   ADMITTING members — but keeps VERIFYING arrivals against its stored
  *   members and emitting the pairs it is canonical for (saturation
  *   liveness: a pair whose canonical band saturated AFTER admitting the
  *   older member is still emitted, exactly once, by the canonical
  *   group; the live non-canonical groups keep suppressing as usual).
  *   Refused arrivals are remembered as GHOSTS — full member records,
  *   not bare ids (r15, VERDICT r14 #3): the canonical group can then
  *   verify and emit a pair whose OLDER member was refused at its
  *   saturated bucket (the r14 irreducible corner — sibling bands hold
  *   the data but must keep suppressing, since the emitter choice has
  *   to stay a pure function of the two signatures; any state-dependent
  *   choice lets two isolated groups both elect themselves; what
  *   changed is that the canonical group now retains what it needs to
  *   do its job). The ghost list is bounded by the same cap and doubles
  *   as the at-least-once re-delivery guard; once the ghost budget is
  *   also spent the bucket is fully closed. The NARROWED residual,
  *   QUANTIFIED (r16, StreamingSpec "2xcap residual quantified"): a
  *   bucket epoch seeing n same-bucket arrivals emits exactly C(2·cap,
  *   2) of the batch tier's C(n, 2) pairs — every pair among the first
  *   2·cap arrivals survives (member-member, member-ghost, and
  *   ghost-ghost via the r15 rescue), and a pair is suppressed iff
  *   either member arrived past 2·cap. At the default cap a bucket
  *   epoch must see > 200,000 same-bucket arrivals before a single pair
  *   is lost; cross-group state is the only way past that, and Spark
  *   permits no second stateful operator here. State stays cap-bounded
  *   in entry count (≤ 2×cap member-sized records).
  *
  * == Checkpoint compatibility ==
  *
  * The flatMapGroupsWithState state encoders are the case classes below;
  * changing their layout breaks restores from checkpoints written by
  * older builds. Three such breaks exist: [[EmbMember]] gained `sigs`
  * (canonical-table rule), all three `*BucketState`s gained `ghosts`
  * (saturation liveness), and r15 widened `ghosts` from bare ids to
  * full member records (saturated-canonical rescue). Restarting an old
  * stream on this build
  * requires a NEW checkpoint directory (drain with the old build first
  * for a seamless handoff); state compatibility across builds is NOT a
  * contract this module keeps.
  *
  * == Bounded state: event-time TTL ==
  *
  * With the default `ttlMs = 0` state grows until the bucket cap — fine
  * for drains and bounded runs, unbounded on a 100 TB stream. Passing
  * `eventTimeCol` + `ttlMs` (and a `watermarkDelay`) turns on
  * watermark-driven eviction:
  * - each stored member carries its event time; members whose time has
  *   fallen more than `ttlMs` behind the watermark are evicted before
  *   pairing, so state per (band,bucket) is bounded by the window's
  *   arrival rate, not the stream's lifetime;
  * - a whole bucket with no arrival for `ttlMs` past its newest member is
  *   removed via `GroupStateTimeout.EventTimeTimeout`;
  * - a saturated bucket whose members have all aged out starts a fresh
  *   epoch (the saturation latch clears with the state).
  *
  * Pairing semantics under TTL: two docs whose event times are within
  * `ttlMs` of each other are ALWAYS paired (the watermark trails the max
  * seen event time, so a member is never evicted before `ttlMs` of
  * event time has passed it); docs farther apart than `ttlMs` plus the
  * watermark delay are never paired; between the two bounds, pairing
  * depends on micro-batch boundaries — the standard watermark contract.
  * Batch equivalence therefore holds exactly for inputs whose span fits
  * inside the TTL window (StreamingSpec pins both the equivalence and the
  * eviction).
  */
object DedupStreaming {

  final case class MinhashBucketRow(band: Int, bucket: Int, id: Long,
      sig: Seq[Long], sh: Seq[Long], ts: java.sql.Timestamp)
  final case class MinhashMember(id: Long, sig: Seq[Long], sh: Seq[Long], ts: Long)
  final case class MinhashBucketState(members: List[MinhashMember], saturated: Boolean,
      ghosts: List[MinhashMember])
  final case class NearDupHit(id_a: Long, id_b: Long, jaccard_est: Double, jaccard: Double)

  final case class SimhashBucketRow(chunk: Int, bucket: Long, id: Long, sim: Long,
      ts: java.sql.Timestamp)
  final case class SimhashMember(id: Long, sim: Long, ts: Long)
  final case class SimhashBucketState(members: List[SimhashMember], saturated: Boolean,
      ghosts: List[SimhashMember])
  final case class SimhashHit(id_a: Long, id_b: Long, hamming: Int)

  final case class EmbBucketRow(t: Int, sig: Long, id: Long, vec: Seq[Double],
      sigs: Seq[Long], ts: java.sql.Timestamp)
  final case class EmbMember(id: Long, vec: Seq[Double], sigs: Seq[Long], ts: Long)
  final case class EmbBucketState(members: List[EmbMember], saturated: Boolean,
      ghosts: List[EmbMember])
  final case class EmbHit(id_a: Long, id_b: Long, cosine: Double)

  /** First band where the two minhash signatures' slices agree — that
    * band's group is the pair's canonical emitter (exactly-once pair
    * emission across bands, no second stateful operator). Falls back to
    * the first band whose BUCKET hashes collide — replicating Catalyst's
    * Murmur3 fold over the array slice (`hash(slice(sig, …))`, seed 42) —
    * for the ~2⁻³² case of a bucket collision without slice equality, so
    * the stream emits exactly the candidate pairs the batch tier's
    * bucket join discovers. */
  private[streaming] def canonicalBand(a: Seq[Long], b: Seq[Long],
      bands: Int, r: Int): Int = {
    var bb = 0
    while (bb < bands) {
      var i = bb * r; val end = i + r; var same = true
      while (i < end && same) { if (a(i) != b(i)) same = false; i += 1 }
      if (same) return bb
      bb += 1
    }
    bb = 0
    while (bb < bands) {
      if (catalystArrayHash(a, bb * r, r) == catalystArrayHash(b, bb * r, r))
        return bb
      bb += 1
    }
    -1 // unreachable for pairs discovered via a shared bucket
  }

  /** First table index where two sign-LSH signature vectors agree; -1 if
    * none (unreachable for pairs discovered via a shared table bucket). */
  private[streaming] def firstEqualSig(a: Seq[Long], b: Seq[Long]): Int = {
    var t = 0
    val n = math.min(a.length, b.length)
    while (t < n) {
      if (a(t) == b(t)) return t
      t += 1
    }
    -1
  }

  /** First chunk index (0 to chunks−1, default the classic 4×16-bit
    * layout) where two simhashes agree; -1 if none (unreachable for
    * pairs discovered via a shared chunk bucket). */
  private[streaming] def firstEqualChunk(a: Long, b: Long,
      chunks: Int = 4): Int = {
    val width = 64 / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1
    var c = 0
    while (c < chunks) {
      if (((a >>> (c * width)) & mask) == ((b >>> (c * width)) & mask)) return c
      c += 1
    }
    -1
  }

  /** Catalyst `hash()` over an array<bigint> slice: Murmur3 x86-32 folded
    * element-wise from seed 42 (InterpretedHashFunction's array rule). */
  private def catalystArrayHash(sig: Seq[Long], from: Int, len: Int): Int = {
    var h = 42
    var i = from
    while (i < from + len) {
      h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(sig(i), h)
      i += 1
    }
    h
  }

  /** Event-time column for the banded projection. The ORIGINAL watermark
    * attribute must flow (unwrapped — casts strip the watermark metadata
    * Spark's checker looks for on the stateful operator's child), so this
    * is the raw column when TTL is on, a null literal otherwise; the state
    * fold converts to millis via [[rowMs]]. */
  private def tsCol(eventTimeCol: String, ttlMs: Long): Column =
    if (ttlMs > 0) col(eventTimeCol) else lit(null).cast("timestamp")

  private def rowMs(t: java.sql.Timestamp): Long = if (t == null) 0L else t.getTime

  private def withWatermarkIf(df: DataFrame, eventTimeCol: String,
      watermarkDelay: String, ttlMs: Long): DataFrame = {
    if (ttlMs <= 0) df
    else {
      require(eventTimeCol.nonEmpty, "ttlMs > 0 requires eventTimeCol")
      df.withWatermark(eventTimeCol, watermarkDelay)
    }
  }

  private def timeoutOf(ttlMs: Long): GroupStateTimeout =
    if (ttlMs > 0) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()

  /** Shared TTL state mechanics for one `flatMapGroupsWithState`
    * invocation: handles the timed-out case, evicts aged members, clears
    * the saturation latch (and its ghost list) when an epoch fully
    * drains, and (re)arms the group timeout after `body` has folded the
    * batch's rows in.
    *
    * @param memberTs event time of a stored member
    * @param body     (retained members, saturated, ghosts) =>
    *                 (new members, saturated, ghosts, output)
    * @return the output iterator */
  private def withTtlState[M, S, O](ttlMs: Long, state: GroupState[S],
      get: S => (List[M], Boolean, List[M]),
      mk: (List[M], Boolean, List[M]) => S, memberTs: M => Long)(
      body: (List[M], Boolean, List[M]) => (List[M], Boolean, List[M], Iterator[O]))
      : Iterator[O] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val (members0, saturated0, ghosts0) =
      state.getOption.map(get).getOrElse((Nil, false, Nil))
    val wm = if (ttlMs > 0) state.getCurrentWatermarkMs() else Long.MinValue
    val retained =
      if (ttlMs > 0) members0.filter(m => memberTs(m) + ttlMs > wm) else members0
    // all members of a saturated epoch aged out → fresh epoch (the ghost
    // list lives and dies with the latch); surviving ghosts age out on
    // the same TTL as members — their re-delivery guard expires with the
    // watermark contract, exactly like a member's would
    val saturated1 = saturated0 && retained.nonEmpty
    val ghosts1 =
      if (!saturated1) Nil
      else if (ttlMs > 0) ghosts0.filter(m => memberTs(m) + ttlMs > wm)
      else ghosts0
    val (members, saturated, ghosts, out) = body(retained, saturated1, ghosts1)
    if (ttlMs > 0 && members.isEmpty && !saturated) {
      state.remove()
    } else {
      state.update(mk(members, saturated, ghosts))
      if (ttlMs > 0) {
        val newest = members.iterator.map(memberTs).foldLeft(wm)(math.max)
        state.setTimeoutTimestamp(newest + ttlMs)
      }
    }
    out
  }

  /** @param events streaming DataFrame with `idCol` (castable to long) and
    *               `textCol` (string)
    * @param eventTimeCol timestamp column for TTL eviction ("" = none)
    * @param watermarkDelay max out-of-orderness, e.g. "10 minutes"
    * @param ttlMs state TTL in event-time millis (0 = keep state forever)
    * @return append-mode stream of verified near-dup hits */
  def nearDupMinhashStream(events: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 0, shingleK: Int = 5,
      maxBucketSize: Int = 100000, eventTimeCol: String = "",
      watermarkDelay: String = "0 seconds", ttlMs: Long = 0L): Dataset[NearDupHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val b = if (bands > 0) bands else Dedup.autoBands(numHashes, threshold)
    require(numHashes % b == 0, "numHashes must be divisible by bands")
    val r = numHashes / b

    // identical projection chain to the batch tier: normalize (attribute,
    // so lambdas never re-run the regex), native one-pass signature,
    // hashed shingle set for the exact verify
    val base = withWatermarkIf(events, eventTimeCol, watermarkDelay, ttlMs)
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.normalized(col(textCol)).as("__norm"),
        tsCol(eventTimeCol, ttlMs).as("ts"))
      .select(col("id"), col("ts"),
        Dedup.minhashSigNative(col("__norm"), shingleK, numHashes).as("sig"),
        Dedup.shingleHashesNorm(col("__norm"), shingleK).as("sh"))
    bandedPairsStream(bandedRowsOf(base, b, r), numHashes, b, threshold,
      maxBucketSize, ttlMs)
  }

  /** The banding projection [[nearDupMinhashStream]] and
    * [[nearDupNgramStream]] share: null-signature rows dropped up front
    * (one bad record must not NPE — and so kill — the long-running
    * query; the batch tier's Column math null-propagates them the same
    * way), then the per-band bucket hash — ONE copy, so the two text
    * tiers can never band differently (review r17). Expects
    * (id, ts, sig, sh). */
  private def bandedRowsOf(base: DataFrame, bands: Int,
      r: Int): Dataset[MinhashBucketRow] = {
    val spark = base.sparkSession
    import spark.implicits._
    base.filter(col("sig").isNotNull && col("sh").isNotNull)
      .select(
        col("id"), col("sig"), col("sh"), col("ts"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          bb => struct(bb.as("band"),
            hash(slice(col("sig"), bb * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("sig"), col("sh"), col("ts"))
      .as[MinhashBucketRow]
  }

  /** Streaming word-n-gram near-dup: the streaming tier of
    * [[Dedup.nearDupNgram]], completing the streaming symmetry of the
    * dedup family (minhash / simhash / embedding / n-gram). Identical
    * state machinery to [[nearDupMinhashStream]] — MinHash-LSH banding
    * over the n-gram hash set, exact n-gram-set jaccard verify,
    * canonical-band exactly-once emission, cap/ghost/TTL semantics —
    * with the token-level projection chain of the batch door (tokens
    * materialized before the gram transform; null text dropped up
    * front). */
  def nearDupNgramStream(events: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, numHashes: Int = 64, bands: Int = 0,
      maxBucketSize: Int = 100000, eventTimeCol: String = "",
      watermarkDelay: String = "0 seconds", ttlMs: Long = 0L): Dataset[NearDupHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val b = if (bands > 0) bands else Dedup.autoBands(numHashes, threshold)
    require(numHashes % b == 0, "numHashes must be divisible by bands")
    val r = numHashes / b
    val base = withWatermarkIf(events, eventTimeCol, watermarkDelay, ttlMs)
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.normalized(col(textCol)).as("__norm"),
        tsCol(eventTimeCol, ttlMs).as("ts"))
      .select(col("id"), col("ts"),
        TextAnalysis.tokens(col("__norm")).as("__toks"))
      .select(col("id"), col("ts"),
        Dedup.ngramHashesOf(col("__toks"), n).as("sh"))
      .select(col("id"), col("ts"), col("sh"),
        Dedup.minhashSignatureHashed(numHashes)(col("sh")).as("sig"))
    bandedPairsStream(bandedRowsOf(base, b, r), numHashes, b, threshold,
      maxBucketSize, ttlMs)
  }

  /** The banded stateful pair stream [[nearDupMinhashStream]] and
    * [[nearDupNgramStream]] share: per-(band, bucket)
    * flatMapGroupsWithState over [[MinhashBucketRow]]s — signature
    * estimate + exact set-jaccard verify over `sh` (shingle hashes or
    * n-gram hashes; the fold never cares which), canonical-band
    * exactly-once emission, saturation ghosts, TTL eviction. */
  private def bandedPairsStream(banded: Dataset[MinhashBucketRow],
      numHashes: Int, bands: Int, threshold: Double, maxBucketSize: Int,
      ttlMs: Long): Dataset[NearDupHit] = {
    val spark = banded.sparkSession
    import spark.implicits._
    val nh = numHashes
    val th = threshold
    val cap = maxBucketSize
    val ttl = ttlMs
    val nBands = bands
    banded.groupByKey(row => (row.band, row.bucket))
      .flatMapGroupsWithState[MinhashBucketState, NearDupHit](
        OutputMode.Append(), timeoutOf(ttl)) {
        case ((myBand, _), rows, state) =>
          withTtlState[MinhashMember, MinhashBucketState, NearDupHit](
            ttl, state, s => (s.members, s.saturated, s.ghosts),
            MinhashBucketState(_, _, _), _.ts) { (members0, saturated0, ghosts0) =>
            var members = members0
            var saturated = saturated0
            var ghosts = ghosts0
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            // id-sorted within the micro-batch: emission order (and which
            // member is "already present" for within-batch pairs) is
            // deterministic under source repartitioning
            rows.toSeq.sortBy(_.id).foreach { row =>
              if (!saturated && members.lengthCompare(cap) >= 0) saturated = true
              // already a member or a remembered ghost: at-least-once
              // re-delivery — re-processing would duplicate every pair
              // (and, for members, burn a cap slot per replay)
              val seen = members.exists(_.id == row.id) ||
                ghosts.exists(_.id == row.id)
              // saturation liveness: a saturated bucket keeps VERIFYING
              // (emitting pairs it is canonical for) until its ghost
              // budget is spent; it just stops admitting. Ghosts carry
              // full member data (r15), so refused docs still verify
              // later arrivals — the canonical group can emit a pair
              // whose OLDER member was refused at its saturated bucket.
              if (!seen && (!saturated || ghosts.lengthCompare(cap) < 0)) {
                val sb = row.sh.toSet // loop-invariant: hoisted per arrival
                (members.iterator ++ ghosts.iterator).foreach { m =>
                  var eq = 0
                  var i = 0
                  while (i < nh) { if (m.sig(i) == row.sig(i)) eq += 1; i += 1 }
                  val sa = m.sh.toSet
                  val uni = sa.union(sb).size
                  val jac = if (uni > 0) sa.intersect(sb).size.toDouble / uni else 0.0
                  // canonical-band rule: a pair colliding in several bands
                  // is discovered by several groups in the SAME micro-batch
                  // (pairs are only emitted at the newer doc's arrival), so
                  // each group emits iff ITS band is the pair's first
                  // colliding band — exactly-once across bands with no
                  // second stateful operator (see canonicalBand).
                  if (jac >= th &&
                      canonicalBand(m.sig, row.sig, nBands, nh / nBands) == myBand)
                    out += NearDupHit(math.min(m.id, row.id), math.max(m.id, row.id),
                      eq.toDouble / nh, jac)
                }
                val rec = MinhashMember(row.id, row.sig, row.sh, rowMs(row.ts))
                if (!saturated) members = rec :: members
                else ghosts = rec :: ghosts
              }
            }
            (members, saturated, ghosts, out.iterator)
          }
      }
  }

  /** Streaming SimHash near-dup: the streaming tier of
    * [[Dedup.nearDupSimhash]]. Bucket keys are the SimHash's chunks at
    * the radius-derived chunk count (the batch door's
    * [[Dedup.simhashChunkCount]]: 4×16-bit to hamming 3, 8×8-bit to 7,
    * 16×4-bit to 15 — pigeonhole: a pair within the radius agrees on
    * ≥ 1 chunk; before r18 this door hardcoded 4 chunks and a
    * `maxHamming >= 4` request SILENTLY missed pairs); state per
    * (chunk, bucket) holds (id, simhash); a new arrival verifies
    * `bitCount(xor) ≤ maxHamming` against stored members. Exactly-once
    * pair emission via the canonical-chunk rule ([[firstEqualChunk]] at
    * the same chunk count); cap and TTL semantics as
    * [[nearDupMinhashStream]]. NB a widened radius changes the bucket
    * KEYS (coarser chunks), so restarting a default-radius checkpoint
    * at a widened radius is the state-compatibility non-contract above;
    * the default radius keys state exactly as before. The widened
    * layouts also shrink the bucket domain (256 or 16 values per
    * chunk), so large streams saturate the per-bucket cap sooner — the
    * cap/ghost machinery bounds state, at the residual StreamingSpec
    * quantifies. */
  def nearDupSimhashStream(events: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 100000, eventTimeCol: String = "",
      watermarkDelay: String = "0 seconds", ttlMs: Long = 0L): Dataset[SimhashHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val chunks = Dedup.simhashChunkCount("nearDupSimhashStream", maxHamming)
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val banded = withWatermarkIf(events, eventTimeCol, watermarkDelay, ttlMs)
      .select(col(idCol).cast("long").as("id"),
        Dedup.simhash64(col(textCol)).as("sim"),
        tsCol(eventTimeCol, ttlMs).as("ts"))
      // null text → null simhash: drop before the non-nullable encoder
      .filter(col("sim").isNotNull)
      .select(col("id"), col("sim"), col("ts"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("bucket", expr(s"(sim >> (chunk * $width)) & $mask"))
      .select(col("chunk"), col("bucket"), col("id"), col("sim"), col("ts"))
      .as[SimhashBucketRow]
    val mh = maxHamming
    val cap = maxBucketSize
    val ttl = ttlMs
    banded.groupByKey(r => (r.chunk, r.bucket))
      .flatMapGroupsWithState[SimhashBucketState, SimhashHit](
        OutputMode.Append(), timeoutOf(ttl)) {
        case ((myChunk, _), rows, state) =>
          withTtlState[SimhashMember, SimhashBucketState, SimhashHit](
            ttl, state, s => (s.members, s.saturated, s.ghosts),
            SimhashBucketState(_, _, _), _.ts) { (members0, saturated0, ghosts0) =>
            var members = members0
            var saturated = saturated0
            var ghosts = ghosts0
            val out = scala.collection.mutable.ArrayBuffer.empty[SimhashHit]
            rows.toSeq.sortBy(_.id).foreach { row =>
              if (!saturated && members.lengthCompare(cap) >= 0) saturated = true
              val seen = members.exists(_.id == row.id) ||
                ghosts.exists(_.id == row.id)
              // saturation liveness + ghost-with-data verify (see minhash)
              if (!seen && (!saturated || ghosts.lengthCompare(cap) < 0)) {
                (members.iterator ++ ghosts.iterator).foreach { m =>
                  val d = java.lang.Long.bitCount(m.sim ^ row.sim)
                  // canonical-chunk rule (see canonicalBand): emit only
                  // from the FIRST chunk the two simhashes share —
                  // pigeonhole (d ≤ chunks−1) guarantees one exists
                  if (d <= mh && firstEqualChunk(m.sim, row.sim, chunks) == myChunk)
                    out += SimhashHit(math.min(m.id, row.id), math.max(m.id, row.id), d)
                }
                val rec = SimhashMember(row.id, row.sim, rowMs(row.ts))
                if (!saturated) members = rec :: members
                else ghosts = rec :: ghosts
              }
            }
            (members, saturated, ghosts, out.iterator)
          }
      }
  }

  /** Streaming embedding-cosine near-dup: the streaming tier of
    * [[Dedup.nearDupEmbedding]]. OR-amplified sign-LSH bucket keys
    * ((table, signature), same planes as batch via
    * [[graft.pipeline.Similarity.signSignatureSeeded]]); state holds the
    * (id, vector, all-table signatures) members; a new arrival verifies
    * exact cosine ≥ threshold against stored members. Exactly-once pair
    * emission via the canonical-table rule ([[firstEqualSig]]); cap and
    * TTL semantics as [[nearDupMinhashStream]]. */
  def nearDupEmbeddingStream(events: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 0, tables: Int = 0,
      maxBucketSize: Int = 100000, eventTimeCol: String = "",
      watermarkDelay: String = "0 seconds", ttlMs: Long = 0L): Dataset[EmbHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    // same recall-targeted default sizing as the batch door (r17) —
    // batch ≡ stream stays a default-vs-default property at equal
    // thresholds. NB a plane change (auto or pinned) changes bucket
    // keys: restarting on an old checkpoint after changing planes is
    // the state-compatibility non-contract README documents.
    val (bitsR, tablesR) = Dedup.resolvePlanes("nearDupEmbeddingStream",
      threshold, targetRecall = 0.9, bits, tables)
    val sigCols = (0 until tablesR).map(t =>
      struct(lit(t).as("t"),
        graft.pipeline.Similarity.signSignatureSeeded(bitsR, t)(col("vec")).as("sig")))
    val banded = withWatermarkIf(events, eventTimeCol, watermarkDelay, ttlMs)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"),
        tsCol(eventTimeCol, ttlMs).as("ts"))
      // null/zero-information vectors give a null signature: drop before
      // the non-nullable encoder (one bad record must not kill the query)
      .filter(col("vec").isNotNull)
      // every table's signature rides along so the canonical-table rule
      // can pick the pair's single emitter without recomputing planes
      .select(col("id"), col("vec"), col("ts"),
        array(sigCols.map(_.getField("sig")): _*).as("sigs"),
        explode(array(sigCols: _*)).as("tsig"))
      .select(col("tsig.t").as("t"), col("tsig.sig").as("sig"),
        col("id"), col("vec"), col("sigs"), col("ts"))
      .filter(col("sig").isNotNull)
      .as[EmbBucketRow]
    val th = threshold
    val cap = maxBucketSize
    val ttl = ttlMs
    banded.groupByKey(r => (r.t, r.sig))
      .flatMapGroupsWithState[EmbBucketState, EmbHit](
        OutputMode.Append(), timeoutOf(ttl)) {
        case ((myTable, _), rows, state) =>
          withTtlState[EmbMember, EmbBucketState, EmbHit](
            ttl, state, s => (s.members, s.saturated, s.ghosts),
            EmbBucketState(_, _, _), _.ts) { (members0, saturated0, ghosts0) =>
            var members = members0
            var saturated = saturated0
            var ghosts = ghosts0
            val out = scala.collection.mutable.ArrayBuffer.empty[EmbHit]
            def dot(a: Seq[Double], b: Seq[Double]): Double = {
              var s = 0.0; var i = 0
              val n = math.min(a.length, b.length)
              while (i < n) { s += a(i) * b(i); i += 1 }
              s
            }
            rows.toSeq.sortBy(_.id).foreach { row =>
              if (!saturated && members.lengthCompare(cap) >= 0) saturated = true
              val seen = members.exists(_.id == row.id) ||
                ghosts.exists(_.id == row.id)
              // saturation liveness + ghost-with-data verify (see minhash)
              if (!seen && (!saturated || ghosts.lengthCompare(cap) < 0)) {
                val rowNorm = math.sqrt(dot(row.vec, row.vec)) // hoisted
                (members.iterator ++ ghosts.iterator).foreach { m =>
                  val c = dot(m.vec, row.vec) /
                    (math.sqrt(dot(m.vec, m.vec)) * rowNorm)
                  // canonical-table rule (see canonicalBand): emit only
                  // from the FIRST table whose signatures agree
                  if (c >= th && firstEqualSig(m.sigs, row.sigs) == myTable)
                    out += EmbHit(math.min(m.id, row.id), math.max(m.id, row.id), c)
                }
                val rec = EmbMember(row.id, row.vec, row.sigs, rowMs(row.ts))
                if (!saturated) members = rec :: members
                else ghosts = rec :: ghosts
              }
            }
            (members, saturated, ghosts, out.iterator)
          }
      }
  }

  /** Streaming DECONTAMINATION against a
    * [[graft.pipeline.Dedup.writeDecontamStore]] suite — the stream twin
    * of [[graft.pipeline.Dedup.decontaminateAgainstStore]], completing
    * the tier's direct/store/stream symmetry (every other near-dup tier
    * already has all three doors). The door is STATELESS: the stamped
    * eval grams are broadcast per micro-batch and a row's verdict
    * depends on nothing but the row and the store, so batch ≡ stream
    * row-for-row over the same input split any way into batches — no
    * flatMapGroupsWithState, no checkpoint-state contract, just
    * `foreachBatch` over the packaged batch door (the
    * [[GeoStreaming.sjoinNearestStoreStream]] pattern). Returns a
    * configured `DataStreamWriter`: the caller supplies the `sink`
    * consuming each micro-batch's CLEAN rows (all columns kept), then
    * sets trigger/checkpoint and `.start()`s. Rows sharing a stored
    * gram are dropped; callers wanting the contaminated ids instead run
    * [[graft.pipeline.Dedup.contaminatedAgainstStore]] inside their own
    * foreachBatch. */
  def decontamStoreStream(stream: DataFrame, table: String,
      trainId: String = "doc_id", trainText: String = "text")(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.decontaminateAgainstStore(batch.sparkSession, batch,
        trainId, trainText, table), batchId)
    }

  /** The STREAMING INGEST LOOP against a persistent near-dup index —
    * the batch loop README documents (`novel → sink → append`), packaged
    * as one `foreachBatch` door per tier: each micro-batch is filtered
    * through the tier's `*NovelAgainstStore` (against the corpus AND
    * within the batch), the surviving novel rows go to the caller's
    * `sink`, and are then APPENDED to the index — so batch `i` dedups
    * against the original corpus plus every accepted row of batches
    * `0..i-1`. Cross-batch dedup with NO stream state at all: the index
    * IS the state, bounded by the corpus, durable across restarts, and
    * shared with every batch door.
    *
    * Semantics: the drained stream's surviving set equals running the
    * batch ingest loop over the same micro-batch partition of the input
    * (StreamingSpec pins this against a planted cross-batch dup) —
    * unlike the stateful `nearDup*Stream` twins, the split into batches
    * DOES matter exactly as it does for the batch loop: two near-dups
    * arriving in ONE batch collapse to the min-id survivor, arriving in
    * different batches the earlier one wins.
    *
    * Failure contract: `foreachBatch` can re-run a micro-batch after a
    * crash, and the append is not transactional with the sink — a
    * replayed batch re-appends its novel rows (they dedup themselves
    * away at candidates time, the doors' dropDuplicates) and the store
    * accumulates exactly the retried-ingest dead weight
    * [[graft.pipeline.Dedup.compactMinhashStore]]'s vacuum removes; run
    * the tier's compaction door after recovering from a failed stream.
    * The sink may also observe a replayed batch — standard foreachBatch
    * at-least-once.
    *
    * The store must exist (write the base corpus first); its stamped
    * parameters drive every batch, so the whole stream re-points by
    * rewriting the store. Returns the configured `DataStreamWriter` —
    * set trigger/checkpoint and `.start()`. */
  def minhashIngestStream(stream: DataFrame, table: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxBucketSize: Int = 100000,
      dedupWithinBatch: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ingestStream(stream, sink,
      Seq(table, table + Dedup.MinhashSigTableSuffix)) { (s, batch) =>
      val novel = Dedup.minhashNovelAgainstStore(s, batch, table, idCol,
        textCol, threshold, maxBucketSize, dedupWithinBatch)
      (novel, accepted => Dedup.writeMinhashStore(accepted, table, idCol,
        textCol, mode = "append", maxBucketSize = maxBucketSize))
    }

  /** [[minhashIngestStream]]'s token-level (word-n-gram) twin. */
  def ngramIngestStream(stream: DataFrame, table: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxBucketSize: Int = 100000,
      dedupWithinBatch: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ingestStream(stream, sink,
      Seq(table, table + Dedup.MinhashSigTableSuffix)) { (s, batch) =>
      val novel = Dedup.ngramNovelAgainstStore(s, batch, table, idCol,
        textCol, threshold, maxBucketSize, dedupWithinBatch)
      (novel, accepted => Dedup.writeNgramStore(accepted, table, idCol,
        textCol, mode = "append", maxBucketSize = maxBucketSize))
    }

  /** [[minhashIngestStream]]'s Hamming-distance twin; `maxHamming` must
    * sit within the store's stamped chunk layout's pigeonhole. */
  def simhashIngestStream(stream: DataFrame, table: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucketSize: Int = 100000,
      dedupWithinBatch: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ingestStream(stream, sink, Seq(table)) { (s, batch) =>
      val novel = Dedup.simhashNovelAgainstStore(s, batch, table, idCol,
        textCol, maxHamming, maxBucketSize, dedupWithinBatch)
      (novel, accepted => Dedup.writeSimhashStore(accepted, table, idCol,
        textCol, mode = "append", maxBucketSize = maxBucketSize,
        maxHamming = maxHamming))
    }

  /** [[minhashIngestStream]]'s cosine twin; batches dedup at the
    * store's STAMPED (bits, tables) recall curve. */
  def embeddingIngestStream(stream: DataFrame, table: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95, maxBucketSize: Int = 100000,
      dedupWithinBatch: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ingestStream(stream, sink,
      Seq(table, table + Dedup.EmbeddingVecTableSuffix)) { (s, batch) =>
      val novel = Dedup.embeddingNovelAgainstStore(s, batch, table, idCol,
        vecCol, threshold, maxBucketSize, dedupWithinBatch)
      (novel, accepted => Dedup.writeEmbeddingStore(accepted, table, idCol,
        vecCol, mode = "append", maxBucketSize = maxBucketSize))
    }

  /** The shared foreachBatch skeleton of the four ingest doors: novel
    * rows are SNAPPED once (localCheckpoint) — the sink and the append
    * both consume them, and an unsnapped frame would re-run the whole
    * novel computation per consumer AND could see a different store
    * (the append mutates it between the two reads). The append runs
    * AFTER the sink so a sink failure fails the batch before the store
    * grows (the replay then re-filters the same batch against the
    * un-grown store — same answer). Empty batches skip the append
    * (writeSignatureStore on zero rows is a no-op write but still
    * cycles the stamp; skipping keeps crash windows to real appends).
    *
    * After a real append the store tables are REFRESHED in the PARENT
    * session (the one the stream was built from): foreachBatch runs in
    * a micro-batch-cloned session whose writes invalidate only its own
    * relation cache, so without the refresh a caller probing the index
    * from the session that started the stream can silently read
    * PRE-STREAM file listings (the cloned session's in-stream reads are
    * always current). Other sessions keep standard Spark semantics —
    * refresh before reading. */
  private def ingestStream(stream: DataFrame,
      sink: (DataFrame, Long) => Unit, refreshTables: Seq[String])(
      tier: (SparkSession, DataFrame) => (DataFrame, DataFrame => Unit)): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val parent = stream.sparkSession
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val (novelLazy, append) = tier(s, batch)
      val novel = novelLazy.localCheckpoint(true)
      sink(novel, batchId)
      if (!novel.isEmpty) {
        append(novel)
        refreshTables.foreach { t =>
          try parent.catalog.refreshTable(t)
          catch { case _: org.apache.spark.sql.AnalysisException => () }
        }
      }
    }
  }
}
