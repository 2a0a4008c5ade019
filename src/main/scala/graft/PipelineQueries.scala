package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}

/** Oracle-checked queries for the LLM-training-data pipeline operators
  * (beyond-reference surface: dedup, similarity search, text analysis,
  * multimodal plumbing).
  *
  * The synthetic `documents` table has no duplicate rows, so the dedup
  * queries synthesize exact duplicates by unioning the table with an
  * id-shifted copy of itself — every "found the duplicate" count is then
  * closed-form for the oracle. Text statistics are mirrored expression by
  * expression in DuckDB SQL (same regexes, same arithmetic order, so IEEE
  * doubles match bit-for-bit).
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Shared image-dedup fixture (pipe_image_dedup + pipe_stream_image):
    * per-doc gradient rasters as PNG (img_id = doc_id) and BMP (+10000) —
    * the same pixels through two lossless codecs. doc_id < 2048 because
    * the frequency triple repeats every 4096 ids — at a larger sf,
    * colliding ids would make byte-identical images across docs and
    * genuine cross pairs; the half-period cap keeps the fixture injective
    * at ANY sf (the oracle SQL filters identically). */
  private def gradImageTwins(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 2048)
      .withColumn("fr", (col("doc_id") % 16 * 2 + 3).cast("int"))
      .withColumn("fg", ((col("doc_id") / 16) % 16 * 2 + 5).cast("int"))
      .withColumn("fb", ((col("doc_id") / 256) % 16 * 2 + 7).cast("int"))
    def enc(fmt: String, shift: Int) =
      base.select((col("doc_id") + shift).as("img_id"),
        Multimodal.makeGradImage(lit(24), lit(16),
          col("fr"), col("fg"), col("fb"), lit(fmt)).as("img"))
    // in-band corrupt media (r14): a truncated PNG (header only, no
    // pixel data), a decompression-bomb header, and junk bytes ride
    // INSIDE the fixture — on a 100 TB corpus corrupt blobs arrive in
    // the same micro-batch as good ones, so the honest-null contract
    // (feature → null → row drops from pairing, batch AND stream, no
    // task failure) is pinned where it actually has to hold
    val corrupt = s.range(3).select((col("id") + 20000).as("img_id"),
      when(col("id") === 0, Multimodal.makePngHeader(lit(64), lit(32)))
        .when(col("id") === 1, Multimodal.makePngHeader(lit(60000), lit(60000)))
        .otherwise(lit(Array[Byte](9, 9, 9, 9))).as("img"))
    enc("png", 0).unionAll(enc("bmp", 10000)).unionAll(corrupt)
  }

  /** Shared video-dedup fixture (pipe_video_dedup + pipe_stream_video):
    * per-doc gradient MJPEG AVIs (vid_id = doc_id) and their REAL
    * transcodes (+10000). Wrap-free low frequencies keep pooled features
    * distinct per triple (high frequencies average every cell toward
    * uniform gray — probe-measured); doc_id < 256 is the half-period
    * injectivity cap (triple repeats every 512 ids). */
  private def gradVideoTwins(s: SparkSession, dir: String): DataFrame = {
    val orig = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 256)
      .withColumn("fr", (col("doc_id") % 8 + 1).cast("int"))
      .withColumn("fg", ((col("doc_id") / 8) % 8 + 1).cast("int"))
      .withColumn("fb", ((col("doc_id") / 64) % 8 + 1).cast("int"))
      .select(col("doc_id").as("vid_id"),
        Multimodal.makeGradMjpegAvi(lit(24), lit(16), lit(6),
          col("fr"), col("fg"), col("fb"), lit(0)).as("avi"))
    // in-band corrupt media (r14, same contract as the image fixture):
    // a RIFF header truncated before any stream data, and junk bytes —
    // frame sampling must yield null, the rows must drop from pairing
    // in both the batch and streaming paths without failing a task
    val truncated = orig.filter(col("vid_id") === 0)
      .select(lit(20000L).as("vid_id"), substring(col("avi"), 1, 16).as("avi"))
    val junk = s.range(1).select(lit(20001L).as("vid_id"),
      lit(Array[Byte](82, 73, 70, 70)).as("avi")) // bare "RIFF"
    orig.unionAll(orig.select((col("vid_id") + 10000).as("vid_id"),
      Multimodal.transcodeMjpegAvi(col("avi")).as("avi")))
      .unionAll(truncated).unionAll(junk)
  }

  /** documents ∪ (documents with doc_id += 10000): each text exactly twice. */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  /** The stream≡batch pin the text near-dup streaming tiers share
    * (pipe_stream_minhash / pipe_stream_ngram): drain the duped docs
    * through the streaming door, full-outer sym-diff against the batch
    * door's (id_a, id_b) pairs (pinned 0 by the oracle), and count the
    * identical-fingerprint pairs (closed-form count(documents)). ONE
    * copy, so the two tiers' pinning logic cannot drift (review r17). */
  private def streamVsBatchTextPairs(s: SparkSession, dir: String,
      name: String, streamDoor: DataFrame => DataFrame,
      batchDoor: DataFrame => DataFrame): DataFrame = {
    val all = docsWithDups(s, dir)
    val pairs = graft.streaming.StreamDrain.availableNow(s, all, name,
        streamDoor)
      .dropDuplicates("id_a", "id_b")
    val fps = all.select(col("doc_id").as("id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val batchPairs = batchDoor(all).select("id_a", "id_b")
    val symDiff = pairs.select(col("id_a"), col("id_b"), lit(1).as("s"))
      .join(batchPairs.withColumn("b", lit(1)), Seq("id_a", "id_b"), "full")
      .filter(col("s").isNull || col("b").isNull)
    pairs
      .join(fps.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(fps.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .agg(sum((col("fp_a") === col("fp_b")).cast("long")).as("n_stream_ident"))
      .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------------ text analysis
    "pipe_text" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(txt).as("n_tok"),
        TextAnalysis.subwordCount(txt).as("n_sub"),
        TextAnalysis.alphaRatio(txt).as("alpha"),
        TextAnalysis.digitRatio(txt).as("digit"),
        TextAnalysis.punctRatio(txt).as("punct"),
        TextAnalysis.whitespaceRatio(txt).as("ws"),
        TextAnalysis.meanWordLength(txt).as("mwl"),
        TextAnalysis.stopwordCount(txt, "en").as("sw"),
        TextAnalysis.stopwordRatio(txt, "en").as("swr"),
        TextAnalysis.langId(txt).as("lang"),
        TextAnalysis.qualityScore(txt).as("q"),
        TextAnalysis.fingerprint(txt).as("fp")
      ).orderBy(col("doc_id"))
    }),

    // -------------------------------------------------------- exact dedup
    "pipe_dedup_exact" -> ((s, dir) => {
      val all = docsWithDups(s, dir)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val deduped = Dedup.exact(all, Seq("fp"), "doc_id")
      val groups = Dedup.exactGroups(all, col("fp"), col("doc_id"))
      val rfp = t(s, dir, "documents")
        .select(TextAnalysis.rollingFingerprint(col("text")).as("rf"))
      deduped.agg(
        count(lit(1)).as("n_after"),
        sum(col("doc_id")).as("kept_id_sum"))
        .crossJoin(groups.agg(
          sum((col("copies") === 2).cast("long")).as("n_groups2"),
          sum(col("kept_id")).as("group_kept_sum")))
        .crossJoin(rfp.agg(countDistinct(col("rf")).as("n_rfp")))
    }),

    // ------------------------------------------------------- MinHash LSH
    "pipe_dedup_minhash" -> ((s, dir) => {
      val all = docsWithDups(s, dir)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val fps = all.select(col("doc_id").as("id"), col("fp"))
      val cands = Dedup.minhashCandidates(all, "doc_id", "text")
        .join(fps.withColumnRenamed("id", "id_a").withColumnRenamed("fp", "fp_a"), Seq("id_a"))
        .join(fps.withColumnRenamed("id", "id_b").withColumnRenamed("fp", "fp_b"), Seq("id_b"))
      val verified = Dedup.nearDupMinhash(all, "doc_id", "text", threshold = 1.0)
        .join(fps.withColumnRenamed("id", "id_a").withColumnRenamed("fp", "fp_a"), Seq("id_a"))
        .join(fps.withColumnRenamed("id", "id_b").withColumnRenamed("fp", "fp_b"), Seq("id_b"))
      cands.agg(
        sum((col("fp_a") === col("fp_b")).cast("long")).as("n_cand_ident"))
        .crossJoin(verified.agg(
          sum((col("fp_a") === col("fp_b")).cast("long")).as("n_verified_ident")))
    }),

    /** The persistent MinHash corpus index (r16): corpus → store (one
      * signature pass, bucketed by band/bucket), then a NEW batch —
      * half exact dups of corpus docs (ids +10000), half synthetic
      * novels (ids +20000, content disjoint from any English corpus
      * text) — dedups against it. Pins: every dup is found (its
      * identical text gives an IDENTICAL signature → est exactly 1.0 →
      * one fp-equal candidate pair per doc, assuming the corpus has no
      * two identical texts — the pipe_dedup_minhash assumption), and
      * every novel row survives the 0.5-threshold filter (est ≥ 0.5
      * needs 32 of 64 deterministic minhash agreements — content with
      * ~zero shingle overlap cannot reach it). Both counts reduce to
      * `count(documents)` in the oracle. */
    "pipe_minhash_store" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // novel text = two md5 hex blocks per id: unique, and pairwise
      // shingle overlap between any two novels (or a novel and English
      // corpus text) is near zero — neither the corpus filter nor the
      // within-batch dedup can cluster them, so the novel count is
      // exactly the novel half (cyclic id-derived text was NOT safe
      // here: ids like 111 vs 1111 share most of their 5-gram cycle)
      val batch = corpus
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(corpus.select((col("doc_id") + 20000).as("doc_id"),
          concat(md5(concat(lit("n1-"), col("doc_id"))), lit(" "),
            md5(concat(lit("n2-"), col("doc_id")))).as("text")))
      Dedup.dropMinhashStore(s, "graft_q_mh_store")
      Dedup.writeMinhashStore(corpus, "graft_q_mh_store")
      val fpsC = corpus.select(col("doc_id").as("corpus_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_c"))
      val fpsB = batch.select(col("doc_id").as("batch_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_b"))
      val cands = Dedup
        .minhashCandidatesAgainstStore(s, batch, "graft_q_mh_store")
        .join(fpsC, Seq("corpus_id")).join(fpsB, Seq("batch_id"))
      // the novel DOOR is deliberately exercised end-to-end (its own
      // candidates pass included) rather than derived from `cands` —
      // oracle coverage of the public API outweighs the second
      // signature pass in this harness
      val novel = Dedup.minhashNovelAgainstStore(s, batch,
        "graft_q_mh_store", threshold = 0.5)
      cands.agg(
        sum((col("fp_c") === col("fp_b")).cast("long")).as("n_store_ident"))
        // count ALL survivors, not just the 20000+ range: a dup row
        // escaping the filter must inflate this, not hide behind a range
        .crossJoin(novel.agg(count(lit(1)).as("n_novel")))
    }),

    /** The cosine tier of the persistent index family (r16): corpus
      * embeddings → sign-LSH store, then a dup half (ids +100000,
      * verbatim vectors — identical signatures collide in every table
      * and the exact cosine clears 0.9999, the pipe_embedding
      * precedent) and a NEGATED half (ids +200000, −v: cosine against
      * any corpus w is −cos(v, w), which can only reach 0.9999 if the
      * corpus held an antipodal pair — it does not, deterministically).
      * Both counts reduce to count(embeddings); the within-batch dedup
      * path is spec-pinned (EmbeddingStoreSpec), so the novel door runs
      * dedupWithinBatch = false here — negations of near-dup corpus
      * pairs would otherwise collapse each other. */
    "pipe_embedding_store" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Dedup.dropEmbeddingStore(s, "graft_q_emb_store")
      Dedup.writeEmbeddingStore(e, "graft_q_emb_store")
      val dupBatch = e.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding"))
      val nDup = Dedup
        .embeddingCandidatesAgainstStore(s, dupBatch, "graft_q_emb_store")
        .filter(col("cosine") >= 0.9999)
        .filter(col("batch_id") - col("corpus_id") === 100000)
        .agg(count(lit(1)).as("n_emb_dup"))
      val negBatch = e.select((col("vec_id") + 200000).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      val novel = Dedup.embeddingNovelAgainstStore(s, negBatch,
        "graft_q_emb_store", threshold = 0.9999, dedupWithinBatch = false)
      nDup.crossJoin(novel.agg(count(lit(1)).as("n_emb_novel")))
    }),

    /** The SimHash sibling of pipe_minhash_store (r16) — same fixture
      * shape (dup half +10000, md5-novel half +20000), same closed-form
      * counts: a dup's identical text gives an identical 64-bit
      * signature (hamming 0, caught with CERTAINTY — the 4-chunk
      * pigeonhole is exact, not an LSH curve), and an md5-hex novel sits
      * ~32 bits from everything (binomial around 64/2), far outside the
      * ≤3 radius, on both the corpus check and the within-batch pass. */
    "pipe_simhash_store" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(corpus.select((col("doc_id") + 20000).as("doc_id"),
          concat(md5(concat(lit("s1-"), col("doc_id"))), lit(" "),
            md5(concat(lit("s2-"), col("doc_id")))).as("text")))
      graft.join.SpatialJoin.dropBucketedTable(s, "graft_q_sh_store")
      Dedup.writeSimhashStore(corpus, "graft_q_sh_store")
      val fpsC = corpus.select(col("doc_id").as("corpus_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_c"))
      val fpsB = batch.select(col("doc_id").as("batch_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_b"))
      val cands = Dedup
        .simhashCandidatesAgainstStore(s, batch, "graft_q_sh_store")
        .join(fpsC, Seq("corpus_id")).join(fpsB, Seq("batch_id"))
      val novel = Dedup.simhashNovelAgainstStore(s, batch, "graft_q_sh_store")
      cands.agg(
        sum((col("fp_c") === col("fp_b")).cast("long")).as("n_store_ident"))
        .crossJoin(novel.agg(count(lit(1)).as("n_novel")))
    }),

    /** The WIDENED-RADIUS door of the SimHash store tier (r18): the
      * store is written with maxHamming = 6, stamping the 8×8-bit chunk
      * layout (pigeonhole exact to Hamming 7) the store tier previously
      * refused — same fixture and closed-form counts as
      * pipe_simhash_store, still valid at the wider radius: a dup's
      * identical text is Hamming 0, and an md5-hex novel sits ~32 bits
      * from everything (binomial around 64/2 — P(≤6) is astronomically
      * small), far outside the radius on both the corpus check and the
      * within-batch pass. */
    "pipe_simhash_store_wide" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(corpus.select((col("doc_id") + 20000).as("doc_id"),
          concat(md5(concat(lit("w1-"), col("doc_id"))), lit(" "),
            md5(concat(lit("w2-"), col("doc_id")))).as("text")))
      graft.join.SpatialJoin.dropBucketedTable(s, "graft_q_sh_store_w")
      Dedup.writeSimhashStore(corpus, "graft_q_sh_store_w", maxHamming = 6)
      val fpsC = corpus.select(col("doc_id").as("corpus_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_c"))
      val fpsB = batch.select(col("doc_id").as("batch_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_b"))
      val cands = Dedup
        .simhashCandidatesAgainstStore(s, batch, "graft_q_sh_store_w",
          maxHamming = 6)
        .join(fpsC, Seq("corpus_id")).join(fpsB, Seq("batch_id"))
      val novel = Dedup.simhashNovelAgainstStore(s, batch,
        "graft_q_sh_store_w", maxHamming = 6)
      cands.agg(
        sum((col("fp_c") === col("fp_b")).cast("long")).as("n_store_ident"))
        .crossJoin(novel.agg(count(lit(1)).as("n_novel")))
    }),

    /** The token-level (word-n-gram) tier of the persistent index
      * family (r17) — same fixture shape as pipe_minhash_store (dup
      * half +10000, md5-novel half +20000), same closed-form counts: a
      * dup's identical text gives an identical n-gram set → identical
      * signature → est exactly 1.0; an md5-hex novel is two tokens,
      * i.e. ONE whole-text 3-gram, whose single-element minhash
      * signature agrees with anything else's only at ~2⁻⁶⁴ per
      * position. The store is COMPACTED (ample cap — behavior
      * preserving) between write and probe, so the tmp-table swap and
      * re-stamp run under the driver's oracle too. */
    "pipe_ngram_store" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(corpus.select((col("doc_id") + 20000).as("doc_id"),
          concat(md5(concat(lit("g1-"), col("doc_id"))), lit(" "),
            md5(concat(lit("g2-"), col("doc_id")))).as("text")))
      Dedup.dropNgramStore(s, "graft_q_ng_store")
      Dedup.writeNgramStore(corpus, "graft_q_ng_store")
      Dedup.compactNgramStore(s, "graft_q_ng_store")
      val fpsC = corpus.select(col("doc_id").as("corpus_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_c"))
      val fpsB = batch.select(col("doc_id").as("batch_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_b"))
      val cands = Dedup
        .ngramCandidatesAgainstStore(s, batch, "graft_q_ng_store")
        .join(fpsC, Seq("corpus_id")).join(fpsB, Seq("batch_id"))
      val novel = Dedup.ngramNovelAgainstStore(s, batch,
        "graft_q_ng_store", threshold = 0.8)
      cands.agg(
        sum((col("fp_c") === col("fp_b")).cast("long")).as("n_store_ident"))
        .crossJoin(novel.agg(count(lit(1)).as("n_novel")))
    }),

    // ----------------------------------------------------------- SimHash
    "pipe_dedup_simhash" -> ((s, dir) => {
      val all = docsWithDups(s, dir)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val fps = all.select(col("doc_id").as("id"), col("fp"))
      Dedup.nearDupSimhash(all, "doc_id", "text", maxHamming = 3)
        .join(fps.withColumnRenamed("id", "id_a").withColumnRenamed("fp", "fp_a"), Seq("id_a"))
        .join(fps.withColumnRenamed("id", "id_b").withColumnRenamed("fp", "fp_b"), Seq("id_b"))
        .agg(sum((col("fp_a") === col("fp_b")).cast("long")).as("n_ident"),
          sum((col("hamming") === 0 && col("fp_a") === col("fp_b")).cast("long")).as("n_ident_h0"))
    }),

    // ------------------------------------------------- word n-gram Jaccard
    "pipe_dedup_ngram" -> ((s, dir) => {
      val all = docsWithDups(s, dir)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val fps = all.select(col("doc_id").as("id"), col("fp"))
      Dedup.nearDupNgram(all, "doc_id", "text", threshold = 1.0, n = 3)
        .join(fps.withColumnRenamed("id", "id_a").withColumnRenamed("fp", "fp_a"), Seq("id_a"))
        .join(fps.withColumnRenamed("id", "id_b").withColumnRenamed("fp", "fp_b"), Seq("id_b"))
        .agg(sum((col("fp_a") === col("fp_b")).cast("long")).as("n_ident"),
          sum((col("fp_a") === col("fp_b") && col("jaccard") === 1.0).cast("long"))
            .as("n_ident_j1"))
    }),

    // ------------------------------------------------ streaming near-dup
    // The streaming MinHash tier, drained batch-equivalently: the doc
    // table (with planted dups) becomes a file-source stream, AvailableNow
    // runs it through flatMapGroupsWithState bucket state, and the result
    // is compared in-query against the batch tier — n_sym_diff MUST be 0
    // (same pairs), and the identical-fingerprint pair count is the
    // closed-form oracle.
    "pipe_stream_minhash" -> ((s, dir) =>
      streamVsBatchTextPairs(s, dir, "stream_minhash",
        in => graft.streaming.DedupStreaming.nearDupMinhashStream(
          in, "doc_id", "text", threshold = 1.0).toDF(),
        all => Dedup.nearDupMinhash(all, "doc_id", "text", threshold = 1.0))),

    /** The streaming n-gram tier (r17): the same drain + batch-equality
      * pin as pipe_stream_minhash, over the token-level door — stream
      * pairs must equal [[Dedup.nearDupNgram]]'s (sym-diff 0), and the
      * identical-fingerprint pair count is count(documents). */
    "pipe_stream_ngram" -> ((s, dir) =>
      streamVsBatchTextPairs(s, dir, "stream_ngram",
        in => graft.streaming.DedupStreaming.nearDupNgramStream(
          in, "doc_id", "text", threshold = 1.0).toDF(),
        all => Dedup.nearDupNgram(all, "doc_id", "text", threshold = 1.0))),

    // The streaming SimHash tier, drained the same way: pairs (and the
    // deterministic hamming values) must equal the batch tier's — the
    // full-outer symmetric difference on (id_a, id_b, hamming) is pinned
    // to 0, and the identical-fingerprint pair count is closed-form.
    "pipe_stream_simhash" -> ((s, dir) => {
      val all = docsWithDups(s, dir)
      val pairs = graft.streaming.StreamDrain.availableNow(s, all, "stream_simhash",
          in => graft.streaming.DedupStreaming.nearDupSimhashStream(
            in, "doc_id", "text", maxHamming = 3).toDF())
        .dropDuplicates("id_a", "id_b")
      val fps = all.select(col("doc_id").as("id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val batchPairs = Dedup.nearDupSimhash(all, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b", "hamming")
      val symDiff = pairs.select(col("id_a"), col("id_b"), col("hamming"), lit(1).as("s"))
        .join(batchPairs.withColumn("b", lit(1)), Seq("id_a", "id_b", "hamming"), "full")
        .filter(col("s").isNull || col("b").isNull)
      pairs
        .join(fps.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(fps.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .agg(sum((col("fp_a") === col("fp_b")).cast("long")).as("n_stream_ident"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
    }),

    // The streaming embedding tier: planted exact-duplicate vectors always
    // collide (identical vectors share every sign signature), so the
    // planted-pair count is closed-form and the stream/batch pair sets are
    // identical by construction (same planes, same buckets).
    "pipe_stream_embedding" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val all = e.unionAll(
        e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      val pairs = graft.streaming.StreamDrain.availableNow(s, all, "stream_emb",
          in => graft.streaming.DedupStreaming.nearDupEmbeddingStream(
            in, "vec_id", "embedding", threshold = 0.9999).toDF())
        .dropDuplicates("id_a", "id_b")
      val batchPairs = Dedup.nearDupEmbedding(all, "vec_id", "embedding",
        threshold = 0.9999).select("id_a", "id_b")
      val symDiff = pairs.select(col("id_a"), col("id_b"), lit(1).as("s"))
        .join(batchPairs.withColumn("b", lit(1)), Seq("id_a", "id_b"), "full")
        .filter(col("s").isNull || col("b").isNull)
      pairs.filter(col("id_b") - col("id_a") === 10000)
        .agg(count(lit(1)).as("n_stream_embdup"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
    }),

    /** Streaming IMAGE near-dup twin (r13): the pipe_image_dedup fixture
      * (PNG/BMP gradient twins, injectivity cap) flows as a file-source
      * stream; features extract INSIDE the stream and feed the stateful
      * sign-LSH near-dup. Pins stream ≡ batch (sym-diff 0 against
      * [[Multimodal.nearDupImages]] — same seeded planes) and full twin
      * recall (identical feature vectors always collide). */
    "pipe_stream_image" -> ((s, dir) => {
      val all = gradImageTwins(s, dir).persist() // feeds stream AND batch twin
      val pairs = graft.streaming.StreamDrain.availableNow(s, all, "stream_img",
          in => graft.streaming.DedupStreaming.nearDupEmbeddingStream(
            in.withColumn("feat", Multimodal.imageFeatures(64)(col("img"))),
            "img_id", "feat", threshold = 0.9999).toDF())
        .dropDuplicates("id_a", "id_b")
      val batchPairs = Multimodal.nearDupImages(all, "img_id", "img",
        threshold = 0.9999).select("id_a", "id_b")
      val symDiff = pairs.select(col("id_a"), col("id_b"), lit(1).as("s"))
        .join(batchPairs.withColumn("b", lit(1)), Seq("id_a", "id_b"), "full")
        .filter(col("s").isNull || col("b").isNull)
      // the corrupt rows must be PRESENT in-band yet touch zero pairs in
      // either path (they null out at the feature stage and drop)
      val corruptPairs = pairs.select(col("id_a"), col("id_b"))
        .unionAll(batchPairs)
        .filter(col("id_a") >= 20000 || col("id_b") >= 20000)
      pairs.filter(col("id_b") - col("id_a") === 10000)
        .agg(count(lit(1)).as("n_stream_imgdup"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
        .crossJoin(all.filter(col("img_id") >= 20000)
          .agg(count(lit(1)).as("n_corrupt_in")))
        .crossJoin(corruptPairs.agg(count(lit(1)).as("n_corrupt_pairs")))
    }),

    // ------------------------------------- embedding near-dup + ANN search
    "pipe_embedding" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val withDups = e.unionAll(
        e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      val nearDup = Dedup.nearDupEmbedding(withDups, "vec_id", "embedding",
        threshold = 0.9999)
        .filter(col("id_b") - col("id_a") === 10000)
      val queries = e.filter(col("vec_id") % 10 === 0)
      val bf = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1)
      val lsh = Similarity.lshTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, bits = 8)
      val index = Similarity.trainIvf(e, "vec_id", "embedding", nlist = 16)
      val ivf = Similarity.ivfTopKIndexed(index, e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, nprobe = 2)
      // materialized store tier: build once (partitioned by cell), query
      // through the partition-pruned scan — self-retrieval stays exact.
      // The path is DETERMINISTIC so repeated bench/verify invocations
      // overwrite (buildIvfStore writes mode=overwrite) instead of
      // accumulating one fresh temp dir per run.
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_ivf_pipe_embedding").toString
      Similarity.buildIvfStore(index, e, "vec_id", "embedding", tmp + "/store")
      val stored = Similarity.ivfTopKStored(s, index, tmp + "/store",
        queries, "vec_id", "embedding", k = 1, nprobe = 2)
      // adaptive tier: occupancy-driven probe widening; self-retrieval
      // stays exact at any candidate target
      val adaptive = Similarity.ivfTopKStoredAdaptive(s, index, tmp + "/store",
        queries, "vec_id", "embedding", k = 1, minCandidates = 64, maxProbe = 8)
      // PQ tier: byte codes + ADC scan + exact re-rank; at a narrow
      // candidate budget self-retrieval is still exact (a vector's own
      // code tops its own ADC ranking)
      val pqBook = Similarity.trainPq(e, "vec_id", "embedding", m = 8, ksub = 32)
      val pqCodes = Similarity.encodePq(pqBook, e, "vec_id", "embedding")
      val pq = Similarity.pqTopKReranked(pqBook, pqCodes, e, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 1, candidates = 16)
      // composed IVF-PQ store: cell-pruned ADC scan + candidate re-rank
      Similarity.buildIvfPqStore(index, pqBook, e, "vec_id", "embedding",
        tmp + "/pqstore")
      val ivfpq = Similarity.ivfPqTopKStored(s, index, pqBook, tmp + "/pqstore",
        queries, "vec_id", "embedding", k = 1, nprobe = 2, candidates = 16)
      // r15 guard twin (VERDICT r14 #4): past the pushdown ceiling the
      // candidate-id row-group hint is skipped — the answer must be
      // IDENTICAL, pinned by the external oracle, not just a spec
      val ivfpqNoHint = Similarity.ivfPqTopKStored(s, index, pqBook,
        tmp + "/pqstore", queries, "vec_id", "embedding", k = 1, nprobe = 2,
        candidates = 16, maxPushdownIds = 0L)
      // ONE action for the multiset equality (two exceptAll actions
      // would re-execute both ANN pipelines twice — review r15 #6):
      // signed per-row counts cancel to zero exactly when equal
      val guardEq = ivfpq.select("query_id", "rank", "corpus_id")
        .withColumn("__src", lit(1))
        .unionByName(ivfpqNoHint.select("query_id", "rank", "corpus_id")
          .withColumn("__src", lit(-1)))
        .groupBy("query_id", "rank", "corpus_id")
        .agg(sum(col("__src")).as("__d"))
        .filter(col("__d") =!= 0).isEmpty
      // OPQ tier: learned rotation (eigenvalue-allocation init + Procrustes
      // alternation) before 4-bit packed codes; self-retrieval is exact
      // (rotation is orthogonal — a vector's rotated code still tops its
      // own rotated ADC table)
      val opqModel = Similarity.trainOpq(e, "vec_id", "embedding", m = 8,
        ksub = 16, opqIters = 4)
      val opqCodes = Similarity.encodePq(opqModel.book, e, "vec_id",
        "embedding", packed = true, rotation = Some(opqModel.rotation))
      val opq = Similarity.pqTopKReranked(opqModel.book, opqCodes, e, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 1, candidates = 16,
        packed = true, rotation = Some(opqModel.rotation))
      nearDup.agg(count(lit(1)).as("n_embdup"))
        .crossJoin(bf.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_bf_self")))
        .crossJoin(lsh.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_lsh_self")))
        .crossJoin(ivf.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_ivf_self")))
        .crossJoin(stored.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_ivfstore_self")))
        .crossJoin(adaptive.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_ivfadapt_self")))
        .crossJoin(pq.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_pq_self")))
        .crossJoin(ivfpq.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_ivfpq_self")))
        .crossJoin(opq.agg(
          sum((col("query_id") === col("corpus_id")).cast("long")).as("n_opq_self")))
        .withColumn("ivfpq_guard_eq", lit(guardEq))
    }),

    // SemDeDup-style semantic deduplication over planted exact twins:
    // every base embedding gets an identical twin at id+10000, so every
    // twin pair MUST share a component and exactly one of each pair may
    // survive; the remaining columns pin the representative rule (lowest
    // centroid cosine, ties to smaller id) and that no two survivors in
    // one cell are still near-dups — all Spark-side math the oracle can
    // assert as exact counts/booleans.
    "pipe_semdedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val withDups = e.unionAll(
        e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      val index = Similarity.trainIvf(e, "vec_id", "embedding", nlist = 16)
      val sd = Similarity.semDedup(withDups, "vec_id", "embedding", index,
        threshold = 0.95).localCheckpoint(true)
      val base = sd.filter(col("id") < 10000)
        .select(col("id"), col("component").as("c0"), col("kept").as("k0"))
      val twin = sd.filter(col("id") >= 10000)
        .select((col("id") - 10000).as("id"), col("component").as("c1"),
          col("kept").as("k1"))
      val tj = base.join(twin, Seq("id"))
      // per-component survivor census
      val perComp = sd.groupBy(col("component"))
        .agg(sum(col("kept").cast("long")).as("nk"))
      // representative rule: the kept id must be each component's
      // lexicographic min of (centroid_cos, id)
      val want = sd.groupBy(col("component"))
        .agg(min_by(col("id"), struct(col("centroid_cos"), col("id")))
          .as("want_id"))
      val repOk = sd.filter(col("kept")).join(want, Seq("component"))
        .agg((count(lit(1)) ===
          sum((col("id") === col("want_id")).cast("long"))).as("rep_rule_ok"))
      // survivors in the same cell must be genuinely separated
      val keptVec = sd.filter(col("kept")).select(col("id"), col("cell"))
        .join(withDups.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
      val lk = keptVec.select(col("cell"), col("id").as("ia"),
        col("embedding").cast("array<double>").as("va"))
      val rk = keptVec.select(col("cell"), col("id").as("ib"),
        col("embedding").cast("array<double>").as("vb"))
      val nearKept = lk.join(rk, Seq("cell")).filter(col("ia") < col("ib"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= 0.95)
      sd.agg(count(lit(1)).as("n_rows"))
        .crossJoin(tj.agg(
          sum((col("c0") === col("c1")).cast("long")).as("n_twin_same_comp"),
          sum((col("k0") && col("k1")).cast("long")).as("n_both_twins_kept")))
        .crossJoin(perComp.agg(
          (min(col("nk")) === 1 && max(col("nk")) === 1).as("comp_one_kept_ok")))
        .crossJoin(repOk)
        .crossJoin(nearKept.agg(count(lit(1)).as("n_kept_near_pairs")))
    }),

    // ------------------------------------------------ multimodal plumbing
    // Meta comes from the header fast path on a pixel-less IHDR fixture;
    // FEATURES come from a real decodable image (the header-only fixture
    // honestly yields null features — pinned by hdr_feat_null — because
    // the full decoder refuses truncated streams instead of fabricating).
    "pipe_multimodal" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("png", Multimodal.makePngHeader(
          (lit(64) + col("doc_id") % 256).cast("int"),
          (lit(32) + col("doc_id") % 128).cast("int")))
        .withColumn("real", Multimodal.makeImage(lit(16), lit(8),
          (col("doc_id") % 256).cast("int"),
          (col("doc_id") * 7 % 256).cast("int"),
          (col("doc_id") * 13 % 256).cast("int"), lit("png")))
      val decoded = d.withColumn("img", Multimodal.decodeImage(col("png")))
      val feat = Multimodal.withImageFeatures(d, "real", featureDim = 64)
      // WAV: 1 channel, 16 kHz, 16-bit, payload (doc_id%100+1) * 32000 bytes
      // → duration exactly (doc_id%100+1) seconds
      val wav = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("wav", Multimodal.makeWavHeader(
          lit(1), lit(16000), lit(16),
          ((col("doc_id") % 100 + 1) * 32000).cast("int")))
        .withColumn("au", Multimodal.decodeAudio(col("wav")))
        .select(col("doc_id"),
          col("au._1").as("au_channels"),
          col("au._2").as("au_rate"),
          col("au._4").as("au_ms"))
      decoded.select(col("doc_id"),
        col("img._1").as("width"),
        col("img._2").as("height"),
        col("img._3").as("channels"),
        col("img._4").as("fmt"),
        Multimodal.imageFeatures(64)(col("png")).isNull.as("hdr_feat_null"))
        .join(feat.select(col("doc_id"), size(col("features")).as("n_feat"),
          col("image_meta.width").as("real_w"),
          col("image_meta.height").as("real_h")), "doc_id")
        .join(wav, "doc_id")
        .orderBy(col("doc_id"))
    }),

    /** Closed-form oracle for [[Multimodal.imageFeatures]] (the REAL
      * pixel-space embedding): on a solid-color image every pooled grid
      * cell is exactly (r,g,b)/255 and the grayscale histogram is one-hot
      * at bucket ⌊⌊(r+g+b)/3⌋/16⌋ with value 1.0 (= nPix/nPix). Also pins
      * RE-ENCODING stability — the property byte-hash fakes cannot have:
      * the same raster as PNG and BMP (both lossless) yields IDENTICAL
      * feature vectors. */
    "pipe_multimodal_feat" -> ((s, dir) => {
      val gray = floor((col("r") + col("g") + col("b")) / 3)
      val bucket = floor(gray / 16)
      val d = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("r", (col("doc_id") % 256).cast("int"))
        .withColumn("g", (col("doc_id") * 7 % 256).cast("int"))
        .withColumn("b", (col("doc_id") * 13 % 256).cast("int"))
        .withColumn("png", Multimodal.makeImage(lit(20), lit(12),
          col("r"), col("g"), col("b"), lit("png")))
        .withColumn("bmp", Multimodal.makeImage(lit(20), lit(12),
          col("r"), col("g"), col("b"), lit("bmp")))
        .withColumn("feat", Multimodal.imageFeatures(64)(col("png")))
        .withColumn("featb", Multimodal.imageFeatures(64)(col("bmp")))
      d.select(col("doc_id"),
        size(col("feat")).as("n_feat"),
        (abs(element_at(col("feat"), 1) - col("r") / 255.0) < 1e-6).as("grid_r_ok"),
        (abs(element_at(col("feat"), 2) - col("g") / 255.0) < 1e-6).as("grid_g_ok"),
        (abs(element_at(col("feat"), 3) - col("b") / 255.0) < 1e-6).as("grid_b_ok"),
        (abs(element_at(col("feat"), 48) - col("b") / 255.0) < 1e-6).as("grid_last_ok"),
        (element_at(col("feat"), (lit(49) + bucket).cast("int")) === lit(1.0))
          .as("hist_onehot_ok"),
        (col("feat") === col("featb")).as("png_bmp_eq"))
        .orderBy(col("doc_id"))
    }),

    /** End-to-end IMAGE near-dup (r13): per-doc gradient rasters encoded
      * as PNG (id) and BMP (id+10000) — the same pixels through two
      * lossless codecs — run through the full distributed path
      * ([[Multimodal.nearDupImages]]: pixel features → sign-LSH buckets →
      * exact-cosine verify). Every twin pair MUST surface (identical
      * rasters → identical features → same LSH signature in every table,
      * cosine 1), and no cross-doc pair reaches the 0.9999 bar (distinct
      * frequency triples per doc). */
    "pipe_image_dedup" -> ((s, dir) => {
      val pairs = Multimodal.nearDupImages(
        gradImageTwins(s, dir), "img_id", "img", threshold = 0.9999)
      pairs.agg(
        sum((col("id_b") - col("id_a") === 10000).cast("long")).as("n_twins"),
        sum((col("id_b") - col("id_a") =!= 10000).cast("long")).as("n_cross"),
        (min(col("cosine")) > 0.99999999).as("twin_cos_one"))
    }),

    /** End-to-end VIDEO near-dup (r13): per-doc gradient MJPEG AVIs
      * (wrap-free low frequencies — distinct pooled features per triple)
      * and their REAL transcodes (decode → re-encode → re-mux,
      * [[Multimodal.transcodeMjpegAvi]]) through
      * [[Multimodal.nearDupVideos]] (sampled frames → pooled pixel
      * features → sign-LSH buckets → exact-cosine verify). Margins
      * measured by probe: twins ≥ 0.99981, worst cross ≤ 0.99919 —
      * threshold 0.9995 separates deterministically (seeded LSH planes,
      * deterministic fixtures). */
    "pipe_video_dedup" -> ((s, dir) => {
      val pairs = Multimodal.nearDupVideos(gradVideoTwins(s, dir),
        "vid_id", "avi", threshold = 0.9995, nFrames = 3)
      pairs.agg(
        sum((col("id_b") - col("id_a") === 10000).cast("long")).as("n_twins"),
        sum((col("id_b") - col("id_a") =!= 10000).cast("long")).as("n_cross"))
    }),

    /** Streaming VIDEO near-dup twin (r13): the pipe_video_dedup fixture
      * as a file-source stream — frame sampling, per-frame decode and
      * temporal pooling all run INSIDE the stream — into the stateful
      * sign-LSH near-dup. Stream ≡ batch (same seeded planes → identical
      * candidate sets → sym-diff 0) and full transcode-twin recall at
      * the probe-measured 0.9995 margin. */
    "pipe_stream_video" -> ((s, dir) => {
      // persist: the fixture's encode→transcode chain is the costliest
      // UDF work in the suite and feeds BOTH the stream drain and the
      // batch twin (≤512 tiny rows — bounded by the injectivity cap)
      val all = gradVideoTwins(s, dir).persist()
      val pairs = graft.streaming.StreamDrain.availableNow(s, all, "stream_vid",
          in => graft.streaming.DedupStreaming.nearDupEmbeddingStream(
            in.withColumn("feat", Multimodal.videoFeatures(64, 3)(col("avi"))),
            "vid_id", "feat", threshold = 0.9995).toDF())
        .dropDuplicates("id_a", "id_b")
      val batchPairs = Multimodal.nearDupVideos(all, "vid_id", "avi",
        threshold = 0.9995, nFrames = 3).select("id_a", "id_b")
      val symDiff = pairs.select(col("id_a"), col("id_b"), lit(1).as("s"))
        .join(batchPairs.withColumn("b", lit(1)), Seq("id_a", "id_b"), "full")
        .filter(col("s").isNull || col("b").isNull)
      // same in-band corrupt-media contract as the image twin
      val corruptPairs = pairs.select(col("id_a"), col("id_b"))
        .unionAll(batchPairs)
        .filter(col("id_a") >= 20000 || col("id_b") >= 20000)
      pairs.filter(col("id_b") - col("id_a") === 10000)
        .agg(count(lit(1)).as("n_stream_viddup"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
        .crossJoin(all.filter(col("vid_id") >= 20000)
          .agg(count(lit(1)).as("n_corrupt_in")))
        .crossJoin(corruptPairs.agg(count(lit(1)).as("n_corrupt_pairs")))
    }),

    /** REAL pixel plane (JDK ImageIO + PCM): solid-color fixtures make
      * every statistic closed-form — decode dims, channel means v/255,
      * resize round trip, 2×2 thumbnail features, constant-PCM rms/peak/
      * mean = amp/2¹⁵ exactly. */
    "pipe_multimodal_px" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("w", (lit(16) + (col("doc_id") % 8) * 2).cast("int"))
        .withColumn("h", (lit(8) + (col("doc_id") % 4) * 2).cast("int"))
        .withColumn("r", (col("doc_id") % 256).cast("int"))
        .withColumn("g", (col("doc_id") * 7 % 256).cast("int"))
        .withColumn("b", (col("doc_id") * 13 % 256).cast("int"))
        .withColumn("png", Multimodal.makeImage(col("w"), col("h"),
          col("r"), col("g"), col("b"), lit("png")))
        .withColumn("jpg", Multimodal.makeImage(col("w"), col("h"),
          col("r"), col("g"), col("b"), lit("jpg")))
      val img = d
        .withColumn("px", Multimodal.decodePixels(col("png")))
        .withColumn("jx", Multimodal.decodePixels(col("jpg")))
        .withColumn("means", Multimodal.channelMeans(col("png")))
        .withColumn("rs", Multimodal.resizeImage(col("png"),
          (col("w") / 2).cast("int"), (col("h") / 2).cast("int")))
        .withColumn("px2", Multimodal.decodePixels(col("rs")))
        .withColumn("feat", Multimodal.extractImageFeatures(2)(col("png")))
      val wav = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("amp", (lit(500) + col("doc_id") % 1000).cast("int"))
        .withColumn("wav", Multimodal.makeWavConst(lit(1600), lit(16000), col("amp")))
        .withColumn("st", Multimodal.audioStats(col("wav")))
        .withColumn("au", Multimodal.decodeAudio(col("wav")))
        .select(col("doc_id"),
          col("st._1").as("rms"), col("st._2").as("peak"), col("st._3").as("mean_s"),
          col("au._4").as("au_ms"))
      img.select(col("doc_id"),
        col("px._1").as("width"), col("px._2").as("height"),
        col("px._3").as("channels"),
        col("jx._1").as("jpg_w"), col("jx._2").as("jpg_h"),
        element_at(col("means"), 1).as("mean_r"),
        element_at(col("means"), 2).as("mean_g"),
        element_at(col("means"), 3).as("mean_b"),
        col("px2._1").as("rw"), col("px2._2").as("rh"),
        size(col("feat")).as("n_feat"),
        element_at(col("feat"), 1).as("feat_r"))
        .join(wav, "doc_id")
        .orderBy(col("doc_id"))
    }),

    /** REAL spectral audio plane (r9): per-doc sine WAVs at BIN-ALIGNED
      * frequencies (f = m·rate/frameSize) through the in-repo radix-2
      * FFT — the dominant bin is exact and SQL-computable; centroid/
      * zcr/rms land within analytic tolerances (Hann leakage symmetric,
      * rms of A·sin = A/√2). */
    "pipe_audio" -> ((s, dir) => {
      val rate = 8192
      val d = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("freq",
          ((lit(64) + col("doc_id") % 8 * 16) * 8).cast("double"))
        .withColumn("wav", Multimodal.makeWavSine(lit(rate), lit(rate),
          col("freq"), lit(12000)))
        .withColumn("sp", Multimodal.audioSpectral(1024)(col("wav")))
      d.select(col("doc_id"),
        col("sp.dominantHz").as("dominant_hz"),
        col("sp.durationSec").as("dur_sec"),
        (abs(col("sp.centroidHz") - col("freq")) < 4.0).as("cent_ok"),
        (abs(col("sp.zcrHz") - col("freq")) < 2.0).as("zcr_ok"),
        (abs(col("sp.rms") - lit(12000.0 / 32768.0 / math.sqrt(2.0))) < 1e-4)
          .as("rms_ok"),
        (col("sp.bandwidthHz") < 20.0).as("bw_ok"))
        .orderBy(col("doc_id"))
    }),

    /** Streaming spectral audio (r10): pipe_audio's sine WAVs get event
      * timestamps and run through the SAME windowed spectral plan
      * ([[graft.streaming.MultimodalStreaming.spectralWindowed]]) as a
      * file-source stream (AvailableNow → append memory sink) AND as a
      * batch frame. A far-future sentinel row pushes the watermark past
      * every real window so append mode flushes them (the no-data
      * microbatch evicts closed windows); the sentinel's own window is
      * excluded on both sides. Pins: batch ≡ stream (full-outer sym-diff
      * on (win, n, sum) MUST be 0 — dominant sums are integer-valued
      * doubles, so order-independent) and the closed-form per-window
      * counts/sums against DuckDB. */
    "pipe_stream_audio" -> ((s, dir) => {
      val rate = 8192
      val epoch = 1767225600L // 2026-01-01 00:00:00 UTC, 4-min aligned
      val base = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("freq",
          ((lit(64) + col("doc_id") % 8 * 16) * 8).cast("double"))
        .withColumn("wav", Multimodal.makeWavSine(lit(rate), lit(rate),
          col("freq"), lit(12000)))
        .withColumn("ts", timestamp_seconds(lit(epoch) + (col("doc_id") % 16) * 60))
        .drop("freq")
      val sentinelTs = epoch + 86400L
      val sentinel = s.range(1)
        .select(lit(-1L).as("doc_id"), lit(null).cast("binary").as("wav"),
          timestamp_seconds(lit(sentinelTs)).as("ts"))
      val all = base.unionByName(sentinel)
      val got = graft.streaming.StreamDrain.availableNow(s, all, "stream_audio",
          in => graft.streaming.MultimodalStreaming.spectralWindowed(
            in, "wav", "ts", "4 minutes"))
        .filter(col("win_start") < timestamp_seconds(lit(sentinelTs)))
      val batch = graft.streaming.MultimodalStreaming.spectralWindowed(
        base, "wav", "ts", "4 minutes")
      val symDiff = got
        .select(col("win_start"), col("n"), col("sum_dominant_hz"), lit(1).as("s"))
        .join(batch.select(col("win_start"), col("n"), col("sum_dominant_hz"))
          .withColumn("b", lit(1)),
          Seq("win_start", "n", "sum_dominant_hz"), "full")
        .filter(col("s").isNull || col("b").isNull)
      got.select(minute(col("win_start")).as("win_min"), col("n").as("n_docs"),
          col("sum_dominant_hz"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
        .orderBy(col("win_min"))
    }),

    // REAL video plane: MJPEG AVI built frame-by-frame through the JDK JPEG
    // encoder, then header decode (RIFF walk), evenly-spaced frame sampling
    // and per-frame pixel decode. Frame 0 is grey r0; sampled frame 1 is
    // stream frame 2 (floor(1·6/3)) at grey r0+16; JPEG is lossy so channel
    // means are tolerance booleans, structure fields are exact.
    "pipe_video" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("r0", (col("doc_id") % 200).cast("int"))
        .withColumn("avi", Multimodal.makeMjpegAvi(lit(16), lit(16), lit(6),
          col("r0"), col("r0"), col("r0"), lit(8)))
      d.withColumn("meta", Multimodal.decodeVideo(col("avi")))
        .withColumn("frames", Multimodal.frameSample(3)(col("avi")))
        .withColumn("px0", Multimodal.decodePixels(element_at(col("frames"), 1)))
        .withColumn("m0", Multimodal.channelMeans(element_at(col("frames"), 1)))
        .withColumn("m1", Multimodal.channelMeans(element_at(col("frames"), 2)))
        .select(col("doc_id"),
          col("meta._1").as("vw"), col("meta._2").as("vh"),
          col("meta._3").as("n_frames"), col("meta._4").as("fps"),
          size(col("frames")).as("n_sampled"),
          col("px0._1").as("f0_w"), col("px0._2").as("f0_h"),
          col("px0._3").as("f0_ch"),
          (abs(element_at(col("m0"), 1) * 255 - col("r0")) < 3).as("f0_r_ok"),
          (abs(element_at(col("m1"), 1) * 255 - (col("r0") + lit(16))) < 3)
            .as("f1_r_ok"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------- dataset curation
    // Deterministic content-addressed train/val/test split: the md5-bucket
    // expression is mirrored verbatim in DuckDB, so per-split counts and
    // id-sums are exact (not tolerance booleans).
    "pipe_split" -> ((s, dir) => {
      Curation.withSplit(t(s, dir, "documents"), "doc_id",
          salt = "s1", fracTrain = 0.8, fracVal = 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // Token-budget sequence packing within each source group: shard id and
    // in-shard offset from a windowed cumulative sum, mirrored by the same
    // window in DuckDB.
    "pipe_pack" -> ((s, dir) => {
      Curation.packShards(t(s, dir, "documents"),
          groupCol = "source", orderCol = "doc_id", tokenCol = "n_chars",
          budget = 2048)
        .groupBy(col("source"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          min(col("shard_offset")).as("first_off"))
        .orderBy(col("source"), col("shard"))
    }),

    // --------------------------------------- near-dup pair clustering
    // Two component graphs with closed-form answers: (1) chain edges
    // (doc_id, doc_id+1) within each 5-block — a path graph, so the
    // large-star/small-star transitive closure is actually exercised
    // (pairwise dedup would NOT produce these labels); component =
    // doc_id - doc_id%5. (2) the full minhash→verify→cluster→survivor
    // pipeline over documents ∪ two id-shifted copies: every text exactly
    // 3×, so clusters are triples rooted at the original id.
    "pipe_cluster" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      val edges = d.filter(col("doc_id") % 5 =!= 4)
        .join(d.select(col("doc_id").as("b")), col("doc_id") + 1 === col("b"))
        .select(col("doc_id").as("a"), col("b"))
      val chain = Dedup.connectedComponents(edges, "a", "b")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val all3 = docs
        .unionAll(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionAll(docs.select((col("doc_id") + 20000).as("doc_id"), col("text")))
      // shingleK=12: with the default 5-char shingles, two sf0.001 docs
      // differing only in a trailing repeated token have IDENTICAL shingle
      // sets (the tail adds no new 5-grams), so char-5-gram Jaccard is
      // genuinely 1.0 and they'd merge — correct for the operator, but the
      // oracle asserts copies-only clusters. Longer shingles see the tail.
      val clusters = Dedup.clusterNearMinhash(all3, "doc_id", "text",
        threshold = 1.0, shingleK = 12)
      val surv = Dedup.dedupNearMinhash(all3, "doc_id", "text",
        threshold = 1.0, shingleK = 12)
      chain.agg(count(lit(1)).as("n_nodes"),
          countDistinct(col("component")).as("n_chain_comps"),
          sum(col("component")).as("chain_comp_sum"))
        .crossJoin(clusters.agg(
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("cluster")).as("cluster_sum")))
        .crossJoin(surv.agg(count(lit(1)).as("n_survivors"),
          sum(col("doc_id")).as("survivor_id_sum")))
    }),

    // ----------------------------------- cross-doc duplicated substrings
    // Exact-substring dedup signal: every 10th document gets an id-shifted
    // copy, so those documents' token 8-grams occur in two docs and the
    // per-doc duplicated-position counts are mirrored gram-for-gram by the
    // DuckDB oracle (strings there, xxhash64 here — counts agree absent a
    // 64-bit collision).
    "pipe_crossdup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val aug = docs.unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.crossDocGramStats(aug, "doc_id", "text", n = 8)
        .orderBy(col("id"))
    }),

    // Exact-substring REMOVAL: with every 10th document duplicated, the
    // original (smaller id) owns every shared run and must come back
    // unchanged while its copy strips to empty; the oracle mirrors the
    // owner/span computation over gram STRINGS in DuckDB and compares
    // the full rebuilt text of all 550 documents.
    "pipe_strip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val aug = docs.unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.stripCrossDocDuplicates(aug, "doc_id", "text", n = 8)
        .orderBy(col("id"))
    }),

    // --------------------------------------------- decontamination
    // Benchmark set = every 50th document; the oracle recomputes the same
    // normalized-token 8-gram overlap in DuckDB (no closed form needed).
    "pipe_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      val contam = Dedup.contaminated(docs, "doc_id", "text", bench, "text", n = 8)
      val clean = Dedup.decontaminate(docs, "doc_id", "text", bench, "text", n = 8)
      contam.agg(count(lit(1)).as("n_contam"))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean"),
          sum(col("doc_id")).as("clean_id_sum")))
    }),

    /** The decontamination tier of the persistent index family (r17):
      * the SAME fixture and oracle SQL as pipe_decontam, but the eval
      * grams come from a [[Dedup.writeDecontamStore]] table (hash-only,
      * broadcast at join time) instead of a per-call bench pass — the
      * store door must reproduce the direct door's answer exactly. */
    "pipe_decontam_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      graft.join.SpatialJoin.dropBucketedTable(s, "graft_q_dc_store")
      Dedup.writeDecontamStore(bench, "graft_q_dc_store", n = 8)
      val contam = Dedup.contaminatedAgainstStore(s, docs, "doc_id", "text",
        "graft_q_dc_store")
      val clean = Dedup.decontaminateAgainstStore(s, docs, "doc_id", "text",
        "graft_q_dc_store")
      contam.agg(count(lit(1)).as("n_contam"))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean"),
          sum(col("doc_id")).as("clean_id_sum")))
    }),

    /** The STREAMING door of the decontamination tier (r18): the door
      * is stateless (stamped eval grams broadcast per micro-batch), so
      * stream ≡ batch row-for-row. The drain appends each batch's clean
      * rows to parquet (materialized to storage before the temp dir can
      * go), the stream-vs-batch symmetric difference is pinned to zero
      * in-query, and the clean count/id-sum reuse pipe_decontam's
      * DuckDB oracle. */
    "pipe_stream_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      graft.join.SpatialJoin.dropBucketedTable(s, "graft_q_dcs_store")
      Dedup.writeDecontamStore(bench, "graft_q_dcs_store", n = 8)
      val tmp = java.nio.file.Files.createTempDirectory("graft_dcs_q").toString
      val clean = try {
        docs.repartition(4).write.mode("overwrite").parquet(tmp + "/in")
        val streamIn = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp + "/in")
        val q = graft.streaming.DedupStreaming.decontamStoreStream(
            streamIn, "graft_q_dcs_store") { (cleanBatch, _) =>
            cleanBatch.write.mode("append").parquet(tmp + "/out")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", tmp + "/ck")
          .start()
        // stop the query on the timeout path too: the finally below
        // deletes the input/checkpoint dirs, and a still-running stream
        // would error against the missing paths for the session's rest
        val drained = try q.awaitTermination(600000)
          finally { if (q.isActive) q.stop() }
        require(drained, "pipe_stream_decontam drain timed out")
        // snapshot off the temp files (eager) so the dir can be deleted
        s.read.parquet(tmp + "/out").select(col("doc_id")).localCheckpoint()
      } finally {
        try org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(tmp))
        catch { case scala.util.control.NonFatal(_) => () }
      }
      val batchClean = Dedup.decontaminateAgainstStore(s, docs, "doc_id",
        "text", "graft_q_dcs_store").select(col("doc_id"))
      val symDiff = clean.withColumn("s", lit(1))
        .join(batchClean.withColumn("b", lit(1)), Seq("doc_id"), "full")
        .filter(col("s").isNull || col("b").isNull)
      clean.agg(count(lit(1)).as("n_clean"),
          sum(col("doc_id")).as("clean_id_sum"))
        .crossJoin(symDiff.agg(count(lit(1)).as("n_sym_diff")))
    }),

    /** The STREAMING INGEST LOOP (r18): three micro-batches through
      * [[graft.streaming.DedupStreaming.minhashIngestStream]] against a
      * persistent index — batch 0 is the dup half (every row filtered
      * against the corpus), batch 1 the md5-novel half (every row
      * accepted AND appended), batch 2 a re-dup of batch 1's rows
      * (ids +10000) — filtered ONLY because batch 1's accepted rows
      * were folded into the index, i.e. the cross-batch contract is
      * what this row pins. Closed form: accepted = count(documents),
      * their id sum = sum(doc_id) + 20000·count, and the index ends at
      * 2·count distinct docs (corpus + accepted). */
    "pipe_stream_ingest" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val novelHalf = corpus.select((col("doc_id") + 20000).as("doc_id"),
        concat(md5(concat(lit("i1-"), col("doc_id"))), lit(" "),
          md5(concat(lit("i2-"), col("doc_id")))).as("text"))
      Dedup.dropMinhashStore(s, "graft_q_ingest_store")
      Dedup.writeMinhashStore(corpus, "graft_q_ingest_store")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_q").toString
      val accepted = try {
        Seq(
          corpus.select((col("doc_id") + 10000).as("doc_id"), col("text")),
          novelHalf,
          novelHalf.select((col("doc_id") + 10000).as("doc_id"), col("text"))
        ).zipWithIndex.foreach { case (b, i) =>
          b.repartition(1).write.mode("overwrite").parquet(tmp + s"/in/b=$i")
        }
        // the file source orders micro-batches by file TIMESTAMP, and
        // the three writes land within the same clock tick — stamp
        // strictly increasing mtimes so the cross-batch order (dups
        // after their originals) is deterministic
        val base = new java.io.File(tmp + "/in/b=0").lastModified()
        (0 to 2).foreach { i =>
          new java.io.File(tmp + s"/in/b=$i").listFiles()
            .foreach(_.setLastModified(base - (20 - i) * 60000L))
        }
        val streamIn = s.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp + "/in/b=*")
        val q = graft.streaming.DedupStreaming.minhashIngestStream(
            streamIn, "graft_q_ingest_store", threshold = 0.8) { (novel, _) =>
            novel.write.mode("append").parquet(tmp + "/out")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", tmp + "/ck")
          .start()
        val drained = try q.awaitTermination(600000)
          finally { if (q.isActive) q.stop() }
        require(drained, "pipe_stream_ingest drain timed out")
        s.read.parquet(tmp + "/out").select(col("doc_id")).localCheckpoint()
      } finally {
        try org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(tmp))
        catch { case scala.util.control.NonFatal(_) => () }
      }
      val indexDocs = s.table(
          "graft_q_ingest_store" + Dedup.MinhashSigTableSuffix)
        .select(col("id")).distinct()
      accepted.agg(count(lit(1)).as("n_accepted"),
          sum(col("doc_id")).as("accepted_id_sum"))
        .crossJoin(indexDocs.agg(count(lit(1)).as("n_index_docs")))
    }),

    // ---------------------------------- repetition signals (Gopher-style)
    "pipe_text2" -> ((s, dir) => {
      val txt = col("text")
      val base = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.dupLineFrac(txt).as("dlf"),
        TextAnalysis.dupLineCharFrac(txt).as("dlcf"))
      val top2 = TextAnalysis.topNgramCharCoverage(
        t(s, dir, "documents"), "doc_id", "text", n = 2)
        .withColumnRenamed("id", "doc_id").withColumnRenamed("top_frac", "top2")
      base.join(top2, "doc_id").orderBy(col("doc_id"))
    }),

    // Published document-quality filters: Gopher Table A1 (symbol ratio,
    // bullet/ellipsis line fractions, alpha-word ratio, required stop
    // words, combined keep) and the C4 line rules (terminal punctuation +
    // minimum words, boilerplate flags). All closed-form — the oracle
    // recomputes each signal in DuckDB SQL with the same expression
    // shapes, so doubles hash-match bit-for-bit.
    "pipe_text3" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.symbolToWordRatio(txt).as("sym_ratio"),
        TextAnalysis.bulletLineFrac(txt).as("bullet_frac"),
        TextAnalysis.ellipsisLineFrac(txt).as("ellipsis_frac"),
        TextAnalysis.alphaWordRatio(txt).as("alpha_word"),
        TextAnalysis.requiredStopwordCount(txt).cast("long").as("req_stop"),
        TextAnalysis.dupParagraphFrac(txt).as("dup_para"),
        TextAnalysis.gopherKeep(txt).as("keep"),
        length(TextAnalysis.c4KeepLines(txt)).as("c4_len"),
        TextAnalysis.c4HasLoremIpsum(txt).as("c4_lorem"),
        TextAnalysis.c4HasCurlyBrace(txt).as("c4_brace"))
        .orderBy(col("doc_id"))
    }),

    // Stratified deterministic down-sampling by language (en 50%, zh 20%,
    // others kept), same md5 bucket as the split but a different salt.
    "pipe_sample" -> ((s, dir) => {
      Curation.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
          fracs = Map("en" -> 0.5, "zh" -> 0.2), defaultFrac = 1.0, salt = "s2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    }),

    // URL canonicalization + URL-keyed dedup: the oracle is CLOSED-FORM
    // (the expected canonical string is constructed directly, not by
    // mirroring the regexes) — planted messy URLs (uppercase host,
    // default port, tracking params) must collapse to it, and a noisy
    // variant per doc must dedup to one canonical per document.
    "pipe_url" -> ((s, dir) => {
      import graft.pipeline.Scrub
      val m7 = (col("doc_id") % 7).cast("string")
      val m5 = (col("doc_id") % 5).cast("string")
      val id = col("doc_id").cast("string")
      val messy = concat(lit("HTTPS://Site"), m7, lit(".Example.ORG:443/p"), m5,
        lit("?utm_source=a&id="), id, lit("&gclid=b#frag"))
      val variant = concat(lit("https://SITE"), m7, lit(".EXAMPLE.ORG/p"), m5,
        lit("?id="), id, lit("&utm_x=9"))
      val d = t(s, dir, "documents").select(col("doc_id"),
        Scrub.canonicalUrl(messy).as("canon"),
        Scrub.canonicalUrl(variant).as("canon2"))
      d.select(col("doc_id"), col("canon"),
          (col("canon") === col("canon2")).as("variant_eq"))
        .crossJoin(d.select(explode(array(col("canon"), col("canon2"))).as("c"))
          .agg(countDistinct(col("c")).as("n_unique")))
        .orderBy(col("doc_id"))
    }),

    // Per-key cap (domain balancing): at most 20 docs per source, chosen
    // by the salted md5 order mirrored exactly in DuckDB.
    "pipe_cap" -> ((s, dir) => {
      Curation.capPerKey(t(s, dir, "documents"), "source", "doc_id",
          n = 20, salt = "c1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))
    }),

    // ------------------------------------ PII scrubbing / URL hygiene
    // The synthetic documents carry no PII, so the query plants one
    // deterministic email / URL / IPv4 / phone per row; the oracle runs
    // the same regexes (Java-regex/RE2 common subset) over the same
    // augmented text in DuckDB.
    "pipe_pii" -> ((s, dir) => {
      import graft.pipeline.Scrub
      val id = col("doc_id").cast("string")
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" Contact user"), id, lit("@example.com or visit https://site"),
          (col("doc_id") % 7).cast("string"), lit(".example.org/p?id="), id,
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"),
          lit(" or call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      val unblocked = Scrub.filterBlockedDomains(aug, "text",
        Seq("site3.example.org", "site5.example.org"))
      aug.select(col("doc_id"),
          Scrub.emailCount(col("text")).cast("long").as("n_email"),
          Scrub.urlCount(col("text")).cast("long").as("n_url"),
          Scrub.ipv4Count(col("text")).cast("long").as("n_ip"),
          Scrub.phoneCount(col("text")).cast("long").as("n_phone"),
          length(Scrub.redactPii(col("text"))).cast("long").as("redacted_len"),
          array_join(Scrub.urlDomains(col("text")), ",").as("domains"))
        .crossJoin(unblocked.agg(count(lit(1)).as("n_unblocked")))
        .orderBy(col("doc_id"))
    })
  )

  /** DuckDB mirrors. The text-stat expressions replicate the Spark
    * expression tree operation by operation (same regex, same left-assoc
    * arithmetic) so double outputs are bit-identical. */
  val oracleSql: Map[String, String] = Map(
    "pipe_pii" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com or visit https://site' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.example.org/p?id=' || CAST(doc_id AS VARCHAR)
        |    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |    || CAST((doc_id * 7) % 256 AS VARCHAR)
        |    || ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents),
        |s AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text, '(?i:https?)://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+')) AS n_url,
        |  len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip,
        |  len(regexp_extract_all(text, '\+[0-9]{1,3}([-. ][0-9]{2,5}){1,4}|\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
        |  length(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{1,3}([-. ][0-9]{2,5}){1,4}|\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')) AS redacted_len,
        |  list_transform(regexp_extract_all(text, '(?i:https?)://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+'),
        |    u -> lower(regexp_extract(u, '(?i:https?)://([^/:?#]+)', 1))) AS dlist
        |  FROM aug)
        |SELECT doc_id, n_email, n_url, n_ip, n_phone, redacted_len,
        |  array_to_string(dlist, ',') AS domains,
        |  (SELECT count(*) FROM s s2
        |    WHERE NOT list_has_any(s2.dlist, ['site3.example.org', 'site5.example.org']))
        |    AS n_unblocked
        |FROM s ORDER BY doc_id""".stripMargin,
    "pipe_text" ->
      """WITH s AS (SELECT doc_id, text,
        |  len(regexp_extract_all(text, '\S+')) AS n_tok,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        |  length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
        |  length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_ws,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|with|a)\b')) AS sw_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|ein|nicht|zu)\b')) AS sw_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|des|une|dans|que|pour)\b')) AS sw_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|la|los|las|es|de|que|en|por|una)\b')) AS sw_es,
        |  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk
        | FROM documents),
        |m AS (SELECT *,
        |  CASE WHEN n_tok > 0 THEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / n_tok ELSE 0.0 END AS mwl,
        |  CASE WHEN length(text) > 0 THEN CAST(n_alpha AS DOUBLE) / length(text) ELSE 0.0 END AS alpha,
        |  CASE WHEN length(text) > 0 THEN CAST(n_punct AS DOUBLE) / length(text) ELSE 0.0 END AS punct
        | FROM s)
        |SELECT doc_id, n_tok,
        | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_sub,
        | alpha,
        | CASE WHEN length(text) > 0 THEN CAST(n_digit AS DOUBLE) / length(text) ELSE 0.0 END AS digit,
        | punct,
        | CASE WHEN length(text) > 0 THEN CAST(n_ws AS DOUBLE) / length(text) ELSE 0.0 END AS ws,
        | mwl,
        | sw_en AS sw,
        | CASE WHEN n_tok > 0 THEN CAST(sw_en AS DOUBLE) / n_tok ELSE 0.0 END AS swr,
        | CASE WHEN cjk * 4 > length(text) THEN 'zh'
        |      WHEN sw_es > greatest(sw_en, sw_de, sw_fr) THEN 'es'
        |      WHEN sw_fr > greatest(sw_en, sw_de) THEN 'fr'
        |      WHEN sw_de > sw_en THEN 'de'
        |      ELSE 'en' END AS lang,
        | floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
        |   + alpha * 0.4
        |   + (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
        |   + (CASE WHEN punct < 0.1 THEN 1.0 ELSE 1.0 - punct END) * 0.1) * 1e6 + 0.5) / 1e6 AS q,
        | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM m ORDER BY doc_id""".stripMargin,
    "pipe_dedup_exact" ->
      """SELECT (SELECT count(*) FROM documents) AS n_after,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents) AS kept_id_sum,
        | (SELECT count(*) FROM documents) AS n_groups2,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents) AS group_kept_sum,
        | (SELECT count(DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |    FROM documents) AS n_rfp""".stripMargin,
    "pipe_dedup_minhash" ->
      """SELECT (SELECT count(*) FROM documents) AS n_cand_ident,
        | (SELECT count(*) FROM documents) AS n_verified_ident""".stripMargin,
    "pipe_dedup_simhash" ->
      """SELECT (SELECT count(*) FROM documents) AS n_ident,
        | (SELECT count(*) FROM documents) AS n_ident_h0""".stripMargin,
    "pipe_minhash_store" ->
      """SELECT (SELECT count(*) FROM documents) AS n_store_ident,
        | (SELECT count(*) FROM documents) AS n_novel""".stripMargin,
    "pipe_simhash_store" ->
      """SELECT (SELECT count(*) FROM documents) AS n_store_ident,
        | (SELECT count(*) FROM documents) AS n_novel""".stripMargin,
    "pipe_simhash_store_wide" ->
      """SELECT (SELECT count(*) FROM documents) AS n_store_ident,
        | (SELECT count(*) FROM documents) AS n_novel""".stripMargin,
    "pipe_ngram_store" ->
      """SELECT (SELECT count(*) FROM documents) AS n_store_ident,
        | (SELECT count(*) FROM documents) AS n_novel""".stripMargin,
    "pipe_embedding_store" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_emb_dup,
        | (SELECT count(*) FROM embeddings) AS n_emb_novel""".stripMargin,
    "pipe_stream_minhash" ->
      """SELECT (SELECT count(*) FROM documents) AS n_stream_ident,
        | CAST(0 AS BIGINT) AS n_sym_diff""".stripMargin,
    "pipe_stream_simhash" ->
      """SELECT (SELECT count(*) FROM documents) AS n_stream_ident,
        | CAST(0 AS BIGINT) AS n_sym_diff""".stripMargin,
    "pipe_stream_ngram" ->
      """SELECT (SELECT count(*) FROM documents) AS n_stream_ident,
        | CAST(0 AS BIGINT) AS n_sym_diff""".stripMargin,
    "pipe_stream_embedding" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_stream_embdup,
        | CAST(0 AS BIGINT) AS n_sym_diff""".stripMargin,
    "pipe_stream_image" ->
      """SELECT (SELECT count(*) FROM documents WHERE doc_id < 2048)
        |   AS n_stream_imgdup,
        | CAST(0 AS BIGINT) AS n_sym_diff,
        | CAST(3 AS BIGINT) AS n_corrupt_in,
        | CAST(0 AS BIGINT) AS n_corrupt_pairs""".stripMargin,
    "pipe_embedding" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_embdup,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_bf_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_lsh_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_ivf_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_ivfstore_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_ivfadapt_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_pq_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_ivfpq_self,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_opq_self,
        | TRUE AS ivfpq_guard_eq""".stripMargin,
    "pipe_semdedup" ->
      """SELECT
        | (SELECT 2 * count(*) FROM embeddings
        |   WHERE list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))) > 0)
        |   AS n_rows,
        | (SELECT count(*) FROM embeddings
        |   WHERE list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))) > 0)
        |   AS n_twin_same_comp,
        | CAST(0 AS BIGINT) AS n_both_twins_kept,
        | TRUE AS comp_one_kept_ok, TRUE AS rep_rule_ok,
        | CAST(0 AS BIGINT) AS n_kept_near_pairs""".stripMargin,
    "pipe_dedup_ngram" ->
      """SELECT (SELECT count(*) FROM documents) AS n_ident,
        | (SELECT count(*) FROM documents) AS n_ident_j1""".stripMargin,
    "pipe_multimodal" ->
      """SELECT doc_id,
        | 64 + (doc_id % 256) AS width,
        | 32 + (doc_id % 128) AS height,
        | 3 AS channels, 'png' AS fmt, TRUE AS hdr_feat_null,
        | 64 AS n_feat, 16 AS real_w, 8 AS real_h,
        | 1 AS au_channels, 16000 AS au_rate,
        | (doc_id % 100 + 1) * 1000 AS au_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_image_dedup" ->
      """SELECT (SELECT count(*) FROM documents WHERE doc_id < 2048) AS n_twins,
        | CAST(0 AS BIGINT) AS n_cross, TRUE AS twin_cos_one""".stripMargin,
    "pipe_video_dedup" ->
      """SELECT (SELECT count(*) FROM documents WHERE doc_id < 256) AS n_twins,
        | CAST(0 AS BIGINT) AS n_cross""".stripMargin,
    "pipe_stream_video" ->
      """SELECT (SELECT count(*) FROM documents WHERE doc_id < 256)
        |   AS n_stream_viddup,
        | CAST(0 AS BIGINT) AS n_sym_diff,
        | CAST(2 AS BIGINT) AS n_corrupt_in,
        | CAST(0 AS BIGINT) AS n_corrupt_pairs""".stripMargin,
    "pipe_multimodal_feat" ->
      """SELECT doc_id, 64 AS n_feat,
        | TRUE AS grid_r_ok, TRUE AS grid_g_ok, TRUE AS grid_b_ok,
        | TRUE AS grid_last_ok, TRUE AS hist_onehot_ok, TRUE AS png_bmp_eq
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_audio" ->
      """SELECT doc_id,
        | CAST((64 + doc_id % 8 * 16) * 8 AS DOUBLE) AS dominant_hz,
        | 1.0 AS dur_sec,
        | TRUE AS cent_ok, TRUE AS zcr_ok, TRUE AS rms_ok, TRUE AS bw_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_stream_audio" ->
      """SELECT CAST(FLOOR((doc_id % 16) / 4) * 4 AS INT) AS win_min,
        | COUNT(*) AS n_docs,
        | SUM(CAST((64 + doc_id % 8 * 16) * 8 AS DOUBLE)) AS sum_dominant_hz,
        | CAST(0 AS BIGINT) AS n_sym_diff
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_multimodal_px" ->
      """SELECT doc_id,
        | 16 + (doc_id % 8) * 2 AS width,
        | 8 + (doc_id % 4) * 2 AS height,
        | 3 AS channels,
        | 16 + (doc_id % 8) * 2 AS jpg_w,
        | 8 + (doc_id % 4) * 2 AS jpg_h,
        | CAST(doc_id % 256 AS DOUBLE) / 255.0 AS mean_r,
        | CAST(doc_id * 7 % 256 AS DOUBLE) / 255.0 AS mean_g,
        | CAST(doc_id * 13 % 256 AS DOUBLE) / 255.0 AS mean_b,
        | 8 + (doc_id % 8) AS rw,
        | 4 + (doc_id % 4) AS rh,
        | 12 AS n_feat,
        | CAST(doc_id % 256 AS DOUBLE) / 255.0 AS feat_r,
        | CAST(500 + doc_id % 1000 AS DOUBLE) / 32768.0 AS rms,
        | CAST(500 + doc_id % 1000 AS DOUBLE) / 32768.0 AS peak,
        | CAST(500 + doc_id % 1000 AS DOUBLE) / 32768.0 AS mean_s,
        | 100 AS au_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_video" ->
      """SELECT doc_id, 16 AS vw, 16 AS vh, 6 AS n_frames, 25.0 AS fps,
        | 3 AS n_sampled, 16 AS f0_w, 16 AS f0_h, 3 AS f0_ch,
        | TRUE AS f0_r_ok, TRUE AS f1_r_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_split" ->
      s"""WITH h AS (SELECT doc_id,
         |  substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) AS b
         | FROM documents)
         |SELECT CASE WHEN b < '${Curation.hexThreshold(0.8)}' THEN 'train'
         |  WHEN b < '${Curation.hexThreshold(0.9)}' THEN 'val'
         |  ELSE 'test' END AS split,
         | count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_pack" ->
      """WITH c AS (SELECT source, doc_id, n_chars,
        |  sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS strt
        | FROM documents)
        |SELECT source, CAST(floor(strt / 2048.0) AS BIGINT) AS shard,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
        | CAST(min(strt - floor(strt / 2048.0) * 2048) AS BIGINT) AS first_off
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipe_cluster" ->
      """SELECT (SELECT count(*) FROM documents) AS n_nodes,
        | (SELECT count(DISTINCT doc_id - doc_id % 5) FROM documents) AS n_chain_comps,
        | (SELECT CAST(sum(doc_id - doc_id % 5) AS BIGINT) FROM documents) AS chain_comp_sum,
        | (SELECT count(*) FROM documents) AS n_clusters,
        | (SELECT CAST(3 * sum(doc_id) AS BIGINT) FROM documents) AS cluster_sum,
        | (SELECT count(*) FROM documents) AS n_survivors,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents) AS survivor_id_sum""".stripMargin,
    "pipe_strip" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 10 = 0),
        |tk AS (SELECT doc_id AS id,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS t
        | FROM aug),
        |tg AS (SELECT id, t, CASE WHEN len(t) >= 8
        |  THEN list_transform(generate_series(1, len(t) - 7),
        |    i -> array_to_string(list_slice(t, i, i + 7), ' '))
        |  ELSE [array_to_string(t, ' ')] END AS gr FROM tk),
        |g0 AS (SELECT id, unnest(list_transform(generate_series(1, len(gr)),
        |  i -> struct_pack(pos := i, gram := gr[i]))) AS u FROM tg),
        |g AS (SELECT id, u.pos AS pos, u.gram AS gram FROM g0),
        |ow AS (SELECT gram, min(id) AS owner
        |  FROM (SELECT DISTINCT gram, id FROM g) GROUP BY gram
        |  HAVING count(*) >= 2),
        |sp AS (SELECT g.id, list(g.pos) AS spans FROM g
        |  JOIN ow USING (gram) WHERE g.id != ow.owner GROUP BY g.id)
        |SELECT tg.id,
        | coalesce(CASE WHEN spans IS NULL THEN array_to_string(t, ' ')
        |  ELSE array_to_string(list_filter(t,
        |    (x, i) -> NOT (len(list_filter(spans, p -> i >= p AND i < p + 8)) > 0)), ' ')
        | END, '') AS text
        |FROM tg LEFT JOIN sp USING (id) ORDER BY id""".stripMargin,
    "pipe_crossdup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 10 = 0),
        |tk AS (SELECT doc_id AS id,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS t
        | FROM aug),
        |g AS (SELECT id, unnest(CASE WHEN len(t) >= 8
        |  THEN list_transform(generate_series(1, len(t) - 7),
        |    i -> array_to_string(list_slice(t, i, i + 7), ' '))
        |  ELSE [array_to_string(t, ' ')] END) AS gram FROM tk),
        |pd AS (SELECT id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |dg AS (SELECT gram FROM pd GROUP BY gram HAVING count(*) >= 2),
        |dup AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_dup FROM pd
        |  JOIN dg USING (gram) GROUP BY id)
        |SELECT tk.id, CAST(greatest(len(t) - 7, 1) AS BIGINT) AS n_grams,
        | coalesce(n_dup, 0) AS n_dup_grams,
        | CAST(coalesce(n_dup, 0) AS DOUBLE)
        |   / CAST(greatest(len(t) - 7, 1) AS DOUBLE) AS dup_frac
        |FROM tk LEFT JOIN dup USING (id) ORDER BY id""".stripMargin,
    "pipe_decontam" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS tk
        | FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
        |  THEN list_transform(generate_series(1, len(tk) - 7),
        |    i -> array_to_string(list_slice(tk, i, i + 7), ' '))
        |  ELSE [array_to_string(tk, ' ')] END) AS gram FROM toks),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram))
        |SELECT (SELECT count(*) FROM contam) AS n_contam,
        | (SELECT count(*) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS n_clean,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS clean_id_sum""".stripMargin,
    // the store door must reproduce the direct door's answer exactly —
    // identical oracle SQL, store-vs-direct equality is the whole pin
    "pipe_decontam_store" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS tk
        | FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
        |  THEN list_transform(generate_series(1, len(tk) - 7),
        |    i -> array_to_string(list_slice(tk, i, i + 7), ' '))
        |  ELSE [array_to_string(tk, ' ')] END) AS gram FROM toks),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram))
        |SELECT (SELECT count(*) FROM contam) AS n_contam,
        | (SELECT count(*) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS n_clean,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS clean_id_sum""".stripMargin,
    // the stream door must reproduce the batch store door's clean set —
    // same gram oracle as pipe_decontam, sym-diff pinned to zero
    "pipe_stream_decontam" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS tk
        | FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
        |  THEN list_transform(generate_series(1, len(tk) - 7),
        |    i -> array_to_string(list_slice(tk, i, i + 7), ' '))
        |  ELSE [array_to_string(tk, ' ')] END) AS gram FROM toks),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram))
        |SELECT (SELECT count(*) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS n_clean,
        | (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents
        |    WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS clean_id_sum,
        | CAST(0 AS BIGINT) AS n_sym_diff""".stripMargin,
    // the streaming ingest loop's closed form: the md5-novel half is
    // accepted (ids +20000), the dup half and the cross-batch re-dup
    // are filtered, the index ends at corpus + accepted
    "pipe_stream_ingest" ->
      """SELECT (SELECT count(*) FROM documents) AS n_accepted,
        | (SELECT CAST(sum(doc_id) + 20000 * count(*) AS BIGINT)
        |    FROM documents) AS accepted_id_sum,
        | (SELECT 2 * count(*) FROM documents) AS n_index_docs""".stripMargin,
    "pipe_text2" ->
      """WITH l AS (SELECT doc_id, text,
        |  list_filter(list_transform(string_split_regex(text, '\r?\n'), x -> trim(x)),
        |    x -> length(x) > 0) AS ls,
        |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS tk,
        |  length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS doc_len
        | FROM documents),
        |m AS (SELECT doc_id, ls, doc_len,
        |  CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk) - 1),
        |      i -> array_to_string(list_slice(tk, i, i + 1), ' '))
        |    ELSE [] END AS grams
        | FROM l)
        |SELECT doc_id,
        | CASE WHEN len(ls) > 0
        |   THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
        |   ELSE 0.0 END AS dlf,
        | CASE WHEN coalesce(list_sum(list_transform(ls, x -> length(x))), 0) > 0
        |   THEN CAST(coalesce(list_sum(list_transform(list_distinct(ls),
        |     d -> (len(list_filter(ls, x -> x = d)) - 1) * length(d))), 0) AS DOUBLE)
        |     / list_sum(list_transform(ls, x -> length(x)))
        |   ELSE 0.0 END AS dlcf,
        | CASE WHEN doc_len > 0
        |   THEN CAST(coalesce(list_max(list_transform(list_distinct(grams),
        |     g -> len(list_filter(grams, x -> x = g)) * length(g))), 0) AS DOUBLE) / doc_len
        |   ELSE 0.0 END AS top2
        |FROM m ORDER BY doc_id""".stripMargin,
    "pipe_text3" ->
      """WITH l AS (SELECT doc_id, text,
        |  list_filter(list_transform(string_split_regex(text, '\r?\n'), x -> trim(x)),
        |    x -> length(x) > 0) AS ls,
        |  regexp_extract_all(text, '\S+') AS tk
        | FROM documents),
        |m AS (SELECT doc_id, text, ls, tk,
        |  (length(text) - length(replace(text, '#', ''))) / 1
        |   + (length(text) - length(replace(text, '…', ''))) / 1
        |   + (length(text) - length(replace(text, '...', ''))) / 3 AS syms,
        |  CASE WHEN len(ls) > 0 THEN CAST(len(list_filter(ls,
        |     x -> substring(x, 1, 1) IN ('•', '‣', '●', '-', '*'))) AS DOUBLE)
        |     / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS bullet_frac,
        |  CASE WHEN len(ls) > 0 THEN CAST(len(list_filter(ls,
        |     x -> ends_with(x, '…') OR ends_with(x, '...'))) AS DOUBLE)
        |     / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS ellipsis_frac,
        |  CASE WHEN len(tk) > 0 THEN CAST(len(list_filter(tk,
        |     t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |     / CAST(len(tk) AS DOUBLE) ELSE 0.0 END AS alpha_word,
        |  CAST(regexp_matches(lower(text), '\bthe\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bbe\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bto\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bof\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\band\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bthat\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bhave\b') AS INT)
        |   + CAST(regexp_matches(lower(text), '\bwith\b') AS INT) AS req_stop,
        |  CASE WHEN len(tk) > 0
        |    THEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      / CAST(len(tk) AS DOUBLE)
        |    ELSE 0.0 END AS mwl
        | FROM l)
        |SELECT doc_id,
        | CASE WHEN len(tk) > 0 THEN CAST(syms AS DOUBLE) / CAST(len(tk) AS DOUBLE)
        |   ELSE 0.0 END AS sym_ratio,
        | bullet_frac, ellipsis_frac, alpha_word,
        | CAST(req_stop AS BIGINT) AS req_stop,
        | (SELECT CASE WHEN len(ps) > 0
        |    THEN CAST(len(ps) - len(list_distinct(ps)) AS DOUBLE)
        |      / CAST(len(ps) AS DOUBLE) ELSE 0.0 END
        |   FROM (SELECT list_filter(list_transform(
        |     string_split_regex(text, '\r?\n\r?\n'), p -> trim(p)),
        |     p -> length(p) > 0) AS ps)) AS dup_para,
        | (len(tk) BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
        |   AND (CASE WHEN len(tk) > 0 THEN CAST(syms AS DOUBLE) / CAST(len(tk) AS DOUBLE)
        |        ELSE 0.0 END) <= 0.1
        |   AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |   AND alpha_word >= 0.8 AND req_stop >= 2 AS keep,
        | coalesce(length(array_to_string(list_filter(ls,
        |   x -> (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')
        |         OR ends_with(x, '"'))
        |        AND len(regexp_extract_all(x, '\S+')) >= 3), chr(10))), 0) AS c4_len,
        | contains(lower(text), 'lorem ipsum') AS c4_lorem,
        | contains(text, '{') AS c4_brace
        |FROM m ORDER BY doc_id""".stripMargin,
    "pipe_url" ->
      """SELECT doc_id,
        | 'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p'
        |   || CAST(doc_id % 5 AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) AS canon,
        | TRUE AS variant_eq,
        | (SELECT count(*) FROM documents) AS n_unique
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'c1'), 1, 8), doc_id) AS rk
        | FROM documents)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rk <= 20 GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_sample" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  substr(md5(CAST(doc_id AS VARCHAR) || 's2'), 1, 8) AS b
         | FROM documents)
         |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM h
         |WHERE b < CASE lang WHEN 'en' THEN '${Curation.hexThreshold(0.5)}'
         |  WHEN 'zh' THEN '${Curation.hexThreshold(0.2)}'
         |  ELSE '${Curation.hexThreshold(1.0)}' END
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
