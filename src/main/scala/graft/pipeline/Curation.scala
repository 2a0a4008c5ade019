package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for large-scale training-data pipelines:
  * deterministic train/val/test splits, token-budget sequence packing, and
  * stratified down-sampling.
  *
  * All three are pure narrow (or single-shuffle) transformations built from
  * codegen'd built-in expressions — no UDFs, no driver-side state — so they
  * scale linearly with executors at 100 TB:
  *
  * - Split/sample decisions hash the *row id*, never position: adding or
  *   removing rows, repartitioning, or re-running never flips any other
  *   row's assignment (the standard content-addressed split used by public
  *   corpus pipelines, e.g. the C4/The-Pile preparation recipes).
  * - Packing uses a window partitioned by a caller-chosen group column
  *   (shard family), so the cumulative sum parallelizes across groups; a
  *   global pack over one group would serialize — callers at scale pass a
  *   date/source bucket as the group.
  */
object Curation {

  /** 8-hex-digit lexicographic threshold for fraction `f` of the md5 key
    * space: a row is "below f" iff its first 8 md5 hex chars compare less
    * than this string. Hex strings of equal length order like the integers
    * they encode, and both Spark and DuckDB emit lowercase hex — so the
    * same comparison is portable across engines. */
  def hexThreshold(f: Double): String = {
    if (f <= 0.0) "00000000"
    else if (f >= 1.0) "g" // '>' every hex digit → keeps all rows
    else f"${math.floor(f * 4294967296.0).toLong}%08x"
  }

  /** Lowercase-hex md5 bucket of (id, salt) — the first 8 hex chars.
    * `id` may be any type; it is canonicalized via CAST(... AS STRING).
    * NB each operation's DEFAULT salt is distinct ("split"/"sample"/
    * "cap"): with a shared default, sampling-then-splitting over the
    * same bucket silently degenerates (every sampled survivor lands in
    * "train", val/test empty). Override when composing the SAME op
    * twice. */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(encode(concat(id.cast("string"), lit(salt)), "UTF-8")), 1, 8)

  /** Deterministic content-addressed split: adds a `split` column with
    * values "train" / "val" / "test" by hashing `idCol` with `salt`.
    * Fractions are of the hash space (the realized fractions converge to
    * them at scale); `fracTrain + fracVal` must be <= 1, the remainder is
    * "test". Changing the salt re-deals every assignment; changing the
    * data never re-deals anyone else's. */
  def withSplit(df: DataFrame, idCol: String, salt: String = "split",
      fracTrain: Double = 0.98, fracVal: Double = 0.01): DataFrame = {
    require(fracTrain >= 0 && fracVal >= 0 && fracTrain + fracVal <= 1.0,
      s"invalid split fractions ($fracTrain, $fracVal)")
    val b = hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < lit(hexThreshold(fracTrain)), "train")
        .when(b < lit(hexThreshold(fracTrain + fracVal)), "val")
        .otherwise("test"))
  }

  /** Token-budget sequence packing: orders rows by `orderCol` within each
    * `groupCol` partition and assigns a `shard` id by cutting the running
    * token stream every `budget` tokens — a row lands in the shard where
    * its first token falls (first-fit on a contiguous stream; rows longer
    * than the budget still get exactly one shard). Adds:
    *  - `shard`: 0-based shard index within the group
    *  - `shard_offset`: the row's first-token offset within its shard
    *
    * One shuffle (the window partition); groups are the unit of
    * parallelism. */
  def packShards(df: DataFrame, groupCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // ROWS, not the default RANGE frame: RANGE sums over ORDER-BY PEERS,
    // so rows sharing an orderCol value would all see the same cumulative
    // total (overlapping offsets, shards silently over budget). ROWS
    // gives every row a distinct, valid offset; rows TIED on orderCol
    // pack in an arbitrary (scan-dependent) relative order — use a
    // unique orderCol when bit-reproducible shards matter. The DuckDB
    // oracle states the same frame explicitly.
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokenCol)).over(w)
    val start = cum - col(tokenCol) // first-token offset in the group stream
    df.withColumn("shard", floor(start / budget))
      .withColumn("shard_offset", start - col("shard") * budget)
  }

  /** Stratified deterministic down-sampling: keeps a per-stratum fraction
    * of rows, decided by the same content-addressed hash as [[withSplit]]
    * (so sampling composes with splitting: use different salts). Strata
    * missing from `fracs` keep `defaultFrac`. The filter is a codegen'd
    * CASE over the (small) strata map — no shuffle, no join. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fracs: Map[String, Double], defaultFrac: Double = 1.0,
      salt: String = "sample"): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    val threshold = fracs.foldLeft(lit(hexThreshold(defaultFrac))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Deterministic per-key cap: keep at most `n` rows per `keyCol` — the
    * crawl-curation "at most N documents per domain" balancing step.
    * Survivors are chosen by a salted md5 of the row id (content-addressed
    * like [[withSplit]]: stable under reordering, repartitioning, and task
    * retries — never `rand()`), with the id itself as the tiebreak.
    *
    * Scale shape: one window shuffle partitioned by key. A pathologically
    * hot key concentrates its rows in one task; when a key can exceed
    * ~10⁷ rows, pre-thin with a hash-threshold filter (keep
    * `hashBucket(id) < hexThreshold(cₙ/estimate)` for a small safety
    * factor c) before the exact window — same survivors, bounded task. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      salt: String = "cap"): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= n)
      .drop("__graft_rk")
  }

  /** Per-source target mixing weights → sampling fractions. Given observed
    * per-stratum counts and desired mixture weights (summing to 1), returns
    * the per-stratum keep-fractions that realize the mixture while keeping
    * as much data as possible (the binding stratum keeps fraction 1.0).
    * Driver-side arithmetic over a counts map the caller aggregated —
    * O(#strata), not O(rows). */
  def mixtureFractions(counts: Map[String, Long],
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.values.forall(_ >= 0), "negative mixture weight")
    val total = weights.values.sum
    require(total > 0, "mixture weights sum to zero")
    val norm = weights.view.mapValues(_ / total).toMap
    // a weighted stratum with ZERO rows makes the mixture unrealizable —
    // silently dropping it from the bound would return fractions whose
    // output mixture is not the requested one
    val missing = norm.collect {
      case (st, w) if w > 0 && counts.getOrElse(st, 0L) == 0L => st
    }
    require(missing.isEmpty,
      s"mixtureFractions: weighted strata with no rows: ${missing.mkString(", ")}")
    // largest feasible output size N: for each stratum, N·w_s <= n_s
    val feasible = norm.collect {
      case (st, w) if w > 0 => counts(st).toDouble / w
    }
    require(feasible.nonEmpty, "no stratum has both weight and rows")
    val n = feasible.min
    norm.map { case (s, w) =>
      val have = counts.getOrElse(s, 0L).toDouble
      s -> (if (have == 0) 0.0 else math.min(1.0, n * w / have))
    }
  }
}
