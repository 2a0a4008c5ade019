package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * — same left-to-right double accumulation (bit-exact), same null
  * behavior (null array, length mismatch, or any null element → null) —
  * but evaluated as one fused loop over the Catalyst [[ArrayData]]: no
  * zipped intermediate array, no per-element lambda dispatch. This is the
  * inner kernel of every similarity-search pair score
  * ([[graft.pipeline.Similarity]]); at 100 TB the score loop runs
  * corpus × queries times, so constant-factor work per pair is the whole
  * game.
  *
  * (zip_with pads the shorter array with nulls, making any length
  * mismatch propagate to a null sum — hence mismatch → null here, not an
  * error.)
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).find(c => !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != DoubleType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"array_dot expects array<double>, got ${c.dataType}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n != bd.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      acc += ad.getDouble(i) * bd.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[MinHashSig]]. */
object MinHashKernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    x
  }

  /** MinHash signature of the character `k`-shingle set of `s`, one fused
    * pass: for every shingle window, xxhash64 its UTF-8 bytes (seed 42 —
    * identical values to Spark's `xxhash64(substr(...))`), then fold into
    * the running per-seed minima. No shingle array, no distinct pass (min
    * is idempotent over duplicates), no boxing. Shorter-than-k strings
    * hash whole, matching the expression formulation's `otherwise` arm. */
  def sig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // codepoint start offsets (shingles are per CHARACTER, like substr)
    var cp = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) cp += 1
      i += 1
    }
    val starts = new Array[Int](cp + 1)
    var j = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(j) = i; j += 1 }
      i += 1
    }
    starts(cp) = n
    val out = Array.fill(numHashes)(Long.MaxValue)
    val nWin = if (cp >= k) cp - k + 1 else 1
    val winLen = if (cp >= k) k else cp
    var w = 0
    while (w < nWin) {
      val from = starts(w)
      val len = starts(w + winLen) - from
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      val base = fmix64(h * 0x9e3779b97f4a7c15L + 1)
      var p = 0
      while (p < numHashes) {
        val v = fmix64(base ^ (p * 0xc2b2ae3d27d4eb4fL))
        if (v < out(p)) out(p) = v
        p += 1
      }
      w += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** MinHash signature over the normalized text, as ONE codegen'd
  * expression: the `shingle-hash array → distinct → per-seed min` chain
  * ([[graft.pipeline.Dedup.shingleHashes]] +
  * `minhashSignatureHashed`) collapses into a single pass over the
  * string's UTF-8 bytes with a 64-long running-minimum buffer — no
  * intermediate array, no UDF encoder boxing. Values are IDENTICAL to the
  * UDF formulation (same xxhash64-seed-42 shingle hash, same splitmix64
  * seed mixing), so the two tiers are interchangeable. */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashKernel.sig($c, $shingleK, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
