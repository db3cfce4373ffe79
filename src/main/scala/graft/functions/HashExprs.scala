package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time kernels behind the custom hash expressions below.
  *
  * These compute exactly what the portable higher-order-function
  * formulations in [[TextFns]] specify (and what the DuckDB oracle SQL
  * mirrors), but in one tight JVM loop per row instead of an interpreted
  * Catalyst lambda per character — the HOF path evaluates
  * `aggregate(transform(split(tok,""), ...))` with boxed per-char steps
  * and is ~100× slower on long documents.
  *
  * Semantics contract (bit-identical to the HOF path, t2-gate verified):
  *  - tokens = text split on every single space, empty tokens kept
  *    (matches `split(text, " ")` = Java `split(" ", -1)`)
  *  - tokenHash = fold CODEPOINTS c: h -> (h*31 + c) mod P, empty
  *    token -> 0. Codepoints, not UTF-16 chars: DuckDB's `ascii(c)`
  *    and Spark's own `split('')`/`ascii` HOF reference are both
  *    codepoint-based, so a UTF-16 fold silently diverged on
  *    astral-plane input (r12 fuzz find: emoji tokens flipped q47's
  *    doc hashes). The two units agree on every BMP character, which
  *    is why the ASCII fixtures never showed it.
  *  - shingle/doc hash = fold hashes x: h -> (h*131 + x) mod P
  *  - minhash_j = min over x of (a_j*x + b_j) mod P
  *  - band key b = ((sig[2b] * 1000003 + sig[2b+1]) mod bigP) * nBands + b
  * All intermediates stay below 2^63 for the shipped configurations
  * (hash values < P = 1e9; the band fold applies its 1000003 multiplier
  * exactly once because rowsPerBand is capped at 2 — a third fold step
  * would overflow, which BandKeysExpr guards against).
  */
object HashKernels {
  val P = 1000000007L
  val BigP = 999999999999989L

  def tokenHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    var tokens = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') tokens += 1; i += 1 }
    val out = new Array[Long](tokens)
    var h = 0L
    var t = 0
    i = 0
    while (i < n) {
      val c = s.codePointAt(i)
      if (c == ' ') { out(t) = h; t += 1; h = 0L }
      else h = (h * 31L + c) % P
      i += Character.charCount(c)
    }
    out(t) = h
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def docHash(arr: ArrayData): Long = {
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) { h = (h * 131L + arr.getLong(i)) % P; i += 1 }
    h
  }

  def shingleHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 131L + arr.getLong(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def minHashSig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val m = a.length
    val out = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < m) {
        val v = (a(j) * x + b(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def bandKeys(sig: ArrayData, nBands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = sig.getLong(b * rowsPerBand)
      var r = 1
      while (r < rowsPerBand) {
        acc = (acc * 1000003L + sig.getLong(b * rowsPerBand + r)) % BigP
        r += 1
      }
      out(b) = (acc % BigP) * nBands + b
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Signed feature-hash embedding (the "hashing trick", Weinberger et
    * al., ICML 2009) of a token-hash array into `dim` integer buckets:
    * bucket = h mod dim, sign = +1 when (h mod 2·dim) < dim else −1 —
    * a division-free sign rule so the HOF/DuckDB mirrors need only
    * `pmod`. Counts stay integers; normalization to floats is the
    * caller's (engine-local) step. */
  def featureHashEmbed(arr: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    val twoDim = 2L * dim
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val b = (h % dim).toInt
      if (h % twoDim < dim) out(b) += 1L else out(b) -= 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simHash(arr: ArrayData, bits: Int, a: Long, b0: Long): Long = {
    val n = arr.numElements()
    val acc = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val x = (a * arr.getLong(i) + b0) % P
      var b = 0
      while (b < bits) {
        if (((x >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (acc(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

/** Base for the hash expressions: codegen is a single static call into
  * [[HashKernels]], so the whole dedup pipeline stays inside
  * WholeStageCodegen with no interpreted lambdas (SURVEY.md §4's
  * "custom codegen'd Expression" follow-up).
  */
sealed trait HashKernelExpr extends UnaryExpression {
  protected def kernelCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, kernelCall)
}

/** Analysis-time input validation for the kernel expressions.
  * (`ExpectsInputTypes` can't be mixed in from outside
  * `org.apache.spark.sql` — `AbstractDataType` is private[sql] — so the
  * checks are spelled out; without them the SQL-registered functions
  * would accept wrong-typed arrays and reinterpret raw bytes.) */
private[functions] object KernelTypeCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def stringInput(fn: String, dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires a string argument, got ${other.simpleString}")
  }

  def longInputs(fn: String, dts: DataType*): TypeCheckResult =
    dts.zipWithIndex.collectFirst {
      case (dt, i) if dt != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} requires bigint, got ${dt.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  def arrayOf(fn: String, elem: DataType, dts: DataType*): TypeCheckResult =
    dts.zipWithIndex.collectFirst {
      case (dt, i) if !dt.isInstanceOf[ArrayType] ||
          dt.asInstanceOf[ArrayType].elementType != elem =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} requires array<${elem.simpleString}>, " +
            s"got ${dt.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  /** Each argument independently array<float> OR array<double> — for
    * kernels that widen to double anyway (cosine), so an fp32 embedding
    * column and an fp64 one (e.g. a PCA projection) both work. */
  def floatOrDoubleArray(fn: String, dts: DataType*): TypeCheckResult =
    dts.zipWithIndex.collectFirst {
      case (dt, i) if !(dt.isInstanceOf[ArrayType] &&
          (dt.asInstanceOf[ArrayType].elementType == FloatType ||
            dt.asInstanceOf[ArrayType].elementType == DoubleType)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} requires array<float> or array<double>, " +
            s"got ${dt.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** array<bigint> of per-token polynomial hashes of a text column. */
case class TokenHashesExpr(child: Expression) extends HashKernelExpr {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"
  override def nullSafeEval(input: Any): Any =
    HashKernels.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.tokenHashes($c)"
  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

/** Order-sensitive fold of a token-hash array into one bigint. */
case class DocHashExpr(child: Expression) extends HashKernelExpr {
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
    override def dataType: DataType = LongType
  override def prettyName: String = "doc_hash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.docHash(input.asInstanceOf[ArrayData])
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.docHash($c)"
  override protected def withNewChildInternal(newChild: Expression): DocHashExpr =
    copy(child = newChild)
}

/** Rolling k-window fold of a token-hash array; empty if fewer than k. */
case class ShingleHashesExpr(child: Expression, k: Int) extends HashKernelExpr {
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[ArrayData], k)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.shingleHashes($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** MinHash signature: per seed pair, min over the array of (a*x+b) mod P.
  * One pass over the input for all seeds.
  */
case class MinHashSigExpr(child: Expression, seedsA: Array[Long], seedsB: Array[Long])
    extends HashKernelExpr {
  require(seedsA.length == seedsB.length)
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashSig(input.asInstanceOf[ArrayData], seedsA, seedsB)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("seedsA", seedsA, "long[]")
    val bRef = ctx.addReferenceObj("seedsB", seedsB, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minHashSig($c, $aRef, $bRef)")
  }
  override protected def kernelCall(c: String): String =
    throw new IllegalStateException("unused: doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** LSH band keys from a signature, band index mixed in so bands never
  * collide with each other.
  */
case class BandKeysExpr(child: Expression, nBands: Int, rowsPerBand: Int)
    extends HashKernelExpr {
  // rowsPerBand > 2 would overflow the fold: acc < BigP ~ 1e15 times the
  // 1000003 multiplier exceeds 2^63 from the second step on
  require(rowsPerBand >= 1 && rowsPerBand <= 2,
    "BandKeysExpr supports rowsPerBand of 1 or 2")
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"
  override def nullSafeEval(input: Any): Any =
    HashKernels.bandKeys(input.asInstanceOf[ArrayData], nBands, rowsPerBand)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.bandKeys($c, $nBands, $rowsPerBand)"
  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

/** SimHash fingerprint of a token-hash array: bit i of the result is the
  * majority vote of bit i across the seeded hash view (a*x+b0) mod P of
  * each token hash (+1 when set, -1 when clear; ties -> 0). `bits` <= 30
  * because the view values are < P = 1e9+7 < 2^30; wider fingerprints
  * compose multiple views with distinct seeds (see DedupQueries.q61).
  */
case class SimHashExpr(child: Expression, bits: Int, a: Long, b0: Long)
    extends HashKernelExpr {
  require(bits > 0 && bits <= 30)
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[ArrayData], bits, a, b0)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.simHash($c, $bits, ${a}L, ${b0}L)"
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Signed feature-hash embedding of a token-hash array: array<bigint>
  * of length `dim` (see [[HashKernels.featureHashEmbed]]). */
case class FeatureHashEmbedExpr(child: Expression, dim: Int) extends HashKernelExpr {
  require(dim > 0)
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hash_embed"
  override def nullSafeEval(input: Any): Any =
    HashKernels.featureHashEmbed(input.asInstanceOf[ArrayData], dim)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.featureHashEmbed($c, $dim)"
  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbedExpr =
    copy(child = newChild)
}
