package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused similarity / n-gram kernels. Same motivation as [[HashKernels]]:
  * the higher-order-function forms (`zip_with` + `aggregate` cosine,
  * double `array_intersect` jaccard, `transform(sequence(...), substr)`
  * bigrams) evaluate an interpreted Catalyst lambda per element; these
  * expressions compute the identical values in one JVM loop per row and
  * stay inside whole-stage codegen.
  *
  * Bit-parity contracts (all t2-gate verified, pinned by
  * SimilarityKernelSpec against the HOF reference forms):
  *  - cosine: the three dot-product sums fold left-to-right exactly like
  *    `aggregate(zip_with(...))`, float operands widened to double before
  *    multiplying, so every partial sum is bit-identical; 0-vectors give
  *    the same NaN.
  *  - jaccard: |a∩b| on already-distinct arrays / (|a|+|b|-|a∩b|),
  *    matching size(array_intersect(a,b)) for distinct inputs.
  *  - bigrams: 2-char (resp. 2-token) windows at every position; fewer
  *    than 2 units -> empty array (the guard both oracle SQLs use).
  */
object SimilarityKernels {

  /** Fused cosine over two equal-length float arrays. */
  def cosineSim(a: ArrayData, b: ArrayData): Double =
    cosineSim(a, b, false, false)

  /** Element-type-generic form: each side is fp32 or fp64 (`aDouble` /
    * `bDouble` are analysis-time constants from the column types, so
    * the JIT folds the branches). fp32 values widen to double exactly —
    * float inputs produce bit-identical sums to the 2-arg form. */
  def cosineSim(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): Double = {
    val n = a.numElements()
    var dotAB = 0.0
    var dotAA = 0.0
    var dotBB = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute nothing (fixture arrays never hold
      // nulls; SQL callers might)
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
        dotAB += x * y
        dotAA += x * x
        dotBB += y * y
      }
      i += 1
    }
    dotAB / (math.sqrt(dotAA) * math.sqrt(dotBB))
  }

  /** Jaccard of two string arrays that are already element-distinct. */
  def jaccardSim(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    val set = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) { if (!a.isNullAt(i)) set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < m) {
      if (!b.isNullAt(i) && set.contains(b.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Jaccard of two element-distinct string arrays that are BOTH sorted
    * in UTF8String binary order (Spark's `sort_array` string order):
    * zero-allocation two-pointer merge intersection, O(n+m) byte
    * comparisons per pair. Same value as [[jaccardSim]]; the point is
    * blocked self-joins, where each row's set is compared against every
    * row in its block — sort once per ROW (in the projection), merge per
    * PAIR, instead of building a hash set per pair. */
  def jaccardSortedSim(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Merge-intersection of two element-distinct long arrays BOTH
    * sorted ascending with no null elements (the `sort_array ∘
    * collect_list` contract): two-pointer scan, output built in one
    * primitive long buffer — no per-row hash set, no boxing. Same
    * element SET as `array_intersect(a, b)` under that contract
    * (array_intersect also preserves first-array order, so the result
    * is identically sorted). Written for the triangle edge-iterator,
    * where this runs once per EDGE over O(√m)-capped adjacency
    * arrays — the hottest loop of the whole graph family. */
  def sortedLongIntersect(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = b.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** All 2-codepoint substrings of a text; empty when length < 2.
    * Single pass over the UTF-8 bytes — no String materialization, each
    * bigram is a direct byte-range slice. Codepoint indexing matches
    * DuckDB's `substr` (the oracle mirror); identical to UTF-16-unit
    * indexing for all BMP text. */
  def charBigrams(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) { i += UTF8String.numBytesForFirstByte(bytes(i)); count += 1 }
    if (count < 2) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](count + 1)
    i = 0
    var k = 0
    while (i < n) {
      starts(k) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      k += 1
    }
    starts(count) = n
    val out = new Array[Any](count - 1)
    k = 0
    while (k < count - 1) {
      out(k) = UTF8String.fromBytes(bytes, starts(k), starts(k + 2) - starts(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Jaro–Winkler similarity — the standard name-matching metric:
    * Jaro (match window ⌊max/2⌋−1, half-transpositions) plus the
    * Winkler prefix boost ℓ·0.1·(1−j) applied only when j ≥ 0.7 with
    * ℓ = common prefix capped at 4. Parity contract (probed against
    * DuckDB 1.0 `jaro_winkler_similarity`, pinned in
    * SimilarityKernelSpec): DuckDB uses exactly this boost-thresholded
    * form — MARTHA/MARHTA 0.961111, DIXON/DICKSONX 0.813333,
    * sub-threshold pairs (j < 0.7) get NO boost. Operates on UTF-16
    * code units (`String#charAt`), which matches DuckDB on the BMP
    * text the fixtures hold. Both-empty → 1.0; one-empty → 0.0. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars out of relative order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro < 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a.charAt(l) == b.charAt(l))
      l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Space-joined adjacent-token pairs; empty when fewer than 2 tokens.
    * Tokenization matches `split(text, " ")` (empty tokens kept). */
  def wordBigrams(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** cosine(a, b) of two fp32/fp64-array columns (each side independently
  * float or double — a raw embedding and a PCA projection compare
  * without a cast), fused single pass. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.floatOrDoubleArray(prettyName, left.dataType, right.dataType)
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isDouble(left), isDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityKernels.cosineSim($a, $b, ${isDouble(left)}, ${isDouble(right)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** jaro_winkler(a, b) of two string columns, fused single pass. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes() = {
    val l = KernelTypeCheck.stringInput(prettyName, left.dataType)
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess) l
    else KernelTypeCheck.stringInput(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SimilarityKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** jaccard(a, b) of two element-distinct string-array columns. */
case class JaccardSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, StringType, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.jaccardSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SimilarityKernels.jaccardSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}

/** jaccard(a, b) of two element-distinct SORTED string-array columns
  * (see [[SimilarityKernels.jaccardSortedSim]] for the contract). */
case class JaccardSortedSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, StringType, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.jaccardSortedSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SimilarityKernels.jaccardSortedSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Character bigrams of a text column. */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigrams"
  override def nullSafeEval(input: Any): Any =
    SimilarityKernels.charBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimilarityKernels.charBigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): CharBigramsExpr =
    copy(child = newChild)
}

/** Word bigrams of a text column. */
case class WordBigramsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"
  override def nullSafeEval(input: Any): Any =
    SimilarityKernels.wordBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimilarityKernels.wordBigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)
}

/** Merge-intersection of two sorted element-distinct long-array columns
  * (see [[SimilarityKernels.sortedLongIntersect]] for the contract). */
case class SortedLongIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.arrayOf(prettyName, LongType, left.dataType, right.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_long_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.sortedLongIntersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SimilarityKernels.sortedLongIntersect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the similarity / n-gram kernels. */
object SimFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
  def sortedLongIntersect(a: Column, b: Column): Column =
    ofExpr(SortedLongIntersectExpr(toExpr(a), toExpr(b)))
  def cosineSim(a: Column, b: Column): Column = ofExpr(CosineSimExpr(toExpr(a), toExpr(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    ofExpr(JaroWinklerExpr(toExpr(a), toExpr(b)))
  def jaccardSim(a: Column, b: Column): Column = ofExpr(JaccardSimExpr(toExpr(a), toExpr(b)))
  def jaccardSortedSim(a: Column, b: Column): Column =
    ofExpr(JaccardSortedSimExpr(toExpr(a), toExpr(b)))
  def charBigrams(t: Column): Column = ofExpr(CharBigramsExpr(toExpr(t)))
  def wordBigrams(t: Column): Column = ofExpr(WordBigramsExpr(toExpr(t)))
}
