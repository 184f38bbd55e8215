package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native signature kernels for the dedup pipeline — the codegen'd fast
  * paths of `TextFunctions.simhashFromHashes` / `minhashFromHashes`.
  * The composed versions are higher-order built-ins whose lambdas
  * Catalyst interprets per element: SimHash walks the hash array 32
  * times (one `filter` per bit), MinHash k=12 times (one `transform`
  * + `array_min` per seed) — ~130 interpreted passes per document.
  * These expressions make ONE pass in tight Java.
  *
  * Exact-parity contract with the composed forms (all-integer math, so
  * no fp-order subtleties — the DuckDB oracle mirrors the same
  * arithmetic):
  *  - SimHash bit test is `(h / 2^b) % 2 == 1` with Java truncating
  *    division — identical to the composed `(h / bit) % 2 === 1` for
  *    negative inputs too; NULL elements fail the test but still count
  *    in `n` (`size`); a NULL array yields 0L (the composed fold adds
  *    `when(null, …).otherwise(0)` 32 times).
  *  - MinHash element s is `min((2s+1)·h + s·B) mod M` skipping NULLs;
  *    an empty/all-NULL input gives NULL elements; a NULL array gives
  *    an array of k NULLs (the composed `array(array_min(transform(
  *    null)))…` is an array OF nulls, never a null array) — hence
  *    `nullable = false` on both.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 expects array<bigint>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return 0L
    SignatureKernels.simhash32(arr.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.SignatureKernels.simhash32(${c.value});
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

case class MinHashAffine(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "minhash signature length must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) new GenericArrayData(new Array[Any](k))
    else SignatureKernels.minhashAffine(arr.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
        if (${c.isNull}) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
        } else {
          ${ev.value} = graft.functions.SignatureKernels.minhashAffine(${c.value}, $k);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashAffine =
    copy(child = newChild)
}

/** Distinct word n-gram shingles in ONE pass — the native fast path of
  * `TextFunctions.shingles` (r15). The composed form is
  * `array_distinct(transform(sequence(0, size-n), i -> concat(t[i], ' ',
  * …)))`: the transform lambda is interpreted per window (n array gets +
  * a concat each), the sequence materializes an index array per doc, and
  * array_distinct re-walks the result — the signature pass runs this for
  * EVERY document of every batch, making it the tokenize→shingle→minhash
  * pipeline's widest interpreted span. This kernel slides one window,
  * joins with one `UTF8String.concatWs`, and dedups order-preserving in
  * the same pass.
  *
  * Parity with the composed form (asserted in SignatureExpressionsSpec):
  * output order is first-occurrence (array_distinct's rule) over windows
  * in position order; a NULL token nullifies its shingle (`concat`'s
  * NULL propagation), deduped to one NULL like array_distinct; a doc
  * shorter than n (or a NULL token array — `size(NULL) >= n` is NULL →
  * `otherwise`) yields the EMPTY array, so `nullable = false`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be positive")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) new GenericArrayData(Array.empty[Any])
    else SignatureKernels.wordShingles(arr.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
        if (${c.isNull}) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
        } else {
          ${ev.value} = graft.functions.SignatureKernels.wordShingles(${c.value}, $n);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Static single-pass kernels (Scala object = static forwarders for the
  * generated Java).
  */
object SignatureKernels {

  /** One pass over the hashes, 32 bit-counters; composed-form parity
    * documented on [[SimHash32]].
    */
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        var bit = 1L
        while (b < 32) {
          // truncating div/mod — identical to the composed (h / bit) % 2
          if ((h / bit) % 2 == 1) counts(b) += 1
          bit <<= 1
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) * 2 > n) acc |= 1L << b
      b += 1
    }
    acc
  }

  /** One sliding window pass, dedup order-preserving; composed-form
    * parity documented on [[WordShingles]].
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[Any]()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var nul = false
      var j = 0
      while (j < n && !nul) {
        if (arr.isNullAt(i + j)) nul = true
        else parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      // concat's NULL propagation: any NULL token → NULL shingle (do NOT
      // use concatWs semantics, which would skip the NULL part)
      if (nul) seen.add(null)
      else seen.add(
        org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** One pass over the hashes, k running minima. */
  def minhashAffine(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var s = 0
        while (s < k) {
          val v = ((2L * s + 1) * h + s * TextFunctions.MinhashB) % TextFunctions.MinhashMod
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    if (any) {
      var s = 0
      while (s < k) { out(s) = mins(s); s += 1 }
    }
    new GenericArrayData(out)
  }
}
