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
