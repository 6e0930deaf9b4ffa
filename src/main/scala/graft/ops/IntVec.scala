package graft.ops

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Integer vector kernels for the oracle-exact ANN / embedding-dedup
  * twins (the q20/q21/q25/q54 playbook: every arithmetic step an integer,
  * so an external SQL engine can replay it bit-for-bit).
  *
  * Static methods so generated code can call them directly (same shape
  * as [[RhpKernel]]); each expression below has real `doGenCode` so the
  * hot loop stays inside whole-stage codegen instead of per-element
  * `zip_with`/`aggregate` lambda evaluation.
  *
  * Overflow audit (callers pin these bounds in IntVecSpec): with
  * per-component magnitude `m` and dimension `dim`, dot/l2 accumulate at
  * most `dim * m^2` — for the quantized-embedding path (m <= ~600 at
  * quant=1000, dim=64) that is ~2.2e7, and the cosine-threshold
  * comparison squares it once more (~1.9e17 * thrDen^2/400), still
  * inside Long under Spark's default ANSI arithmetic.
  */
object IntVecKernel {
  /** md5-derived +/-1 hyperplane weights, memoized per (table, bits, dim)
    * per JVM. Derivation is the SQL-replayable contract:
    * `w(t,b,d) = +1` iff the integer value of the first 7 hex chars of
    * `md5("rhp:" + t + ":" + b + ":" + d)` is odd, else -1 — DuckDB:
    * `CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) % 2`.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()

  def weights(table: Int, bits: Int, dim: Int): Array[Byte] =
    cache.computeIfAbsent((table, bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Byte](bits * dim)
      var b = 0
      while (b < bits) {
        var d = 0
        while (d < dim) {
          md.reset()
          val h = md.digest(s"rhp:$table:$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 7 hex chars = top 28 bits; parity = bit 4 of h(3)
          val parity = (h(3) >>> 4) & 1
          w(b * dim + d) = if (parity == 1) 1 else -1
          d += 1
        }
        b += 1
      }
      w
    })

  /** `bits`-bit sign key of a long-quantized vector under the md5
    * hyperplane family of `table`: bit b set iff sum_d w(t,b,d)*q_d >= 0.
    */
  def rhpKeyL(q: ArrayData, bits: Int, table: Int): Long = {
    val dim = q.numElements()
    val w = weights(table, bits, dim)
    var key = 0L
    var b = 0
    while (b < bits) {
      var s = 0L
      var d = 0
      val off = b * dim
      while (d < dim) { s += w(off + d) * q.getLong(d); d += 1 }
      if (s >= 0L) key |= (1L << b)
      b += 1
    }
    key
  }

  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Squared L2 over integer-valued FLOAT arrays (the q25/q54 vectors are
    * integer-valued but stored float): `(long)float` is exact for
    * integer values, so the result is the exact integer distance.
    */
  def l2F(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toLong - b.getFloat(i).toLong
      s += d * d
      i += 1
    }
    s
  }

  def l2L(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Long dot product of two `array<long>` columns (exact; codegen'd). */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntVecKernel.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.IntVecKernel.dotL($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Exact integer squared-L2 distance between two integer-valued vectors
  * (`array<long>`, or `array<float>` whose values are integers — the
  * q25/q54 synthetic-lattice vectors). Replaces the former
  * `aggregate(zip_with(...))` higher-order chain on the IVF/PQ oracle
  * paths: one codegen'd kernel call per row instead of 2*dim lambda
  * evaluations.
  */
case class IntL2Squared(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val floatElems: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (floatElems)
      IntVecKernel.l2F(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      IntVecKernel.l2L(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (floatElems) "l2F" else "l2L"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.IntVecKernel.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `array<long>` -> `bits`-bit md5-hyperplane sign key for LSH table
  * `table`. The integer twin of [[RandomHyperplaneSign]]: weights are
  * +/-1 from md5 parity (SQL-recomputable, see [[IntVecKernel.weights]])
  * and the projection is an exact integer sum, so bucket keys are
  * replayable relationally — no float sign anywhere.
  */
case class MdIntRhpSign(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must fit a long sign key")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    IntVecKernel.rhpKeyL(v.asInstanceOf[ArrayData], bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.ops.IntVecKernel.rhpKeyL($arr, $bits, $table);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
