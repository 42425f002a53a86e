package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen expressions for the embedding-similarity hot path (SURVEY.md
 * §2.K8/K11-K13). Round-6 optimization: the previous forms composed
 * Catalyst higher-order functions (`transform`, `zip_with`, `aggregate`),
 * and HOF lambdas evaluate INTERPRETED — outside whole-stage codegen, one
 * boxed lambda invocation per vector component per candidate pair (the
 * same structural class the K2 MinHash build was re-planned out of in
 * round 5; guide §4 "prefer built-ins/codegen expressions"). These
 * expressions run the identical integer arithmetic as a flat loop over
 * the (Unsafe)ArrayData — no per-element boxing, no lambda frames, inside
 * whole-stage codegen.
 *
 * Exact-equality contract with the HOF forms they replace (asserted in
 * VectorSpec, and transitively by every q_sim / q_dup_embedding oracle):
 *  - quantize_vec(v)[i]  == floor(CAST(v[i] AS DOUBLE) * 1000) as LONG,
 *    null elements stay null, null array -> null;
 *  - qdot_long(a, b)     == aggregate(zip_with(a, b, (x,y) => x*y), 0L, +):
 *    null when the lengths differ (zip_with pads with null, and a null
 *    poisons the running sum) or when any element is null, else the sum.
 *    Known divergence OUTSIDE the embedding range: on long overflow
 *    (|component| >= ~3e9 quantized, i.e. raw values >= ~3e6) this wraps
 *    where the HOF form under ANSI mode (Spark 4 default) threw — callers
 *    feeding un-normalized vectors should range-check first;
 *  - lsh_bucket(v)       == the plane-sign bucket of the HOF form,
 *    including its degenerate cases: a null vector, a length != dim, or
 *    any null component make every plane sum null, which the original
 *    `when(sum > 0, bit).otherwise(0)` chain turns into bucket 0 — so
 *    this expression is TOTAL (never null), exactly like the original.
 */
object VectorRuntime {

  def quantizeFloat(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { if (v.isNullAt(i)) hasNull = true; i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = Math.floor(v.getFloat(i).toDouble * 1000.0).toLong
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null
                 else Long.box(Math.floor(v.getFloat(i).toDouble * 1000.0).toLong)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def quantizeDouble(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { if (v.isNullAt(i)) hasNull = true; i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = Math.floor(v.getDouble(i) * 1000.0).toLong
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null
                 else Long.box(Math.floor(v.getDouble(i) * 1000.0).toLong)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Boxed so the null contract (length mismatch / null element) survives
    * the codegen boundary in one call. */
  def qdot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    Long.box(s)
  }

  /** Plane sign of component i of plane j: +1 when (i*31 + j*17) % 7 < 3
    * else -1 — the fixed pseudo-hyperplane family of Similarity.lshPlane. */
  private def sign(i: Int, j: Int): Long =
    if ((i * 31 + j * 17) % 7 < 3) 1L else -1L

  def lshBucketFloat(v: ArrayData, dim: Int, planes: Int): Long = {
    val n = v.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    val sums = new Array[Long](planes)
    i = 0
    while (i < n) {
      val q = Math.floor(v.getFloat(i).toDouble * 1000.0).toLong
      var j = 0
      while (j < planes) { sums(j) += q * sign(i, j); j += 1 }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes) { if (sums(j) > 0) bucket += (1L << j); j += 1 }
    bucket
  }

  def lshBucketDouble(v: ArrayData, dim: Int, planes: Int): Long = {
    val n = v.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    val sums = new Array[Long](planes)
    i = 0
    while (i < n) {
      val q = Math.floor(v.getDouble(i) * 1000.0).toLong
      var j = 0
      while (j < planes) { sums(j) += q * sign(i, j); j += 1 }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes) { if (sums(j) > 0) bucket += (1L << j); j += 1 }
    bucket
  }
}

/** quantize_vec(v ARRAY<FLOAT|DOUBLE>) -> ARRAY<LONG>: floor(x*1000). */
case class QuantizeVec(child: Expression)
    extends UnaryExpression {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val runtimeFn: String =
    if (elemType == FloatType) "quantizeFloat" else "quantizeDouble"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_vec"
  override protected def nullSafeEval(v: Any): Any =
    if (elemType == FloatType) VectorRuntime.quantizeFloat(v.asInstanceOf[ArrayData])
    else VectorRuntime.quantizeDouble(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorRuntime.$runtimeFn($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** qdot_long(a, b ARRAY<LONG>) -> LONG: sum of pairwise products; null on
  * length mismatch or any null element (zip_with+aggregate parity). */
case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorRuntime.qdot($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(l, r)
}

/** lsh_bucket(v ARRAY<FLOAT|DOUBLE>) -> LONG bucket of `planes` sign bits.
  * TOTAL: null/odd-shaped inputs yield bucket 0 (the HOF form's behavior —
  * `when(null > 0, bit).otherwise(0)` takes the otherwise branch). */
case class LshBucketExpr(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in 1..63, got $planes")
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val runtimeFn: String =
    if (elemType == FloatType) "lshBucketFloat" else "lshBucketDouble"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket needs ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else if (elemType == FloatType)
      VectorRuntime.lshBucketFloat(v.asInstanceOf[ArrayData], dim, planes)
    else VectorRuntime.lshBucketDouble(v.asInstanceOf[ArrayData], dim, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = graft.functions.VectorRuntime.$runtimeFn(
         |    ${childGen.value}, $dim, $planes);
         |}
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorFunctions {
  import ColumnBridge.{column, expression}
  def quantizeVec(v: Column): Column = column(QuantizeVec(expression(v)))
  def qdotLong(a: Column, b: Column): Column =
    column(QDotLong(expression(a), expression(b)))
  def lshBucket(v: Column, dim: Int, planes: Int): Column =
    column(LshBucketExpr(expression(v), dim, planes))
}
