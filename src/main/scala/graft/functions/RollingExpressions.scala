package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.RollingHash

/** Codegen glue for the Rabin-Karp winnowing sketch (graft.core.RollingHash)
  * — replaces the round-1 Scala UDFs so the whole text-dedup surface stays
  * inside whole-stage codegen like every other graft expression. */
object RollingRuntime {
  def minSketch(text: UTF8String, w: Int, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(RollingHash.minSketch(text.toString, w, k))
  def minFingerprint(text: UTF8String, w: Int): Long =
    RollingHash.minFingerprint(text.toString, w)
}

/** rolling_min_sketch(text, w, k) -> ARRAY<BIGINT>: the k smallest distinct
  * w-char Rabin-Karp window hashes, ascending (shift-robust near-dup sketch). */
case class RollingMinSketch(child: Expression, w: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_min_sketch"
  override protected def nullSafeEval(text: Any): Any =
    RollingRuntime.minSketch(text.asInstanceOf[UTF8String], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text =>
      s"graft.functions.RollingRuntime.minSketch($text, $w, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** rolling_min_fp(text, w) -> BIGINT: minimum w-char window hash. */
case class RollingMinFingerprint(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_min_fp"
  override protected def nullSafeEval(text: Any): Any =
    RollingRuntime.minFingerprint(text.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text =>
      s"graft.functions.RollingRuntime.minFingerprint($text, $w)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingFunctions {
  import ColumnBridge.{column, expression}
  def rollingMinSketch(text: Column, w: Int, k: Int): Column =
    column(RollingMinSketch(expression(text), w, k))
  def rollingMinFingerprint(text: Column, w: Int): Column =
    column(RollingMinFingerprint(expression(text), w))
}
