package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over a broadcast sketch — the query-side
  * replacements for the round-1 scalar UDFs, which paid a boxing +
  * Scala-conversion toll per row. The broadcast HANDLE rides inside the
  * expression tree (a few bytes per task; the sketch itself moves once per
  * executor via the torrent broadcast, exactly like the UDF closures did).
  *
  * Abundance/membership stay inside whole-stage codegen (addReferenceObj +
  * a direct virtual call); sequenceStats returns a struct and keeps an
  * interpreted eval (CodegenFallback) — its per-row cost is the Fimpera
  * ring-buffer loop itself, not the row glue.
  */
case class BqfAbundanceExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    bc.value.filter.abundance(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bqfBc", bc, classOf[Broadcast[SketchRef]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((graft.operators.SketchRef) $bcRef.value()).filter().abundance($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class BqfContainsExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    bc.value.filter.contains(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bqfBc", bc, classOf[Broadcast[SketchRef]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((graft.operators.SketchRef) $bcRef.value()).filter().contains($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Fimpera per-sequence statistics over an array<int> tokens column
  * (ref abstract_bqf.cpp:195-248), struct-typed like the UDF it replaces.
  */
case class BqfSequenceStatsExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("minimum", LongType, nullable = false),
    StructField("maximum", LongType, nullable = false),
    StructField("average", DoubleType, nullable = false),
    StructField("presenceRatio", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val st = bc.value.filter.sequenceStats(input.asInstanceOf[ArrayData].toIntArray())
    InternalRow(st.minimum, st.maximum, st.average, st.presenceRatio)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
