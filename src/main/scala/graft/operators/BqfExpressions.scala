package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over a broadcast sketch — the query-side
  * replacements for the round-1 scalar UDFs, which paid a boxing +
  * Scala-conversion toll per row. The broadcast HANDLE rides inside the
  * expression tree (a few bytes per task; the sketch itself moves once per
  * executor via the torrent broadcast, exactly like the UDF closures did).
  *
  * All three stay inside whole-stage codegen (addReferenceObj + a direct
  * static/virtual call); input types are declared via ExpectsInputTypes so a
  * mistyped column fails at analysis time, not as a ClassCastException in
  * executor codegen.
  */
case class BqfAbundanceExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    bc.value.filter.abundance(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bqfBc", bc, classOf[Broadcast[SketchRef]].getName)
    // resolve broadcast.value() + the SketchRef lazy val ONCE per generated
    // class instance, not per row: at 10^8 probes the per-row volatile
    // reads are measurable against a ~20 ns probe kernel
    val f = ctx.addMutableState("graft.core.BackpackFilter", "bqfFilter",
      v => s"$v = ((graft.operators.SketchRef) $bcRef.value()).filter();")
    defineCodeGen(ctx, ev, c => s"$f.abundance($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class BqfContainsExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    bc.value.filter.contains(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bqfBc", bc, classOf[Broadcast[SketchRef]].getName)
    val f = ctx.addMutableState("graft.core.BackpackFilter", "bqfFilter",
      v => s"$v = ((graft.operators.SketchRef) $bcRef.value()).filter();")
    defineCodeGen(ctx, ev, c => s"$f.contains($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Static entry point for the generated code of [[BqfSequenceStatsExpr]]:
  * runs the Fimpera ring-buffer loop and packs the four stats into an
  * InternalRow (the codegen value type for a struct).
  */
object BqfKernels {
  def sequenceStatsRow(filter: graft.core.BackpackFilter, tokens: ArrayData): InternalRow = {
    val st = filter.sequenceStats(tokens.toIntArray())
    new GenericInternalRow(Array[Any](st.minimum, st.maximum, st.average, st.presenceRatio))
  }
}

/** Fimpera per-sequence statistics over an array<int> tokens column
  * (ref abstract_bqf.cpp:195-248), struct-typed like the UDF it replaces.
  * Generates code since r3 — CodegenFallback broke the whole-stage span of
  * every probe pipeline it appeared in (round-2 verdict item 4); now the
  * expression is one static call from generated code, like the scalar two.
  */
case class BqfSequenceStatsExpr(child: Expression, bc: Broadcast[SketchRef])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("minimum", LongType, nullable = false),
    StructField("maximum", LongType, nullable = false),
    StructField("average", DoubleType, nullable = false),
    StructField("presenceRatio", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    BqfKernels.sequenceStatsRow(bc.value.filter, input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bqfBc", bc, classOf[Broadcast[SketchRef]].getName)
    val f = ctx.addMutableState("graft.core.BackpackFilter", "bqfFilter",
      v => s"$v = ((graft.operators.SketchRef) $bcRef.value()).filter();")
    defineCodeGen(ctx, ev, c => s"graft.operators.BqfKernels.sequenceStatsRow($f, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
