package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot fingerprinting path.
  *
  * These stay inside whole-stage codegen (doGenCode emits a static call into
  * [[KGramKernels]]) — the reference's equivalent is its rolling-window
  * encode+hash loop (/root/reference/src/abstract_bqf.cpp:212-245), here a
  * columnar kernel instead of a per-sequence loop.
  */
case class SgramFingerprintsExpr(child: Expression, s: Int, hashBits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    KGramKernels.sgramFingerprints(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], s, hashBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.sgramFingerprints($c, $s, $hashBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class ShingleFingerprintsExpr(child: Expression, n: Int, hashBits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    KGramKernels.shingleFingerprints(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, hashBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.shingleFingerprints($c, $n, $hashBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class SmShingleFingerprintsExpr(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    KGramKernels.smShingleFingerprints(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.smShingleFingerprints($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class SimhashExpr(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KGramKernels.simhash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.simhash($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class MinhashSignatureExpr(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    KGramKernels.minhashSignature(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.minhashSignature($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class DocFingerprintExpr(child: Expression, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KGramKernels.docFingerprint(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.docFingerprint($c, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class HyperplaneSigExpr(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes >= 1 && planes <= 64, s"planes must be in [1, 64], got $planes")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KGramKernels.hyperplaneSig(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGramKernels.hyperplaneSig($c, $planes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KGramKernels.floatDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KGramKernels.floatDot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FloatDoubleDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KGramKernels.floatDoubleDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KGramKernels.floatDoubleDot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API surface of the fingerprint kernels. */
object GraftFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Array of xxh64 fingerprints of every s-token window of a tokens array. */
  def sgram_fingerprints(tokens: Column, s: Int, hashBits: Int = 64, seed: Long = 0L): Column =
    col(SgramFingerprintsExpr(expr(tokens), s, hashBits, seed))

  /** Array of xxh64 fingerprints of every n-char shingle of a text column. */
  def shingle_fingerprints(text: Column, n: Int, hashBits: Int = 64, seed: Long = 0L): Column =
    col(ShingleFingerprintsExpr(expr(text), n, hashBits, seed))

  /** Array of splitmix64(poly31) fingerprints of every n-char shingle —
    * the SQL-replayable feature-hash family (see KGramKernels). */
  def sm_shingle_fingerprints(text: Column, n: Int, seed: Long = 0L): Column =
    col(SmShingleFingerprintsExpr(expr(text), n, seed))

  /** 64-bit SimHash signature of a text column over n-char shingles. */
  def simhash(text: Column, n: Int, seed: Long = 0L): Column =
    col(SimhashExpr(expr(text), n, seed))

  /** MinHash signature (k mins) over n-char shingles of a text column. */
  def minhash_signature(text: Column, n: Int, k: Int, seed: Long = 0L): Column =
    col(MinhashSignatureExpr(expr(text), n, k, seed))

  /** Rolling polynomial document fingerprint (mod 2^61-1). */
  def doc_fingerprint(text: Column, seed: Long = 0L): Column =
    col(DocFingerprintExpr(expr(text), seed))

  /** Codegen double-precision dot product of two array<float> columns. */
  def float_dot(a: Column, b: Column): Column =
    col(FloatDotExpr(expr(a), expr(b)))

  /** Codegen dot product of an array<float> column with an array<double>
    * column (typically a centroid literal): each float widened to double,
    * summed left to right — bit-identical to the aggregate/zip_with form.
    */
  def float_double_dot(a: Column, b: Column): Column =
    col(FloatDoubleDotExpr(expr(a), expr(b)))

  /** Signed-random-projection signature (seed-derived hyperplanes). */
  def hyperplane_sig(embedding: Column, planes: Int, seed: Long = 0L): Column =
    col(HyperplaneSigExpr(expr(embedding), planes, seed))
}
