package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-canonicalization expressions. Unicode normalization is
  * the step every dedup/hash pipeline needs BEFORE content hashing:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are different
  * byte strings — different MD5s, different MinHash shingles, different
  * exact-dedup groups — for text any human reads as identical. NFC is
  * the canonical-composition form (UAX #15); both the JDK and DuckDB
  * implement the same Unicode algorithm, which is what makes the m-gate
  * oracle cross-check meaningful.
  *
  * Implemented as a codegen'd Catalyst expression, not a UDF: the
  * normalize call stays inside WholeStageCodegen (no ScalaUDF stage
  * break, no row boxing), and the fast path short-circuits —
  * `Normalizer.isNormalized` is O(n) scan-only for the ASCII/already-NFC
  * overwhelming majority, avoiding the allocation entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point (expression registered by GraftExtensions). */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}
