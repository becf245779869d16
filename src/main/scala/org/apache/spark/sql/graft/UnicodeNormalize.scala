package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls (one virtual dispatch per row —
  * the NFC/NFKC table walk dominates).
  */
object UnicodeNormalizeHelper {
  private val forms = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  def formOf(name: String): Normalizer.Form =
    forms.getOrElse(name.toUpperCase,
      throw new IllegalArgumentException(
        s"unicode_normalize: unknown form '$name' (NFC|NFD|NFKC|NFKD)"))

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: NFC/NFKC of ASCII (the overwhelming corpus majority) is
    // identity — isNormalized is a cheap quick-check scan before the
    // allocating table walk
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** `unicode_normalize(str, form)` — Unicode normalization (UAX #15) as a
  * native codegen expression: NFC composition for byte-identical dedup keys
  * (é as U+00E9 vs e+U+0301 hash differently but render identically — a
  * classic silent near-dup source), NFKC compatibility folding (ﬁ → fi,
  * fullwidth → ASCII) for tokenizer-facing cleanup. The form is a plan-time
  * literal (it shapes semantics, like `top_k_by_score`'s k); the generated
  * code calls one static helper per row, with an `isNormalized` quick-check
  * so already-normalized (ASCII) rows skip the allocating table walk.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  // validate eagerly: a bad form name is a plan-authoring error
  UnicodeNormalizeHelper.formOf(form)

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  @transient private lazy val f = UnicodeNormalizeHelper.formOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeHelper.normalize(input.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // source-form type name: the binary name (java.text.Normalizer$Form)
    // would make Janino reject the cast and silently drop the whole
    // projection to interpreted eval
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, s => s"""
      |${ev.value} = org.apache.spark.sql.graft.UnicodeNormalizeHelper.normalize($s, $formRef);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
