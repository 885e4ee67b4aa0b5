package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string kernels for corpus canonicalization.
  *
  * Same design contract as [[VectorExpressions]]: tight codegen with an
  * `eval` fallback, deterministic semantics every engine in the
  * pipeline can reproduce (DuckDB's `nfc_normalize`, ICU/utf8proc
  * sidecars — all implement the same Unicode normalization spec).
  */
object StringExpressions {

  /** Unicode NFC normalization — the canonicalization step a dedup
    * pipeline needs BEFORE hashing: `e` + U+0301 (combining acute) and
    * the precomposed `é` are the same text to a reader but different
    * bytes to `md5`, so un-normalized corpora silently under-dedup
    * (and over-count vocabulary). Spark has no built-in for this;
    * `java.text.Normalizer` is the platform implementation of UAX #15.
    * The already-normalized fast path (the overwhelming majority of
    * real text) returns the input `UTF8String` without re-encoding.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        s"""
           |String $s = $c.toString();
           |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
           |  ? $c
           |  : org.apache.spark.unsafe.types.UTF8String.fromString(
           |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfc(s: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(s)))
}
