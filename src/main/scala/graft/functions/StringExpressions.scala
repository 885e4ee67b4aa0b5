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

  /** One zlib deflater + scratch buffer per EXECUTOR THREAD, reused for
    * the thread's lifetime: per-row allocation would dominate, and the
    * thread-local bound means native zlib memory is O(threads), never
    * O(partitions) — no reliance on finalization to release it.
    */
  private val deflaters =
    new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
      override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
        (new java.util.zip.Deflater(), new Array[Byte](64 * 1024))
    }

  /** JVM kernel for [[DeflatedSize]] (public: codegen calls it). */
  def deflatedBytes(bytes: Array[Byte], level: Int): Long = {
    val (d, buf) = deflaters.get()
    d.setLevel(level)
    d.reset() // level change takes effect at reset
    d.setInput(bytes)
    d.finish()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out
  }

  /** Deflated size (bytes) of a string's UTF-8 encoding at the given
    * zlib level — the kernel under `TextAnalysis.compressionRatio`.
    * Accepts any input the engine can hand it (no id-typing contract);
    * deterministic for a given JVM's zlib.
    */
  case class DeflatedSize(child: Expression, level: Int)
      extends UnaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "deflated_size"

    override protected def nullSafeEval(input: Any): Any =
      StringExpressions.deflatedBytes(
        input.asInstanceOf[UTF8String].getBytes, level)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.StringExpressions.deflatedBytes(" +
          s"$c.getBytes(), $level);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def deflatedSize(s: Column, level: Int = 6): Column =
    GraftBridge.column(DeflatedSize(GraftBridge.expression(s), level))
}
