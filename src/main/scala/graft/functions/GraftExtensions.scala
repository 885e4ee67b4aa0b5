package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook exposing the engine's custom Catalyst
  * expressions to SQL users:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT dot_product_double(a.v, b.v) FROM ...
  * }}}
  *
  * (Scala callers use `VectorExpressions.dotD` directly; this makes the
  * same codegen'd kernel reachable from pure-SQL workloads.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_double"),
      new ExpressionInfo(classOf[VectorExpressions.DotProductDouble].getName,
        "dot_product_double"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_double(arrayA, arrayB)")
        VectorExpressions.DotProductDouble(children.head, children(1))
      }))

    // SQL form of the MinHash kernel: coefficients derive from the
    // (numHashes, seed) literals exactly as Dedup.hashCoeffs does, so
    // SQL users get bit-identical signatures to the Scala pipeline.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[VectorExpressions.MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash_sig(baseHashes, numHashes, seed)")
        val n = litInt(children(1), "numHashes")
        val seed = litInt(children(2), "seed").toLong
        val (as, bs) = graft.ops.Dedup.hashCoeffs(n, seed)
        VectorExpressions.MinHashSig(children.head, as, bs, (1L << 61) - 1)
      }))

    // SQL form of the SimHash kernel over an array of 64-bit token hashes.
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[VectorExpressions.SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash_sig(tokenHashes)")
        VectorExpressions.SimHashSig(children.head)
      }))

    // Unicode NFC normalization (UAX #15) — name-compatible with
    // DuckDB's nfc_normalize so cross-engine SQL ports verbatim.
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[StringExpressions.NfcNormalize].getName,
        "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize(text)")
        StringExpressions.NfcNormalize(children.head)
      }))

    // Web-curation macros: the SAME Column chains the Scala API runs
    // (Web.canonicalUrl / registrableDomain, TextAnalysis.stripHtml),
    // re-expressed as SQL functions — an injected builder may return a
    // composite expression tree, so SQL users get bit-identical
    // canonicalization/extraction to the Scala pipeline.
    def columnMacro(name: String, owner: String, arity: Int,
                    f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
    : Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(owner, name),
        (children: Seq[Expression]) => {
          require(children.size == arity, s"$name takes $arity argument(s)")
          org.apache.spark.sql.GraftBridge.expressionEager(
            f(children.map(org.apache.spark.sql.GraftBridge.column)))
        }))

    columnMacro("canonical_url", "graft.ops.Web", 1,
      cs => graft.ops.Web.canonicalUrl(cs.head))
    columnMacro("registrable_domain", "graft.ops.Web", 1,
      cs => graft.ops.Web.registrableDomain(cs.head))
    columnMacro("strip_html", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.stripHtml(cs.head))

    // r10 sweep (round-9 verdict item 4): the r9 audit families' map-side
    // kernels, registered on the SAME Column trees the DataFrame ops
    // build (struct-returning macros — `SELECT readability(text).flesch`)
    // so pure-SQL curation stacks compute bit-identical verdicts.
    columnMacro("readability", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.readabilityStruct(cs.head))
    columnMacro("script_profile", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.scriptProfileStruct(cs.head))
    columnMacro("mixed_script", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.mixedScriptStruct(cs.head))
    columnMacro("meta_robots", "graft.ops.Web", 1,
      cs => graft.ops.Web.metaRobotsStruct(cs.head))
    columnMacro("language_id", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.languageId(cs.head))
    columnMacro("bpeish_token_count", "graft.ops.TextAnalysis", 1,
      cs => graft.ops.TextAnalysis.bpeishTokenCount(cs.head))

    // Codegen'd scalar kernels exposed directly (no macro indirection).
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[StringExpressions.JaroWinkler].getName,
        "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler(a, b)")
        StringExpressions.JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("deflated_size"),
      new ExpressionInfo(classOf[StringExpressions.DeflatedSize].getName,
        "deflated_size"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "deflated_size(text[, level])")
        val level = if (children.size == 2) litInt(children(1), "level") else 6
        StringExpressions.DeflatedSize(children.head, level)
      }))
  }
}
