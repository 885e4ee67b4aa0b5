package graft.io

/** Path normalization — semantics of the reference's `clean_s3_path`
  * (`scripts/compute_kpis.py:42-76`, duplicated at
  * `scripts/load_dynamodb.py:74-101`): collapse doubled slashes everywhere
  * except immediately after the `scheme://` separator. Pure functions,
  * driver-side only.
  */
object PathUtil {

  /** Collapse `//` to `/` in the path part, preserving `scheme://`. */
  def cleanPath(path: String): String =
    path.split("://", 2) match {
      case Array(scheme, rest) => s"$scheme://${dedupeSlashes(rest)}"
      case _                   => dedupeSlashes(path)
    }

  // The reference uses a single non-recursive str.replace("//", "/"),
  // which leaves "///" as "//" — we collapse any run, which is what the
  // function evidently intends.
  private def dedupeSlashes(s: String): String = s.replaceAll("/{2,}", "/")

  /** Split a comma-separated path list (reference `process_streams`
    * argument shape, `scripts/validate_data.py:91-96`) and clean each.
    */
  def splitPaths(paths: String): Seq[String] =
    paths.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(cleanPath).toSeq
}
