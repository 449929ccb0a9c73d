package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Backtick-quoting for arbitrary (metadata-driven) column names —
  * dots/backticks in a name must stay literal, not parse as nested
  * field access. Single definition shared by every operator that
  * builds column references from strings.
  */
private[operators] object Quoting {
  def escape(name: String): String = name.replace("`", "``")

  /** A plain column reference. */
  def qcol(name: String): Column = col(s"`${escape(name)}`")

  /** A reference under a dataset alias or struct prefix
    * (e.g. ref("t", "a.b") -> t.`a.b`).
    */
  def ref(prefix: String, name: String): Column =
    col(s"$prefix.`${escape(name)}`")
}
