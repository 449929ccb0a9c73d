package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY §2 #28–#30).
  *
  * Cosine is computed as a strict left-to-right double fold so both
  * engines produce bit-identical values (floats are cast to double
  * BEFORE any arithmetic — mixed float/double accumulation would
  * diverge between engines).
  *
  * Random-hyperplane LSH uses md5-derived ±1 planes — deterministic,
  * seedless, identical across engines and across cluster runs.
  */
object VectorFunctions {

  /** Cast a float array column to double element-wise. Spelled as an
    * array Cast (codegen'd) rather than transform(_.cast) — same
    * element-wise widening, but higher-order transform is
    * CodegenFallback and would interpret once per row.
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd strict left-to-right fold (graft.plans.VecDot;
    * requires GraftExtensions on the session). Bit-identical to
    * [[dotDeclarative]] — VecDotSpec pins the equality.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** The declarative form [[dot]] replaces — kept as the spec's
    * ground truth and for sessions without GraftExtensions.
    */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with per-row precomputed norms. Bit-identical to
    * [[cosine]] (same operations in the same order — the norms are
    * merely cached), but the per-pair cost drops from three array
    * folds to one: each side's norm is computed once per ROW in its
    * pre-join projection and arrives at the pair expression as a
    * plain attribute (a Project below a Join is never inlined across
    * it, so Catalyst cannot re-expand the fold per pair).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** DuckDB twin: identical fold shape (list_sum of element products
    * starting from the first element equals the 0.0-seeded fold
    * bit-for-bit, since 0.0 + x == x in IEEE754).
    */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_apply(range(1, len($a)+1), i -> ($a)[i]*($b)[i]))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  // ---------- random-hyperplane LSH ----------

  /** Deterministic ±1.0 from the low bit of md5(tag) — the one shared
    * derivation behind LSH plane components and ScaleUp's replica
    * isometries, so the two can never silently diverge.
    */
  def signFromMd5(tag: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    if ((hex(0) & 1) == 1) 1.0 else -1.0
  }

  /** Plane component (j,i) ∈ {-1.0, +1.0}. Materialized as literal
    * arrays so both engines embed the identical constants.
    */
  private def planeComponent(j: Int, i: Int): Double = signFromMd5(s"plane-$j|$i")

  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(j => (0 until dim).map(i => planeComponent(j, i)))

  /** LSH bucket id: sign bits of the vector's dot products with the
    * planes, packed into an int. Signed components are ±1 so the dot
    * product is an exact signed sum — no float-order sensitivity in
    * the bucket assignment beyond the double sum itself (identical
    * fold both engines).
    */
  def lshBucket(v: Column, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  def lshBucketSql(vSql: String, ps: Seq[Seq[Double]]): String =
    ps.zipWithIndex.map { case (p, j) =>
      val arr = p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql(vSql, arr)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
