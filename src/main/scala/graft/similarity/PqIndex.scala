package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + fast
  * approximate scoring — the code-level complement of the coarse
  * quantizers (IVF cells bound WHICH vectors to score, q79's scalar
  * int8 shrinks components; PQ replaces each vector with m sub-space
  * codebook ids, here m=8 × 16 codes = 8 half-bytes for a 64-dim
  * vector, a 64× storage cut).
  *
  * Search is asymmetric distance computation (ADC, Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"): the QUERY
  * stays exact; per query a lookup table of <q_sub, centroid>
  * partial dot products is precomputed (m·ksub entries), and scoring
  * a corpus vector is m table lookups — no per-pair float vector
  * work at all. At 100 TB the corpus side carries only codes
  * (bytes/vector), the tables ship with the query, and the scan is
  * bandwidth-bound on 1/64th the bytes.
  *
  * Training reuses the bounded deterministic sample + local Lloyd's
  * of [[IvfIndex]], run once per sub-space on the sliced dimensions.
  * Everything downstream of training is deterministic, so reruns and
  * engines agree on codes (PqIndexSpec pins determinism and bounds
  * ADC+rerank recall against the exact brute force).
  */
object PqIndex {

  /** Codebooks: m sub-spaces × ksub centroids × dsub dims. */
  final case class Model(codebooks: Seq[Seq[Seq[Double]]]) {
    val m: Int = codebooks.length
    val ksub: Int = codebooks.head.length
    val dsub: Int = codebooks.head.head.length

    /** PQ code array for a vector column: per sub-space, the argmin
      * centroid id over the sliced dims — same argmin-over-struct
      * shape as IvfIndex.cell, built on codegen'd vec_dot.
      *
      * The sub-space slice is evaluated through [[encodeFrom]]'s
      * pre-projected columns, not inline: ksub centroid scores share
      * one slice, and Catalyst does not CSE a slice() repeated inside
      * ksub sibling struct expressions (measured 8× re-slicing).
      */
    private def argminCode(vSub: Column, book: Seq[Seq[Double]]): Column =
      array_min(array(book.zipWithIndex.map { case (c, j) =>
        val cLit = array(c.map(lit): _*)
        val c2 = c.map(x => x * x).sum
        struct(
          (graft.functions.VectorFunctions.dot(vSub, cLit) * -2.0 + lit(c2)).as("s"),
          lit(j).as("j"))
      }: _*)).getField("j")

    /** Encode a DataFrame's vector column as `codes`: one projection
      * slicing the m sub-vectors (each evaluated once per row), a
      * second computing the m argmins against slice ATTRIBUTES.
      */
    def encodeFrom(df: DataFrame, vCol: String, as: String): DataFrame = {
      val subCols = (0 until m).map(sub =>
        slice(col(vCol), sub * dsub + 1, dsub).as(s"__pq_sub$sub"))
      val withSubs = df.select((df.columns.map(col).toSeq ++ subCols): _*)
      withSubs
        .withColumn(as, array((0 until m).map(sub =>
          argminCode(col(s"__pq_sub$sub"), codebooks(sub))): _*))
        .drop((0 until m).map(sub => s"__pq_sub$sub"): _*)
    }

    /** ADC score of a code array against a query lookup table column
      * (`array<array<double>>`): an UNROLLED m-term sum of element_at
      * lookups — stays in whole-stage codegen, no lambda
      * interpretation per pair.
      */
    def adcScore(codes: Column, lutCol: Column): Column =
      (0 until m).map(sub =>
        element_at(element_at(lutCol, sub + 1), element_at(codes, sub + 1) + 1))
        .reduce(_ + _)

    /** ADC lookup table for one query vector (driver-side): m × ksub
      * partial inner products <q_sub, centroid>. Scoring a code array
      * is then sum(lut(sub)(code)).
      */
    def lut(q: Array[Double]): Array[Array[Double]] =
      Array.tabulate(m) { sub =>
        Array.tabulate(ksub) { j =>
          val c = codebooks(sub)(j)
          var s = 0.0
          var t = 0
          while (t < dsub) { s += q(sub * dsub + t) * c(t); t += 1 }
          s
        }
      }
  }

  def train(
      vectors: DataFrame,
      vCol: String,
      m: Int,
      ksub: Int,
      sampleIdCol: Option[String] = None,
      maxIter: Int = 10): Model = {
    val sample = IvfIndex.collectSample(vectors, vCol, sampleIdCol)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).map { sub =>
      val sliced = sample.map(_.slice(sub * dsub, (sub + 1) * dsub))
      IvfIndex.lloyd(sliced, ksub, maxIter).map(_.toSeq).toSeq
    }
    Model(books)
  }
}
