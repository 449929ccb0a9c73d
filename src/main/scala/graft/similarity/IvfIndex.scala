package graft.similarity

import graft.functions.{VectorFunctions => V}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index: a trained
  * coarse quantizer (k-means centroids) partitions the corpus into
  * cells; queries probe only the nProbe nearest cells.
  *
  * This is the trained counterpart of the hyperplane-LSH path
  * (VectorQueries.q29): LSH needs no training and gives random cells;
  * IVF spends a training pass to get data-adaptive cells, which at
  * 100 TB means fewer probes for the same recall. Centroids are tiny
  * (k·dim doubles) and ship to executors as literal expressions — the
  * corpus-side cell assignment is a narrow scan, and the candidate
  * join shuffles by cell id exactly like the LSH bucket join.
  */
object IvfIndex {

  final case class Model(centroids: Seq[Seq[Double]]) {

    private def negScore(v: Column, c: Seq[Double]): Column = {
      // rank cells by ||v - c||^2 = ||v||^2 - 2<v,c> + ||c||^2;
      // ||v||^2 is common to all cells, so -2<v,c> + ||c||^2 suffices
      val cLit = array(c.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      V.dot(v, cLit) * -2.0 + lit(c2)
    }

    /** Cell id of each vector: argmin over centroids. */
    def cell(v: Column): Column =
      array_min(array(centroids.zipWithIndex.map { case (c, j) =>
        struct(negScore(v, c).as("s"), lit(j).as("j"))
      }: _*)).getField("j")

    /** The nProbe nearest cell ids for a query vector. */
    def probeCells(v: Column, nProbe: Int): Column =
      transform(
        slice(array_sort(array(centroids.zipWithIndex.map { case (c, j) =>
          struct(negScore(v, c).as("s"), lit(j).as("j"))
        }: _*)), 1, nProbe),
        x => x.getField("j"))
  }

  /** Train the coarse quantizer. Deterministic for a fixed seed and
    * dataset. When `sampleIdCol` is given, training runs on a
    * deterministic content-hash quarter of the corpus (q33's sampling
    * pattern) — the 100 TB posture: centroid quality needs a sample,
    * not the corpus, and the sample is reproducible across engines
    * and reruns with no RNG coordination.
    */
  def train(
      vectors: DataFrame,
      vCol: String,
      k: Int,
      seed: Long = 42L,
      sampleIdCol: Option[String] = None,
      maxIter: Int = 10): Model = {
    val trainSet = sampleIdCol.fold(vectors) { id =>
      vectors.filter(
        substring(md5(concat(lit("ivf-train|"), col(id).cast("string"))), 1, 1)
          .isin("0", "1", "2", "3"))
    }
    val assembled = trainSet.select(array_to_vector(col(vCol)).as("features"))
    // a COARSE quantizer needs rough cells, not converged centroids —
    // 10 rounds is plenty; IvfIndexSpec bounds recall@3 so a quantizer
    // regression fails the suite even though q42 is rows-only checked
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(assembled)
    Model(model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }
}
