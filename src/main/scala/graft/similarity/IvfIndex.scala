package graft.similarity

import graft.functions.{VectorFunctions => V}
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

    /** ||c||² per centroid, driver-computed with the same left-to-right
      * double fold [[negScore]] embeds as a literal — the data-literal
      * [[cell]] and the expanded form stay bit-identical. */
    private lazy val norms: Seq[Double] = centroids.map(_.map(x => x * x).sum)

    /** Cell id of each vector: argmin over centroids.
      *
      * The codebook travels as ONE nested-array Literal (a single plan
      * node CARRYING k·dim doubles as data) scored by a higher-order
      * transform — expression-tree size is O(1) in k, where the naive
      * `array(struct(...k entries...))` spelling is O(k·dim) literal
      * NODES and stops compiling long before SemDeDup's k = N/500
      * design point (k ≈ 2M at 100 TB). Same FLOPs, same strict
      * left-to-right fold, same (s, j) tie-break — IvfIndexSpec pins
      * bit-equality against [[cellExpanded]] and plan-node count
      * independence of k.
      */
    def cell(v: Column): Column = {
      val book = typedLit(centroids)
      val ns = typedLit(norms)
      array_min(transform(book, (c, j) =>
        struct((V.dot(v, c) * -2.0 + element_at(ns, j + 1)).as("s"),
          j.as("j")))).getField("j")
    }

    /** The O(k·dim)-node spelling [[cell]] replaces — kept as the
      * spec's bit-equality ground truth (small k only). */
    private[similarity] def cellExpanded(v: Column): Column =
      array_min(array(centroids.zipWithIndex.map { case (c, j) =>
        struct(negScore(v, c).as("s"), lit(j).as("j"))
      }: _*)).getField("j")

    /** The nProbe nearest cell ids for a query vector — the same
      * data-literal spelling as [[cell]] (O(1) plan nodes in k), same
      * (s, j) sort as the expanded form bit-for-bit. */
    def probeCells(v: Column, nProbe: Int): Column = {
      val book = typedLit(centroids)
      val ns = typedLit(norms)
      transform(
        slice(array_sort(transform(book, (c, j) =>
          struct((V.dot(v, c) * -2.0 + element_at(ns, j + 1)).as("s"),
            j.as("j")))), 1, nProbe),
        x => x.getField("j"))
    }

    /** The O(k·dim)-node spelling [[probeCells]] replaces — the spec's
      * bit-equality ground truth (small k only). */
    private[similarity] def probeCellsExpanded(v: Column, nProbe: Int): Column =
      transform(
        slice(array_sort(array(centroids.zipWithIndex.map { case (c, j) =>
          struct(negScore(v, c).as("s"), lit(j).as("j"))
        }: _*)), 1, nProbe),
        x => x.getField("j"))

    /** Driver-side twin of [[probeCells]] for query sets that are
      * collected anyway (e.g. PQ lookup-table construction): the SAME
      * -2<v,c>+||c||² ranking with the same strict left-to-right
      * float fold and (score, j) tie-break as the Column form, so
      * local probe lists agree bit-for-bit with distributed cell
      * assignment.
      */
    def probeCellsLocal(q: Array[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, j) =>
        var s = 0.0
        var t = 0
        while (t < c.length) { s += q(t) * c(t); t += 1 }
        (s * -2.0 + c.map(x => x * x).sum, j)
      }.sortBy(identity).take(nProbe).map(_._2)
  }

  /** Two-level (coarse → fine) quantizer for corpus-adaptive cell
    * counts: ~√k top-level centroids, then ~√k fine centroids trained
    * WITHIN each top cell; a vector's cell id is
    * `offset(top) + fineArgmin`. This is the standard scalable answer
    * (FAISS's IMI family) to a k that GROWS with the corpus
    * (SemDeDup's k = N/500): a flat quantizer pays O(k·dim) per row
    * to assign and O(sample·k·dim) to train — both quadratic-ish in N
    * while the sample cap hasn't kicked in, and 2M dot products per
    * row at the 100 TB point (N=10⁹, k=2M). Two levels pay
    * O(2√k·dim) per row (top argmin, then ONLY the matched top
    * cell's fine argmin — the codebooks ride in one nested-array
    * Literal indexed by the top id, so the PLAN is O(1) in k too) and
    * O(sample·2√k·dim) to train — ~1.4k dots per row at the same
    * 100 TB point.
    *
    * Same determinism story as [[Model]]: content-hash sample,
    * spaced-rank init, fixed iterations, no RNG anywhere; an empty
    * top cell keeps its top centroid as its only fine centroid so
    * every top id still maps to ≥1 global cell.
    */
  final case class TwoLevelModel(
      top: Seq[Seq[Double]], fine: Seq[Seq[Seq[Double]]]) {
    require(top.length == fine.length, "one fine codebook per top cell")

    private val offsets: Seq[Int] = fine.scanLeft(0)(_ + _.length).init
    val numCells: Int = fine.map(_.length).sum

    /** Top-level cell id — O(|top|·dim) per row, O(1) plan nodes
      * (the data-literal [[Model.cell]]). */
    def topCell(v: Column): Column = Model(top).cell(v)

    /** ||c||² per fine centroid, same driver-side fold as
      * [[Model.norms]] so both cell forms stay bit-identical. */
    private lazy val fineNorms: Seq[Seq[Double]] =
      fine.map(_.map(_.map(x => x * x).sum))

    /** Global cell id from a precomputed top id. The fine codebooks
      * travel as ONE nested-array Literal (array<array<array<double>>>
      * — a single plan node carrying the data) indexed by the top id,
      * so only the matched top cell's ~√k fine centroids are scored:
      * per-row cost O(|fine(top)|·dim) AND plan size O(1) in k — the
      * previous CASE chain had the same per-row cost but O(k·dim)
      * literal NODES, which stops compiling at SemDeDup's own
      * k = N/500 design point (k ≈ 2M cells at 100 TB). Compute
      * [[topCell]] into its own column first so the top argmin runs
      * once. IvfIndexSpec pins bit-equality with [[cellCaseChain]]
      * and plan-node-count independence of k.
      */
    def cell(topId: Column, v: Column): Column = {
      val books = typedLit(fine)
      val ns = typedLit(fineNorms)
      val offs = typedLit(offsets)
      val bookNs = element_at(ns, topId + 1)
      val scored = transform(element_at(books, topId + 1), (c, j) =>
        struct((V.dot(v, c) * -2.0 + element_at(bookNs, j + 1)).as("s"),
          j.as("j")))
      element_at(offs, topId + 1) + array_min(scored).getField("j")
    }

    /** The O(k·dim)-node CASE-chain spelling [[cell]] replaces — kept
      * as the spec's bit-equality ground truth (small k only). */
    private[similarity] def cellCaseChain(topId: Column, v: Column): Column = {
      val first = when(topId === 0,
        lit(offsets(0)) + Model(fine(0)).cellExpanded(v))
      fine.indices.drop(1).foldLeft(first) { (acc, i) =>
        acc.when(topId === i, lit(offsets(i)) + Model(fine(i)).cellExpanded(v))
      }.otherwise(lit(-1))
    }

    /** Doubles the fine codebooks carry — the PAYLOAD size of [[cell]]'s
      * nested-array literal (its node count is already O(1) in k; the
      * bytes are what still scale as k·dim). */
    private[similarity] lazy val fineDoubles: Long =
      fine.iterator.map(b => b.iterator.map(_.length.toLong).sum).sum

    /** Payload cap for the literal spelling: past ~128k doubles (1 MB)
      * the codebook stops riding the serialized plan into every task
      * and ships ONCE per executor as a broadcast table instead. At
      * SemDeDup's k = N/500 design point (k ≈ 2M cells, dim 64 at
      * 100 TB) the literal would carry ~1 GB per task closure. */
    val literalDoubleCap: Long = 128L * 1024

    /** Global cell ids for a whole DataFrame — the operator-facing
      * form of [[cell]] with a size-thresholded shipping strategy:
      *
      *   - payload ≤ `maxLiteralDoubles`: [[cell]]'s single
      *     nested-array literal (zero joins, stays in one projection);
      *   - payload above it: the fine codebooks become a BROADCAST
      *     (topcell → codebook, norms, offset) table joined on the
      *     precomputed top id — identical doubles, identical
      *     transform/array_min arithmetic and (s, j) tie-break, so the
      *     two paths agree bit-for-bit (IvfIndexSpec pins equality and
      *     that each path takes the plan shape it claims).
      *
      * The join is always a broadcast-hash on a |top|-row build side —
      * the corpus side never shuffles. */
    def assignCells(
        df: DataFrame, topIdCol: String, vCol: String, as: String,
        maxLiteralDoubles: Long = literalDoubleCap): DataFrame =
      if (fineDoubles <= maxLiteralDoubles)
        df.withColumn(as, cell(col(topIdCol), col(vCol)))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val bookTable = broadcast(
          fine.indices.map(i => (i, offsets(i), fine(i), fineNorms(i)))
            .toDF("__g_top", "__g_off", "__g_book", "__g_ns"))
        val scored = transform(col("__g_book"), (c, j) =>
          struct((V.dot(col(vCol), c) * -2.0 +
            element_at(col("__g_ns"), j + 1)).as("s"), j.as("j")))
        // LEFT join + coalesce(-1): the literal path's `cell` ends in
        // .otherwise(lit(-1)) for an out-of-range/null top id, and an
        // inner join here would silently DROP such rows instead —
        // splitting the bit-for-bit parity the doc above promises
        df.join(bookTable, col(topIdCol) === col("__g_top"), "left")
          .withColumn(as,
            coalesce(col("__g_off") + array_min(scored).getField("j"),
              lit(-1)))
          .drop("__g_top", "__g_off", "__g_book", "__g_ns")
      }
  }

  /** Train the two-level quantizer: k1 = ⌈√k⌉ top centroids on the
    * bounded sample, then ⌈k/k1⌉ fine centroids on each top cell's
    * own sample members (adaptive where the data is dense — the
    * SemDeDup property the flat quantizer had, kept at √k cost).
    */
  def trainTwoLevel(
      vectors: DataFrame,
      vCol: String,
      k: Int,
      sampleIdCol: Option[String] = None,
      maxIter: Int = 10): TwoLevelModel = {
    val sample = collectSample(vectors, vCol, sampleIdCol)
    val k1 = math.max(1, math.sqrt(k.toDouble).toInt)
    val top = lloyd(sample, k1, maxIter)
    val k2 = math.max(1, math.ceil(k.toDouble / top.length).toInt)
    val groups = Array.fill(top.length)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    // per-centroid ||c||² computed ONCE (same left-to-right fold as
    // Model.norms), not per (sample, centroid) pair inside the loop
    val topNorms = top.map(_.map(v => v * v).sum)
    sample.foreach { x => groups(nearestByScore(top, topNorms, x)) += x }
    val fine = top.indices.map { i =>
      if (groups(i).isEmpty) Seq(top(i).toSeq)
      else lloyd(groups(i).toArray, k2, maxIter).map(_.toSeq).toSeq
    }
    TwoLevelModel(top.map(_.toSeq).toSeq, fine)
  }

  /** Index of the nearest centroid by the SAME -2<v,c>+||c||² ranking
    * (strict left-to-right double fold, strict-less first-index-wins)
    * the Column-side [[Model.cell]] and [[Model.probeCellsLocal]] use —
    * training-time top-cell grouping and assignment-time routing agree
    * bit-for-bit, so a vector near a cell boundary is refined by the
    * fine codebook that was trained on ITS neighborhood. (The exact
    * ||v-c||² form ranks identically in exact arithmetic but rounds
    * differently near ties.) */
  private def nearestByScore(
      centroids: Array[Array[Double]], norms: Array[Double],
      x: Array[Double]): Int = {
    var best = 0
    var bestS = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var dot = 0.0
      var t = 0
      while (t < x.length) { dot += x(t) * c(t); t += 1 }
      val s = dot * -2.0 + norms(j)
      if (s < bestS) { bestS = s; best = j }
      j += 1
    }
    best
  }

  /** Hard cap on the driver-collected training sample. A coarse
    * quantizer needs cell-shaped centroids, not the corpus: FAISS
    * practice is tens-to-hundreds of sample points per centroid, and
    * our k grows as corpus/500, so 64k samples covers k up to ~1000
    * with 64+ points per cell. The cap is what makes `train` safe at
    * 100 TB — the collect is bounded no matter the corpus size.
    */
  val trainSampleCap = 65536

  /** Train the coarse quantizer: deterministic content-hash sample
    * (q33's sampling pattern), capped at [[trainSampleCap]] rows by
    * hash rank (a top-k, never a full-corpus sort), collected to the
    * driver, then deterministic Lloyd's iterations locally.
    *
    * Why local Lloyd's and not a distributed fit: the sample is
    * bounded (megabytes), so distributed k-means pays one scheduled
    * job PER ITERATION to do microseconds of arithmetic — on a
    * cluster that is pure scheduler latency, locally it was ~0.5 s/
    * iteration of overhead. The corpus-sized work (sampling scan,
    * cell assignment, candidate join) all stays distributed.
    * Deterministic for a fixed dataset: hash sampling, hash-rank
    * seeding, and a fixed iteration count — IvfPersistSpec pins
    * train-twice equality, IvfIndexSpec/SemDedupSpec bound recall.
    * There is deliberately NO seed parameter: training has no RNG
    * anywhere (content-hash sample, spaced-rank init), so a seed
    * would be an API lie — two seeds could only ever produce
    * identical centroids.
    */
  def train(
      vectors: DataFrame,
      vCol: String,
      k: Int,
      sampleIdCol: Option[String] = None,
      maxIter: Int = 10): Model = {
    val sample = collectSample(vectors, vCol, sampleIdCol)
    Model(lloyd(sample, k, maxIter).map(_.toSeq).toSeq)
  }

  /** The bounded, deterministic training sample both quantizer
    * families (IVF cells here, PQ codebooks in [[PqIndex]]) train on.
    */
  private[similarity] def collectSample(
      vectors: DataFrame, vCol: String,
      sampleIdCol: Option[String]): Array[Array[Double]] = {
    val tagged = sampleIdCol match {
      case Some(id) =>
        // md5 over a tagged id: engine-independent, order-independent
        vectors.select(
          md5(concat(lit("ivf-train|"), col(id).cast("string"))).as("h"),
          col(vCol).as("v"))
      case None =>
        // no id column: hash the vector content itself
        vectors.select(
          md5(to_json(struct(col(vCol)))).as("h"), col(vCol).as("v"))
    }
    // Two-phase selection of the trainSampleCap SMALLEST hashes.
    // A single orderBy+limit+collect would plan as
    // TakeOrderedAndProject, which ships cap×rowSize from EVERY scan
    // task to the driver — driver result volume grows with partition
    // count (measured: a 5M-vector corpus over 29 tasks ships ~1 GB
    // of 64-dim rows and trips spark.driver.maxResultSize; at 100 TB
    // partition counts it is unrunnable). Phase 1 finds the cap-th
    // hash with an executor-side shuffle (1 row to the driver);
    // phase 2 collects only the ≈cap winning rows. The selected
    // sample is bit-identical to the single-phase spelling.
    val kthRow = tagged.select("h")
      .orderBy("h")
      .limit(trainSampleCap)
      .agg(max(col("h")))
      .head()
    require(!kthRow.isNullAt(0), "cannot train on an empty corpus")
    val kth = kthRow.getString(0)
    val sample: Array[Array[Double]] = tagged
      .filter(col("h") <= kth)
      .orderBy("h")
      .limit(trainSampleCap)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train on an empty corpus")
    sample
  }

  /** Deterministic Lloyd's k-means on the collected sample. Init =
    * evenly spaced ranks of the hash-ordered sample (hash order is
    * content-random, so spaced ranks are spread-out seeds with no RNG).
    * An emptied cell keeps its previous centroid.
    */
  private[similarity] def lloyd(
      sample: Array[Array[Double]], k: Int, maxIter: Int): Array[Array[Double]] = {
    val n = sample.length
    val dim = sample.head.length
    val kk = math.min(k, n)
    val centroids = Array.tabulate(kk)(j => sample((j.toLong * n / kk).toInt).clone())
    val sums = Array.ofDim[Double](kk, dim)
    val counts = new Array[Long](kk)
    var iter = 0
    while (iter < maxIter) {
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var i = 0
      while (i < n) {
        val x = sample(i)
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val c = centroids(j)
          var d = 0.0
          var t = 0
          while (t < dim) { val diff = x(t) - c(t); d += diff * diff; t += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        val s = sums(best)
        var t = 0
        while (t < dim) { s(t) += x(t); t += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          val c = centroids(j)
          val s = sums(j)
          var t = 0
          while (t < dim) { c(t) = s(t) / counts(j); t += 1 }
        }
        j += 1
      }
      iter += 1
    }
    centroids
  }
}
