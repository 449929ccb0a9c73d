package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-table training (round 6) — the tokenizer-construction
  * step between q35's vocabulary statistics and q19/q63/q77's token
  * accounting: learn the first R byte-pair-encoding merges from the
  * corpus (Sennrich et al. 2016, arXiv:1508.07909).
  *
  * Scale shape — the reason BPE training is feasible at 100 TB: the
  * corpus is scanned ONCE to build the word-frequency table, and the
  * merge loop runs entirely on that weighted vocabulary (rows =
  * distinct words, not corpus tokens). Each round is one vocab-sized
  * pair-count shuffle plus a 1-row argmax collect; the re-segmentation
  * is a typed map over the vocab table (genuine per-row imperative
  * logic — the adjacent-leftmost-first merge rule — the documented
  * case for dropping out of expressions). Rounds persist/unpersist so
  * round r never recomputes rounds 0..r-1.
  *
  * Iterative argmax-per-round is not expressible as one SQL statement
  * (aggregation inside recursion), so the driver check is rows-only —
  * same rationale as q42/q87; BpeTrainSpec pins round-1's argmax
  * against an independent recomputation, the non-increasing
  * pair-count invariant, and cross-run determinism.
  */
object BpeTrain {

  val bpeMerges = 10

  /** Leftmost-first non-overlapping merge of the adjacent pair (a,b)
    * — the standard BPE apply rule.
    */
  private[queries] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The weighted vocabulary: (word, corpus frequency). */
  private[queries] def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Initial symbolization: one symbol per Unicode CODE POINT.
    * `w.map(_.toString)` would split UTF-16 surrogate pairs, turning
    * any supplementary character (emoji, rare CJK) into two invalid
    * lone-surrogate symbols no BPE scheme would ever produce.
    */
  private[queries] def symbolize(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Weighted adjacent-pair counts over a symbolized vocab table. */
  private[queries] def pairCounts(table: Dataset[(Seq[String], Long)]): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    table.flatMap { case (syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
      }
      .toDF("left", "right", "f")
      .groupBy("left", "right").agg(sum(col("f")).as("pair_count"))
  }

  /** The learned merge table, trained once per corpus dir and shared
    * by q92 (which REPORTS it) and q93 (which APPLIES it) — the
    * train-once/apply-everywhere lifecycle a tokenizer actually has.
    * The table is `bpeMerges` tiny rows, so a driver-side memo is the
    * right storage (the spec pins cross-run determinism, so caching
    * cannot change answers).
    */
  private object Merges {
    private val built =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, Long)]]()
    def get(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
      built.computeIfAbsent(dir, _ => train(spark, dir))
  }

  private[queries] def train(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    var table: Dataset[(Seq[String], Long)] = wordFreq(spark, dir)
      .as[(String, Long)]
      .map { case (w, f) => (symbolize(w), f) }
      .persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      for (r <- 0 until bpeMerges) {
        val top = pairCounts(table)
          // ties break lexicographically so the table is reproducible
          .orderBy(col("pair_count").desc, col("left"), col("right"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (l, rt, cnt) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r, l, rt, cnt))
          val prev = table
          table = prev.map { case (syms, f) => (mergePair(syms, l, rt), f) }
            .persist()
          table.count() // materialize before releasing the parent
          prev.unpersist()
        }
      }
    } finally table.unpersist()
    merges.result()
  }

  /** Learn the first [[bpeMerges]] merges; output one row per merge:
    * (rank, left, right, pair_count), rank in learned order.
    */
  def q92_bpe_train(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Merges.get(spark, dir)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** Apply the learned merges in rank order to `syms`
    * (leftmost-first per merge — the standard BPE encode loop).
    */
  private[queries] def encode(
      merges: Seq[(String, String)], w: String): Seq[String] =
    merges.foldLeft(symbolize(w)) { case (syms, (a, b)) => mergePair(syms, a, b) }

  /** q93: the APPLY form — encode the corpus with the trained merge
    * table and report the per-source tokenization yield: word count,
    * code-point symbol count before merging, BPE token count after,
    * and the compression ratio a tokenizer evaluation reads.
    *
    * Scale shape: encoding runs on the DISTINCT-WORD vocabulary
    * (vocab-bounded typed map — same argument as training), and the
    * corpus-sized work is one explode + broadcast join of the tiny
    * (word → counts) map + partial-agg rollup by source. Text streams
    * once; merges come from the session's trained table (built by the
    * first of q92/q93 to run).
    *
    * rows-only at the driver like q92 (iterative training has no SQL
    * twin); BpeTrainSpec pins the encode rule on fixed merge tables,
    * full-coverage accounting, and compression >= 1.
    */
  def q93_bpe_apply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merges = Merges.get(spark, dir).map { case (_, l, r, _) => (l, r) }
    val wordCost = wordFreq(spark, dir)
      .as[(String, Long)]
      .map { case (w, _) =>
        (w, symbolize(w).length.toLong, encode(merges, w).length.toLong)
      }
      .toDF("w", "n_cp", "n_bpe")
    Tables.load(spark, dir, "documents")
      .select(col("source"), explode(T.tokens(col("text"))).as("w"))
      .join(broadcast(wordCost), "w")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_cp")).as("n_symbols"),
        sum(col("n_bpe")).as("n_tokens"))
      .withColumn("compression",
        col("n_symbols").cast("double") / col("n_tokens").cast("double"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_bpe_train" -> (q92_bpe_train _),
    "q93_bpe_apply" -> (q93_bpe_apply _))

  /** rows-only on purpose: per-round argmax inside an iterative loop
    * has no single-statement SQL twin; BpeTrainSpec carries the
    * correctness weight for both the trainer and the apply form.
    */
  val oracles: Map[String, String] = Map.empty
}
