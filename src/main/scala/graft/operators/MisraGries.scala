package graft.operators

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge
  * property from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * One pass, O(k) space: maintain at most `k` counters; a new item
  * with no counter when all k are taken decrements EVERY counter by
  * one (dropping zeros) instead of being stored. The undercount of
  * any item after a stream of n elements is at most n/(k+1), so every
  * item with true frequency > n/(k+1) still holds a counter at the
  * end — the summary's key set is a guaranteed SUPERSET of the
  * φ-heavy hitters for any φ ≥ 1/(k+1).
  *
  * The distributed form (ChangeCapture-style incremental thinking
  * applied to frequency): run MG(k) per partition and take the UNION
  * of surviving keys. If a token's global count f > N/(k+1), then by
  * pigeonhole some partition has f_p > N_p/(k+1) (otherwise
  * f = Σf_p ≤ ΣN_p/(k+1) = N/(k+1)), so the token survives that
  * partition's summary. Candidates are ≤ k per partition regardless
  * of vocabulary size — the driver-side collect in q118 is bounded by
  * k·partitions, never by the corpus. An exact recount pass over the
  * candidate set then makes the final answer EXACT, which is what
  * lets a sketch-built operator hash-match a DuckDB oracle.
  */
object MisraGries {

  /** Surviving keys of an MG(k) pass over one partition. */
  def candidates(it: Iterator[String], k: Int): Iterator[String] =
    summary(it, k).keysIterator

  /** Full summary with estimates (spec surface: the undercount bound
    * `true - estimate ≤ n/(k+1)` is what the property test pins).
    */
  def summary(it: Iterator[String], k: Int): Map[String, Long] = {
    require(k > 0, s"k must be positive, got $k")
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < k => counters.update(t, 1L)
        case None =>
          // decrement-all: O(k) here, but each decrement cancels one
          // prior increment, so total work is O(1) amortized per element
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace { (key, c) =>
            if (c == 1L) dead += key
            c - 1L
          }
          dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }
}
