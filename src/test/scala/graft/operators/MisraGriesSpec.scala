package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins the two guarantees q118 leans on: the per-stream undercount
  * bound, and the distributed candidate-superset property (union of
  * per-partition survivors covers every global heavy hitter).
  */
class MisraGriesSpec extends AnyFunSuite {

  private def zipfStream(rng: Random, n: Int, vocab: Int): Seq[String] =
    // crude Zipf-ish skew: item i drawn with weight ~ 1/(i+1)
    Seq.fill(n) {
      val u = rng.nextDouble()
      val i = ((math.exp(u * math.log(vocab + 1.0)) - 1.0)).toInt.min(vocab - 1)
      s"tok$i"
    }

  test("estimates never exceed truth and undercount at most n/(k+1)") {
    val rng = new Random(42)
    for (trial <- 1 to 5) {
      val n = 2000 + trial * 500
      val k = 20
      val stream = zipfStream(rng, n, 500)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = MisraGries.summary(stream.iterator, k)
      est.foreach { case (t, e) =>
        assert(e <= truth(t), s"overcount for $t")
        assert(truth(t) - e <= n / (k + 1) + 1, s"undercount bound broken for $t")
      }
      // survivors bound: at most k counters retained
      assert(est.size <= k)
    }
  }

  test("every phi-heavy item survives; distributed union preserves that") {
    val rng = new Random(7)
    val k = 50 // phi = 1/(k+1): anything above n/51 must survive
    for (trial <- 1 to 3) {
      val stream = zipfStream(rng, 5000, 1000)
      val n = stream.size
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = truth.filter(_._2 > n / (k + 1)).keySet
      assert(heavy.nonEmpty, "fixture must contain heavy hitters")

      val single = MisraGries.summary(stream.iterator, k).keySet
      assert(heavy.subsetOf(single), s"single-pass missed ${heavy -- single}")

      // q118's distributed shape: MG per partition, union the keys
      val parts = stream.grouped(stream.size / 7 + 1).toSeq
      val union = parts.flatMap(p => MisraGries.candidates(p.iterator, k)).toSet
      assert(heavy.subsetOf(union), s"distributed union missed ${heavy -- union}")
      // and the collect stays bounded by k per partition
      assert(union.size <= k * parts.size)
    }
  }

  test("adversarial all-distinct stream: bounded state, bound holds, no false negatives") {
    // Worst case for MG: every arrival after the first k triggers a
    // decrement-all, and NO item is heavy. The summary must stay
    // within k counters, never overcount, and (vacuously) retain
    // every phi-heavy item — there are none, so the only way to fail
    // is blowing the space bound or crashing on constant churn.
    val k = 20
    val n = 5000
    val stream = Iterator.tabulate(n)(i => s"uniq$i")
    val est = MisraGries.summary(stream, k)
    assert(est.size <= k)
    est.values.foreach(e => assert(e >= 1L && e <= 1L + n / (k + 1)))
    // distributed shape on all-distinct: union is bounded by k*parts,
    // and the exact-recount pass would confirm zero heavy hitters
    val parts = (0 until n).map(i => s"u$i").grouped(n / 7 + 1).toSeq
    val union = parts.flatMap(p => MisraGries.candidates(p.iterator, k)).toSet
    assert(union.size <= k * parts.size)
  }

  test("adversarial rotation (k+1 distinct round-robin): undercount bound is tight") {
    // k+1 items cycling is the textbook bound-saturating stream: each
    // full cycle adds one to a missing item's true count while the
    // decrement-all erases one increment everywhere. Estimates may
    // legitimately drop to the floor, but never below truth - n/(k+1).
    val k = 4
    val cycles = 200
    val stream = Iterator.tabulate(cycles * (k + 1))(i => s"r${i % (k + 1)}")
    val n = cycles * (k + 1)
    val est = MisraGries.summary(stream, k)
    assert(est.size <= k)
    for (i <- 0 to k) {
      val e = est.getOrElse(s"r$i", 0L)
      assert(e <= cycles.toLong)
      assert(cycles.toLong - e <= n / (k + 1), s"bound broken for r$i: est=$e")
    }
  }

  test("degenerate streams: empty, constant, vocab smaller than k") {
    assert(MisraGries.summary(Iterator.empty, 5) === Map.empty)
    assert(MisraGries.summary(Iterator.fill(100)("x"), 5) === Map("x" -> 100L))
    val small = MisraGries.summary(Iterator.tabulate(90)(i => s"t${i % 3}"), 10)
    assert(small === Map("t0" -> 30L, "t1" -> 30L, "t2" -> 30L))
  }
}
