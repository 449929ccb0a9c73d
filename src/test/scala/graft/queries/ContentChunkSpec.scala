package graft.queries

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q95's correctness weight beyond the DuckDB oracle: an independent
  * Scala recomputation of the boundary rule, and the content-LOCALITY
  * property that is the reason content-defined chunking exists.
  */
class ContentChunkSpec extends SparkSpec {

  /** Independent reference: 60-bit key of each 3-token window (first
    * 15 md5 hex digits, base-16), boundary after window i when
    * key % q95Mod == 0 — written against MessageDigest directly, not
    * the engine expressions.
    */
  private def refStarts(toks: Seq[String]): Seq[Long] = {
    val md = MessageDigest.getInstance("MD5")
    val ks = toks.sliding(3).filter(_.size == 3).map { w =>
      val hex = md.digest(w.mkString(" ").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }.toSeq
    0L +: ks.zipWithIndex.collect {
      case (k, i) if k % TextQueries.q95Mod == 0 && i + 3 < toks.length =>
        (i + 3).toLong
    }
  }

  test("q95 agrees with an independent per-doc boundary recomputation") {
    val out = TextQueries.q95_content_chunks(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    // tokens come from the shared tokenizer; boundary math is redone here
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.length >= 3)
    assert(docs.length == out.size)
    docs.foreach { case (id, toks) =>
      val st = refStarts(toks)
      val lens = (st :+ toks.length.toLong).sliding(2).map { case Seq(a, b) => b - a }.toSeq
      val want = (toks.length.toLong, st.length.toLong, lens.max, st.sum)
      assert(out(id) == want, s"doc $id: got ${out(id)}, want $want")
    }
  }

  test("content locality: appending text never moves existing boundaries") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val doc = (0 until 60).map(i => words(i % words.length) + (i % 7))
    val edited = doc ++ Seq("appended", "tail", "tokens", "here")
    val before = refStarts(doc)
    val after = refStarts(edited)
    // every original boundary survives the append, in place (the last
    // windows of `doc` may ADD boundaries once the doc end moves away,
    // so prefix containment — not equality — is the invariant)
    assert(after.take(before.length) == before)
    // and a fixed-size chunker would NOT have this property trivially:
    // the appended doc gained at least its own length in tokens
    assert(edited.length > doc.length)
  }
}
