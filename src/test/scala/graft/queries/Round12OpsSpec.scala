package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.security.MessageDigest

/** Round-12 operator pins: content-defined chunking (q214), winnowing
  * fingerprints (q218), Kneser–Ney smoothing (q215), the multi-epoch
  * schedule (q216), and supplier excess share (q217) — each against a
  * driver-side Scala replica or a hand-built planted fixture, so the
  * semantics are pinned independently of the DuckDB oracle.
  */
class Round12OpsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def writeDocs(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ---------- q214 ----------

  /** Sequential replica of the content-defined chunker. */
  private def cdcChunks(text: String): Seq[(String, Long)] = {
    val tk = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val n = tk.length
    if (n == 0) return Nil
    val w = ChunkingQueries.cdcW
    val bounds = (w to n).filter { i =>
      val h = java.lang.Long.parseLong(
        md5hex(tk.slice(i - w, i).mkString(" ")).take(8), 16)
      h % ChunkingQueries.cdcD == 0 && i < n
    }
    val cuts = 0 +: bounds :+ n
    cuts.sliding(2).map { case Seq(a, b) =>
      (md5hex(tk.slice(a, b).mkString(" ")), (b - a).toLong)
    }.toSeq
  }

  test("q214: chunk boundaries re-synchronize after an insertion (the q81 gap)") {
    val dir = tmp("cdc")
    val body = (1 to 40).map(i => s"w${(i * 7) % 13}tok$i").mkString(" ")
    // doc 2 = doc 1 with ONE leading inserted token: fixed-stride spans
    // all shift; content-defined chunks re-align after one window
    writeDocs(dir, Seq((1L, "a", body), (2L, "a", "zzz " + body),
      (3L, "b", "totally different text here only once")))
    val c1 = cdcChunks(body).map(_._1).toSet
    val c2 = cdcChunks("zzz " + body).map(_._1).toSet
    val shared = c1.intersect(c2)
    assert(shared.nonEmpty, "replica: no chunk survived the insertion — " +
      "pick different fixture text")
    val got = ChunkingQueries.q214_cdc_spans(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // replica rollup for source a
    val occ = Seq(1L -> cdcChunks(body), 2L -> cdcChunks("zzz " + body))
    val all = occ.flatMap { case (id, cs) => cs.map(c => (id, c._1, c._2)) }
    val dupSet = all.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val aChunks = all.length.toLong
    val aTok = all.map(_._3).sum
    val aDupTok = all.filter(r => dupSet.contains(r._2)).map(_._3).sum
    val aDupOcc = all.count(r => dupSet.contains(r._2)).toLong
    assert(got("a") === ((aChunks, all.map(_._2).distinct.size.toLong, aTok,
      aDupTok, aDupOcc, aDupTok * 1000000L / aTok)))
    // the singleton source has zero duplicate mass
    assert(got("b")._4 === 0L && got("b")._6 === 0L)
    // and the duplicated body dominates source a's mass
    assert(got("a")._6 > 500000L,
      s"resync failed: only ${got("a")._6} ppm duplicate mass")
  }

  // ---------- q218 ----------

  test("q218: winnowing reports the planted shifted near-dup pair") {
    val dir = tmp("winnow")
    val body = (1 to 30).map(i => s"t${(i * 5) % 11}x$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, "a", body),
      (2L, "a", "prefix junk " + body), // shifted copy
      (3L, "b", "unrelated words entirely disjoint from others one two")))
    val got = ChunkingQueries.q218_winnowing(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), s"planted pair missing: $got")
    assert(got((1L, 2L)) >= ChunkingQueries.winnowMinShared)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc paired")
  }

  test("q218: fingerprint density respects the winnowing bound") {
    // property: #fingerprints ≤ #windows and ≥ ceil(m / w) distinct-min
    // lower shape — check via the public query on a single doc corpus
    val dir = tmp("wdens")
    val body = (1 to 100).map(i => s"z${(i * 3) % 17}q$i").mkString(" ")
    writeDocs(dir, Seq((1L, "a", body)))
    // no pairs expected; the query must still run clean on 1 doc
    assert(ChunkingQueries.q218_winnowing(spark, dir).count() === 0L)
  }

  // ---------- q215 ----------

  test("q215: Kneser-Ney probability matches the hand-computed rational") {
    val dir = tmp("kn")
    // corpus: "a b" x3, "a c" x1, "d b" x1  (tokens lowercased by the LM)
    writeDocs(dir, Seq(
      (1L, "s", "a b a b a b"), // bigrams: ab, ba, ab, ba, ab
      (2L, "s", "a c"),
      (3L, "s", "d b")))
    // bigram counts: ab=3, ba=2, ac=1, db=1 → n_types=4
    // for (a,b): c12=3, c1(a·)=ab+ac=4, n_follow(a)=2, n_prec(·b)=2
    // p = ((4*3-3)*4 + 3*2*2) * 1e6 // (4*4*4) = (36+12)*1e6 // 64 = 750000
    val got = LanguageModel.q215_kneser_ney(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got(("a", "b")) === ((1L, 3L, 4L, 2L, 2L, 750000L)))
    // interpolation mass: unseen-prone continuations get nonzero weight
    // (db: c12=1, c1(d)=1, n_follow(d)=1, n_prec(b)=2, n_types=4
    //  p = ((4-3)*4 + 3*1*2)*1e6 // (4*1*4) = 10*1e6 // 16 = 625000)
    assert(got(("d", "b"))._6 === 625000L)
  }

  // ---------- q216 ----------

  test("q216: each epoch is an exact permutation and the two epochs differ") {
    val got = CurationQueries.q216_epoch_schedule(spark, sf()).collect()
    val n = got.length
    assert(n > 0)
    val pos1 = got.map(_.getLong(2)).sorted
    val pos2 = got.map(_.getLong(3)).sorted
    assert(pos1.toSeq === (1L to n).toSeq, "pos1 is not a permutation")
    assert(pos2.toSeq === (1L to n).toSeq, "pos2 is not a permutation")
    // epochs must be genuinely different orders
    assert(got.count(r => r.getLong(2) != r.getLong(3)) > n / 2,
      "epoch orders are suspiciously aligned")
    // drift column is consistent
    got.foreach(r => assert(r.getLong(4) === math.abs(r.getLong(2) - r.getLong(3))))
  }

  // ---------- q217 ----------

  test("q217: planted dominant supplier found with the exact share") {
    import spark.implicits._
    val dir = tmp("excess")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // part 10: supplier 1 ships 80 of 100 (800000 ppm), supplier 2 ships 20
    // part 20: three suppliers at 10/10/10 — nobody reaches 20%... (333333 each, dominates)
    // part 30: supplier 9 alone (1000000 ppm)
    val rows = Seq(
      (10L, 1L, 50.0, ts("1996-03-01 00:00:00")),
      (10L, 1L, 30.0, ts("1996-05-01 00:00:00")),
      (10L, 2L, 20.0, ts("1996-07-01 00:00:00")),
      (30L, 9L, 5.0, ts("1996-02-01 00:00:00")),
      (30L, 9L, 5.0, ts("1997-02-01 00:00:00"))) // outside window
    rows.zipWithIndex.map { case ((pk, sk, q, d), i) =>
      (i.toLong + 1, pk, sk, i + 1, q, 1.0, 0.0, 0.0, "N", "O", d)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.q217_excess_share(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 800000L, 8000L)))  // 80 qty = 8000 cents
    assert(got(2L) === ((1L, 200000L, 2000L)))  // exactly at the 20% floor
    assert(got(9L) === ((1L, 1000000L, 500L)))  // only the in-window 5.0
  }

  // ---------- q219 ----------

  test("q219: TV distance matches the hand-computed rational on a 2-source split") {
    val dir = tmp("tvdrift")
    // src a: 4 tokens of length 1; src b: 4 tokens of length 2.
    // corpus: c_1 = c_2 = 4, N = 8. For each source (n_s = 4):
    //   dev = |4*8 - 4*4| + |0*8 - 4*4| = 32
    //   tv_ppm = 32 * 1e6 / (2 * 4 * 8) = 500000
    writeDocs(dir, Seq(
      (1L, "a", "p q"), (2L, "a", "r s"),
      (3L, "b", "pp qq"), (4L, "b", "rr ss")))
    val got = DistributionQueries.q219_length_drift(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") === ((4L, 500000L)))
    assert(got("b") === ((4L, 500000L)))
  }

  test("q219: a source matching the corpus mix has zero drift") {
    val dir = tmp("tvzero")
    // both sources are 50/50 length-1/length-2 -> each equals the
    // corpus marginal -> tv_ppm = 0 (and the dense grid contributes
    // only zero terms)
    writeDocs(dir, Seq(
      (1L, "a", "p qq"), (2L, "b", "r ss")))
    DistributionQueries.q219_length_drift(spark, dir).collect()
      .foreach(r => assert(r.getLong(2) === 0L, s"source ${r.getString(0)}"))
  }

  // ---------- q220 ----------

  test("q220: argmax pick matches a driver-side replica over q47's clusters") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val members = GraphQueries.q47_dup_clusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(members.nonEmpty)
    val qual = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), floor(
        graft.functions.TextFunctions.qualityScoreDeclarative(col("text"))
          * 1000000L).cast("long").as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replica: per cluster keep max quality, ties -> min id
    val truth = members.groupBy(_._2).map { case (cid, ms) =>
      val best = ms.map { case (id, _) => (qual(id), id) }
        .reduce((a, b) =>
          if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      cid -> ((best._2, best._1, ms.length.toLong, best._2 != cid))
    }
    val got = CurationQueries.q220_canonical_rep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got === truth)
    // the quality rule must actually bite somewhere at sf0.001,
    // otherwise the fixture proves nothing beyond q47
    assert(got.values.exists(_._4), "no cluster changed its pick")
  }

  // ---------- q221 ----------

  test("q221: binding source and allocations match the hand-computed caps") {
    val dir = tmp("mixfeas")
    def toks(n: Int) = Seq.fill(n)("t").mkString(" ")
    // supplies 40/25/20/10/2 vs weights 40/25/20/10/5 percent:
    // (n*1e6)//w = 100,100,100,100,40 -> t_max = 40, binding = src4
    writeDocs(dir, Seq(
      (1L, "src0", toks(40)), (2L, "src1", toks(25)), (3L, "src2", toks(20)),
      (4L, "src3", toks(10)), (5L, "src4", toks(2)),
      (6L, "other", toks(99)))) // undeclared source must be ignored
    val got = CurationQueries.q221_mixture_feasibility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.keySet === Set("src0", "src1", "src2", "src3", "src4"))
    assert(got("src0") === ((40L, 400000L, 40L, 16L, 24L, false)))
    assert(got("src1") === ((25L, 250000L, 40L, 10L, 15L, false)))
    assert(got("src2") === ((20L, 200000L, 40L, 8L, 12L, false)))
    assert(got("src3") === ((10L, 100000L, 40L, 4L, 6L, false)))
    assert(got("src4") === ((2L, 50000L, 40L, 2L, 0L, true)))
  }

  // ---------- q222 ----------

  test("q222: planted shifted near-dup yields perfect recall") {
    val dir = tmp("wrecall")
    val body = (1 to 30).map(i => s"t${(i * 5) % 11}x$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, "a", body),
      (2L, "a", "prefix junk " + body),
      (3L, "b", "unrelated words entirely disjoint from others one two")))
    val r = ChunkingQueries.q222_winnow_recall(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nExact, nCand, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nExact === 1L, "exact truth must be exactly the planted pair")
    assert(nHit === 1L, "winnowing missed the planted shifted pair")
    assert(row.getLong(3) === 1000000L) // recall_ppm
    assert(row.getLong(4) === nHit * 1000000L / nCand) // precision identity
  }

  test("q222: counters are mutually consistent at sf0.001") {
    val row = ChunkingQueries.q222_winnow_recall(spark, sf()).collect().head
    val (nExact, nCand, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nHit <= math.min(nExact, nCand))
    assert(nExact > 0, "q26 truth is empty at sf0.001 — fixture too small")
    assert(row.getLong(3) === nHit * 1000000L / nExact)
    assert(row.getLong(4) === (if (nCand > 0) nHit * 1000000L / nCand else 0L))
  }

  // ---------- q223 ----------

  test("q223: rollup matches a driver-side replica and clusters are split-pure") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val members = GraphQueries.q47_dup_clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> component
    assert(members.nonEmpty)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def splitOf(key: Long): String = {
      val h2 = md5hex(s"split-1|$key").take(2)
      val b = "0123456789abcdef".indexOf(h2(0)) * 16 +
        "0123456789abcdef".indexOf(h2(1))
      CorpusQueries.splitBuckets.find(b < _._2).get._1
    }
    val rep = docs.map { case (id, _) => id -> members.getOrElse(id, id) }.toMap
    val truth = docs.groupBy { case (id, _) => splitOf(rep(id)) }
      .map { case (split, ds) =>
        split -> ((ds.length.toLong, ds.map(_._2).sum,
          ds.count { case (id, _) => splitOf(id) != split }.toLong,
          ds.map { case (id, _) => rep(id) }.distinct.length.toLong))
      }
    val got = CurationQueries.q223_leakage_free_split(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === truth)
    // the cluster rule must actually move at least one document,
    // otherwise the fixture proves nothing beyond q78
    assert(got.values.map(_._3).sum > 0, "no document changed split")
    // split purity: all members of any cluster share one split
    val bySplit = members.groupBy { case (_, c) => splitOf(c) }
    bySplit.foreach { case (s, ms) =>
      ms.keys.foreach(id => assert(splitOf(rep(id)) === s))
    }
  }

  // ---------- q224 ----------

  test("q224: incremental index update is indistinguishable from q83's rebuild") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    // the equality is only meaningful if both epochs are non-empty
    val isBatch = substring(
      md5(concat(lit("b73|"), col("doc_id").cast("string"))), 1, 1)
      .isin("0", "1")
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(docs.filter(isBatch).count() > 0, "batch eighth is empty")
    assert(docs.filter(!isBatch).count() > 0, "existing side is empty")
    val inc = RetrievalQueries.q224_bm25_index_update(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val full = RetrievalQueries.q83_bm25(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq)
  }

  // ---------- q225 ----------

  test("q225: per-cap windows, waste and splits match the hand-computed fixture") {
    val dir = tmp("packsweep")
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // one source, one shard, three 300-token docs: shard_tok = 900
    //   cap  512: windows 2, padded 124, waste 124e6 DIV 1024 = 121093;
    //             doc2 spans [300,600) crossing 512 -> 1 split
    //   cap 1024: windows 1, padded 124, waste 121093, 0 splits
    //   cap 2048: windows 1, padded 1148, waste 560546, 0 splits
    //   cap 4096: windows 1, padded 3196, waste 780273, 0 splits
    writeDocs(dir, Seq((1L, "a", toks(300)), (2L, "a", toks(300)),
      (3L, "a", toks(300))))
    val got = CurationQueries.q225_packing_sweep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(512L) === ((2L, 900L, 124L, 121093L, 1L, 333333L)))
    assert(got(1024L) === ((1L, 900L, 124L, 121093L, 0L, 0L)))
    assert(got(2048L) === ((1L, 900L, 1148L, 560546L, 0L, 0L)))
    assert(got(4096L) === ((1L, 900L, 3196L, 780273L, 0L, 0L)))
  }

  test("q225: windows never cross shard boundaries") {
    val dir = tmp("packshard")
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // two docs in DIFFERENT shards (ids 1 and 1001): each shard packs
    // alone -> 2 windows at cap 512 (not the 1 a global stream would
    // give for 300+200=500 tokens), and no doc is ever split
    writeDocs(dir, Seq((1L, "a", toks(300)), (1001L, "a", toks(200))))
    val got = CurationQueries.q225_packing_sweep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(5))))
      .toMap
    assert(got(512L) === ((2L, 524L, 0L))) // 212 + 312 padding
  }

  // ---------- q226 ----------

  test("q226: verified mass equals q69's shipped pair set; histogram is sane") {
    val dir = sf()
    val hist = TextQueries.q226_simhash_precision(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hist.nonEmpty)
    hist.foreach { case (d, nc, nv, ppm) =>
      assert(d >= 0 && d <= 9)
      assert(nv <= nc)
      assert(ppm === nv * 1000000L / nc)
    }
    // the size prefilter q69 applies is a NECESSARY condition of
    // j >= 0.8, so the audit's verified total must equal the shipped
    // q69 pair count exactly
    val q69n = TextQueries.q69_simhash_probe(spark, dir).count()
    assert(hist.map(_._3).sum === q69n)
    assert(q69n > 0, "no verified pairs at sf0.001 — fixture too small")
  }

  // ---------- q227 ----------

  test("q227: frozen-quantizer append is indistinguishable from a full assignment") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val isBatch = substring(
      md5(concat(lit("b73|"), col("vec_id").cast("string"))), 1, 1)
      .isin("0", "1")
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    assert(e.filter(isBatch).count() > 0, "batch eighth is empty")
    assert(e.filter(!isBatch).count() > 0, "existing side is empty")
    val inc = VectorQueries.q227_ivf_index_update(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.nonEmpty)
    // replica: same frozen model (trained on the existing side only),
    // single-shot assignment of the WHOLE corpus, same probe
    val model = graft.similarity.IvfIndex.train(
      e.filter(!isBatch).select(col("vec_id"), col("v")), "v", k = 16,
      sampleIdCol = Some("vec_id"))
    val all = e.withColumn("cell", model.cell(col("v")))
      .select(col("vec_id").as("n_id"), col("v").as("nv"), col("cell"),
        graft.functions.VectorFunctions.norm(col("v")).as("n_nrm"))
    val qs = e.filter(col("vec_id") < 50)
      .withColumn("probe_cells", model.probeCells(col("v"), nProbe = 4))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(col("probe_cells")).as("cell"),
        graft.functions.VectorFunctions.norm(col("v")).as("q_nrm"))
    val cos = graft.functions.VectorFunctions.cosineWithNorms(
      col("qv"), col("nv"), col("q_nrm"), col("n_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val full = qs.join(all, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.toSeq === full.toSeq)
  }

  // ---------- q228 ----------

  test("q228: Hamilton apportionment matches the hand fixture and sums exactly") {
    val dir = tmp("apportion")
    def toks(n: Int) = Seq.fill(n)("t").mkString(" ")
    // q221 fixture: t_max = 40, allocs = 16/10/8/4/2, tot = 40.
    // 1024 shards: alloc*1024/40 = 409.6 / 256 / 204.8 / 102.4 / 51.2
    // floors 409/256/204/102/51 = 1022, R = 2; remainders
    // 24/0/32/16/8 (mod 40): extras -> src2 (32), src0 (24)
    writeDocs(dir, Seq(
      (1L, "src0", toks(40)), (2L, "src1", toks(25)), (3L, "src2", toks(20)),
      (4L, "src3", toks(10)), (5L, "src4", toks(2))))
    val got = CurationQueries.q228_shard_apportion(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("src0") === ((16L, 409L, 24L, 1L, 410L)))
    assert(got("src1") === ((10L, 256L, 0L, 0L, 256L)))
    assert(got("src2") === ((8L, 204L, 32L, 1L, 205L)))
    assert(got("src3") === ((4L, 102L, 16L, 0L, 102L)))
    assert(got("src4") === ((2L, 51L, 8L, 0L, 51L)))
    assert(got.values.map(_._5).sum === CurationQueries.apportionShards)
  }

  test("q228: the shard total is exact at sf0.001") {
    val got = CurationQueries.q228_shard_apportion(spark, sf()).collect()
    assert(got.map(_.getLong(5)).sum === CurationQueries.apportionShards)
  }

  // ---------- q229 ----------

  test("q229: erasure bites a shipped pair and no erased id survives") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    def isErased(id: Long): Boolean =
      md5hex(s"del|$id").take(1) match { case "0" | "1" => true; case _ => false }
    val full = TextQueries.q25_minhash_lsh_pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(full.exists { case (a, b) => isErased(a) || isErased(b) },
      "no erased doc sits in a q25 pair at sf0.001 — the mask is untested")
    val got = TextQueries.q229_index_erasure(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (a, b) =>
      assert(!isErased(a) && !isErased(b), s"erased id survives in ($a,$b)")
    }
    // rebuild-without equivalence: exactly the full pairs whose both
    // endpoints survive (banding is per-doc stateless)
    val expect = full.filter { case (a, b) => !isErased(a) && !isErased(b) }
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty, "all pairs erased — fixture too small")
  }

  // ---------- q230 ----------

  test("q230: erasure bites the rankings and no erased doc survives") {
    val dir = sf()
    def isErased(id: Long): Boolean =
      md5hex(s"del|$id").take(1) match { case "0" | "1" => true; case _ => false }
    val full = RetrievalQueries.q83_bm25(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(full.exists(r => isErased(r._2)),
      "no erased doc in q83's top-k at sf0.001 — the df decrement is untested")
    val got = RetrievalQueries.q230_bm25_erasure(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty)
    got.foreach(r => assert(!isErased(r._2), s"erased doc ${r._2} survives"))
    // the rankings must actually move (df and stats shrank)
    assert(got.toSeq !== full.toSeq)
  }

  // ---------- q231 ----------

  test("q231: chaining audit matches a driver-side replica over q25's edges") {
    val dir = sf()
    val pairs = TextQueries.q25_minhash_lsh_pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val members = GraphQueries.q47_dup_clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    val truth = pairs.groupBy { case (a, _, _) => members(a) }
      .map { case (cid, es) =>
        val n = members.values.count(_ == cid).toLong
        cid -> ((n, es.length.toLong,
          es.length.toLong == n * (n - 1) / 2, es.map(_._3).min))
      }
    val got = GraphQueries.q231_cluster_chaining(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))).toMap
    assert(got === truth)
    // every edge is a verified >= 0.8 pair, so the weakest link is too
    got.values.foreach { case (_, _, _, minJ) => assert(minJ >= 0.8) }
  }

  // ---------- q232 ----------

  test("q232: manifest equals the composed driver-side replica") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val members = GraphQueries.q47_dup_clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-doc facts straight from the verified q61 verdict query
    val verdicts = CurationQueries.q61_quality_filter(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(4) == "keep")).toMap
    val qm = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"),
        floor(graft.functions.TextFunctions.qualityScoreDeclarative(col("text"))
          * 1000000L).cast("long").as("qm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val rep = members.groupBy(_._2).map { case (cid, ms) =>
      val best = ms.keys.map(id =>
        (qm.find(_._1 == id).get._4, id)).reduce((a, b) =>
        if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      cid -> best._2
    }
    def splitOf(key: Long): String = {
      val h2 = md5hex(s"split-1|$key").take(2)
      val b = "0123456789abcdef".indexOf(h2(0)) * 16 +
        "0123456789abcdef".indexOf(h2(1))
      CorpusQueries.splitBuckets.find(b < _._2).get._1
    }
    val truth = qm.filter { case (id, _, _, _) =>
      members.get(id).forall(cid => rep(cid) == id) && verdicts(id)
    }.groupBy { case (id, src, _, _) =>
      (splitOf(members.getOrElse(id, id)), src)
    }.map { case (k, ds) => k -> ((ds.length.toLong, ds.map(_._3).sum)) }
    val got = CurationQueries.q232_release_manifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === truth)
    assert(got.nonEmpty)
  }

  // ---------- q233 ----------

  test("q233: hot keys, salt factors and per-salt bounds match the fixture") {
    val dir = tmp("saltplan")
    // 300 'a' docs + 50 'b' + 10 'c': tot 360 -> target max(1,20)=20;
    // a: salt ceil(300/20)=15, per-salt ceil(300/15)=20
    // b: salt ceil(50/20)=3,  per-salt ceil(50/3)=17; c stays unsalted
    writeDocs(dir, (1L to 300L).map(i => (i, "a", s"t$i")) ++
      (301L to 350L).map(i => (i, "b", s"t$i")) ++
      (351L to 360L).map(i => (i, "c", s"t$i")))
    val got = ExtendedAnalytics.q233_salt_plan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    assert(got.toSeq === Seq("a" -> ((300L, 20L, 15L, 20L)),
      "b" -> ((50L, 20L, 3L, 17L))))
  }

  // ---------- q234 ----------

  test("q234: folds are exact-size over groups and match the replica") {
    val dir = sf()
    val members = GraphQueries.q47_dup_clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gkeyOf = docs.map { case (id, _) => id -> members.getOrElse(id, id) }.toMap
    val keys = gkeyOf.values.toSeq.distinct
    val ranked = keys.sortBy(k => (md5hex(s"cv|$k").take(8), k))
    val n = ranked.length.toLong
    val foldOf = ranked.zipWithIndex
      .map { case (k, i) => k -> i.toLong * CurationQueries.cvFolds / n }.toMap
    val truth = docs.groupBy { case (id, _) => foldOf(gkeyOf(id)) }
      .map { case (f, ds) =>
        f -> ((ds.length.toLong, ds.map(_._2).sum,
          ds.map(d => gkeyOf(d._1)).distinct.length.toLong))
      }
    val got = CurationQueries.q234_crossval_folds(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
    // exact-size guarantee: group counts per fold differ by at most 1
    val sizes = got.values.map(_._3)
    assert(sizes.max - sizes.min <= 1)
    assert(got.keySet === (0L until CurationQueries.cvFolds.toLong).toSet)
  }

  // ---------- q235 ----------

  test("q235: the sole-late-supplier verdict matches a driver-side replica") {
    import org.apache.spark.sql.functions.col
    val dir = sf()
    val orders = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").cast("string"))
      .collect().map(r => r.getLong(0) -> java.time.LocalDate.parse(r.getString(1))).toMap
    val lines = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.time.LocalDate.parse(r.getString(2))))
      .filter { case (ok, _, _) => orders.contains(ok) }
    val ps = lines.groupBy(l => (l._1, l._2)).map { case ((ok, sk), ls) =>
      (ok, sk, ls.exists(_._3.isAfter(
        orders(ok).plusDays(Analytics.waitSlaDays.toLong))))
    }.toSeq
    val per = ps.groupBy(_._1).map { case (ok, ss) =>
      ok -> ((ss.size.toLong, ss.count(_._3).toLong))
    }
    val truth = ps.filter { case (ok, _, late) =>
      late && per(ok)._1 >= 2 && per(ok)._2 == 1
    }.groupBy(_._2).map { case (sk, xs) => sk -> xs.size.toLong }
    val expect = truth.toSeq
      .sortBy { case (sk, n) => (-n, sk) }.take(20)
    val got = Analytics.q235_waiting_suppliers(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty)
    assert(got.toSeq === expect)
  }
}
