package graft.queries

import graft.SparkSpec

/** q126 against a sequential replica on a hand corpus: same window
  * pairing, same canonical unordered pairs, same integer lift
  * arithmetic (BigInt mirrors decimal(38,0)), same top-k ordering.
  */
class SkipgramSpec extends SparkSpec {

  private def replica(texts: Seq[String]): Seq[(String, Long, Long, Long, Long)] = {
    val docs = texts.map(_.toLowerCase.split("\\s+").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nToks = uni.values.sum
    val pairs = docs.flatMap { t =>
      t.indices.flatMap { i =>
        ((i + 1) to math.min(i + LanguageModel.skipWindow, t.size - 1)).map { j =>
          val (a, b) = (t(i), t(j))
          if (a <= b) s"$a $b" else s"$b $a"
        }
      }
    }
    val pc = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nPairs = pc.values.sum
    pc.toSeq
      .filter(_._2 >= LanguageModel.collocationMinCount)
      .map { case (p, c) =>
        val Array(w1, w2) = p.split(" ")
        val lift = (BigInt(c) * nToks * nToks * 1000000L /
          (BigInt(nPairs) * uni(w1) * uni(w2))).toLong
        (p, c, uni(w1), uni(w2), lift)
      }
      .sortBy { case (p, _, _, _, l) => (-l, p) }
      .take(LanguageModel.collocationTopK)
  }

  test("windowed pairs, canonicalization, and integer lift match the replica") {
    import spark.implicits._
    // "x y" always adjacent (high lift); "q" scattered everywhere
    // (low lift); a trailing word exercises the window truncation
    val texts = Seq.fill(5)("x y q m n q p x y q") ++ Seq.fill(3)("m q p n x y")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("skipgram").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = LanguageModel.q126_skipgram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === replica(texts))
  }
}
