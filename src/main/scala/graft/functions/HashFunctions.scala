package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + SimHash primitives for near-duplicate detection at corpus
  * scale (SURVEY §2 #24–#27).
  *
  * All hashing is md5-based so Spark and DuckDB agree exactly; MinHash
  * "permutations" are the lexicographic order of salted md5 hex
  * strings (a uniform-ish total order is all MinHash needs).
  *
  * Scale design: signatures/bands are narrow per-row expressions; the
  * only shuffle in LSH candidate generation is the band-bucket
  * self-join — never an O(n²) cross product.
  */
object HashFunctions {

  /** 3-token shingles (w-shingling with w=3). Total: docs with fewer
    * than 3 tokens yield an empty array (sequence(0, size-3) would
    * descend there and element_at(_, 0) is a runtime error), matching
    * the DuckDB twin where range(1, len-1) is already empty.
    */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toksSql: String): String =
    s"[array_to_string(($toksSql)[i:i+2], ' ') for i in range(1, len($toksSql)-1)]"

  /** MinHash component i: lexicographic min of salted md5 over the
    * shingle set. NULL for docs with no shingles.
    *
    * Simple form — one md5 per (component, shingle). Prefer the
    * saltedHashes/minhashFromHashes pair below in pipelines: k
    * components there cost ceil(k/6) md5 per shingle instead of k,
    * which cut the sf0.1 signature stage ~6x.
    */
  def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$i|"), s))))

  def minhashSql(shSql: String, i: Int): String =
    s"list_min([md5(concat('$i|', s)) for s in $shSql])"

  /** One salted md5 per shingle; six disjoint 5-hex-digit slices of
    * each digest serve as six independent 20-bit hash functions
    * (disjoint bit ranges of one md5 are independent uniform values).
    */
  def saltedHashes(sh: Column, salt: Int): Column =
    transform(sh, s => md5(concat(lit(s"$salt|"), s)))

  def saltedHashesSql(shSql: String, salt: Int): String =
    s"[md5(concat('$salt|', s)) for s in $shSql]"

  /** MinHash from precomputed digests: min of slice `slice` (0..5). */
  def minhashFromHashes(hs: Column, slice: Int): Column =
    array_min(transform(hs, h => substring(h, 1 + slice * 5, 5)))

  def minhashFromHashesSql(hsSql: String, slice: Int): String =
    s"list_min([substring(h, ${1 + slice * 5}, 5) for h in $hsSql])"

  /** LSH band bucket: hash of `rows` consecutive signature components.
    * Equal buckets in a band ⇒ candidate pair.
    *
    * NULL components (a doc with no shingles) PROPAGATE to a NULL
    * bucket, which an equi-join never matches — concat_ws would
    * silently skip them instead, collapsing every degenerate doc into
    * one md5('') mega-bucket (an O(n²) pair blowup plus false
    * near-dup clusters). Both dialects use null-propagating
    * concatenation; for non-null inputs the bytes hashed are identical
    * to the previous concat_ws form.
    */
  def bandBucket(sig: Seq[Column], band: Int, rows: Int): Column = {
    val parts = sig.slice(band * rows, band * rows + rows)
    require(parts.nonEmpty,
      s"band $band x $rows rows is outside the ${sig.length}-component signature")
    val interleaved = parts.head +: parts.tail.flatMap(c => Seq(lit("|"), c))
    md5(concat(interleaved: _*))
  }

  def bandBucketSql(sigSql: Seq[String], band: Int, rows: Int): String =
    s"md5(${sigSql.slice(band * rows, band * rows + rows).mkString(" || '|' || ")})"

  /** 60-bit integer shingle key: the first 15 hex digits of the
    * shingle's md5, parsed as a long. Set operations (Jaccard
    * intersections) over keys cost an 8-byte compare instead of a
    * string compare, and both engines derive the identical value —
    * a cross-engine-stable "hash the join key, not the text" step.
    */
  def shingleKeys(sh: Column): Column =
    transform(sh, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))

  def shingleKeysSql(shSql: String): String =
    s"[CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) for s in $shSql]"

  // ---------- SimHash ----------

  /** Default fingerprint width in bits. This is THE bucket-occupancy
    * knob of the simhash family: expected exact-collision candidates
    * scale ~ n²/2^width, so the width must grow with the corpus
    * (16 bits is sized for the sf test corpora; a 100 TB corpus wants
    * 48–62). Any width in [1, 62] works — bit b is drawn from md5 hex
    * digit b/4 (32 digits = 128 bits available) and fingerprints pack
    * into a BIGINT.
    */
  val simhashDefaultWidth = 16

  private def checkWidth(width: Int): Unit =
    require(width >= 1 && width <= 62, s"simhash width must be in [1, 62], got $width")

  /** width-bit SimHash: per token, bits are drawn from the md5 hex
    * digits; each bit votes ±1; the sign of the total vote is the
    * fingerprint bit. Near-duplicates land within small Hamming
    * distance. Emitted as one SQL expression string in either dialect
    * (spark=true → Spark SQL for expr(), false → DuckDB).
    */
  def simhashSql(toksSql: String, spark: Boolean, width: Int = simhashDefaultWidth): String = {
    val md5s =
      if (spark) s"transform($toksSql, t -> md5(t))"
      else s"[md5(t) for t in $toksSql]"
    simhashFromHashesSql(md5s, spark, width)
  }

  /** Single-pass Spark form: one aggregate over the digest array (`hs`
    * column) with a width-element vote accumulator, instead of width
    * separate aggregate traversals. Integer arithmetic, so it matches
    * the per-bit DuckDB oracle exactly.
    */
  def simhashSinglePassSpark(width: Int = simhashDefaultWidth): String = {
    checkWidth(width)
    s"""aggregate(
       |  zip_with(
       |    aggregate(hs, array_repeat(CAST(0 AS BIGINT), $width),
       |      (acc, h) -> zip_with(acc, transform(sequence(0, ${width - 1}), b ->
       |        CAST(2 * (shiftright(instr('0123456789abcdef', substring(h, 1 + (b div 4), 1)) - 1, b % 4) & 1) - 1 AS BIGINT)),
       |        (a, v) -> a + v)),
       |    sequence(0, ${width - 1}),
       |    (v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin
  }

  /** SimHash from a precomputed per-token digest array column — md5
    * runs once per token, not once per (token, bit).
    */
  def simhashFromHashesSql(hsSql: String, spark: Boolean,
      width: Int = simhashDefaultWidth): String = {
    checkWidth(width)
    val posFn = if (spark) "instr" else "strpos"
    def shr(x: String, n: Int) = if (spark) s"shiftright($x, $n)" else s"($x >> $n)"
    val bits = (0 until width).map { b =>
      val digit = s"($posFn('0123456789abcdef', substring(h, ${1 + b / 4}, 1)) - 1)"
      val bit = s"(${shr(digit, b % 4)} & 1)"
      // vote_b over all tokens: sum of (2*bit - 1)
      val votes =
        if (spark) s"aggregate($hsSql, 0L, (acc, h) -> acc + (2 * $bit - 1))"
        else s"list_sum([2 * $bit - 1 for h in $hsSql])"
      s"(CASE WHEN $votes > 0 THEN ${1L << b} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** Hamming distance between two width-bit simhashes, as a
    * dialect-paired SQL expression (popcount of xor).
    */
  def hammingSql(a: String, b: String, spark: Boolean,
      width: Int = simhashDefaultWidth): String = {
    checkWidth(width)
    val xor = if (spark) s"($a ^ $b)" else s"xor($a, $b)"
    def shr(e: String, n: Int) = if (spark) s"shiftright($e, $n)" else s"($e >> $n)"
    (0 until width).map(i => s"(${shr(xor, i)} & 1)").mkString("(", " + ", ")")
  }

  /** Hamming via native popcount — width-independent (fingerprints
    * occupy the low `width` bits of a BIGINT, the rest xor to zero),
    * so it keeps working when the width is decided at runtime. Cast
    * to BIGINT in both dialects (Spark bit_count → INT, DuckDB →
    * TINYINT) so the compared schemas agree.
    */
  def hammingCountSql(a: String, b: String, spark: Boolean): String =
    if (spark) s"CAST(bit_count($a ^ $b) AS BIGINT)"
    else s"CAST(bit_count(xor($a, $b)) AS BIGINT)"

  // ---------- corpus-adaptive width ----------

  /** `(threshold, width)` steps of the adaptive-width policy: expected
    * exact-collision candidates scale ~ n²/2^width, so occupancy stays
    * flat by adding 2 bits per corpus doubling past 1000 docs
    * (n ≤ 1000 → 16, ≤ 2000 → 18, … capped at 62 so fingerprints stay
    * in a BIGINT). ONE table renders both the Scala step function and
    * the DuckDB CASE, so the engines cannot disagree at a boundary.
    */
  private val widthSteps: Seq[(Long, Int)] = {
    var t = 1000L
    (simhashDefaultWidth to 60 by 2).map { w => val step = (t, w); t *= 2; step }
  }

  /** Adaptive fingerprint width for an n-doc corpus (Spark side). */
  def simhashWidthFor(n: Long): Int =
    widthSteps.collectFirst { case (t, w) if n <= t => w }.getOrElse(62)

  /** The same policy as [[simhashWidthFor]], as a DuckDB CASE over a
    * row-count expression — the oracle derives its width from the
    * corpus exactly like the Spark plan does.
    */
  def simhashWidthCaseSql(nSql: String): String =
    widthSteps.map { case (t, w) => s"WHEN $nSql <= $t THEN $w" }
      .mkString("(CASE ", " ", " ELSE 62 END)")

  /** Dynamic-width DuckDB simhash: identical bit/vote arithmetic to
    * [[simhashFromHashesSql]] but with the unrolled per-bit terms
    * replaced by a list comprehension over range(0, widthSql), so the
    * width can come from a SQL value (e.g. the CASE above) instead of
    * being baked into the rendered text. Bit/vote arithmetic is
    * byte-for-byte the static form's; the driver's DuckDB oracle run
    * (any sf) exercises it against the Spark fingerprint end-to-end.
    */
  def simhashFromHashesDynSql(hsSql: String, widthSql: String): String =
    // outer CAST: DuckDB list_sum over BIGINTs yields HUGEINT; the
    // fingerprint must stay a BIGINT for the probe xor and equi-join
    s"""CAST(list_sum([CASE WHEN list_sum([2 * (((strpos('0123456789abcdef', substring(h, 1 + (b // 4), 1)) - 1) >> (b % 4)) & 1) - 1 for h in $hsSql]) > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END for b in range(0, $widthSql)]) AS BIGINT)"""
}
