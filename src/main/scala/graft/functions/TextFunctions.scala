package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-corpus processing (SURVEY §2
  * #19–#22), built from codegen-friendly native expressions — no UDFs,
  * so they run at scan throughput and survive 100 TB.
  *
  * Every function has a DuckDB twin (the `*Sql` builders) generated
  * from the same constants, so the correctness harness can verify the
  * semantics cross-engine.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty input → empty array). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokensSql(c: String): String =
    s"list_filter(string_split_regex(trim($c), '\\s+'), t -> t <> '')"

  /** BPE-ish pretokenizer: letter runs, digit runs, single
    * non-alphanumeric marks — the shape of GPT-2's pretoken split,
    * minus the unicode categories this corpus doesn't have.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpePattern), lit(0)))

  def bpeTokenCountSql(cSql: String): String =
    s"len(regexp_extract_all($cSql, '$bpePattern'))"

  // ---------- language identification ----------

  /** Tiny per-language stopword profiles; the score is the count of
    * token occurrences from each profile. Deterministic argmax with
    * fixed preference order on ties.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "je", "avec", "un", "une"),
    "es" -> Seq("el", "los", "y", "es", "no", "yo", "con", "para", "por", "que"))

  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  def stopwordCountSql(toksSql: String, words: Seq[String]): String =
    s"len(list_filter($toksSql, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Argmax over language scores; ties resolve in declaration order;
    * all-zero → 'und' (ISO undetermined).
    *
    * Runs as the native one-pass [[graft.plans.LangId]] array scan
    * (the declarative form below traverses the array once per
    * language profile); LangIdSpec pins value equality, and the
    * DuckDB twin still speaks the declarative SQL.
    */
  def langId(toks: Column): Column =
    call_function("lang_id", toks)

  /** The declarative form [[langId]] fuses — kept as the equality
    * reference (and the shape the SQL twin mirrors).
    */
  def langIdDeclarative(toks: Column): Column = {
    val scores = stopwords.map { case (l, ws) => l -> stopwordCount(toks, ws) }
    scores.foldRight(lit("und")) { case ((l, s), rest) =>
      val beatsAll = scores.takeWhile(_._1 != l).map(_._2).foldLeft(s > 0: Column) {
        (acc, prev) => acc && s > prev
      }
      val beatsLater = scores.dropWhile(_._1 != l).drop(1).map(_._2).foldLeft(beatsAll) {
        (acc, later) => acc && s >= later
      }
      when(beatsLater, lit(l)).otherwise(rest)
    }
  }

  def langIdSql(toksSql: String): String = {
    val scoreSql = stopwords.map { case (l, ws) => l -> stopwordCountSql(toksSql, ws) }
    val branches = scoreSql.zipWithIndex.map { case ((l, s), i) =>
      val earlier = scoreSql.take(i).map { case (_, p) => s"$s > $p" }
      val later = scoreSql.drop(i + 1).map { case (_, p) => s"$s >= $p" }
      val conds = (s"$s > 0" +: (earlier ++ later)).mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE 'und' END"
  }

  // ---------- quality scoring ----------

  /** Composite quality score in [0,1]: length, stopword density,
    * non-punctuation share, mean word length. Pure double arithmetic in
    * a fixed operation order, so Spark and DuckDB agree bit-for-bit —
    * no rounding anywhere.
    *
    * Runs as the native one-pass [[graft.plans.QualityScore]] scan
    * (the declarative composite below costs four regex passes per
    * document); QualityScoreSpec pins value equality between the two,
    * and the DuckDB twin still speaks the declarative SQL.
    */
  def qualityScore(text: Column): Column =
    call_function("quality_score", text)

  /** The declarative form [[qualityScore]] fuses — kept as the
    * equality reference (and the shape the SQL twin mirrors).
    */
  def qualityScoreDeclarative(text: Column): Column = {
    val toks = tokens(text)
    val nToks = size(toks).cast("double")
    val chars = length(text).cast("double")
    val enStops = stopwordCount(toks, stopwords.head._2).cast("double")
    val letters = length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")).cast("double")
    val wordChars = length(regexp_replace(trim(text), "\\s+", "")).cast("double")
    val lenScore = least(chars / 500.0, lit(1.0))
    val stopScore = when(nToks > 0, enStops / nToks).otherwise(0.0)
    val cleanScore = when(chars > 0, letters / chars).otherwise(0.0)
    val wordScore = when(nToks > 0, least(wordChars / nToks / 8.0, lit(1.0))).otherwise(0.0)
    lenScore * 0.25 + stopScore * 0.25 + cleanScore * 0.25 + wordScore * 0.25
  }

  def qualityScoreSql(c: String): String = {
    val toks = tokensSql(c)
    val en = stopwords.head._2
    s"""(least(CAST(length($c) AS DOUBLE) / 500.0, 1.0) * 0.25
       | + (CASE WHEN CAST(len($toks) AS DOUBLE) > 0 THEN CAST(${stopwordCountSql(toks, en)} AS DOUBLE) / CAST(len($toks) AS DOUBLE) ELSE 0.0 END) * 0.25
       | + (CASE WHEN CAST(length($c) AS DOUBLE) > 0 THEN CAST(length(regexp_replace($c, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length($c) AS DOUBLE) ELSE 0.0 END) * 0.25
       | + (CASE WHEN CAST(len($toks) AS DOUBLE) > 0 THEN least(CAST(length(regexp_replace(trim($c), '\\s+', '', 'g')) AS DOUBLE) / CAST(len($toks) AS DOUBLE) / 8.0, 1.0) ELSE 0.0 END) * 0.25)""".stripMargin.replace("\n", "")
  }

  // ---------- document fingerprint ----------

  /** Polynomial rolling hash over code points, mod 2^31-1 — a classic
    * Rabin-Karp document fingerprint, as one fold expression.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (h, ch) => pmod(h * 31 + ascii(ch), lit(2147483647L)))

  // greatest(unicode(x), 0): DuckDB's unicode('') is -1 where Spark's
  // ascii('') is 0 — split('','') yields [''] in both engines, so an
  // empty (non-null) document would otherwise hash to -1 here and 0 in
  // Spark. Real characters are unaffected (unicode >= 1).
  def fingerprintSql(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | [CAST(greatest(unicode(x), 0) AS BIGINT) for x in split($c, '')]),
       | (h, x) -> (h*31 + x) % 2147483647)""".stripMargin.replace("\n", "")
}
