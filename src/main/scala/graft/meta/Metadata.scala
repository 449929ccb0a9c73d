package graft.meta

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative pipeline metadata model.
  *
  * Mirrors the reference's metadata contract
  * (reference config/metadata_motor.json; parsed in
  * pipeline/runner.py:140-§ff): a pipeline is `dataflows[]`, each with
  * `sources[]`, `transformations[]`, `sinks[]`, plus an optional
  * `consolidation` block and batch config. Parsing is strict: unknown
  * transform types / malformed rules fail fast at load time, before any
  * cluster resources are spent.
  */
final case class FieldDef(name: String, dataType: String, nullable: Boolean)

final case class SchemaDef(fields: Seq[FieldDef])

final case class SourceDef(
    name: String,
    path: String,
    format: String,
    required: Boolean,
    schema: Option[SchemaDef],
    schemaEnforced: Boolean,
    options: Map[String, String])

/** A validation rule. Simple rules carry no parameter
  * (reference pipeline/validator.py SIMPLE_RULES); parameterized rules
  * carry one (PARAMETERIZED_RULES).
  */
sealed trait RuleDef
case object NotNullRule extends RuleDef
case object NotEmptyRule extends RuleDef
final case class RegexRule(pattern: String) extends RuleDef
final case class MinValueRule(min: Double) extends RuleDef

final case class ValidationDef(field: String, rules: Seq[RuleDef])

sealed trait TransformDef { def name: String; def input: String }
final case class AddFieldsDef(
    name: String,
    input: String,
    fields: Seq[(String, String)] // (column name, function name)
) extends TransformDef
final case class ValidateFieldsDef(
    name: String,
    input: String,
    validations: Seq[ValidationDef]
) extends TransformDef

final case class SinkDef(
    input: String,
    name: String,
    path: String,
    format: String,
    saveMode: String,
    partitionBy: Seq[String],
    // small-file compaction: bin-pack output so each written file
    // lands near this size (None = write whatever the upstream
    // partitioning produced)
    targetFileMB: Option[Int] = None)

final case class DedupDef(
    enabled: Boolean,
    keyColumn: String,
    orderBy: String,
    orderDirection: String,
    // unique column resolving orderBy ties so keep-newest is total
    // (deterministic across engines/reruns); when absent, ties are
    // broken arbitrarily — the reference's ROW_NUMBER behavior
    tieBreaker: Option[String] = None)

final case class ConsolidationDef(
    enabled: Boolean,
    inputPattern: String,
    outputPath: String,
    dedup: DedupDef)

final case class DataflowDef(
    name: String,
    sources: Seq[SourceDef],
    transformations: Seq[TransformDef],
    sinks: Seq[SinkDef])

/** Declarative LLM-curation chain — the reference's metadata pattern
  * (`validate_fields`-style JSON) applied to the training-data
  * operators: exact dedup, LSH near-dedup, quality filtering, and
  * benchmark decontamination declared as data, so q86's hand-composed
  * funnel is expressible as pure config
  * ([[graft.queries.CurationFlow]] interprets it). Parsing is strict
  * like every other block: unknown stage types, unknown metrics/ops,
  * type-mismatched rule values, duplicate stage names all fail at
  * load time.
  */
sealed trait CurationStageDef { def name: String }
final case class DedupExactStageDef(name: String) extends CurationStageDef
final case class DedupNearStageDef(name: String) extends CurationStageDef
final case class QualityRuleDef(
    reason: String,
    metric: String, // n_toks | quality (numeric), lang_det (string)
    op: String,     // lt | gt (numeric), eq (string)
    numValue: Option[BigDecimal],
    strValue: Option[String])
final case class QualityStageDef(
    name: String, rules: Seq[QualityRuleDef]) extends CurationStageDef
final case class DecontaminateStageDef(
    name: String, shingles: Seq[String]) extends CurationStageDef

/** Embedding-space near-dedup as a declared stage (q87's SemDeDup
  * membership): a row is dropped iff its id appears as a
  * NON-REPRESENTATIVE member of a trained-cluster duplicate pair —
  * the paraphrase-robust complement of `dedup_near`'s shingle LSH.
  * `missing` declares what happens to rows WITHOUT an embedding
  * ("keep" passes them through, the safe default; "drop" excludes
  * them) — declared, never silent, because the corpus carries no
  * doc↔vector contract. Trained k-means floats have no SQL twin, so
  * a config declaring this stage is spec-gated rows-only (oracleSql
  * refuses to render it).
  */
final case class DedupSemanticStageDef(
    name: String, missing: String) extends CurationStageDef

/** One masking rule: rewrite every regex match of `pattern` to the
  * literal `replacement`. The parser pins both to engine-neutral
  * shapes — patterns to the printable-ASCII subset without quotes or
  * backslashes (the Java/RE2 common syntax the q50 family already
  * relies on), replacements to a plain-literal charset with no group
  * references — so the same rule means the same rewrite in Spark and
  * in the generated DuckDB oracle, and a config can never smuggle SQL
  * into the rendered twin.
  */
final case class MaskRuleDef(pattern: String, replacement: String)

/** Declared PII/entity masking — governance as grammar stage #9 (the
  * q50/q109 redaction family made metadata-driven). A mask stage is a
  * text PRE-PASS, not a membership: it drops no rows, and the masked
  * text IS the corpus every downstream inline computation reads —
  * token counts, quality metrics, content-hash dedup, decontamination
  * shingles, budget weights, and the report's token mass. That is the
  * scrub-before-hash rule a governed pipeline needs: no unmasked
  * content ever reaches a derived artifact. The parser therefore
  * requires mask stages to be declared BEFORE any membership stage.
  * Stored-index memberships (dedup_near, leakage-free splits) stay
  * keyed on the prebuilt signature family's ids — the index predates
  * the scrub by construction.
  */
final case class MaskStageDef(
    name: String, rules: Seq[MaskRuleDef]) extends CurationStageDef

/** Declared span scrubbing (q123's operator as a grammar stage): a
  * text PRE-PASS like mask, but corpus-keyed — the text is chunked
  * into consecutive `spanLen`-token spans (the sub-spanLen tail is
  * exempt), any span duplicated across ≥ 2 documents is removed from
  * ALL of them, and the survivors rejoin in original order. The
  * remove-duplicated-substrings dedup of Lee et al. 2021 for
  * stitched/boilerplate corpora, where repeated passages should be
  * cut rather than whole documents dropped. Downstream stages read
  * the scrubbed text (same scrub-before-hash rule as mask); pre-pass
  * ordering is declared order, so a mask before a span_scrub masks
  * what the span hashes see.
  */
final case class SpanScrubStageDef(
    name: String, spanLen: Int) extends CurationStageDef

/** Declared containment dedup (q108's operator as a membership
  * stage): a document whose shingle set is ≥ `minPct` percent
  * contained in another document's is dropped (both ≥ minPct — the
  * near-identical case — drops the higher id, keeping the min-id
  * representative like dedup_exact). Candidate pairs come from q108's
  * rare-shingle postings (df ≤ dfCut, ≥ minSharedRare shared), so the
  * pair space stays bounded; the threshold compares
  * `|A∩B|·100 ≥ minPct·|A|` — pure integers, no float containment
  * ratio, so the generated oracle is exact. Catches the
  * asymmetric-overlap class LSH's symmetric Jaccard misses (a short
  * document embedded in a long one).
  */
final case class ContainmentStageDef(
    name: String, minPct: Int) extends CurationStageDef

/** Mixture-weighted sampling as a declared stage (q36's operator): a
  * row survives iff the first hex digit of md5(salt|id) falls below
  * its group's keep16 sixteenths; groups key on the `by` column.
  * Undeclared groups keep 0/16 — an explicit, auditable drop.
  */
final case class MixtureStageDef(
    name: String, salt: String, by: String,
    weights: Seq[(String, Int)]) extends CurationStageDef

/** Deterministic split assignment as a declared stage (q78/q223's
  * operator): bucket = the first two hex digits of md5(salt|key) as an
  * integer in [0, 256); the row survives iff its bucket's split equals
  * `keep`. With `leakageFree` the key is the near-dup cluster
  * representative (q223's rule — a whole duplicate cluster lands in
  * ONE split), else the row id (q78's rule).
  */
final case class SplitStageDef(
    name: String, salt: String, buckets: Seq[(String, Int)],
    keep: String, leakageFree: Boolean) extends CurationStageDef

/** Survivor-aware token budget as a declared stage — q63's capped
  * hash-ordered stream made HONEST the way q212 argues: within each
  * `by` group, rows are ordered by a salted content hash and kept
  * while the cumulative token count of rows that SURVIVED all earlier
  * declared stages stays under `budget`. Upstream-dropped rows spend
  * nothing, so the cap buys exactly what curation keeps; declared
  * first, it is q63's raw-corpus budget verbatim.
  */
final case class TokenBudgetStageDef(
    name: String, salt: String, by: String,
    budget: Long) extends CurationStageDef

final case class CurationDef(
    table: String,
    idColumn: String,
    textColumn: String,
    reportBy: String,
    stages: Seq[CurationStageDef],
    // the funnel's WRITE side, speaking the exact sink/consolidation
    // grammar of the dataflow block (reference
    // config/metadata_motor.json `sinks[]` + `consolidation`): declared
    // sinks receive the survivors (partitioned, compacted, appended per
    // batch); declared consolidation collapses the appended batches
    // keep-latest by key. Paths may carry an {out} placeholder the
    // runner substitutes
    sinks: Seq[SinkDef] = Seq.empty,
    consolidation: Option[ConsolidationDef] = None)

final case class PipelineMeta(
    processingMode: String,
    dataflows: Seq[DataflowDef],
    consolidation: Option[ConsolidationDef],
    // table-level quality contract, declared in the same document as
    // the dataflows it certifies (graft.operators.Expectations)
    expectations: Seq[graft.operators.Expectations.ExpectationDef] = Seq.empty)

class MetadataError(msg: String) extends RuntimeException(msg)

object Metadata {

  def parse(json: String): PipelineMeta = parseAst(JsonMethods.parse(json))

  private def fail(msg: String): Nothing = throw new MetadataError(msg)

  private def str(v: JValue, what: String): String = v match {
    case JString(s) => s
    case other      => fail(s"$what must be a string, got $other")
  }

  private def optStr(o: JObject, key: String): Option[String] =
    o.obj.collectFirst { case (`key`, JString(s)) => s }

  private def field(o: JObject, key: String): Option[JValue] =
    o.obj.collectFirst { case (`key`, v) if v != JNothing && v != JNull => v }

  private def arr(v: JValue, what: String): Seq[JValue] = v match {
    case JArray(xs) => xs
    case other      => fail(s"$what must be an array, got $other")
  }

  private def obj(v: JValue, what: String): JObject = v match {
    case o: JObject => o
    case other      => fail(s"$what must be an object, got $other")
  }

  private def parseAst(root: JValue): PipelineMeta = {
    val r = obj(root, "metadata root")
    val mode = optStr(r, "processing_mode").getOrElse("full")
    val flows = field(r, "dataflows")
      .map(v => arr(v, "dataflows").map(f => parseDataflow(obj(f, "dataflow"))))
      .getOrElse(fail("metadata missing 'dataflows'"))
    val consolidation = field(r, "consolidation")
      .map(c => parseConsolidation(obj(c, "consolidation")))
    PipelineMeta(mode, flows, consolidation, parseExpectationsField(r))
  }

  /** Parse a standalone expectations document:
    * `{"expectations": [ {...}, ... ]}` — the table-level quality
    * contract as data (the reference declares its row-level rules in
    * metadata and its table-level contract as a pytest suite; here
    * both speak the same JSON). Strict like every other block:
    * unknown kinds, missing fields, duplicate ids fail at parse time.
    */
  def parseExpectations(json: String): Seq[graft.operators.Expectations.ExpectationDef] = {
    val defs = parseExpectationsField(obj(JsonMethods.parse(json), "expectations root"))
    if (defs.isEmpty) fail("expectations document declares no expectations")
    defs
  }

  private def parseExpectationsField(
      r: JObject): Seq[graft.operators.Expectations.ExpectationDef] = {
    import graft.operators.Expectations._
    val defs = field(r, "expectations")
      .map(v => arr(v, "expectations").map { e =>
        val o = obj(e, "expectation")
        val id = optStr(o, "id").getOrElse(fail("expectation missing 'id'"))
        def table = optStr(o, "table").getOrElse(fail(s"expectation '$id' missing 'table'"))
        def column = optStr(o, "column").getOrElse(fail(s"expectation '$id' missing 'column'"))
        def num(key: String): Option[Double] = field(o, key).map {
          case JInt(i)     => i.toDouble
          case JLong(l)    => l.toDouble
          case JDouble(d)  => d
          case JDecimal(d) => d.toDouble
          case other       => fail(s"expectation '$id' $key must be numeric, got $other")
        }
        optStr(o, "kind").getOrElse(fail(s"expectation '$id' missing 'kind'")) match {
          case "unique"   => Unique(id, table, column)
          case "not_null" => NotNull(id, table, column)
          case "accepted_values" =>
            val values = field(o, "values")
              .map(v => arr(v, s"expectation '$id' values").map(s => str(s, "accepted value")))
              .getOrElse(fail(s"expectation '$id' missing 'values'"))
            if (values.isEmpty) fail(s"expectation '$id' declares an empty domain")
            AcceptedValues(id, table, column, values)
          case "bounds" =>
            val (mn, mx) = (num("min"), num("max"))
            if (mn.isEmpty && mx.isEmpty)
              fail(s"expectation '$id' bounds needs at least one of min/max")
            Bounds(id, table, column, mn, mx)
          case "row_count_min" =>
            RowCountMin(id, table, num("min_rows")
              .getOrElse(fail(s"expectation '$id' missing 'min_rows'")).toLong)
          case "foreign_key" =>
            ForeignKey(id, table, column,
              optStr(o, "ref_table").getOrElse(fail(s"expectation '$id' missing 'ref_table'")),
              optStr(o, "ref_column").getOrElse(fail(s"expectation '$id' missing 'ref_column'")))
          case other =>
            fail(s"Unsupported expectation kind '$other' for '$id'. Supported kinds: " +
              "[accepted_values, bounds, foreign_key, not_null, row_count_min, unique]")
        }
      })
      .getOrElse(Seq.empty)
    val dup = defs.map(_.id).groupBy(identity).collectFirst { case (id, ids) if ids.size > 1 => id }
    dup.foreach(id => fail(s"duplicate expectation id '$id'"))
    defs
  }

  /** Parse a standalone curation document:
    * `{"curation": {table, id_column, text_column, report_by,
    * stages: [...]}}`. Strict: every knob the interpreter uses must
    * be declared and well-typed, or the load fails before any cluster
    * resources are spent.
    */
  def parseCuration(json: String): CurationDef = {
    val r = obj(JsonMethods.parse(json), "curation root")
    val c = field(r, "curation").map(v => obj(v, "curation"))
      .getOrElse(fail("curation document missing 'curation'"))
    val table = optStr(c, "table").getOrElse(fail("curation missing 'table'"))
    val stages = field(c, "stages")
      .map(v => arr(v, "curation stages").map(s => parseCurationStage(obj(s, "stage"))))
      .getOrElse(fail("curation missing 'stages'"))
    if (stages.isEmpty) fail("curation declares no stages")
    val dup = stages.map(_.name).groupBy(identity)
      .collectFirst { case (n, ns) if ns.size > 1 => n }
    dup.foreach(n => fail(s"duplicate curation stage name '$n'"))
    stages.map(_.name).foreach { n =>
      if (!n.matches("[a-z][a-z0-9_]*"))
        fail(s"curation stage name '$n' must match [a-z][a-z0-9_]* " +
          "(it becomes the report's n_<name> column)")
    }
    // mask / span_scrub are text pre-passes: everything downstream
    // reads the rewritten corpus, so one declared AFTER a membership
    // stage would claim an ordering the interpreter cannot honor —
    // die at parse time
    def isPrePass(st: CurationStageDef): Boolean = st match {
      case _: MaskStageDef | _: SpanScrubStageDef => true
      case _                                      => false
    }
    val firstMember = stages.indexWhere(!isPrePass(_))
    if (firstMember >= 0)
      stages.drop(firstMember).find(isPrePass)
        .foreach(m => fail(s"stage '${m.name}' is a text pre-pass " +
          "(mask / span_scrub) declared after a membership stage — " +
          "pre-passes must come first"))
    val idColumn = optStr(c, "id_column").getOrElse(fail("curation missing 'id_column'"))
    val textColumn = optStr(c, "text_column").getOrElse(fail("curation missing 'text_column'"))
    val needsSignatures = stages.exists {
      case _: DedupNearStageDef => true
      case s: SplitStageDef     => s.leakageFree
      case _                    => false
    }
    val needsEmbeddings = stages.exists(_.isInstanceOf[DedupSemanticStageDef])
    if (needsEmbeddings) {
      // the SemDeDup clusters are trained over embeddings(vec_id) and
      // the membership joins doc_id = vec_id; any other table/key would
      // silently semantic-dedup nothing
      if (table != "documents" || idColumn != "doc_id")
        fail("dedup_semantic joins the embeddings table on doc_id = " +
          s"vec_id; it requires table='documents' and id_column='doc_id', " +
          s"got table='$table', id_column='$idColumn'")
    }
    if (needsSignatures) {
      // the LSH signature family is built over documents(doc_id, text);
      // a config declaring other columns would silently near-dedup
      // against the wrong column IDENTICALLY in both engines (the
      // generated oracle speaks the same config), so the mismatch must
      // die at parse time, not pass the gate
      if (table != "documents")
        fail("dedup_near / leakage-free split are defined over the " +
          s"documents LSH signature family; table '$table' has no " +
          "signature index")
      if (idColumn != "doc_id" || textColumn != "text")
        fail("dedup_near / leakage-free split require id_column='doc_id' " +
          "and text_column='text' (the signature family's key/text); got " +
          s"id_column='$idColumn', text_column='$textColumn'")
    }
    val sinks = field(c, "sinks")
      .map(v => arr(v, "curation sinks").map(s => parseSink(obj(s, "sink"))))
      .getOrElse(Seq.empty)
    val consolidation = field(c, "consolidation")
      .map(v => parseConsolidation(obj(v, "consolidation")))
    consolidation.filter(_.enabled).foreach { cons =>
      if (sinks.isEmpty)
        fail("curation declares consolidation but no sinks — there is " +
          "nothing to consolidate")
      if (cons.inputPattern.isEmpty || cons.outputPath.isEmpty)
        fail("curation consolidation needs ok_records.input_pattern and " +
          "ok_records.output_path")
      if (cons.dedup.enabled && cons.dedup.keyColumn != idColumn)
        fail(s"curation consolidation dedups on '${cons.dedup.keyColumn}' " +
          s"but the funnel's row identity is '$idColumn' — keep-latest on " +
          "any other key would silently merge distinct documents")
    }
    CurationDef(
      table = table,
      idColumn = idColumn,
      textColumn = textColumn,
      reportBy = optStr(c, "report_by").getOrElse(fail("curation missing 'report_by'")),
      stages = stages,
      sinks = sinks,
      consolidation = consolidation)
  }

  private val numericMetrics = Set("n_toks", "quality")
  private val stringMetrics = Set("lang_det")

  /** Salts/columns land inside generated SQL — pin them to identifier-
    * safe shapes at parse time so a config can never smuggle SQL. */
  private val saltPattern = "[A-Za-z0-9_-]+"
  private val identPattern = "[a-z][a-z0-9_]*"

  private def intOf(v: JValue, what: String): Int = v match {
    case JInt(i)  => i.toInt
    case JLong(l) => l.toInt
    case other    => fail(s"$what must be an integer, got $other")
  }

  private def parseCurationStage(o: JObject): CurationStageDef = {
    val name = optStr(o, "name").getOrElse(fail("curation stage missing 'name'"))
    def salt: String = {
      val s = optStr(o, "salt").getOrElse(fail(s"stage '$name' missing 'salt'"))
      if (!s.matches(saltPattern))
        fail(s"stage '$name' salt '$s' must match $saltPattern")
      s
    }
    optStr(o, "type").getOrElse(fail(s"curation stage '$name' missing 'type'")) match {
      case "dedup_exact" => DedupExactStageDef(name)
      case "dedup_near"  => DedupNearStageDef(name)
      case "mask" =>
        val rules = field(o, "rules")
          .map(v => arr(v, s"mask stage '$name' rules").map { r =>
            val ro = obj(r, "mask rule")
            val pattern = optStr(ro, "pattern")
              .getOrElse(fail(s"mask stage '$name' rule missing 'pattern'"))
            // printable ASCII minus single-quote (0x27) and backslash
            // (0x5C): the regex subset Java and RE2 read identically,
            // and a literal that can never escape its SQL quoting
            if (pattern.isEmpty || !pattern.matches("[\\x20-\\x26\\x28-\\x5b\\x5d-\\x7e]+"))
              fail(s"mask stage '$name' pattern '$pattern' must be " +
                "non-empty printable ASCII without quotes or backslashes")
            try java.util.regex.Pattern.compile(pattern)
            catch { case e: java.util.regex.PatternSyntaxException =>
              fail(s"mask stage '$name' pattern '$pattern' does not " +
                s"compile: ${e.getDescription}")
            }
            val replacement = optStr(ro, "replacement")
              .getOrElse(fail(s"mask stage '$name' rule missing 'replacement'"))
            // plain literal only — no $n / \n group references, which
            // Spark and DuckDB would read differently
            if (!replacement.matches("[A-Za-z0-9<>_. -]*"))
              fail(s"mask stage '$name' replacement '$replacement' must " +
                "be a plain literal ([A-Za-z0-9<>_. -]*, no group refs)")
            MaskRuleDef(pattern, replacement)
          })
          .getOrElse(fail(s"mask stage '$name' missing 'rules'"))
        if (rules.isEmpty) fail(s"mask stage '$name' declares no rules")
        MaskStageDef(name, rules)
      case "span_scrub" =>
        val spanLen = intOf(field(o, "span_len")
          .getOrElse(fail(s"span_scrub stage '$name' missing 'span_len'")),
          s"span_scrub stage '$name' span_len")
        if (spanLen < 2 || spanLen > 64)
          fail(s"span_scrub stage '$name' span_len must be in [2, 64], " +
            s"got $spanLen")
        SpanScrubStageDef(name, spanLen)
      case "containment" =>
        val minPct = intOf(field(o, "min_pct")
          .getOrElse(fail(s"containment stage '$name' missing 'min_pct'")),
          s"containment stage '$name' min_pct")
        if (minPct < 1 || minPct > 100)
          fail(s"containment stage '$name' min_pct must be in [1, 100], " +
            s"got $minPct")
        ContainmentStageDef(name, minPct)
      case "dedup_semantic" =>
        val missing = optStr(o, "missing").getOrElse("keep")
        if (missing != "keep" && missing != "drop")
          fail(s"semantic stage '$name' missing-policy must be 'keep' or " +
            s"'drop', got '$missing'")
        DedupSemanticStageDef(name, missing)
      case "token_budget" =>
        val by = optStr(o, "by").getOrElse(fail(s"budget stage '$name' missing 'by'"))
        if (!by.matches(identPattern))
          fail(s"budget stage '$name' by-column '$by' must match $identPattern")
        val budget = field(o, "budget") match {
          case Some(JInt(i))  => i.toLong
          case Some(JLong(l)) => l
          case Some(other)    => fail(s"budget stage '$name' budget must be an integer, got $other")
          case None           => fail(s"budget stage '$name' missing 'budget'")
        }
        if (budget <= 0) fail(s"budget stage '$name' budget must be positive, got $budget")
        TokenBudgetStageDef(name, salt, by, budget)
      case "mixture_sample" =>
        val by = optStr(o, "by").getOrElse(fail(s"mixture stage '$name' missing 'by'"))
        if (!by.matches(identPattern))
          fail(s"mixture stage '$name' by-column '$by' must match $identPattern")
        val weights = field(o, "weights")
          .map(v => arr(v, s"mixture stage '$name' weights").map { w =>
            val wo = obj(w, "mixture weight")
            val grp = optStr(wo, "group")
              .getOrElse(fail(s"mixture stage '$name' weight missing 'group'"))
            val k = intOf(field(wo, "keep16")
              .getOrElse(fail(s"mixture stage '$name' weight '$grp' missing 'keep16'")),
              s"mixture stage '$name' keep16")
            if (k < 0 || k > 16)
              fail(s"mixture stage '$name' keep16 for '$grp' must be in [0, 16], got $k")
            (grp, k)
          })
          .getOrElse(fail(s"mixture stage '$name' missing 'weights'"))
        if (weights.isEmpty) fail(s"mixture stage '$name' declares no weights")
        weights.map(_._1).groupBy(identity)
          .collectFirst { case (g, gs) if gs.size > 1 => g }
          .foreach(g => fail(s"mixture stage '$name' declares group '$g' twice"))
        MixtureStageDef(name, salt, by, weights)
      case "split" =>
        val buckets = field(o, "buckets")
          .map(v => arr(v, s"split stage '$name' buckets").map { b =>
            val bo = obj(b, "split bucket")
            val bn = optStr(bo, "name")
              .getOrElse(fail(s"split stage '$name' bucket missing 'name'"))
            if (!bn.matches(saltPattern))
              fail(s"split stage '$name' bucket name '$bn' must match $saltPattern")
            (bn, intOf(field(bo, "upper")
              .getOrElse(fail(s"split stage '$name' bucket '$bn' missing 'upper'")),
              s"split stage '$name' upper"))
          })
          .getOrElse(fail(s"split stage '$name' missing 'buckets'"))
        if (buckets.isEmpty) fail(s"split stage '$name' declares no buckets")
        buckets.map(_._2).foldLeft(0) { (prev, ub) =>
          if (ub <= prev)
            fail(s"split stage '$name' bucket uppers must be strictly " +
              s"increasing in (0, 256], got $ub after $prev")
          ub
        }
        if (buckets.last._2 != 256)
          fail(s"split stage '$name' buckets must cover [0, 256): last " +
            s"upper is ${buckets.last._2}, expected 256")
        val keep = optStr(o, "keep").getOrElse(fail(s"split stage '$name' missing 'keep'"))
        if (!buckets.exists(_._1 == keep))
          fail(s"split stage '$name' keeps unknown bucket '$keep' " +
            s"(declared: ${buckets.map(_._1).mkString(", ")})")
        val leakFree = field(o, "leakage_free") match {
          case Some(JBool(b)) => b
          case Some(other)    => fail(s"split stage '$name' leakage_free must be boolean, got $other")
          case None           => false
        }
        SplitStageDef(name, salt, buckets, keep, leakFree)
      case "quality_filter" =>
        val rules = field(o, "rules")
          .map(v => arr(v, s"quality stage '$name' rules"))
          .getOrElse(fail(s"quality stage '$name' missing 'rules'"))
        if (rules.isEmpty) fail(s"quality stage '$name' declares no rules")
        QualityStageDef(name, rules.map(r => parseQualityRule(obj(r, "quality rule"))))
      case "decontaminate" =>
        val shingles = field(o, "shingles")
          .map(v => arr(v, s"decontaminate stage '$name' shingles")
            .map(s => str(s, "shingle")))
          .getOrElse(fail(s"decontaminate stage '$name' missing 'shingles'"))
        if (shingles.isEmpty) fail(s"decontaminate stage '$name' declares an empty benchmark list")
        DecontaminateStageDef(name, shingles)
      case other =>
        fail(s"Unsupported curation stage type '$other' for '$name'. Supported " +
          "types: [decontaminate, dedup_exact, dedup_near, mixture_sample, " +
          "quality_filter, split, token_budget]")
    }
  }

  private def parseQualityRule(o: JObject): QualityRuleDef = {
    val reason = optStr(o, "reason").getOrElse(fail("quality rule missing 'reason'"))
    val metric = optStr(o, "metric").getOrElse(fail(s"quality rule '$reason' missing 'metric'"))
    val op = optStr(o, "op").getOrElse(fail(s"quality rule '$reason' missing 'op'"))
    val value = field(o, "value").getOrElse(fail(s"quality rule '$reason' missing 'value'"))
    (op, value) match {
      case ("lt" | "gt", JInt(i)) if numericMetrics(metric) =>
        QualityRuleDef(reason, metric, op, Some(BigDecimal(i)), None)
      case ("lt" | "gt", JLong(l)) if numericMetrics(metric) =>
        QualityRuleDef(reason, metric, op, Some(BigDecimal(l)), None)
      case ("lt" | "gt", JDouble(d)) if numericMetrics(metric) =>
        QualityRuleDef(reason, metric, op, Some(BigDecimal(d)), None)
      case ("lt" | "gt", JDecimal(d)) if numericMetrics(metric) =>
        QualityRuleDef(reason, metric, op, Some(d), None)
      case ("eq", JString(s)) if stringMetrics(metric) =>
        QualityRuleDef(reason, metric, op, None, Some(s))
      case _ =>
        fail(s"quality rule '$reason': op '$op' on metric '$metric' with value " +
          s"$value is not supported (lt/gt need a numeric value on " +
          s"${numericMetrics.mkString("/")}; eq needs a string value on " +
          s"${stringMetrics.mkString("/")})")
    }
  }

  private def parseDataflow(o: JObject): DataflowDef = DataflowDef(
    name = optStr(o, "name").getOrElse(fail("dataflow missing 'name'")),
    sources = field(o, "sources")
      .map(v => arr(v, "sources").map(s => parseSource(obj(s, "source"))))
      .getOrElse(Seq.empty),
    transformations = field(o, "transformations")
      .map(v => arr(v, "transformations").map(t => parseTransform(obj(t, "transformation"))))
      .getOrElse(Seq.empty),
    sinks = field(o, "sinks")
      .map(v => arr(v, "sinks").map(s => parseSink(obj(s, "sink"))))
      .getOrElse(Seq.empty))

  private def parseSource(o: JObject): SourceDef = {
    val name = optStr(o, "name").getOrElse(fail("source missing 'name'"))
    val schema = field(o, "schema").map(s => parseSchema(obj(s, s"source '$name' schema")))
    val enforced = field(o, "schema_enforcement").exists {
      case e: JObject => field(e, "enabled").contains(JBool(true))
      case _          => false
    }
    if (enforced && schema.isEmpty)
      fail(s"source '$name' enables schema_enforcement but defines no schema")
    SourceDef(
      name = name,
      path = optStr(o, "path").getOrElse(fail(s"source '$name' missing 'path'")),
      format = optStr(o, "format").getOrElse("json"),
      required = field(o, "required").forall(_ == JBool(true)),
      schema = schema,
      schemaEnforced = enforced,
      options = field(o, "options").map {
        case opts: JObject => opts.obj.map {
          case (k, JString(v)) => k -> v
          case (k, JBool(v))   => k -> v.toString
          case (k, JInt(v))    => k -> v.toString
          case (k, v)          => fail(s"source '$name' option '$k' has unsupported value $v")
        }.toMap
        case other => fail(s"source '$name' options must be an object, got $other")
      }.getOrElse(Map.empty))
  }

  /** Schema definition as in reference pipeline/schema_enforcer.py:44
    * (build_spark_schema): strict struct with name/type/nullable fields.
    */
  private def parseSchema(o: JObject): SchemaDef = {
    if (!optStr(o, "type").contains("struct"))
      fail(s"schema type must be 'struct', got '${optStr(o, "type").orNull}'")
    val fields = field(o, "fields")
      .map(v => arr(v, "schema fields"))
      .getOrElse(fail("schema definition missing 'fields'"))
    if (fields.isEmpty) fail("schema must define at least one field")
    SchemaDef(fields.map { f =>
      val fo = obj(f, "schema field")
      val name = optStr(fo, "name").getOrElse(fail("schema field missing 'name'"))
      val tpe = optStr(fo, "type").getOrElse(fail(s"field '$name' missing 'type'"))
      val nullable = field(fo, "nullable") match {
        case Some(JBool(b)) => b
        case Some(other)    => fail(s"field '$name' nullable must be boolean, got $other")
        case None           => fail(s"field '$name' missing 'nullable'")
      }
      FieldDef(name, tpe, nullable)
    })
  }

  private def parseTransform(o: JObject): TransformDef = {
    val name = optStr(o, "name").getOrElse(fail("transformation missing 'name'"))
    val tpe = optStr(o, "type").getOrElse(fail(s"transformation '$name' missing 'type'"))
    val params = field(o, "params").map(p => obj(p, s"transformation '$name' params"))
      .getOrElse(fail(s"transformation '$name' missing 'params'"))
    val input = optStr(params, "input").getOrElse(fail(s"transformation '$name' missing params.input"))
    tpe match {
      case "add_fields" =>
        val fields = field(params, "addFields")
          .map(v => arr(v, "addFields")).getOrElse(fail(s"add_fields '$name' missing 'addFields'"))
        AddFieldsDef(name, input, fields.map { f =>
          val fo = obj(f, "addFields entry")
          (optStr(fo, "name").getOrElse(fail("addFields entry missing 'name'")),
           optStr(fo, "function").getOrElse(fail("addFields entry missing 'function'")))
        })
      case "validate_fields" =>
        val validations = field(params, "validations")
          .map(v => arr(v, "validations")).getOrElse(fail(s"validate_fields '$name' missing 'validations'"))
        ValidateFieldsDef(name, input, validations.map(v => parseValidation(obj(v, "validation"))))
      case other =>
        fail(s"Unsupported transformation type '$other' for '$name'. " +
          "Supported types: [add_fields, validate_fields]")
    }
  }

  private def parseValidation(o: JObject): ValidationDef = {
    val fieldName = optStr(o, "field").getOrElse(fail("validation missing 'field'"))
    val rules = field(o, "rules").map(v => arr(v, "rules"))
      .getOrElse(fail(s"validation for '$fieldName' missing 'rules'"))
    ValidationDef(fieldName, rules.map {
      case JString("notNull")  => NotNullRule
      case JString("notEmpty") => NotEmptyRule
      case JString(other) =>
        fail(s"Unsupported validation rule for field '$fieldName': '$other'. " +
          "Supported simple rules: [notEmpty, notNull]")
      case ro: JObject =>
        val rname = optStr(ro, "name").getOrElse(fail(s"rule object for '$fieldName' missing 'name'"))
        val params = field(ro, "params").getOrElse(fail(s"rule '$rname' for '$fieldName' missing 'params'"))
        rname match {
          case "regex" => RegexRule(str(params, "regex params"))
          case "minValue" => params match {
            case JInt(i)     => MinValueRule(i.toDouble)
            case JDouble(d)  => MinValueRule(d)
            case JDecimal(d) => MinValueRule(d.toDouble)
            case JLong(l)    => MinValueRule(l.toDouble)
            case other       => fail(s"minValue params must be numeric, got $other")
          }
          case other =>
            fail(s"Unsupported validation rule for field '$fieldName': '$other'. " +
              "Supported parameterized rules: [minValue, regex]")
        }
      case other => fail(s"Invalid validation rule configuration for field '$fieldName': $other")
    })
  }

  private def parseSink(o: JObject): SinkDef = SinkDef(
    input = optStr(o, "input").getOrElse(fail("sink missing 'input'")),
    name = optStr(o, "name").getOrElse(fail("sink missing 'name'")),
    path = optStr(o, "path").orElse(
      field(o, "paths").flatMap(v => arr(v, "paths").headOption).map(s => str(s, "sink path"))
    ).getOrElse(fail("sink missing 'path'")),
    format = optStr(o, "format").getOrElse("json"),
    saveMode = optStr(o, "saveMode").getOrElse("overwrite"),
    partitionBy = field(o, "partitionBy")
      .map(v => arr(v, "partitionBy").map(s => str(s, "partitionBy entry")))
      .getOrElse(Seq.empty),
    targetFileMB = field(o, "targetFileMB").map {
      case JInt(i) if i > 0 => i.toInt
      case other            => fail(s"targetFileMB must be a positive integer, got $other")
    })

  private def parseConsolidation(o: JObject): ConsolidationDef = {
    val enabled = field(o, "enabled").contains(JBool(true))
    val ok = field(o, "ok_records").map(v => obj(v, "ok_records"))
    val dedup = ok.flatMap(field(_, "deduplication")).map(v => obj(v, "deduplication"))
    ConsolidationDef(
      enabled = enabled,
      inputPattern = ok.flatMap(optStr(_, "input_pattern")).getOrElse(""),
      outputPath = ok.flatMap(optStr(_, "output_path")).getOrElse(""),
      dedup = DedupDef(
        enabled = dedup.exists(d => field(d, "enabled").contains(JBool(true))),
        keyColumn = dedup.flatMap(optStr(_, "key_column")).getOrElse("id"),
        orderBy = dedup.flatMap(optStr(_, "order_by")).getOrElse("batch_date"),
        orderDirection = dedup.flatMap(optStr(_, "order_direction")).getOrElse("DESC"),
        tieBreaker = dedup.flatMap(optStr(_, "tie_breaker"))))
  }
}
