package graft.io

import graft.meta.{SchemaBuilder, SourceDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Metadata-driven source loading.
  *
  * Reference semantics (pipeline/runner.py:160-300): enforced schema →
  * typed read with the declared StructType; otherwise permissive
  * inference. Required sources propagate failures; optional sources
  * return None and the flow continues. `{date}`/`{dir}` placeholders
  * are substituted before reading.
  *
  * Scale note: an explicit schema is not just a correctness gate — for
  * JSON/CSV it skips the full inference pre-pass (a second scan of the
  * input), and for parquet it prunes the read to the declared columns.
  */
object SourceReader {

  final case class Substitutions(values: Map[String, String]) {
    def apply(path: String): String =
      values.foldLeft(path) { case (p, (k, v)) => p.replace(s"{$k}", v) }
  }

  def resolvePath(source: SourceDef, subs: Substitutions): String = subs(source.path)

  def read(spark: SparkSession, source: SourceDef, subs: Substitutions): DataFrame = {
    val path = resolvePath(source, subs)
    val reader = spark.read.format(source.format).options(source.options)
    source.schema match {
      case Some(s) if source.schemaEnforced =>
        reader.schema(SchemaBuilder.build(s)).load(path)
      case _ =>
        reader.option("mode", "PERMISSIVE").load(path)
    }
  }

  /** Required/optional semantics: required failures re-raise; optional
    * failures are skipped (returned as Left(reason)).
    */
  def readOrSkip(
      spark: SparkSession,
      source: SourceDef,
      subs: Substitutions): Either[String, DataFrame] =
    try Right(read(spark, source, subs))
    catch {
      case e: Exception if !source.required => Left(e.getMessage)
    }
}
