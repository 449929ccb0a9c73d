package graft.meta

import org.apache.spark.sql.types._

/** Builds a Spark [[StructType]] from a metadata schema definition.
  *
  * Same contract as reference pipeline/schema_enforcer.py:21-128
  * (TYPE_MAPPING + build_spark_schema), expressed over Spark's native
  * type system. Beyond the reference's eight primitives we accept any
  * valid Spark DDL type string (e.g. `decimal(18,2)`, `array<float>`,
  * `binary`) so the same metadata language covers multimodal/embedding
  * columns.
  */
object SchemaBuilder {

  class SchemaEnforcementError(msg: String) extends RuntimeException(msg)

  private val typeMapping: Map[String, DataType] = Map(
    "string" -> StringType,
    "integer" -> IntegerType,
    "long" -> LongType,
    "double" -> DoubleType,
    "float" -> FloatType,
    "boolean" -> BooleanType,
    "timestamp" -> TimestampType,
    "date" -> DateType)

  def toDataType(name: String): DataType =
    typeMapping.get(name).orElse {
      // extension: full Spark DDL grammar for complex/parameterized types
      try Some(DataType.fromDDL(name)) catch { case _: Exception => None }
    }.getOrElse {
      throw new SchemaEnforcementError(
        s"Unsupported type '$name'. Supported types: " +
          typeMapping.keys.toSeq.sorted.mkString("[", ", ", "]") +
          " or any Spark DDL type")
    }

  def build(schema: SchemaDef): StructType =
    StructType(schema.fields.map(f => StructField(f.name, toDataType(f.dataType), f.nullable)))
}
