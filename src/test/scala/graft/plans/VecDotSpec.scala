package graft.plans

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The native vec_dot must equal the declarative
  * aggregate(zip_with(a,b,*), 0.0, +) fold BIT FOR BIT — same
  * left-to-right accumulation order, same null poisoning. The DuckDB
  * oracles keep speaking the declarative fold, so this equality is
  * what keeps the whole vector family's oracle surface valid.
  */
class VecDotSpec extends SparkSpec {

  test("native == declarative on the embeddings corpus (bit-exact)") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val pairs = e.select(col("vec_id").as("a_id"), col("v").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("v").as("b")))
      .filter(col("a_id") < col("b_id"))
    val out = pairs
      .select(V.dot(col("a"), col("b")).as("native"),
        V.dotDeclarative(col("a"), col("b")).as("decl"))
      .collect()
    assert(out.nonEmpty)
    // bit-exact: compare the raw IEEE754 bits, not ==, so a
    // -0.0/0.0 or NaN-pattern divergence would fail too
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("native == declarative on edge fixtures (nulls, lengths, -0.0)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)),            // plain
      Row(Seq.empty[Double], Seq.empty[Double]),    // empty -> 0.0
      Row(Seq(-0.0), Seq(1.0)),                     // -0.0 first product
      Row(Seq(1.0, 2.0), Seq(1.0)),                 // length mismatch -> null
      Row(Seq(1.0, null, 3.0).asInstanceOf[Seq[Any]].map(_.asInstanceOf[java.lang.Double]),
        Seq[java.lang.Double](1.0, 2.0, 3.0)),      // null element -> null
      Row(null, Seq(1.0)),                          // null array -> null
      Row(Seq(1e308, 1e308), Seq(2.0, -2.0)),       // inf intermediate
      Row(Seq(Double.NaN), Seq(1.0)))               // NaN propagates
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.get(0), r.get(1)))), schema)
    val out = df.select(
        V.dot(col("a"), col("b")).as("native"),
        V.dotDeclarative(col("a"), col("b")).as("decl"))
      .collect()
    out.foreach { r =>
      val n = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
      val d = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      assert((n == null && d == null) ||
        (n != null && d != null &&
          java.lang.Double.doubleToRawLongBits(n) ==
            java.lang.Double.doubleToRawLongBits(d)),
        s"native=$n decl=$d")
    }
  }

  test("the pair-scoring plan stays inside whole-stage codegen") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val scored = e.select(col("vec_id").as("a_id"), col("v").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("v").as("b")))
      .select(V.dot(col("a"), col("b")).as("s"))
    // the native expression is in the plan (not the interpreted fold)
    val formatted = scored.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("vec_dot"))
    assert(!formatted.contains("aggregate(zip_with"))
    // force execution THROUGH THIS QueryExecution (a write action
    // would plan its own) so AQE finalizes, then check the scoring
    // projection really compiled into a WholeStageCodegen span —
    // a CodegenFallback expression would leave the Project outside
    scored.collect()
    val executed = scored.queryExecution.executedPlan.toString
    // the *(n) star prefix is the WholeStageCodegen marker in the
    // executed-plan rendering; the transform() cast projections are
    // CodegenFallback and correctly print unstarred
    assert("""\*\(\d+\) Project \[vec_dot""".r.findFirstIn(executed).isDefined,
      executed)
    val one = org.apache.spark.sql.catalyst.expressions.Literal(1)
    assert(!VecDot(one, one)
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
  }
}
