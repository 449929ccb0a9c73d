package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core analytics operators (SURVEY §2 #10–#18).
  *
  * Numeric policy (SURVEY §4): money/quantity aggregates are computed in
  * exact DECIMAL arithmetic and only the final value is cast to DOUBLE,
  * making results bit-identical across engines and across partition
  * orders — at 100 TB, partial-aggregate accumulation order is
  * non-deterministic, so floating-point sums would not even be stable
  * run-to-run.
  */
object Analytics {

  private val dec18 = DecimalType(18, 2)
  private val dec4 = DecimalType(4, 2)

  /** TPC-H Q1-style pricing summary: full scan + single hash aggregate.
    * Map-side partial aggregation reduces the shuffle to |groups| rows
    * per task; the shipdate filter and 7-column projection are pushed to
    * the parquet scan. Semantics from the reference's per-batch record
    * accounting (runner.py:193 record_count logging), generalized to a
    * real aggregate.
    */
  def q10_pricing_summary(spark: SparkSession, dir: String): DataFrame = {
    val qty = col("l_quantity").cast(dec18)
    val price = col("l_extendedprice").cast(dec18)
    val one = lit(1).cast(dec4)
    val disc = col("l_discount").cast(dec4)
    val tax = col("l_tax").cast(dec4)
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") < to_timestamp(lit("1998-09-03 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (one - disc)).cast("double").as("sum_disc_price"),
        sum(price * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q10_oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
