package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution / window-frame analytics (SURVEY §2 #56–#59).
  */
object DistributionQueries {

  private val dec18 = DecimalType(18, 2)

  // ---------- q56: fixed-width histogram ----------

  /** Value histogram per event type (bin width 50): the profile scan
    * behind any data-quality dashboard. floor() on doubles is exact in
    * both engines; min/max are order-insensitive, so the whole row is
    * deterministic with no decimal detour. One partial-agg shuffle of
    * |types|·|bins| rows.
    */
  def q56_histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("bin", floor(col("value") / 50).cast("int"))
      .groupBy("event_type", "bin")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("bin_min"),
        max(col("value")).as("bin_max"))
      .orderBy("event_type", "bin")

  val q56_oracle: String =
    """SELECT event_type, CAST(floor(value / 50) AS INTEGER) AS bin,
      |  count(*) AS n_events, min(value) AS bin_min, max(value) AS bin_max
      |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  // ---------- q57: rolling window frame ----------

  /** Rolling 4-event aggregate per user (ROWS BETWEEN 3 PRECEDING AND
    * CURRENT ROW) — the physical-frame complement of q39's time-hop
    * windows. The frame sum runs in DECIMAL so partial order can't
    * perturb it; the average divides the exact sum by the exact frame
    * count as the last (double) step.
    */
  def q57_rolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-3, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("roll_sum", sum(col("value").cast(dec18)).over(w))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("roll_sum").cast("double").as("roll_sum"),
        (col("roll_sum").cast("double") / col("roll_n").cast("double")).as("roll_avg"))
      .orderBy("user_id", "event_id")
  }

  val q57_oracle: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  CAST(roll_sum_dec AS DOUBLE) AS roll_sum,
      |  CAST(roll_sum_dec AS DOUBLE) / CAST(roll_n AS DOUBLE) AS roll_avg
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    sum(CAST(value AS DECIMAL(18,2))) OVER w AS roll_sum_dec,
      |    count(*) OVER w AS roll_n
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
      |ORDER BY user_id, event_id""".stripMargin

  // ---------- q58: ntile deciles ----------

  /** Customer-spend deciles via ntile(10) over exact decimal totals —
    * ordering is (spend, custkey), a total order, so tile assignment
    * is deterministic; per-decile aggregates are exact.
    *
    * SCALE CAVEAT: an unpartitioned ntile window funnels every
    * per-customer aggregate through ONE task — fine for |customers|
    * rows after aggregation, a cliff if the tiled set itself is
    * corpus-sized. The scalable form computes the 9 decile boundaries
    * first (exact rank arithmetic as in q32, or approx_percentile)
    * and assigns tiles with a broadcast range lookup — same result,
    * no global sort.
    */
  def q58_ntile(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(dec18)).as("spend"))
    val w = Window.orderBy(col("spend").asc, col("o_custkey").asc)
    spend.withColumn("decile", ntile(10).over(w))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_customers"),
        min(col("spend")).cast("double").as("min_spend"),
        max(col("spend")).cast("double").as("max_spend"))
      .orderBy("decile")
  }

  val q58_oracle: String =
    """SELECT decile, count(*) AS n_customers,
      |  CAST(min(spend) AS DOUBLE) AS min_spend,
      |  CAST(max(spend) AS DOUBLE) AS max_spend
      |FROM (
      |  SELECT o_custkey, spend,
      |    ntile(10) OVER (ORDER BY spend ASC, o_custkey ASC) AS decile
      |  FROM (
      |    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |    FROM orders GROUP BY o_custkey))
      |GROUP BY decile ORDER BY decile""".stripMargin

  // ---------- q59: correlated aggregate ----------

  /** Orders above the customer's own average: the correlated-subquery
    * shape, planned as one window pass instead of a per-row rescan.
    * The predicate is price · n > total — multiplication instead of an
    * avg division keeps the comparison in exact decimal arithmetic, so
    * both engines agree bit-for-bit.
    */
  def q59_correlated(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice").cast(dec18).as("price"))
      .withColumn("total", sum(col("price")).over(byCust))
      .withColumn("n", count(lit(1)).over(byCust))
      .groupBy("o_custkey")
      .agg(
        max(col("n")).as("n_orders"),
        count(when(col("price") * col("n") > col("total"), 1)).as("n_above_avg"))
      .orderBy("o_custkey")
  }

  val q59_oracle: String =
    """SELECT o_custkey, max(n) AS n_orders,
      |  count(CASE WHEN price * n > total THEN 1 END) AS n_above_avg
      |FROM (
      |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS total,
      |    count(*) OVER (PARTITION BY o_custkey) AS n
      |  FROM orders)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------- registry ----------

  // ---------- q105: exact z-score outlier detection ----------

  /** Statistical outlier detection WITHOUT floats (round 8): flag
    * events whose value sits more than k=1.5 standard deviations from
    * their event-type mean. The z-test is algebraically cleared of
    * divisions and square roots —
    * `|x − μ| > k·σ  ⟺  4·(n·x − S)² > 9·(n·Q − S²)` for k = 3/2,
    * with S = Σx, Q = Σx² over the group — so every comparison is
    * integer arithmetic on value-cents (wide products in
    * decimal(38,0) / HUGEINT; nothing rounds, nothing depends on
    * accumulation order, and Spark and DuckDB agree bit-for-bit where
    * any sqrt-based formulation would drift).
    *
    * Scale shape: one partial-agg pass builds the |types|-row moment
    * table (n, S, Q), which broadcasts back over the scan — two scans
    * of events total, zero wide shuffles, the same two-pass shape as
    * any variance computation. The threshold k is the declared knob;
    * per-key moments make this the grouped form of a data-quality
    * anomaly monitor.
    */
  def q105_anomaly(spark: SparkSession, dir: String): DataFrame =
    detectOutliers(Tables.load(spark, dir, "events")).orderBy("event_type")

  /** The detection core over any (event_type, event_id, value) frame —
    * factored out so ZScoreSpec can pin the cleared-form algebra on a
    * fixture with a planted outlier.
    */
  private[queries] def detectOutliers(events: DataFrame): DataFrame = {
    val dec38 = "decimal(38,0)"
    val e = events
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    // Σcents² is summed in decimal(38,0), not LongType: cents² is
    // ~1e10 for 4-digit values, so a LongType sum overflows around
    // 1e9 rows per group — the 100 TB posture needs the moment table
    // itself overflow-safe, not just the comparison (the oracle's
    // HUGEINT sum is the same widening)
    val moments = e.groupBy("event_type").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("cents")).cast("long").as("s"),
      sum(col("cents").cast(dec38) * col("cents")).as("q"))
    val dev = (col("n").cast(dec38) * col("cents") - col("s")).cast(dec38)
    val outlier =
      dev * dev * 4 >
        (col("n").cast(dec38) * col("q") - col("s").cast(dec38) * col("s")) * 9
    e.join(broadcast(moments), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n_events"),
        count_if(outlier).cast("long").as("n_outliers"),
        coalesce(sum(when(outlier, col("event_id"))), lit(0L)).cast("long")
          .as("outlier_id_sum"))
  }

  /** outlier_id_sum pins the exact outlier SET through the hash
    * compare, not just its size.
    */
  val q105_oracle: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS s,
      |    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
      |  FROM e GROUP BY event_type),
      |flagged AS (
      |  SELECT e.event_type, e.event_id, m.n,
      |    4 * (CAST(m.n AS HUGEINT) * e.cents - m.s)
      |      * (CAST(m.n AS HUGEINT) * e.cents - m.s)
      |    > 9 * (CAST(m.n AS HUGEINT) * m.q - CAST(m.s AS HUGEINT) * m.s)
      |      AS is_outlier
      |  FROM e JOIN m USING (event_type))
      |SELECT event_type, max(n) AS n_events,
      |  CAST(count(*) FILTER (WHERE is_outlier) AS BIGINT) AS n_outliers,
      |  CAST(coalesce(sum(event_id) FILTER (WHERE is_outlier), 0) AS BIGINT)
      |    AS outlier_id_sum
      |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------- q130: last-observation-carried-forward imputation ----------

  /** LOCF imputation — the standard missing-feature fill of training
    * data prep, here in its attribution form: every event carries the
    * user's most recent PURCHASE value at that point in the timeline
    * (NULL until the first purchase). `last(..., ignoreNulls)` over a
    * running frame is the declarative LOCF; the (ts, event_id)
    * ordering makes the frame total-ordered (the q128 tiebreak rule),
    * and the carried value is passed through UNCHANGED — no float
    * arithmetic, so doubles hash-match cross-engine.
    *
    * Scale shape: ONE shuffle partitioned by user (each timeline
    * sorts within its partition, no global sort) and a running-frame
    * window that streams each partition once — state is one value per
    * user. AQE splits power-user skew.
    */
  def q130_locf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"))
      .withColumn("last_purchase_value",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .select("event_id", "user_id", "event_type", "value", "last_purchase_value")
      .orderBy("event_id")
  }

  val q130_oracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_purchase_value
      |FROM events ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_histogram" -> (q56_histogram _),
    "q57_rolling" -> (q57_rolling _),
    "q58_ntile" -> (q58_ntile _),
    "q59_correlated" -> (q59_correlated _),
    "q105_anomaly" -> (q105_anomaly _),
    "q130_locf" -> (q130_locf _))

  val oracles: Map[String, String] = Map(
    "q56_histogram" -> q56_oracle,
    "q57_rolling" -> q57_oracle,
    "q58_ntile" -> q58_oracle,
    "q59_correlated" -> q59_oracle,
    "q105_anomaly" -> q105_oracle,
    "q130_locf" -> q130_oracle)
}
