package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation via two-phase salting.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer;
  * at 100 TB one viral key stalls the whole stage. Salting splits each
  * key into `nSalts` sub-groups aggregated in parallel, then combines
  * the partials in a second (tiny) aggregation.
  *
  * Only decomposable aggregates can be salted this way; the API takes
  * the partial- and final-phase expressions explicitly so the
  * decomposition is visible at the call site (sum→sum, count→sum of
  * counts, min/max→min/max, avg→sum+count then divide).
  *
  * AQE's skewedJoin handles skewed JOINS automatically; aggregation
  * skew still needs this pattern (or partial aggregation to absorb it,
  * which breaks down when the hot key dominates single tasks' inputs).
  */
object Skew {

  /** Deterministic salt in [0, nSalts): derived from a hash of the
    * whole row's partition-local position-free content via
    * monotonically_increasing_id would be nondeterministic across
    * retries — use a content hash of provided columns instead.
    */
  def salt(nSalts: Int, saltSource: Column): Column =
    pmod(hash(saltSource), lit(nSalts))

  final case class SaltedAgg(
      partial: Seq[Column], // aggregates for the salted phase
      combine: Seq[Column] // aggregates combining the partials
  )

  /** Two-phase salted aggregation: groupBy(key, salt) with `partial`,
    * then groupBy(key) with `combine` over the partial columns.
    */
  def aggregate(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      nSalts: Int,
      agg: SaltedAgg): DataFrame =
    df.groupBy(key.as("__key"), salt(nSalts, saltSource).as("__salt"))
      .agg(agg.partial.head, agg.partial.tail: _*)
      .groupBy(col("__key"))
      .agg(agg.combine.head, agg.combine.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Skew-resilient equi-JOIN via salting: the build side (the small
    * table) is replicated `nSalts` ways and each probe row joins on
    * (key, its deterministic salt), so a hot key's probe rows fan out
    * over nSalts reducers instead of funneling into one. Semantically
    * transparent — the result equals the plain equi-join row for row
    * (every probe row meets exactly one replica of its key's build
    * rows).
    *
    * When to reach for it: AQE's skew-join split handles skewed
    * SORT-MERGE joins automatically, but only at plan boundaries it
    * can see — salting is the explicit form for shuffle-hash paths,
    * pre-aggregated shapes AQE won't split, or engines/settings
    * without runtime re-planning. Cost: build side × nSalts rows
    * shipped (fine for dims; wrong for two large sides — bucket or
    * range-partition those instead).
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      saltSource: Column,
      nSalts: Int = 16): DataFrame = {
    val salted = probe.withColumn("__salt", salt(nSalts, saltSource))
    val replicated = build.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The common count+sum shape. */
  def countAndSum(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      valueCol: Column,
      nSalts: Int = 16): DataFrame =
    aggregate(df, key, saltSource, nSalts, SaltedAgg(
      partial = Seq(
        count(lit(1)).as("__n"),
        sum(valueCol).as("__s")),
      combine = Seq(
        sum(col("__n")).as("n"),
        sum(col("__s")).as("total"))))
}
