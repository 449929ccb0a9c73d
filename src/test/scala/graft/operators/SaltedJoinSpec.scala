package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** saltedJoin's two claims: exact equivalence with the plain join on
  * a skewed fixture, and genuine fan-out of the hot key over salts.
  */
class SaltedJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a hot-key fixture") {
    import spark.implicits._
    // one viral key (1000 rows) + a long tail; dim misses key 99 so
    // the inner-join drop path is exercised too
    val probe = ((1 to 1000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 10000L + i)) :+ ((99L, 20000L)))
      .toDF("k", "row_id")
    val build = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e")).toDF("k", "attr")
    val plain = probe.join(build, "k")
      .select("k", "row_id", "attr").collect().map(_.toSeq).toSeq.sorted(rowOrd)
    val salted = Skew.saltedJoin(probe, build, "k", col("row_id"), nSalts = 8)
      .select("k", "row_id", "attr").collect().map(_.toSeq).toSeq.sorted(rowOrd)
    assert(salted == plain)
    assert(plain.size == 1050) // viral 1000 + tail 50; key 99 dropped
  }

  test("the hot key's probe rows genuinely spread across salts") {
    import spark.implicits._
    val probe = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "row_id")
    val spread = probe
      .withColumn("salt", Skew.salt(8, col("row_id")))
      .groupBy("salt").count().collect()
    assert(spread.length == 8, "some salts received no rows")
    assert(spread.map(_.getLong(1)).max < 1000 / 2,
      "salting failed to break up the hot key")
  }

  private val rowOrd: Ordering[Seq[Any]] =
    Ordering.by(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long]))
}
