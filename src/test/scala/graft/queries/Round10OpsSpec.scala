package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-fixture pins for the round-10 governance/events operators:
  * q127's flag boundaries sit exactly AT k and l, and q128's lead
  * ordering must break timestamp ties by event_id (the difference
  * between a deterministic matrix and a flaky one).
  */
class Round10OpsSpec extends SparkSpec {

  test("q127: classes at exactly k rows / l sensitive values pass; below fail") {
    import spark.implicits._
    val k = GovernanceQueries.kAnonK.toInt
    val l = GovernanceQueries.kAnonL.toInt
    // class A: exactly k rows, exactly l nations → both flags true
    // class B: k-1 rows, 1 nation → both flags false
    val rows =
      (1 to k).map(i => (i.toLong, s"c$i", (i % l).toLong, 500.0, "AUTO")) ++
      (1 to k - 1).map(i => ((100 + i).toLong, s"d$i", 7L, 1500.0, "AUTO"))
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = GovernanceQueries.q127_k_anonymity(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSet === Set(
      (0L, k.toLong, l.toLong, true, true),
      (1L, k.toLong - 1, 1L, false, false)))
  }

  test("q128: timestamp ties break by event_id; ppm is row-conditional") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    // user 1: a@t0(id1), b@t0(id2) [tie → id order], c@t1(id3)
    //   transitions: a→b, b→c
    // user 2: a@t0(id4), c@t1(id5): a→c
    // user 3: single event → no transition
    val ev = Seq(
      (1L, t0, 10L, "a", 0.0, """{}"""),
      (2L, t0, 10L, "b", 0.0, """{}"""),
      (3L, t1, 10L, "c", 0.0, """{}"""),
      (4L, t0, 20L, "a", 0.0, """{}"""),
      (5L, t1, 20L, "c", 0.0, """{}"""),
      (6L, t0, 30L, "a", 0.0, """{}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("transitions").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q128_transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", "b", 1L, 500000L), // of a's 2 outgoing: 1/2
      ("a", "c", 1L, 500000L),
      ("b", "c", 1L, 1000000L)))
  }

  test("q129: explicit dim broadcasts survive when size-based planning can't") {
    // emulate fact-scale estimates: with the auto threshold off, only
    // the EXPLICIT broadcast() hints may produce broadcast joins — the
    // dims must still ride them (the q11 rule: don't depend on
    // post-filter size estimates) while the orders-lineitem fact pair
    // falls back to a key-shuffled join
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plan = Analytics.q129_local_supplier(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      val factJoin = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("l_orderkey"))
        .mkString("\n")
      assert(factJoin.nonEmpty && !factJoin.contains("Broadcast"),
        s"fact-fact join must shuffle when nothing says it fits:\n$factJoin")
    } finally spark.conf.set(key, prev)
  }

  test("q130: LOCF carries the last purchase, NULL before the first") {
    import spark.implicits._
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, t(0), 1L, "view", 0.0, "{}"),
      (2L, t(1), 1L, "purchase", 10.5, "{}"),
      (3L, t(2), 1L, "click", 0.0, "{}"),
      (4L, t(3), 1L, "purchase", 20.25, "{}"),
      (5L, t(4), 1L, "view", 0.0, "{}"),
      (6L, t(0), 2L, "click", 0.0, "{}")) // user 2: never purchases
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("locf").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DistributionQueries.q130_locf(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> None, 2L -> Some(10.5), 3L -> Some(10.5),
      4L -> Some(20.25), 5L -> Some(20.25), 6L -> None))
  }

  test("q131: sqrt-temperature ceilings and the md5 keep rule match a replica") {
    import spark.implicits._
    // sources sized 4 and 16: f_small = 1 (ceiling 2^24, keeps all),
    // f_big = sqrt(4/16) = 0.5 exactly (ceiling 0x800000)
    val docs = ((1 to 4).map(i => (i.toLong, "t", "en", "small", 0L)) ++
      (1 to 16).map(i => ((100 + i).toLong, "t", "en", "big", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tempmix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q131_temperature_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bigKept = (101L to 116L).count { id =>
      md5hex(s"temp-1|$id").substring(0, 6) < "800000"
    }
    assert(got === Map(
      "small" -> ((4L, 16777216L, 4L)),
      "big" -> ((16L, 8388608L, bigKept.toLong))))
    // the keep decision is content-addressed: same ids keep on rerun
    val again = CorpusQueries.q131_temperature_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("big") === bigKept.toLong)
  }
}
