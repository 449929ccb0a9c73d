package graft.queries

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import graft.Tables
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBig, RoundingMode}

/** Branch and exactness coverage for the q116–q120 mining family
  * beyond what the DuckDB oracles prove.
  */
class MiningOpsSpec extends SparkSpec {

  // ---------- q116: every weight branch ----------

  test("q116: linkage score drives each agreement weight independently") {
    import spark.implicits._
    // (adj, ptype, size, price) for a and b, expected score
    val cases = Seq(
      // all agree: 40+30+20+10 = 100
      ("red", "A", 10, "900.00", "red", "A", 11, "903.00", 100),
      // adjective disagrees: -10+30+20+10 = 50 (below threshold)
      ("red", "A", 10, "900.00", "blue", "A", 11, "903.00", 50),
      // type disagrees: 40-20+20+10 = 50
      ("red", "A", 10, "900.00", "red", "B", 11, "903.00", 50),
      // size just outside +-2: 40+30-10+10 = 70
      ("red", "A", 10, "900.00", "red", "A", 13, "903.00", 70),
      // price just outside 5.00: 40+30+20-30 = 60 (boundary: 5.01)
      ("red", "A", 10, "900.00", "red", "A", 11, "905.01", 60),
      // price exactly 5.00 apart is still an agreement (<=)
      ("red", "A", 10, "900.00", "red", "A", 11, "905.00", 100))
    val df = cases.toDF(
      "a_adj", "a_ptype", "a_size", "a_price_s",
      "b_adj", "b_ptype", "b_size", "b_price_s", "expected")
      .withColumn("a_price", col("a_price_s").cast("decimal(18,2)"))
      .withColumn("b_price", col("b_price_s").cast("decimal(18,2)"))
    val got = df.withColumn("score", MiningQueries.linkageScore)
      .select("score", "expected").collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("q116: blocking excludes a true match across a quintile boundary (documented recall trade)") {
    import spark.implicits._
    // sizes 4 and 6: |delta| <= 2 (agreement, +20) and every other
    // attribute agrees, so the SCORE is 100 — but 4 DIV 5 = 0 and
    // 6 DIV 5 = 1, so blocking never generates the pair
    val a = Seq((1L, "red", "widget", "B1", "T1", 4, "100.00"))
      .toDF("a_key", "a_adj", "a_noun", "a_brand", "a_ptype", "a_size", "a_p")
      .withColumn("a_price", col("a_p").cast("decimal(18,2)"))
    val b = Seq((2L, "red", "widget", "B1", "T1", 6, "101.00"))
      .toDF("b_key", "b_adj", "b_noun", "b_brand", "b_ptype", "b_size", "b_p")
      .withColumn("b_price", col("b_p").cast("decimal(18,2)"))
    val cross = a.crossJoin(b)
    val score = cross.withColumn("s", MiningQueries.linkageScore)
      .head().getAs[Int]("s")
    assert(score == 100, "the pair IS a true match by score")
    assert(cross.filter(MiningQueries.linkageBlocking).count() == 0,
      "yet one-pass blocking excludes it — the recall cost of the equi-join bound")
    // same attributes inside one quintile ARE generated
    val b2 = b.withColumn("b_size", lit(3))
    assert(a.crossJoin(b2).filter(MiningQueries.linkageBlocking).count() == 1)
  }

  // ---------- q118: sketch path == exact full computation ----------

  test("q118: MG-candidate recount equals the exact heavy-hitter scan") {
    val dir = sf("sf0.001")
    val got = MiningQueries.q118_heavy_hitters(spark, dir).collect()
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 64 > n)
      .select(col("token"), col("freq"),
        expr(s"(freq * 1000000) DIV ${n}L").as("ppm"))
      .orderBy(desc("freq"), col("token"))
      .collect()
    assert(got.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
    assert(got.nonEmpty, "fixture corpus must produce heavy hitters")
  }

  test("q118: candidate recount plans a broadcast left-semi join, not inlined literals") {
    val plan = MiningQueries.q118_heavy_hitters(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate filter must be a broadcast semi join:\n$plan")
    assert(!plan.contains(" IN ("),
      "candidate set must ride data, not the plan as an IN literal list")
  }

  test("MisraGries: adversarial all-distinct and drifting streams honor the bounds") {
    // all-distinct stream: nothing exceeds n/(k+1); undercount bound
    // still must hold for every estimate (estimate <= true count, and
    // true - estimate <= n / (k+1))
    val k = 50
    val distinctStream = (0 until 10000).map(i => s"u$i")
    val s1 = graft.operators.MisraGries.summary(distinctStream.iterator, k)
    assert(s1.size <= k)
    s1.foreach { case (t, est) =>
      assert(est <= 1L, s"$t overcounted: $est")
    }
    // drifting stream: one heavy token interleaved with distinct noise —
    // the heavy token must survive with the guaranteed undercount
    val heavy = (0 until 10000).flatMap(i => Seq(s"n$i", "HOT"))
    val n = heavy.size
    val s2 = graft.operators.MisraGries.summary(heavy.iterator, k)
    assert(s2.contains("HOT"), "a token with freq n/2 must survive MG(50)")
    val est = s2("HOT")
    assert(est <= 10000L, "estimate can never exceed the true count")
    assert(10000L - est <= n / (k + 1) + 1,
      s"undercount ${10000L - est} exceeds n/(k+1) = ${n / (k + 1)}")
    // exhaustive superset guarantee on the drifting stream
    val trueCounts = heavy.groupBy(identity).view.mapValues(_.size).toMap
    trueCounts.filter(_._2 > n / (k + 1)).keys.foreach(t =>
      assert(s2.contains(t), s"heavy hitter $t lost from the summary"))
  }

  // ---------- q119: moments vs an independent BigDecimal replica ----------

  test("q119: slope/intercept match a sequential BigDecimal recomputation") {
    val dir = sf("sf0.001")
    val got = MiningQueries.q119_regression(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val rows = Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .collect()
    val groups = rows.groupBy(r => (r.getString(0), r.getString(1)))
    val micro = new JBig(1000000)
    groups.foreach { case (key, rs) =>
      // the q10 cast recipe: double -> DECIMAL(18,2) (HALF_UP)
      val xs = rs.map(r => new JBig(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP))
      val ys = rs.map(r => new JBig(r.getDouble(3)).setScale(2, RoundingMode.HALF_UP))
      val n = new JBig(rs.length)
      val sx = xs.reduce(_.add(_))
      val sy = ys.reduce(_.add(_))
      val sxy = xs.zip(ys).map { case (x, y) => x.multiply(y) }.reduce(_.add(_))
      val sxx = xs.map(x => x.multiply(x)).reduce(_.add(_))
      val det = n.multiply(sxx).subtract(sx.multiply(sx))
      val slope = n.multiply(sxy).subtract(sx.multiply(sy)).multiply(micro)
        .divideToIntegralValue(det).longValueExact()
      val icept = sy.multiply(sxx).subtract(sx.multiply(sxy)).multiply(micro)
        .divideToIntegralValue(det).longValueExact()
      val (gn, gs, gi) = got(key)
      assert(gn == rs.length && gs == slope && gi == icept,
        s"$key: got ($gn,$gs,$gi) want (${rs.length},$slope,$icept)")
    }
    assert(got.keySet === groups.keySet)
  }

  // ---------- q120: exact below sketch capacity, bounded above ----------

  test("q120: estimates are exact while sets fit the sketch (corpus vocab)") {
    val dir = sf("sf0.001")
    val got = MiningQueries.q120_sketch_overlap(spark, dir).collect()
    assert(got.nonEmpty)
    val sets = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(T.tokens(col("text"))).as("token"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      assert(r.getLong(2) == sa.size.toLong, s"est_a $a")
      assert(r.getLong(3) == sb.size.toLong, s"est_b $b")
      assert(r.getLong(4) == (sa ++ sb).size.toLong, s"est_union $a-$b")
      assert(r.getLong(5) == (sa intersect sb).size.toLong, s"est_intersect $a-$b")
      assert(r.getLong(6) == (sa -- sb).size.toLong, s"est_only_a $a-$b")
    }
  }

  test("q120: above sketch capacity the union estimate stays within 5%") {
    import spark.implicits._
    // two overlapping 60k-element sets: far beyond the 4096-entry sketch
    val df = (0 until 60000).map(i => ("a", s"id$i")) ++
      (30000 until 90000).map(i => ("b", s"id$i"))
    val sk = df.toDF("source", "token")
      .groupBy("source").agg(theta_sketch_agg(col("token")).as("sk"))
    val a = sk.filter(col("source") === "a").select(col("sk").as("sk_a"))
    val b = sk.filter(col("source") === "b").select(col("sk").as("sk_b"))
    val r = a.crossJoin(b).select(
      theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b"))).as("u"),
      theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b"))).as("i"))
      .head()
    assert(math.abs(r.getLong(0) - 90000) / 90000.0 < 0.05, s"union ${r.getLong(0)}")
    assert(math.abs(r.getLong(1) - 30000) / 30000.0 < 0.15, s"intersect ${r.getLong(1)}")
  }
}
