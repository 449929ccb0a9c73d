package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style checks: core operators vs independent reference
  * implementations on generated data. Samples are drawn with fixed
  * seeds (deterministic across runs) and driven through real Spark
  * plans — generator bugs aside, any divergence is an operator bug.
  */
class OperatorPropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("keepNewest equals the window ROW_NUMBER formulation on random data") {
    val s = spark
    import s.implicits._
    val rowGen = for {
      key <- Gen.choose(0, 5)
      ord <- Gen.choose(0, 3)
    } yield (key, ord)
    val dataGen = Gen.listOfN(60, rowGen)
    for (data0 <- samples(dataGen, 8)) {
      val data = data0.zipWithIndex.map { case ((k, o), id) => (k, o, id.toLong) }
      val df = data.toDF("k", "o", "id")
      val got = Dedup.keepNewest(df, col("k"), col("o"), col("id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val w = Window.partitionBy("k").orderBy(col("o").desc, col("id").desc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  test("upsert result = source rows for source keys + target rows for the rest") {
    val s = spark
    import s.implicits._
    val keysGen = Gen.listOfN(12, Gen.choose(0L, 9L)).map(_.distinct)
    for (seed <- 0 until 8) {
      val tKeys = keysGen.pureApply(Gen.Parameters.default, Seed(100L + seed))
      val sKeys = keysGen.pureApply(Gen.Parameters.default, Seed(200L + seed))
      val target = tKeys.map(k => (k, s"t$k")).toDF("k", "v")
      val source = sKeys.map(k => (k, s"s$k")).toDF("k", "v")
      val got = Merge.upsert(target, source, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = tKeys.map(k => k -> s"t$k").toMap ++ sKeys.map(k => k -> s"s$k").toMap
      assert(got == want)
    }
  }

  test("validator matches a per-row Scala reference on random rows/rules") {
    val s = spark
    import s.implicits._
    import graft.meta._
    val valGen = for {
      rules <- Gen.someOf(Seq[RuleDef](
        NotNullRule, NotEmptyRule, RegexRule("^[a-z]+$"), MinValueRule(10)))
      if rules.nonEmpty
    } yield ValidationDef("v", rules.toSeq)
    val cellGen = Gen.oneOf[Option[String]](
      None, Some(""), Some("  "), Some("abc"), Some("ABC"), Some("5"), Some("42"))
    for (seed <- 0 until 8) {
      val vdef = valGen.pureApply(Gen.Parameters.default, Seed(300L + seed))
      val cells = Gen.listOfN(30, cellGen)
        .pureApply(Gen.Parameters.default, Seed(400L + seed))
      val df = cells.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = Validator.validate(df, Seq(vdef))
      val koIds = out.ko.select("id").as[Long].collect().toSet
      val okIds = out.ok.select("id").as[Long].collect().toSet
      // independent reference: a rule fails per the reference semantics
      def fails(v: Option[String], r: RuleDef): Boolean = r match {
        case NotNullRule      => v.isEmpty
        case NotEmptyRule     => v.exists(_.trim == "")
        case RegexRule(p)     => v.exists(x => !p.r.matches(x))
        case MinValueRule(m)  => v.exists(x => scala.util.Try(x.toDouble).toOption.exists(_ < m))
      }
      val wantKo = cells.zipWithIndex
        .filter { case (v, _) => vdef.rules.exists(r => fails(v, r)) }
        .map(_._2.toLong).toSet
      assert(koIds == wantKo, s"rules=${vdef.rules} seed=$seed")
      assert(okIds == (cells.indices.map(_.toLong).toSet -- wantKo))
    }
  }

  test("connected components equal a union-find reference on random graphs") {
    val s = spark
    import s.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 14L)
      b <- Gen.choose(0L, 14L)
      if a != b
    } yield (a, b)
    val graphGen = Gen.listOfN(12, edgeGen)
    for (edges0 <- samples(graphGen, 8) if edges0.nonEmpty) {
      val edges = edges0.distinct
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // path-compress fully, then min-relabel per component
      val byRoot = verts.groupBy(find)
      val want = byRoot.flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
      val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"edges=$edges")
      val gotStar = ConnectedComponents.starContract(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar == want, s"starContract edges=$edges")
    }
  }

  test("star contraction equals union-find on a sparse 300-vertex random graph") {
    val s = spark
    import s.implicits._
    // sparse (|E| < |V|) random graphs have many components and long
    // tendrils — the regime between the tiny seeded graphs above and
    // the pure path below, where subtle contraction bugs would hide
    val rng = new scala.util.Random(4242L)
    val edges = Seq.fill(280)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .filter { case (a, b) => a != b }.distinct
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = verts.groupBy(find).flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
    val got = ConnectedComponents.starContract(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("10k-vertex path graph converges via the star-contraction fallback") {
    val s = spark
    import s.implicits._
    // diameter 10_000: label propagation would need 10_000 rounds, the
    // alternating large-star/small-star contraction needs O(log n).
    // run() hits its propagation budget and must hand off — the
    // adversarial-graph case that previously threw.
    val n = 10000L
    val chain = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
      .repartition(4)
    val out = ConnectedComponents.run(chain, "a", "b", maxIter = 3)
    val distinctComponents = out.select("component").distinct().collect()
    assert(distinctComponents.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.count() == n + 1)
  }
}
