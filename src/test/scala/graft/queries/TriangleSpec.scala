package graft.queries

import graft.SparkSpec

/** q122's degree-oriented wedge join against a brute-force local
  * triangle enumeration: the orientation trick must count every
  * triangle exactly once (no double counting through hubs, no missed
  * closures), and per-vertex participation must match the naive
  * all-triples scan on any graph shape.
  */
class TriangleSpec extends SparkSpec {

  /** Brute-force per-vertex triangle counts over canonical (u < v)
    * edges.
    */
  private def localTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield (a, b, c)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle-free graphs yield no rows") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))          // path
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) // star hub
    assert(run(path).isEmpty)
    assert(run(star).isEmpty)
  }

  test("hub graph matches brute force (orientation counts once)") {
    // hub 1 connected to all; ring among the leaves adds triangles
    // through the hub — the shape where naive wedge counting double
    // counts or explodes
    val leaves = (2L to 9L)
    val hub = leaves.map(v => (1L, v))
    val ring = leaves.sliding(2).map(s => (s.head, s.last)).toSeq :+ (2L, 9L)
    val edges = (hub ++ ring).map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    assert(run(edges) === localTriangles(edges))
  }

  test("empty edge set yields no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(GraphQueries.triangleCounts(empty).collect().isEmpty)
  }

  test("pseudo-random graph matches brute force") {
    // deterministic LCG so the spec is stable
    var s = 12345L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    val vs = 30L
    val edges = (1 to 200).map { _ =>
      val a = next() % vs; val b = next() % vs
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    assert(run(edges) === localTriangles(edges))
  }
}
