package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class PolyHashSpec extends SparkSpec {

  private val Mod = 2147483647L

  // independent reference: code-point Horner fold, the semantics of
  // aggregate(split(c,""), 0L, (h, ch) -> pmod(h*31 + ascii(ch), Mod))
  private def ref(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  test("native hash matches the declarative fold on real docs") {
    val s = spark
    import s.implicits._
    val texts = graft.Tables.load(spark, sf(), "documents")
      .select("text").as[String].collect()
    texts.foreach { t =>
      assert(PolyHash.hash(UTF8String.fromString(t)) == ref(t), s"mismatch on: '$t'")
    }
  }

  test("edge cases: empty, single char, unicode incl. supplementary plane") {
    def h(s: String) = PolyHash.hash(UTF8String.fromString(s))
    assert(h("") == 0L)
    assert(h("a") == 97L)
    assert(h("ab") == 3105L)   // 97*31 + 98
    assert(h("abc") == 96354L) // 3105*31 + 99
    val emoji = new String(Character.toChars(128512))
    assert(h(emoji) == 128512L) // ascii() yields the full code point
    assert(h("héllo") == ref("héllo"))
  }

  test("optimizer rule rewrites the declarative fingerprint") {
    val df = graft.Tables.load(spark, sf(), "documents")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("poly_hash"), s"rule did not fire:\n$optimized")
  }

  test("registered poly_hash SQL function agrees with the declarative form's values") {
    val s = spark
    import s.implicits._
    graft.Tables.load(spark, sf(), "documents").createOrReplaceTempView("docs_ph")
    val viaSql = spark.sql("SELECT doc_id, poly_hash(text) FROM docs_ph")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaRef = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> ref(t) }.toMap
    assert(viaSql == viaRef)
  }
}
