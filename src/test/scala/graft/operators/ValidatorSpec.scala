package graft.operators

import graft.SparkSpec
import graft.meta._
import org.apache.spark.sql.functions._

class ValidatorSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some("AB-1"), Some(25)),   // ok
      (2L, None, Some(30)),           // plate notNull
      (3L, Some(""), Some(40)),       // plate notEmpty
      (4L, Some("ab"), Some(17)),     // plate regex + age minValue
      (5L, Some("XY-2"), None)        // age notNull
    ).toDF("id", "plate", "age")
  }

  private val validations = Seq(
    ValidationDef("plate", Seq(NotNullRule, NotEmptyRule, RegexRule("^[A-Z0-9-]+$"))),
    ValidationDef("age", Seq(NotNullRule, MinValueRule(18))))

  test("splits OK and KO; OK keeps original columns only") {
    val v = Validator.validate(df, validations)
    assert(v.ok.columns.toSeq == Seq("id", "plate", "age"))
    assert(v.ok.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet == Set(1L))
    assert(v.ko.columns.toSeq == Seq("id", "plate", "age", "validation_errors"))
    assert(v.ko.count() == 4)
  }

  test("collects all failures per field") {
    val v = Validator.validate(df, validations)
    val errs = v.ko.select("id", "validation_errors").collect()
      .map(r => r.getLong(0) -> r.getMap[String, scala.collection.Seq[String]](1)
        .map { case (k, l) => k -> l.toList }.toMap).toMap
    assert(errs(2L) == Map("plate" -> List("notNull")))
    // like the reference, regex also evaluates (and fails) on the empty
    // string, so notEmpty and regex both collect
    assert(errs(3L) == Map("plate" -> List("notEmpty", "regex: ^[A-Z0-9-]+$")))
    assert(errs(4L) == Map(
      "plate" -> List("regex: ^[A-Z0-9-]+$"),
      "age" -> List("minValue: 18")))
    assert(errs(5L) == Map("age" -> List("notNull")))
  }

  test("missing field yields fieldMissing for every row") {
    val v = Validator.validate(df, Seq(ValidationDef("ghost", Seq(NotNullRule))))
    assert(v.ok.count() == 0)
    val err = v.ko.select(element_at(col("validation_errors"), "ghost"))
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(err == Set(List("fieldMissing")))
  }

  test("validation is a narrow plan (no shuffle)") {
    val v = Validator.validate(df, validations)
    val plan = v.ok.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
