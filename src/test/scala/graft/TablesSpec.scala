package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Pins `Tables.load`'s events-timestamp regime handling.
  *
  * The driver's testdata has shipped `events.ts` as both parquet
  * TIMESTAMP(NANOS) (read as LongType under nanosAsLong) and plain
  * timestamp[us] (read as TIMESTAMP_NTZ). The loader must yield the
  * same session-TZ TIMESTAMP rows for either physical vintage, so a
  * future testdata flip is a no-op rather than an outage.
  */
class TablesSpec extends SparkSpec {

  private val instantsMicros = Seq(
    1700000000000000L, // 2023-11-14T22:13:20Z
    1700003600123456L,
    1700007200999999L)

  private def writeVintage(kind: String): String = {
    val dir = Files.createTempDirectory(s"tables-$kind").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    val rows = instantsMicros.zipWithIndex.map { case (us, i) =>
      kind match {
        case "nanos-long" => Row(i.toLong, us * 1000L)
        case "micros-ntz" => Row(i.toLong,
          java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, ((us % 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC))
      }
    }
    val tsType = kind match {
      case "nanos-long" => LongType
      case "micros-ntz" => TimestampNTZType
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
    dir.getAbsolutePath
  }

  test("both physical vintages load to identical TIMESTAMP rows") {
    val byVintage = Seq("nanos-long", "micros-ntz").map { kind =>
      val df = Tables.load(spark, writeVintage(kind), "events")
      assert(df.schema("ts").dataType === TimestampType,
        s"vintage $kind must load ts as session-TZ TIMESTAMP")
      kind -> df.orderBy("event_id")
        .select(col("event_id"),
          org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(byVintage("nanos-long") === byVintage("micros-ntz"))
    assert(byVintage("micros-ntz").map(_._2) === instantsMicros)
  }

  test("current testdata events load succeeds with timestamp ts") {
    val df = Tables.load(spark, sf(), "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1)
  }
}
