package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The schema-adaptive `events` loader, pinned against every `ts` dtype a
  * testdata generator has shipped (round 10 broke on exactly this: the
  * generator moved from TIMESTAMP(NANOS) to plain `timestamp[us]` and the
  * unconditional nanos workaround killed 14 queries). Whatever the next
  * regeneration produces, downstream code must always see TIMESTAMP with
  * microsecond wall-clock values.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  private val microsUtc = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    Seq((1L, 10L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  private def loadedMicros(dir: String): (org.apache.spark.sql.types.DataType, Long) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType, df.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("long (nanos-as-long) ts truncates to micros and becomes TIMESTAMP") {
    val dir = Files.createTempDirectory("ev-long").toString
    writeEvents(dir, lit(microsUtc * 1000L + 789L)) // nanos with sub-micro tail
    val (dt, micros) = loadedMicros(dir)
    assert(dt == TimestampType, s"got $dt")
    assert(micros == microsUtc, s"got $micros")
  }

  test("TIMESTAMP_NTZ ts casts to TIMESTAMP preserving wall-clock under UTC") {
    val dir = Files.createTempDirectory("ev-ntz").toString
    writeEvents(dir, timestamp_micros(lit(microsUtc)).cast(TimestampNTZType))
    // the file really carries NTZ
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val (dt, micros) = loadedMicros(dir)
    assert(dt == TimestampType, s"got $dt")
    assert(micros == microsUtc, s"got $micros")
  }

  test("TIMESTAMP ts passes through untouched") {
    val dir = Files.createTempDirectory("ev-ltz").toString
    writeEvents(dir, timestamp_micros(lit(microsUtc)))
    val (dt, micros) = loadedMicros(dir)
    assert(dt == TimestampType, s"got $dt")
    assert(micros == microsUtc, s"got $micros")
  }

  test("the driver testdata loads through the adaptive branch with rows > 0") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
