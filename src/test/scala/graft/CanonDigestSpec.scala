package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.tools.CanonDigest

/** The canonical-digest contract ([[graft.tools.CanonDigest]]): the
  * digest is a pure function of the result RELATION — invariant to row
  * order, partitioning, and column order — while distinguishing
  * everything the driver's compare distinguishes (value types, ±0.0,
  * null vs empty). `tools/digest_dump.py` mirrors this byte-for-byte;
  * the cross-language agreement itself is exercised by running both on
  * the same Verify dump (see the round workflow), which these pins keep
  * honest on the JVM side.
  */
class CanonDigestSpec extends SparkSuite {
  import spark.implicits._

  test("digest is invariant to row order, partitioning, and column order") {
    val a = Seq((1L, "x", 1.5), (2L, "y", -3.0), (3L, "z", 0.25))
      .toDF("id", "s", "v")
    val (na, ha) = CanonDigest.digest(a)
    val shuffled = a.orderBy(desc("s")).repartition(3)
    val reordered = shuffled.select("v", "id", "s")
    assert(na == 3L)
    assert(CanonDigest.digest(shuffled) == ((na, ha)))
    assert(CanonDigest.digest(reordered) == ((na, ha)))
  }

  test("digest distinguishes value types, sign of zero, and column names") {
    val asLong = Seq(Tuple1(1L)).toDF("v")
    val asStr = Seq(Tuple1("1")).toDF("v")
    val asDouble = Seq(Tuple1(1.0)).toDF("v")
    val renamed = asLong.withColumnRenamed("v", "w")
    val digests = Seq(asLong, asStr, asDouble, renamed).map(CanonDigest.digest)
    assert(digests.distinct.size == 4)
    // ±0.0 distinguish at the VALUE level (raw IEEE bits). Through a plan
    // they may still collide: Tungsten row writers normalize -0.0 to 0.0,
    // identically on every machine — so the digest stays comparable.
    assert(CanonDigest.canonValue(-0.0) == "d:8000000000000000")
    assert(CanonDigest.canonValue(0.0) == "d:0000000000000000")
  }

  test("canonValue renders the full type surface with stable tags") {
    assert(CanonDigest.canonValue(null) == "<null>")
    assert(CanonDigest.canonValue(true) == "T")
    assert(CanonDigest.canonValue(42L) == "42")
    assert(CanonDigest.canonValue(1.0) == "d:3ff0000000000000")
    assert(CanonDigest.canonValue(1.0f) == "f:3f800000")
    assert(CanonDigest.canonValue(new java.math.BigDecimal("1.50")) == "1.50")
    assert(CanonDigest.canonValue(Array[Byte](0x0a, -1)) == "x:0aff")
    assert(CanonDigest.canonValue(java.sql.Date.valueOf("2024-02-29")) ==
      "2024-02-29")
    assert(CanonDigest.canonValue(Timestamp.valueOf("1970-01-01 00:00:01.5")) ==
      "t:1500000")
    // pre-1970 fractional seconds: floorDiv, not truncation — getTime
    // -500 must canonicalize to -500000 micros (matching the Instant
    // branch and the Python twin), not +500000
    assert(CanonDigest.canonValue(new Timestamp(-500L)) == "t:-500000")
    assert(CanonDigest.canonValue(java.time.Instant.ofEpochMilli(-500L)) ==
      "t:-500000")
    assert(CanonDigest.canonValue(Seq(1L, 2L)) == "[1,2]")
    assert(CanonDigest.canonValue(Map("b" -> 2L, "a" -> 1L)) ==
      "{s:a=>1,s:b=>2}")
  }

  test("digest is invariant to the datetime decode API (java.sql vs java.time)") {
    // Verify digests under java8API=true (no sun.util.calendar module
    // opens needed); sbt-launched sessions may decode java.sql types —
    // both representations must canonicalize identically
    val df = Seq(("2024-02-29", "2024-02-29 12:34:56.789")).toDF("d", "t")
      .select(to_date(col("d")).as("d"), to_timestamp(col("t")).as("t"))
    val key = "spark.sql.datetime.java8API.enabled"
    val prev = spark.conf.get(key)
    def under(v: String) = {
      spark.conf.set(key, v)
      try CanonDigest.digest(df) finally spark.conf.set(key, prev)
    }
    assert(under("false") == under("true"))
  }

  test("nested arrays/structs digest deterministically from a real plan") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0)))
      .toDF("id", "vec")
      .withColumn("st", struct(col("id"), size(col("vec")).as("n")))
    val (n1, h1) = CanonDigest.digest(df)
    val (n2, h2) = CanonDigest.digest(df.repartition(4).orderBy(desc("id")))
    assert(n1 == 2L && (n1, h1) == ((n2, h2)))
  }
}
