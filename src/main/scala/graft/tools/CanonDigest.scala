package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical, language-neutral per-query result digest — the diffability
  * layer the round-13 q192/q230 adjudication lacked: the driver's
  * correctness gate reports a bare `hash_match: false`, and when the
  * judge cannot reproduce the mismatch the divergence could live on
  * either side (Spark result vs DuckDB oracle evaluation) with no way to
  * tell. `graft.Verify` now emits `digests.json` computed by THIS
  * canonicalization over the dumped parquet; `tools/digest_dump.py`
  * recomputes the identical digest from the same dump in Python. Two
  * machines that disagree on a query can therefore compare digests to
  * decide whether the ENGINE outputs differ (digests differ) or the
  * oracle/compare environment does (digests match) — and
  * `tools/digest_dump.py --diff A B` prints the first differing
  * canonical rows, human-readable.
  *
  * Canonical form (mirrored byte-for-byte by `tools/digest_dump.py`):
  *  - columns sorted by name; header line = names joined with U+0001
  *  - row line = canonical values joined with U+0001, in sorted-column
  *    order; rows sorted as UTF-8 byte strings
  *  - digest = SHA-256 over header + "\n" + each row + "\n", UTF-8
  *
  * Value canonicalization (type-tagged so 1 (long), 1.0 (double), and
  * "1" (string) never collide):
  *  - null → `<null>`; boolean → `T`/`F`; integral → decimal string
  *  - double → `d:` + 16-hex IEEE-754 bits (bit-exact: ±0.0 and NaN
  *    payloads distinguished, no shortest-repr ambiguity across
  *    languages); float → `f:` + 8-hex bits
  *  - decimal → `toPlainString` (scale comes from the parquet schema,
  *    identical for both readers)
  *  - string → `s:` + verbatim; binary → `x:` + lowercase hex
  *  - date → ISO `yyyy-MM-dd`; timestamp → `t:` + epoch micros (exact
  *    integer arithmetic, session TZ is UTC in Verify)
  *  - array → `[v,…]`; struct → `{v,…}` in schema field order;
  *    map → `{k=>v,…}` entries sorted by canonical key
  */
object CanonDigest {

  def canonValue(v: Any): String = v match {
    case null => "<null>"
    case b: Boolean => if (b) "T" else "F"
    case d: Double => "d:" + f"${java.lang.Double.doubleToRawLongBits(d)}%016x"
    case f: Float => "f:" + f"${java.lang.Float.floatToRawIntBits(f)}%08x"
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case s: String => "s:" + s
    case b: Array[Byte] => "x:" + b.map(x => f"$x%02x").mkString
    case d: java.sql.Date => d.toLocalDate.toString
    case d: java.time.LocalDate => d.toString
    case t: java.sql.Timestamp =>
      // floorDiv, not truncation: getTime of 1969-12-31 23:59:59.5 is
      // -500; -500/1000 truncates to 0 and would shift pre-1970
      // fractional seconds by +1s vs the Instant branch and the Python
      // twin (both floor-based)
      "t:" + (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case t: java.time.Instant =>
      "t:" + (t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case t: java.time.LocalDateTime =>
      canonValue(t.toInstant(java.time.ZoneOffset.UTC))
    case a: scala.collection.Seq[_] =>
      a.map(canonValue).mkString("[", ",", "]")
    case r: Row =>
      (0 until r.length).map(i => canonValue(r.get(i))).mkString("{", ",", "}")
    case m: scala.collection.Map[_, _] =>
      // utf8Order, not the JVM default (UTF-16 code-unit) order: for
      // keys mixing supplementary-plane chars with U+E000–U+FFFF the two
      // orders differ and the Python twin (which sorts UTF-8 bytes)
      // would hash a different byte stream
      m.toSeq.map { case (k, mv) => canonValue(k) + "=>" + canonValue(mv) }
        .sorted(utf8Order).mkString("{", ",", "}")
    case other => other.toString
  }

  private val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** (row count, SHA-256 hex) of a result's canonical form. Collects —
    * callers pass the small dumped result relation, never a base table.
    */
  def digest(df: DataFrame): (Long, String) = {
    val names = df.columns.toSeq
    val order = names.indices.sortBy(names)(utf8Order)
    val rows = df.collect().map { r =>
      order.map(i => canonValue(r.get(i))).mkString("\u0001")
    }
    val sorted = rows.sorted(utf8Order)
    val md = MessageDigest.getInstance("SHA-256")
    md.update((order.map(names).mkString("\u0001") + "\n").getBytes("UTF-8"))
    sorted.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map(b => f"$b%02x").mkString)
  }
}
