package graft.core

import java.time.{LocalDateTime, ZoneOffset}

/** Aggregation-bound parsing — Spark-native equivalent of the reference CLI
  * bound syntax (reference: /root/reference/ncagg/cli.py:22-100).
  *
  * A bound spec is either `min:max` (numeric, epoch microseconds) or
  * `Tstart[:[T]stop]` where start/stop are `YYYY[MM[DD[HH[MM]]]]`.
  * When only `Tstart` is given, the stop is inferred as start plus one unit
  * of the least-significant field specified, minus one microsecond — e.g.
  * `T202401` covers all of January 2024. Bounds are inclusive on both ends.
  */
object Bounds {

  /** Parse `YYYY[MM[DD[HH[MM]]]]` with unspecified fields defaulting to the
    * minimum valid value (reference: /root/reference/ncagg/cli.py:22-34). */
  def parseTime(s: String): LocalDateTime = {
    require(
      s.length >= 4 && s.length <= 12 && s.length % 2 == 0 && s.forall(_.isDigit),
      s"bad time string: $s")
    def part(i: Int, dflt: Int) =
      if (s.length >= i + 2) s.substring(i, i + 2).toInt else dflt
    LocalDateTime.of(
      s.substring(0, 4).toInt,
      part(4, 1), part(6, 1), part(8, 0), part(10, 0))
  }

  def toEpochUs(dt: LocalDateTime): Long = {
    val i = dt.toInstant(ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Parse a bound spec into inclusive `[start, stop]` epoch microseconds
    * (reference: /root/reference/ncagg/cli.py:37-100). */
  def parse(b: String): (Long, Long) = {
    val parts = b.split(":")
    if (parts(0).startsWith("T")) {
      val startStr = parts(0).drop(1)
      val start = parseTime(startStr)
      val stopUs =
        if (parts.length == 2) toEpochUs(parseTime(parts(1).stripPrefix("T")))
        else if (parts.length == 1) {
          val end = startStr.length match {
            case 4  => start.plusYears(1)
            case 6  => start.plusMonths(1)
            case 8  => start.plusDays(1)
            case 10 => start.plusHours(1)
            case 12 => start.plusMinutes(1)
          }
          toEpochUs(end) - 1L
        } else throw new IllegalArgumentException(s"bad bound spec: $b")
      (toEpochUs(start), stopUs)
    } else {
      require(parts.length == 2, s"expected min:max format, got: $b")
      (parts(0).toLong, parts(1).toLong)
    }
  }
}
