package graft.core

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.collection.immutable.ListMap

/** All 16 global-attribute aggregation strategies of the reference
  * (reference: /root/reference/ncagg/attributes.py:303-322), re-expressed
  * as a fold over the ordered granule list. Attributes are metadata — a few
  * values per granule — so the fold is driver-side like the reference; the
  * distributive strategies (sums, first/last, unique_list, counts) are also
  * demonstrated as a distributed aggregation in q_agg_attrs for the case
  * of millions of granules.
  */
object AttributeStrategies {

  val names: Set[String] = Set(
    "static", "first", "last", "unique_list", "int_sum", "float_sum",
    "constant", "date_created", "time_coverage_start", "time_coverage_end",
    "filename", "remove", "first_input", "last_input", "input_count",
    "ncagg_version")

  /** reference attributes.py:13-22 datetime_format. */
  def formatInstant(i: Instant): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC).format(i)

  private def formatUs(us: Long): String =
    formatInstant(Instant.ofEpochSecond(us / 1000000L,
      (us % 1000000L) * 1000L))

  /** Compute final global attributes.
    *
    * @param attrs        ordered attribute specs
    * @param granules     ordered (granuleName, granuleAttrs) pairs
    * @param outputName   output filename (strategy "filename")
    * @param boundsUs     configured [min,max] (time_coverage_* strategies)
    * @param now          clock (injectable for tests)
    * @return ordered attribute name -> value (strategy "remove" omitted)
    */
  def finalizeAttrs(
      attrs: Seq[AggConfig.AttrSpec],
      granules: Seq[(String, Map[String, String])],
      outputName: String,
      boundsUs: Option[(Long, Long)] = None,
      now: () => Instant = () => Instant.now()): ListMap[String, String] = {

    def seen(name: String): Seq[String] =
      granules.flatMap { case (_, m) => m.get(name) }

    val out = attrs.flatMap { a =>
      val v: Option[String] = a.strategy match {
        case "static" => a.value
        case "first" => seen(a.name).headOption
        case "last" => seen(a.name).lastOption
        case "unique_list" =>
          // reference attributes.py:113-129: split on ", *", keep first
          // occurrence order, join with ", "
          val uniq = seen(a.name).flatMap(_.split(", *"))
            .foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.contains(x)) acc else acc :+ x
            }
          if (uniq.isEmpty) None else Some(uniq.mkString(", "))
        case "int_sum" =>
          Some(seen(a.name).map(_.trim.toLong).sum.toString)
        case "float_sum" =>
          Some(seen(a.name).map(_.trim.toDouble).sum.toString)
        case "constant" =>
          val vs = seen(a.name)
          vs.foreach { x =>
            if (x != vs.head) throw new AssertionError(
              s"Non constant attribute ${vs.head} --> $x")
          }
          vs.headOption
        case "date_created" => Some(formatInstant(now()))
        case "time_coverage_start" => boundsUs.map(b => formatUs(b._1))
        case "time_coverage_end" => boundsUs.map(b => formatUs(b._2))
        case "filename" =>
          Some(new java.io.File(outputName).getName)
        case "remove" => None
        case "first_input" =>
          granules.headOption.map(g => new java.io.File(g._1).getName)
        case "last_input" =>
          granules.lastOption.map(g => new java.io.File(g._1).getName)
        case "input_count" => Some(granules.size.toString)
        case "ncagg_version" => Some("graft-0.1.0")
        case other =>
          throw new IllegalArgumentException(s"unknown strategy: $other")
      }
      // reference attributes.py:374-378: skip None and blank values
      v.filter(_.trim.nonEmpty).map(a.name -> _)
    }
    ListMap(out: _*)
  }
}
