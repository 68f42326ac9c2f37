package graft.sources.dsv2

import java.time.{LocalDate, ZoneOffset}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.sources.Ingest.DateWindow

/** Zero-egress stand-in for the windowed REST endpoint — the same
  * documented-stub role as the pipeline's fixture fetchers and the
  * multimodal ByteHistogramDecoder: the Spark-side plumbing (DSv2
  * scan, window planning, pushdown, schema-driven parsing) is real;
  * only the network hop is replaced by a deterministic synthesizer.
  * Reference shape: the windowed contacts extraction
  * (/root/reference/modules/qa_api_handler.py:86-119) returns a
  * JSON array of contact objects per (beginDate, endDate) request.
  *
  * Every fetch RECORDS its (window, params) so callers can assert
  * exactly what was fetched — window pruning from pushed startTime
  * bounds, server-side evalState/limit params — the way
  * Dsv2SourceSpec's recording fetchers do, but available to
  * scoreboard rows. Recording works in local mode because executor
  * threads share the driver JVM; a real cluster deployment would
  * assert on the driver-side scan description instead.
  *
  * Contacts are a pure function of the window start date (ids encode
  * the date, startTime is midnight UTC and +1h), so a DuckDB oracle
  * can regenerate the expected payload from a date series alone.
  */
object FixtureWindowFetcher {
  val Name = "fixture-contacts"

  val calls = new ConcurrentLinkedQueue[(DateWindow, Map[String, String])]()

  final class Contacts extends WindowedRestSource.ParamWindowFetcher {
    def fetch(w: DateWindow, params: Map[String, String]): Iterator[String] = {
      calls.add((w, params))
      val day = LocalDate.parse(w.start)
      val ms = day.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
      val id = w.start.replace("-", "").toLong
      Iterator(
        s"""[{"id": $id, "startTime": $ms, "assocCallId": "C-${w.start}"},
           | {"id": ${id + 1}, "startTime": ${ms + 3600000}, "assocCallId": null}]""".stripMargin)
    }

    /** The vendor count endpoint: answers without shipping bodies.
      * Records under a `_mode -> count` marker so callers can assert a
      * pushed COUNT(*) never triggered a body fetch. Every synthesized
      * window holds exactly 2 contacts (see fetch above).
      */
    override def count(w: DateWindow, params: Map[String, String]): Option[Long] = {
      calls.add((w, params + ("_mode" -> "count")))
      Some(2L)
    }

    /** The vendor's sort-order facility (`sort=<field>&order=…&
      * limit=1`): answers an extreme without shipping bodies. Records
      * under `_mode -> extreme` so callers can assert a pushed
      * MIN/MAX never triggered a body fetch. Mirrors fetch() above:
      * each window holds startTime = window-start midnight and
      * midnight + 1 h.
      */
    override def extreme(
        w: DateWindow, field: String, smallest: Boolean,
        params: Map[String, String]): Option[Long] = {
      calls.add((w, params + ("_mode" -> "extreme")))
      if (!field.equalsIgnoreCase("startTime")) None
      else {
        val ms = LocalDate.parse(w.start)
          .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
        Some(if (smallest) ms else ms + 3600000L)
      }
    }
  }

  /** Idempotent registration under [[Name]] (the registry is a
    * ConcurrentHashMap keyed by name — re-registering is a no-op
    * semantically; instances are stateless).
    */
  def register(): Unit =
    WindowedRestSource.registerFetcher(Name, new Contacts)
}
