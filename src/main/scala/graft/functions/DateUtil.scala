package graft.functions

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}

/** P3 tail: day-name timestamp formats the reference's
  * `dateutil.parser.parse` accepts (reference README.md:14) but Spark's
  * datetime patterns cannot parse ('E' is format-only in Spark 3+):
  * RFC-1123 (`Tue, 15 Sep 2020 10:21:33 GMT`), asctime
  * (`Tue Sep 15 10:21:33 2020`), date(1) (`Tue Sep 15 10:21:33 UTC 2020`),
  * and full-name forms (`Tuesday, 15 September 2020 10:21:33`).
  * Case-insensitive like dateutil; zoneless forms are read as UTC (the
  * reference pipeline's working timezone). Static helper shared by
  * interpreted eval and generated code. */
object DateUtilParse {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  // Leniency is scoped to the TEXT fields only: a lenient text field
  // matches any name style (EEE accepts "Tuesday", MMMM accepts "Sep" —
  // the dateutil behavior for mixed forms like 'Tue, 15 September 2020
  // 10:21:33'), while numeric fields stay STRICT — whole-formatter
  // parseLenient would also relax numeric widths and silently parse
  // 'Tue, 15 Sep 20 …' as year 20 AD instead of dead-lettering it.
  // Pattern strings are split on the day/month-name tokens and only those
  // segments are appended in lenient mode.
  private val NameToken = java.util.regex.Pattern.compile("E{3,4}|M{3,4}")

  private def ci(pattern: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder().parseCaseInsensitive()
    val m = NameToken.matcher(pattern)
    var at = 0
    while (m.find()) {
      if (m.start() > at) b.parseStrict().appendPattern(pattern.substring(at, m.start()))
      b.parseLenient().appendPattern(m.group()).parseStrict()
      at = m.end()
    }
    if (at < pattern.length) b.parseStrict().appendPattern(pattern.substring(at))
    b.toFormatter(Locale.US)
  }

  // Grouped by shape so the hot path tries ~1 formatter, not 7: a thrown
  // DateTimeParseException per failed attempt dominates parse cost at
  // 100k+ rows/s. Dispatch on the comma position: "Tue," → RFC-1123 group,
  // "Tuesday," → full-name group, no comma → asctime/date(1) group.
  private val rfcFormats: Array[DateTimeFormatter] = Array(
    DateTimeFormatter.RFC_1123_DATE_TIME,
    ci("EEE, d MMM uuuu HH:mm:ss zzz"),   // case-insensitive RFC-1123
    ci("EEE, d MMM uuuu HH:mm:ss"))       // RFC-1123 without zone
  private val asctimeFormats: Array[DateTimeFormatter] = Array(
    ci("EEE MMM d HH:mm:ss uuuu"),        // asctime
    ci("EEE MMM d HH:mm:ss zzz uuuu"))    // date(1)
  private val fullNameFormats: Array[DateTimeFormatter] = Array(
    ci("EEEE, d MMMM uuuu HH:mm:ss zzz"), // full day/month names
    ci("EEEE, d MMMM uuuu HH:mm:ss"))

  /** Micros since epoch, or null when no day-name format matches. */
  def parseMicros(s: String): java.lang.Long = {
    if (s == null) return null
    val trimmed = s.trim
    if (trimmed.isEmpty) return null
    // every supported form starts with a day name — bail fast on the
    // digit-leading strings the upstream ladder already handles (check
    // AFTER trim: dateutil accepts leading whitespace)
    if (!Character.isLetter(trimmed.charAt(0))) return null
    // asctime space-pads the day; only normalize when a run exists
    // (String.replaceAll would recompile its regex on every row)
    val t = if (trimmed.contains("  ")) Ws.matcher(trimmed).replaceAll(" ") else trimmed
    val comma = t.indexOf(',')
    // dispatch on comma position for the hot path, but FALL THROUGH to the
    // remaining groups on exhaustion (dateutil accepts mixed forms the
    // dispatch heuristic mis-routes; correctness beats the extra throws on
    // the already-slow unparseable path)
    val groups: Array[Array[DateTimeFormatter]] =
      if (comma < 0) Array(asctimeFormats, rfcFormats, fullNameFormats)
      else if (comma == 3) Array(rfcFormats, fullNameFormats, asctimeFormats)
      else Array(fullNameFormats, rfcFormats, asctimeFormats)
    var g = 0
    while (g < groups.length) {
      val formats = groups(g)
      var i = 0
      while (i < formats.length) {
        try {
          val ta = formats(i).parse(t)
          val instant =
            try Instant.from(ta)
            catch { case _: java.time.DateTimeException =>
              LocalDateTime.from(ta).toInstant(ZoneOffset.UTC) }
          return instant.getEpochSecond * 1000000L + instant.getNano / 1000L
        } catch { case _: Exception => }
        i += 1
      }
      g += 1
    }
    null
  }
}

/** string → timestamp for day-name formats; null when unparseable (the
  * ladder's coalesce falls through, then dead-letters). Stays inside
  * whole-stage codegen via a static call. */
case class DateUtilTimestamp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "dateutil_timestamp"

  override protected def nullSafeEval(input: Any): Any =
    DateUtilParse.parseMicros(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("dateutilMicros")
      s"""
         |java.lang.Long $tmp = graft.functions.DateUtilParse.parseMicros($c.toString());
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
