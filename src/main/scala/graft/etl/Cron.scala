package graft.etl

import java.time.{DayOfWeek, LocalDateTime}
import scala.collection.immutable.SortedSet

/** Cron-expression grammar + schedule evaluation — the scheduler
  * semantics every reference import/export runs under
  * (`Smartstore/Scheduling/Services/CronExpression.cs:1-70`, which wraps
  * NCrontab's `CrontabSchedule`, and `DefaultTaskScheduler.cs`, which
  * polls each task's expression for the next due time). Re-implemented
  * from the classic 5-field crontab grammar those libraries expose; this
  * is driver-side control flow (when to launch a run), never a cluster
  * operator.
  *
  * Grammar (NCrontab's 5-field form):
  * {{{
  *   ┌ minute (0-59)  ┌ hour (0-23)  ┌ day-of-month (1-31)
  *   │                │              │      ┌ month (1-12 or JAN-DEC)
  *   │                │              │      │   ┌ day-of-week (0-6 or SUN-SAT, 0 = Sunday)
  *   *                *              *      *   *
  * }}}
  * Each field is a comma list of atoms; an atom is `*`, a value, a range
  * `a-b`, or any of those with a step suffix `/s` (`*&#47;15`, `10-40/5`,
  * `3/7` = from 3 to max by 7). Month and day-of-week names are
  * case-insensitive 3-letter prefixes.
  *
  * Two semantics choices follow NCrontab (the library the reference
  * calls), which differs from Vixie cron:
  *  - day-of-month and day-of-week INTERSECT when both are restricted
  *    (`0 0 1 * MON` = Mondays that are the 1st; Vixie fires on either);
  *  - occurrences are strictly AFTER the base time and strictly BEFORE
  *    the end time, at whole-minute precision.
  */
object Cron {

  final case class Schedule(minutes: SortedSet[Int], hours: SortedSet[Int],
      daysOfMonth: SortedSet[Int], months: SortedSet[Int],
      daysOfWeek: SortedSet[Int]) {

    private def dowOf(d: LocalDateTime): Int =
      if (d.getDayOfWeek == DayOfWeek.SUNDAY) 0 else d.getDayOfWeek.getValue

    private def dayMatches(d: LocalDateTime): Boolean =
      months.contains(d.getMonthValue) &&
        daysOfMonth.contains(d.getDayOfMonth) &&
        daysOfWeek.contains(dowOf(d))

    /** Next occurrence strictly after `base` (minute precision), or None
      * within `horizonDays` (an unsatisfiable schedule like Feb 30 must
      * terminate, not spin — four years covers every leap interaction). */
    def nextAfter(base: LocalDateTime,
        horizonDays: Int = 1462): Option[LocalDateTime] = {
      val start = base.withSecond(0).withNano(0).plusMinutes(1)
      var day = start.toLocalDate
      val lastDay = day.plusDays(horizonDays.toLong)
      while (day.isBefore(lastDay)) {
        val d0 = day.atStartOfDay
        if (dayMatches(d0)) {
          val (minH, minM) =
            if (day == start.toLocalDate) (start.getHour, start.getMinute)
            else (0, 0)
          for (h <- hours.iteratorFrom(minH)) {
            val mFloor = if (h == minH) minM else 0
            minutes.iteratorFrom(mFloor).nextOption() match {
              case Some(m) => return Some(d0.withHour(h).withMinute(m))
              case None => ()
            }
          }
        }
        day = day.plusDays(1)
      }
      None
    }

    /** Occurrences strictly after `base`, strictly before `end`, at most
      * `max` (the reference's `GetFutureSchedules` defaults max to 10). */
    def occurrences(base: LocalDateTime, end: LocalDateTime,
        max: Int = 10): Seq[LocalDateTime] = {
      val out = Seq.newBuilder[LocalDateTime]
      var cur = base
      var n = 0
      while (n < max) {
        nextAfter(cur) match {
          case Some(t) if t.isBefore(end) => out += t; cur = t; n += 1
          case _ => n = max
        }
      }
      out.result()
    }
  }

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val DowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  private def parseValue(tok: String, lo: Int, hi: Int,
      names: Seq[String]): Int = {
    val t = tok.trim.toUpperCase
    val v =
      if (t.nonEmpty && t.forall(_.isDigit)) t.toInt
      else {
        val i = names.indexOf(t)
        require(i >= 0, s"bad cron token '$tok'")
        if (names == MonthNames) i + 1 else i
      }
    require(v >= lo && v <= hi, s"cron value $v outside [$lo, $hi] in '$tok'")
    v
  }

  private def parseField(field: String, lo: Int, hi: Int,
      names: Seq[String] = Nil): SortedSet[Int] = {
    require(field.nonEmpty, "empty cron field")
    val out = SortedSet.newBuilder[Int]
    field.split(',').foreach { atom0 =>
      val (atom, step) = atom0.split('/') match {
        case Array(a) => (a, 1)
        case Array(a, s) =>
          require(s.forall(_.isDigit) && s.toInt > 0, s"bad cron step '$atom0'")
          (a, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron atom '$atom0'")
      }
      val (from, to) = atom match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(a, b) = r.split('-')
          (parseValue(a, lo, hi, names), parseValue(b, lo, hi, names))
        case v if step > 1 => (parseValue(v, lo, hi, names), hi) // "3/7" = 3..max/7
        case v => val x = parseValue(v, lo, hi, names); (x, x)
      }
      require(from <= to, s"inverted cron range '$atom0'")
      (from to to by step).foreach(out += _)
    }
    out.result()
  }

  /** Parse a 5-field expression; throws IllegalArgumentException on any
    * grammar violation (the reference's `IsValid` is try/catch around
    * exactly this). */
  def parse(expr: String): Schedule = {
    require(expr != null && expr.trim.nonEmpty, "empty cron expression")
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"cron needs 5 fields, got ${f.length}: '$expr'")
    Schedule(
      minutes = parseField(f(0), 0, 59),
      hours = parseField(f(1), 0, 23),
      daysOfMonth = parseField(f(2), 1, 31),
      months = parseField(f(3), 1, 12, MonthNames),
      // day-of-week 0-6, Sunday = 0 (NCrontab rejects Vixie's 7 alias)
      daysOfWeek = parseField(f(4), 0, 6, DowNames))
  }

  /** `CronExpression.IsValid` analog. */
  def isValid(expr: String): Boolean =
    try { parse(expr); true } catch { case _: Exception => false }

  /** `CronExpression.GetNextSchedule` analog. */
  def nextSchedule(expr: String, base: LocalDateTime): Option[LocalDateTime] =
    parse(expr).nextAfter(base)

  /** `DefaultTaskScheduler` poll step for the Incremental pattern: the
    * fire times in (lastRun, now] — the runs a poller that was down (or a
    * nightly driver waking up) owes. Each returned time is a high-water
    * boundary for one `Incremental.deltaSlice` pass; an empty result
    * means nothing is due. */
  def dueRuns(expr: String, lastRun: LocalDateTime, now: LocalDateTime,
      max: Int = 100): Seq[LocalDateTime] =
    parse(expr).occurrences(lastRun, now.plusNanos(1), max)
}
