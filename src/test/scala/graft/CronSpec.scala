package graft

import graft.etl.Cron
import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite

/** Cron grammar + schedule parity (reference:
  * `Smartstore/Scheduling/Services/CronExpression.cs` over NCrontab):
  * expression → next-fire-time table computed by hand from the classic
  * crontab rules, plus the NCrontab-specific choices (dom∩dow
  * intersection, strictly-after base, minute precision). */
class CronSpec extends AnyFunSuite {

  private val base = LocalDateTime.of(2026, 8, 14, 10, 35) // a Friday

  private def next(expr: String, from: LocalDateTime = base): LocalDateTime =
    Cron.nextSchedule(expr, from).get

  test("parity table: expression -> next fire after 2026-08-14T10:35 (Fri)") {
    val table = Seq(
      "* * * * *"        -> LocalDateTime.of(2026, 8, 14, 10, 36),
      "0 * * * *"        -> LocalDateTime.of(2026, 8, 14, 11, 0),
      "*/15 * * * *"     -> LocalDateTime.of(2026, 8, 14, 10, 45),
      "30 2 * * *"       -> LocalDateTime.of(2026, 8, 15, 2, 30),
      "0 0 1 * *"        -> LocalDateTime.of(2026, 9, 1, 0, 0),
      "0 12 * * MON"     -> LocalDateTime.of(2026, 8, 17, 12, 0),
      "0 12 * * 1"       -> LocalDateTime.of(2026, 8, 17, 12, 0),
      "0 0 29 2 *"       -> LocalDateTime.of(2028, 2, 29, 0, 0), // next leap
      "5 4 * JAN SAT"    -> LocalDateTime.of(2027, 1, 2, 4, 5),
      "0 9-17/4 * * *"   -> LocalDateTime.of(2026, 8, 14, 13, 0), // {9,13,17}
      "10,50 6,18 * * *" -> LocalDateTime.of(2026, 8, 14, 18, 10),
      "0 10 14-20 8 *"   -> LocalDateTime.of(2026, 8, 15, 10, 0))
    for ((expr, want) <- table)
      assert(next(expr) == want, s"'$expr' fired at ${next(expr)}, want $want")
  }

  test("NCrontab semantics: dom AND dow intersect when both restricted") {
    // Vixie would fire on the next 1st OR the next Monday; NCrontab (and
    // therefore the reference) waits for a Monday that IS the 1st
    assert(next("0 0 1 * 1") == LocalDateTime.of(2027, 2, 1, 0, 0))
  }

  test("occurrences are strictly after base, strictly before end") {
    // base exactly on a matching minute: excluded
    assert(next("0 10 * * *", LocalDateTime.of(2026, 8, 14, 10, 0)) ==
      LocalDateTime.of(2026, 8, 15, 10, 0))
    val occ = Cron.parse("0 0 * * *").occurrences(
      base, LocalDateTime.of(2026, 8, 20, 0, 0))
    assert(occ == (15 to 19).map(d => LocalDateTime.of(2026, 8, d, 0, 0)),
      occ.toString)
    // max caps the stream (the reference's GetFutureSchedules default 10)
    assert(Cron.parse("* * * * *")
      .occurrences(base, LocalDateTime.of(2030, 1, 1, 0, 0)).size == 10)
  }

  test("unsatisfiable schedules terminate with None, not an infinite scan") {
    assert(Cron.nextSchedule("0 0 30 2 *", base).isEmpty) // Feb 30
  }

  test("IsValid analog: grammar violations reject, valid forms accept") {
    val bad = Seq("", "* * * *", "* * * * * *", "60 * * * *", "* 24 * * *",
      "* * 0 * *", "* * 32 * *", "* * * 13 *", "* * * * 7", "* * * * SUNDAY",
      "5-1 * * * *", "*/0 * * * *", "a * * * *", "1--2 * * * *")
    bad.foreach(e => assert(!Cron.isValid(e), s"accepted bad '$e'"))
    val good = Seq("* * * * *", "*/5 0-12 1,15 JAN-JUN SUN",
      "59 23 31 12 6", "3/7 * * * *", "0 0 * FEB *")
    good.foreach(e => assert(Cron.isValid(e), s"rejected good '$e'"))
  }

  test("dueRuns: the fire times a sleeping poller owes, inclusive of now") {
    val due = Cron.dueRuns("0 * * * *",
      LocalDateTime.of(2026, 8, 14, 10, 0), LocalDateTime.of(2026, 8, 14, 13, 0))
    assert(due == Seq(11, 12, 13).map(h => LocalDateTime.of(2026, 8, 14, h, 0)))
    assert(Cron.dueRuns("0 * * * *",
      LocalDateTime.of(2026, 8, 14, 10, 0),
      LocalDateTime.of(2026, 8, 14, 10, 59)).isEmpty)
  }

  test("month names are case-insensitive; ranges of names work") {
    assert(next("0 0 1 feb *") == LocalDateTime.of(2027, 2, 1, 0, 0))
    assert(Cron.parse("0 0 1 OCT-DEC *").months == Set(10, 11, 12))
  }
}
