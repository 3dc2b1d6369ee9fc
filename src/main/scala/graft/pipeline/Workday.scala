package graft.pipeline

import java.time.{DayOfWeek, LocalDate}

/** Workday schedule policy (SURVEY.md §2.9 T14): the reference's custom
  * timetable — run once per workday, skipping weekends and a holiday
  * calendar (`dags/plugins/workday.py:45-96`). Driver-side scheduling
  * policy; the holiday set is a lookup the same way the reference uses
  * `holidays.US` (here an explicit set — no holiday lib in scope, and
  * the policy is calendar-agnostic anyway).
  */
final case class WorkdaySchedule(holidays: Set[LocalDate] = Set.empty) {

  def isWorkday(d: LocalDate): Boolean =
    d.getDayOfWeek != DayOfWeek.SATURDAY &&
    d.getDayOfWeek != DayOfWeek.SUNDAY &&
    !holidays.contains(d)

  /** Next workday strictly after `d` (the `next_dagrun_info` analog). */
  def nextWorkday(d: LocalDate): LocalDate = {
    var c = d.plusDays(1)
    while (!isWorkday(c)) c = c.plusDays(1)
    c
  }

  /** All workday run dates in [start, end) — the backfill run list. */
  def runDates(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(end))
      .filter(isWorkday).toSeq
}
