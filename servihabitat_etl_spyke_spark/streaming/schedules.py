"""Schedules (SURVEY.md §2.8 T8/T9): one-shot and periodic triggers.

Reference semantics:
- One-shot (`packages/protolib/src/bundles/automations/schedule.ts:5-19`):
  build a Date from (time "HH:MM", day, monthName, year) and setTimeout the
  callback for (date - now).
- Periodic (`automations/periodicSchedule.ts:4-18`): build the cron
  expression ``0 <minutes> <hours> * * <days>`` from minutes, hours and a
  comma-separated weekday-name list (`:21-46`), run via CronJob.

Spark mapping: schedules are *trigger configuration*, not data operators —
a one-shot maps to a delayed `Trigger.AvailableNow` batch kick-off, a
periodic to `trigger(processingTime=...)` or an external cron invoking a
batch job. This module reproduces the semantics that are testable engine
logic: the date/cron parsing and the next-fire-time computation (what the
CronJob library did for the reference), plus helpers that hand the right
trigger kwargs to ``writeStream``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

MONTHS = {m: i + 1 for i, m in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])}

WEEKDAYS = {d: i for i, d in enumerate(
    ["monday", "tuesday", "wednesday", "thursday", "friday",
     "saturday", "sunday"])}  # Python weekday(): monday=0


def one_shot_at(time: str, day: int, month_name: str, year: int) -> datetime:
    """T8: the reference's createDateObject — (HH:MM, day, monthName, year)
    -> absolute datetime. Raises KeyError on a bad month name (the
    reference logs and skips; we surface the error)."""
    hour, minute = (int(x) for x in time.split(":")[:2])
    return datetime(year, MONTHS[month_name.lower()], day, hour, minute)


def delay_seconds(target: datetime, now: datetime) -> float:
    """The setTimeout delay (schedule.ts:13: date.getTime() - Date.now())."""
    return (target - now).total_seconds()


def periodic_cron_expr(minutes: int, hours: int, days: str) -> str:
    """T9: the reference's parseCronExpression — ``0 M H * * d1,d2`` with
    weekday names mapped monday=1..sunday=7 (periodicSchedule.ts:25-45)."""
    idx = [str(WEEKDAYS[d.strip().lower()] + 1) for d in days.split(",")]
    return f"0 {minutes} {hours} * * {','.join(idx)}"


def next_fires(minutes: int, hours: int, days: str, after: datetime,
               n: int = 1) -> list[datetime]:
    """Next n fire datetimes of the periodic schedule strictly after
    ``after`` (what CronJob computed for the reference). Pure arithmetic —
    no polling loop over minutes: jump day by day — at most ~7n steps
    (one week of day-hops per fire in the worst single-weekday case),
    never a per-minute scan."""
    wanted = {WEEKDAYS[d.strip().lower()] for d in days.split(",")}
    fires: list[datetime] = []
    day = after.replace(hour=hours, minute=minutes, second=0, microsecond=0)
    if day <= after:
        day += timedelta(days=1)
    while len(fires) < n:
        if day.weekday() in wanted:
            fires.append(day)
        day += timedelta(days=1)
    return fires


def one_shot_trigger_kwargs() -> dict:
    """writeStream kwargs for a one-shot run: process everything available,
    then stop (the batch analog of the reference's single setTimeout)."""
    return {"availableNow": True}


def periodic_trigger_kwargs(interval_seconds: int) -> dict:
    """writeStream kwargs for a fixed-cadence micro-batch (the in-engine
    analog of a cron cadence; calendar-aligned cron stays external)."""
    return {"processingTime": f"{interval_seconds} seconds"}
