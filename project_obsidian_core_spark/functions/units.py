"""Unit conversion and guarded-math column helpers (SURVEY §2.8, §1.4).

MySQL `SUM_TIMER_WAIT` / `SUM_LOCK_TIME` are cumulative **picoseconds**
(mysql/snapshot.go:26-29). The reference notebooks divide by 1e9 while
labelling the result seconds (02-Query_Analysis.ipynb cell-6) — that is a
documented mislabel; ps->s is 1e12. We store raw ps and expose explicit
converters so no query has to hard-code magic constants.

PostgreSQL `total_exec_time` et al. are **milliseconds** (pg_stat_statements
semantics; the comment at postgresql/snapshot.go:31 saying microseconds is
wrong — see SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PS_PER_SECOND = 1_000_000_000_000  # 1e12
PS_PER_MS = 1_000_000_000  # 1e9
MS_PER_SECOND = 1_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ps_to_s(c: Column | str) -> Column:
    """Picoseconds -> seconds (MySQL timer columns)."""
    return _col(c) / F.lit(float(PS_PER_SECOND))


def ps_to_ms(c: Column | str) -> Column:
    """Picoseconds -> milliseconds."""
    return _col(c) / F.lit(float(PS_PER_MS))


def ms_to_s(c: Column | str) -> Column:
    """Milliseconds -> seconds (PG time columns)."""
    return _col(c) / F.lit(float(MS_PER_SECOND))


def clamp01(c: Column | str) -> Column:
    """Clamp to [0, 1] — load normalization (adaptive/mysql_collector.go:36-41,
    governor.go:162-167)."""
    return F.least(F.greatest(_col(c), F.lit(0.0)), F.lit(1.0))


def guarded_div(num: Column | str, den: Column | str, default: float = 0.0) -> Column:
    """``CASE WHEN den > 0 THEN num/den ELSE default END`` — the reference's
    guarded "avg per call" (02-Query_Analysis.ipynb cell-4, SURVEY A4)."""
    d = _col(den)
    return F.when(d > 0, _col(num) / d).otherwise(F.lit(default))


def ratio_of_sums(hit: Column | str, miss: Column | str) -> Column:
    """Buffer-hit-style ratio ``hit / (hit + miss)`` guarded against zero
    (01-Connect_and_Metrics.ipynb cell-8, SURVEY A5)."""
    h, m = _col(hit), _col(miss)
    return F.when((h + m) > 0, h / (h + m)).otherwise(F.lit(0.0))
