"""MERGE (CDC upsert) and SCD2 history operators.

The reference engine is append-only (Druid rollup ingest; see SURVEY §2.1
S9/S10), but any table-maintenance story at 100 TB needs a MERGE primitive:
apply a batch of keyed inserts / updates / deletes to a base snapshot. This
is the Delta-Lake/Iceberg `MERGE INTO` semantics expressed as pure DataFrame
algebra, so it runs on plain parquet snapshots (operators/versioning.py
provides the atomic-publish side).

Scale notes
-----------
- The change batch is almost always orders of magnitude smaller than the
  base.  ``merge_upsert`` therefore broadcasts the change-key side of the
  anti join when small (Spark's AQE does this automatically under the
  broadcast threshold) — the base table is then NEVER shuffled: one scan,
  one broadcast probe, one union.
- With a large change batch both sides shuffle once on the merge key —
  exactly the minimum any engine pays for keyed reconciliation.
- ``scd2_history`` is a per-key ordered window (lead) — one shuffle on the
  entity key; no global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Change-operation column values understood by merge_upsert.
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    order_col: str | None = None,
) -> DataFrame:
    """Apply a keyed CDC batch to a base snapshot (MERGE INTO semantics).

    ``changes`` carries the full new row image plus an ``op_col`` marker:
    ``I`` (insert a new key), ``U`` (replace the row for an existing key),
    ``D`` (remove the key). Rows of ``base`` whose key is untouched pass
    through unchanged; the change row wins for touched keys.

    PRECONDITION: ``changes`` must carry AT MOST ONE row per key (the
    contract Delta/Iceberg ``MERGE INTO`` enforces by raising on multiple
    matches). With several rows per key the anti-join ∪ union would emit
    them all, leaving duplicate keys in the snapshot. If the batch may
    contain intra-batch key collisions (e.g. a log-compacted CDC feed),
    pass ``order_col``: the batch is first reduced last-wins per key by
    that ordering (ties broken by ``op_col`` so the reduction is
    deterministic), which also makes a trailing ``D`` correctly suppress
    earlier ``I``/``U`` rows for the same key.

    Semantics match ``MERGE INTO base USING changes ON keys
    WHEN MATCHED AND op='D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND op<>'D' THEN INSERT *``.

    Plan: base LEFT ANTI (touched keys) ∪ change rows with op≠D. The anti
    probe side is just the key columns of ``changes`` — tiny, broadcastable;
    the base is scanned once and never shuffled when the batch is small.
    The optional last-wins reduction is a window over the (small) change
    batch only — the base never pays for it.
    """
    key_cols = list(keys)
    if order_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col(op_col).desc()
        )
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    touched = changes.select(*key_cols).distinct()
    untouched = base.join(touched, key_cols, "left_anti")
    applied = changes.filter(F.col(op_col) != OP_DELETE).drop(op_col)
    return untouched.unionByName(applied)


def scd2_history(
    events: DataFrame,
    entity_col: str,
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build SCD2 validity intervals from a keyed change-event stream.

    Each event row becomes one history row: ``valid_from`` = its own
    ``order_col``; ``valid_to`` = the NEXT event's (lead) for the same
    entity, NULL for the current row; ``is_current`` marks the open
    interval. Deterministic total order via ``tiebreak_col``.
    """
    w = Window.partitionBy(entity_col).orderBy(order_col, tiebreak_col)
    return events.select(
        "*",
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
        F.lead(order_col).over(w).isNull().alias("is_current"),
    )
