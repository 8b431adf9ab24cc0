"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (task-brief example of an operator to
compose from primitives). The naive formulations explode: an
inequality join is O(n*m) per key, and a windowed range join needs
bounds. This implementation is the scale-correct UNION + WINDOW shape:

    tag right rows (side=0) and left rows (side=1)
    union → one shuffle on (key), sort by (ts, side)
    last_value(right payload, ignorenulls) over rows-unbounded-preceding
    keep left rows

(ts, side) is the WHOLE sort key — no further tiebreak — which is
well-defined exactly because (by, on) must be unique on the right side
(precondition below); equal-ts LEFT rows all see the same matched right
row, so their relative order is irrelevant.

One shuffle + one window, total O((n+m) log) per key partition — the
same cost as the change-log compaction window, and AQE handles key
skew. Ordering (ts, side=right-first) makes the match inclusive
(right.ts == left.ts matches) — the semantics of DuckDB's native ASOF
JOIN (l.ts >= r.ts), which serves as the oracle. Duplicate right
timestamps within a key are ambiguous in any as-of semantics (the
oracle included); callers must guarantee (by, on) uniqueness on the
right side — see the function docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row + the latest `right` row with
    right.on <= left.on and matching `by`. Right payload columns come
    back null when no prior right row exists. (by, on) should be unique
    within `right` — duplicate right timestamps are ambiguous in any
    as-of semantics, including the DuckDB ASOF JOIN oracle."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]

    l_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (on, by)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (on, by)
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_cols
        ],
    )
    left_value_cols = [c for c in left.columns if c not in (on, by)]
    return filled.filter(F.col("__side") == 1).select(
        by,
        on,
        *left_value_cols,
        *[F.col(f"__m_{c}").alias(f"right_{c}") for c in right_cols],
    )
