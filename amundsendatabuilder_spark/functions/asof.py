"""As-of join — "latest right row at or before each left row's time".

Spark has no ASOF JOIN operator (DuckDB/kdb/Pandas ``merge_asof`` do);
the naive range-join (``l.key = r.key AND r.ts <= l.ts`` + window to
keep the max) explodes to O(|L|·|R|) per key before filtering.  This
implements it as the UNION-TAG plan: tag both sides, union them, and
run ONE ``last_value(..., ignorenulls)`` window over
``(key ORDER BY ts, side)`` — a single hash shuffle on the key and a
single sort, O(|L|+|R|) rows end to end, AQE-skew-splittable.  That is
the plan a 100 TB event×dimension alignment needs; it is also how
streaming temporal joins are laid out in Flink's versioned-table join.

The reference has no temporal join (its joins are the equi/correlated
set, SURVEY.md §2.8); this is a training-data-pipeline extension
(feature alignment: each interaction event joined to the latest
preceding profile/signup snapshot), verified against DuckDB's native
``ASOF LEFT JOIN`` as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``right_ts <= left_ts`` for the same ``key`` (NULLs when no
    right row precedes).  ``right_cols`` are the right-side payload
    columns to carry (suffixed ``_r``); ``right_ts`` itself is always
    carried as ``<right_ts>_r``.  Ties on the same timestamp: the right
    row wins (``<=`` semantics, matching DuckDB ASOF); duplicate right
    rows at the same (key, ts) are collapsed to the one with the largest
    payload struct, making the result deterministic.

    ``tolerance_us`` optionally voids matches older than the given
    number of microseconds (like ``pandas.merge_asof(tolerance=...)``).
    """
    right_cols = right_cols or []

    def _micros(frame: DataFrame, col: str):
        # NTZ timestamps get a timezone-independent micros computation
        # (casting NTZ -> TIMESTAMP would shift by the session zone);
        # same contract as functions/sessionize.py.
        from pyspark.sql.types import TimestampNTZType

        if isinstance(frame.schema[col].dataType, TimestampNTZType):
            return F.expr(
                f"timestampdiff(MICROSECOND,"
                f" TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
            )
        return F.unix_micros(F.col(col))

    rts = _micros(right, right_ts)
    lts = _micros(left, left_ts)

    # Duplicate (key, ts) right rows are collapsed deterministically by
    # the window's tertiary sort key (max payload wins) — no extra
    # pre-aggregation shuffle.
    r_payload = F.struct(*[F.col(c) for c in right_cols]) if right_cols else None
    # A right row with a NULL timestamp can never be "at or before" any
    # left row (DuckDB ASOF ignores them too) — drop them up front, or the
    # payload window below would pair its payload with a different row's ts.
    r = right.select(
        F.col(key).alias("_k"),
        rts.alias("_ts"),
        *( [r_payload.alias("_pay")] if r_payload is not None else [] ),
    ).where(F.col("_ts").isNotNull())

    row_struct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        row_struct.alias("_row"),
        F.col(key).alias("_k"),
        lts.alias("_ts"),
        F.lit(0).alias("_side"),
    )
    row_type = l.schema["_row"].dataType
    pay_cols = ["_pay"] if r_payload is not None else []
    r_tagged = r.select(
        F.lit(None).cast(row_type).alias("_row"),
        "_k", "_ts", F.lit(1).alias("_side"), *pay_cols,
    )
    if r_payload is not None:
        l = l.withColumn("_pay", F.lit(None).cast(r.schema["_pay"].dataType))

    u = l.unionByName(r_tagged)
    # Right rows sort BEFORE left rows at the same ts (side desc) so an
    # exactly-simultaneous right row is visible to the left row (<=);
    # among duplicate right rows at the same (key, ts) the payload sorts
    # ascending, so last_value picks the max payload deterministically.
    order = [F.col("_ts").asc(), F.col("_side").desc()]
    if r_payload is not None:
        order.append(F.col("_pay").asc_nulls_first())
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_ts = F.last(F.when(F.col("_side") == 1, F.col("_ts")), ignorenulls=True).over(w)
    out = u.withColumn("_m_ts", matched_ts)
    if r_payload is not None:
        out = out.withColumn(
            "_m_pay",
            F.last(
                F.when((F.col("_side") == 1) & F.col("_ts").isNotNull(),
                       F.col("_pay")),
                ignorenulls=True,
            ).over(w),
        )
    out = out.where(F.col("_side") == 0)
    if tolerance_us is not None:
        in_tol = (F.col("_ts") - F.col("_m_ts")) <= F.lit(tolerance_us)
        out = out.withColumn("_m_ts", F.when(in_tol, F.col("_m_ts")))
        if r_payload is not None:
            out = out.withColumn("_m_pay", F.when(in_tol, F.col("_m_pay")))
    cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_m_ts").alias(f"{right_ts}_r"))
    for c in right_cols:
        cols.append(F.col(f"_m_pay.{c}").alias(f"{c}_r"))
    return out.select(*cols)
