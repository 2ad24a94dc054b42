"""Range (interval) join — "which interval(s) does each point fall in".

Open-source Spark has no range-join optimization: a join whose condition
is ``l.ts BETWEEN r.start AND r.end`` (plus an optional equi-key) plans
as BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) comparisons, a
non-starter at 100 TB.  This implements the standard BINNED plan (the
same family as Databricks' range-join hints and PostGIS tile joins):

  1. quantize time into fixed-width bins,
  2. explode every interval onto each bin it overlaps (bounded fan-out:
     ``len(interval)/bin_width + 1`` copies),
  3. equi-join points to intervals on ``(key, bin)`` — an ordinary hash
     shuffle Catalyst/AQE handle (broadcastable, skew-splittable),
  4. re-check the exact predicate ``start <= ts < end``.

Each (point, interval) pair meets in exactly ONE bin (the point's), so
no post-join dedup is needed.  Pick ``bin_width_us`` near the typical
interval length: fan-out stays O(1) and the equi-join carries
O(|L| + |R|·fanout) rows end to end.  A per-row ``raise_error`` guard
fails loudly if an adversarial interval would explode past
``max_bins_per_interval`` (same blast-radius philosophy as
functions/components.py's max_edges guard).

The reference has only equi/correlated joins (SURVEY.md §2.8); this is a
training-data-pipeline extension (event-to-validity-window alignment:
experiment exposure windows, promo windows, maintenance windows),
verified against DuckDB's native inequality join as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _micros(frame: DataFrame, col: str):
    # NTZ timestamps get a timezone-independent micros computation
    # (casting NTZ -> TIMESTAMP would shift by the session zone); same
    # contract as functions/asof.py and functions/sessionize.py.
    if isinstance(frame.schema[col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(F.col(col))


def _floordiv(c, n: int):
    # Exact floor division on BIGINT micros. ``floor(c / n)`` would route
    # through double division, which can misround within ~100 us of a
    # bucket boundary at 2020s-era epoch-micros magnitudes; subtracting
    # the non-negative pmod makes the numerator an exact multiple, whose
    # IEEE division is exact.
    return ((c - F.pmod(c, F.lit(n))) / n).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    right_cols: list[str] | None = None,
    bin_width_us: int = 3_600_000_000,
    max_bins_per_interval: int = 1024,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row to the ``intervals`` rows whose half-open
    window ``[start_col, end_col)`` contains its ``ts_col`` (and whose
    ``key`` matches, when given).  Interval columns come back suffixed
    ``_r``; ``right_cols`` selects the interval payload columns carried.

    Rows with NULL ``ts`` and intervals with NULL/empty windows
    (``end <= start``) match nothing, mirroring SQL comparison semantics.
    ``how`` is ``inner`` (matches only) or ``left`` (unmatched points
    kept with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    right_cols = right_cols or []
    bw = int(bin_width_us)
    if bw <= 0:
        raise ValueError("bin_width_us must be positive")

    s_us = _micros(intervals, start_col)
    e_us = _micros(intervals, end_col)
    r = intervals.select(
        *( [F.col(key).alias("_k")] if key else [] ),
        s_us.alias("_s"),
        e_us.alias("_e"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).where(F.col("_s").isNotNull() & F.col("_e").isNotNull()
            & (F.col("_e") > F.col("_s")))

    # Half-open end: the last covered bin holds micro _e - 1.
    first_bin = _floordiv(F.col("_s"), bw)
    last_bin = _floordiv(F.col("_e") - 1, bw)
    n_bins = last_bin - first_bin + 1
    bins = F.when(
        n_bins > max_bins_per_interval,
        F.raise_error(F.concat(
            F.lit("range_join: interval spans "), n_bins.cast("string"),
            F.lit(f" bins > max_bins_per_interval={max_bins_per_interval}"
                  f" at bin_width_us={bw} — widen the bin or cap the"
                  f" interval generator"))).cast("array<bigint>"),
    ).otherwise(F.sequence(first_bin, last_bin))
    r_binned = r.withColumn("_bin", F.explode(bins))

    l = points.withColumn("_pt", _micros(points, ts_col)) \
              .withColumn("_bin", _floordiv(F.col("_pt"), bw))

    cond = (l["_bin"] == r_binned["_bin"]) \
        & (r_binned["_s"] <= l["_pt"]) & (l["_pt"] < r_binned["_e"])
    if key:
        cond = (l[key] == r_binned["_k"]) & cond
    out = l.join(r_binned, cond, how)

    cols = [l[c] for c in points.columns]
    cols.append(r_binned["_s"].alias(f"{start_col}_us_r"))
    cols.append(r_binned["_e"].alias(f"{end_col}_us_r"))
    cols += [r_binned[f"_r_{c}"].alias(f"{c}_r") for c in right_cols]
    return out.select(*cols)
