"""As-of join — the temporal primitive Spark's built-in joins lack: for
every left row, the single most recent right row (per key) whose time is
at or before the left row's time.

Implemented Spark-first as the **union + running-last window** plan, not a
range join: tag both sides, union them, and per key take the last
non-null right value over the time-ordered window up to the current row.

Why this shape at 100 TB: one shuffle total (hash on the key for the
window), no key×key range explosion, no per-key loop, and the window is
`rowsBetween(unboundedPreceding, current)` running-last — Spark evaluates
it in a single pass per partition without buffering the frame. A naive
`left.join(right, key & (r.t <= l.t))` + max-per-left-row builds
|left|×|right-per-key| intermediate pairs; this builds |left|+|right|
rows, full stop.

Tie rule: a right row AT exactly the left row's time is visible (the
"or before" of as-of). Encoded in the sort: right rows order before left
rows at equal times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    tolerance: int,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``|left.time - right.time| <= tolerance`` — the band/interval join.

    Spark-first shape: **bucket the time axis at the tolerance width**.
    Two rows within ``tolerance`` are at most one bucket apart, so the
    right side emits (bucket-1, bucket, bucket+1) and the join is plain
    hash-equality on (keys, bucket) plus the exact band filter. A naive
    `ON keys AND abs(lt-rt) <= tol` is a key-equality join with a range
    residual — fine until one key is hot, and never prunable; the bucket
    form shuffles on (keys, bucket), which also splits hot keys across
    their time range. Each qualifying pair appears exactly ONCE (the left
    row has a single bucket; only the right's matching replica joins).

    Assumes non-negative times (integer `div` truncation = floor there).
    Right's non-key columns come back suffixed."""
    if tolerance <= 0:
        # `t div 0` is NULL in Spark SQL — the join would silently return
        # nothing instead of exact-time matches
        raise ValueError("range_join tolerance must be a positive integer")
    l_b = left.withColumn("_b", F.expr(f"{time_col} div {tolerance}"))
    r_sfx = right.select(
        *key_cols,
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in key_cols
        ],
    )
    r_b = r_sfx.withColumn(
        "_rb", F.expr(f"{time_col}{suffix} div {tolerance}")
    ).withColumn(
        "_b", F.explode(F.array(F.col("_rb") - 1, F.col("_rb"), F.col("_rb") + 1))
    )
    return (
        l_b.join(r_b, on=[*key_cols, "_b"])
        .filter(
            F.abs(F.col(time_col) - F.col(f"{time_col}{suffix}")) <= tolerance
        )
        .drop("_b", "_rb")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: ``left`` keeps all its columns; each row gains
    ``<value_col><suffix>`` from the nearest ``right`` row with the same
    keys (null when none exists).

    ``direction="backward"`` (default) matches the latest right row with
    ``right.time <= left.time``; ``"forward"`` the earliest right row
    with ``right.time >= left.time``. ``tolerance`` (same units as a
    numeric ``time_col``; SECONDS for timestamps) nulls out matches
    farther than the bound — the pandas ``merge_asof`` contract, still
    one union + one per-key window, no range explosion.

    Both frames need ``key_cols`` and ``time_col``; ``value_cols`` are
    taken from ``right``.

    The match is ROW-atomic: the carried values come from the single
    nearest right row as a struct, so a NULL value in that row yields
    NULL (per-column last-non-null would smuggle in an older row's value
    — and would silently defeat the tolerance check, which bounds the
    matched row's time)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    row_struct = F.struct(
        F.col(time_col).alias("_t"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    null_struct = F.lit(None).cast(
        "struct<_t:{},{}>".format(
            right.schema[time_col].dataType.simpleString(),
            ",".join(
                f"_v_{c}:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            ),
        )
    )
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_v_row", null_struct
    )
    r_tagged = right.select(
        *key_cols, F.col(time_col), row_struct.alias("_v_row")
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    # time ordering is ascending for backward, descending for forward; in
    # both cases right (_side=0) sorts before left at equal times, making
    # same-instant right rows visible to the left row
    t_order = (
        F.col(time_col) if direction == "backward" else F.col(time_col).desc()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t_order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.withColumn("_m", F.last("_v_row", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .withColumn("_t_matched", F.col("_m._t"))
    )
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_m._v_{c}"))
    if tolerance is not None:
        t_dtype = right.schema[time_col].dataType.simpleString()
        if t_dtype.startswith("timestamp"):
            delta = F.abs(
                F.unix_micros(F.col("_t_matched").cast("timestamp"))
                - F.unix_micros(F.col(time_col).cast("timestamp"))
            ) / F.lit(1_000_000.0)
        elif t_dtype == "date":
            # a DATE cast to double is NULL in Spark, which would silently
            # null every match below — handle it explicitly: day distance
            # in seconds (dates are midnight instants), same unit as the
            # timestamp branch so one tolerance value works across types
            delta = F.abs(
                F.datediff(F.col("_t_matched"), F.col(time_col))
            ).cast("double") * F.lit(86400.0)
        elif t_dtype in (
            "tinyint", "smallint", "int", "bigint", "float", "double",
        ) or t_dtype.startswith("decimal"):
            delta = F.abs(
                F.col("_t_matched").cast("double")
                - F.col(time_col).cast("double")
            )
        else:
            raise ValueError(
                f"asof_join: tolerance is not supported for time column "
                f"type {t_dtype!r} (numeric, timestamp, or date required)"
            )
        within = F.col("_t_matched").isNotNull() & (delta <= F.lit(tolerance))
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(within, F.col(f"{c}{suffix}")).otherwise(F.lit(None)),
            )
    return out.select(*lcols, *[f"{c}{suffix}" for c in value_cols])
