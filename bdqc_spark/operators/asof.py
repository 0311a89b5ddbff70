"""As-of (point-in-time) join and binned interval join.

Two classic temporal operators Spark has no native form of (kdb's
`aj`, pandas `merge_asof`, DuckDB's ASOF JOIN; Databricks' range-join
hint). Both are re-expressed as compositions of existing DataFrame
operators — no UDFs, no cartesian products.

**asof_join** — for each left row, the single right row with the same
keys and the greatest right ts ≤ left ts (direction="backward"; the
"latest known state at event time" join every temporal pipeline
needs), or smallest ts ≥ left ts (forward). Implementation is the
union-and-window form: tag the sides, union them into one stream,
sort per key by (ts, side, seq) and carry the last right payload
forward with ``last(ignorenulls=True)``. ONE shuffle (the window
partition) regardless of table sizes — never a per-row subquery, a
theta join, or a product. Ties: a right row at exactly left.ts
matches (it sorts before the left row); equal-ts right rows resolve
by ``seq_col`` (greatest wins), making the result deterministic and
oracle-exact.

**interval_join** — all (left, right) pairs whose closed numeric
intervals overlap, with equal keys. Implementation is the standard
quantization: each interval explodes to its covered width-W bins,
pairs equi-join on (keys, bin), the exact overlap predicate filters,
and ``distinct`` collapses multi-bin duplicates. Shuffle keys are
(keys, bin) — skew is governed by interval_length/W, the knob the
caller tunes; W ≈ median interval length keeps the blow-up ≤ ~2×.

Scale note: asof_join's window partitions by the join keys — a
single global as-of (by=[]) degenerates to one partition and is
refused rather than silently serialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    seq_col: str,
    direction: str = "backward",
    tolerance_s: float | None = None,
    right_suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join. Every left row survives; matched right
    columns (all non-key, non-seq right columns, suffixed) are null
    when no right row qualifies (or the match falls outside
    ``tolerance_s`` seconds). ``seq_col`` breaks equal-ts ties on the
    right side deterministically (greatest wins)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    if not by:
        raise ValueError(
            "asof_join: empty `by` would put every row in one window partition; "
            "partition by at least one key (or add a constant key knowingly)"
        )
    rcols = [c for c in right.columns if c not in by]
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_lp")
    rpay = F.struct(*[F.col(c) for c in rcols]).alias("_rp")
    u = right.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).cast("double").alias("_seq"),
        rpay,
        F.lit(None).cast(
            left.select(lpay).schema["_lp"].dataType.simpleString()
        ).alias("_lp"),
        F.lit(0).alias("_side"),
    ).unionByName(
        left.select(
            *by,
            F.col(ts_col).alias("_ts"),
            F.lit(None).cast("double").alias("_seq"),
            F.lit(None).cast(
                right.select(rpay).schema["_rp"].dataType.simpleString()
            ).alias("_rp"),
            lpay,
            F.lit(1).alias("_side"),
        )
    )
    asc = direction == "backward"
    order = [
        F.col("_ts").asc() if asc else F.col("_ts").desc(),
        F.col("_side").asc(),
        # within equal (ts, side) the LAST row wins via last(); seq
        # ascending makes that the GREATEST seq in both directions
        F.col("_seq").asc_nulls_last(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance_s is not None:
        gap = F.abs(
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col(f"_m.{ts_col}"))
        ) / 1e6
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_s)), F.col("_m"))
        )
    out_left = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"_m.{c}").alias(f"{c}{right_suffix}") for c in rcols]
    return matched.select(*out_left, *out_right)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    l_id: str,
    r_id: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: float,
) -> DataFrame:
    """All (l_id, r_id) pairs with equal keys whose CLOSED intervals
    [start, end] overlap, plus the overlap bounds. Malformed rows
    (end < start, nulls) match nothing."""
    if bin_width <= 0:
        raise ValueError("interval_join: bin_width must be positive")

    def binned(df, id_c, s_c, e_c, ids, ss, ee):
        return df.where(
            F.col(s_c).isNotNull() & F.col(e_c).isNotNull() & (F.col(e_c) >= F.col(s_c))
        ).select(
            *by,
            F.col(id_c).alias(ids[0]),
            F.col(s_c).cast("double").alias(ss),
            F.col(e_c).cast("double").alias(ee),
            F.explode(
                F.sequence(
                    F.floor(F.col(s_c) / F.lit(bin_width)),
                    F.floor(F.col(e_c) / F.lit(bin_width)),
                )
            ).alias("_bin"),
        )

    lb = binned(left, l_id, l_start, l_end, (l_id,), "_ls", "_le")
    rb = binned(right, r_id, r_start, r_end, (r_id,), "_rs", "_re")
    pairs = lb.join(rb, on=[*by, "_bin"]).where(
        (F.col("_ls") <= F.col("_re")) & (F.col("_rs") <= F.col("_le"))
    )
    return pairs.select(
        *by,
        l_id,
        r_id,
        F.greatest("_ls", "_rs").alias("overlap_start"),
        F.least("_le", "_re").alias("overlap_end"),
    ).distinct()
