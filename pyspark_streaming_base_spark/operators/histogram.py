"""Size-gated equi-depth histograms and per-group percentiles.

The exact forms of both operators buffer or sort a whole group on one
task: ``ntile`` is a per-key single-partition sort, and exact
``percentile`` buffers every value of a group in one aggregation buffer.
Correct and fast for bounded keys; a scale-killer the day one key goes
hot (a 100 TB event stream easily puts 10⁹ rows behind one event_type).

The published fix is a SKETCH: ``approx_percentile`` (Spark's t-digest
style quantile summary) keeps O(accuracy) state per group, merges
map-side like any partial aggregate, and never sorts. These operators
gate BETWEEN the two forms PER KEY, inside one Catalyst plan — no driver
decision, no collect:

1. one cheap count per key (map-side combinable);
2. keys at or under ``exact_threshold`` rows take the exact branch —
   bit-reproducible, oracle-checkable;
3. keys above it take the sketch branch — cut points from
   ``approx_percentile``, bucket assignment by comparison against the
   broadcast cut array, bounds/counts from a plain hash aggregate;
4. ``unionByName`` of the two branches (each key appears in exactly one).

So the SAME query text is exact at test scale and sketch-bounded at
100 TB, and a skewed key degrades to approximate instead of OOM — the
same gating philosophy as the brute-force/LSH split in
``queries/similarity.py``. Used by q116 (equi-depth histogram) and q26
(per-group percentiles); the sketch branch's flat-wall-time behavior is
measured in ``tools/scale_smoke.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["equidepth_histogram", "gated_percentiles"]

#: default per-key row budget for the exact branch. Exact percentile
#: buffers ~8 B/row per group (doubles), so 4M rows ≈ 32 MB of buffer —
#: comfortable on any executor; above it the sketch's O(accuracy) state
#: takes over. Covers every fixture scale (sf0.001–sf0.1 keys are ≤ ~10⁵
#: rows), so oracle-checked runs always take the exact branch.
DEFAULT_EXACT_THRESHOLD = 4_000_000


def _split_by_key_size(
    df: DataFrame, key_col: str, exact_threshold: int
) -> tuple[DataFrame, DataFrame]:
    """(small-key rows, big-key rows): one count-per-key aggregate, then
    two semi-joins against the one-row-per-key count frame. Every key
    lands in exactly one side.

    Deliberately NO broadcast hint: the count frame is one row per
    DISTINCT key — tiny for event_type/returnflag-style keys (where AQE
    broadcasts it anyway) but potentially 10⁹ rows for a user_id-style
    key, where a forced broadcast would kill the driver. AQE picks the
    strategy from the observed size, which is the safe generic
    contract."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    small_keys = counts.filter(F.col("_n") <= exact_threshold).select(key_col)
    big_keys = counts.filter(F.col("_n") > exact_threshold).select(key_col)
    return (
        df.join(small_keys, key_col, "semi"),
        df.join(big_keys, key_col, "semi"),
    )


def equidepth_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tie_col: str,
    n_buckets: int = 10,
    exact_threshold: int = DEFAULT_EXACT_THRESHOLD,
    accuracy: int = 10_000,
) -> DataFrame:
    """(key, bucket, lo, hi, n_rows): ``n_buckets`` equal-row-count
    buckets per key with their value bounds.

    Exact branch: ``ntile`` over (value, tie) — a total order, so the
    result is deterministic and engine-portable. Sketch branch: bucket
    ``b`` = 1 + number of approx cut points strictly below the value
    (values tied with a cut point fall in the lower bucket); with
    ``accuracy`` A the published rank-error bound per cut is n/A rows.
    """
    small, big = _split_by_key_size(df, key_col, exact_threshold)

    def bounds(grouped):
        return grouped.agg(
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )

    w = W.partitionBy(key_col).orderBy(value_col, tie_col)
    exact = bounds(
        small.select(
            key_col,
            value_col,
            F.ntile(n_buckets).over(w).cast("bigint").alias("bucket"),
        ).groupBy(key_col, "bucket")
    )

    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = big.groupBy(key_col).agg(
        F.percentile_approx(value_col, qs, F.lit(accuracy)).alias("_cuts")
    )
    v = F.col(value_col)
    # No forced broadcast on cuts: it has one row per OVER-threshold key —
    # tiny at the default threshold (AQE broadcasts it from the observed
    # size), but a caller-lowered exact_threshold on a high-cardinality
    # key would make a forced broadcast the driver-OOM hazard
    # _split_by_key_size's contract explicitly avoids.
    sketch = bounds(
        big.join(cuts, key_col)
        .select(
            key_col,
            value_col,
            (F.lit(1) + F.size(F.filter("_cuts", lambda c: c < v)))
            .cast("bigint")
            .alias("bucket"),
        )
        .groupBy(key_col, "bucket")
    )
    return exact.unionByName(sketch)


def gated_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9),
    exact_threshold: int = DEFAULT_EXACT_THRESHOLD,
    accuracy: int = 10_000,
) -> DataFrame:
    """(key, p<NN>..., n_rows): per-key percentiles — exact (linear
    interpolation, matches DuckDB ``quantile_cont``) below the row
    threshold, ``approx_percentile`` above it. Output column per
    requested percentile, named ``p50``-style from the fraction."""
    small, big = _split_by_key_size(df, key_col, exact_threshold)
    names = [f"p{round(p * 100):d}" for p in percentiles]
    qs = ", ".join(str(p) for p in percentiles)

    def finish(rows, agg_expr):
        out = rows.groupBy(key_col).agg(
            F.expr(agg_expr).alias("_ps"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        return out.select(
            key_col,
            *[F.col("_ps")[i].alias(n) for i, n in enumerate(names)],
            "n_rows",
        )

    exact = finish(small, f"percentile({value_col}, array({qs}))")
    sketch = finish(
        big, f"percentile_approx({value_col}, array({qs}), {accuracy})"
    )
    return exact.unionByName(sketch)
