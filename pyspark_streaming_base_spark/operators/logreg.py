"""Distributed logistic-regression training — the classifier-filter
primitive of LLM data pipelines (quality/language/toxicity gates are
trained linear models applied corpus-wide; the public fastText-style
recipe), implemented as pure DataFrame full-batch gradient descent.

The loop is the k-means/PageRank pattern (``queries/pipeline.py``): model
state lives in a 1-ROW DataFrame (never the driver — no ``collect`` on
any path), each iteration is one corpus scan, and the state table is
``localCheckpoint``-ed so round ``i+1`` never replays round ``i``'s
lineage. Per iteration:

1. score: broadcast the 1-row weight table, ``zip_with`` dot product +
   sigmoid per row — narrow, JVM-side;
2. gradient: per-row contribution ``(p − y)·x_j`` for every dimension,
   posexplode'd to ``(dim, value)`` and summed map-side-combined — the
   ONLY shuffle, carrying (n_dims × n_partitions) partial rows;
3. update: heavy-ball momentum ``v ← β·v + g;  w ← w − lr·v`` via a
   1-row broadcast fold (β = 0 is plain GD).

Conditioning: raw pipeline features (ratios in [0,1], counts/100, …)
give full-batch GD a miserable condition number — measured on the
quality-gate distillation task, 30 iterations landed at 0.82 accuracy
raw vs 0.97 standardized. ``standardize=True`` (default) therefore runs
one stats scan (per-feature mean/std as EXACT scaled-integer sums — the
``queries/_exact.py`` scheme, so the stats are partition-order-
independent), trains in standardized space, and UNWINDS the affine map
afterwards so the returned weights apply to raw features:
``w_raw[j] = w_std[j]/s_j``, ``w_raw[0] = w_std[0] − Σ w_std[j]·m_j/s_j``.
Callers never see the standardization.

Determinism at scale: float gradient sums are partition-order-dependent,
so the same data could train to different last bits on different cluster
layouts. Each per-row contribution is therefore rounded to a 10⁻⁹ grid
and summed as int64 — associative, overflow-checked by ANSI mode, and
making training BIT-REPRODUCIBLE under any repartitioning (pinned by the
repartition test). Capacity: |contribution| ≤ max|x_j| (≈ a few after
standardization) and int64 holds ~9.2·10¹⁸, so ~10⁹ rows per
aggregation — beyond that, pre-aggregate per partition or drop to 10⁻⁶
scale.

Full-batch (not mini-batch SGD) is the right Spark shape: one
deterministic scan per step amortizes at any width, while per-row
sequential updates would serialize. For the few dozen steps a linear
gate needs, iters × one-scan is the cheap part of a 100 TB pipeline —
the applied model (``logreg_predict``) is a zero-shuffle projection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Gradient fixed-point grid: 10⁻⁹ resolves any plausible learning-rate ×
#: feature scale; coarser than double ULP yet fine enough that rounding
#: noise (≤ 5·10⁻¹⁰ per row, mean-zero-ish) never steers the descent.
_GRAD_SCALE = 1_000_000_000

#: Standardization-stats grid (10⁻⁶, the _exact.py convention): features
#: and their squares are rounded per row then summed exactly, so the
#: mean/std — and therefore the whole standardized problem — are
#: partition-order-independent.
_STAT_SCALE = 1_000_000


def _dot_sigmoid(w_col: str, x_col: str):
    """p = sigmoid(w · x) as a JVM expression tree (sequential fold —
    the numpy parity mirror accumulates in the same order)."""
    z = F.aggregate(
        F.zip_with(F.col(w_col), F.col(x_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _as_x(feature_cols: Sequence[str]):
    """Feature vector with a leading 1.0 bias term."""
    return F.array(
        F.lit(1.0), *[F.col(c).cast("double") for c in feature_cols]
    )


def _scaled(col, scale: int):
    return F.round(col * scale, 0).cast("bigint")


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 30,
    lr: float = 8.0,
    momentum: float = 0.9,
    standardize: bool = True,
) -> DataFrame:
    """Train binary logistic regression; returns a 1-row DataFrame with
    column ``w: array<double>`` (``w[0]`` is the intercept, ``w[j]`` the
    coefficient of ``feature_cols[j-1]``, in RAW feature units).

    ``label_col`` must be 0/1 (numeric or boolean). Rows with a NULL
    label or a NULL/NaN feature are excluded (one would poison every
    gradient dimension). Weights start at zero — the standard convex-
    problem init, deterministic by construction. Defaults (30 steps of
    lr 8, β 0.9, standardized) fit a well-separated gate tightly;
    they are ordinary tunables, not magic.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1: got {iters}")
    if not (0.0 <= momentum < 1.0):
        raise ValueError(f"momentum must be in [0, 1): got {momentum}")
    n_dims = len(feature_cols) + 1
    spark = df.sparkSession
    base = (
        df.select(
            _as_x(feature_cols).alias("x"),
            F.col(label_col).cast("double").alias("y"),
        )
        .filter(
            F.col("y").isNotNull()
            & ~F.exists("x", lambda v: v.isNull() | F.isnan(v))
        )
    )
    if standardize:
        # one exact-sum stats scan → 1-row (m, s) arrays; dim 0 (bias)
        # keeps m=0, s=1. Var can round to a hair below zero on a
        # constant column — clamp, and floor s at 10⁻⁶ so a constant
        # feature degrades to "ignored", not a division blow-up.
        stats = base.select(
            F.posexplode("x").alias("dim", "v")
        ).groupBy("dim").agg(
            (
                F.sum(_scaled(F.col("v"), _STAT_SCALE)).cast("double")
                / F.count(F.lit(1))
                / _STAT_SCALE
            ).alias("m"),
            (
                F.sum(_scaled(F.col("v") * F.col("v"), _STAT_SCALE))
                .cast("double")
                / F.count(F.lit(1))
                / _STAT_SCALE
            ).alias("ex2"),
        ).groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda r: F.when(r["dim"] == 0, 0.0).otherwise(r["m"]),
            ).alias("m"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m", "ex2"))),
                lambda r: F.when(r["dim"] == 0, 1.0).otherwise(
                    F.greatest(
                        F.sqrt(
                            F.greatest(
                                r["ex2"] - r["m"] * r["m"], F.lit(0.0)
                            )
                        ),
                        F.lit(1e-6),
                    )
                ),
            ).alias("s"),
        ).localCheckpoint(eager=True)
        base = base.join(F.broadcast(stats)).select(
            F.zip_with(
                "x",
                F.zip_with("m", "s", lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
                lambda xj, ms: (xj - ms["m"]) / ms["s"],
            ).alias("x"),
            "y",
        )
    state = spark.range(1).select(
        F.array(*[F.lit(0.0)] * n_dims).alias("w"),
        F.array(*[F.lit(0.0)] * n_dims).alias("v"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        scored = base.join(F.broadcast(state.select("w"))).select(
            "x", "y", _dot_sigmoid("w", "x").alias("p")
        )
        # per-row gradient contributions on the 10⁻⁹ grid (int64), then
        # the one shuffle: (dim, partial-sum) with map-side combine
        contrib = scored.select(
            F.posexplode(
                F.transform(
                    "x",
                    lambda xj: _scaled(
                        (F.col("p") - F.col("y")) * xj, _GRAD_SCALE
                    ),
                )
            ).alias("dim", "g")
        )
        grad = (
            contrib.groupBy("dim")
            .agg(F.sum("g").alias("gs"), F.count(F.lit(1)).alias("n"))
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "gs", "n"))
                    ),
                    lambda s: s["gs"].cast("double")
                    / F.lit(float(_GRAD_SCALE))
                    / s["n"],
                ).alias("g")
            )
        )
        state = (
            state.join(F.broadcast(grad))
            .select(
                F.zip_with(
                    "v", "g", lambda vi, gi: F.lit(momentum) * vi + gi
                ).alias("v"),
                "w",
            )
            .select(
                F.zip_with(
                    "w", "v", lambda wi, vi: wi - F.lit(lr) * vi
                ).alias("w"),
                "v",
            )
            .localCheckpoint(eager=True)  # 2(k+1) doubles; cuts lineage
        )
    w = state.select("w")
    if standardize:
        # unwind to raw-feature space: w_raw[j] = w_std[j]/s_j (j >= 1),
        # w_raw[0] = w_std[0] - sum_j w_std[j]*m_j/s_j
        w = w.join(F.broadcast(stats)).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_dims - 1)),
                lambda j: F.when(
                    j == 0,
                    F.element_at("w", 1)
                    - F.aggregate(
                        F.sequence(F.lit(1), F.lit(n_dims - 1)),
                        F.lit(0.0),
                        lambda acc, k: acc
                        + F.element_at("w", k + 1)
                        * F.element_at("m", k + 1)
                        / F.element_at("s", k + 1),
                    ),
                ).otherwise(
                    F.element_at("w", j + 1) / F.element_at("s", j + 1)
                ),
            ).alias("w")
        )
    return w


def logreg_predict(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: DataFrame,
    prob_col: str = "p",
) -> DataFrame:
    """Apply a trained model: ``df`` + a ``prob_col`` probability column.
    Zero-shuffle — a 1-row broadcast fold and a per-row expression."""
    return (
        df.join(F.broadcast(weights))
        .withColumn("_x", _as_x(feature_cols))
        .withColumn(prob_col, _dot_sigmoid("w", "_x"))
        .drop("w", "_x")
    )
