"""Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
1998 — public): greedy diverse top-k over a BOUNDED candidate shortlist.

THE single definition of the greedy step: q140 (cosine-relevance MMR)
and q150 (the retrieval capstone, RRF-relevance MMR) both call
:func:`mmr_rerank`; the numpy mirror in ``tests/test_mmr.py`` pins the
selection logic once for both.

Scale contract: callers hand over an ALREADY-REDUCED shortlist (top-32
by their relevance signal — TakeOrderedAndProject does the distributed
work); the inherently-sequential greedy then runs as ONE bounded Arrow
group via ``applyInPandas`` (the q111 bounded-re-rank tier). Nothing
sequential ever sees more than the shortlist.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_rerank(
    shortlist: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    rel_col: str = "rel_r",
) -> DataFrame:
    """Greedily pick ``k`` of the shortlist maximizing
    ``lam·rel − (1−lam)·max_sim_to_selected``; ties break on the id.

    Output: ``(sel_rank, <id_col>, <rel_col>, mmr_r)`` with ``mmr_r``
    rounded to the 10⁻⁶ grid. Deterministic given the shortlist: the
    scan order is (rel desc, id asc) and diversity uses cosine over the
    provided vectors, with every PAIRWISE similarity rounded to the
    10⁻⁶ grid BEFORE it enters a selection score (r9) — so the greedy
    argmax compares doubles that are bit-identical across engines
    (``lam·rel_r − (1−lam)·div_r`` of two grid values), which is what
    lets q140 carry a full recursive-CTE DuckDB oracle instead of a
    rows-only check. Cosine is computed dot/(‖a‖·‖b‖) (one division
    after the full-precision dot), the exact shape the oracle mirrors.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        # Pairwise cosine with the SAME sequential left-to-right fold as
        # DuckDB's list_dot_product / vectorops.dot: acc = acc + a[t]*b[t]
        # in dimension order, double throughout. BLAS matmul /
        # np.linalg.norm reorder the accumulation (pairwise/SIMD sums),
        # whose ULP differences can land exactly on a
        # floor(x·1e6+0.5) boundary and flip the gridded argmax
        # cross-engine — the latent flip CLAUDE.md invariants 1/9 forbid.
        n, d = V.shape
        dotm = np.zeros((n, n), dtype=np.float64)
        nrm2 = np.zeros(n, dtype=np.float64)
        for t_dim in range(d):
            col = V[:, t_dim]
            dotm += col[:, None] * col[None, :]
            nrm2 += col * col
        norms = np.sqrt(nrm2)
        sim = dotm / (norms[:, None] * norms[None, :])
        # 10⁻⁶-grid the pairwise sims (see docstring: cross-engine
        # determinism of the greedy argmax)
        sim = np.floor(sim * 1e6 + 0.5) / 1e6
        order = np.lexsort((ids, -rel))
        ids, rel, sim = ids[order], rel[order], sim[np.ix_(order, order)]
        chosen: list = []
        avail = list(range(len(ids)))
        for _ in range(min(k, len(ids))):
            best, best_key = None, None
            for i in avail:
                div = max((sim[i, j] for j in chosen), default=0.0)
                score = lam * rel[i] - (1.0 - lam) * div
                key = (score, -ids[i])
                if best_key is None or key > best_key:
                    best, best_key = i, key
            chosen.append(best)
            avail.remove(best)
        return pd.DataFrame(
            {
                "sel_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
                id_col: ids[chosen].astype(np.int64),
                rel_col: rel[chosen],
                "mmr_r": [
                    np.floor(
                        (
                            lam * rel[i]
                            - (1.0 - lam)
                            * max((sim[i, j] for j in chosen[:n]), default=0.0)
                        )
                        * 1e6
                        + 0.5
                    )
                    / 1e6
                    for n, i in enumerate(chosen)
                ],
            }
        )

    return (
        shortlist.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(
            select,
            f"sel_rank bigint, {id_col} bigint, {rel_col} double, mmr_r double",
        )
    )
