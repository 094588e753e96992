"""q140 MMR diverse top-k: the Arrow-group greedy selection must equal an
independent numpy mirror computed straight from the parquet, and the
selected set must actually be more diverse than the plain relevance top-k."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from pyspark_streaming_base_spark.queries import load_all
from pyspark_streaming_base_spark.queries.similarity import (
    _MMR_CAND,
    _MMR_K,
    _MMR_LAMBDA,
)

from tests.conftest import SF_SMALL


def _numpy_mirror():
    """Greedy MMR over the cosine top-_MMR_CAND of query vector 0,
    recomputed with no Spark involvement."""
    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"])
    V = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    q = V[ids == 0][0]
    mask = ids != 0
    cids, C = ids[mask], V[mask]
    qn = q / np.linalg.norm(q)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    rel = np.floor(Cn @ qn * 1e6 + 0.5) / 1e6  # the dround grid
    # top-_MMR_CAND candidates by (rel desc, vec_id asc)
    order = np.lexsort((cids, -rel))[:_MMR_CAND]
    cids, rel, C = cids[order], rel[order], C[order]
    # dot/(|a||b|) then the 10^-6 grid — the r9 mmr_rerank semantics
    # that make the greedy argmax engine-portable
    norms = np.linalg.norm(C, axis=1)
    sim = np.floor((C @ C.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
    chosen: list = []
    avail = list(range(len(cids)))
    out = []
    for rank in range(1, min(_MMR_K, len(cids)) + 1):
        best, best_key = None, None
        for i in avail:
            div = max((sim[i, j] for j in chosen), default=0.0)
            score = _MMR_LAMBDA * rel[i] - (1.0 - _MMR_LAMBDA) * div
            key = (score, -cids[i])
            if best_key is None or key > best_key:
                best, best_key = i, key
        chosen.append(best)
        avail.remove(best)
        div = max((sim[best, j] for j in chosen[:-1]), default=0.0)
        mmr = _MMR_LAMBDA * rel[best] - (1.0 - _MMR_LAMBDA) * div
        out.append(
            (
                rank,
                int(cids[best]),
                float(rel[best]),
                float(np.floor(mmr * 1e6 + 0.5) / 1e6),
            )
        )
    return out, cids, rel, sim


def test_mmr_matches_numpy_mirror(spark):
    R = load_all()
    got = [
        (r.sel_rank, r.vec_id, r.rel_r, r.mmr_r)
        for r in R["q140_mmr_diverse_topk"]
        .fn(spark, SF_SMALL)
        .orderBy("sel_rank")
        .collect()
    ]
    want, _, _, _ = _numpy_mirror()
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-12
        assert abs(g[3] - w[3]) < 1e-12


def test_mmr_selection_is_more_diverse_than_topk():
    """MMR's point: mean pairwise similarity of the selected set must not
    exceed the plain relevance top-k's."""
    out, cids, rel, sim = _numpy_mirror()
    sel = [int(np.where(cids == vid)[0][0]) for _, vid, _, _ in out]
    topk = list(range(_MMR_K))  # candidates arrive sorted by relevance

    def mean_pairwise(idx):
        vals = [sim[a, b] for n, a in enumerate(idx) for b in idx[n + 1:]]
        return float(np.mean(vals))

    assert mean_pairwise(sel) <= mean_pairwise(topk) + 1e-12
    # and it still retrieves relevant items: every pick is a candidate
    assert all(0 <= i < _MMR_CAND for i in sel)
