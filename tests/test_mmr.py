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


def test_q150_retrieval_pipeline_matches_replayed_composition(spark):
    """End-to-end pin for the serving capstone: q150's output must equal
    the oracle-checked q138 head + the min-max rescale + the (now
    oracle-checked) gridded MMR greedy, replayed independently in
    numpy from q138's own rows and the raw parquet vectors. Closes the
    composition glue (the affine rescale and the stage wiring) that the
    per-stage oracles don't cover."""
    import numpy as np
    import pyarrow.parquet as pq

    from pyspark_streaming_base_spark.queries.similarity import (
        q138_rrf_hybrid_fusion,
        q150_retrieval_pipeline,
    )

    fused = {
        r["doc_id"]: r["rrf_score"]
        for r in q138_rrf_hybrid_fusion(spark, SF_SMALL).collect()
    }
    lo, hi = min(fused.values()), max(fused.values())
    rel = {
        d: ((s - lo) / (hi - lo)) if hi > lo else 1.0 for d, s in fused.items()
    }

    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    vids = np.asarray(tbl["vec_id"])
    V = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    vec = {int(i): V[n] for n, i in enumerate(vids) if int(i) in rel}
    ids = sorted(vec)  # shortlist docs that have vectors
    X = np.stack([vec[i] for i in ids])
    norms = np.linalg.norm(X, axis=1)
    sim = np.floor((X @ X.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
    r = np.array([rel[i] for i in ids])
    order = np.lexsort((ids, -r))
    ids_o = [ids[i] for i in order]
    r_o, sim_o = r[order], sim[np.ix_(order, order)]

    chosen, avail = [], list(range(len(ids_o)))
    out = []
    for rank in range(1, min(_MMR_K, len(ids_o)) + 1):
        best, best_key = None, None
        for i in avail:
            div = max((sim_o[i, j] for j in chosen), default=0.0)
            key = (_MMR_LAMBDA * r_o[i] - (1 - _MMR_LAMBDA) * div, -ids_o[i])
            if best_key is None or key > best_key:
                best, best_key = i, key
        chosen.append(best)
        avail.remove(best)
        div = max((sim_o[best, j] for j in chosen[:-1]), default=0.0)
        mmr = _MMR_LAMBDA * r_o[best] - (1 - _MMR_LAMBDA) * div
        out.append(
            (rank, ids_o[best], float(r_o[best]),
             float(np.floor(mmr * 1e6 + 0.5) / 1e6))
        )

    got = [
        (x.sel_rank, x.doc_id, x.rel_r, x.mmr_r)
        for x in q150_retrieval_pipeline(spark, SF_SMALL)
        .orderBy("sel_rank")
        .collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in out]
    for g, w in zip(got, out):
        assert abs(g[2] - w[2]) < 1e-12
        assert abs(g[3] - w[3]) < 1e-12
