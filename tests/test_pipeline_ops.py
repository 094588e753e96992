"""Tests for the training-pipeline extras (q91–q94): PII redaction
patterns against a Python ``re`` oracle, int8 quantization against a
numpy mirror, and k-means against a numpy Lloyd oracle with identical
init and tie-breaks."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.textops import PII_PATTERNS, redact
from pyspark_streaming_base_spark.queries.pipeline import kmeans_assign
from pyspark_streaming_base_spark.queries import load_all

from tests.conftest import SF_MEDIUM, SF_SMALL

REGISTRY = load_all()


def _py_redact(s: str) -> str:
    for _, pat in PII_PATTERNS:
        s = re.sub(pat, "#", s)
    return s


def test_redact_matches_python_re(spark):
    samples = [
        "contact bob.smith+spam@example-mail.co.uk for details",
        "server at 192.168.0.1 and 10.0.0.255, port 8080",
        "no pii here at all",
        "mixed a@b.io then 1.2.3.4 then plain 123456 end",
        "edge 999.999.999.999 still matches the lax ipv4 tier",
        "digits42inside0words7",
        "",
        "trailing dot ip 1.2.3.4. and double 1.2.3.4 5.6.7.8",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["text"])
    got = [r["red"] for r in df.select(redact(F.col("text")).alias("red")).collect()]
    assert got == [_py_redact(s) for s in samples]


def test_int8_quantize_matches_numpy(spark):
    pdf = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mins = mat.min(axis=0)
    rngs = mat.max(axis=0) - mins
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((mat - mins) * 255.0 / rngs)
    q = np.where(rngs > 0, np.minimum(q, 255), 0).astype(np.int64)
    expect = {
        int(v): (
            int(q[i].sum()),
            hashlib.md5("-".join(map(str, q[i])).encode()).hexdigest(),
        )
        for i, v in enumerate(pdf["vec_id"])
    }

    rows = REGISTRY["q92_int8_quantize"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(expect)
    for r in rows:
        es, ed = expect[r["vec_id"]]
        assert r["q_sum"] == es
        assert r["q_digest"] == ed
        assert 0.0 <= r["max_abs_err_r"] <= float(rngs.max()) / 255.0 + 1e-9


def _numpy_lloyd(mat, k, iters):
    cent = mat[:k].copy()
    for _ in range(iters + 1):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the lowest index on ties
        if _ == iters:
            return assign, d2[np.arange(len(mat)), assign]
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    raise AssertionError("unreachable")


# sf0.01 is a genuinely different corpus (same vec_ids, different
# vectors), and sf0.1 quadruples it: the float-Lloyd path now feeds
# oracle-checked consumers (q122/q125/q127 chain), so a numeric drift at
# larger scale must fail HERE, not as a confusing oracle failure there
@pytest.mark.parametrize(
    "sf_dir", [SF_SMALL, SF_MEDIUM, "/root/testdata/sf0.1"]
)
def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    k, iters = 8, 3
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    expect_assign, expect_d2 = _numpy_lloyd(mat, k, iters)
    expect_by_vec = dict(zip(pdf["vec_id"].astype(int), zip(expect_assign, expect_d2)))

    rows = kmeans_assign(spark, sf_dir, k=k, iters=iters).collect()
    assert len(rows) == len(mat)
    mismatches = 0
    for r in rows:
        ea, ed = expect_by_vec[r["vec_id"]]
        if r["cid"] != ea:
            # tolerate only genuine near-ties (numpy sums in a different
            # order than the sequential Spark fold)
            assert abs(r["d2"] - ed) < 1e-9
            mismatches += 1
        else:
            assert r["d2"] == pytest.approx(ed, rel=1e-9, abs=1e-12)
    assert mismatches <= len(mat) // 100

    # inertia is non-increasing in the iteration count
    i1 = sum(
        r["d2"] for r in kmeans_assign(spark, sf_dir, k=k, iters=1).collect()
    )
    i3 = sum(r["d2"] for r in rows)
    assert i3 <= i1 + 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from pyspark_streaming_base_spark.operators.pagerank import pagerank
    from pyspark.sql import functions as F

    # small deterministic graph: ring + chords
    raw = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i * 7) % 20) for i in range(20)]
    raw = [(a, b) for a, b in raw if a != b]
    edges_sym = list({(a, b) for a, b in raw} | {(b, a) for a, b in raw})
    edges = spark.createDataFrame(edges_sym, ["src", "dst"])

    got = {r["node"]: r["r"] for r in pagerank(edges, 0.85, iters=4).collect()}

    n = 20
    out = np.zeros(n)
    adj = np.zeros((n, n))
    for a, b in edges_sym:
        adj[a][b] = 1.0
        out[a] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        # the operator's exact-sum semantics (r9): each message gridded
        # to 1e-12 and summed as integers, so equality is EXACT
        contrib_int = np.zeros(n, dtype=np.int64)
        for a in range(n):
            if out[a]:
                contrib_int += (adj[a] > 0) * int(
                    np.floor(r[a] / out[a] * 1e12 + 0.5)
                )
        r = (1 - 0.85) / n + 0.85 * (contrib_int.astype(np.float64) / 1e12)
    for i in range(n):
        assert got[i] == r[i]  # bit-exact under the gridded fold
    # ranks form a probability distribution (no dangling loss)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ewma_matches_sequential_recursion(spark):
    """q110's closed-form weighted sum == the textbook recursion
    s_j = a*x_j + (1-a)*s_(j-1) run sequentially in Python over the
    last-20 window (a = 1/2), per user."""
    pdf = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    expect = {}
    for uid, g in pdf.groupby("user_id"):
        xs = [round(v * 1e6) / 1e6 for v in g["value"].tolist()][-20:]
        s = xs[0]
        for x in xs[1:]:
            s = 0.5 * x + 0.5 * s
        expect[uid] = s
    rows = REGISTRY["q110_ewma_smoothing"].fn(spark, SF_SMALL).collect()
    assert {r.user_id for r in rows} == set(expect)
    for r in rows:
        assert abs(r.ewma - expect[r.user_id]) < 1e-9, r.user_id


def test_mix_weights_invariants(spark):
    """q126: weights are a probability vector, oversample is >1 exactly
    for below-average sources (α=1/2 temperature up-weights the tail),
    and the natural-share identity Σ(weight·oversample⁻¹·sn/n)… reduces
    to Σ n·weight/oversample == Σ n — checked directly."""
    rows = REGISTRY["q126_mix_weights"].fn(spark, SF_SMALL).collect()
    assert rows
    s = sum(r.weight for r in rows)
    assert abs(s - 1.0) < 1e-9
    n_tot = sum(r.n_docs for r in rows)
    mean = n_tot / len(rows)
    for r in rows:
        # sqrt temperature: small sources oversampled, large undersampled
        natural = r.n_docs / n_tot
        assert (r.oversample > 1) == (r.weight > natural)
        assert abs(r.oversample - r.weight / natural) < 1e-9


def test_q163_pps_invariants(spark):
    """Systematic PPS: the k gridpoints land exactly once each —
    Σ n_copies == k regardless of corpus shape — and a doc's copy count
    never exceeds its proportional share rounded up."""
    from pyspark.sql import functions as F

    from pyspark_streaming_base_spark.queries import load_all
    from pyspark_streaming_base_spark.queries.pipeline import _PPS_K

    df = load_all()["q163_pps_token_sample"].fn(spark, SF_SMALL).cache()
    assert df.agg(F.sum("n_copies")).collect()[0][0] == _PPS_K
    assert df.filter(F.col("n_copies") < 1).count() == 0


def test_q164_kcenter_matches_numpy_greedy(spark):
    """The distributed greedy k-center sequence equals a numpy mirror
    with the same start (lowest vec_id) and (distance, lowest-id)
    tie-breaks — pick for pick, radius for radius."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pyspark_streaming_base_spark.queries import load_all

    got = (
        load_all()["q164_kcenter_coreset"]
        .fn(spark, SF_SMALL)
        .orderBy("rank")
        .collect()
    )

    pdf = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    def d2g(a, B):  # the operator's 10^-6 pairwise grid (r9)
        return np.floor(((B - a) ** 2).sum(axis=1) * 1e6 + 0.5) / 1e6

    sel = [0]  # index of lowest vec_id after the sort
    radii = [0.0]
    d2min = d2g(X[0], X)
    for _ in range(2, 17):
        mask = np.ones(len(ids), bool)
        mask[sel] = False  # the operator anti-joins selected centers
        cand = np.where(mask)[0]
        pick = int(cand[np.lexsort((ids[cand], -d2min[cand]))[0]])
        sel.append(pick)
        radii.append(float(d2min[pick]))
        d2min = np.minimum(d2min, d2g(X[pick], X))
    want_ids = [int(ids[i]) for i in sel]
    assert [r["vec_id"] for r in got] == want_ids
    for r, radius in zip(got, radii):
        assert abs(r["d2_covered_r"] - radius) < 2e-6


def test_kcenter_exhausted_geometry_never_repeats_ids(spark):
    """Once every remaining vector ties at d2min = 0 (exact-duplicate
    embeddings), the greedy picks must still be DISTINCT vec_ids (the
    duplicates, in id order, at d2_covered 0) — never a repeat of an
    already-selected center; and k beyond the corpus size raises
    instead of padding."""
    import pytest as _pytest

    from pyspark_streaming_base_spark.operators.kcenter import kcenter_select

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [3.0, 4.0]),
            (3, [0.0, 0.0]),  # exact duplicate of 1
            (4, [3.0, 4.0]),  # exact duplicate of 2
        ],
        "vec_id bigint, v array<double>",
    )
    got = kcenter_select(emb, k=4).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3, 4]
    assert [r["d2_covered"] for r in got] == [0.0, 25.0, 0.0, 0.0]

    with _pytest.raises(ValueError, match="exceeds the corpus size"):
        kcenter_select(emb, k=5)
