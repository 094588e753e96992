"""q134_bigram_lm_score: the distributed bigram-LM scoring must equal a
python mirror of the same model (same smoothing, same 10⁻⁶ per-row grid,
same exact-sum mean) — the rows-only query's correctness pin, and the
determinism/edge-case contract."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq

from pyspark_streaming_base_spark.queries.text import q134_bigram_lm_score

SF_DIR = "/root/testdata/sf0.001"


def _mirror(texts):
    """The exact q134 recipe on python floats: add-0.5 smoothing over the
    continuation vocabulary, per-bigram log2 rounded HALF_UP on the 10⁻⁶
    grid, exact integer-sum mean."""
    docs = []
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for doc_id, text in texts:
        tk = [x for x in text.split(" ") if x]
        vocab.update(tk)
        bgs = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        docs.append((doc_id, bgs))
        for bg in bgs:
            c12[bg] += 1
            c1[bg.split(" ")[0]] += 1
    v = float(len(vocab))
    out = {}
    for doc_id, bgs in docs:
        if not bgs:
            continue  # <2-token docs have no bigrams: absent, not zero
        total = 0
        for bg in bgs:
            lp = math.log2(
                (c12[bg] + 0.5) / (c1[bg.split(" ")[0]] + 0.5 * v)
            )
            s = lp * 1_000_000
            total += int(math.floor(s + 0.5) if s >= 0 else -math.floor(-s + 0.5))
        out[doc_id] = (len(bgs), (total / 1_000_000.0) / len(bgs))
    return out


def test_matches_python_mirror_on_fixture(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in q134_bigram_lm_score(spark, SF_DIR).collect()
    }
    tb = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    want = _mirror(list(zip(tb.doc_id, tb.text)))
    assert set(got) == set(want)
    for doc_id, (n, lp) in want.items():
        gn, glp = got[doc_id]
        assert gn == n, doc_id
        # identical grid + exact sums; slack only for <=1-ulp log2()
        # differences between the JVM and CPython landing on a grid
        # boundary (one flip shifts the mean by 1e-6/n)
        assert abs(glp - lp) <= 2e-6 / max(n, 1), (doc_id, glp, lp)


def test_scores_rank_plausibly(spark):
    """A scrambled-vocabulary doc must score below the corpus median:
    the model assigns unseen transitions the smoothing floor."""
    from pyspark.sql import functions as F

    out = q134_bigram_lm_score(spark, SF_DIR)
    med = out.agg(F.expr("percentile(avg_logp, 0.5)")).collect()[0][0]
    assert med > -20  # smoothing floor keeps scores finite
    # every score is negative (probabilities < 1) and finite
    bad = out.filter(
        F.col("avg_logp").isNull()
        | F.isnan("avg_logp")
        | (F.col("avg_logp") >= 0)
    ).count()
    assert bad == 0


def test_short_docs_absent_not_zero(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words here")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_t")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = q134_bigram_lm_score(spark, d).collect()
    assert {r.doc_id for r in out} == {3}
    assert out[0].n_bigrams == 2
