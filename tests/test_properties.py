"""Property-based tests (hypothesis) for the invariants the oracle suite
can't sweep: the exact-aggregation contract over arbitrary 2-decimal
inputs, and as-of join semantics against ``pandas.merge_asof`` on random
event layouts. The reference repo has no property tests (SURVEY.md §5);
these close that gap for the two most subtle hand-built pieces.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.asof import asof_backward_join
from pyspark_streaming_base_spark.queries._exact import dsum

#: Money-like values per the data contract: ≤2 fractional digits,
#: magnitude ≤ 10⁵ (cents as integers, scaled down).
money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda c: c / 100.0
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(money, min_size=1, max_size=300))
@SETTINGS
def test_dsum_is_exact_for_two_decimal_inputs(spark, values):
    """dsum over any partitioning equals the exact Decimal sum: the scaled
    int64 path must never lose a cent regardless of row order/partition
    placement (float summation would, by ~1e-11 per op)."""
    df = spark.createDataFrame(
        [(v,) for v in values], "v double"
    ).repartition(7)  # arbitrary placement: result must not depend on it
    got = df.agg(dsum(F.col("v")).alias("s")).collect()[0]["s"]
    expect = float(sum(Decimal(str(v)) for v in values))
    assert got == expect


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=60
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=60
    ),
)
@SETTINGS
def test_asof_backward_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_backward_join ≡ pandas merge_asof(direction='backward',
    allow_exact_matches=True) for any key/time layout (right times
    deduplicated per key so the tie rule can't differ)."""
    lpdf = pd.DataFrame(lefts, columns=["k", "t"]).astype("int64")
    lpdf["lid"] = range(len(lpdf))
    rpdf = (
        pd.DataFrame(rights, columns=["k", "t"])
        .drop_duplicates(["k", "t"])
        .astype("int64")
    )
    rpdf["payload"] = rpdf["k"] * 10_000 + rpdf["t"]

    expect = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid")

    ldf = spark.createDataFrame(lpdf, "k long, t long, lid long")
    rdf = spark.createDataFrame(rpdf, "k long, t long, payload long")
    got = (
        asof_backward_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t", carry=["payload"]
        )
        .toPandas()
        .sort_values("lid")
    )

    assert list(got["lid"]) == list(expect["lid"])
    for g, e in zip(got["r_payload"], expect["payload"]):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e


#: Words that can appear in a document, including tokens that stress the
#: tokenizer (no empty strings here — emptiness comes from the joins).
_word = st.text(
    alphabet="abcXYZ012_.,!", min_size=1, max_size=6
).filter(lambda w: " " not in w)


def _naive_tokens(text: str):
    return [t for t in text.split(" ") if t != ""]


def _naive_shingles(text: str):
    toks = _naive_tokens(text)
    if len(toks) < 3:
        return [" ".join(toks)]
    seen, out = set(), []
    for i in range(len(toks) - 2):
        s = " ".join(toks[i : i + 3])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _naive_bigrams(text: str):
    toks = _naive_tokens(text)
    return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


@given(
    texts=st.lists(
        st.lists(_word, min_size=0, max_size=12).map(" ".join)
        # inject irregular spacing: the tokenizer must drop empty tokens
        .flatmap(lambda t: st.sampled_from([t, "  " + t, t + " ", t.replace(" ", "   ", 1)])),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_textops_match_naive_python_oracle(spark, texts):
    """The canonical tokenizer/shingler (`functions/textops.py`) — the
    single definition every dedup/text query trusts — must agree with a
    direct Python implementation on arbitrary messy input, including
    multi-space runs, <3-token docs (whole-text shingle fallback), and
    duplicate-keeping bigrams."""
    from pyspark_streaming_base_spark.functions.textops import (
        tokens,
        word_bigrams,
        word_shingles,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: (r["toks"], r["sh"], r["bi"])
        for r in df.select(
            "i",
            tokens(F.col("text")).alias("toks"),
            word_shingles(F.col("text")).alias("sh"),
            word_bigrams(F.col("text")).alias("bi"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i][0] == _naive_tokens(t), f"tokens({t!r})"
        assert got[i][1] == _naive_shingles(t), f"shingles({t!r})"
        assert got[i][2] == _naive_bigrams(t), f"bigrams({t!r})"


# ---------------------------------------------------------------------------
# q163 systematic-PPS closed form (pure integer math — no Spark needed)
# ---------------------------------------------------------------------------


@given(
    weights=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
    k=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_pps_closed_form_counts_gridpoints_exactly(weights, k):
    """The q163 selection count f(cum_end) − f(cum_before) with
    f(x) = clamp((2kx + W − 1) div (2W), 0, k) equals brute-force
    counting of gridpoints g_i = floor((2i+1)·W/(2k)) inside each doc's
    token interval, for ANY weight layout — and the counts sum to k."""
    W = sum(weights)
    if W == 0:
        return  # empty corpus: no gridline to lay
    grid = [((2 * i + 1) * W) // (2 * k) for i in range(k)]

    def f(x):
        return max(0, min(k, (2 * k * x + W - 1) // (2 * W)))

    cum = 0
    total = 0
    for nt in weights:
        want = sum(1 for g in grid if cum <= g < cum + nt)
        got = f(cum + nt) - f(cum)
        assert got == want, (weights, k, cum, nt)
        total += got
        cum += nt
    assert total == k


# ---------------------------------------------------------------------------
# q156 containment join vs brute force (Spark, bounded examples)
# ---------------------------------------------------------------------------

_cword = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])


@given(
    texts=st.lists(
        st.lists(_cword, min_size=0, max_size=10).map(" ".join),
        min_size=2,
        max_size=7,
    )
)
@SETTINGS
def test_containment_pairs_match_python_brute_force(spark, texts):
    """The q156 shingle-containment join (size gate included) equals an
    exhaustive Python double loop on arbitrary small corpora — the gate
    must be implied by the threshold, never an extra filter."""
    from pyspark_streaming_base_spark.functions.textops import word_shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in df.select(
            "doc_id", word_shingles(F.col("text")).alias("sh")
        ).collect()
    }
    # python brute force over every ordered pair (mirror of the query,
    # lang blocking dropped — single-block corpus)
    want = set()
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b or not sb:
                continue
            if len(sa & sb) / len(sa) >= 0.9:
                want.add((a, b))

    j = df.alias("a").join(
        df.alias("b"), F.col("a.doc_id") != F.col("b.doc_id")
    )
    n_common = F.size(
        F.array_intersect(
            word_shingles(F.col("a.text")), word_shingles(F.col("b.text"))
        )
    )
    na = F.size(word_shingles(F.col("a.text")))
    nb = F.size(word_shingles(F.col("b.text")))
    got_ungated = {
        (r["s"], r["b"])
        for r in j.select(
            F.col("a.doc_id").alias("s"),
            F.col("b.doc_id").alias("b"),
            n_common.alias("nc"),
            na.alias("na"),
            nb.alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .filter(F.col("nc").cast("double") / F.col("na") >= 0.9)
        .collect()
    }
    assert got_ungated == want
    # and the q156 size gate 10·|B| >= 9·|A| never removes a true pair
    gated = {
        (r["s"], r["b"])
        for r in j.select(
            F.col("a.doc_id").alias("s"),
            F.col("b.doc_id").alias("b"),
            n_common.alias("nc"),
            na.alias("na"),
            nb.alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .filter(F.lit(10) * F.col("nb") >= F.lit(9) * F.col("na"))
        .filter(F.col("nc").cast("double") / F.col("na") >= 0.9)
        .collect()
    }
    assert gated == want


# ---------------------------------------------------------------------------
# q175 line repetition: the documents fixture is single-line, so the
# interesting values (duplicate lines, modal shares) are pinned here on
# crafted multi-line docs against an independent python mirror.
# ---------------------------------------------------------------------------

line_token = st.sampled_from(["alpha", "beta", "gamma gamma", "x", "  pad  ", ""])
doc_lines = st.lists(line_token, min_size=0, max_size=12)


@given(docs=st.lists(doc_lines, min_size=1, max_size=6))
@SETTINGS
def test_line_repetition_matches_python_mirror(spark, docs):
    from collections import Counter

    from pyspark_streaming_base_spark.queries.text import line_repetition_stats

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["n_distinct_lines"],
            r["dup_line_frac"],
            r["top_line_cnt"],
            r["top_line_share"],
            r["dup_line_char_frac"],
        )
        for r in line_repetition_stats(df).collect()
    }

    want = {}
    for i, ls in enumerate(docs):
        lines = [x.strip() for x in ls if x.strip() != ""]
        if not lines:
            continue  # blank docs are excluded, like the SQL oracle
        c = Counter(lines)
        n, d = len(lines), len(c)
        top = max(c.values())
        dup_chars = sum(k * len(line) for line, k in c.items() if k > 1)
        tot_chars = sum(len(line) for line in lines)
        want[i] = (
            n,
            d,
            (n - d) / n,
            top,
            top / n,
            dup_chars / tot_chars,
        )
    assert got == want


# ---------------------------------------------------------------------------
# q179 inter-arrival burstiness: the fixture only exercises one arrival
# regime, so the cv² closed form (decimal accumulation, dround grid,
# degenerate-user exclusion, top-k ordering) is pinned here on crafted
# timestamp streams against an independent python mirror.
# ---------------------------------------------------------------------------

#: per-user event epochs: small ints so the mirror's integer math is exact
user_epochs = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=1, max_size=12
)


def _grid6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


@given(users=st.lists(user_epochs, min_size=1, max_size=5))
@SETTINGS
def test_interarrival_burstiness_matches_python_mirror(spark, users):
    import datetime as dt

    from pyspark_streaming_base_spark.queries.windows import (
        interarrival_burstiness,
    )

    rows = []
    eid = 0
    for uid, epochs in enumerate(users):
        for e in epochs:
            rows.append(
                (uid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=e), eid)
            )
            eid += 1
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")
    got = [
        (r["user_id"], r["n_gaps"], r["mean_gap_s"], r["gap_cv2"])
        for r in interarrival_burstiness(df, min_gaps=2, top_k=100).collect()
    ]

    want = []
    for uid, epochs in enumerate(users):
        es = sorted(epochs)  # event_id follows insertion order; equal-ts
        # permutations leave the gap multiset unchanged (the docstring
        # invariant), so plain sort is the mirror's order
        gaps = [b - a for a, b in zip(es, es[1:])]
        n, sg = len(gaps), sum(gaps)
        if n < 2 or sg <= 0:
            continue
        sg2 = sum(g * g for g in gaps)
        want.append(
            (
                uid,
                n,
                _grid6(sg / n),
                _grid6((n * sg2 - sg * sg) / (sg * sg)),
            )
        )
    want.sort(key=lambda r: (-r[3], r[0]))
    assert got == want[:100]


# ---------------------------------------------------------------------------
# q180 filter waterfall: the fixture can't guarantee coverage of every
# rule's boundary, so each rule's trigger and the waterfall's first-fail
# attribution are pinned on crafted documents with known flag vectors.
# ---------------------------------------------------------------------------


def test_filter_waterfall_crafted_docs(spark):
    from pyspark_streaming_base_spark.queries.text import filter_waterfall

    rows = [
        # doc 0: passes everything — 30 tokens (≥25), avg word len
        # (3 + 29·5)/30 ≈ 4.93 ∈ [4.2, 5.0], stopword frac 1/30 ≈ 0.033
        # > 0.03, all bigrams distinct (no repetition, tiny top cover)
        (0, " ".join(["the"] + [f"tok{i:02d}" for i in range(29)])),
        # doc 1: too short (rule 1) AND no stopwords — first-fail = 1
        (1, "aaaa bbbb cccc dddd"),
        # doc 2: degenerate word length (rule 2): long tokens, has stops
        (2, " ".join(["the"] * 3 + ["abcdefghijklmnop"] * 27)),
        # doc 3: no stopwords (rule 3), normal length/words
        (3, " ".join(f"tok{i%25:02d}" for i in range(30))),
        # doc 4: heavy repeated bigram (rule 4): "spam ham" over and over,
        # with stopwords mixed in to survive rule 3
        (4, " ".join(["the", "a", "of"] + ["spam", "ham"] * 15)),
        # doc 5: empty — excluded entirely
        (5, "   "),
        # doc 6: first-fails at rule 4 — 31 tokens, avg word len
        # (3 + 30·5)/31 ≈ 4.94, stopword frac 1/31 ≈ 0.032, but the
        # "spam4 hams5" bigram dominates the multiset
        (6, " ".join(["the"] + ["spam4", "hams5"] * 15)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["rule"]: (
            r["rule_idx"],
            r["n_fail"],
            r["n_first_fail"],
            r["docs_after"],
            r["tokens_after"],
        )
        for r in filter_waterfall(df).collect()
    }

    # independent python mirror of the five flags per doc
    from collections import Counter

    stops = {"a", "the", "and", "of", "to"}
    flags = {}
    nts = {}
    for doc_id, text in rows:
        tk = [x for x in text.split(" ") if x != ""]
        if not tk:
            continue
        nt = len(tk)
        nts[doc_id] = nt
        avg_wlen = sum(len(x) for x in tk) / nt
        stop_frac = sum(1 for x in tk if x in stops) / nt
        bgs = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        c = Counter(bgs)
        nbg = len(bgs)
        dup = sum(k for k in c.values() if k > 1)
        top_cover = max((k * len(g) for g, k in c.items()), default=0)
        n_chars = len(text)
        flags[doc_id] = [
            nt < 25,
            avg_wlen < 4.2 or avg_wlen > 5.0,
            stop_frac < 0.03,
            (dup / nbg if nbg else 0.0) > 0.12,
            (top_cover / n_chars if n_chars else 0.0) > 0.15,
        ]

    rules = [
        "too_short",
        "word_length",
        "low_stopword",
        "bigram_repetition",
        "top_bigram_share",
    ]
    for i, rule in enumerate(rules):
        n_fail = sum(1 for f in flags.values() if f[i])
        n_first = sum(
            1 for f in flags.values() if f[i] and not any(f[:i])
        )
        keep = [d for d, f in flags.items() if not any(f[: i + 1])]
        assert got[rule] == (
            i + 1,
            n_fail,
            n_first,
            len(keep),
            sum(nts[d] for d in keep),
        ), rule

    # the crafted flag vectors must actually exercise every rule, and
    # first-fail attribution must land past the first two rules
    assert flags[1][0] and flags[2][1] and flags[3][2] and flags[4][3]
    assert not any(flags[0]), "doc 0 must pass all rules"
    assert flags[6][3] and not any(flags[6][:3]), "doc 6 must FIRST-fail rule 4"
    assert 5 not in flags, "blank doc must be excluded"
