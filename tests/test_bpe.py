"""BPE training (`operators/bpe.py`): the distributed merge loop must
reproduce the reference algorithm exactly — pinned merge-for-merge
against a pure-Python Sennrich mirror (get_stats / merge_vocab with the
same (weight DESC, pair ASC) tie-break), on both the classic paper
example and the real corpus word table."""

from __future__ import annotations

import duckdb
import pytest

from pyspark_streaming_base_spark.operators.bpe import END_OF_WORD, bpe_train

from tests.conftest import SF_SMALL


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent mirror: dict-of-tuples Sennrich BPE."""
    vocab = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    out = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), w = best
        out.append((rank, a, b, a + b, w))
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return out


def test_classic_sennrich_example(spark):
    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        ["word", "freq"],
    )
    got = [tuple(r) for r in bpe_train(words, 6).orderBy("merge_rank").collect()]
    want = _python_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert got == want
    # the famous first merges: es -> est -> est</w>
    assert got[0][3] == "es" and got[1][3] == "est"


def test_q143_matches_python_mirror_on_corpus(spark):
    from pyspark_streaming_base_spark.queries import load_all

    got = [
        tuple(r)
        for r in load_all()["q143_bpe_merges"]
        .fn(spark, SF_SMALL)
        .orderBy("merge_rank")
        .collect()
    ]
    con = duckdb.connect()
    wf = dict(
        con.sql(
            f"""
            SELECT word, CAST(COUNT(*) AS BIGINT) FROM (
              SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS word
              FROM read_parquet('{SF_SMALL}/documents.parquet')
            ) GROUP BY word
            """
        ).fetchall()
    )
    want = _python_bpe(wf, 12)
    assert got == want and len(got) == 12


def test_greedy_merge_is_nonoverlapping(spark):
    # "aaaa" + merge (a,a) must become "aa aa", not "aa a a" or overlap
    words = spark.createDataFrame([("aaaa", 1)], ["word", "freq"])
    m = bpe_train(words, 2).orderBy("merge_rank").collect()
    # round 1: (a,a) weight 3 (overlapping count convention), and the
    # greedy application leaves [aa, aa, </w>] — proven by round 2's
    # candidates being exactly the mirror's
    assert (m[0].left, m[0].right, m[0].pair_weight) == ("a", "a", 3)
    got = [tuple(r) for r in m]
    assert got == _python_bpe({"aaaa": 1}, 2)
    # tie at weight 1 between (aa,aa) and (aa,</w>) — "<" sorts before
    # "a", so the tie-break picks (aa, </w>): the deterministic-order
    # invariant, identical in both implementations
    assert (m[1].left, m[1].right) == ("aa", END_OF_WORD)


def test_validation(spark):
    words = spark.createDataFrame([("ab", 1)], ["word", "freq"])
    with pytest.raises(ValueError):
        bpe_train(words, 0)


def _python_apply(word: str, merges) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    for _, a, b, _, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_apply_matches_python_and_training_state(spark):
    from pyspark_streaming_base_spark.operators.bpe import bpe_apply

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(list(wf.items()), ["word", "freq"])
    merges = bpe_train(words, 6)
    tok = bpe_apply(words.select("word"), merges)
    got = {r.word: list(r.pieces) for r in tok.collect()}
    pm = _python_bpe(wf, 6)
    for w in wf:
        assert got[w] == _python_apply(w, pm), w
    # the canonical segmentations after the famous 6 merges
    assert got["newest"] == ["n", "ew", "est</w>"]
    assert got["low"] == ["low", "</w>"]
    # unseen word: merges apply where they can, rest stays characters
    unseen = bpe_apply(
        spark.createDataFrame([("lowest",)], ["word"]), merges
    ).collect()[0]
    assert list(unseen.pieces) == _python_apply("lowest", pm)
