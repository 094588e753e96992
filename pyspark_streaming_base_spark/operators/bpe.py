"""Distributed BPE vocabulary training (Sennrich, Haddow & Birch, ACL
2016 — public): learn the ordered merge table that defines a subword
tokenizer, from a corpus word-frequency table.

The key scale property of the original algorithm carries straight over:
BPE trains on the WORD-TYPE table (distinct words × frequency), not the
corpus — 100 TB of text folds to a few million word types in one
map-side-combined aggregate, and every merge round then runs on that
small-but-distributed table. Each round is:

1. pair counting — zip each word's adjacent symbol pairs, explode,
   weighted sum by word frequency (one aggregate, map-side combined;
   pair multiplicity within a word counts, the get_stats convention);
2. argmax pair — ``TakeOrderedAndProject(limit=1)`` with the
   deterministic (weight DESC, left ASC, right ASC) tie-break;
3. merge application — a broadcast of the 1-row winner + a pure
   ``aggregate`` fold over each word's symbol array (greedy
   left-to-right, non-overlapping: "aaa" + (a,a) → "aa a"), no Python;
4. ``localCheckpoint`` to truncate lineage (the q94/q103/components
   iteration convention) — plans stay O(1) deep across rounds.

Nothing is ever collected to the driver: the winning pair rides a 1-row
broadcast into the merge expression; the returned merge table is the
union of the per-round winners. Determinism: the tie-break totally
orders candidate pairs, so the learned vocabulary is reproducible across
partitionings and engines (pinned against a pure-Python mirror in
``tests/test_bpe.py``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel appended as a standalone symbol (the Sennrich
#: ``</w>`` marker) so merges cannot cross word boundaries when the
#: learned vocab is applied.
END_OF_WORD = "</w>"


def _merge_fold(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) symbol
    pairs with their concatenation — one expression-level fold, no UDF."""
    merged = F.concat(left, right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def to_symbols(word: Column) -> Column:
    """Initial symbol sequence of a word: characters + the end marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns the ordered merge table ``(merge_rank, left, right, merged,
    pair_weight)`` — the artifact a tokenizer applies (rank order IS the
    application order). Stops early if no adjacent pair remains.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    state = words.select(
        F.col(freq_col).cast("bigint").alias("freq"),
        to_symbols(F.col(word_col)).alias("syms"),
    ).localCheckpoint(eager=True)
    rounds: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        n = F.size("syms")
        pairs = (
            state.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, n - 1),
                        F.slice(F.col("syms"), 2, n - 1),
                    )
                ).alias("p"),
            )
            .select(
                F.col("p.0").alias("left"),
                F.col("p.1").alias("right"),
                F.col("freq").alias("w"),
            )
            .groupBy("left", "right")
            .agg(F.sum("w").cast("bigint").alias("pair_weight"))
        )
        best = pairs.orderBy(
            F.col("pair_weight").desc(), "left", "right"
        ).limit(1)
        if best.isEmpty():  # no pairs left anywhere — vocabulary saturated
            break
        best = best.localCheckpoint(eager=True)
        rounds.append(
            best.select(
                F.lit(r).cast("bigint").alias("merge_rank"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                "pair_weight",
            )
        )
        state = (
            state.crossJoin(F.broadcast(best.select("left", "right")))
            .select(
                "freq",
                _merge_fold(
                    F.col("syms"), F.col("left"), F.col("right")
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    if not rounds:
        raise ValueError("bpe_train: input has no mergeable symbol pairs")
    return reduce(lambda a, b: a.unionByName(b), rounds)


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """Apply a learned merge table to a word column — the TOKENIZE side
    of the BPE pair (train with :func:`bpe_train`, apply here).

    Pure expression work, no Python and no per-merge driver loop: the
    merge table (a few thousand rows at real vocab sizes — tiny by
    construction) folds to ONE array-of-structs broadcast via
    ``collect_list`` over an ordered 1-column-window rank, and a nested
    higher-order ``aggregate`` applies the merges in rank order inside
    codegen: the outer fold walks the merge list, the inner fold is the
    same greedy non-overlapping pass :func:`bpe_train` used — so
    train-then-apply reproduces the training segmentation exactly
    (pinned in pytest).

    Scale: one broadcast join (merge list vs corpus) + a narrow map —
    embarrassingly parallel; the nested fold is O(|merges| × |word|)
    per row, the same cost every BPE tokenizer pays.
    """
    ordered = (
        merges.select("merge_rank", "left", "right")
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("merge_rank", "left", "right"))
            ).alias("_merges")
        )
    )
    applied = F.aggregate(
        F.col("_merges"),
        to_symbols(F.col(text_col)),
        lambda acc, m: F.aggregate(
            acc,
            F.array().cast("array<string>"),
            lambda a, x: F.when(
                (F.size(a) > 0)
                & (F.element_at(a, -1) == m["left"])
                & (x == m["right"]),
                F.concat(
                    F.slice(a, 1, F.size(a) - 1),
                    F.array(F.concat(m["left"], m["right"])),
                ),
            ).otherwise(F.concat(a, F.array(x))),
        ),
    )
    return docs.crossJoin(F.broadcast(ordered)).withColumn(
        out_col, applied
    ).drop("_merges")
