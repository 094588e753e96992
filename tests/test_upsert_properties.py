"""Property test: UpsertTable equals a sequential dict-replay oracle for
arbitrary CDC histories (inserts, updates, deletes, duplicate replays,
out-of-order sequences) split across arbitrary batch boundaries, with
compaction/vacuum maintenance interleaved arbitrarily between batches."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_streaming_base_spark.sinks.upsert import UpsertTable

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# op = (key, seq, payload, is_delete); seqs drawn small so keys collide
ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=20),
        st.text(alphabet="abc", max_size=3),
        st.booleans(),
    ),
    min_size=1,
    max_size=24,
)


def oracle_replay(history):
    """Max-sequence-wins per key, delete-wins on equal sequences
    (the documented UpsertTable tie rule), tombstones filtered at read."""
    best = {}
    for k, seq, v, dele in history:
        if k not in best or (seq, dele) > (best[k][0], best[k][2]):
            best[k] = (seq, v, dele)
    return {k: (s, v) for k, (s, v, dele) in best.items() if not dele}


@SETTINGS
@given(
    history=ops,
    n_batches=st.integers(min_value=1, max_value=4),
    maint=st.lists(
        st.sampled_from(["none", "compact", "vacuum", "both"]),
        min_size=1,
        max_size=4,
    ),
)
def test_upsert_matches_dict_replay(spark, history, n_batches, maint):
    # (key, seq, delete-flag) must determine the payload for determinism —
    # dedupe the generated history to its last occurrence per that triple.
    # A delete and a non-delete CAN share (key, seq): the engine resolves
    # that collision delete-wins, and the oracle mirrors it.
    seen = {}
    for op in history:
        seen[(op[0], op[1], op[3])] = op
    history = list(seen.values())

    root = tempfile.mkdtemp(prefix="upsert_prop_")
    try:
        tbl = UpsertTable(
            root, key_cols=["k"], seq_col="seq", delete_col="del", n_buckets=4
        )
        size = max(1, len(history) // n_batches)
        for bi, i in enumerate(range(0, len(history), size)):
            batch = history[i : i + size]
            df = spark.createDataFrame(
                batch, "k BIGINT, seq BIGINT, v STRING, del BOOLEAN"
            )
            tbl.apply(df, bi)
            # interleaved maintenance must never change WHAT is stored:
            # drop_tombstones_before=0 retains every tombstone (any seq
            # may still arrive), vacuum drops superseded snapshots only
            m = maint[bi % len(maint)]
            if m in ("compact", "both"):
                tbl.compact(spark, drop_tombstones_before=0)
            if m in ("vacuum", "both"):
                tbl.vacuum()
        got = {
            r["k"]: (r["seq"], r["v"])
            for r in tbl.read(spark).select("k", "seq", "v").collect()
        }
        assert got == oracle_replay(history)
    finally:
        shutil.rmtree(root, ignore_errors=True)
