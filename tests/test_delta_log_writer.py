"""Pure-Python Delta-log writer: protocol round-trip through the
pure-Python snapshot reader (A3's executed evidence without jars).

The reference only DECLARES the Delta write path (its e2e writes through
jar-backed ``format("delta")``); here every protocol behavior is executed:
append/overwrite commits, version travel across them, partitioned adds,
``txn``-based exactly-once streaming replay, checkpoint compaction, and
single-writer commit fencing.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_streaming_base_spark.sinks.delta_log import DeltaLogTable
from pyspark_streaming_base_spark.sources.delta_log import DeltaLogSnapshot

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("color", StringType(), True),
        StructField("score", IntegerType(), True),
    ]
)


def _df(spark, rows):
    # one file per commit keeps the add/remove counts deterministic
    return spark.createDataFrame(
        [Row(id=i, color=c, score=s) for (i, c, s) in rows], SCHEMA
    ).coalesce(1)


def _collect(spark, table, version=None):
    df = table.read(spark, version=version)
    return sorted((r.id, r.color, r.score) for r in df.collect())


def test_create_append_roundtrip(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    assert not t.exists()
    assert t.create(SCHEMA) == 0
    assert t.exists()
    with pytest.raises(FileExistsError):
        t.create(SCHEMA)

    v1 = t.append(_df(spark, [(1, "red", 10), (2, "blue", 20)]))
    assert v1 == 1
    assert _collect(spark, t) == [(1, "red", 10), (2, "blue", 20)]

    # log is protocol-shaped: commit 0 = protocol + metaData, commit 1 adds
    log0 = [
        json.loads(l)
        for l in open(tmp_path / "t" / "_delta_log" / f"{0:020d}.json")
    ]
    assert list(log0[0]) == ["protocol"]
    assert log0[1]["metaData"]["partitionColumns"] == []
    log1 = [
        json.loads(l)
        for l in open(tmp_path / "t" / "_delta_log" / f"{1:020d}.json")
    ]
    adds = [a["add"] for a in log1 if "add" in a]
    assert adds and all(
        a["dataChange"] and a["size"] > 0 and "numRecords" in a["stats"]
        for a in adds
    )


def test_version_travel_and_overwrite(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "red", 10)]))
    t.append(_df(spark, [(2, "blue", 20)]))
    t.overwrite(_df(spark, [(9, "green", 90)]))

    assert _collect(spark, t) == [(9, "green", 90)]
    assert _collect(spark, t, version=1) == [(1, "red", 10)]
    assert _collect(spark, t, version=2) == [(1, "red", 10), (2, "blue", 20)]
    # overwrite emitted remove actions for both prior files
    log3 = [
        json.loads(l)
        for l in open(tmp_path / "t" / "_delta_log" / f"{3:020d}.json")
    ]
    assert sum(1 for a in log3 if "remove" in a) == 2


def test_partitioned_append_and_pruning(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA, partition_columns=["color"])
    t.append(_df(spark, [(1, "red", 10), (2, "blue", 20), (3, "red", 30)]))

    snap = t.snapshot()
    assert snap.partition_columns == ["color"]
    pvs = sorted({pv["color"] for _p, pv in snap.files()})
    assert pvs == ["blue", "red"]
    # partition values live in the log and are re-attached on read
    assert _collect(spark, t) == [(1, "red", 10), (2, "blue", 20), (3, "red", 30)]
    # file paths embed the hive-style partition dirs
    assert all(
        f"color={pv['color']}" in p for p, pv in snap.files()
    )


def test_schema_contract_lossless_cast_and_rejects(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    # int -> long id is a lossless upcast: accepted
    df = spark.createDataFrame([(1, "red", 10)], "id int, color string, score int")
    t.append(df)
    assert _collect(spark, t) == [(1, "red", 10)]
    with pytest.raises(ValueError):
        t.append(df.withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError):
        t.append(df.drop("score"))


def test_foreach_batch_exactly_once_replay(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    fn = t.foreach_batch("appA")
    fn(_df(spark, [(1, "red", 10)]), 0)
    fn(_df(spark, [(2, "blue", 20)]), 1)
    # sink-failure replay of batch 1: must be a no-op
    fn(_df(spark, [(2, "blue", 20)]), 1)
    assert _collect(spark, t) == [(1, "red", 10), (2, "blue", 20)]
    assert t.last_txn_version("appA") == 1
    assert t.last_txn_version("appB") == -1
    # a different app's txn counter is independent
    t.foreach_batch("appB")(_df(spark, [(3, "green", 30)]), 0)
    assert t.last_txn_version("appA") == 1
    assert t.last_txn_version("appB") == 0


def test_streaming_end_to_end_through_foreach_batch(spark, tmp_path):
    """rate-free streaming e2e: file stream -> foreachBatch -> Delta log."""
    src = tmp_path / "src"
    src.mkdir()
    _df(spark, [(1, "red", 10), (2, "blue", 20)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "a"))
    _df(spark, [(3, "green", 30)]).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b")
    )

    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(t.foreach_batch("stream-app"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _collect(spark, t) == [
        (1, "red", 10),
        (2, "blue", 20),
        (3, "green", 30),
    ]
    assert t.last_txn_version("stream-app") >= 0


def test_checkpoint_compaction_is_read_path(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=100)
    t.create(SCHEMA)
    for i in range(4):
        t.append(_df(spark, [(i, "c", i * 10)]))
    assert t.checkpoint() == 4
    log = tmp_path / "t" / "_delta_log"
    assert (log / "_last_checkpoint").exists()
    assert (log / f"{4:020d}.checkpoint.parquet").exists()

    # delete the pre-checkpoint JSON commits: a fresh snapshot must still
    # reconstruct the exact state (proves the checkpoint IS the base)
    for v in range(4):  # keep commit 4 so latest-version detection works
        os.remove(log / f"{v:020d}.json")
    snap = DeltaLogSnapshot(str(tmp_path / "t"))
    assert len(snap.files()) == 4
    assert _collect(spark, t) == [(i, "c", i * 10) for i in range(4)]

    # appends after the checkpoint replay on top of it
    t.append(_df(spark, [(99, "z", 990)]))
    assert (99, "z", 990) in set(_collect(spark, t))


def test_auto_checkpoint_interval(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=2)
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1)]))  # v1 -> (1+1) % 2 == 0: checkpoint
    log = tmp_path / "t" / "_delta_log"
    assert (log / "_last_checkpoint").exists()
    assert json.load(open(log / "_last_checkpoint"))["version"] == 1


def test_single_writer_fencing(spark, tmp_path, monkeypatch):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1)]))
    # simulate a concurrent writer stealing version 2 AFTER this writer
    # computed it (stale latest-version view)
    log = tmp_path / "t" / "_delta_log"
    (log / f"{2:020d}.json").write_text(
        '{"add":{"path":"x.parquet","partitionValues":{},"size":1,'
        '"modificationTime":0,"dataChange":true}}\n'
    )
    monkeypatch.setattr(t, "_latest_version", lambda: 1)
    before = sorted(os.listdir(tmp_path / "t"))
    with pytest.raises(RuntimeError, match="single-writer"):
        t.append(_df(spark, [(2, "b", 2)]))
    # the failed commit rolled its data files back out of the table
    assert sorted(os.listdir(tmp_path / "t")) == before


def test_reference_fixture_readable_via_table_facade(spark):
    """The writer's read facade sees the reference's committed fixture."""
    t = DeltaLogTable(
        "/root/reference/tests/resources/delta_streaming_source/test_table"
    )
    assert t.exists()
    assert t.snapshot().version == 0
    assert t.read(spark).count() == 1_111_930


def test_delta_spark_cross_read(spark, tmp_path):
    """If delta-spark jars are present, the real engine reads our log."""
    pytest.importorskip("delta")
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "red", 10)]))
    got = spark.read.format("delta").load(str(tmp_path / "t")).collect()
    assert [(r.id, r.color, r.score) for r in got] == [(1, "red", 10)]


# -- incremental reads & maintenance ----------------------------------------

def test_read_changes_is_the_append_feed(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "red", 10)]))       # v1
    t.append(_df(spark, [(2, "blue", 20)]))      # v2
    t.append(_df(spark, [(3, "green", 30)]))     # v3

    def rows(df):
        return sorted((r.id, r.color, r.score) for r in df.collect())

    assert rows(t.read_changes(spark, 0)) == [
        (1, "red", 10), (2, "blue", 20), (3, "green", 30)]
    assert rows(t.read_changes(spark, 1, 2)) == [(2, "blue", 20)]
    assert rows(t.read_changes(spark, 3)) == []
    with pytest.raises(ValueError):
        t.read_changes(spark, 1, 99)
    # incremental consumer protocol: tail (last_seen, latest] per poll
    seen, last = [], 0
    for upto in (1, 2, 3):
        seen += rows(t.read_changes(spark, last, upto))
        last = upto
    assert seen == rows(t.read(spark))


def test_compact_rewrites_layout_not_data(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    for i in range(4):
        t.append(_df(spark, [(i, "c", i * 10)]))
    before = _collect(spark, t)
    n_files_before = len(t.snapshot().files())
    v = t.compact(spark, target_files=1)
    assert _collect(spark, t) == before
    assert len(t.snapshot().files()) == 1 < n_files_before
    # layout change is invisible to the change feed (dataChange=false)
    assert t.read_changes(spark, v - 1, v).count() == 0
    # time travel to pre-compaction versions still sees the old files
    assert _collect(spark, t, version=v - 1) == before


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    for i in range(3):
        t.append(_df(spark, [(i, "c", i * 10)]))
    before = _collect(spark, t)
    t.compact(spark, target_files=1)
    deleted = t.vacuum()
    assert len(deleted) == 3  # the 3 pre-compaction files
    assert _collect(spark, t) == before  # snapshot intact
    # vacuumed history is no longer readable (documented tradeoff)
    with pytest.raises(Exception):
        t.read(spark, version=2).collect()


def test_vacuum_on_clean_table_is_noop(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1)]))
    assert t.vacuum() == []


def test_compact_zorder_clusters_files(spark, tmp_path):
    """OPTIMIZE ZORDER BY through compact(): data identical, change feed
    silent, and the rewritten files carry tighter per-file id ranges."""
    import pyarrow.parquet as pq

    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    # interleaved appends: each commit spans the whole id range
    t.append(_df(spark, [(i, "a", i) for i in range(0, 40, 2)]))
    t.append(_df(spark, [(i, "b", i) for i in range(1, 40, 2)]))
    before = _collect(spark, t)

    v = t.compact(spark, target_files=4, zorder=["id", "score"])
    assert _collect(spark, t) == before
    assert t.read_changes(spark, v - 1, v).count() == 0

    spans = []
    for p, _pv in t.snapshot().files():
        md = pq.ParquetFile(p).metadata
        st = md.row_group(0).column(0).statistics  # id column
        spans.append(st.max - st.min)
    # pre-compaction files each spanned ~the whole 0..39 range; the
    # z-ordered rewrite gives each file a narrow slice
    assert len(spans) > 1 and max(spans) < 39


def test_clean_log_preserves_snapshot_and_txn_ledger(spark, tmp_path):
    """Log retention: after checkpoint + clean_log the snapshot, the
    stats, AND the exactly-once txn ledger all survive (the checkpoint
    persists txn rows); replayed batches stay no-ops."""
    t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=100)
    t.create(SCHEMA)
    fn = t.foreach_batch("appX")
    fn(_df(spark, [(1, "a", 1)]), 0)
    fn(_df(spark, [(2, "b", 2)]), 1)
    before = _collect(spark, t)
    t.checkpoint()
    deleted = t.clean_log()
    assert len(deleted) == 3  # commits 0..2
    # snapshot + version numbering intact
    assert _collect(spark, t) == before
    assert t.snapshot().version == 2
    # exactly-once ledger survived the cleanup
    assert t.last_txn_version("appX") == 1
    fn(_df(spark, [(2, "b", 2)]), 1)  # replay: must be a no-op
    assert _collect(spark, t) == before
    # and new commits continue the version sequence
    fn(_df(spark, [(3, "c", 3)]), 2)
    assert t.snapshot().version == 3
    assert (3, "c", 3) in _collect(spark, t)
    # time travel below the horizon fails with the documented error
    with pytest.raises(ValueError, match="horizon"):
        t.read(spark, version=1).collect()


def test_clean_log_requires_checkpoint(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    with pytest.raises(ValueError, match="checkpoint"):
        t.clean_log()


def test_stream_restart_survives_log_cleanup(spark, tmp_path):
    """A checkpointed stream whose offsets are past the horizon keeps
    working after clean_log (it only reads commits > its offset)."""
    from collections import Counter

    from pyspark_streaming_base_spark.sources.delta_log_stream import (
        DeltaLogStreamDataSource,
    )

    spark.dataSource.register(DeltaLogStreamDataSource)
    t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=100)
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 2)]))
    out = tmp_path / "out"

    def run():
        q = (
            spark.readStream.format("delta_log")
            .option("path", str(tmp_path / "t"))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    t.checkpoint()
    t.clean_log()
    t.append(_df(spark, [(3, "c", 3)]))
    run()
    got = Counter(
        (r.id, r.color, r.score)
        for r in spark.read.schema(SCHEMA).parquet(str(out)).collect()
    )
    assert got == Counter({(1, "a", 1): 1, (2, "b", 2): 1, (3, "c", 3): 1})


# -- model-based property test ----------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 50), min_size=1, max_size=4)),
    st.tuples(st.just("overwrite"), st.lists(st.integers(0, 50), min_size=1, max_size=4)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("checkpoint"), st.just(None)),
    st.tuples(st.just("vacuum"), st.just(None)),
    st.tuples(st.just("clean_log"), st.just(None)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_delta_log_table_matches_list_model(spark, tmp_path_factory, ops):
    """Arbitrary append/overwrite/compact/checkpoint/vacuum/clean_log
    sequences: the table must always read back exactly what a trivial
    in-memory list model holds — replay, compaction, checkpointing, and
    BOTH retention paths (data-file vacuum, metadata clean_log) can
    never change WHAT is stored, only how."""
    base = tmp_path_factory.mktemp("dlt")
    t = DeltaLogTable(str(base / "t"), checkpoint_interval=1000)
    t.create(SCHEMA)
    model: list = []
    for kind, payload in ops:
        if kind == "append":
            rows = [(i, f"c{i % 3}", i * 10) for i in payload]
            t.append(_df(spark, rows))
            model.extend(rows)
        elif kind == "overwrite":
            rows = [(i, f"c{i % 3}", i * 10) for i in payload]
            t.overwrite(_df(spark, rows))
            model = list(rows)
        elif kind == "compact":
            t.compact(spark, target_files=1)
        elif kind == "checkpoint":
            t.checkpoint()
        elif kind == "vacuum":
            t.vacuum()  # unreferenced files only — snapshot must survive
        elif kind == "clean_log":
            t.checkpoint()  # clean_log requires a checkpoint first
            t.clean_log()
        got = sorted((r.id, r.color, r.score) for r in t.read(spark).collect())
        assert got == sorted(model), (kind, payload)


def test_write_opens_zero_parquet_footers_on_driver(spark, tmp_path, monkeypatch):
    """r4 scale seam: per-file skipping stats must be computed in the
    WRITE JOB, never by a driver footer loop (on object storage that loop
    serializes thousands of remote reads through one process). Sabotage
    every driver-side footer open — the executors' python workers are
    separate processes, so a commit that still succeeds WITH correct
    stats proves the driver never opened a footer."""
    import pyarrow.parquet as _pq

    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA, partition_columns=["color"])

    def _boom(*a, **k):
        raise AssertionError("driver opened a parquet footer during write()")

    monkeypatch.setattr(_pq, "ParquetFile", _boom)
    v = t.append(_df(spark, [(1, "red", 10), (2, "blue", 20), (3, "red", 30)]))
    monkeypatch.undo()

    log = tmp_path / "t" / "_delta_log" / f"{v:020d}.json"
    adds = [
        json.loads(line)["add"]
        for line in log.read_text().splitlines()
        if "add" in json.loads(line)
    ]
    assert len(adds) == 2  # one file per color partition
    for a in adds:
        st = json.loads(a["stats"])
        assert st["numRecords"] in (1, 2)
        assert "minValues" in st and "id" in st["minValues"]
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 3


def test_executor_stats_byte_identical_to_driver_computation(spark, tmp_path):
    """The executor-side stats job emits EXACTLY the JSON the old
    driver-side loop produced — same ``_file_stats`` function, pickled by
    module reference, byte-compared against a direct local call on every
    committed file."""
    from pyspark_streaming_base_spark.sinks.delta_log import _file_stats

    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA)
    t.append(_df(spark, [(i, "c" if i % 2 else None, i * 7) for i in range(50)]))
    t.compact(spark, target_files=1)  # compact path uses the same job

    snap = t.snapshot()
    checked = 0
    for rel in snap._active:
        abs_path = os.path.join(str(tmp_path / "t"), rel)
        assert snap._add_stats[rel] == _file_stats(abs_path)
        checked += 1
    assert checked >= 1
