"""``format("delta_log")`` — the pure-Python Delta DataSource: batch
snapshot scans and version-paged microbatch streaming (A2 executing
without jars), including checkpoint-restart exactly-once, stream time
travel, compaction invisibility, and the reference's committed fixture
read executor-side."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_streaming_base_spark.sinks.delta_log import DeltaLogTable
from pyspark_streaming_base_spark.sources.delta_log_stream import (
    DeltaLogStreamDataSource,
)

REFERENCE_FIXTURE = (
    "/root/reference/tests/resources/delta_streaming_source/test_table"
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("color", StringType(), True),
        StructField("score", IntegerType(), True),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaLogStreamDataSource)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, color=c, score=s) for (i, c, s) in rows], SCHEMA
    ).coalesce(1)


def _table(spark, path, batches):
    t = DeltaLogTable(str(path))
    t.create(SCHEMA)
    for rows in batches:
        t.append(_df(spark, rows))
    return t


def _rows(df):
    return Counter((r.id, r.color, r.score) for r in df.collect())


def _run_stream(spark, path, ckpt, qname, **options):
    reader = spark.readStream.format("delta_log").option("path", str(path))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


def _run_stream_to_parquet(spark, path, ckpt, out, **options):
    """Parquet-sink variant for RESTART tests (the memory sink refuses
    checkpoint recovery)."""
    reader = spark.readStream.format("delta_log").option("path", str(path))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.schema(SCHEMA).parquet(str(out))


def test_batch_scan_matches_snapshot_reader(spark, tmp_path):
    t = _table(spark, tmp_path / "t", [[(1, "red", 10)], [(2, "blue", 20)]])
    via_source = spark.read.format("delta_log").option("path", str(tmp_path / "t")).load()
    assert _rows(via_source) == _rows(t.read(spark))
    # version option = snapshot time travel
    v1 = (
        spark.read.format("delta_log")
        .option("path", str(tmp_path / "t"))
        .option("version", "1")
        .load()
    )
    assert _rows(v1) == Counter({(1, "red", 10): 1})


def test_batch_scan_partitioned_table(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA, partition_columns=["color"])
    t.append(_df(spark, [(1, "red", 10), (2, "blue", 20), (3, "red", 30)]))
    got = spark.read.format("delta_log").option("path", str(tmp_path / "t")).load()
    assert _rows(got) == _rows(t.read(spark))


def test_stream_reads_all_commits(spark, tmp_path):
    _table(
        spark,
        tmp_path / "t",
        [[(1, "a", 1)], [(2, "b", 2)], [(3, "c", 3)]],
    )
    got = _run_stream(spark, tmp_path / "t", tmp_path / "ck", "dls_all")
    assert _rows(got) == Counter(
        {(1, "a", 1): 1, (2, "b", 2): 1, (3, "c", 3): 1}
    )


def test_stream_restart_is_exactly_once(spark, tmp_path):
    t = _table(spark, tmp_path / "t", [[(1, "a", 1)], [(2, "b", 2)]])
    out = tmp_path / "out"
    first = _run_stream_to_parquet(spark, tmp_path / "t", tmp_path / "ck", out)
    assert sum(_rows(first).values()) == 2
    # new commits arrive while the stream is down
    t.append(_df(spark, [(3, "c", 3)]))
    t.append(_df(spark, [(4, "d", 4)]))
    # restart from the SAME checkpoint (cold reader, cursor reset)
    total = _run_stream_to_parquet(spark, tmp_path / "t", tmp_path / "ck", out)
    # exactly-once: everything arrives, nothing is replayed
    assert _rows(total) == Counter(
        {(1, "a", 1): 1, (2, "b", 2): 1, (3, "c", 3): 1, (4, "d", 4): 1}
    )


def test_stream_starting_version_time_travel(spark, tmp_path):
    _table(spark, tmp_path / "t", [[(1, "a", 1)], [(2, "b", 2)], [(3, "c", 3)]])
    got = _run_stream(
        spark, tmp_path / "t", tmp_path / "ck", "dls_sv", starting_version=3
    )
    assert _rows(got) == Counter({(3, "c", 3): 1})


def test_stream_ignores_compaction_rewrites(spark, tmp_path):
    t = _table(spark, tmp_path / "t", [[(1, "a", 1)], [(2, "b", 2)]])
    out = tmp_path / "out"
    done = _run_stream_to_parquet(spark, tmp_path / "t", tmp_path / "ck", out)
    assert sum(_rows(done).values()) == 2
    t.compact(spark, target_files=1)  # dataChange=false rewrite
    t.append(_df(spark, [(3, "c", 3)]))
    after = _run_stream_to_parquet(spark, tmp_path / "t", tmp_path / "ck", out)
    # the compaction's re-added files must NOT be re-emitted
    assert _rows(after) == Counter(
        {(1, "a", 1): 1, (2, "b", 2): 1, (3, "c", 3): 1}
    )


def test_admission_control_versions_per_batch(spark, tmp_path):
    _table(
        spark,
        tmp_path / "t",
        [[(i, "x", i)] for i in range(4)],
    )
    got = _run_stream(
        spark,
        tmp_path / "t",
        tmp_path / "ck",
        "dls_adm",
        max_versions_per_batch=1,
    )
    assert sum(_rows(got).values()) == 4  # paced, but everything arrives


def test_reference_fixture_reads_executor_side(spark):
    """The reference's own committed covid fixture through the DataSource
    batch path: exact count, Arrow batches read in tasks (not a
    driver-side union plan)."""
    df = (
        spark.read.format("delta_log")
        .option("path", REFERENCE_FIXTURE)
        .load()
    )
    assert df.count() == 1_111_930
    assert [f.name for f in df.schema.fields] == [
        "date", "county", "state", "fips", "cases", "deaths",
    ]


def test_delta_to_delta_streaming_end_to_end(spark, tmp_path):
    """The reference's flagship shape — stream a Delta table into a Delta
    table — executed entirely jar-free: format("delta_log") source
    (version-paged offsets) → foreachBatch → DeltaLogTable sink with
    txn-based exactly-once. The jar-gated twin (`test_delta_e2e.py`)
    stays env-skipped; this one runs everywhere."""
    src = _table(
        spark, tmp_path / "src", [[(1, "a", 1)], [(2, "b", 2)], [(3, "c", 3)]]
    )
    dst = DeltaLogTable(str(tmp_path / "dst"))
    dst.create(SCHEMA)
    q = (
        spark.readStream.format("delta_log")
        .option("path", str(tmp_path / "src"))
        .load()
        .writeStream.foreachBatch(dst.foreach_batch("d2d"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rows(dst.read(spark)) == _rows(src.read(spark))
    assert dst.last_txn_version("d2d") >= 0
    # incremental: new source commits flow through on the next run
    src.append(_df(spark, [(4, "d", 4)]))
    q = (
        spark.readStream.format("delta_log")
        .option("path", str(tmp_path / "src"))
        .load()
        .writeStream.foreachBatch(dst.foreach_batch("d2d"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rows(dst.read(spark)) == _rows(src.read(spark))


def test_stream_composes_with_event_time_window(spark, tmp_path):
    """The delta_log stream is a first-class streaming DataFrame:
    watermark + tumbling window aggregate over it matches the batch
    aggregate of the same table."""
    from pyspark.sql import functions as F

    ts_schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("color", StringType(), True),
            StructField("score", IntegerType(), True),
        ]
    )
    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(ts_schema)
    for batch in ([(i, "a", i) for i in range(5)], [(i, "b", i) for i in range(5, 10)]):
        t.append(_df(spark, batch))

    def agg(df):
        return df.groupBy("color").agg(F.sum("score").alias("s"))

    q = (
        spark.readStream.format("delta_log")
        .option("path", str(tmp_path / "t"))
        .load()
        .transform(agg)
        .writeStream.format("memory")
        .queryName("dls_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.color: r.s for r in spark.table("dls_agg").collect()}
    want = {r.color: r.s for r in agg(t.read(spark)).collect()}
    assert got == want


# -- log-stats data skipping -------------------------------------------------

def _ranged_table(spark, path):
    """3 commits with disjoint sorted id ranges: 0-9, 10-19, 20-29."""
    t = DeltaLogTable(str(path))
    t.create(SCHEMA)
    for base in (0, 10, 20):
        t.append(_df(spark, [(base + i, "c", base + i) for i in range(10)]))
    return t


def test_add_actions_carry_minmax_stats(spark, tmp_path):
    import json as _json

    t = _ranged_table(spark, tmp_path / "t")
    stats = t.snapshot().file_stats()
    assert len(stats) == 3 and all(s is not None for s in stats.values())
    ids = sorted((s["minValues"]["id"], s["maxValues"]["id"]) for s in stats.values())
    assert ids == [(0, 9), (10, 19), (20, 29)]
    assert all(s["nullCount"]["id"] == 0 for s in stats.values())
    # stats survive log-checkpoint compaction
    t.checkpoint()
    import os as _os

    log = str(tmp_path / "t" / "_delta_log")
    for n in list(_os.listdir(log)):
        if n.endswith(".json") and n != f"{3:020d}.json":
            _os.remove(_os.path.join(log, n))
    again = DeltaLogTable(str(tmp_path / "t")).snapshot().file_stats()
    assert sorted(
        (s["minValues"]["id"], s["maxValues"]["id"]) for s in again.values()
    ) == ids


def test_push_filters_prunes_files(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThanOrEqual

    from pyspark_streaming_base_spark.sources.delta_log_stream import (
        PruningDeltaLogBatchReader,
    )

    _ranged_table(spark, tmp_path / "t")

    def planned(*filters):
        r = PruningDeltaLogBatchReader({"path": str(tmp_path / "t")})
        leftover = list(r.pushFilters(list(filters)))
        assert leftover == list(filters)  # Spark re-evaluates everything
        return len(r.partitions())

    assert planned() == 3
    assert planned(GreaterThan(("id",), 25)) == 1
    assert planned(LessThanOrEqual(("id",), 9)) == 1
    assert planned(EqualTo(("id",), 15)) == 1
    assert planned(EqualTo(("id",), 999)) == 0
    assert planned(In(("id",), (5, 25))) == 2
    # range conjunction
    assert planned(GreaterThan(("id",), 9), LessThanOrEqual(("id",), 19)) == 1
    # string stats prune too: color='c' in every file, so min/max proves
    # 'zzz' can't match anywhere, while 'c' keeps everything
    assert planned(EqualTo(("color",), "zzz")) == 0
    assert planned(EqualTo(("color",), "c")) == 3
    # genuinely unknown column (no stats, not a partition col): never prune
    assert planned(EqualTo(("no_such_col",), "zzz")) == 3


def test_push_filters_prunes_partitions(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo

    from pyspark_streaming_base_spark.sources.delta_log_stream import (
        PruningDeltaLogBatchReader,
    )

    t = DeltaLogTable(str(tmp_path / "t"))
    t.create(SCHEMA, partition_columns=["color"])
    t.append(_df(spark, [(1, "red", 1), (2, "blue", 2), (3, "red", 3)]))
    r = PruningDeltaLogBatchReader({"path": str(tmp_path / "t")})
    list(r.pushFilters([EqualTo(("color",), "red")]))
    parts = r.partitions()
    assert parts and all("color=red" in p.path for p in parts)


def test_filtered_scan_end_to_end_correct(spark, tmp_path):
    _ranged_table(spark, tmp_path / "t")
    df = spark.read.format("delta_log").option("path", str(tmp_path / "t")).load()
    got = sorted(r.id for r in df.filter("id >= 25 OR id = 3").collect())
    assert got == [3, 25, 26, 27, 28, 29]
    assert df.filter("id = 999").count() == 0


def test_delta_stream_replicates_into_upsert_mirror(spark, tmp_path):
    """Cross-engine CDC replication: the delta_log append stream feeds a
    keyed UpsertTable mirror through foreachBatch — the mirror converges
    to 'latest score per id' while the Delta source keeps full history.
    Links the two storage engines this package ships."""
    from pyspark.sql import functions as F

    from pyspark_streaming_base_spark.sinks.upsert import UpsertTable

    src = DeltaLogTable(str(tmp_path / "src"))
    src.create(SCHEMA)
    # id 1 gets three versions across commits; id 2 one; id 3 two
    src.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    src.append(_df(spark, [(1, "a", 11), (3, "c", 30)]))
    src.append(_df(spark, [(1, "a", 12), (3, "c", 31)]))

    mirror = UpsertTable(
        str(tmp_path / "mirror"), key_cols=["id"], seq_col="score", n_buckets=4
    )

    q = (
        spark.readStream.format("delta_log")
        .option("path", str(tmp_path / "src"))
        .load()
        .writeStream.foreachBatch(mirror.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.id: (r.color, r.score) for r in mirror.read(spark).collect()
    }
    assert got == {1: ("a", 12), 2: ("b", 20), 3: ("c", 31)}
    # source history is intact (the mirror is a VIEW, not a rewrite)
    assert src.read(spark).count() == 6


def test_batch_scan_nullfills_pre_evolution_files(spark, tmp_path):
    """Files committed before a column existed in the log schema
    null-fill it on read (additive-evolution contract) — built by
    hand-editing the log the way an external evolving writer would."""
    import json as _json
    import os as _os

    t = _table(spark, tmp_path / "t", [[(1, "red", 10)]])
    # simulate an external writer evolving the schema: append a metaData
    # action with an extra nullable column
    snap = t.snapshot()
    schema = _json.loads(snap.metadata["schemaString"])
    schema["fields"].append(
        {"name": "extra", "type": "long", "nullable": True, "metadata": {}}
    )
    log = tmp_path / "t" / "_delta_log"
    with open(log / f"{2:020d}.json", "w") as f:
        md = dict(snap.metadata)
        md["schemaString"] = _json.dumps(schema)
        f.write(_json.dumps({"metaData": md}) + "\n")

    df = spark.read.format("delta_log").option("path", str(tmp_path / "t")).load()
    rows = df.collect()
    assert [(r.id, r.color, r.score, r.extra) for r in rows] == [(1, "red", 10, None)]


def test_soak_fifty_plus_commits_with_restarts_and_cleanup(spark, tmp_path):
    """Soak (r4 verdict task 6): a delta_log stream is built for
    thousands of micro-batches, not the handful the unit tests drive.
    60 commits paged 2 versions per micro-batch through THREE checkpoint
    restarts, with a log checkpoint + clean_log() AND a compaction
    rewrite mid-soak. Asserts: exactly-once delivery of every row,
    monotone non-decreasing offset versions in the streaming checkpoint,
    zero stateful-operator rows (the feed is stateless), and monotone
    batch ids across restarts."""
    import json as _json
    from collections import Counter

    from pyspark_streaming_base_spark.sources.delta_log_stream import (
        DeltaLogStreamDataSource,
    )
    from pyspark_streaming_base_spark.streaming import ProgressCapture

    spark.dataSource.register(DeltaLogStreamDataSource)
    t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=25)
    t.create(SCHEMA)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    expected: Counter = Counter()
    next_id = 0

    def commit(n_rows=2):
        nonlocal next_id
        rows = [(next_id + j, "c", next_id + j) for j in range(n_rows)]
        next_id += n_rows
        t.append(_df(spark, rows))
        expected.update((i, "c", s) for (i, c, s) in rows)

    cap = ProgressCapture(maxlen=512).attach(spark)

    def drain():
        q = (
            spark.readStream.format("delta_log")
            .option("path", str(tmp_path / "t"))
            .option("max_versions_per_batch", "2")
            .load()
            .writeStream.format("parquet")
            .queryName("delta_soak")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        for _ in range(20):
            commit()
        drain()
        for _ in range(15):
            commit()
        # mid-soak maintenance: log checkpoint + retention + compaction.
        # The stream is DOWN at offset 20 with the log at 35 — retention
        # must respect consumer lag (retain >= 15) or the restart
        # legitimately dies with the documented below-horizon error
        # (same contract as real Delta's logRetentionDuration).
        t.checkpoint()
        t.clean_log(retain_versions=20)
        t.compact(spark, target_files=2)  # dataChange=false: invisible
        for _ in range(10):
            commit()
        drain()
        for _ in range(15):
            commit()
        drain()
    finally:
        cap.detach()

    assert next_id == 120  # 60 commits x 2 rows
    got = Counter(
        (r.id, r.color, r.score)
        for r in spark.read.schema(SCHEMA).parquet(out).collect()
    )
    assert got == expected  # exactly-once: nothing lost, nothing doubled

    # streaming-checkpoint offsets: one file per micro-batch, each holding
    # the last processed commit version — must be monotone non-decreasing
    import os as _os

    odir = _os.path.join(ck, "offsets")
    versions = []
    # skip .crc shadows and the .tmp files HDFSMetadataLog may leave
    for name in sorted((n for n in _os.listdir(odir) if n.isdigit()), key=int):
        with open(_os.path.join(odir, name)) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        off = _json.loads(lines[-1])
        versions.append(int(off["version"]))
    assert len(versions) >= 30  # 60 commits / 2 per batch, plus barriers
    assert versions == sorted(versions)
    assert versions[-1] == 61  # create=v0, 60 appends=v1..60, compact=v61

    # Listener evidence is SUPPLEMENTARY (progress events are delivered
    # async and Spark's listener bus may drop under load — observed once
    # in a full-suite run): assert consistency of whatever was captured;
    # the sink Counter and checkpoint offsets above carry the hard
    # exactly-once guarantees.
    import time as _time

    deadline = _time.time() + 10
    rows = cap.snapshot("delta_soak")
    while not rows and _time.time() < deadline:
        _time.sleep(0.2)
        rows = cap.snapshot("delta_soak")
    assert rows, "listener captured no progress within 10s"
    batch_ids = [r["batchId"] for r in rows]
    assert batch_ids == sorted(batch_ids)
    assert all(r["stateRows"] == 0 for r in rows)  # stateless feed
    # no over-delivery: the compaction rewrite contributed no input rows
    # (<= because dropped events can only lower the captured sum)
    assert sum(r["numInputRows"] for r in rows) <= 120
