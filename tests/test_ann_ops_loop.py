"""The advertised "monitor → retune → retrain" ANN operations loop,
composed END TO END on one persisted IVF index (r11 verdict item 7 —
every stage existed and was individually tested; this walks the whole
runbook and asserts each stage's DECISION):

1. build + drift baseline + `tune_nprobe` → an operating point
   (``met=True``) with a recall-monotone sweep;
2. an in-distribution day batch: `drift_report` clean → append +
   baseline merge; a takedown delete trips the auto-compaction hook, so
   the index rotates behind a generation pointer mid-loop (the
   tombstone/compact lifecycle the later stages must read through);
3. the embedding model changes: `drift_report` trips on the shifted
   batch → the batch is NOT appended;
4. `tune_nprobe` against ground truth from the NEW embedding space
   returns ``met=False`` at full probe — retuning alone cannot serve a
   re-embedded world from a stale-space index, which is exactly the
   rebuild signal its docstring assigns to ``met=False``;
5. rebuild in the new space (the build path tears down the pointer
   layout + stale tombstones), fresh baseline, retune → ``met=True``
   again and the monitor is clean for new-space batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.vectorops import dvec
from pyspark_streaming_base_spark.operators.drift import (
    drift_report,
    merge_drift_baseline,
    write_drift_baseline,
)
from pyspark_streaming_base_spark.operators.ivf import (
    append_ivf_index,
    build_ivf_index,
    delete_from_ivf_index,
    query_ivf_index,
    tune_nprobe,
)

SF = "/root/testdata/sf0.001"


def _reembed(df, vcol="vec"):
    """The 'new embedding model': reversed components + affine shift.
    Two properties, each needed by a different stage: the affine 3x+1
    SHIFTS the component distribution (what the drift monitor sees —
    reversal alone permutes iid dims and is statistically invisible to
    a distribution monitor, verified while writing this test), and the
    reversal scrambles the cosine GEOMETRY so stale-index recall
    against new-space truth collapses (what makes retuning futile)."""
    return df.select(
        "vec_id",
        F.transform(F.reverse(vcol), lambda x: x * 3.0 + 1.0).alias(vcol),
    )


def _new_space_truth(spark, corpus, queries, top_k=10):
    """Brute-force cosine top-k in the NEW space — the shared rounded-
    cosine / vec_id tie-break (the q60 rule, same as tune_nprobe's
    self-derived truth)."""
    from pyspark.sql import Window as W

    from pyspark_streaming_base_spark.functions.vectorops import cosine

    sim = F.round(cosine(F.col("qvec"), F.col("vec")), 6)
    return (
        F.broadcast(queries)
        .join(corpus, F.col("vec_id") != F.col("qid"))
        .withColumn("sim_r", sim)
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("sim_r").desc(), F.col("vec_id"))
            ),
        )
        .filter(F.col("rnk") <= top_k)
        .select("qid", "vec_id")
    )


def test_monitor_retune_retrain_loop(spark, tmp_path):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", dvec("embedding").alias("vec"))
        .localCheckpoint(eager=True)
    )
    path = str(tmp_path / "idx")

    # ---- stage 1: build, baseline, initial operating point
    build_ivf_index(emb, path, k=8)
    write_drift_baseline(spark, path, emb.select("vec_id", F.col("vec").alias("v")))
    panel = emb.filter(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    t0 = tune_nprobe(spark, path, panel, top_k=10, recall_floor=0.9)
    assert t0["met"], t0
    recalls = [r for _, r in t0["sweep"]]
    assert recalls == sorted(recalls)  # monotone in nprobe

    # ---- stage 2: clean day batch appends; a takedown rotates the
    # index behind a generation pointer via the compaction hook
    day1 = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "vec"
    )
    r1 = drift_report(
        spark, path, day1.select("vec_id", F.col("vec").alias("v"))
    ).collect()[0]
    assert not r1.drifted
    append_ivf_index(spark, path, day1)
    merge_drift_baseline(
        spark, path, day1.select("vec_id", F.col("vec").alias("v")), segment="day1"
    )
    # ordered pick: limit(3) alone is plan-dependent, a failure here
    # would not reproduce deterministically across runs
    gone = [r.vec_id for r in day1.orderBy("vec_id").limit(3).collect()]
    delete_from_ivf_index(spark, path, gone, compact_ratio=0.0)  # always compact
    import os

    ap = f"{path}/assignments"
    # the compaction rotated the table behind a generation pointer
    # (symlink or manifest file — never a plain directory again)
    assert os.path.islink(ap) or os.path.isfile(ap)
    got = query_ivf_index(spark, path, panel, nprobe=t0["nprobe"], top_k=10)
    assert got.filter(F.col("vec_id").isin(gone)).count() == 0  # takedown holds

    # ---- stage 3: embedding model changes — the monitor TRIPS and the
    # shifted batch is not appended
    day2_v = _reembed(
        emb.select((F.col("vec_id") + 600_000).alias("vec_id"), "vec")
    ).select("vec_id", F.col("vec").alias("v"))
    r2 = drift_report(spark, path, day2_v).collect()[0]
    assert r2.drifted

    # ---- stage 4: retune against NEW-space truth — even full probe
    # cannot meet the floor (met=False IS the rebuild signal)
    new_corpus = _reembed(emb).localCheckpoint(eager=True)
    new_panel = _reembed(
        panel.select(F.col("qid").alias("vec_id"), F.col("qvec").alias("vec"))
    ).select(F.col("vec_id").alias("qid"), F.col("vec").alias("qvec"))
    truth_new = _new_space_truth(spark, new_corpus, new_panel).localCheckpoint(
        eager=True
    )
    t1 = tune_nprobe(
        spark, path, new_panel, top_k=10, recall_floor=0.9, truth=truth_new
    )
    assert not t1["met"], t1
    assert t1["sweep"][-1][0] >= 8  # the sweep genuinely reached full probe

    # ---- stage 5: retrain + rebuild in the new space (build tears down
    # the pointer layout and stale tombstones), fresh baseline, retune
    build_ivf_index(new_corpus, path, k=8)
    write_drift_baseline(
        spark, path, new_corpus.select("vec_id", F.col("vec").alias("v"))
    )
    t2 = tune_nprobe(
        spark, path, new_panel, top_k=10, recall_floor=0.9, truth=truth_new
    )
    assert t2["met"], t2
    day3 = _reembed(
        emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 700_000).alias("vec_id"), "vec"
        )
    ).select("vec_id", F.col("vec").alias("v"))
    assert not drift_report(spark, path, day3).collect()[0].drifted


def test_streaming_crawl_gate_quarantines_drifted_batch(spark, tmp_path):
    """r12 verdict item 7: the same monitor→append loop, run in the
    DEPLOYMENT MODE the runbook describes — a foreachBatch stream over
    day files. Per micro-batch: `drift_report` against the persisted
    baseline; clean batches append to the live index (generation-pointer
    read path) and merge into the baseline; a drifted batch is
    QUARANTINED to a side table and never touches index or baseline.
    Decisions asserted batch by batch, and the loop's downstream
    decisions are unchanged by streaming: the post-drain monitor is
    still clean for in-distribution data, the quarantine holds exactly
    the drifted day, the live index holds exactly base + clean days,
    and `tune_nprobe` still reaches its operating point (met=True)."""
    import time as _time

    from pyspark_streaming_base_spark.operators.tombstones import read_live

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", dvec("embedding").alias("vec"))
        .localCheckpoint(eager=True)
    )
    path = str(tmp_path / "idx")
    build_ivf_index(emb, path, k=8)
    write_drift_baseline(spark, path, emb.select("vec_id", F.col("vec").alias("v")))

    day1 = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "vec"
    )
    day2 = _reembed(  # the model-change day: MUST be quarantined
        emb.filter(F.col("vec_id") % 3 == 0).select(
            (F.col("vec_id") + 600_000).alias("vec_id"), "vec"
        )
    )
    day3 = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 700_000).alias("vec_id"), "vec"
    )
    staging = str(tmp_path / "days")
    for day in (day1, day2, day3):
        day.coalesce(1).write.mode("append").parquet(staging)
        _time.sleep(1.1)  # mod-time order = batch order at 1 file/trigger

    quarantine = str(tmp_path / "quarantine")
    decisions: list = []  # foreachBatch runs on the driver

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        rep = drift_report(
            spark, path, batch_df.select("vec_id", F.col("vec").alias("v"))
        ).collect()[0]
        if rep.drifted:
            batch_df.write.mode("append").parquet(quarantine)
            decisions.append("quarantined")
        else:
            append_ivf_index(spark, path, batch_df)
            merge_drift_baseline(
                spark,
                path,
                batch_df.select("vec_id", F.col("vec").alias("v")),
                segment=f"batch{batch_id}",
            )
            decisions.append("appended")

    q = (
        spark.readStream.schema(day1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    # per-batch decisions, in arrival order
    assert decisions == ["appended", "quarantined", "appended"]
    # the quarantine holds exactly the drifted day
    qids = {r.vec_id for r in spark.read.parquet(quarantine).collect()}
    assert qids == {r.vec_id for r in day2.select("vec_id").collect()}
    # the live index holds exactly base + clean days (generation-pointer
    # read path, the invariant-8 rule), and nothing from the drifted day
    live = {
        r.vec_id
        for r in read_live(spark, f"{path}/assignments")
        .select("vec_id")
        .collect()
    }
    want = {r.vec_id for r in emb.select("vec_id").collect()}
    want |= {r.vec_id for r in day1.select("vec_id").collect()}
    want |= {r.vec_id for r in day3.select("vec_id").collect()}
    assert live == want
    # loop decisions unchanged by streaming: monitor clean for a fresh
    # in-distribution batch against the MERGED baseline...
    day4 = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 800_000).alias("vec_id"),
        F.col("vec").alias("v"),
    )
    assert not drift_report(spark, path, day4).collect()[0].drifted
    # ...and the operating point still holds on the grown index
    panel = emb.filter(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    t = tune_nprobe(spark, path, panel, top_k=10, recall_floor=0.9)
    assert t["met"], t
