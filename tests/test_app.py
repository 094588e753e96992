"""App/StreamingApp lifecycle tests (reference style:
tests/test_streaming_app.py — checkpoint path math + config freeze).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark_streaming_base_spark.app import App, StreamingApp


def _clear(spark, *keys):
    for k in keys:
        try:
            spark.conf.unset(k)
        except Exception:
            pass


def test_checkpoint_location_with_version(spark):
    app = StreamingApp(session=spark)
    app.with_config(
        {
            "spark.app.name": "myapp",
            "spark.app.checkpoints.path": "/tmp/ckpt",
            "spark.app.checkpoints.version": "v7",
        }
    ).initialize()
    try:
        # exact reference rule: {base}/{name}/{version}/_checkpoints
        assert app.checkpoint_location() == Path("/tmp/ckpt/myapp/v7/_checkpoints")
    finally:
        _clear(spark, "spark.app.checkpoints.path", "spark.app.checkpoints.version")


def test_checkpoint_location_stable_fallback(spark):
    # reference: missing version → "stable" segment (app/streaming_app.py:56)
    app = StreamingApp(session=spark)
    app.with_config(
        {"spark.app.name": "app2", "spark.app.checkpoints.path": "/tmp/ckpt"}
    ).initialize()
    try:
        assert app.checkpoint_location() == Path("/tmp/ckpt/app2/stable/_checkpoints")
    finally:
        _clear(spark, "spark.app.checkpoints.path")


def test_legacy_checkpoint_version_honored(spark):
    # quirk 2.5.3: reference reads singular key; we honor it with a warning
    app = StreamingApp(session=spark)
    app.with_config(
        {
            "spark.app.name": "app3",
            "spark.app.checkpoints.path": "/tmp/ckpt",
            "spark.app.checkpoint.version": "legacy1",
        }
    ).initialize()
    try:
        assert app.checkpoint_version() == "legacy1"
    finally:
        _clear(spark, "spark.app.checkpoints.path", "spark.app.checkpoint.version")


def test_conflicting_versions_raise(spark):
    app = StreamingApp(session=spark)
    app.with_config(
        {
            "spark.app.name": "app4",
            "spark.app.checkpoints.path": "/tmp/ckpt",
            "spark.app.checkpoints.version": "v1",
            "spark.app.checkpoint.version": "v2",
        }
    ).initialize()
    try:
        with pytest.raises(ValueError, match="conflicting"):
            app.checkpoint_version()
    finally:
        _clear(
            spark,
            "spark.app.checkpoints.path",
            "spark.app.checkpoints.version",
            "spark.app.checkpoint.version",
        )


def test_with_config_raises_after_initialize(spark):
    # reference contract: app/app.py:95-96; tests/test_streaming_app.py:23-26
    app = App(session=spark)
    app.initialize()
    with pytest.raises(RuntimeError):
        app.with_config({"spark.app.name": "nope"})


def test_constructor_config_auto_initializes(spark):
    # reference entry point 2 (app/app.py:80-83)
    app = App(session=spark, app_config={"spark.app.name": "autoinit"})
    assert app.is_initialized
    assert app.name == "autoinit"


def test_initialize_returns_self(spark):
    # fixes reference quirk 2.5.8 (App.initialize forgets return self)
    app = App(session=spark)
    assert app.initialize() is app


def test_typed_accessor_mismatch_raises(spark):
    # reference: RuntimeError on wrong-typed accessor
    # (tests/test_delta_streaming_source.py:42-43)
    app = StreamingApp(session=spark).initialize()
    app.with_file_source(config={"path": "/tmp/x"})
    with pytest.raises(RuntimeError, match="not a"):
        app.kafka_source()
    assert app.file_source() is app.source()
