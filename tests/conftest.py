"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from pyspark_streaming_base_spark.session import SessionFactory  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = SessionFactory.local(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(params=["symlink", "manifest"])
def pointer_mode(request):
    """Run a persisted-index lifecycle test under BOTH generation-pointer
    modes (``operators/tombstones.py::set_pointer_mode``): the local-FS
    symlink and the object-store manifest file. Tests that take this
    fixture prove the whole swap/retention/read_live protocol is
    pointer-kind-agnostic."""
    from pyspark_streaming_base_spark.operators.tombstones import set_pointer_mode

    prev = set_pointer_mode(request.param)
    yield request.param
    set_pointer_mode(prev)
