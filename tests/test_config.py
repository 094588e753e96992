"""ConfigResolver unit tests — three-tier precedence + reference-quirk fixes
(reference test style: tests/test_streaming_app.py, option-wiring tests).
"""

from __future__ import annotations

from pyspark_streaming_base_spark.config import ConfigResolver


def test_default_tier():
    r = ConfigResolver(prefix="spark.app.x.options", defaults={"a": "1"})
    assert r.get("a") == "1"
    assert r.resolve() == {"a": "1"}


def test_override_beats_default():
    r = ConfigResolver(prefix="p", defaults={"a": "1"}, overrides={"a": "2"})
    assert r.get("a") == "2"


def test_runtimeconf_between_default_and_override(spark):
    key = "spark.app.testsrc.options.a"
    spark.conf.set(key, "rc")
    try:
        r = ConfigResolver(prefix="spark.app.testsrc.options", defaults={"a": "1"})
        assert r.get("a", session=spark) == "rc"
        r2 = ConfigResolver(
            prefix="spark.app.testsrc.options", defaults={"a": "1"}, overrides={"a": "ov"}
        )
        assert r2.get("a", session=spark) == "ov"
    finally:
        spark.conf.unset(key)


def test_empty_string_counts_as_unset(spark):
    # reference semantics: sources/delta_source.py:104-108
    key = "spark.app.testsrc2.options.b"
    spark.conf.set(key, "")
    try:
        r = ConfigResolver(prefix="spark.app.testsrc2.options", defaults={"b": "dflt"})
        assert r.get("b", session=spark) == "dflt"
    finally:
        spark.conf.unset(key)


def test_instances_do_not_share_state():
    # fixes reference quirk 2.5.1 (class-level dict mutation)
    r1 = ConfigResolver(prefix="p", defaults={"a": "1"})
    r2 = ConfigResolver(prefix="p", defaults={"a": "1"})
    r1.with_override("a", "changed")
    assert r2.get("a") == "1"


def test_none_values_dropped():
    r = ConfigResolver(prefix="p", defaults={"a": "1"}, overrides={"b": None})
    assert "b" not in r.resolve()
    r.with_override("a", None)
    assert r.get("a") == "1"  # override removed → default visible again
