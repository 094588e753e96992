"""Plan-lint gate: run ``plans/lint.py`` over every registry query and
report findings; exits 1 if any ERROR-tier finding survives.

Usage: python tools/lint_plans.py [sf_dir]     (default sf0.001 — the
linter only needs plans, not data volume)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark_streaming_base_spark.plans.lint import errors, lint  # noqa: E402
from pyspark_streaming_base_spark.queries import load_all  # noqa: E402
from pyspark_streaming_base_spark.session import SessionFactory  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory.local(app_name="lint", shuffle_partitions=8)
    n_err = 0
    for name, spec in load_all().items():
        try:
            findings = lint(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: lint failed: {e}")
            n_err += 1
            continue
        for f in findings:
            tag = "ERROR" if f.severity == "error" else "warn "
            print(f"{tag} {name}: {f.rule} — {f.detail}")
        n_err += len(errors(findings))
        if not findings:
            print(f"ok   {name}")
    print()
    if n_err:
        print(f"{n_err} error-tier findings")
        return 1
    print("no error-tier findings")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
