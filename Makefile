# Developer entry points. All gates run on the preinstalled toolchain —
# no network access assumed.

.PHONY: test correctness bench lint plan-lint install smoke

test:
	python -m pytest tests/ -q

correctness:
	python tools/check_correctness.py

bench:
	python bench.py 2>/dev/null | tail -1

lint:
	@command -v ruff >/dev/null 2>&1 && ruff check pyspark_streaming_base_spark tests tools \
		|| echo "ruff not installed; skipping"

plan-lint:
	python tools/lint_plans.py

install:
	# normal toolchains: pip install -e .  — this container lacks the
	# `wheel` package PEP 660 needs, so fall back to the egg-info path
	pip install -e . --no-build-isolation --no-deps 2>/dev/null \
		|| python setup.py develop --no-deps

smoke:
	python -c "from pyspark_streaming_base_spark.app.streaming_app import StreamingApp; print('ok')"
