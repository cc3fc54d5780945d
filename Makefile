# Developer entry points (reference parity: Makefile test/bench targets)

PY ?= python

.PHONY: test test-full lint bench bench-continuous native tables clean

test:
	$(PY) -m pytest tests/ -x -q

# include the @pytest.mark.slow interpret-mode kernel / mesh suites
test-full:
	$(PY) -m pytest tests/ -x -q -m "slow or not slow"

# lint gate (reference parity: ruff + mypy pre-commit hooks); falls back
# to the bundled AST linter when ruff/mypy are not installed
lint:
	@command -v ruff >/dev/null && ruff check pynbodyext_tpu/ || true
	@command -v mypy >/dev/null && mypy --config-file=pyproject.toml pynbodyext_tpu/ || true
	$(PY) tools/lint_fallback.py

native:
	$(PY) -c "from pynbodyext_tpu.gravity._native import ensure_built; print(ensure_built())"

tables:
	$(PY) tools/gen_multipole.py
	$(PY) tools/gen_hilbert.py

bench:
	$(PY) bench.py

# regression gate: fail if the headline metric regressed by >10%
# against a recorded baseline (reference Makefile:93-99, FACTOR=1.10)
FACTOR ?= 1.10
BASE_JSON ?= BENCH_baseline.json
bench-continuous:
	$(PY) benchmarks/gate.py --factor $(FACTOR) --baseline $(BASE_JSON)

clean:
	rm -f pynbodyext_tpu/gravity/_native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
