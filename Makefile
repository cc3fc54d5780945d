# Developer entry points (reference parity: Makefile test/bench targets)

PY ?= python

.PHONY: test bench bench-continuous native tables clean

test:
	$(PY) -m pytest tests/ -x -q

native:
	$(PY) -c "from pynbodyext_tpu.gravity._native import ensure_built; print(ensure_built())"

tables:
	$(PY) tools/gen_multipole.py

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
