# Developer workflow targets (reference analog: its Makefile's
# format / bench / profile targets).

PY ?= python

.PHONY: test test-fast bench bench-all bench-native format lint dryrun golden

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# Headline metric on the real TPU (one JSON line).
bench:
	$(PY) bench.py

# Full registry (stderr lines mirror the reference bench names).
bench-all:
	$(PY) bench.py --all

# Native host engine single-core numbers (reference bench_cpu shapes).
bench-native:
	JAX_PLATFORMS=cpu PYTHONPATH=. $(PY) scripts/bench_native.py

lint:
	$(PY) -m ruff check fss_tpu tests samples 2>/dev/null || true

# Multi-chip sharding validation on a virtual CPU mesh.
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Regenerate golden vectors from the actual reference code (g++ + shim).
golden:
	$(MAKE) -C tests/golden
