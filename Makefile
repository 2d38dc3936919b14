# Developer workflow targets (reference analog: its Makefile's
# format / bench / profile targets).

PY ?= python

.PHONY: test test-fast test-smoke bench bench-all bench-native bench-ref \
        asan format lint dryrun golden verify-tpu docs scaling

test:
	$(PY) -m pytest tests/ -q

# Smoke tier: always finishes in <5 min even with a COLD compile cache
# (no large XLA:CPU crypto graphs: block packing, group algebra, wire
# validation, cuckoo tables). Use when iterating on plumbing.
test-smoke:
	$(PY) -m pytest tests/test_block.py tests/test_groups.py \
	  tests/test_crypto_validation.py -q -x

# Iteration default: skip the slow full-domain/native-build tiers.
# Wall time is dominated by XLA:CPU compiles and therefore by the
# persistent compile cache (.jax_cache): measured on this 1-core VM,
# ~41 min cold vs minutes warm (full suite ~30 min warm). The tier's
# value is -x plus skipping the native build, not a fixed speedup.
test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# Headline metric on the real TPU (one JSON line). Gated on a golden-vector
# byte check of the hot kernels ON the device (scripts/verify_tpu.py).
bench:
	$(PY) bench.py

# Full registry (stderr lines mirror the reference bench names).
bench-all:
	$(PY) bench.py --all

# Multi-device scaling-efficiency proxy on the virtual CPU mesh
# (BASELINE.md target 3; scripts/artifacts/scaling_cpu.json). On a real
# pod slice use: python scripts/scaling_bench.py --tpu-pod
scaling:
	$(PY) scripts/scaling_bench.py

# Native host engine single-core numbers (reference bench_cpu shapes).
bench-native:
	JAX_PLATFORMS=cpu PYTHONPATH=. $(PY) scripts/bench_native.py

# AddressSanitizer soak of the native engine (builds an instrumented .so).
asan:
	$(PY) scripts/asan_soak.py 15

# The REFERENCE's own bench_cpu.cu compiled via the golden shim and run on
# THIS machine — the same-silicon baseline for every native speed claim.
bench-ref:
	$(MAKE) -C scripts/ref_bench run

# Byte-exact golden-vector check of every fused Mosaic kernel family on
# the real TPU (tests force CPU; this is the only on-chip correctness gate).
verify-tpu:
	PYTHONPATH=. $(PY) scripts/verify_tpu.py

# Strict (no || true): fails the target on findings. Falls back to a
# syntax-level compile check when ruff isn't installed locally (CI always
# has ruff and runs it strict).
lint:
	@if command -v ruff >/dev/null 2>&1; then \
	  ruff check fss_tpu tests samples scripts bench.py __graft_entry__.py; \
	else \
	  echo "lint: ruff not installed; running py_compile syntax check"; \
	  $(PY) -m py_compile $$(git ls-files '*.py'); \
	fi

# Multi-chip sharding validation on a virtual CPU mesh.
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Regenerate golden vectors from the actual reference code (g++ + shim).
golden:
	$(MAKE) -C tests/golden

# Generated API documentation from docstrings (reference analog: its
# Doxygen CI job; pdoc/mkdocs are not in this environment, so the
# generator is a small checked-in script).
docs:
	PYTHONPATH=. $(PY) scripts/build_docs.py docs/api
