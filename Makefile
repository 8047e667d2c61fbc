# CI-style entry points (VERDICT r1 #9).
#
# test      — the full non-slow suite on the virtual 8-device CPU mesh
#             (tests/conftest.py forces jax_platforms=cpu).
# test-all  — includes the two @pytest.mark.slow end-to-end CLI tests
#             (subprocess train -> export -> sample flows, ~10 min).
# dryrun    — the driver's multi-chip sharding check (self-provisions a
#             virtual mesh when real devices are insufficient).
# bench     — the headline benchmark on the real TPU chip; prints one JSON
#             line. Do not run concurrently with tests (exclusive chip).

PY ?= python

.PHONY: test test-all dryrun bench bench-smoke native

test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

bench:
	$(PY) bench.py

# bench-smoke — the whole bench pipeline (int8 headline + exact control +
# max serving stack in one JSON line) on CPU with the EMNIST preset; no
# TPU required. Numbers are meaningless on CPU — this checks plumbing.
bench-smoke:
	JAX_PLATFORMS=cpu BENCH_PRESET=EMNIST BENCH_STEPS=6 BENCH_BATCH=4 \
	BENCH_RUNS=1 $(PY) bench.py

native:
	$(PY) -c "from nicediffusion_tpu.training.native_loader import _build_lib; print(_build_lib())"
