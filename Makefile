# qwen3-tts-tpu developer targets (reference: Makefile)

PY ?= python

.PHONY: test test-fast native bench bench-e2e bench-micro audit variants clean

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x -m "not slow"

native:
	$(MAKE) -C native

bench: native
	$(PY) bench.py

bench-e2e: native
	$(PY) benches/e2e_bench.py --size 1.7B --json BENCH_e2e_1p7b.json

bench-micro: native
	$(PY) benches/micro_bench.py

audit:
	$(PY) scripts/audit_host_syncs.py

variants:
	$(PY) scripts/test_variants.py

profile-trace:
	$(PY) -m qwen3_tts_tpu --model-dir $(MODEL_DIR) --text "profile me" \
		--profile /tmp/qwen3_tts_trace
	@echo "open /tmp/qwen3_tts_trace with TensorBoard profile plugin or perfetto"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
