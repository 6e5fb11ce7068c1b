# qwen3-tts-tpu developer targets (reference: Makefile)

PY ?= python

.PHONY: test test-fast native bench bench-e2e bench-micro audit variants parity clean

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

# Tier-3 validation, one command (VERDICT r1 item 2): torch-oracle golden
# dump -> golden tests -> quality check -> variant matrix. Needs MODEL_DIR
# pointing at a real checkpoint.
parity: native
	@test -n "$(MODEL_DIR)" || (echo "usage: make parity MODEL_DIR=/path/to/ckpt"; exit 1)
	$(PY) scripts/dump_reference_values.py --model-dir $(MODEL_DIR) --seed 42
	$(PY) -m pytest tests/test_reference_golden.py -q
	$(PY) -m qwen3_tts_tpu --model-dir $(MODEL_DIR) --text "parity check run" \
		--seed 42 --output /tmp/parity_check.wav
	$(PY) scripts/quality_check.py /tmp/parity_check.wav
	$(PY) scripts/test_variants.py --ckpt $(MODEL_DIR)
	$(PY) scripts/quant_report.py --model-dir $(MODEL_DIR) --out /tmp/quant_report.json

profile-trace:
	$(PY) -m qwen3_tts_tpu --model-dir $(MODEL_DIR) --text "profile me" \
		--profile /tmp/qwen3_tts_trace
	@echo "open /tmp/qwen3_tts_trace with TensorBoard profile plugin or perfetto"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
