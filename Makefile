# qwen3-tts-tpu developer targets (reference: Makefile)

PY ?= python

.PHONY: test test-fast native bench bench-e2e bench-micro audit variants parity parity-drill clean

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

render-docs:
	$(PY) scripts/render_bench_docs.py

variants:
	$(PY) scripts/test_variants.py

# Tier-3 validation, one command (VERDICT r1 item 2): torch-oracle golden
# dump -> golden tests -> quality check -> variant matrix. Needs MODEL_DIR
# pointing at a real checkpoint. QC_FLAGS/CLI_FLAGS exist for the synthetic
# drill below (random weights can't meet the production audio gates).
QC_FLAGS ?=
CLI_FLAGS ?=
parity: native
	@test -n "$(MODEL_DIR)" || (echo "usage: make parity MODEL_DIR=/path/to/ckpt"; exit 1)
	$(PY) scripts/dump_reference_values.py --model-dir $(MODEL_DIR) --seed 42
	$(PY) -m pytest tests/test_reference_golden.py -q
	$(PY) -m qwen3_tts_tpu --model-dir $(MODEL_DIR) --text "parity check run" \
		--seed 42 --output /tmp/parity_check.wav $(CLI_FLAGS)
	$(PY) scripts/quality_check.py /tmp/parity_check.wav $(QC_FLAGS)
	$(PY) scripts/test_variants.py --ckpt $(MODEL_DIR)
	$(PY) scripts/quant_report.py --model-dir $(MODEL_DIR) --out /tmp/quant_report.json

# Serving-config parity matrix: {solo, mesh} x {bf16, int8, w8a8} through
# from_pretrained on a checkpoint (virtual CPU mesh). Runs at tiny synthetic
# dims in the drill; for a REAL checkpoint run it with a small --frames
# budget (XLA:CPU compiles at 1.7B dims take ~15 min per program — see
# docs/VALIDATION.md).
parity-matrix:
	@test -n "$(MODEL_DIR)" || (echo "usage: make parity-matrix MODEL_DIR=/path/to/ckpt"; exit 1)
	$(PY) scripts/parity_matrix.py --model-dir $(MODEL_DIR)

# Checkpoint-landing drill: prove the full `make parity` chain end-to-end on
# a synthetic checkpoint (CPU; lenient audio gates since the weights are
# random noise), then the serving-config matrix. CI-runnable with no
# checkpoint or TPU access.
parity-drill: native
	$(PY) scripts/make_synthetic_ckpt.py --out /tmp/qwen3_synth_ckpt
	QWEN3_TTS_PLATFORM=cpu $(MAKE) parity MODEL_DIR=/tmp/qwen3_synth_ckpt \
		CLI_FLAGS="--min-new-tokens 12 --frames 24" \
		QC_FLAGS="--min-rms 0 --max-clipping 1 --max-leading-silence 99 --max-dc 1"
	$(MAKE) parity-matrix MODEL_DIR=/tmp/qwen3_synth_ckpt

profile-trace:
	$(PY) -m qwen3_tts_tpu --model-dir $(MODEL_DIR) --text "profile me" \
		--profile /tmp/qwen3_tts_trace
	@echo "open /tmp/qwen3_tts_trace with TensorBoard profile plugin or perfetto"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
