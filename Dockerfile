# qwen3-tts-tpu runtime image.
#
# For Cloud TPU VMs: the libtpu-enabled jax wheel targets the host TPU
# runtime. For CPU-only smoke tests, build with --build-arg JAX_FLAVOR=cpu.

FROM python:3.12-slim

ARG JAX_FLAVOR=tpu

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && \
    rm -rf /var/lib/apt/lists/*

RUN if [ "$JAX_FLAVOR" = "tpu" ]; then \
        pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    else \
        pip install --no-cache-dir "jax[cpu]"; \
    fi && \
    pip install --no-cache-dir numpy tokenizers safetensors huggingface_hub

WORKDIR /app
COPY qwen3_tts_tpu ./qwen3_tts_tpu
COPY native ./native
COPY bench.py benches ./
RUN make -C native

ENTRYPOINT ["python", "-m", "qwen3_tts_tpu"]
