# TPU-native industrial QC vision system — container build.
#
# Reference parity: the upstream ships a 5-stage CUDA 11.8 build running
# gunicorn+eventlet (Dockerfile:1-145). The TPU equivalent targets a Cloud
# TPU VM base: JAX wheels with the libtpu runtime, the stdlib-WSGI serving
# stack (no gunicorn dependency needed — the app is thread-per-request and
# the device work is a single batched program), ports 5000 (API/dashboard)
# and 9090 (Prometheus metrics).

# ---- base: python + jax[tpu] ------------------------------------------------
FROM python:3.12-slim AS base

ENV PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential curl libjpeg62-turbo-dev && \
    rm -rf /var/lib/apt/lists/*

# JAX with the TPU runtime (libtpu comes from the jax[tpu] extra)
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install flax optax orbax-checkpoint chex einops numpy pillow pyyaml

# ---- app --------------------------------------------------------------------
FROM base AS app
WORKDIR /app
COPY iqc_tpu/ iqc_tpu/
COPY scripts/ scripts/
COPY config/ config/
COPY pyproject.toml bench.py ./

# build the native serving runtime (batching queue / rate limiter / histogram)
RUN make -C iqc_tpu/runtime/cpp

# initialize model weights if none are mounted (production mounts real ones)
RUN python scripts/prepare_models.py init --output-dir models || true

# ---- production ---------------------------------------------------------------
# Process model: ONE worker on TPU (the chip admits one client process;
# request concurrency = threaded WSGI server + the batch-coalescing device
# queue, which replaces the reference's gunicorn x4 process fan-out).
# CPU-only/demo deployments may add --workers N for preforked SO_REUSEPORT
# workers with supervisor restart (serving/app.py:_supervise_workers).
FROM app AS production
ENV IQC_CONFIG=/app/config/config.yaml
EXPOSE 5000 9090
HEALTHCHECK --interval=30s --timeout=10s --retries=3 \
    CMD curl -sf http://localhost:5000/health || exit 1
CMD ["python", "-m", "iqc_tpu.serving.app", "--config", "/app/config/config.yaml", "--workers", "1"]

# ---- dev ----------------------------------------------------------------------
FROM app AS dev
RUN pip install pytest pytest-benchmark
CMD ["bash"]
