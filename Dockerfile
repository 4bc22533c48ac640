# UnMICST-TPU container (reference packaging parity: Dockerfile:1-6 builds a
# TF GPU image + pip deps + S3 checkpoint fetch; here the base is a JAX TPU
# image and the same two v2 checkpoints are fetched for the zoo).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends curl g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY unmicst_tpu ./unmicst_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[tpu]" flax optax numpy scipy pillow zstandard \
    && pip install --no-cache-dir . \
    && python native/build.py

# model files churn; copy after the expensive layers to keep them cached
COPY models ./models

# Model zoo: sidecars + checkpoint indexes come from the upstream repo;
# the two large v2 data blobs come via `--fetchModels`, which carries
# the CORRECT S3 keys (unmicst1-5/unmicst2, NOT the model-dir names —
# reference Dockerfile:4-5; the registry in models/zoo.py is the single
# source of truth and is regression-tested against the reference
# Dockerfile's URLs).  Fails fast if unavailable, like `curl -f`.
ARG UPSTREAM=https://raw.githubusercontent.com/HMS-IDAC/UnMicst/master/models
RUN set -e; \
    for m in nucleiDAPILAMIN nucleiDAPI1-5; do \
        mkdir -p models/$m; \
        for f in hp.data datasetMean.data datasetStDev.data model.ckpt.index; do \
            curl -f -o "models/$m/$f" "$UPSTREAM/$m/$f"; \
        done; \
    done; \
    unmicst-tpu --fetchModels --modelRoot models

ENV UNMICST_TPU_MODEL_ROOT=/app/models
ENTRYPOINT ["unmicst-tpu"]
