# Reproducible build + test environment for a3gc_tpu.
#
# The reference ships a CUDA/torch Dockerfile (ref: Dockerfile:1); this is
# the TPU-native counterpart: it reproduces the validated Python stack
# (requirements.lock), builds the wheel, and runs the CPU test suite on an
# 8-virtual-device mesh — the same configuration every sharding/parallel
# test in tests/ runs under. No GPU/TPU is needed to BUILD or TEST; at
# deployment, install the matching TPU jaxlib plugin for your runtime
# (e.g. `pip install jax[tpu]==0.9.0` on a Cloud TPU VM) in place of the
# CPU jaxlib.
#
#   docker build -t a3gc-tpu .
#   docker run --rm a3gc-tpu                     # core test subset (<5 min)
#   docker run --rm a3gc-tpu python -m pytest tests/ -q       # full suite
#   docker run --rm a3gc-tpu a3gc-tpu --help                  # the CLI
FROM python:3.12-slim

WORKDIR /opt/a3gc_tpu

# torch cpu wheels live on the pytorch index; everything else on PyPI
COPY requirements.lock .
RUN pip install --no-cache-dir \
        --extra-index-url https://download.pytorch.org/whl/cpu \
        -r requirements.lock

COPY pyproject.toml README.md LICENSE ./
COPY a3gc_tpu ./a3gc_tpu
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir .

# the test environment: CPU backend with 8 virtual devices so every
# mesh/sharding path (DP, TP, shard_map serving) is exercised
ENV JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8

CMD ["python", "-m", "pytest", "tests/", "-q", "-m", "not slow"]
