# Environment image — the analog of the reference's Dockerfile (Ubuntu +
# DPC++ + CUDA + OpenCL runtimes). The TPU build needs only Python + JAX:
# on a TPU VM the libtpu wheel provides the device runtime; elsewhere the
# CPU backend with a virtual device mesh runs the full test suite.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/dwarf_bench_tpu
COPY pyproject.toml README.md ./
COPY dwarf_bench_tpu ./dwarf_bench_tpu
COPY native ./native
COPY scripts ./scripts
COPY examples ./examples
COPY tests ./tests
COPY bench.py __graft_entry__.py pytest.ini ./

# TPU VM: pip install "jax[tpu]" instead.
RUN pip install --no-cache-dir "jax[cpu]" numpy pytest \
    && make -C native \
    && pip install --no-cache-dir -e .

ENV JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8

CMD ["python", "-m", "pytest", "tests/", "-q", "-m", "not slow"]
