# TPU-ready image for ocrd_keraslm_tpu.
# Base: a JAX TPU image (substitute your registry's pinned build).
FROM python:3.12-slim

WORKDIR /build
COPY pyproject.toml README.md ./
COPY ocrd_keraslm_tpu ./ocrd_keraslm_tpu
COPY bench.py __graft_entry__.py ./

# jax[tpu] pulls libtpu for Cloud TPU VMs; CPU fallback works anywhere
RUN pip install --no-cache-dir "jax[tpu]" -f \
      https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir numpy h5py click networkx lxml optax orbax-checkpoint \
    && pip install --no-cache-dir -e . --no-deps

ENTRYPOINT []
CMD ["keraslm-rate", "--help"]
