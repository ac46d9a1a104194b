# hymet_tpu container (packaging parity with the reference's
# miniconda-based Dockerfile; here a JAX base + the native build).
#
# TPU runtime: use a jax[tpu]-compatible base on a TPU VM; this default
# builds the CPU image (tests, host tooling, air-gapped classification).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/hymet_tpu
COPY pyproject.toml README.md ./
COPY hymet_tpu ./hymet_tpu
COPY native ./native
COPY bin ./bin

RUN pip install --no-cache-dir "jax[cpu]" numpy matplotlib \
    && pip install --no-cache-dir -e . \
    && make -C native

ENV PATH="/opt/hymet_tpu/bin:${PATH}"
ENTRYPOINT ["hymet-tpu"]
CMD ["--help"]
