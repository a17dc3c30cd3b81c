# Runtime environment for playablevideogeneration-tpu.
# Counterpart of the reference's CUDA Dockerfile (reference Dockerfile:1-34):
# the compute stack is JAX on TPU (install on a TPU VM) or CPU for tests.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY playablevideogeneration_tpu ./playablevideogeneration_tpu
COPY configs ./configs
COPY tools ./tools
COPY tests ./tests
COPY pytest.ini bench.py ./

# On a TPU VM replace with: pip install "jax[tpu]" -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" && \
    pip install --no-cache-dir .[plots,test]

# Pretrained metric backbones (optional): mount a directory of converted
# .npz files (docs/PRETRAINED_WEIGHTS.md) and point the framework at it.
ENV PVG_PRETRAINED_WEIGHTS=/weights

CMD ["python", "-m", "pytest", "tests/", "-q"]
