# llm_tpu serving image (analog of the reference's utils/Dockerfile, which
# ships the `llm` CLI in a minimal runtime image).
#
# Build:  docker build -t llm-tpu .
# Run  :  docker run --rm -v /models:/models llm-tpu \
#             infer -a llama -m /models/llama-7b-q4_0.bin -p "Hello"
#
# Base: a plain python image plus jax[tpu] from the libtpu release index.
# On a Cloud TPU VM pass the TPU through with --privileged and the usual
# /dev/accel* devices; off-TPU the CPU backend is used automatically.

FROM python:3.12-slim

# native toolchain for the ctypes codec extension (built lazily by
# llm_tpu.native at first import; falls back to numpy without it)
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY llm_tpu ./llm_tpu
COPY prompts ./prompts

RUN pip install --no-cache-dir \
    'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .

ENTRYPOINT ["python", "-m", "llm_tpu.cli"]
CMD ["--help"]
