# video-enhancer-tpu serving image (reference Dockerfile:1-35 equivalent).
# For TPU hosts use a jax[tpu]-enabled base; this default targets CPU smoke.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY video_enhancer_tpu ./video_enhancer_tpu

RUN pip install --no-cache-dir \
    "jax" "flax" "optax" "orbax-checkpoint" "einops" \
    "opencv-python-headless" "pyyaml" "psutil" "cryptography" \
    && pip install --no-cache-dir --no-deps -e .

ENV VETPU_DATA_DIR=/data
VOLUME /data
EXPOSE 7860

HEALTHCHECK --interval=30s --timeout=10s \
    CMD python -c "import urllib.request; \
        urllib.request.urlopen('http://127.0.0.1:7860/health', timeout=5)"

CMD ["python", "-m", "video_enhancer_tpu.app", "--port", "7860", \
     "--data-dir", "/data"]
