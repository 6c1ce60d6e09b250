# Container for TPU training (replaces the reference's Vertex pytorch-gpu
# image). Base: slim python + jax[tpu]; the TPU runtime (libtpu) is provided
# by the TPU VM host through the PJRT plugin wheel.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir 'jax[tpu]' \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY neural_vit_tpu ./neural_vit_tpu
COPY bench.py __graft_entry__.py ./

CMD ["python", "-m", "neural_vit_tpu.training.loop"]
