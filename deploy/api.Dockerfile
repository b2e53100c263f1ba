# Serving API container (reference counterpart: api/Dockerfile).
#
# This image targets TPU VM hosts: jax[tpu] binds the local TPU chips via
# PJRT. For a CPU-only smoke deployment (e.g. minikube), build with
#   --build-arg JAX_TARGET=jax
# and the same server runs on the XLA CPU backend.
FROM python:3.12-slim

ARG JAX_TARGET="jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"

RUN apt-get update && apt-get install -y --no-install-recommends \
        curl g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml /app/
COPY image_enhancement_deglaring_tpu /app/image_enhancement_deglaring_tpu
RUN pip install --no-cache-dir ${JAX_TARGET} && pip install --no-cache-dir /app

# Model artifact baked into the image (reference copies best_model.onnx the
# same way); k8s overrides via the model-path ConfigMap -> MODEL_PATH env.
COPY deploy/models/best_model.onnx /app/best_model.onnx
ENV MODEL_PATH=/app/best_model.onnx

EXPOSE 4000
HEALTHCHECK --interval=30s --timeout=5s --start-period=120s --retries=5 \
    CMD curl -sf http://localhost:4000/ping || exit 1
CMD ["python", "-m", "image_enhancement_deglaring_tpu.cli.serve", \
     "--host", "0.0.0.0", "--port", "4000"]
