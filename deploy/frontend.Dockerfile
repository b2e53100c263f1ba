# Frontend container (reference counterpart: frontend/Dockerfile, which
# runs Streamlit on 8501; this serves the equivalent static UI + health
# endpoint with the stdlib server — no heavyweight deps).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
RUN pip install --no-cache-dir numpy pillow
COPY image_enhancement_deglaring_tpu /app/image_enhancement_deglaring_tpu
COPY frontend /app/frontend

ENV API_URL=http://api:4000 PORT=8501 PYTHONPATH=/app
EXPOSE 8501
HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:8501/health || exit 1
CMD ["python", "frontend/app.py"]
