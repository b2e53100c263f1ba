#!/usr/bin/env bash
# Build images, load into minikube, apply manifests, wait for rollout
# (reference counterpart: k8s/deploy.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."

if [ ! -f deploy/models/best_model.onnx ]; then
  echo "deploy/models/best_model.onnx missing — export one first:"
  echo "  python -m image_enhancement_deglaring_tpu.cli.export_onnx \\"
  echo "      --model_path <checkpoint> --output deploy/models/best_model.onnx"
  exit 1
fi

echo "Building images..."
docker build -t deglaring-api:latest -f deploy/api.Dockerfile .
docker build -t deglaring-frontend:latest -f deploy/frontend.Dockerfile .

if command -v minikube >/dev/null; then
  echo "Loading images into minikube..."
  minikube image load deglaring-api:latest
  minikube image load deglaring-frontend:latest
fi

echo "Applying manifests..."
kubectl apply -f deploy/k8s/namespace.yaml
kubectl apply -f deploy/k8s/model-configmap.yaml
kubectl apply -f deploy/k8s/api-deployment.yaml
kubectl apply -f deploy/k8s/api-service.yaml
kubectl apply -f deploy/k8s/frontend-deployment.yaml
kubectl apply -f deploy/k8s/frontend-service.yaml

echo "Waiting for rollout..."
# timeout must cover the api startupProbe's cold-compile window
# (60 x 10s = 600s in api-deployment.yaml) or a first deploy with an
# empty JAX compile cache aborts spuriously
kubectl -n deglaring rollout status deployment/deglaring-api --timeout=660s
kubectl -n deglaring rollout status deployment/deglaring-frontend --timeout=120s

echo "Done. Port-forward with:"
echo "  kubectl -n deglaring port-forward svc/frontend 8501:8501"
