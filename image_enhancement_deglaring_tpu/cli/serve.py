"""Serving CLI: run the HTTP API backed by the batched TPU engine
(replaces `uvicorn api.app:app`, reference: api/app.py:221-222)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve the de-glaring model over HTTP")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=4000)
    # MODEL_PATH env wires the k8s ConfigMap (deploy/k8s/model-configmap.yaml);
    # the reference defined the same ConfigMap but never read it
    # (reference: api/app.py:71 hardcodes the path).
    import os

    p.add_argument("--model_path", type=str,
                   default=os.environ.get("MODEL_PATH",
                                          "deploy/models/best_model.onnx"))
    p.add_argument("--mode", type=str, default="resize",
                   choices=["resize", "tile", "both"],
                   help="resize = reference-parity 512^2; tile = full-res "
                        "tiled; both = resize default with per-request "
                        "?mode=tile override")
    p.add_argument("--model", type=str, default="auto",
                   choices=["auto", "lightweight", "optimized", "enhanced"],
                   help="model family of the checkpoint; auto detects from "
                        "the artifact (the reference serves any .onnx via "
                        "ORT — this is the engine-level equivalent)")
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--batch_timeout_ms", type=float, default=3.0)
    p.add_argument("--tile_overlap", type=int, default=32)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize", type=str, default=None, choices=["int8"],
                   help="serve with int8 weights (AQT-style per-channel PTQ)")
    p.add_argument("--image_size", type=int, default=512,
                   help="model input resolution (resize mode) / tile size")
    p.add_argument("--workers", type=int, default=1,
                   help="HTTP worker processes (SO_REUSEPORT) sharing one "
                        "engine process over IPC; scales the host-bound "
                        "PIL/PNG work across CPUs (resize mode only)")
    p.add_argument("--allow_reload", action="store_true",
                   help="expose POST /reload for zero-downtime weight swaps "
                        "from a same-family checkpoint on this filesystem")
    p.add_argument("--data_parallel", type=int, nargs="?", const=0,
                   default=None, metavar="N",
                   help="shard request batches across N local chips (omit "
                        "N = every local device): params replicate over a "
                        "1-D mesh, each micro-batch splits across it, and "
                        "batch buckets snap to multiples of N — serving "
                        "data parallelism on a multi-chip host (e.g. "
                        "v5e-8). Default: single chip")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--profile_port", type=int, default=0,
                   help="expose the jax profiler server on this port "
                        "(0 = off): TensorBoard's profile plugin / xprof "
                        "connects live to capture device traces of serving "
                        "batches under load — see docs/PERF.md for the "
                        "capture-under-load workflow")
    return p.parse_args(argv)


def build_serving_mesh(data_parallel: int | None, max_batch_size: int):
    """Resolve --data_parallel into (mesh, max_batch_size).

    ``None`` = off; ``0`` = every local device; ``N`` = N devices (clamped
    to what exists, loudly — a silently smaller mesh would leave the
    operator believing more serving parallelism is active than is, the
    same contract as cli.sweep's --n_devices). ``max_batch_size`` rounds UP
    to a mesh multiple (the engine requires divisibility; rounding down
    could halve per-step throughput the operator asked for)."""
    if data_parallel is None:
        return None, max_batch_size
    import jax

    from ..parallel import make_mesh

    avail = len(jax.devices())
    n = data_parallel or avail
    if n > avail:
        print(f"requested --data_parallel {n}, but only {avail} "
              f"device(s) available; using {avail}")
        n = avail
    if n <= 1:
        print("--data_parallel resolved to 1 device; serving single-chip")
        return None, max_batch_size
    snapped = -(-max_batch_size // n) * n
    if snapped != max_batch_size:
        print(f"--max_batch_size {max_batch_size} rounded up to {snapped} "
              f"(must be a multiple of the {n}-chip serving mesh)")
    return make_mesh(n), snapped


def main(argv=None):
    args = parse_args(argv)
    # usage errors fail BEFORE create_server loads the model and runs the
    # (potentially minutes-long, through a remote tunnel) TPU warmup
    if args.workers > 1:
        if args.mode != "resize":
            raise SystemExit("--workers > 1 requires --mode resize")
        if args.allow_reload:
            # worker processes proxy frames only; /reload would 404 on them
            raise SystemExit("--allow_reload requires --workers 1 "
                             "(the engine process owns the weights)")
    import jax.numpy as jnp

    from ..serve import create_server

    if args.profile_port:
        # before model load so warmup compiles are captureable too; the
        # profiler server runs on a daemon thread inside this process —
        # the one that owns the engine and dispatches TPU batches
        from ..utils.profiling import start_trace_server

        start_trace_server(args.profile_port)
        print(f"jax profiler server on :{args.profile_port} "
              f"(TensorBoard profile plugin / xprof can connect live)")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    mesh, max_batch = build_serving_mesh(args.data_parallel,
                                         args.max_batch_size)
    if mesh is not None:
        print(f"serving data-parallel over {mesh.devices.size} chips "
              f"(batch buckets snap to multiples of {mesh.devices.size})")
    server = create_server(
        args.model_path, host=args.host, port=args.port, mode=args.mode,
        model_arch=args.model,
        max_batch_size=max_batch,
        batch_timeout_ms=args.batch_timeout_ms, compute_dtype=dtype,
        tile_overlap=args.tile_overlap, log_dir=args.log_dir,
        image_size=args.image_size, quantize=args.quantize,
        allow_reload=args.allow_reload, mesh=mesh,
    )
    if args.workers > 1:
        import signal
        import threading

        from ..serve.ipc import serve_multiprocess

        server.engine.start()
        mps = serve_multiprocess(
            server.engine, host=args.host, port=args.port,
            image_size=args.image_size, n_workers=args.workers,
            log_dir=args.log_dir, model_info=server.model_info,
        )
        # SIGTERM on the parent (k8s pod shutdown) forwards to the workers,
        # each of which drains its in-flight requests before exiting
        stop_evt = threading.Event()
        signal.signal(signal.SIGTERM, lambda *_: stop_evt.set())
        try:
            while not stop_evt.is_set() and mps.any_alive():
                stop_evt.wait(1.0)
        except KeyboardInterrupt:
            pass
        finally:
            mps.stop()
            server.engine.stop()
        return
    try:
        server.run()
    except KeyboardInterrupt:
        pass
    finally:
        server.engine.stop()


if __name__ == "__main__":
    main()
