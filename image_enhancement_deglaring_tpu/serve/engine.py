"""Batched TPU inference engine.

Replaces the reference's ONNX-Runtime CPU session (reference: api/app.py:84,
:170-171) with a jitted JAX forward on TPU behind a micro-batching queue:

- requests enqueue uint8 512x512 grayscale frames (uint8 over PCIe — 4x
  less host<->device traffic than float32);
- a collector thread drains the queue up to ``max_batch_size`` or until
  ``batch_timeout_ms`` passes, pads to the nearest power-of-two bucket
  (static shapes -> no recompilation storms), and runs ONE device step:
  normalize -> U-Net forward (bf16 MXU by default) -> clip -> scale ->
  uint8, all fused by XLA on device;
- results resolve per-request futures.

The uint8 output uses truncation (x*255 -> astype) to match the
reference's post-processing exactly (reference: api/app.py:190-194).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bucket_sizes(max_batch: int) -> list[int]:
    sizes = [1]
    while sizes[-1] < max_batch:
        sizes.append(min(sizes[-1] * 2, max_batch))
    return sizes


def _check_same_tree(old, new) -> None:
    """Reject a weight swap that would invalidate compiled programs."""
    if jax.tree_util.tree_structure(old) != jax.tree_util.tree_structure(new):
        raise ValueError(
            "new params tree structure does not match the running engine's "
            "(weight reload must keep the same model family)")
    for a, b in zip(jax.tree_util.tree_leaves(old),
                    jax.tree_util.tree_leaves(new)):
        if a.shape != b.shape:
            raise ValueError(
                f"param shape mismatch on reload: {a.shape} vs {b.shape}")
        if a.dtype != b.dtype:
            # jit caches key on leaf dtypes too: a same-shape f16 swap into
            # an f32 engine would silently recompile every warmed bucket and
            # change the serving precision
            raise ValueError(
                f"param dtype mismatch on reload: {a.dtype} vs {b.dtype}")


class InferenceEngine:
    def __init__(self, apply_fn, params, *, image_size: int = 512,
                 max_batch_size: int = 8, batch_timeout_ms: float = 3.0,
                 compute_dtype=jnp.bfloat16, warmup: bool = True, mesh=None,
                 quantize: str | None = None, pipeline_depth: int = 4):
        """``mesh``: optional 1-D jax.sharding.Mesh — params replicate and
        request batches shard across it, scaling serving data-parallel over
        a slice's chips. Batch buckets then snap to multiples of the mesh
        size.

        ``quantize="int8"``: serve with int8 weights — rank>=2 kernels are
        quantized per output channel (AQT-style symmetric PTQ) and stay
        int8 in HBM; the compiled step widens them to the compute dtype on
        the fly (4x less weight traffic than f32). Runnable capability
        parity with the reference's fbgemm quantized model
        (reference: src/model.py:399-439)."""
        self._apply_fn = apply_fn
        self._params = jax.tree_util.tree_map(jnp.asarray, params)
        self.quantize = quantize
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unsupported quantize mode: {quantize!r}")
            from ..models.model_utils import quantize_params_int8

            q, s = quantize_params_int8(self._params, per_channel=True)
            self._params = {"q": q, "s": s}
        self.image_size = image_size
        self.max_batch_size = max_batch_size
        self.batch_timeout_s = batch_timeout_ms / 1e3
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicate

            self._params = replicate(self._params, mesh)
            self._batch_sharding = batch_sharding(mesh)
            n = mesh.devices.size
            if max_batch_size % n != 0:
                raise ValueError(
                    f"max_batch_size {max_batch_size} must divide by mesh size {n}"
                )

        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._lifecycle = threading.Lock()
        self._worker: threading.Thread | None = None
        # in-flight device batches: jax dispatch is asynchronous, so the
        # collector issues up to ``pipeline_depth`` batches before the first
        # result is fetched — hiding the dispatch round-trip (PCIe or
        # tunnel) behind device compute instead of serializing on it
        self.pipeline_depth = max(1, pipeline_depth)
        self._inflight: queue.Queue = queue.Queue(maxsize=self.pipeline_depth)
        self._drainer: threading.Thread | None = None
        # rolling serving stats (last 1024 requests); the lock guards
        # stats() readers against the drainer's concurrent appends
        # ("deque mutated during iteration")
        from collections import deque

        self._stats_lock = threading.Lock()
        self._latencies: deque[float] = deque(maxlen=1024)
        self._batch_fill: deque[int] = deque(maxlen=1024)
        self._served = 0

        self._step = jax.jit(partial(self._device_step, apply_fn, compute_dtype))
        if warmup:
            self.warmup()

    def reload_params(self, params) -> None:
        """Zero-downtime weight swap: the new pytree must match the engine's
        structure and shapes (same model family), so every compiled bucket
        stays valid. In-flight batches finish on the old weights; batches
        dispatched after the swap use the new ones (the attribute rebind is
        atomic under the GIL and each dispatch reads it once)."""
        new = jax.tree_util.tree_map(jnp.asarray, params)
        if self.quantize == "int8":
            from ..models.model_utils import quantize_params_int8

            q, s = quantize_params_int8(new, per_channel=True)
            new = {"q": q, "s": s}
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            new = replicate(new, self.mesh)
        _check_same_tree(self._params, new)
        self._params = new

    def stats(self) -> dict:
        """Serving observability: request latencies and batch fill."""
        with self._stats_lock:
            lat = sorted(self._latencies)
            fill = list(self._batch_fill)
            served = self._served

        def pct(p):
            return lat[min(len(lat) - 1, int(p * len(lat)))] * 1000 if lat else None

        return {
            "requests_served": served,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
            "latency_ms_p99": pct(0.99),
            # mean_batch_fill is an absolute request count per dispatched
            # batch; max_batch_size ships alongside so consumers (e.g. the
            # /metrics fill-ratio gauge) can normalize it
            "mean_batch_fill": sum(fill) / len(fill) if fill else None,
            "max_batch_size": self.max_batch_size,
            # live load gauges (the autoscaling signals): requests waiting
            # for a batch slot, and device batches dispatched but not yet
            # fetched. qsize() is approximate under concurrency — fine for
            # monitoring, asserted-on only loosely in tests.
            "queue_depth": self._queue.qsize(),
            "inflight_batches": self._inflight.qsize(),
        }

    def _bucket_for(self, b: int) -> int:
        sizes = _bucket_sizes(self.max_batch_size)
        if self.mesh is not None:
            n = self.mesh.devices.size
            sizes = sorted({max(n, -(-s // n) * n) for s in sizes})
        for s in sizes:
            if s >= b:
                return s
        return -(-b // (self.mesh.devices.size if self.mesh else 1)) * (
            self.mesh.devices.size if self.mesh else 1
        )

    # ---------------------------------------------------------------- device
    @staticmethod
    def _device_step(apply_fn, compute_dtype, params, x_u8):
        """uint8 (B,S,S,1) -> uint8 (B,S,S,1), everything on device."""
        if isinstance(params, dict) and set(params.keys()) == {"q", "s"}:
            from ..models.model_utils import dequantize_params_int8

            # int8 weights dequantize inside the compiled step: HBM holds
            # int8, the widen fuses into the first use of each kernel
            params = dequantize_params_int8(params["q"], params["s"])
        x = x_u8.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
        out = apply_fn({"params": params}, x).astype(jnp.float32)
        out = jnp.clip(out, 0.0, 1.0) * 255.0
        # trunc, matching (arr * 255).astype(np.uint8) (reference: api/app.py:194)
        return jnp.floor(out).astype(jnp.uint8)

    def warmup(self) -> None:
        """Pre-compile every batch bucket so first requests don't stall."""
        s = self.image_size
        seen = set()
        for b in _bucket_sizes(self.max_batch_size):
            b = self._bucket_for(b)
            if b in seen:
                continue
            seen.add(b)
            x = self._put(np.zeros((b, s, s, 1), np.uint8))
            self._step(self._params, x).block_until_ready()

    def _put(self, batch_u8: np.ndarray):
        if self._batch_sharding is not None:
            return jax.device_put(batch_u8, self._batch_sharding)
        return jnp.asarray(batch_u8)

    # ----------------------------------------------------------------- sync
    def infer_batch(self, batch_u8: np.ndarray) -> np.ndarray:
        """Synchronous: uint8 (B,S,S) or (B,S,S,1) -> uint8 same shape."""
        squeeze = batch_u8.ndim == 3
        if squeeze:
            batch_u8 = batch_u8[..., None]
        b = batch_u8.shape[0]
        bucket = self._bucket_for(b)
        if bucket > b:
            pad = np.zeros((bucket - b,) + batch_u8.shape[1:], np.uint8)
            batch_u8 = np.concatenate([batch_u8, pad])
        out = np.asarray(self._step(self._params, self._put(batch_u8)))[:b]
        return out[..., 0] if squeeze else out

    def infer_one(self, img_u8: np.ndarray) -> np.ndarray:
        """uint8 (S,S) -> uint8 (S,S)."""
        return self.infer_batch(img_u8[None])[0]

    # ---------------------------------------------------------------- async
    def start(self) -> None:
        # the lock serializes concurrent first-submit() starts (the HTTP
        # executor has 64 threads) so exactly one collector/drainer pair runs
        with self._lifecycle:
            self._start_locked()

    def _start_locked(self) -> None:
        if self._worker is not None:
            return
        # fresh Event per collector/drainer generation: a pair detached by a
        # timed-out stop() keeps polling ITS event (already set, so it still
        # exits via the sentinel chain) — reusing one Event across restarts
        # would clear it under the old collector and revive it against its
        # now-orphaned queues
        stop = threading.Event()
        self._stop = stop
        self._worker = threading.Thread(
            target=self._collector_loop,
            args=(self._queue, self._inflight, stop),
            daemon=True, name="engine-collector")
        self._drainer = threading.Thread(
            target=self._drain_loop, args=(self._inflight,), daemon=True,
            name="engine-drainer")
        self._worker.start()
        self._drainer.start()

    def stop(self) -> None:
        """Shutdown ordering: the collector exits first and owns the drainer's
        None sentinel (FIFO after its last dispatched batch, so nothing is
        stranded even if stop() races a slow bucket compile); its exit path
        also fails any still-unclaimed queued requests."""
        with self._lifecycle:
            if self._worker is None:
                return
            self._stop.set()
            self._worker.join(timeout=10)
            self._drainer.join(timeout=10)
            detached = self._worker.is_alive() or self._drainer.is_alive()
            self._worker = None
            self._drainer = None
            if detached:
                # a bucket compile outlived the join: the old daemon pair will
                # still finish its batch and exit via the sentinel chain; give
                # any future start() fresh queues so the pairs can't cross
                self._queue = queue.Queue()
                self._inflight = queue.Queue(maxsize=self.pipeline_depth)

    def submit(self, img_u8: np.ndarray) -> Future:
        """Enqueue one uint8 (S,S) frame; resolves to uint8 (S,S)."""
        s = self.image_size
        if img_u8.shape == (s, s, 1):
            img_u8 = img_u8[..., 0]  # normalize rank so coalesced batches
        elif img_u8.shape != (s, s):  # never mix (S,S) with (S,S,1)
            # fail fast: a wrong-shape frame inside a coalesced batch would
            # blow up np.stack for every request batched with it
            raise ValueError(
                f"submit expects a ({s}, {s}) frame, got {img_u8.shape}")
        if img_u8.dtype != np.uint8:
            # same blast-radius argument as the shape check: one float
            # frame upcasts the whole coalesced batch, forces a fresh XLA
            # compile for the new dtype, and double-normalizes (/255) every
            # innocent request batched with it
            raise ValueError(
                f"submit expects a uint8 frame, got dtype {img_u8.dtype}")
        # enqueue under the lifecycle lock: a request slipped in between
        # stop()'s final queue drain and its queue swap would otherwise
        # strand its Future unresolved until the HTTP layer's timeout
        fut: Future = Future()
        with self._lifecycle:
            if self._worker is None:
                self._start_locked()
            self._queue.put((img_u8, fut, _now()))
        return fut

    def _collector_loop(self, req_queue: queue.Queue,
                        inflight: queue.Queue,
                        stop: threading.Event) -> None:
        """Drains the request queue into bucketed device batches and
        DISPATCHES them without blocking on results (the drainer fetches);
        up to pipeline_depth batches ride the dispatch queue at once."""
        try:
            while not stop.is_set():
                try:
                    first = req_queue.get(timeout=0.1)
                except queue.Empty:
                    continue
                batch = [first]
                deadline = _now() + self.batch_timeout_s
                while len(batch) < self.max_batch_size:
                    remaining = deadline - _now()
                    if remaining <= 0:
                        break
                    try:
                        batch.append(req_queue.get(timeout=remaining))
                    except queue.Empty:
                        break
                try:
                    imgs = np.stack([b[0] for b in batch])
                    squeeze = imgs.ndim == 3
                    if squeeze:
                        imgs = imgs[..., None]
                    b = imgs.shape[0]
                    bucket = self._bucket_for(b)
                    if bucket > b:
                        pad = np.zeros((bucket - b,) + imgs.shape[1:], np.uint8)
                        imgs = np.concatenate([imgs, pad])
                    y = self._step(self._params, self._put(imgs))  # async dispatch
                    inflight.put((batch, y, b, squeeze))  # blocks at depth
                except Exception as e:  # pragma: no cover
                    for _, fut, _t in batch:
                        if not fut.done():
                            fut.set_exception(e)
        finally:
            # fail unclaimed requests, THEN wake the drainer: the sentinel
            # lands after every batch this collector dispatched (FIFO), so
            # the drainer resolves them all before exiting
            while True:
                try:
                    _img, fut, _t = req_queue.get_nowait()
                except queue.Empty:
                    break
                if not fut.done():
                    fut.set_exception(RuntimeError("engine stopped"))
            inflight.put(None)

    def _drain_loop(self, inflight: queue.Queue) -> None:
        """Fetches completed device batches and resolves request futures."""
        while True:
            item = inflight.get()
            if item is None:
                return
            batch, y, b, squeeze = item
            try:
                outs = np.asarray(y)[:b]
                if squeeze:
                    outs = outs[..., 0]
                done = _now()
                for (_, fut, t_enq), out in zip(batch, outs):
                    fut.set_result(out)
                with self._stats_lock:
                    for _, _f, t_enq in batch:
                        self._latencies.append(done - t_enq)
                    self._batch_fill.append(len(batch))
                    self._served += len(batch)
            except Exception as e:  # pragma: no cover
                for _, fut, _t in batch:
                    if not fut.done():
                        fut.set_exception(e)


def _now() -> float:
    import time

    return time.monotonic()
