"""Tiled full-resolution inference.

The reference API downsamples every input to 512x512 and upsamples the
result back (reference: api/app.py:150,203), losing detail on large
documents; its offline splitter (reference: scripts/split_image.py:7) only
cuts triptychs. This module adds true full-resolution inference.

TPU-native design: the device program only ever sees a fixed-shape batch
of tiles ``(B, tile, tile, 1)`` with B drawn from the same power-of-two
bucket ladder the serving engine uses — so an arbitrary stream of input
resolutions compiles a small, bounded set of programs (one per bucket,
<= log2(max_tiles_per_batch)+1 total), not one per resolution. Tile
extraction and the feathered overlap-stitch are cheap O(pixels) host ops;
the U-Net forward — all the FLOPs — runs on device, uint8 in (4x less
host->device traffic), and shards across a mesh when given one (tile
parallelism: one image's tiles fan out over the slice's chips).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _grid_starts(size: int, tile: int, stride: int) -> list[int]:
    """Static start offsets covering [0, size) with ``tile`` windows."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def _blend_window(tile: int, overlap: int) -> np.ndarray:
    """2-D feathering window: linear ramps on the overlapping margins."""
    if overlap <= 0:
        return np.ones((tile, tile), np.float32)
    ramp = np.ones(tile, np.float32)
    edge = np.linspace(1.0 / (overlap + 1), 1.0, overlap, dtype=np.float32)
    ramp[:overlap] = edge
    ramp[-overlap:] = edge[::-1]
    return ramp[:, None] * ramp[None, :]


class TiledInference:
    """Full-resolution tiled forward on top of an InferenceEngine's model."""

    def __init__(self, apply_fn, params, *, tile: int = 512, overlap: int = 32,
                 compute_dtype=jnp.bfloat16, mesh=None,
                 max_tiles_per_batch: int = 8, pipeline_depth: int = 4):
        """``mesh``: optional 1-D Mesh — tile batches shard across it and
        batch buckets snap to multiples of the mesh size.
        ``max_tiles_per_batch``: cap on tiles per device call — the bucket
        ladder is {1, 2, ..., cap}, so the total number of compiled
        programs is log2(cap)+1 (4 at the default). Larger images run in
        several bucket-shaped chunks, dispatched asynchronously so the
        device pipelines them back-to-back."""
        if not 0 <= overlap < tile:
            # overlap == tile -> stride 0 (range() crash per request);
            # overlap > tile -> negative stride silently leaves uncovered
            # (black) bands in the stitched output
            raise ValueError(
                f"tile overlap must be in [0, tile): got overlap={overlap} "
                f"with tile={tile}")
        self.apply_fn = apply_fn
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.tile = tile
        self.overlap = overlap
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.max_tiles_per_batch = max_tiles_per_batch
        #: cap on concurrently dispatched tile-batch chunks (bounds live
        #: HBM buffers for huge images; mirrors InferenceEngine's knob)
        self.pipeline_depth = max(1, pipeline_depth)
        self._window = _blend_window(tile, overlap)
        self._forward = jax.jit(
            partial(self._device_forward, apply_fn, compute_dtype)
        )
        self._buckets_seen: set[int] = set()
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.params = replicate(self.params, mesh)

    def reload_params(self, params) -> None:
        """Zero-downtime weight swap; same constraints as
        InferenceEngine.reload_params (matching structure and shapes)."""
        from .engine import _check_same_tree

        new = jax.tree_util.tree_map(jnp.asarray, params)
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            new = replicate(new, self.mesh)
        _check_same_tree(self.params, new)
        self.params = new

    @property
    def compiled_bucket_count(self) -> int:
        """Distinct device programs compiled so far — one per tile-batch
        bucket, independent of how many input resolutions were served."""
        return len(self._buckets_seen)

    # ------------------------------------------------------------- device
    @staticmethod
    def _device_forward(apply_fn, dtype, params, tiles_u8):
        """uint8 (B, T, T, 1) -> float32 (B, T, T): normalize + U-Net."""
        x = tiles_u8.astype(dtype) / jnp.asarray(255.0, dtype)
        return apply_fn({"params": params}, x).astype(jnp.float32)[..., 0]

    def _bucket_for(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        b = min(b, self.max_tiles_per_batch)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            b = max(n_dev, -(-b // n_dev) * n_dev)
        return b

    def _run_tiles(self, tiles_u8: np.ndarray) -> np.ndarray:
        """uint8 (N, T, T) -> float32 (N, T, T), chunked into bucket-shaped
        device batches."""
        n = tiles_u8.shape[0]
        out = np.empty(tiles_u8.shape, np.float32)
        step = self.max_tiles_per_batch
        # snapshot the weights once so a concurrent reload_params() can't
        # stitch one image from two different checkpoints mid-request
        params = self.params
        # bounded dispatch window: chunks pipeline on device (jax dispatch
        # is async), but a huge image must not keep hundreds of in-flight
        # input/output buffers live in HBM — drain the oldest once the
        # window fills
        max_inflight = self.pipeline_depth
        pending: list = []

        def drain_one():
            c0_, b_, res = pending.pop(0)
            out[c0_ : c0_ + b_] = np.asarray(res)[:b_]

        for c0 in range(0, n, step):
            chunk = tiles_u8[c0 : c0 + step]
            b = chunk.shape[0]
            bucket = self._bucket_for(b)
            self._buckets_seen.add(bucket)
            if bucket > b:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - b,) + chunk.shape[1:], np.uint8)]
                )
            batch = chunk[..., None]
            if self.mesh is not None:
                from ..parallel.mesh import batch_sharding

                batch = jax.device_put(batch, batch_sharding(self.mesh))
            else:
                batch = jnp.asarray(batch)
            pending.append((c0, b, self._forward(params, batch)))
            if len(pending) >= max_inflight:
                drain_one()
        while pending:
            drain_one()
        return out

    # --------------------------------------------------------------- host
    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        """uint8 (H, W) grayscale -> de-glared uint8 (H, W)."""
        h, w = img_u8.shape
        tile, stride = self.tile, self.tile - self.overlap
        ph, pw = max(tile, h), max(tile, w)
        if (ph, pw) != (h, w):
            img_u8 = np.pad(img_u8, ((0, ph - h), (0, pw - w)), mode="edge")
        ys = _grid_starts(ph, tile, stride)
        xs = _grid_starts(pw, tile, stride)

        tiles = np.stack([img_u8[y0 : y0 + tile, x0 : x0 + tile]
                          for y0 in ys for x0 in xs])
        out_tiles = self._run_tiles(tiles)

        # feathered overlap blend, then clip -> trunc-to-uint8, matching the
        # reference's post-processing exactly (reference: api/app.py:190-194)
        acc = np.zeros((ph, pw), np.float32)
        wacc = np.zeros((ph, pw), np.float32)
        win = self._window
        k = 0
        for y0 in ys:
            for x0 in xs:
                acc[y0 : y0 + tile, x0 : x0 + tile] += out_tiles[k] * win
                wacc[y0 : y0 + tile, x0 : x0 + tile] += win
                k += 1
        stitched = acc / np.maximum(wacc, 1e-8)
        out = np.floor(np.clip(stitched, 0.0, 1.0) * 255.0).astype(np.uint8)
        return out[:h, :w]

    def num_tiles(self, h: int, w: int) -> int:
        stride = self.tile - self.overlap
        return len(_grid_starts(max(h, self.tile), self.tile, stride)) * len(
            _grid_starts(max(w, self.tile), self.tile, stride)
        )
