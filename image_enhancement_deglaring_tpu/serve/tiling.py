"""Tiled full-resolution inference.

The reference API downsamples every input to 512x512 and upsamples the
result back (reference: api/app.py:150,203), losing detail on large
documents; its offline splitter (reference: scripts/split_image.py:7) only
cuts triptychs. This module adds true full-resolution inference: pad the
image onto a static tile grid, run every (overlapping) 512^2 tile as one
batch through the U-Net, and stitch on device with a feathered blend —
one jit-compiled program per grid bucket, so arbitrary input sizes hit a
small, bounded set of compilations.
"""

from __future__ import annotations

from functools import lru_cache

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
                 compute_dtype=jnp.bfloat16, mesh=None):
        """``mesh``: optional 1-D Mesh — the tile batch shards across it
        (spatial/tile parallelism: one image's tiles fan out over the
        slice's chips and stitch back on device)."""
        self.apply_fn = apply_fn
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.tile = tile
        self.overlap = overlap
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.params = replicate(self.params, mesh)

    @lru_cache(maxsize=32)
    def _compiled_for(self, padded_h: int, padded_w: int):
        tile = self.tile
        stride = tile - self.overlap
        ys = tuple(_grid_starts(padded_h, tile, stride))
        xs = tuple(_grid_starts(padded_w, tile, stride))
        window = jnp.asarray(_blend_window(tile, self.overlap))
        apply_fn = self.apply_fn
        dtype = self.compute_dtype

        mesh = self.mesh

        def run(params, img_u8):  # (H, W) uint8 -> (H, W) uint8
            x = img_u8.astype(dtype) / jnp.asarray(255.0, dtype)
            tiles = jnp.stack(
                [x[y0 : y0 + tile, x0 : x0 + tile] for y0 in ys for x0 in xs]
            )[..., None]
            n_real = tiles.shape[0]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_dev = mesh.devices.size
                padded = -(-n_real // n_dev) * n_dev
                if padded > n_real:
                    tiles = jnp.concatenate(
                        [tiles, jnp.zeros((padded - n_real,) + tiles.shape[1:],
                                          tiles.dtype)]
                    )
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, P(mesh.axis_names[0]))
                )
            out = apply_fn({"params": params}, tiles).astype(jnp.float32)[..., 0]
            out = out[:n_real]
            acc = jnp.zeros((padded_h, padded_w), jnp.float32)
            wacc = jnp.zeros((padded_h, padded_w), jnp.float32)
            k = 0
            for y0 in ys:
                for x0 in xs:
                    acc = acc.at[y0 : y0 + tile, x0 : x0 + tile].add(out[k] * window)
                    wacc = wacc.at[y0 : y0 + tile, x0 : x0 + tile].add(window)
                    k += 1
            stitched = acc / jnp.maximum(wacc, 1e-8)
            return jnp.floor(jnp.clip(stitched, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        return jax.jit(run)

    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        """uint8 (H, W) grayscale -> de-glared uint8 (H, W)."""
        h, w = img_u8.shape
        ph = max(self.tile, h)
        pw = max(self.tile, w)
        if (ph, pw) != (h, w):
            img_u8 = np.pad(img_u8, ((0, ph - h), (0, pw - w)), mode="edge")
        out = np.asarray(self._compiled_for(ph, pw)(self.params, jnp.asarray(img_u8)))
        return out[:h, :w]

    def num_tiles(self, h: int, w: int) -> int:
        stride = self.tile - self.overlap
        return len(_grid_starts(max(h, self.tile), self.tile, stride)) * len(
            _grid_starts(max(w, self.tile), self.tile, stride)
        )
