"""Device-resident dataset training (one compiled dispatch per epoch).

TPU-native redesign of the reference's hot loop (reference:
optimized_train.py:197-233, which round-trips host->device every step
through a torch DataLoader): the full decoded dataset is shipped to HBM
ONCE, and each epoch runs as a single jitted ``lax.scan`` — on-device
shuffle (``jax.random.permutation``), gather, optional device-side
augmentation (ops.augment_device), and the fused train step. The host's
per-epoch work collapses to one dispatch plus one stacked loss fetch.

Why this is the right shape for TPU:
- the host input path (decode + transfer) leaves the steady state
  entirely; nothing is re-shipped per step or per epoch;
- per-step dispatch latency (the dominant fixed cost on a tunneled or
  multi-tenant host, and nontrivial even on a local PCIe host) is paid
  once per EPOCH, not once per step;
- the scan body reuses ``loop.make_step_body`` verbatim, so resident
  training matches the per-step path on the same batch sequence to
  float32 round-off (tested; exact bits can differ because XLA may fuse
  a scanned program differently than a standalone jit);
- everything shards: the cache is laid out over the mesh's data axis and
  each scanned step constrains its gathered batch to the same batch
  sharding the per-step path uses, so XLA inserts the identical gradient
  all-reduces.

Capacity: SD1-scale (1,536 pairs of 512-square grayscale) is ~1.6 GB in
bf16 — a few percent of one chip's HBM, and it shrinks per-chip when
sharded over a mesh. ``fits_on_device`` makes the check explicit.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .loop import make_step_body, make_val_body


class ResidentData(NamedTuple):
    """A dataset living in device memory.

    ``x``/``y``: (N_padded, H, W, C) device arrays (padding rows are zeros,
    present only so the leading axis divides the mesh); ``n``: real sample
    count — the shuffle only ever indexes ``[0, n)``.
    """

    x: jax.Array
    y: jax.Array
    n: int


def fits_on_device_bytes(n_bytes: int, *, hbm_bytes: int = 16 << 30,
                         fraction: float = 0.5) -> bool:
    """Whether ``n_bytes`` of cache fits in ``fraction`` of one device's
    HBM (v5e: 16 GB). ``cache_on_device`` gates on this before shipping."""
    return n_bytes <= fraction * hbm_bytes


def fits_on_device(n: int, image_size: int, channels: int = 1,
                   *, dtype=jnp.bfloat16, hbm_bytes: int = 16 << 30,
                   fraction: float = 0.5) -> bool:
    """Whether an (input, target) cache of ``n`` samples fits in
    ``fraction`` of one device's HBM."""
    per = np.dtype(dtype).itemsize if dtype != jnp.bfloat16 else 2
    need = 2 * n * image_size * image_size * channels * per
    return fits_on_device_bytes(need, hbm_bytes=hbm_bytes, fraction=fraction)


def cache_on_device(source, *, dtype=None, sharding=None,
                    num_workers: int = 8) -> ResidentData:
    """Decode a dataset on the host ONCE and ship it to device memory.

    ``source`` is either an indexable dataset (``__len__``/``__getitem__``
    -> (x, y) HWC float arrays) or a batch loader (iterated once,
    concatenated) — loaders wrapping an augmenting dataset are rejected:
    caching would freeze one random draw of the augmentations into the
    data; use ``--augment device`` to keep augmenting per epoch on chip.

    ``dtype``: optional cast for the INPUT cache only — same policy as
    ``DevicePrefetcher``: a bf16 input cache is free when the model's
    first op is that cast, but targets stay f32 so the loss math matches
    the per-step path bit-for-policy (quantizing y to bf16 would change
    L1 gradients near convergence).

    ``sharding``: optional batch (leading-axis) NamedSharding — the cache
    pads N up to the mesh size and shards it, so each device holds ~N/D
    samples.

    Multi-process (after ``jax.distributed.initialize``): ``source`` is the
    GLOBAL loader/dataset, identically constructed on every host (same
    directory, seed, split — the standard multi-host input contract), and
    ``sharding`` must span the global mesh. Each host decodes ONLY its own
    contiguous row range of the padded cache (1/n_proc of the decode work)
    and the global resident array is assembled with
    ``jax.make_array_from_process_local_data``. The scanned epoch then runs
    unchanged over the global mesh — cross-host gathers/all-reduces are
    XLA-inserted collectives.
    """
    ds = getattr(source, "dataset", source)
    if getattr(ds, "augment", "none") != "none":
        raise ValueError(
            "cache_on_device: the data source applies host augmentations "
            f"({ds.augment!r}); caching would freeze one random draw. "
            "Build it with augment='none' and use device augmentation."
        )
    if jax.process_count() > 1 and not (
            sharding is not None and sharding.is_fully_replicated):
        # fully-REPLICATED multi-host caches (sweep trial groups: every
        # device steps its own trials against a local copy of the whole
        # data) fall through: each host decodes everything and device_put
        # replicates across the global mesh directly — the per-host
        # row-range split below only applies to batch-sharded caches
        return _cache_multiprocess(source, ds, dtype=dtype,
                                   sharding=sharding,
                                   num_workers=num_workers)
    if hasattr(ds, "__getitem__") and hasattr(ds, "__len__"):
        n = len(ds)
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            samples = list(pool.map(ds.__getitem__, range(n)))
        x = np.stack([s[0] for s in samples])
        y = np.stack([s[1] for s in samples])
    else:
        # batch-iteration fallback (no indexable dataset attached). The
        # frozen-augmentation check above inspected the loader itself;
        # loaders that hide an augmenting dataset behind plain iteration
        # cannot be detected (see the docstring contract).
        x, y = _iterate_all(source)
    n = x.shape[0]

    if dtype is not None:
        x = x.astype(dtype)

    # capacity gate: the cache must fit in half a chip's HBM. A leading-
    # axis-sharded cache (train loop) splits over the mesh; a replicated
    # one (sweep trial groups) costs the full size on every device.
    per_device = x.nbytes + y.nbytes
    spec = getattr(sharding, "spec", None)
    if spec is not None and len(spec) and spec[0] is not None:
        per_device //= sharding.mesh.devices.size
    if not fits_on_device_bytes(per_device):
        raise ValueError(
            f"cache_on_device: resident cache needs {per_device / 2**30:.1f}"
            " GiB per device — more than half of one chip's HBM. Use the "
            "streaming loader path (drop --resident_data) or shard the "
            "cache over a larger mesh."
        )

    if sharding is not None:
        n_shards = sharding.mesh.devices.size
        pad = (-n) % n_shards
        if pad:
            zeros = np.zeros((pad,) + x.shape[1:], x.dtype)
            x = np.concatenate([x, zeros])
            y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
        put = lambda a: jax.device_put(a, sharding)
    else:
        put = jax.device_put
    return ResidentData(put(x), put(y), n)


def _iterate_all(source) -> tuple[np.ndarray, np.ndarray]:
    """Drain a batch loader once into stacked host arrays."""
    xs, ys = [], []
    for bx, by in source:
        xs.append(np.asarray(bx))
        ys.append(np.asarray(by))
    if not xs:
        raise ValueError("cache_on_device: empty data source")
    return np.concatenate(xs), np.concatenate(ys)


def _cache_multiprocess(source, ds, *, dtype, sharding,
                        num_workers: int) -> ResidentData:
    """Assemble the resident cache across hosts (see ``cache_on_device``).

    Every host holds the contiguous padded-row range its local devices own
    under the 1-D batch sharding (``make_mesh`` orders devices by process,
    the same layout contract as ``parallel.mesh.put_global_batch``), so
    host ``i`` decodes rows ``[i*per_host, (i+1)*per_host) ∩ [0, n)`` and
    contributes zeros for padding rows.
    """
    if sharding is None:
        raise ValueError(
            "cache_on_device: multi-process resident caching requires a "
            "batch sharding over the GLOBAL mesh (the cache must be "
            "assembled with make_array_from_process_local_data)")
    n_shards = sharding.mesh.devices.size
    n_proc = jax.process_count()
    if n_shards % n_proc:
        raise ValueError(
            f"cache_on_device: global mesh size {n_shards} must divide by "
            f"{n_proc} processes (non-uniform hosts are unsupported)")
    rank = jax.process_index()

    if hasattr(ds, "__getitem__") and hasattr(ds, "__len__"):
        n = len(ds)
        n_total = n + ((-n) % n_shards)
        per_host = n_total // n_proc
        start = rank * per_host
        own = range(start, min(start + per_host, n))
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            samples = list(pool.map(ds.__getitem__, own))
        if samples:
            x_loc = np.stack([s[0] for s in samples])
            y_loc = np.stack([s[1] for s in samples])
        else:
            # every row of this host's range is padding (tiny n): decode
            # one sample anyway — the local block must still carry the
            # global (H, W, C) layout for the assembly below
            probe_x, probe_y = ds[0]
            x_loc = np.zeros((0,) + np.shape(probe_x),
                             np.asarray(probe_x).dtype)
            y_loc = np.zeros((0,) + np.shape(probe_y),
                             np.asarray(probe_y).dtype)
    else:
        # no indexable dataset: drain the identically-seeded global loader
        # (full decode on every host) and keep this host's row range
        x_all, y_all = _iterate_all(source)
        n = x_all.shape[0]
        n_total = n + ((-n) % n_shards)
        per_host = n_total // n_proc
        start = rank * per_host
        x_loc = x_all[start:start + per_host]
        y_loc = y_all[start:start + per_host]

    pad = per_host - x_loc.shape[0]
    if pad:
        x_loc = np.concatenate(
            [x_loc, np.zeros((pad,) + x_loc.shape[1:], x_loc.dtype)])
        y_loc = np.concatenate(
            [y_loc, np.zeros((pad,) + y_loc.shape[1:], y_loc.dtype)])
    if dtype is not None:
        x_loc = x_loc.astype(dtype)

    per_device = (x_loc.nbytes + y_loc.nbytes) * n_proc // n_shards
    if not fits_on_device_bytes(per_device):
        raise ValueError(
            f"cache_on_device: resident cache needs {per_device / 2**30:.1f}"
            " GiB per device — more than half of one chip's HBM. Use the "
            "streaming loader path (drop --resident_data) or shard the "
            "cache over a larger mesh.")

    x = jax.make_array_from_process_local_data(
        sharding, x_loc, (n_total,) + x_loc.shape[1:])
    y = jax.make_array_from_process_local_data(
        sharding, y_loc, (n_total,) + y_loc.shape[1:])
    return ResidentData(x, y, n)


def epoch_batch_plan(key, n_real: int, batch_size: int, *,
                     shuffle: bool = True):
    """Shared per-epoch batching prologue for every resident scanned path
    (the train loop's and the sweep trial groups') — one place for the
    clamp/permutation/key-split logic so the two cannot diverge. Returns
    ``(idx[steps, bs], aug_keys[steps], drop_keys[steps])``; callers that
    thread their RNG elsewhere just ignore the key arrays."""
    bs = min(batch_size, n_real)  # tiny sets: clamp instead of 0 steps
    steps = n_real // bs
    k_perm, k_aug, k_drop = jax.random.split(key, 3)
    if shuffle:
        perm = jax.random.permutation(k_perm, n_real)
    else:
        perm = jnp.arange(n_real)
    idx = perm[: steps * bs].reshape(steps, bs)
    return idx, jax.random.split(k_aug, steps), jax.random.split(k_drop, steps)


def _make_scan_fn(body, batch_sharding):
    """The ONE gather+shard+scan implementation both epoch shapes share
    (whole-epoch and segmented) — so a fix to batch gathering or sharding
    can never apply to one and silently miss the other."""

    def scan(state, x, y, idx):
        def scan_body(st, ix):
            xb = jnp.take(x, ix, axis=0)
            yb = jnp.take(y, ix, axis=0)
            if batch_sharding is not None:
                xb = jax.lax.with_sharding_constraint(xb, batch_sharding)
                yb = jax.lax.with_sharding_constraint(yb, batch_sharding)
            return body(st, xb, yb)

        return jax.lax.scan(scan_body, state, idx)

    return scan


def make_train_epoch(apply_fn, optimizer, *, batch_size: int,
                     stateful: bool = False, augment_fn=None,
                     shuffle: bool = True, batch_sharding=None):
    """Build the jitted whole-epoch trainer.

    Returns ``train_epoch(state, x, y, epoch_key, n_real) ->
    (state, losses)`` with ``losses`` shaped (n_real // batch_size,):
    a single compiled program that shuffles, gathers, (optionally)
    augments, and steps through every batch via ``lax.scan``. ``state`` is
    donated; the cache arrays are read-only and never copied.

    ``shuffle=False`` runs batches in index order — used by the parity
    tests to pin resident == per-step bit-exactly.
    """
    body = make_step_body(apply_fn, optimizer, stateful=stateful,
                          augment_fn=augment_fn)
    scan = _make_scan_fn(body, batch_sharding)

    @partial(jax.jit, donate_argnums=0, static_argnums=4)
    def train_epoch(state, x, y, epoch_key, n_real: int):
        # per-step aug/dropout randomness threads through state.rng in
        # make_step_body, so only the batch plan's idx is consumed here
        idx, _, _ = epoch_batch_plan(epoch_key, n_real, batch_size,
                                     shuffle=shuffle)
        return scan(state, x, y, idx)

    return train_epoch


def make_train_epoch_segmented(apply_fn, optimizer, *, batch_size: int,
                               stateful: bool = False, augment_fn=None,
                               shuffle: bool = True, batch_sharding=None):
    """Segmented variant of :func:`make_train_epoch`, bounding preemption
    drain latency.

    Returns ``(plan, segment)``:

    - ``plan(epoch_key, n_real) -> idx`` — the SAME per-epoch batch plan
      the one-dispatch path derives (``epoch_batch_plan``), jitted
      separately so the host can slice it into blocks;
    - ``segment(state, x, y, idx_block) -> (state, losses)`` — scans only
      that block (state donated).

    Running the segments back-to-back threads state through exactly the
    same step sequence as one whole-epoch scan, so a host-side preemption
    check CAN run between segments: drain latency drops from one epoch to
    one segment while keeping K-dispatches-per-epoch amortization (vs one;
    measured cost of K=8 in docs/PERF.md). A preemption saved at a segment
    boundary records ``epoch_step = segment_end``; resume recomputes the
    identical plan from the epoch key and slices from there, so segment
    shapes — and therefore compiled programs — are reused, not recompiled.
    """
    body = make_step_body(apply_fn, optimizer, stateful=stateful,
                          augment_fn=augment_fn)
    scan = _make_scan_fn(body, batch_sharding)

    @partial(jax.jit, static_argnums=1)
    def plan(epoch_key, n_real: int):
        idx, _, _ = epoch_batch_plan(epoch_key, n_real, batch_size,
                                     shuffle=shuffle)
        return idx

    segment = jax.jit(scan, donate_argnums=0)
    return plan, segment


def batch_val_cache(data: ResidentData, batch_size: int,
                    sharding=None) -> tuple[Any, Any, Any]:
    """Reshape a resident validation cache into static scanned batches.

    Returns ``(xb, yb, masks)`` with ``xb``/``yb`` shaped
    (VB, batch_size, H, W, C) and ``masks`` (VB, batch_size) flagging real
    samples — the resident analogue of ``loop._PaddedValLoader``. Padding
    happens on device (the cache is already resident).
    """
    n, npad = data.n, data.x.shape[0]
    vb = max(1, -(-n // batch_size))
    total = vb * batch_size

    out_sharding = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = sharding.spec[0]
        out_sharding = NamedSharding(sharding.mesh, P(None, axis))

    # one jitted global program (not eager ops + device_put): multi-host
    # the cache spans non-addressable devices, where only compiled SPMD
    # programs may touch it — every host dispatches this identically
    @partial(jax.jit, out_shardings=out_sharding)
    def _rebatch(a):
        if total > npad:
            widths = [(0, total - npad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, widths)
        return a[:total].reshape((vb, batch_size) + a.shape[1:])

    x = _rebatch(data.x)
    y = _rebatch(data.y)
    # host numpy (not jnp): an uncommitted array is valid on any mesh the
    # val program runs over — a committed single-device mask would fight
    # the global-mesh inputs multi-host
    mask = (np.arange(total) < n).astype(np.float32).reshape(vb, batch_size)
    return x, y, mask


def make_val_epoch(apply_fn, metric_subset: int = 4, *,
                   with_metrics: bool = True):
    """Jitted whole-set validation: scans ``make_val_body`` over the
    batched cache, returning (VB, 4) rows of
    [masked L1, subset PSNR, subset SSIM, real-sample count] — the same
    per-batch stats the host path stacks, fetched in one transfer.
    ``with_metrics=False`` builds the loss-only program (see
    make_val_body)."""
    body = make_val_body(apply_fn, metric_subset, with_metrics=with_metrics)

    @jax.jit
    def val_epoch(params, model_state, xb, yb, masks):
        def scan_body(_, args):
            x, y, m = args
            loss, psnr, ssim, _ = body(params, model_state, x, y, m)
            return None, jnp.stack([loss, psnr, ssim, jnp.sum(m)])

        _, stats = jax.lax.scan(scan_body, None, (xb, yb, masks))
        return stats

    return val_epoch
