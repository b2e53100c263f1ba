"""Hyperparameter sweeps, fanned out across TPU chips.

The reference runs a W&B Bayesian sweep with Hyperband early termination,
one trial at a time in one process (reference: sweep.py:41-91, :241 —
search space: batch_size in {4,8,16,32}, lr ~ logU[1e-4,1e-2],
wd ~ logU[1e-6,1e-3]; fixed AMP, grad-clip 1.0, image 512, 'basic' model).

TPU-native redesign:
- trials with the same batch size are **vmapped into one lock-step group**:
  parameter/optimizer pytrees gain a leading trial axis that is **sharded
  across the device mesh**, so N trials train simultaneously, one per chip,
  from a single jitted step (hyperparameters lr/wd enter the compiled step
  as traced per-trial arrays — no recompilation between trials);
- every trial sees the same data stream, matching the reference's
  same-seed-per-trial behavior (reference: sweep.py:103);
- search: random sampling or a TPE-style sampler (good/bad kernel density
  split, the same family of estimator W&B's bayes uses) over log-uniform
  lr/wd and categorical batch size;
- early termination: successive halving at Hyperband rungs — after each
  rung only the top 1/eta trials (by val loss) continue.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.metrics import l1_loss
from ..train.lr_control import ReduceLROnPlateau
from .mesh import fetch_replicated, put_from_full, reshard_fn


def _reshard(x, sharding):
    """Re-lay an array out onto ``sharding``. A multi-host array that is
    not fully addressable cannot go through ``device_put``/host copies —
    a jitted identity (cached per sharding, see mesh.reshard_fn) makes XLA
    move it (collectives over ICI/DCN)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return reshard_fn(sharding)(x)
    return put_from_full(x, sharding)

# --------------------------------------------------------------------- space


@dataclass
class SearchSpace:
    batch_sizes: tuple = (4, 8, 16, 32)
    lr_min: float = 1e-4
    lr_max: float = 1e-2
    wd_min: float = 1e-6
    wd_max: float = 1e-3


@dataclass
class Trial:
    trial_id: int
    batch_size: int
    lr: float
    wd: float
    val_losses: list = field(default_factory=list)
    stopped_at: int | None = None  # epoch where it stopped early (if ever)
    # why it stopped: "halving" (dropped at a rung — provably worse than a
    # survivor) vs "patience" (plateaued — may still be the best trial);
    # None while running / ran to max_epochs
    stop_reason: str | None = None

    @property
    def best_val_loss(self) -> float:
        return min(self.val_losses) if self.val_losses else float("inf")


def sample_random(rng: np.random.Generator, n: int, space: SearchSpace,
                  start_id: int = 0) -> list[Trial]:
    trials = []
    for i in range(n):
        trials.append(Trial(
            trial_id=start_id + i,
            batch_size=int(rng.choice(space.batch_sizes)),
            lr=float(np.exp(rng.uniform(np.log(space.lr_min), np.log(space.lr_max)))),
            wd=float(np.exp(rng.uniform(np.log(space.wd_min), np.log(space.wd_max)))),
        ))
    return trials


def sample_tpe(rng: np.random.Generator, n: int, space: SearchSpace,
               history: list[Trial], gamma: float = 0.25,
               n_candidates: int = 64) -> list[Trial]:
    """TPE-style sampling: fit 'good' vs 'bad' KDEs over log(lr), log(wd) of
    completed trials, draw candidates from the good density, keep those
    maximizing good/bad likelihood ratio. Falls back to random until enough
    history exists."""
    # diverged trials (all-NaN losses) must not enter the good/bad split:
    # NaN keys silently misorder sorted() (NaN comparisons are all False),
    # which could put a diverged trial's lr/wd in the "good" density
    done = [t for t in history
            if t.val_losses and math.isfinite(t.best_val_loss)]
    # ids continue after EVERY trial ever issued (not just finite ones) so a
    # random fallback wave can never collide with wave-1 trial_ids
    base_id = (max((t.trial_id for t in history), default=-1)) + 1
    if len(done) < 4:
        return sample_random(rng, n, space, start_id=base_id)
    done = sorted(done, key=lambda t: t.best_val_loss)
    n_good = max(1, int(math.ceil(gamma * len(done))))
    good, bad = done[:n_good], done[n_good:] or done[:n_good]

    def kde_logpdf(x, samples, lo, hi):
        samples = np.asarray(samples)
        bw = max((hi - lo) / 6.0, 1e-3) / max(len(samples) ** 0.2, 1.0)
        d = (x[:, None] - samples[None, :]) / bw
        return np.log(np.mean(np.exp(-0.5 * d * d), axis=1) / (bw * np.sqrt(2 * np.pi)) + 1e-12)

    lo_lr, hi_lr = np.log(space.lr_min), np.log(space.lr_max)
    lo_wd, hi_wd = np.log(space.wd_min), np.log(space.wd_max)
    out = []
    for i in range(n):
        cand_lr = rng.uniform(lo_lr, hi_lr, n_candidates)
        cand_wd = rng.uniform(lo_wd, hi_wd, n_candidates)
        score = (
            kde_logpdf(cand_lr, [np.log(t.lr) for t in good], lo_lr, hi_lr)
            - kde_logpdf(cand_lr, [np.log(t.lr) for t in bad], lo_lr, hi_lr)
            + kde_logpdf(cand_wd, [np.log(t.wd) for t in good], lo_wd, hi_wd)
            - kde_logpdf(cand_wd, [np.log(t.wd) for t in bad], lo_wd, hi_wd)
        )
        k = int(np.argmax(score))
        # categorical batch size: sample proportional to good-trial counts
        counts = np.array([
            sum(1 for t in good if t.batch_size == b) + 0.5
            for b in space.batch_sizes
        ])
        bs = int(rng.choice(space.batch_sizes, p=counts / counts.sum()))
        out.append(Trial(trial_id=base_id + i, batch_size=bs,
                         lr=float(np.exp(cand_lr[k])), wd=float(np.exp(cand_wd[k]))))
    return out


# --------------------------------------------------------------- trial group


class VmappedTrialGroup:
    """Train N same-batch-size trials in lock step via vmap, trial axis
    sharded over the mesh.

    ``augment_fn``: optional (key, x, y) -> (x, y) device augmentation
    (ops.augment_device) applied to the SHARED data batch inside BOTH the
    per-step group step and the resident scanned epoch — one draw per
    step, seen identically by every trial, matching the host path where
    the loader augments the one stream all trials consume. Pair it with
    non-augmenting loaders or the batch is augmented twice."""

    def __init__(self, model, trials: list[Trial], *, clip_grad_norm: float = 1.0,
                 mesh=None, seed: int = 42, plateau_patience: int = 5,
                 plateau_factor: float = 0.5, augment_fn=None,
                 prefetch: int = 2):
        self.model = model
        self.trials = trials
        self._prefetch = prefetch
        self.mesh = mesh
        self.batch_size = trials[0].batch_size
        assert all(t.batch_size == self.batch_size for t in trials), \
            "VmappedTrialGroup trials must share one batch size"
        self._base_key = jax.random.PRNGKey(seed)
        # bf16 models (the reference sweep fixes mixed_precision ON): ship
        # inputs in the compute dtype — the model's first op is this exact
        # cast, so host->device bytes halve for free; targets stay f32 so
        # the loss math is untouched (same policy as train.loop:312-315)
        self._input_dtype = (np.dtype("bfloat16")
                             if getattr(model, "dtype", None) == jnp.bfloat16
                             else None)
        self._data_sharding = None
        n = len(trials)
        # physical trial axis pads up to a mesh multiple so trial-axis
        # sharding ALWAYS engages (an unsharded group replicates the full
        # stacked compute onto every device); padded slots train a copy of
        # trial 0's config and are never read back
        n_phys = n
        if mesh is not None:
            d = mesh.devices.size
            n_phys = -(-n // d) * d
        self._n_phys = n_phys
        # device-slot per live trial: identity until keep(mode="mask")
        # retires slots without compacting the stacked arrays
        self._slots = list(range(n))

        # 64² init input: params are shape-independent (all convs), but
        # EnhancedUNet's 5 pool levels + bottleneck pool need >=64 to trace
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 1))
        )
        base_params = variables["params"]
        # non-trainable collections (EnhancedUNet's BatchNorm batch_stats)
        # travel as a stacked per-trial model_state, mirroring the train
        # loop's stateful path (train.loop:103-126) — the reference's sweep
        # can train any of the three families (reference: sweep.py:135-143)
        base_mstate = {k: v for k, v in variables.items() if k != "params"}
        self.stateful = bool(base_mstate)
        # same init for every trial (reference seeds every trial identically,
        # sweep.py:103)
        stack = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_phys,) + x.shape), tree)
        stacked = stack(base_params)
        self.model_state = stack(base_mstate)
        tx_proto = optax.chain(
            optax.clip_by_global_norm(clip_grad_norm),
            optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0),
        )
        opt_state = jax.vmap(tx_proto.init)(stacked)

        pad = n_phys - n
        self.lrs = jnp.asarray([t.lr for t in trials] + [trials[0].lr] * pad,
                               jnp.float32)
        self.wds = jnp.asarray([t.wd for t in trials] + [trials[0].wd] * pad,
                               jnp.float32)
        self._trial_sharding = None
        self.params = stacked
        self.opt_state = opt_state
        self.clip = clip_grad_norm
        self.schedulers = [
            ReduceLROnPlateau(t.lr, factor=plateau_factor, patience=plateau_patience)
            for t in trials
        ]

        self._rep_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # data batches replicate over the mesh whether or not the
            # trial axis shards (which requires n % devices == 0 —
            # n_phys is a mesh multiple by construction)
            self._data_sharding = NamedSharding(mesh, P())
            self._rep_sharding = self._data_sharding
            axis = mesh.axis_names[0]
            tsh = NamedSharding(mesh, P(axis))
            rep = NamedSharding(mesh, P())
            self._trial_sharding = tsh
            # multi-host (mesh spans several processes): every host built
            # the same stacked arrays (same seed), so each contributes its
            # addressable shards — put_from_full; single-host device_put
            put_t = lambda x: (put_from_full(x, tsh)
                               if x.shape[0] == n_phys else x)
            self.params = jax.tree_util.tree_map(put_t, self.params)
            self.model_state = jax.tree_util.tree_map(put_t, self.model_state)
            self.opt_state = jax.tree_util.tree_map(
                lambda x: put_t(x)
                if hasattr(x, "shape") and x.ndim and x.shape[0] == n_phys
                else jax.device_put(x, rep),
                self.opt_state,
            )
            self.lrs = put_from_full(self.lrs, tsh)
            self.wds = put_from_full(self.wds, tsh)

        apply_fn = model.apply
        clip = self.clip
        stateful = self.stateful

        def one_trial_step(params, mstate, opt_state, lr, wd, x, y, key):
            if stateful:
                def loss_fn(p):
                    out, new_ms = apply_fn(
                        {"params": p, **mstate}, x, train=True,
                        mutable=list(mstate.keys()),
                        rngs={"dropout": key})
                    return l1_loss(out, y), new_ms

                (loss, new_ms), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            else:
                def loss_fn(p):
                    return l1_loss(apply_fn({"params": p}, x), y)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                new_ms = mstate
            tx = optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd),
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_ms, opt_state,
                    loss)

        def one_trial_val(params, mstate, x, y):
            if stateful:
                out = apply_fn({"params": params, **mstate}, x, train=False)
            else:
                out = apply_fn({"params": params}, x)
            return l1_loss(out, y)

        # Broadcast the shared data batch across the trial axis inside the
        # compiled step (XLA keeps it lazy) and vmap over everything —
        # jax's batched-kernel/shared-input conv rule mis-handles
        # 1-output-channel convs, so in_axes=None on data is not an option.
        # The dropout key is shared (in_axes=None): every trial sees the
        # same stream, like the shared shuffled data.
        def group_train_step(params, mstate, opt_state, lrs, wds, x, y, key):
            k = lrs.shape[0]  # trial count (shrinks after halving)
            if augment_fn is not None:
                key, k_aug = jax.random.split(key)
                x, y = augment_fn(k_aug, x, y)
            xb = jnp.broadcast_to(x[None], (k,) + x.shape)
            yb = jnp.broadcast_to(y[None], (k,) + y.shape)
            return jax.vmap(one_trial_step,
                            in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
                params, mstate, opt_state, lrs, wds, xb, yb, key)

        def group_val_step(params, mstate, x, y):
            k = jax.tree_util.tree_leaves(params)[0].shape[0]
            xb = jnp.broadcast_to(x[None], (k,) + x.shape)
            yb = jnp.broadcast_to(y[None], (k,) + y.shape)
            return jax.vmap(one_trial_val)(params, mstate, xb, yb)

        self._train_step = jax.jit(group_train_step)
        self._val_step = jax.jit(group_val_step)

        # ---- resident scanned epochs: the whole epoch (shuffle + gather +
        # optional device augmentation + every vmapped trial step) compiles
        # into ONE dispatch over a device-resident cache (train.resident
        # builds the cache) — per-step dispatch latency, the dominant fixed
        # cost of sweeping many trials x epochs x steps from a remote or
        # busy host, is paid once per EPOCH. Trial-axis sharding over the
        # mesh is untouched: the cache is replicated, so each device steps
        # its own trials against a local copy with no collectives.
        def scan_train_epoch(params, mstate, opt_state, lrs, wds, x, y, key,
                             n_real: int, bs: int, shuffle: bool):
            from ..train.resident import epoch_batch_plan

            idx, aug_keys, drop_keys = epoch_batch_plan(
                key, n_real, bs, shuffle=shuffle)

            def body(carry, args):
                p, ms, o = carry
                ix, k_step, k_d = args
                xb = jnp.take(x, ix, axis=0)
                yb = jnp.take(y, ix, axis=0)
                if augment_fn is not None:
                    xb, yb = augment_fn(k_step, xb, yb)
                kt = lrs.shape[0]
                xk = jnp.broadcast_to(xb[None], (kt,) + xb.shape)
                yk = jnp.broadcast_to(yb[None], (kt,) + yb.shape)
                p, ms, o, losses = jax.vmap(
                    one_trial_step, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
                    p, ms, o, lrs, wds, xk, yk, k_d)
                return (p, ms, o), losses

            (params, mstate, opt_state), losses = jax.lax.scan(
                body, (params, mstate, opt_state), (idx, aug_keys, drop_keys))
            return params, mstate, opt_state, losses  # (steps, k)

        self._resident_train = partial(
            jax.jit, donate_argnums=(0, 1, 2), static_argnums=(8, 9, 10)
        )(scan_train_epoch)

        def one_trial_val_masked_sum(params, mstate, x, y, mask):
            if stateful:
                out = apply_fn({"params": params, **mstate}, x, train=False)
            else:
                out = apply_fn({"params": params}, x)
            out = out.astype(jnp.float32)
            per = jnp.mean(jnp.abs(out - y.astype(jnp.float32)), axis=(1, 2, 3))
            return jnp.sum(per * mask)

        def scan_val_epoch(params, mstate, xb, yb, masks):
            kt = jax.tree_util.tree_leaves(params)[0].shape[0]

            def body(acc, args):
                x, y, m = args
                xk = jnp.broadcast_to(x[None], (kt,) + x.shape)
                yk = jnp.broadcast_to(y[None], (kt,) + y.shape)
                sums = jax.vmap(one_trial_val_masked_sum,
                                in_axes=(0, 0, 0, 0, None))(
                    params, mstate, xk, yk, m)
                return acc + sums, None

            acc, _ = jax.lax.scan(body, jnp.zeros(kt, jnp.float32),
                                  (xb, yb, masks))
            return acc

        self._resident_val = jax.jit(scan_val_epoch)

    def _to_mesh(self, x):
        """Multi-host, a host-locally computed array (a PRNG key, a batch
        weight vector) is committed to this process's device 0 and cannot
        feed a jit or eager op over the global mesh alongside trial-sharded
        params — replicate it across the mesh first (bytes, not batches;
        cross-process device_put to a replicated sharding is supported).
        Single-process jit handles the transfer itself."""
        if jax.process_count() > 1 and self._rep_sharding is not None:
            return jax.device_put(x, self._rep_sharding)
        return x

    def train_epoch(self, train_loader, epoch: int) -> np.ndarray:
        """Runs one epoch; per-batch losses STAY ON DEVICE and are fetched
        once at epoch end — a per-step np.asarray would synchronize the
        host on every dispatch, serializing exactly the round-trip the
        pipelined train loop and evaluator avoid."""
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        from ..data.dataset import DevicePrefetcher

        ek = jax.random.fold_in(self._base_key, epoch)
        per_batch = []
        for i, (x, y) in enumerate(
                DevicePrefetcher(train_loader, sharding=self._data_sharding,
                                 prefetch=self._prefetch,
                                 input_dtype=self._input_dtype)):
            (self.params, self.model_state, self.opt_state,
             losses) = self._train_step(
                self.params, self.model_state, self.opt_state,
                self.lrs, self.wds, x, y,
                self._to_mesh(jax.random.fold_in(ek, i)),
            )
            per_batch.append(losses)
        if not per_batch:
            return np.zeros(len(self.trials))
        return fetch_replicated(
            jnp.mean(jnp.stack(per_batch), axis=0))[self._slots]

    def val_epoch(self, val_loader) -> np.ndarray:
        from ..data.dataset import DevicePrefetcher

        per_batch = []
        weights = []
        for x, y in DevicePrefetcher(val_loader,
                                     sharding=self._data_sharding,
                                     prefetch=self._prefetch,
                                     input_dtype=self._input_dtype):
            per_batch.append(
                self._val_step(self.params, self.model_state, x, y))
            weights.append(x.shape[0])
        if not per_batch:
            return np.zeros(len(self.trials))
        # sample-weighted mean (final batch may be short), one device fetch;
        # the weight vector replicates first — an eager op mixing a host-
        # local array with global-mesh arrays is invalid multi-host
        w = self._to_mesh(jnp.asarray(weights, jnp.float32))
        return fetch_replicated(
            jnp.stack(per_batch).T @ w / w.sum())[self._slots]

    def train_epoch_resident(self, data, epoch: int, *,
                             shuffle: bool = True) -> np.ndarray:
        """One epoch over a device-resident cache (train.resident
        ``ResidentData``) in a single compiled dispatch; returns each
        trial's mean loss. The epoch key folds the group seed with the
        epoch index, so every trial sees the same shuffled (and, with
        ``augment_fn``, identically augmented) stream — the reference's
        same-data-per-trial semantics (reference: sweep.py:103)."""
        key = self._to_mesh(jax.random.fold_in(self._base_key, epoch))
        (self.params, self.model_state, self.opt_state,
         losses) = self._resident_train(
            self.params, self.model_state, self.opt_state, self.lrs,
            self.wds, data.x, data.y, key, data.n, self.batch_size, shuffle)
        if losses.shape[0] == 0:
            return np.zeros(len(self.trials))
        return fetch_replicated(jnp.mean(losses, axis=0))[self._slots]

    def val_epoch_resident(self, val_batches, n_real: int) -> np.ndarray:
        """Whole validation set in one dispatch over static padded batches
        (train.resident.batch_val_cache); returns per-trial mean L1 over
        the ``n_real`` real samples — numerically the same sample-weighted
        mean ``val_epoch`` computes from ragged host batches."""
        xb, yb, masks = val_batches
        sums = self._resident_val(self.params, self.model_state, xb, yb,
                                  masks)
        return fetch_replicated(sums)[self._slots] / max(n_real, 1)

    def step_schedulers(self, val_losses: np.ndarray) -> None:
        new = [s.step(float(v)) for s, v in zip(self.schedulers, val_losses)]
        if len(self._slots) == int(self.lrs.shape[0]):
            lrs_host = np.asarray(new, np.float32)
        else:  # mask-mode halving: scatter live lrs into their slots ON
            # HOST (the scheduler values are host floats anyway; an
            # eager .at[].set on a multi-host array can't take them)
            lrs_host = np.array(fetch_replicated(self.lrs), np.float32)
            lrs_host[np.asarray(self._slots)] = np.asarray(new, np.float32)
        if self._trial_sharding is not None and lrs_host.shape[0] % \
                self._trial_sharding.mesh.devices.size == 0:
            self.lrs = put_from_full(lrs_host, self._trial_sharding)
        else:
            self.lrs = jnp.asarray(lrs_host)

    def keep(self, indices: list[int], *, mode: str = "compact") -> None:
        """Drop all but ``indices`` (successive halving).

        ``mode="compact"`` (default) gathers the survivors into smaller
        stacked arrays — less compute per epoch afterwards, but the trial
        axis SHRINKS, so every jitted group program retraces/recompiles
        at the new shape (minutes per rung through a remote-compile
        tunnel, seconds locally).

        ``mode="mask"`` retires slots without touching device arrays:
        shapes stay static (zero recompiles across rungs) while dead
        slots keep training uselessly. Right when remaining-epochs x
        per-epoch cost < recompile cost — short rungs, big compiles.
        Measured tradeoff: docs/PERF.md."""
        if mode == "mask":
            self._slots = [self._slots[i] for i in indices]
            self.trials = [self.trials[i] for i in indices]
            self.schedulers = [self.schedulers[i] for i in indices]
            return
        survivors = [self._slots[i] for i in indices]
        # compacted physical axis stays a mesh multiple (padding repeats the
        # first survivor) so trial-axis sharding survives halving
        n_new = len(survivors)
        if self.mesh is not None:
            d = self.mesh.devices.size
            n_new = -(-n_new // d) * d
        slot_idx = jnp.asarray(
            survivors + [survivors[0]] * (n_new - len(survivors)))
        take = lambda x: jnp.take(x, slot_idx, axis=0)
        n_slots = int(self.lrs.shape[0])
        self.params = jax.tree_util.tree_map(take, self.params)
        self.model_state = jax.tree_util.tree_map(take, self.model_state)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: take(x)
            if hasattr(x, "shape") and x.ndim and x.shape[0] == n_slots
            else x,
            self.opt_state,
        )
        self.lrs = take(self.lrs)
        self.wds = take(self.wds)
        if self._trial_sharding is not None:
            put_t = lambda x: (_reshard(x, self._trial_sharding)
                               if hasattr(x, "shape") and x.ndim
                               and x.shape[0] == n_new else x)
            self.params = jax.tree_util.tree_map(put_t, self.params)
            self.model_state = jax.tree_util.tree_map(put_t, self.model_state)
            self.opt_state = jax.tree_util.tree_map(put_t, self.opt_state)
            self.lrs = put_t(self.lrs)
            self.wds = put_t(self.wds)
        self.trials = [self.trials[i] for i in indices]
        self.schedulers = [self.schedulers[i] for i in indices]
        self._slots = list(range(len(indices)))

    def params_of(self, i: int):
        s = self._slots[i]
        return jax.tree_util.tree_map(lambda x: fetch_replicated(x[s]),
                                      self.params)

    def snapshot_of(self, i: int):
        """Host snapshot of trial ``i``'s weights. Stateless models return
        the bare params tree (the flat-npz artifact convention); stateful
        ones bundle the non-trainable collections alongside —
        ``{"params": ..., "batch_stats": ...}`` — matching the npz layout
        eval.harness expects for EnhancedUNet."""
        params = self.params_of(i)
        if not self.stateful:
            return params
        s = self._slots[i]
        mstate = jax.tree_util.tree_map(lambda x: fetch_replicated(x[s]),
                                        self.model_state)
        return {"params": params, **mstate}


# --------------------------------------------------------------------- sweep


class WandbSweepMirror:
    """Mirrors finished trials to Weights & Biases as one run per trial —
    the reference's sweep lives inside W&B with exactly that shape
    (wandb.sweep + wandb.agent spawn a run per trial,
    reference: sweep.py:231-241). Trials here train lock-step in vmapped
    groups, so each trial's run is created when the trial finishes (dropped
    at a halving rung or fully trained) and its epoch history is replayed.

    Mirroring is best-effort: a wandb/network failure never kills the
    sweep (local JSONL + sweep_results.json stay the source of truth)."""

    def __init__(self, project: str | None = None, group: str | None = None,
                 entity: str | None = None):
        import time

        import wandb  # caller gates on importability

        self._wandb = wandb
        self.project = project
        self.entity = entity
        self.group = group or f"sweep-{int(time.time())}"
        self.mirrored: list[int] = []
        # set once by run_sweep from the first trial group's param shapes;
        # the reference logs the trained model's size into every trial run
        # (reference: sweep.py:209-210)
        self.model_size_mb: float | None = None
        # set by register_sweep when the W&B server accepts a first-class
        # sweep object; None = offline/local, fall back to grouped runs
        self.sweep_id: str | None = None

    def register_sweep(self, *, method: str, min_iter: int, eta: int,
                       space: "SearchSpace", extra_config: dict | None = None,
                       ) -> str | None:
        """Register a FIRST-CLASS W&B sweep object (wandb.sweep), mirroring
        the reference's server-side sweep entity (reference:
        sweep.py:228-235 builds the config at :41-94 then wandb.sweep()s
        it) — this is what buys the W&B sweep UI (parallel-coordinates
        plot, parameter importance, server-side state). Trial runs mirrored
        afterwards attach to the returned sweep id. Best-effort: offline or
        API failure leaves ``sweep_id`` None and the grouped-runs fallback
        carries the same telemetry."""
        config = sweep_server_config(method, min_iter, eta, space)
        if extra_config:
            config.update(extra_config)
        try:
            self.sweep_id = self._wandb.sweep(
                config, project=self.project, entity=self.entity)
        except Exception:  # offline/unauthenticated: grouped-runs fallback
            self.sweep_id = None
        return self.sweep_id

    def mirror_trial(self, trial: "Trial") -> None:
        import os as _os

        try:
            # attach to the registered sweep the way wandb's own agent
            # does — the SDK reads the sweep id from the environment at
            # init time (there is no public init kwarg for it)
            prev = _os.environ.get("WANDB_SWEEP_ID")
            if self.sweep_id is not None:
                _os.environ["WANDB_SWEEP_ID"] = self.sweep_id
            try:
                run = self._wandb.init(
                    project=self.project, entity=self.entity,
                    group=self.group,
                    name=f"trial_{trial.trial_id}", reinit=True,
                    config={"batch_size": trial.batch_size, "lr": trial.lr,
                            "weight_decay": trial.wd},
                )
            finally:
                if self.sweep_id is not None:
                    if prev is None:
                        _os.environ.pop("WANDB_SWEEP_ID", None)
                    else:
                        _os.environ["WANDB_SWEEP_ID"] = prev
            for epoch, v in enumerate(trial.val_losses):
                run.log({"val_loss": v}, step=epoch)
            run.summary["best_val_loss"] = trial.best_val_loss
            if self.model_size_mb is not None:
                run.summary["final_model_size_mb"] = self.model_size_mb
            if trial.stopped_at is not None:
                run.summary["stopped_at_epoch"] = trial.stopped_at
                run.summary["stop_reason"] = trial.stop_reason
            run.finish()
            self.mirrored.append(trial.trial_id)
        except Exception:  # pragma: no cover - network/SaaS failure path
            pass


def _journal_bytes_all_hosts(path: str, is_host0: bool) -> bytes | None:
    """Read the sweep journal with host-0 authority: host 0 reads the
    file, every other host receives the bytes over the wire — the same
    pattern as multi-host checkpoint resume (train/loop.py), because a
    per-host read of a host-local or lagging filesystem would make hosts
    replay DIFFERENT histories and deadlock the lock-step sweep."""
    if jax.process_count() == 1:
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()
    from jax.experimental import multihost_utils

    payload = b""
    if is_host0 and os.path.exists(path):
        with open(path, "rb") as f:
            payload = f.read()
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], np.int64))[0])
    if n == 0:
        return None
    buf = np.zeros(n, np.uint8)
    if is_host0:
        buf = np.frombuffer(payload, np.uint8)
    return multihost_utils.broadcast_one_to_all(buf).tobytes()


def hyperband_rungs(min_iter: int, max_epochs: int, eta: int = 3) -> list[int]:
    """Rung epochs: min_iter, min_iter*eta, ... capped at max_epochs."""
    if min_iter <= 0 or eta <= 1:
        # r would never grow: the while-loop below appends forever (OOM)
        raise ValueError(
            f"hyperband needs min_iter >= 1 and eta >= 2 "
            f"(got min_iter={min_iter}, eta={eta})")
    rungs = []
    r = min_iter
    while r < max_epochs:
        rungs.append(r)
        r *= eta
    rungs.append(max_epochs)
    return rungs


def run_sweep(model_factory, loader_factory, *, n_trials: int = 20,
              max_epochs: int = 50, min_iter: int = 10, eta: int = 3,
              method: str = "tpe", seed: int = 42, mesh=None,
              output_dir: str = "./sweep_out", space: SearchSpace | None = None,
              logger=None, max_parallel_trials: int = 0,
              wandb_mirror: WandbSweepMirror | None = None,
              resident: bool = False, augment_fn=None,
              halving: str = "compact", early_stop_patience: int = 0,
              prefetch: int = 2, preempt_guard=None,
              resume: bool = False, fingerprint: dict | None = None) -> dict:
    """Run a sweep; returns {'best': Trial-dict, 'trials': [...],
    'preempted': bool}.

    Args:
        model_factory: () -> Flax module.
        loader_factory: (batch_size) -> (train_loader, val_loader).
        mesh: optional Mesh; trial groups shard their trial axis over it.
        max_parallel_trials: cap on how many trials train simultaneously in
            one vmapped group (bounds the stacked-params HBM footprint);
            0 = the whole same-batch-size group at once.
        wandb_mirror: optional WandbSweepMirror; each finished trial is
            mirrored to W&B as its own run (reference sweep semantics).
        resident: ship the decoded dataset to device memory ONCE for the
            whole sweep (it is batch-size independent) and run every
            train/val epoch as a single compiled dispatch
            (``VmappedTrialGroup.train_epoch_resident``). Loaders must not
            host-augment (build them with augment='none'); pass
            ``augment_fn`` to keep augmenting on device.
        augment_fn: device augmentation (key, x, y) -> (x, y) applied to
            the shared stream on device — in the resident scanned epoch
            AND in the per-step group path (pair with non-augmenting
            loaders either way).
        halving: "compact" (default) shrinks trial groups at each rung
            (recompiles the group step at the new size); "mask" retires
            slots with static shapes — zero rung recompiles, dead slots
            keep computing (VmappedTrialGroup.keep).
        early_stop_patience: per-trial early stopping — a trial whose val
            loss has not improved for this many consecutive epochs is
            retired (0 = off). The reference applies the same patience
            inside each trial's train_model (reference: sweep.py:35,
            :179-196 -> optimized_train.py:351-356). Retirement always
            uses mask mode (no recompile); retired trials stay eligible
            for best-trial selection — unlike halving drops, a plateaued
            trial can still be the best.
        prefetch: DevicePrefetcher depth for the group's train/val loaders
            (the reference's DataLoader prefetch_factor analogue).
        preempt_guard: optional :class:`train.preempt.PreemptionGuard`. When
            a SIGTERM lands, the sweep stops at the next epoch boundary of
            the current trial group, abandons that group (its trials are
            NOT journaled and re-run on resume — groups are deterministic,
            so no exactness is lost), and returns with ``preempted=True``.
            Every FINISHED group is already journaled, so at most one
            group's partial epochs of compute are lost and drain latency is
            bounded by one epoch. Multi-host the decision is host-uniform
            (``preemption_agreed``). The reference bar: the W&B server
            persists sweep state and agents rejoin
            (reference: sweep.py:231-241).
        resume: continue a journaled sweep in ``output_dir``. The sweep is
            REPLAYED deterministically from ``seed``: sampling reproduces
            the exact trial schedule, groups whose results are in
            ``sweep_journal.jsonl`` restore without training, and the first
            unjournaled group onward trains live — the finished sweep is
            identical (same trials, same best) to one that was never
            interrupted. The journal header pins every schedule-determining
            argument; resuming with different flags fails loudly.
        fingerprint: optional JSON-able dict of RESULT-determining caller
            context (model family, data dir, image size, compute dtype…)
            pinned into the journal header alongside the schedule flags —
            run_sweep cannot see what the factories close over, so the
            caller declares it and a resume whose fingerprint differs
            fails loudly instead of mixing incomparable trial results
            (cli.sweep passes one).
    """
    space = space or SearchSpace()
    rng = np.random.default_rng(seed)
    os.makedirs(output_dir, exist_ok=True)

    # multi-host (mesh spans several processes): every host runs this same
    # function on identical inputs — sampling, ranking and halving are
    # deterministic host-side mirrors of the one global computation, and
    # device fetches are replicated gathers, so state never diverges.
    # Host 0 alone writes artifacts (concurrent identical writes to a
    # shared FS can still corrupt), and halving is forced to mask mode:
    # compact's trial-axis reshape would recompile every group program on
    # every host at each rung — exactly the cost mask mode exists to avoid.
    is_host0 = jax.process_index() == 0
    if jax.process_count() > 1 and halving == "compact":
        if is_host0:
            print("multi-host sweep: forcing halving='mask' (compact "
                  "would recompile each rung on every host)")
        halving = "mask"

    rungs = hyperband_rungs(min_iter, max_epochs, eta)
    all_trials: list[Trial] = []
    best: Trial | None = None
    preempted = False

    from ..train.preempt import preemption_agreed

    def _should_stop() -> bool:
        """Host-uniform preemption check; called at every epoch boundary
        of a live group and between groups. Once True, stays True."""
        nonlocal preempted
        if preempt_guard is None or preempted:
            return preempted
        if preemption_agreed(bool(preempt_guard.triggered)):
            preempted = True
        return preempted

    # ---------------------------------------------------------- journal
    # Every finished trial group appends one line to sweep_journal.jsonl
    # (host 0 writes, after the best-params npz so a journaled group
    # implies its artifacts landed). The header line pins every argument
    # that determines the trial schedule, so a resume with drifted flags
    # fails loudly instead of silently training a different sweep.
    journal_path = os.path.join(output_dir, "sweep_journal.jsonl")
    journal_meta = {
        "n_trials": n_trials, "max_epochs": max_epochs,
        "min_iter": min_iter, "eta": eta, "method": method, "seed": seed,
        "max_parallel_trials": max_parallel_trials, "halving": halving,
        "early_stop_patience": early_stop_patience,
        "space": {"batch_sizes": list(space.batch_sizes),
                  "lr_min": space.lr_min, "lr_max": space.lr_max,
                  "wd_min": space.wd_min, "wd_max": space.wd_max},
        # result-determining caller context (model/data/dtype…): the
        # schedule flags above make the resume REPLAY the same trials, but
        # only the fingerprint makes their restored losses comparable
        "fingerprint": fingerprint,
    }
    journal_restore: list[list[dict]] = []  # FIFO of finished-group records
    if resume:
        raw = _journal_bytes_all_hosts(journal_path, is_host0)
        if raw is None:
            raise FileNotFoundError(
                f"resume requested but no sweep journal at {journal_path}")
        raw_lines = [ln for ln in raw.decode().splitlines() if ln.strip()]
        lines, valid_raw = [], []
        for i, ln in enumerate(raw_lines):
            try:
                lines.append(json.loads(ln))
                valid_raw.append(ln)
            except json.JSONDecodeError:
                if i == len(raw_lines) - 1:
                    # torn trailing write — exactly what an ungraceful kill
                    # (SIGKILL/OOM/hard VM reclaim) mid-append leaves
                    # behind. Drop it: that group simply re-runs
                    # deterministically. Anything torn EARLIER is real
                    # corruption and must not be papered over.
                    break
                raise ValueError(
                    f"corrupt sweep journal at {journal_path}: line {i + 1} "
                    f"is unparseable but is not the final line")
        if not lines or "meta" not in lines[0]:
            raise ValueError(f"corrupt sweep journal at {journal_path}")
        if len(valid_raw) != len(raw_lines) and is_host0:
            # truncate the torn tail NOW: this run appends the re-run
            # group after it, and a torn line mid-file would read as real
            # corruption to the next resume
            with open(journal_path, "w") as f:
                f.write("\n".join(valid_raw) + "\n")
        if lines[0]["meta"] != journal_meta:
            raise ValueError(
                "sweep journal was written with different flags — resume "
                f"must replay the identical schedule.\n  journal: "
                f"{lines[0]['meta']}\n  now:     {journal_meta}")
        journal_restore = [rec["group"] for rec in lines[1:]]
    elif is_host0:
        with open(journal_path, "w") as f:
            f.write(json.dumps({"meta": journal_meta}) + "\n")

    def _restore_group(group_trials: list[Trial], rec: list[dict]) -> None:
        """Adopt a journaled group's results: no training, same appended
        order as the original run (TPE refits see an identical history)."""
        nonlocal best
        by_id = {t.trial_id: t for t in group_trials}
        for r in rec:
            t = by_id[r["trial_id"]]
            if (t.batch_size != r["batch_size"]
                    or not math.isclose(t.lr, r["lr"], rel_tol=1e-12)
                    or not math.isclose(t.wd, r["wd"], rel_tol=1e-12)):
                raise ValueError(
                    f"journaled trial {t.trial_id} hyperparameters do not "
                    "match the replayed sample — the resume run's "
                    "seed/space/flags differ from the original sweep")
            t.val_losses = list(r["val_losses"])
            t.stopped_at = r["stopped_at"]
            t.stop_reason = r["stop_reason"]
            all_trials.append(t)
            # halving-dropped trials stay ineligible for best (provably
            # worse than a survivor when dropped), matching the live path
            if (t.stop_reason != "halving"
                    and any(math.isfinite(v) for v in t.val_losses)
                    and (best is None
                         or t.best_val_loss < best.best_val_loss)):
                # best_trial_params.npz from the original run still holds
                # this trial's weights (journal lines land after the npz)
                best = t

    if wandb_mirror is not None:
        # first-class W&B sweep object (reference: sweep.py:231-235); the
        # grouped-runs fallback inside the mirror covers offline mode
        wandb_mirror.register_sweep(method=method, min_iter=min_iter,
                                    eta=eta, space=space)

    from ..utils.pytree import flatten_tree

    # resident caches: decoded once per sweep (per-sample, so shared by
    # every batch size); val batches re-batched per group batch size.
    # Only the CURRENT batch size's re-batched copy is kept — each one is a
    # full padded replica of the val set (replicated across the mesh), so
    # caching one per batch size would hold len(space.batch_sizes) extra
    # copies in HBM that cache_on_device's capacity gate never accounted
    # for; rebuilding on a batch-size switch is one on-device pad+reshape
    res: dict = {"train": None, "val": None, "val_bs": None,
                 "val_batches": None}

    def resident_data(train_loader, val_loader, bs: int):
        from ..train.resident import batch_val_cache, cache_on_device
        from .mesh import replicated_sharding

        if res["train"] is None:
            rep = replicated_sharding(mesh) if mesh is not None else None
            # bf16 models: cache the train INPUTS in the compute dtype
            # (halves their HBM + one-time ship; targets always stay f32
            # — same policy as DevicePrefetcher / the resident train loop)
            probe = model_factory()
            cache_dtype = (np.dtype("bfloat16")
                           if getattr(probe, "dtype", None) == jnp.bfloat16
                           else None)
            res["train"] = cache_on_device(train_loader, dtype=cache_dtype,
                                           sharding=rep)
            n_val = int(getattr(val_loader, "num_samples", len(val_loader))
                        or 0)
            if n_val:
                res["val"] = cache_on_device(val_loader, sharding=rep)
        rd_val = res["val"]
        if rd_val is not None and res["val_bs"] != bs:
            res["val_batches"] = None  # free the old copy before allocating
            res["val_batches"] = batch_val_cache(rd_val, min(bs, rd_val.n))
            res["val_bs"] = bs
        return res["train"], rd_val, res["val_batches"]

    def run_trial_batch(trials: list[Trial]) -> None:
        nonlocal best
        by_bs: dict[int, list[Trial]] = {}
        for t in trials:
            by_bs.setdefault(t.batch_size, []).append(t)
        for bs, bs_trials in sorted(by_bs.items()):
            train_loader, val_loader = loader_factory(bs)
            n_val_probe = int(getattr(val_loader, "num_samples",
                                      len(val_loader)) or 0)
            if n_val_probe == 0:
                # the train loop warns and falls back to the train loss; a
                # sweep has no per-trial train-loss plumbing for ranking, so
                # the honest behavior is to refuse — every trial would
                # otherwise be ranked on a constant 0.0 "best"
                raise ValueError(
                    "run_sweep: the validation set is empty — trials would "
                    "be ranked on a constant 0.0 val loss. Lower val_split "
                    "or provide more data.")
            chunk = (max_parallel_trials if max_parallel_trials > 0
                     else len(bs_trials))
            for g0 in range(0, len(bs_trials), chunk):
                group_trials = bs_trials[g0 : g0 + chunk]
                # resume fast path: the trial schedule replays
                # deterministically (groups are visited in the same sorted
                # bs/chunk/wave order), so finished groups are consumed
                # from the journal FIFO — a head-of-queue mismatch means
                # the schedule diverged (config drift) and must not be
                # papered over
                if journal_restore:
                    rec = journal_restore.pop(0)
                    if ({r["trial_id"] for r in rec}
                            != {t.trial_id for t in group_trials}):
                        raise ValueError(
                            "sweep journal does not match the replayed "
                            "trial schedule — resume flags/seed/data "
                            "differ from the original sweep")
                    _restore_group(group_trials, rec)
                    continue
                if _should_stop():
                    return
                if resident:
                    # built lazily (inside the chunk loop) so a resume whose
                    # prefix is fully journaled never ships the dataset to
                    # device for groups it will not train
                    rd_train, rd_val, val_batches = resident_data(
                        train_loader, val_loader, bs)
                group = VmappedTrialGroup(model_factory(), group_trials,
                                          mesh=mesh, seed=seed,
                                          augment_fn=augment_fn,
                                          prefetch=prefetch)
                if (wandb_mirror is not None
                        and wandb_mirror.model_size_mb is None):
                    # per-trial param bytes from metadata (axis 0 is the
                    # stacked trial axis) — no device fetch
                    from ..models.model_utils import get_model_size_mb

                    wandb_mirror.model_size_mb = get_model_size_mb(
                        jax.tree_util.tree_map(
                            lambda x: jax.ShapeDtypeStruct(x.shape[1:],
                                                           x.dtype),
                            group.params))
                epoch = 0
                # host snapshot of each trial's params at its BEST epoch —
                # end-of-training weights can be worse than the best loss
                # the results file reports
                best_snap: dict[int, dict] = {}
                # per-trial early stopping (reference: each trial's
                # train_model stops after `patience` stale epochs,
                # optimized_train.py:351-356): finite-aware best + stale
                # counters, persisted across rungs
                stale: dict[int, int] = {}
                fin_best: dict[int, float] = {}
                retired: list[Trial] = []
                # trials finished within this group, in chronological order
                # (patience/halving drops interleaved, survivors last).
                # Global state (all_trials, W&B mirror, journal) is updated
                # ONLY at group end so a preemption mid-group abandons the
                # group atomically — resume re-runs it deterministically.
                finished: list[Trial] = []
                for rung_idx, rung in enumerate(rungs):
                    while epoch < rung and group.trials:
                        if _should_stop():
                            return  # abandon this group; journal has the rest
                        if resident:
                            group.train_epoch_resident(rd_train, epoch)
                            val_losses = (
                                group.val_epoch_resident(val_batches,
                                                         rd_val.n)
                                if val_batches is not None
                                else np.zeros(len(group.trials)))
                        else:
                            group.train_epoch(train_loader, epoch)
                            val_losses = group.val_epoch(val_loader)
                        group.step_schedulers(val_losses)
                        for i, (t, v) in enumerate(zip(group.trials, val_losses)):
                            v = float(v)
                            if v < t.best_val_loss:
                                best_snap[t.trial_id] = group.snapshot_of(i)
                            t.val_losses.append(v)
                            if logger is not None:
                                # the scheduler's CURRENT lr, not the trial's
                                # initial sample — plateau decays must show
                                logger.log(
                                    {f"trial_{t.trial_id}/val_loss": v,
                                     f"trial_{t.trial_id}/lr": group.schedulers[i].lr},
                                    step=epoch)
                        epoch += 1
                        if early_stop_patience > 0:
                            keep_idx = []
                            for i, t in enumerate(group.trials):
                                v = t.val_losses[-1]
                                b = fin_best.get(t.trial_id, float("inf"))
                                if np.isfinite(v) and v < b:
                                    fin_best[t.trial_id] = v
                                    stale[t.trial_id] = 0
                                else:
                                    stale[t.trial_id] = stale.get(t.trial_id, 0) + 1
                                if stale[t.trial_id] < early_stop_patience:
                                    keep_idx.append(i)
                            if len(keep_idx) < len(group.trials):
                                kept = set(keep_idx)
                                for i, t in enumerate(group.trials):
                                    if i in kept:
                                        continue
                                    t.stopped_at = epoch
                                    t.stop_reason = "patience"
                                    retired.append(t)
                                    finished.append(t)
                                # always mask mode: per-epoch compaction
                                # would recompile the group step each time
                                # a single trial plateaus; mask keeps
                                # shapes static (keep([]) is also safe)
                                group.keep(keep_idx, mode="mask")
                    if rung_idx < len(rungs) - 1 and len(group.trials) > 1:
                        order = np.argsort([t.best_val_loss for t in group.trials])
                        n_keep = max(1, len(group.trials) // eta)
                        dropped = [group.trials[i] for i in order[n_keep:]]
                        for t in dropped:
                            t.stopped_at = epoch
                            t.stop_reason = "halving"
                            finished.append(t)
                        group.keep([int(i) for i in order[:n_keep]],
                                   mode=halving)
                finished.extend(group.trials)
                all_trials.extend(finished)
                if wandb_mirror is not None:
                    # mirrored only now (group end): a preempted mid-group
                    # run must not leave half a group's runs in W&B that a
                    # resume would duplicate
                    for t in finished:
                        wandb_mirror.mirror_trial(t)
                # patience-retired trials compete for best too: unlike
                # halving drops (provably worse than a survivor when
                # dropped), a plateaued trial can hold the group's best loss
                for t in retired + group.trials:
                    snap = best_snap.get(t.trial_id)
                    if snap is None:
                        # every val loss was non-finite (diverged trial:
                        # NaN < inf is False, so no snapshot was ever taken)
                        # — it has no usable weights and cannot be "best"
                        continue
                    if best is None or t.best_val_loss < best.best_val_loss:
                        best = t
                        if is_host0:  # snapshot_of above stays collective
                            np.savez(
                                os.path.join(output_dir,
                                             "best_trial_params.npz"),
                                **flatten_tree(snap))
                if is_host0:
                    # journaled AFTER the npz write: a journaled group's
                    # artifacts are guaranteed on disk, so resume never
                    # points "best" at weights that were never saved
                    with open(journal_path, "a") as f:
                        f.write(json.dumps({"group": [
                            {"trial_id": t.trial_id,
                             "batch_size": t.batch_size, "lr": t.lr,
                             "wd": t.wd, "val_losses": t.val_losses,
                             "stopped_at": t.stopped_at,
                             "stop_reason": t.stop_reason}
                            for t in finished]}) + "\n")

    if method == "tpe":
        # multi-wave TPE: an exploratory random wave builds the history the
        # good/bad density split needs (sampling everything upfront would
        # degenerate to pure random — there is no history yet); every
        # subsequent wave RE-FITS the densities on all trials run so far —
        # completed AND halving-dropped ones (their partial val histories
        # count, Hyperband-style) — so later waves concentrate around the
        # best region instead of sampling from one stale wave-1 fit
        wave = min(n_trials, max(4, n_trials // 4))
        run_trial_batch(sample_random(rng, wave, space))
        while not preempted and len(all_trials) < n_trials:
            k = min(wave, n_trials - len(all_trials))
            run_trial_batch(sample_tpe(rng, k, space, all_trials))
    else:
        run_trial_batch(sample_random(rng, n_trials, space))

    result = {
        "best": _trial_dict(best),
        "trials": [_trial_dict(t) for t in sorted(all_trials, key=lambda t: t.trial_id)],
        "preempted": preempted,
    }
    # a preempted sweep writes NO results file: sweep_results.json means
    # "the sweep ran to completion" to every downstream consumer (the e2e
    # lifecycle, crossval promotion); the journal holds the partial state
    if is_host0 and not preempted:
        with open(os.path.join(output_dir, "sweep_results.json"), "w") as f:
            json.dump(result, f, indent=2)
    return result


def run_sweep_from_config(model_factory, loader_factory, cfg, *, mesh=None,
                          output_dir: str = "./sweep_out", logger=None,
                          method: str = "tpe",
                          wandb_mirror: WandbSweepMirror | None = None,
                          resident: bool = False, augment_fn=None,
                          halving: str = "compact", preempt_guard=None,
                          resume: bool = False,
                          fingerprint: dict | None = None) -> dict:
    """Run a sweep driven by a :class:`utils.config.SweepConfig`."""
    space = SearchSpace(batch_sizes=tuple(cfg.batch_sizes), lr_min=cfg.lr_min,
                        lr_max=cfg.lr_max, wd_min=cfg.wd_min, wd_max=cfg.wd_max)
    return run_sweep(
        model_factory, loader_factory, n_trials=cfg.sweep_count,
        max_epochs=cfg.max_epochs, min_iter=cfg.hyperband_min_iter,
        eta=cfg.eta, method=method, seed=cfg.seed, mesh=mesh,
        output_dir=output_dir, space=space, logger=logger,
        max_parallel_trials=cfg.parallel_trials, wandb_mirror=wandb_mirror,
        resident=resident, augment_fn=augment_fn, halving=halving,
        early_stop_patience=cfg.early_stop_patience,
        preempt_guard=preempt_guard, resume=resume, fingerprint=fingerprint,
    )


def sweep_server_config(method: str, min_iter: int, eta: int,
                        space: SearchSpace) -> dict:
    """The W&B sweep-server config both the mirror (offline-first mode)
    and the online agent mode register — one builder so the server always
    sees the same search space as the local samplers (reference:
    sweep.py:41-94)."""
    return {
        # W&B only knows bayes/grid/random; our TPE is a Bayesian method,
        # so it maps to 'bayes' like the reference's (:44)
        "method": "bayes" if method in ("tpe", "wandb") else method,
        "metric": {"name": "val_loss", "goal": "minimize"},
        "early_terminate": {"type": "hyperband", "min_iter": min_iter,
                            "eta": eta},
        "parameters": {
            "batch_size": {"values": list(space.batch_sizes)},
            "learning_rate": {"distribution": "log_uniform_values",
                              "min": space.lr_min, "max": space.lr_max},
            "weight_decay": {"distribution": "log_uniform_values",
                             "min": space.wd_min, "max": space.wd_max},
        },
    }


def run_wandb_agent_sweep(model_factory, loader_factory, *,
                          n_trials: int = 20, max_epochs: int = 50,
                          min_iter: int = 10, eta: int = 3, seed: int = 42,
                          mesh=None, output_dir: str = "./sweep_out",
                          space: SearchSpace | None = None, logger=None,
                          project: str | None = None,
                          entity: str | None = None,
                          early_stop_patience: int = 0, prefetch: int = 2,
                          sweep_id: str | None = None,
                          wandb_module=None) -> dict:
    """ONLINE controller mode: the W&B *server* proposes every trial's
    hyperparameters and owns early termination — the reference's exact
    sweep semantics (reference: sweep.py:94-241: ``wandb.agent`` pulls
    server-side Bayes proposals, Hyperband stops runs server-side, state
    persists on the server so agents can rejoin by sweep id).

    Tradeoffs vs the default local TPE mode (documented in
    docs/PARITY.md): server proposals arrive ONE AT A TIME, so trials run
    sequentially — no vmapped lock-step trial groups, no mesh-sharded
    trial axis (a mesh still accelerates each trial's data parallelism).
    Offline or unauthenticated, ``wandb.sweep``/``wandb.agent`` raise and
    the CLI falls back with a pointer at ``--method tpe``.

    ``sweep_id``: attach to an EXISTING server-side sweep instead of
    registering a new one — the reference's crash-recovery story
    (reference: sweep.py:241 comment: rerun the agent with the sweep id).
    ``wandb_module``: injection point for tests; default imports wandb.
    """
    wandb = wandb_module
    if wandb is None:
        import wandb  # noqa: F811 — ImportError surfaces to the CLI
    space = space or SearchSpace()
    os.makedirs(output_dir, exist_ok=True)
    if sweep_id is None:
        sweep_id = wandb.sweep(
            sweep_server_config("wandb", min_iter, eta, space),
            project=project, entity=entity)

    from ..utils.pytree import flatten_tree

    trials: list[Trial] = []
    best: Trial | None = None

    def train_one():
        nonlocal best
        run = wandb.init()
        c = run.config  # the SERVER's proposal for this trial
        t = Trial(trial_id=len(trials),
                  batch_size=int(c["batch_size"]),
                  lr=float(c["learning_rate"]),
                  wd=float(c["weight_decay"]))
        train_loader, val_loader = loader_factory(t.batch_size)
        if not int(getattr(val_loader, "num_samples", len(val_loader)) or 0):
            # same refusal as run_sweep: the server would rank every run
            # on a constant 0.0 val loss
            raise ValueError(
                "run_wandb_agent_sweep: the validation set is empty — "
                "trials would be ranked on a constant 0.0 val loss. "
                "Lower val_split or provide more data.")
        group = VmappedTrialGroup(model_factory(), [t], mesh=mesh,
                                  seed=seed, prefetch=prefetch)
        best_snap = None
        stale, fin_best = 0, float("inf")
        for epoch in range(max_epochs):
            group.train_epoch(train_loader, epoch)
            v = float(group.val_epoch(val_loader)[0])
            group.step_schedulers(np.asarray([v]))
            if np.isfinite(v) and v < t.best_val_loss:
                best_snap = group.snapshot_of(0)
            t.val_losses.append(v)
            run.log({"val_loss": v}, step=epoch)
            if logger is not None:
                logger.log({f"trial_{t.trial_id}/val_loss": v,
                            f"trial_{t.trial_id}/lr": group.schedulers[0].lr},
                           step=epoch)
            # server-side Hyperband: in function mode the agent exposes the
            # stop decision on the run (best-effort — older SDKs lack it,
            # in which case only the local patience below terminates early)
            should_stop = getattr(run, "should_stop", None)
            if callable(should_stop) and should_stop():
                t.stopped_at = epoch + 1
                t.stop_reason = "server"
                break
            if early_stop_patience > 0:
                if np.isfinite(v) and v < fin_best:
                    fin_best, stale = v, 0
                else:
                    stale += 1
                if stale >= early_stop_patience:
                    t.stopped_at = epoch + 1
                    t.stop_reason = "patience"
                    break
        run.summary["best_val_loss"] = t.best_val_loss
        if t.stopped_at is not None:
            run.summary["stopped_at_epoch"] = t.stopped_at
            run.summary["stop_reason"] = t.stop_reason
        run.finish()
        trials.append(t)
        if best_snap is not None and (
                best is None or t.best_val_loss < best.best_val_loss):
            best = t
            np.savez(os.path.join(output_dir, "best_trial_params.npz"),
                     **flatten_tree(best_snap))

    wandb.agent(sweep_id, function=train_one, count=n_trials)

    result = {
        "best": _trial_dict(best),
        "trials": [_trial_dict(t) for t in trials],
        "preempted": False,
        "sweep_id": sweep_id,
    }
    with open(os.path.join(output_dir, "sweep_results.json"), "w") as f:
        json.dump(result, f, indent=2)
    return result


def _trial_dict(t: Trial | None) -> dict | None:
    if t is None:
        return None
    return {
        "trial_id": t.trial_id,
        "batch_size": t.batch_size,
        "lr": t.lr,
        "wd": t.wd,
        "best_val_loss": t.best_val_loss,
        "epochs_run": len(t.val_losses),
        "stopped_at": t.stopped_at,
        "stop_reason": t.stop_reason,
    }
