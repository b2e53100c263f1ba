"""Jitted, data-parallel training loop.

Feature parity with the reference trainer (reference: optimized_train.py:162-369):
L1 loss, AdamW (betas .9/.999, eps 1e-8, decoupled weight decay), global-norm
grad clipping at 1.0, ReduceLROnPlateau, periodic val PSNR/SSIM on a <=4-image
subset per batch, early stopping by patience, periodic + best-model
checkpoints, best-weights restore at the end, experiment logging.

TPU-native design:
- one jitted ``train_step`` (donated state) fuses forward, backward, clip,
  and the optimizer update; compute runs in the model's dtype (bfloat16 by
  default — the MXU-native AMP analogue; no loss scaling needed, matching
  SURVEY's plan for torch.amp parity), params/optimizer in float32;
- data parallelism via a 1-D mesh: params replicated, batch sharded on the
  ``data`` axis; XLA inserts the gradient all-reduce over ICI;
- the LR reaches the compiled step through optax.inject_hyperparams, so
  plateau reductions never trigger recompilation;
- host->HBM transfers are overlapped by DevicePrefetcher double-buffering.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import DevicePrefetcher
from ..ops.metrics import l1_loss, psnr as psnr_fn, ssim as ssim_fn
from ..parallel.mesh import batch_sharding, local_rows, replicate
from .checkpoint import save_checkpoint
from .lr_control import ReduceLROnPlateau
from .preempt import PreemptionGuard, preemption_agreed


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    # non-trainable variable collections (e.g. EnhancedUNet's batch_stats);
    # empty dict for pure-params models
    model_state: Any = flax.struct.field(default_factory=dict)
    # rng for stochastic layers (dropout); threaded through each step
    rng: jax.Array = flax.struct.field(default_factory=lambda: jax.random.PRNGKey(0))


def make_optimizer(lr: float, weight_decay: float, clip_grad_norm: float = 1.0):
    """clip-by-global-norm -> AdamW, with the LR injectable at runtime
    (reference optimizer config: optimized_train.py:439-451, :213-215)."""

    def opt_fn(learning_rate):
        txs = []
        if clip_grad_norm > 0:
            txs.append(optax.clip_by_global_norm(clip_grad_norm))
        txs.append(
            optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=weight_decay)
        )
        return optax.chain(*txs)

    return optax.inject_hyperparams(opt_fn)(learning_rate=lr)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Return state with a new LR injected (no recompilation)."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def make_step_body(apply_fn, optimizer, *, stateful: bool = False,
                   augment_fn=None):
    """Pure (state, x, y) -> (state, loss) training-step body — the math
    shared by the per-step jitted path (``make_train_step``) and the
    resident scanned-epoch path (``train.resident``), so the two modes
    run the same trace (numerics match to float round-off).
    """
    if not stateful:
        def step_body(state: TrainState, x, y):
            rng = state.rng
            if augment_fn is not None:
                rng, aug_key = jax.random.split(state.rng)
                x, y = augment_fn(aug_key, x, y)

            def loss_fn(params):
                out = apply_fn({"params": params}, x)
                return l1_loss(out, y)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1, rng=rng), loss

        return step_body

    def stateful_step_body(state: TrainState, x, y):
        rng, dropout_rng = jax.random.split(state.rng)
        if augment_fn is not None:
            rng, aug_key = jax.random.split(rng)
            x, y = augment_fn(aug_key, x, y)
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            out, new_model_state = apply_fn(
                {"params": params, **state.model_state}, x, train=True,
                mutable=mutable, rngs={"dropout": dropout_rng},
            )
            return l1_loss(out, y), new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1,
                             model_state=new_model_state, rng=rng), loss

    return stateful_step_body


def make_train_step(apply_fn, optimizer, *, stateful: bool = False,
                    augment_fn=None):
    """Jitted fused forward/backward/clip/update step.

    ``stateful=True`` builds the variant for models with non-trainable
    collections and stochastic layers (BatchNorm running stats + Dropout,
    e.g. EnhancedUNet): mutable collections update each step and a dropout
    rng is split from ``state.rng``.

    ``augment_fn``: optional (key, x, y) -> (x, y) device augmentation
    (ops.augment_device) applied INSIDE the compiled step — fuses with the
    forward pass, keyed from the state rng (deterministic per seed).
    """
    body = make_step_body(apply_fn, optimizer, stateful=stateful,
                          augment_fn=augment_fn)
    return partial(jax.jit, donate_argnums=0)(body)


def make_val_body(apply_fn, metric_subset: int = 4, *,
                  with_metrics: bool = True):
    """Pure (params, model_state, x, y, mask) -> (batch L1, subset psnr
    mean, subset ssim mean, prediction) — shared by the jitted per-batch
    ``make_val_step`` and the resident scanned validation epoch.

    ``with_metrics=False`` builds the loss-only program (psnr/ssim return
    0.0): the SSIM windowed convolutions are the expensive part of a val
    step, and ``validation_metrics_every`` epochs should actually skip
    them, not just skip printing them."""

    def val_step(params, model_state, x, y, mask):
        variables = {"params": params, **model_state}
        out = apply_fn(variables, x).astype(jnp.float32)
        yf = y.astype(jnp.float32)
        m = mask[:, None, None, None]
        denom = jnp.maximum(jnp.sum(mask) * np.prod(x.shape[1:]), 1.0)
        loss = jnp.sum(jnp.abs(out - yf) * m) / denom
        if not with_metrics:
            zero = jnp.zeros((), jnp.float32)
            return loss, zero, zero, out
        k = min(metric_subset, x.shape[0])
        # metrics on CLIPPED output (loss stays unclipped) — the reference's
        # eval semantics (reference: evaluate.py:251 vs :259-272)
        pred = jnp.clip(out[:k, ..., 0], 0.0, 1.0)
        tgt = yf[:k, ..., 0]
        mk = mask[:k]
        mk_n = jnp.maximum(jnp.sum(mk), 1.0)
        # where(), not *mask: a padded all-zero row can give mse=0 ->
        # psnr=inf, and inf * 0.0 = NaN would poison the sum
        psnr = jnp.sum(jnp.where(mk > 0, jax.vmap(psnr_fn)(pred, tgt), 0.0)) / mk_n
        ssim = jnp.sum(jnp.where(mk > 0, jax.vmap(ssim_fn)(pred, tgt), 0.0)) / mk_n
        return loss, psnr, ssim, out

    return val_step


def make_val_step(apply_fn, metric_subset: int = 4, *,
                  with_metrics: bool = True):
    """Returns jitted (params, model_state, x, y, mask) -> (batch L1, subset
    psnr mean, subset ssim mean, prediction) — metrics on the first <=4 real
    images like the reference (reference: optimized_train.py:92-122).

    ``mask``: (B,) 1.0 for real samples, 0.0 for padding — ragged final val
    batches are padded to one static, mesh-aligned shape so the compiled
    step never re-specializes and sharded batches divide the mesh evenly.
    """
    return jax.jit(make_val_body(apply_fn, metric_subset,
                                 with_metrics=with_metrics))


class _PaddedValLoader:
    """Pads every (x, y) batch to a fixed, mesh-aligned batch size and
    appends a (B,) real-sample mask, so validation under a mesh shards
    evenly and compiles exactly one program."""

    def __init__(self, loader, static_b: int):
        self.loader = loader
        self.static_b = static_b

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for x, y in self.loader:
            b = x.shape[0]
            if b < self.static_b:
                pad = self.static_b - b
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
            mask = np.zeros((self.static_b,), np.float32)
            mask[:b] = 1.0
            yield x, y, mask


def _val_pad_target(local_batch: int, mesh) -> int:
    """Static padded size for this host's LOCAL validation batches.

    Alignment target is the PER-HOST device count: each host contributes
    ``local`` rows and ``make_array_from_process_local_data`` lays them
    out over this host's ``mesh_size / process_count`` devices. Rounding
    to the GLOBAL device count would inflate the assembled global batch
    (and every validation step's FLOPs) up to process_count-fold."""
    n_dev = mesh.devices.size if mesh is not None else 1
    n_local = max(1, n_dev // jax.process_count())
    return -(-local_batch // n_local) * n_local


def train_model(model, train_loader, val_loader, *, epochs: int,
                lr: float = 0.002362532125818593,
                weight_decay: float = 6.753784966611083e-05,
                clip_grad_norm: float = 1.0, patience: int = 10,
                output_dir: str = "./models_out", save_every: int = 10,
                plateau_factor: float = 0.5, plateau_patience: int = 5,
                validation_metrics_every: int = 5, log_images_every: int = 5,
                mesh=None, seed: int = 42, logger=None, init_params=None,
                progress: bool = True, start_epoch: int = 0,
                resume_state: TrainState | None = None,
                resume_from: str | None = None,
                lr_controller: ReduceLROnPlateau | None = None,
                watch_every: int = 0, profile_dir: str | None = None,
                profile_steps: int = 0, device_augment: bool = False,
                resident: bool = False, prefetch: int = 2,
                preempt_guard=None, handle_preemption: bool = True,
                resident_segments: int = 8):
    """Train ``model`` (a Flax module); returns (best_params,
    best_model_state, best_val_loss, final_state) — best_model_state is the
    mutable-collection snapshot (e.g. BatchNorm batch_stats) taken at the
    same epoch as best_params, so stateful models stay usable ({} for
    stateless ones).

    ``mesh``: optional 1-D jax.sharding.Mesh for data parallelism; batches
    are sharded on its axis, state replicated.
    ``resume_from``: checkpoint directory — restores params, optimizer
    state, model state, epoch, and the LR controller, continuing the run
    exactly where it stopped (the reference can only save, not resume).
    ``resident``: cache the full decoded dataset in device memory once and
    run each epoch as compiled lax.scan dispatches (see train.resident);
    requires non-augmenting loaders (combine with ``device_augment``).
    ``resident_segments``: split each resident epoch into up to K scanned
    dispatches with a preemption check between them — drain latency is
    bounded by one SEGMENT (≈ epoch/K) instead of a whole epoch, which is
    unbounded for large caches. K=1 restores the single-dispatch epoch.
    The step sequence is identical regardless of K (the batch plan is
    derived once per epoch and sliced), and a mid-epoch save lands on a
    segment boundary so resume reuses the same compiled segment shapes.
    Resident mid-epoch checkpoints resume exactly under the same flags
    (the on-device plan is keyed by seed+epoch, not by the loader order —
    do not resume a streaming mid-epoch checkpoint into resident mode or
    vice versa).
    ``preempt_guard``: an entered ``train.preempt.PreemptionGuard`` owned
    by the caller (the CLI inspects it after return to exit 0 promptly);
    with the default ``None`` and ``handle_preemption=True`` the loop
    installs its own. On SIGTERM/SIGINT the in-flight step finishes, a
    checkpoint lands in ``output_dir/preempt_checkpoint`` (mid-epoch exact
    single-process; epoch-boundary with a host-agreement collective
    multi-host), and the function returns early — ``resume_from`` that
    directory continues bitwise-identically.
    """
    os.makedirs(output_dir, exist_ok=True)

    try:
        sample_x, sample_y = next(
            iter(val_loader if len(val_loader) else train_loader))
    except StopIteration:
        raise ValueError(
            "train_model: both loaders are empty — no data to train on")
    init_variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1,) + sample_x.shape[1:])
    )
    model_state = {k: v for k, v in init_variables.items() if k != "params"}
    stateful = bool(model_state)
    if init_params is None:
        init_params = init_variables["params"]
    init_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), init_params
    )

    optimizer = make_optimizer(lr, weight_decay, clip_grad_norm)
    if resume_state is not None:
        state = resume_state
    else:
        state = TrainState(
            params=init_params,
            opt_state=optimizer.init(init_params),
            step=jnp.zeros((), jnp.int32),
            model_state=model_state,
            rng=jax.random.PRNGKey(seed),
        )

    resumed_stale_epochs = 0
    # mid-epoch preemption resume: replay the interrupted epoch from the
    # batch AFTER the last completed step (loaders are per-epoch seeded;
    # per-step randomness rides state.rng, so the skip is exact)
    resume_mid_epoch, resume_skip_steps = -1, 0
    if resume_from is not None:
        from .checkpoint import restore_checkpoint, restore_checkpoint_all_hosts

        if jax.process_count() > 1:
            # host 0 reads, everyone receives: a per-host read of a
            # host-local/lagging checkpoint dir crashes some ranks and
            # hangs the rest, and a host missing train_meta.json would
            # silently start at a different epoch (divergent collectives)
            item, meta = restore_checkpoint_all_hosts(
                resume_from, params_template=init_params,
                opt_state_template=state.opt_state,
                model_state_template=model_state)
        else:
            item, meta = restore_checkpoint(resume_from)
        restored_params = jax.tree_util.tree_map(jnp.asarray, item["params"])
        # restore opt_state into the canonical optax structure (orbax
        # round-trips NamedTuples as plain dicts)
        opt_struct = jax.tree_util.tree_structure(state.opt_state)
        restored_opt = jax.tree_util.tree_unflatten(
            opt_struct,
            [jnp.asarray(x) for x in jax.tree_util.tree_leaves(item["opt_state"])],
        )
        restored_ms = jax.tree_util.tree_map(
            jnp.asarray, item.get("model_state", model_state)
        )
        state = state.replace(params=restored_params, opt_state=restored_opt,
                              model_state=restored_ms)
        # exact continuation, not just params: the step counter, the rng
        # stream position (augment/dropout draws continue instead of
        # replaying epoch 0's), and the early-stop counter (a reset would
        # train up to `patience` extra stale epochs)
        if meta.get("step") is not None:
            state = state.replace(step=jnp.asarray(int(meta["step"]), jnp.int32))
        if meta.get("rng") is not None:
            state = state.replace(
                rng=jnp.asarray(meta["rng"], jnp.uint32))
        resumed_stale_epochs = int(meta.get("epochs_without_improvement", 0))
        if meta.get("mid_epoch"):
            # checkpoint written MID-epoch (preemption): re-enter the
            # interrupted epoch and skip its already-trained batches
            if "resident" in meta and bool(meta["resident"]) != resident:
                saved = "resident" if meta["resident"] else "streaming"
                now = "resident" if resident else "streaming"
                raise ValueError(
                    f"mid-epoch checkpoint was written by a {saved} run but "
                    f"this resume is {now}: the two modes count epoch_step "
                    f"against DIFFERENT batch plans (loader order vs "
                    f"on-device permutation), so the skip would silently "
                    f"train the wrong batches. Resume with the same "
                    f"--resident_data setting as the preempted run.")
            resume_mid_epoch = int(meta.get("epoch", 0))
            resume_skip_steps = int(meta.get("epoch_step", 0))
            start_epoch = max(start_epoch, resume_mid_epoch)
        else:
            start_epoch = max(start_epoch, int(meta.get("epoch", -1)) + 1)
        if lr_controller is None and meta.get("lr_state"):
            lr_controller = ReduceLROnPlateau(lr, factor=plateau_factor,
                                              patience=plateau_patience)
            lr_controller.load_state_dict(meta["lr_state"])
        print(f"Resumed from {resume_from} at epoch {start_epoch}")

    sharding = None
    if mesh is not None:
        state = replicate(state, mesh)
        sharding = batch_sharding(mesh)
    # multi-host (jax.distributed.initialize has run): each process feeds
    # its local slice of every batch; loss/val/early-stop are computed on
    # the GLOBAL sharded arrays so every host takes identical decisions
    # with zero extra coordination. Side-effect writes happen on host 0.
    is_host0 = jax.process_index() == 0
    if jax.process_count() > 1 and resident and mesh is None:
        raise ValueError(
            "multi-host resident training requires the global mesh — the "
            "cache is assembled across processes onto its data axis")

    augment_fn = None
    if device_augment:
        from ..ops.augment_device import device_augment_batch

        augment_fn = device_augment_batch
    train_step = make_train_step(model.apply, optimizer, stateful=stateful,
                                 augment_fn=augment_fn)
    # two compiled val programs: full (loss + PSNR/SSIM) on metric epochs,
    # loss-only otherwise — validation_metrics_every must gate the SSIM
    # convolutions themselves, not just the printing of their results
    val_step_metrics = make_val_step(model.apply)
    val_step_plain = make_val_step(model.apply, with_metrics=False)

    # validation shards over the same mesh as training; ragged final batches
    # pad to one static, mesh-aligned shape (masked out of the metrics)
    val_static_b = _val_pad_target(
        int(getattr(val_loader, "batch_size", sample_x.shape[0]) or 1), mesh)
    padded_val = _PaddedValLoader(val_loader, val_static_b)

    # ship inputs in the model's compute dtype (bf16 halves PCIe/tunnel
    # bytes; the model's first op is this exact cast, so it's free)
    model_dtype = getattr(model, "dtype", None)
    input_dtype = np.dtype("bfloat16") if model_dtype == jnp.bfloat16 else None

    if resident:
        # device-resident mode: decode once, ship once, and run each epoch
        # as a single compiled scan (train.resident)
        from .resident import (batch_val_cache, cache_on_device,
                               make_train_epoch_segmented, make_val_epoch)

        # the fallback peek must come from the TRAIN loader — sample_x may
        # have been peeked from the val loader, whose batch size can differ
        train_batch = int(getattr(train_loader, "batch_size", 0)
                          or next(iter(train_loader))[0].shape[0])
        workers = getattr(train_loader, "num_workers", 8)
        rd_train = cache_on_device(train_loader, dtype=input_dtype,
                                   sharding=sharding, num_workers=workers)
        res_plan_fn, res_segment_fn = make_train_epoch_segmented(
            model.apply, optimizer, batch_size=train_batch,
            stateful=stateful, augment_fn=augment_fn, batch_sharding=sharding,
        )
        n_val = int(getattr(val_loader, "num_samples", len(val_loader)) or 0)
        if n_val:
            # same bf16 input policy as the train cache: the model's first
            # op is the cast, so shipping f32 would just double the bytes
            rd_val = cache_on_device(val_loader, dtype=input_dtype,
                                     sharding=sharding, num_workers=workers)
            # resident batches shard their SECOND axis over the whole mesh
            # (multi-host the loader is GLOBAL, not host-sliced), so the
            # pad target aligns to the global device count — the streaming
            # val_static_b aligns to the per-host count instead
            n_dev = mesh.devices.size if mesh is not None else 1
            res_val_b = -(-int(getattr(val_loader, "batch_size",
                                       val_static_b) or val_static_b)
                          // n_dev) * n_dev
            val_batches = batch_val_cache(rd_val, res_val_b, sharding)
            val_epoch_metrics = make_val_epoch(model.apply)
            val_epoch_plain = make_val_epoch(model.apply, with_metrics=False)
        else:
            val_batches = None

    scheduler = lr_controller or ReduceLROnPlateau(
        lr, factor=plateau_factor, patience=plateau_patience
    )
    state = set_learning_rate(state, scheduler.lr)

    best_val_loss = float("inf")
    best_params = None
    best_model_state = None
    if resume_from is not None:
        # seed best-val tracking from the run's existing best_model:
        # without this, the first post-resume epoch always "improves" on
        # inf and OVERWRITES a genuinely better pre-resume checkpoint
        best_dir = os.path.join(output_dir, "best_model")
        prev = None
        # multi-host: ONLY host 0 reads (output_dir may be host-local
        # disk, and a read that succeeds on some hosts but not others
        # would desynchronize best_val_loss and the early-stop counter —
        # every input to the "identical decisions on every host"
        # invariant must be host-uniform). The result is broadcast below.
        if is_host0 and os.path.isdir(best_dir):
            from .checkpoint import restore_checkpoint

            def _leaves_match(tree, template):
                a = jax.tree_util.tree_leaves(tree)
                b = jax.tree_util.tree_leaves(template)
                return len(a) == len(b) and all(
                    np.shape(x) == np.shape(y) for x, y in zip(a, b))

            try:
                prev_item, prev_meta = restore_checkpoint(best_dir)
                prev_val = prev_meta.get("val_loss")
                prev_ms = prev_item.get("model_state", {})
                # structure gate BEFORE any use (and before the multi-host
                # flag broadcast): an output_dir reused across --model
                # families would otherwise feed mismatched leaves into
                # broadcast_one_to_all (cross-host hang) or save a
                # wrong-family best_model
                if not (_leaves_match(prev_item["params"], init_params)
                        and _leaves_match(prev_ms, model_state)):
                    print(f"Resume: existing best_model in {best_dir} has "
                          "a different parameter structure (different "
                          "--model?); best-model tracking restarts")
                elif prev_val is not None and np.isfinite(prev_val):
                    prev = (float(prev_val), prev_item["params"], prev_ms)
                    print(f"Resume: keeping existing best_model "
                          f"(val loss {prev[0]:.4f}) as the bar")
            except Exception as e:  # corrupt best: start tracking fresh
                print(f"Resume: could not read {best_dir} ({e}); "
                      "best-model tracking restarts")
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flag_val = multihost_utils.broadcast_one_to_all(
                np.asarray([1.0 if prev else 0.0,
                            prev[0] if prev else np.inf]))
            if float(flag_val[0]) > 0.5:
                # leaves ride the KNOWN init structures so hosts whose
                # local disk has no best_model unflatten the same trees
                # in the same order as host 0
                p_flat, p_def = jax.tree_util.tree_flatten(
                    jax.tree_util.tree_map(np.asarray, init_params))
                src = ([np.asarray(x) for x in
                        jax.tree_util.tree_leaves(prev[1])] if prev
                       else [np.zeros_like(x) for x in p_flat])
                best_params = jax.tree_util.tree_unflatten(
                    p_def,
                    list(multihost_utils.broadcast_one_to_all(tuple(src))))
                s_flat, s_def = jax.tree_util.tree_flatten(
                    jax.tree_util.tree_map(np.asarray, model_state))
                if s_flat:
                    src_s = ([np.asarray(x) for x in
                              jax.tree_util.tree_leaves(prev[2])] if prev
                             else [np.zeros_like(x) for x in s_flat])
                    best_model_state = jax.tree_util.tree_unflatten(
                        s_def, list(multihost_utils.broadcast_one_to_all(
                            tuple(src_s))))
                else:
                    best_model_state = {}
                best_val_loss = float(flag_val[1])
        elif prev is not None:
            best_val_loss = prev[0]
            best_params = jax.tree_util.tree_map(np.asarray, prev[1])
            best_model_state = jax.tree_util.tree_map(np.asarray, prev[2])
    epochs_without_improvement = resumed_stale_epochs
    warned_no_val = False
    history = {"train_loss": [], "val_loss": []}

    def _resume_extra():
        # everything exact resume needs beyond the pytrees: LR-controller
        # state, the step counter, the rng stream position, and the
        # early-stop counter (reads the CURRENT loop locals at call time)
        return {"lr_state": scheduler.state_dict(),
                "step": int(np.asarray(state.step)),
                "rng": np.asarray(state.rng).tolist(),
                "epochs_without_improvement": epochs_without_improvement}

    def _save_preempt(epoch_step=None):
        # collective on multi-host (all hosts reach this together via
        # preemption_agreed); epoch_step marks a MID-epoch snapshot whose
        # resume re-enters this epoch at the next batch
        extra = _resume_extra()
        if epoch_step is not None:
            # the mode stamp makes cross-mode resume fail LOUDLY: a
            # streaming mid-epoch skip counts loader-plan batches while the
            # resident skip counts positions in the on-device permutation —
            # resuming one into the other would silently train some batches
            # twice and others never (the step-count guard cannot catch it:
            # the counts still match)
            extra.update(mid_epoch=True, epoch_step=int(epoch_step),
                         resident=bool(resident))
        path = os.path.join(output_dir, "preempt_checkpoint")
        save_checkpoint(path, params=state.params, opt_state=state.opt_state,
                        model_state=state.model_state, epoch=epoch,
                        val_loss=best_val_loss, extra=extra)
        if guard is not None:
            guard.preempt_checkpoint = path  # see PreemptionGuard.__init__
        print(f"Preempted: exact state saved to {path} — continue with "
              f"--resume {path}", flush=True)

    guard = preempt_guard
    own_guard = False
    if guard is None and handle_preemption:
        guard = PreemptionGuard().__enter__()
        own_guard = True
    preempted = False
    try:
        for epoch in range(start_epoch, epochs):
            # ---------------------------------------------------------- train
            t0 = time.time()
            # optional jax profiler capture of the first epoch's hot loop
            # (tensorboard-readable trace; the reference has no profiler)
            profiling = (profile_dir is not None and profile_steps > 0
                         and epoch == start_epoch)
            if profiling:
                jax.profiler.start_trace(profile_dir)
            if resident:
                # the epoch's batch plan, derived once on device; the epoch
                # then runs as K scanned segment dispatches with a
                # preemption check between them (drain latency <= epoch/K;
                # K=1 == the original single-dispatch epoch)
                epoch_key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
                idx = res_plan_fn(epoch_key, rd_train.n)
                steps = int(idx.shape[0])
                n_seg = max(1, min(resident_segments, steps))
                seg_len = -(-steps // n_seg)
                # resident mid-epoch resume: the plan is keyed by
                # seed+epoch, so slicing from the saved boundary replays
                # the identical remaining step sequence
                skip = (resume_skip_steps if epoch == resume_mid_epoch
                        else 0)
                s = min(skip, steps)
                parts: list = []
                mid_step = 0
                while s < steps:
                    e = min(s + seg_len, steps)
                    state, seg_losses = res_segment_fn(
                        state, rd_train.x, rd_train.y, idx[s:e])
                    parts.append(seg_losses)
                    s = e
                    if s < steps and guard is not None:
                        trig = guard.triggered
                        if jax.process_count() > 1:
                            # every host reaches this boundary in lock
                            # step, so the agreement collective is safe
                            # here (unlike the streaming per-step check)
                            trig = preemption_agreed(trig)
                        if trig:
                            preempted = True
                            mid_step = s  # segment boundary == epoch_step
                            break
                losses_np = (np.asarray(jnp.concatenate(parts), np.float64)
                             if parts else np.zeros(0))  # the epoch barrier
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                if preempted:
                    _save_preempt(mid_step)
                    break
                # epoch_batch_plan clamps the step batch to the dataset size, so
                # mirror it — steps * train_batch would overcount on tiny sets
                n_seen = losses_np.size * min(train_batch, rd_train.n)
                train_loss = float(losses_np.mean()) if losses_np.size else 0.0
            else:
                if hasattr(train_loader, "set_epoch"):
                    train_loader.set_epoch(epoch)
                # mid-epoch preemption resume: fast-forward at the batch-PLAN
                # level (set_skip_batches) so already-trained batches cost no
                # decode and no host->device transfer (iterate-and-discard
                # through the prefetcher would decode AND ship every skipped
                # batch — minutes on a big epoch through a slow link); fall
                # back to discarding for loaders without the hook
                skip = resume_skip_steps if epoch == resume_mid_epoch else 0
                plan_skip = (skip if skip and
                             hasattr(train_loader, "set_skip_batches") else 0)
                if plan_skip:
                    train_loader.set_skip_batches(plan_skip)
                try:
                    # plan_skip: len() is already reduced by the skip;
                    # discard fallback: len() is full and `skip` batches
                    # are dropped inside the step loop below
                    planned_steps = (len(train_loader)
                                     - (0 if plan_skip else skip))
                except TypeError:
                    planned_steps = None  # unsized loader: nothing to check
                train_iter = DevicePrefetcher(train_loader, sharding=sharding,
                                              prefetch=prefetch,
                                              input_dtype=input_dtype)
                it = train_iter
                if progress:
                    try:
                        from tqdm import tqdm

                        it = tqdm(train_iter, total=len(train_loader),
                                  desc=f"Epoch {epoch + 1}/{epochs} [Train]")
                    except ImportError:
                        pass
                # keep per-step losses ON DEVICE: float(loss) every step would
                # force a host sync per step, stalling the dispatch pipeline
                # (steps can't overlap with the next batch's transfer); fetch
                # once per epoch
                step_losses: list = []
                step_sizes: list[int] = []
                mid_step = 0
                for i, (x, y) in enumerate(it):
                    # plan_skip batches never reach this loop; with the
                    # discard fallback they do, and are dropped here
                    if not plan_skip and skip and i < skip:
                        continue  # trained before the preemption snapshot
                    state, loss = train_step(state, x, y)
                    step_losses.append(loss)
                    step_sizes.append(x.shape[0])
                    if profiling and i + 1 >= profile_steps:
                        loss.block_until_ready()
                        jax.profiler.stop_trace()
                        profiling = False
                    # single-process: react to SIGTERM after every step
                    # (the in-flight step above already finished); multi-
                    # host defers to the collective epoch-boundary check
                    if (guard is not None and guard.triggered
                            and jax.process_count() == 1):
                        preempted = True
                        # epoch_step counts from the epoch START, so a
                        # resume-of-a-resume skips the right total
                        mid_step = plan_skip + i + 1
                        break
                if plan_skip:  # one-shot: later epochs iterate in full
                    train_loader.set_skip_batches(0)
                if profiling:  # epoch shorter than profile_steps
                    jax.profiler.stop_trace()
                if preempted:
                    _save_preempt(mid_step)
                    break
                # Resume-correctness guard: a completed epoch must have
                # trained exactly the planned number of steps. A loader
                # whose set_skip_batches implementation double-applies the
                # skip (len-driven __iter__, see data/dataset.py contract)
                # would otherwise silently lose training batches.
                if planned_steps is not None and len(step_sizes) != planned_steps:
                    raise RuntimeError(
                        f"epoch {epoch}: trained {len(step_sizes)} steps but "
                        f"the loader planned {planned_steps} (skip={skip}, "
                        f"plan_skip={bool(plan_skip)}) — the loader's "
                        f"set_skip_batches len/iter contract is violated "
                        f"(see data/dataset.py) or batches were dropped")
                n_seen = sum(step_sizes)
                if step_losses:  # one stacked fetch, not one sync per scalar
                    losses_np = np.asarray(jnp.stack(step_losses), np.float64)
                    running = float(losses_np @ np.asarray(step_sizes, np.float64))
                else:
                    running = 0.0
                train_loss = running / max(n_seen, 1)
            history["train_loss"].append(train_loss)
            train_secs = time.time() - t0
            train_ips = n_seen / train_secs if train_secs > 0 else 0.0

            # ------------------------------------------------------------ val
            calc_metrics = (
                (epoch + 1) % validation_metrics_every == 0
                or epoch == 0
                or epoch == epochs - 1
            )
            log_images = logger is not None and (
                (epoch + 1) % log_images_every == 0 or epoch == 0 or epoch == epochs - 1
            )
            if resident:
                # whole validation set in one dispatch + one stats fetch
                vs = None
                if val_batches is not None:
                    val_epoch_fn = (val_epoch_metrics if calc_metrics
                                    else val_epoch_plain)
                    vs = np.asarray(
                        val_epoch_fn(state.params, state.model_state,
                                     *val_batches),
                        np.float64,
                    )
                    if log_images:
                        # host-local forward over the peeked first val batch:
                        # np inputs compile a purely LOCAL program, so host-0-
                        # only logging cannot stall other hosts in a collective
                        # (slicing the mesh-sharded cache here would); params
                        # are replicated, so np.asarray is a local fetch
                        k = min(2, sample_x.shape[0])
                        p_np = jax.tree_util.tree_map(np.asarray, state.params)
                        ms_np = jax.tree_util.tree_map(np.asarray,
                                                       state.model_state)
                        _, _, _, out = val_step_plain(
                            p_np, ms_np, np.asarray(sample_x[:k]),
                            np.asarray(sample_y[:k]),
                            np.ones((k,), np.float32))
                        out_np = np.asarray(out, np.float32)
                        x_np = np.asarray(sample_x[:k], np.float32)
                        y_np = np.asarray(sample_y[:k], np.float32)
                        imgs = {}
                        for i in range(k):
                            imgs[f"input_{i}"] = x_np[i, ..., 0]
                            imgs[f"prediction_{i}"] = np.clip(out_np[i, ..., 0], 0, 1)
                            imgs[f"target_{i}"] = y_np[i, ..., 0]
                        logger.log_images("val", imgs, step=epoch + 1)
            else:
                val_step = val_step_metrics if calc_metrics else val_step_plain
                val_stats: list = []  # per-batch (loss, psnr, ssim, n_real) on device
                for batch_idx, (x, y, mask) in enumerate(
                    DevicePrefetcher(padded_val, sharding=sharding,
                                     prefetch=prefetch,
                                     input_dtype=input_dtype)
                ):
                    loss, psnr, ssim, out = val_step(state.params, state.model_state,
                                                     x, y, mask)
                    val_stats.append(jnp.stack([loss, psnr, ssim, jnp.sum(mask)]))
                    if log_images and batch_idx == 0:
                        # one fetch per batch, not one per logged image;
                        # local_rows: multi-host the global batch is not
                        # fetchable — log from this host's own rows
                        out_np = local_rows(out)
                        k = min(2, out_np.shape[0])
                        x_np = local_rows(x).astype(np.float32)
                        y_np = local_rows(y).astype(np.float32)
                        imgs = {}
                        for i in range(k):
                            imgs[f"input_{i}"] = x_np[i, ..., 0]
                            imgs[f"prediction_{i}"] = np.clip(out_np[i, ..., 0], 0, 1)
                            imgs[f"target_{i}"] = y_np[i, ..., 0]
                        logger.log_images("val", imgs, step=epoch + 1)
                # one stacked fetch for the whole epoch's metrics (per-batch
                # float() would sync the pipeline every step)
                vs = (np.asarray(jnp.stack(val_stats), np.float64)
                      if val_stats else None)
            if vs is not None:
                val_seen = float(vs[:, 3].sum())
                val_loss = float(vs[:, 0] @ vs[:, 3]) / max(val_seen, 1.0)
                val_psnr = float(vs[:, 1].mean())
                val_ssim = float(vs[:, 2].mean())
            else:
                # no validation data: fall back to the train loss as the
                # plateau/early-stop signal — a constant 0.0 here would silently
                # early-stop after `patience` epochs and decay the LR forever
                val_loss = train_loss
                val_psnr = val_ssim = 0.0
                if not warned_no_val:
                    warned_no_val = True
                    print("Warning: validation loader is empty — using the train "
                          "loss for LR scheduling, early stopping, and "
                          "best-model tracking")
            history["val_loss"].append(val_loss)

            # --------------------------------------------- schedule / log / save
            new_lr = scheduler.step(val_loss)
            state = set_learning_rate(state, new_lr)

            msg = (f"Epoch {epoch + 1}/{epochs}: Train Loss: {train_loss:.4f}, "
                   f"Val Loss: {val_loss:.4f}")
            if calc_metrics:
                msg += f", PSNR: {val_psnr:.2f}, SSIM: {val_ssim:.4f}"
            msg += f", LR: {new_lr:.6f} ({time.time() - t0:.1f}s)"
            # flush so redirected logs (nohup, containers) show live progress
            print(msg, flush=True)

            if logger is not None:
                rec = {"epoch": epoch + 1, "train_loss": train_loss,
                       "val_loss": val_loss, "learning_rate": new_lr,
                       "train_images_per_sec": train_ips}
                if calc_metrics:
                    rec["val_psnr"] = val_psnr
                    rec["val_ssim"] = val_ssim
                logger.log(rec, step=epoch + 1)

            if (logger is not None and watch_every > 0
                    and (epoch + 1) % watch_every == 0):
                # wandb.watch analogue (reference: optimized_train.py:179):
                # per-leaf parameter statistics into the metrics stream
                logger.log_histograms(
                    jax.tree_util.tree_map(np.asarray, state.params),
                    step=epoch + 1, prefix="params",
                )

            if val_loss < best_val_loss:
                epochs_without_improvement = 0
                best_val_loss = val_loss
                best_params = jax.tree_util.tree_map(np.asarray, state.params)
                # snapshot the MATCHING mutable collections (BatchNorm stats):
                # best params with another epoch's running stats would be a
                # silently different model
                best_model_state = jax.tree_util.tree_map(np.asarray,
                                                          state.model_state)
                # multi-host: save_checkpoint is COLLECTIVE (orbax barriers all
                # processes and writes from the primary only) — every host must
                # call it; gating on host 0 here would deadlock the barrier
                save_checkpoint(
                    os.path.join(output_dir, "best_model"),
                    params=state.params, opt_state=state.opt_state,
                    model_state=state.model_state, epoch=epoch,
                    val_loss=val_loss, extra=_resume_extra(),
                )
                print(f"New best model with validation loss: {val_loss:.4f}")
                if logger is not None:
                    summary = {"best_val_loss": best_val_loss, "best_epoch": epoch + 1}
                    if calc_metrics:
                        summary["best_val_psnr"] = val_psnr
                        summary["best_val_ssim"] = val_ssim
                    logger.set_summary(**summary)
                    # artifact mirroring (reference: optimized_train.py:340)
                    logger.save(os.path.join(output_dir, "best_model"))
            else:
                epochs_without_improvement += 1
                print(f"No improvement for {epochs_without_improvement} epochs "
                      f"(best: {best_val_loss:.4f}, current: {val_loss:.4f})")
                if logger is not None:
                    logger.log({"epochs_without_improvement": epochs_without_improvement},
                               step=epoch + 1)

            # AFTER the improvement bookkeeping: the checkpoint's resume extras
            # must carry THIS epoch's early-stop counter, not last epoch's
            # (collective on multi-host — see the best_model save above)
            if (epoch + 1) % save_every == 0:
                ckpt_dir = os.path.join(output_dir,
                                        f"checkpoint_epoch_{epoch + 1}")
                save_checkpoint(
                    ckpt_dir,
                    params=state.params, opt_state=state.opt_state,
                    model_state=state.model_state, epoch=epoch,
                    val_loss=val_loss, extra=_resume_extra(),
                )
                if logger is not None:  # reference: optimized_train.py:317
                    logger.save(ckpt_dir)

            if epochs_without_improvement >= patience:
                print(f"Early stopping triggered after {patience} epochs "
                      f"without improvement")
                if logger is not None:
                    logger.set_summary(early_stopped=True,
                                       early_stopping_epoch=epoch + 1)
                break

            # epoch-boundary preemption: catches signals that landed
            # outside the step loop (val, checkpoint writes, resident
            # scanned epochs), and is the ONLY check multi-host — a signal
            # may land on one host, the checkpoint write is collective, so
            # the decision is made host-uniform by preemption_agreed (one
            # tiny allgather per epoch)
            if guard is not None and preemption_agreed(guard.triggered):
                guard.triggered = True  # host-uniform for the caller
                preempted = True
                _save_preempt()
                break

    finally:
        if own_guard:
            guard.__exit__(None, None, None)
    if is_host0:
        _plot_losses(history, output_dir)
    if best_params is None:
        best_params = jax.tree_util.tree_map(np.asarray, state.params)
    if best_model_state is None:
        best_model_state = jax.tree_util.tree_map(np.asarray, state.model_state)
    return best_params, best_model_state, best_val_loss, state


def _plot_losses(history: dict, output_dir: str) -> None:
    """loss_plot.png with train/val curves (reference: optimized_train.py:76-89)."""
    if not history["train_loss"]:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig = plt.figure(figsize=(10, 5))
    plt.plot(history["train_loss"], label="Training Loss")
    plt.plot(history["val_loss"], label="Validation Loss")
    plt.xlabel("Epoch")
    plt.ylabel("L1 Loss")
    plt.title("Training and Validation Losses")
    plt.legend()
    plt.grid(True)
    fig.savefig(os.path.join(output_dir, "loss_plot.png"))
    plt.close(fig)
