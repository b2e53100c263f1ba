"""Training loop tests: loss decreases, data-parallel == single-device,
LR plateau semantics, checkpoint save/restore round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.parallel import make_mesh, replicate, shard_batch
from image_enhancement_deglaring_tpu.train import (
    ReduceLROnPlateau,
    TrainState,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from image_enhancement_deglaring_tpu.train.loop import set_learning_rate, train_model

SIZE = 32

# One shared model/optimizer/compiled-step per module — whole-model CPU
# compiles are seconds each, so tests reuse a single jit cache.
_MODEL = LightweightUNet()
_OPT = make_optimizer(1e-3, 1e-5)
_STEP = make_train_step(_MODEL.apply, _OPT)


from tests.loaders import ArrayLoader as _ArrayLoader  # noqa: E402


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    rng = np.random.default_rng(0)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)
    return x, y


def _fresh_state(model, optimizer, seed=0):
    params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                 jnp.zeros((1, SIZE, SIZE, 1)))["params"]
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def test_train_step_reduces_loss(toy_data):
    x, y = toy_data
    state = _fresh_state(_MODEL, _OPT)
    step = _STEP
    losses = []
    for _ in range(8):
        state, loss = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_data_parallel_matches_single_device(toy_data):
    x, y = toy_data
    model = _MODEL
    opt = _OPT

    # single device
    state1 = _fresh_state(model, opt, seed=1)
    step1 = _STEP
    for i in range(2):
        state1, loss1 = step1(state1, jnp.asarray(x[:8]), jnp.asarray(y[:8]))

    # 8-device data parallel on the virtual CPU mesh
    mesh = make_mesh(8)
    state8 = _fresh_state(model, opt, seed=1)
    state8 = replicate(state8, mesh)
    step8 = _STEP
    for i in range(2):
        bx, by = shard_batch((jnp.asarray(x[:8]), jnp.asarray(y[:8])), mesh)
        state8, loss8 = step8(state8, bx, by)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_set_learning_rate_no_recompile(toy_data):
    x, y = toy_data
    state = _fresh_state(_MODEL, _OPT)
    step = _STEP
    state, _ = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
    compiles_before = step._cache_size()
    state = set_learning_rate(state, 5e-4)
    state, _ = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
    assert step._cache_size() == compiles_before
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_reduce_lr_on_plateau_torch_semantics():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    assert s.step(1.0) == 1.0  # first value becomes best
    assert s.step(0.5) == 1.0  # improvement
    # plateau: reduction happens on the (patience+1)-th bad epoch
    assert s.step(0.5) == 1.0   # bad 1 (not better by rel threshold)
    assert s.step(0.51) == 1.0  # bad 2
    assert s.step(0.52) == 0.5  # bad 3 -> reduce
    # relative-threshold semantics (threshold=1e-4, best=0.5): improvement
    # requires metric < 0.5 * (1 - 1e-4) = 0.49995. The lr doesn't move
    # either way here, so pin via the bad-epoch counter.
    assert s.step(0.49996) == 0.5      # within threshold -> still bad
    assert s.num_bad_epochs == 1
    assert s.step(0.4999) == 0.5       # just past threshold -> improvement
    assert s.num_bad_epochs == 0
    assert s.best == 0.4999
    # a clear improvement keeps the counter reset
    assert s.step(0.4) == 0.5
    assert s.num_bad_epochs == 0 and s.best == 0.4


def test_checkpoint_roundtrip(tmp_path, toy_data):
    x, y = toy_data
    state = _fresh_state(_MODEL, _OPT)
    step = _STEP
    state, _ = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))

    path = save_checkpoint(str(tmp_path / "ckpt"), params=state.params,
                           opt_state=state.opt_state, epoch=3, val_loss=0.12,
                           extra={"lr_state": {"lr": 1e-3, "best": 0.12,
                                               "num_bad_epochs": 0}})
    item, meta = restore_checkpoint(path)
    assert meta["epoch"] == 3 and meta["val_loss"] == 0.12
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(item["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: one more identical step from restored state == from live state
    restored = TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, item["params"]),
        opt_state=jax.tree_util.tree_map(jnp.asarray, item["opt_state"]),
        step=jnp.asarray(1, jnp.int32),
    )
    # opt_state restored as plain pytree loses the NamedTuple types; rebuild
    # through the canonical structure instead
    ref_struct = jax.tree_util.tree_structure(state.opt_state)
    restored_opt = jax.tree_util.tree_unflatten(
        ref_struct, jax.tree_util.tree_leaves(item["opt_state"])
    )
    restored = restored.replace(opt_state=jax.tree_util.tree_map(jnp.asarray, restored_opt))
    s_live, l_live = step(state, jnp.asarray(x[8:]), jnp.asarray(y[8:]))
    s_rest, l_rest = step(restored, jnp.asarray(x[8:]), jnp.asarray(y[8:]))
    np.testing.assert_allclose(float(l_live), float(l_rest), rtol=1e-6)


def test_train_model_end_to_end(tmp_path, toy_data):
    x, y = toy_data
    model = LightweightUNet()
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    best_params, _bms, best_val, state = train_model(
        model, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(tmp_path), save_every=10, progress=False,
    )
    assert np.isfinite(best_val)
    assert (tmp_path / "best_model").exists()
    n_leaves = len(jax.tree_util.tree_leaves(best_params))
    assert n_leaves == 64  # 9 blocks * 6 + 4 upconvs * 2 + output w/b


def test_stateful_training_enhanced_unet(tmp_path, toy_data):
    """EnhancedUNet carries batch_stats + dropout; the loop must thread
    mutable collections and rngs through the jitted step."""
    from image_enhancement_deglaring_tpu.models import EnhancedUNet

    x, y = toy_data
    # 5-level model needs >= 2^5 spatial extent
    x64 = np.repeat(np.repeat(x[:8], 2, axis=1), 2, axis=2)
    y64 = np.repeat(np.repeat(y[:8], 2, axis=1), 2, axis=2)
    train_loader = _ArrayLoader(x64, y64, 4)
    best_params, _bms, best_val, state = train_model(
        EnhancedUNet(), train_loader, _ArrayLoader(x64[:4], y64[:4], 4),
        epochs=1, lr=1e-3, output_dir=str(tmp_path), progress=False,
    )
    assert np.isfinite(best_val)
    assert "batch_stats" in state.model_state
    # running stats must have moved away from init
    bs = jax.tree_util.tree_leaves(state.model_state["batch_stats"])
    assert any(not np.allclose(np.asarray(b), 0) for b in bs)
    # the returned best snapshot must carry the MATCHING batch_stats so a
    # final_model saved from it stays loadable for eval/serving
    assert "batch_stats" in _bms
    from image_enhancement_deglaring_tpu.eval import load_model_for_eval

    final = str(tmp_path / "final_model")
    save_checkpoint(final, params=best_params, model_state=_bms)
    apply_fn, loaded = load_model_for_eval(final, model_arch="auto")
    out = apply_fn({"params": loaded}, jnp.zeros((1, 64, 64, 1)))
    assert out.shape == (1, 64, 64, 1)


def test_empty_val_loader_uses_train_loss(tmp_path, toy_data):
    """No validation data: the loop must not silently early-stop after
    `patience` epochs on a constant val_loss of 0.0."""
    x, y = toy_data
    train_loader = _ArrayLoader(x, y, 8)
    empty = _ArrayLoader(x[:0], y[:0], 8)
    best_params, _bms, best_val, _state = train_model(
        _MODEL, train_loader, empty, epochs=4, lr=1e-3, patience=2,
        output_dir=str(tmp_path), progress=False,
    )
    # best tracking follows the (decreasing) train loss -> finite, non-zero
    assert np.isfinite(best_val) and best_val > 0


def test_val_metrics_clipped_and_nan_safe(toy_data):
    """Padded all-zero rows can give mse=0 -> psnr=inf; the masked metric
    must stay finite. Metrics are computed on CLIPPED output (reference
    eval semantics), loss on the raw output."""
    from image_enhancement_deglaring_tpu.train.loop import make_val_step

    val_step = make_val_step(_MODEL.apply)
    params = jax.jit(_MODEL.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, SIZE, SIZE, 1)))["params"]
    x, y = toy_data
    xb = np.concatenate([x[:2], np.zeros((2, SIZE, SIZE, 1), np.float32)])
    yb = np.concatenate([y[:2], np.zeros((2, SIZE, SIZE, 1), np.float32)])
    mask = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    loss, psnr, ssim, _out = val_step(params, {}, jnp.asarray(xb),
                                      jnp.asarray(yb), jnp.asarray(mask))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(psnr))
    assert np.isfinite(float(ssim))


def test_resume_from_checkpoint_continues_exactly(tmp_path, toy_data):
    """resume_from must restore params + optimizer + LR state so the next
    step equals continuing the original run."""
    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    model = _MODEL
    _, _, _, state1 = train_model(
        model, train_loader, val_loader, epochs=1, lr=1e-3,
        output_dir=str(tmp_path / "a"), save_every=1, progress=False,
    )
    # epoch-1 checkpoint exists; resume and run one more epoch
    _, _, _, state2 = train_model(
        model, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(tmp_path / "b"), save_every=100, progress=False,
        resume_from=str(tmp_path / "a" / "checkpoint_epoch_1"),
    )
    # continuous run for 2 epochs from scratch
    _, _, _, state_full = train_model(
        model, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(tmp_path / "c"), save_every=100, progress=False,
    )
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(state_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resume_preserves_better_preexisting_best(tmp_path, toy_data):
    """Resuming into an output_dir whose best_model is BETTER than anything
    the resumed run will reach must not clobber it: best-val tracking seeds
    from the existing checkpoint instead of inf."""
    from image_enhancement_deglaring_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    out = tmp_path / "run"
    # one epoch to get a real checkpoint to resume from
    train_model(_MODEL, train_loader, val_loader, epochs=1, lr=1e-3,
                output_dir=str(out), save_every=1, progress=False)
    # plant a best_model with an unbeatable val loss and marker params
    marker = jax.tree_util.tree_map(
        lambda a: np.full_like(np.asarray(a), 0.125),
        restore_checkpoint(str(out / "checkpoint_epoch_1"))[0]["params"])
    save_checkpoint(str(out / "best_model"), params=marker, epoch=0,
                    val_loss=1e-9)
    _, _, best_val, _ = train_model(
        _MODEL, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(out), save_every=100, progress=False,
        resume_from=str(out / "checkpoint_epoch_1"),
    )
    assert best_val == pytest.approx(1e-9)  # the planted bar was kept
    kept = restore_checkpoint(str(out / "best_model"))[0]["params"]
    for leaf in jax.tree_util.tree_leaves(kept):
        assert np.all(np.asarray(leaf) == 0.125)  # not overwritten


def test_resume_mismatched_best_structure_restarts_tracking(
        tmp_path, toy_data, capsys):
    """An output_dir reused across --model families: the planted best_model
    has a DIFFERENT parameter structure than the resumed model. The bar
    seeding must detect the mismatch and restart tracking (multi-host it
    would otherwise feed mismatched leaves into broadcast_one_to_all and
    hang the pod), then overwrite with a real same-family best."""
    from image_enhancement_deglaring_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    out = tmp_path / "run"
    train_model(_MODEL, train_loader, val_loader, epochs=1, lr=1e-3,
                output_dir=str(out), save_every=1, progress=False)
    good = restore_checkpoint(str(out / "checkpoint_epoch_1"))[0]["params"]
    # every leaf gets an extra trailing axis: wrong-family stand-in with an
    # unbeatable val loss — taking it as the bar would keep it forever
    alien = jax.tree_util.tree_map(
        lambda a: np.asarray(a)[..., None], good)
    save_checkpoint(str(out / "best_model"), params=alien, epoch=0,
                    val_loss=1e-9)
    _, _, best_val, _ = train_model(
        _MODEL, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(out), save_every=100, progress=False,
        resume_from=str(out / "checkpoint_epoch_1"),
    )
    assert "different parameter structure" in capsys.readouterr().out
    assert best_val > 1e-6  # bar restarted fresh, not the planted 1e-9
    kept = restore_checkpoint(str(out / "best_model"))[0]["params"]
    for a, b in zip(jax.tree_util.tree_leaves(kept),
                    jax.tree_util.tree_leaves(good)):
        assert np.asarray(a).shape == np.asarray(b).shape  # real overwrite


def _RaggedLoader(x, y, batch_size):
    """ArrayLoader that also yields the final partial batch."""
    return _ArrayLoader(x, y, batch_size, ragged_tail=True)


def test_mesh_sharded_validation_matches_single_device(tmp_path, toy_data):
    """In-train validation shards over the mesh (padded+masked ragged final
    batch) and produces the same metrics as a single-device run."""
    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 8)
    val_loader = _RaggedLoader(x[8:15], y[8:15], 4)  # batches of 4 and 3
    common = dict(epochs=2, lr=1e-3, save_every=100, progress=False)
    _, _, best1, _ = train_model(_MODEL, train_loader, val_loader,
                              output_dir=str(tmp_path / "single"), **common)
    _, _, best8, _ = train_model(_MODEL, train_loader, val_loader,
                              output_dir=str(tmp_path / "mesh"),
                              mesh=make_mesh(8), **common)
    np.testing.assert_allclose(best1, best8, rtol=2e-4)


def test_watch_every_logs_param_histograms(tmp_path, toy_data):
    import json

    from image_enhancement_deglaring_tpu.utils import ExperimentLogger

    x, y = toy_data
    logger = ExperimentLogger(str(tmp_path / "logs"))
    train_model(
        _MODEL, _ArrayLoader(x[:8], y[:8], 4), _ArrayLoader(x[8:], y[8:], 4),
        epochs=1, lr=1e-3, output_dir=str(tmp_path), progress=False,
        logger=logger, watch_every=1,
    )
    lines = [json.loads(l) for l in open(tmp_path / "logs" / "metrics.jsonl")]
    hist = [l for l in lines if "_histograms_params" in l]
    assert hist and "params/enc1/conv1" in hist[0]["_histograms_params"]


def test_loss_plot_written(tmp_path, toy_data):
    x, y = toy_data
    train_model(
        _MODEL, _ArrayLoader(x[:8], y[:8], 4), _ArrayLoader(x[8:], y[8:], 4),
        epochs=1, lr=1e-3, output_dir=str(tmp_path), progress=False,
    )
    assert (tmp_path / "loss_plot.png").exists()


def test_stateful_dp_batch_stats_match_single_device(tmp_path, toy_data):
    """EnhancedUNet under data parallelism: BatchNorm statistics are
    computed over the GLOBAL batch (GSPMD turns the batch-axis reduction
    into a cross-device all-reduce), so an 8-device mesh run must produce
    the same running stats and losses as single-device."""
    from image_enhancement_deglaring_tpu.models import EnhancedUNet

    x, y = toy_data
    x64 = np.repeat(np.repeat(x[:8], 2, axis=1), 2, axis=2)
    y64 = np.repeat(np.repeat(y[:8], 2, axis=1), 2, axis=2)

    def run(mesh):
        return train_model(
            EnhancedUNet(), _ArrayLoader(x64, y64, 8),
            _ArrayLoader(x64[:8], y64[:8], 8), epochs=2, lr=1e-3,
            output_dir=str(tmp_path / ("mesh" if mesh else "solo")),
            progress=False, mesh=mesh, seed=0,
        )

    _, bms_solo, best_solo, state_solo = run(None)
    _, bms_mesh, best_mesh, state_mesh = run(make_mesh(8))

    assert best_solo == pytest.approx(best_mesh, rel=2e-3)
    solo_leaves = jax.tree_util.tree_leaves(bms_solo["batch_stats"])
    mesh_leaves = jax.tree_util.tree_leaves(bms_mesh["batch_stats"])
    for a, b in zip(solo_leaves, mesh_leaves):
        # absolute tolerance: running means hover near zero where relative
        # comparison is meaningless. The noise floor is reduction-order
        # float drift amplified by the torch-parity BN momentum (0.9: each
        # batch contributes 10% — measured <=2e-4 here); a per-device-stats
        # bug would differ by the ACCUMULATED local-vs-global batch-mean
        # spread, O(1e-2), still 5x above this bound
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=2e-3)


def test_profile_capture_writes_trace(tmp_path, toy_data):
    """--profile_dir captures a TensorBoard-readable jax trace of the
    first epoch's hot loop."""
    import os

    x, y = toy_data
    train_model(
        _MODEL, _ArrayLoader(x[:8], y[:8], 4), _ArrayLoader(x[8:], y[8:], 4),
        epochs=1, lr=1e-3, output_dir=str(tmp_path / "run"), progress=False,
        profile_dir=str(tmp_path / "trace"), profile_steps=2,
    )
    found = []
    for root, _dirs, names in os.walk(tmp_path / "trace"):
        found += [n for n in names if n.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, "no profiler trace files written"


# ------------------------------------------------ device-side augmentation


def test_device_augment_distributions_match_host_stack():
    """device_augment_batch reproduces optimized_augment's distributions:
    ~half the samples flip (image AND target together), ~half get exactly
    one pixel transform (image only), outputs stay in [0, 1], and targets
    are NEVER pixel-transformed (each one equals the original or its
    mirror exactly)."""
    from image_enhancement_deglaring_tpu.ops.augment_device import (
        device_augment_batch,
    )

    rng = np.random.default_rng(1)
    B, S = 512, 8
    x = rng.random((B, S, S, 1)).astype(np.float32) * 0.5 + 0.25
    y = rng.random((B, S, S, 1)).astype(np.float32) * 0.5 + 0.25
    ax, ay = jax.jit(device_augment_batch)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    ax, ay = np.asarray(ax), np.asarray(ay)

    assert ax.min() >= 0.0 and ax.max() <= 1.0
    flipped = np.array([np.array_equal(ay[i], y[i, :, ::-1]) for i in range(B)])
    unchanged_t = np.array([np.array_equal(ay[i], y[i]) for i in range(B)])
    # every target is exactly original or mirrored — no pixel aug leaked in
    assert np.all(flipped | unchanged_t)
    assert 0.40 < flipped.mean() < 0.60  # HFlip p=0.5

    # pixel transform applied to ~half the IMAGES (relative to the flip
    # the sample received)
    base = np.where(flipped[:, None, None, None], x[:, :, ::-1], x)
    pixel_changed = ~np.isclose(ax, base, atol=1e-7).all(axis=(1, 2, 3))
    assert 0.40 < pixel_changed.mean() < 0.60  # OneOf p=0.5

    # among transformed images, brightness/contrast (affine, image-wide
    # identical slope) should dominate noise 0.8/0.2
    def is_affine(i):
        a = ax[i].ravel().astype(np.float64)
        b = base[i].ravel().astype(np.float64)
        inner = (a > 1e-6) & (a < 1 - 1e-6)  # ignore clipped pixels
        if inner.sum() < 50:
            return True
        coef = np.polyfit(b[inner], a[inner], 1)
        resid = a[inner] - np.polyval(coef, b[inner])
        return float(np.abs(resid).max()) < 1e-4
    affine_frac = np.mean([is_affine(i) for i in np.where(pixel_changed)[0]])
    assert 0.65 < affine_frac < 0.95  # w=.8 vs noise w=.2


def test_device_augment_mesh_parity():
    """The same key over a mesh-sharded batch augments identically to a
    single device (elementwise per sample — no cross-device coupling)."""
    from image_enhancement_deglaring_tpu.ops.augment_device import (
        device_augment_batch,
    )
    from image_enhancement_deglaring_tpu.parallel import (
        batch_sharding,
        make_mesh,
    )

    rng = np.random.default_rng(2)
    x = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    ax1, ay1 = jax.jit(device_augment_batch)(key, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    xs = jax.device_put(jnp.asarray(x), sh)
    ys = jax.device_put(jnp.asarray(y), sh)
    ax8, ay8 = jax.jit(device_augment_batch)(key, xs, ys)
    np.testing.assert_array_equal(np.asarray(ax1), np.asarray(ax8))
    np.testing.assert_array_equal(np.asarray(ay1), np.asarray(ay8))


def test_train_model_device_augment_runs_and_is_deterministic(tmp_path,
                                                              toy_data):
    """device_augment=True trains (augs fused into the compiled step) and
    two runs with the same seed produce identical histories."""
    x, y = toy_data

    def run(out):
        return train_model(
            LightweightUNet(), _ArrayLoader(x, y, 8),
            _ArrayLoader(x[:8], y[:8], 8), epochs=2, lr=1e-3,
            output_dir=str(out), progress=False, device_augment=True,
            validation_metrics_every=100, log_images_every=100)

    bp1, _, bv1, _ = run(tmp_path / "a")
    bp2, _, bv2, _ = run(tmp_path / "b")
    assert np.isfinite(bv1)
    assert bv1 == bv2
    for l1, l2 in zip(jax.tree_util.tree_leaves(bp1),
                      jax.tree_util.tree_leaves(bp2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


# ---------------------------------------- round-3 train/parallel review


def test_resume_restores_step_rng_and_patience(tmp_path, toy_data):
    """Exact continuation: the checkpoint carries (and resume restores) the
    step counter, the rng stream position, and the early-stop counter —
    without them a resumed run replays epoch-0 augment/dropout draws and
    can train up to `patience` extra stale epochs."""
    import json

    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    _, _, _, state1 = train_model(
        _MODEL, train_loader, val_loader, epochs=2, lr=1e-3,
        output_dir=str(tmp_path / "a"), save_every=2, progress=False,
        device_augment=True,
    )
    meta = json.load(open(tmp_path / "a" / "checkpoint_epoch_2" /
                          "train_meta.json"))
    assert meta["step"] == int(np.asarray(state1.step)) > 0
    assert meta["rng"] == np.asarray(state1.rng).tolist()
    assert "epochs_without_improvement" in meta

    _, _, _, state2 = train_model(
        _MODEL, train_loader, val_loader, epochs=3, lr=1e-3,
        output_dir=str(tmp_path / "b"), save_every=100, progress=False,
        device_augment=True,
        resume_from=str(tmp_path / "a" / "checkpoint_epoch_2"),
    )
    _, _, _, state_full = train_model(
        _MODEL, train_loader, val_loader, epochs=3, lr=1e-3,
        output_dir=str(tmp_path / "c"), save_every=100, progress=False,
        device_augment=True,
    )
    # the rng stream CONTINUED (device augmentation draws match the
    # uninterrupted run), so params agree
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(state_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert int(np.asarray(state2.step)) == int(np.asarray(state_full.step))


def test_periodic_checkpoint_counter_is_post_bookkeeping(tmp_path, toy_data):
    """checkpoint_epoch_N's early-stop counter reflects epoch N's OWN
    improvement bookkeeping — saving the pre-update counter makes a resumed
    run early-stop up to save_every epochs off the uninterrupted schedule."""
    import json

    from image_enhancement_deglaring_tpu.utils.explog import ExperimentLogger

    x, y = toy_data
    train_loader = _ArrayLoader(x[:8], y[:8], 4)
    val_loader = _ArrayLoader(x[8:], y[8:], 4)
    logger = ExperimentLogger(str(tmp_path / "log"))
    epochs = 4
    train_model(_MODEL, train_loader, val_loader, epochs=epochs, lr=1e-3,
                output_dir=str(tmp_path / "a"), save_every=1,
                progress=False, logger=logger)
    vals = {}
    with open(tmp_path / "log" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "val_loss" in rec:
                vals[rec["_step"]] = rec["val_loss"]
    best, stale = float("inf"), 0
    for e in range(1, epochs + 1):
        if vals[e] < best:
            best, stale = vals[e], 0
        else:
            stale += 1
        meta = json.load(open(tmp_path / "a" / f"checkpoint_epoch_{e}" /
                              "train_meta.json"))
        assert meta["epochs_without_improvement"] == stale, f"epoch {e}"


def test_val_step_plain_skips_metrics_same_loss(toy_data):
    """The loss-only val program returns the identical loss with zeroed
    metrics (validation_metrics_every gates the SSIM convolutions
    themselves, not just their printing)."""
    from image_enhancement_deglaring_tpu.train.loop import make_val_step

    x, y = toy_data
    model = _MODEL
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1,) + x.shape[1:]))["params"]
    mask = np.ones((4,), np.float32)
    full = make_val_step(model.apply)
    plain = make_val_step(model.apply, with_metrics=False)
    lf, pf, sf, _ = full(params, {}, x[:4], y[:4], mask)
    lp, pp, sp, _ = plain(params, {}, x[:4], y[:4], mask)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    assert float(pf) > 0 and float(sf) != 0
    assert float(pp) == 0.0 and float(sp) == 0.0


def test_train_model_rejects_empty_loaders(tmp_path):
    with pytest.raises(ValueError, match="empty"):
        train_model(_MODEL, _ArrayLoader(np.zeros((0, 16, 16, 1), np.float32),
                                         np.zeros((0, 16, 16, 1), np.float32), 4),
                    _ArrayLoader(np.zeros((0, 16, 16, 1), np.float32),
                                 np.zeros((0, 16, 16, 1), np.float32), 4),
                    epochs=1, output_dir=str(tmp_path), progress=False)


def test_cache_on_device_fallback_rejects_augmenting_loader(toy_data):
    """The batch-iteration fallback path applies the same frozen-
    augmentation guard as the indexable-dataset path."""
    from image_enhancement_deglaring_tpu.train.resident import cache_on_device

    x, y = toy_data

    class _AugLoader:
        augment = "optimized"  # marker, no .dataset attribute

        def __iter__(self):
            yield x[:4], y[:4]

    with pytest.raises(ValueError, match="augment"):
        cache_on_device(_AugLoader())
