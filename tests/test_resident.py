"""Device-resident training tests: the scanned whole-epoch path is
bit-identical to the per-step path on the same batch sequence, the
resident validation epoch matches the per-batch val_step, caching rejects
host-augmenting datasets, and resident train_model runs deterministically
on both one device and a mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
)
from image_enhancement_deglaring_tpu.train import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from image_enhancement_deglaring_tpu.train.loop import make_val_step, train_model
from image_enhancement_deglaring_tpu.train.resident import (
    ResidentData,
    batch_val_cache,
    cache_on_device,
    fits_on_device,
    make_train_epoch,
    make_val_epoch,
)
from tests.loaders import ArrayLoader

SIZE = 32

_MODEL = LightweightUNet()
_OPT = make_optimizer(1e-3, 1e-5)


@pytest.fixture(scope="module")
def toy_data():
    rng = np.random.default_rng(7)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)
    return x, y


def _fresh_state(seed=0):
    params = jax.jit(_MODEL.init)(jax.random.PRNGKey(seed),
                                  jnp.zeros((1, SIZE, SIZE, 1)))["params"]
    return TrainState(params=params, opt_state=_OPT.init(params),
                      step=jnp.zeros((), jnp.int32))


def test_resident_epoch_matches_stepwise(toy_data):
    """shuffle=False resident epoch == the per-step jitted path run over
    the same sequential batches: same losses AND parameters to float32
    round-off (both trace the same make_step_body, but a scanned program
    and a standalone jit may fuse differently, so exact bit equality is
    not guaranteed by XLA)."""
    x, y = toy_data
    B = 8

    state_ref = _fresh_state()
    step = make_train_step(_MODEL.apply, _OPT)
    ref_losses = []
    for i in range(len(x) // B):
        state_ref, loss = step(state_ref, jnp.asarray(x[i * B:(i + 1) * B]),
                               jnp.asarray(y[i * B:(i + 1) * B]))
        ref_losses.append(float(loss))

    data = cache_on_device(ArrayLoader(x, y, B))
    epoch_fn = make_train_epoch(_MODEL.apply, _OPT, batch_size=B,
                                shuffle=False)
    state_res, losses = epoch_fn(_fresh_state(), data.x, data.y,
                                 jax.random.PRNGKey(0), data.n)

    np.testing.assert_allclose(np.asarray(losses, np.float32),
                               np.asarray(ref_losses, np.float32),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_ref.params),
                    jax.tree_util.tree_leaves(state_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resident_shuffled_epoch_covers_each_sample_once(toy_data):
    """With shuffle on, an epoch's gathered indices are a permutation:
    train on a dataset where each sample's loss identifies it (constant
    images), and check the epoch's mean loss equals the dataset mean."""
    B = 4
    n = 16
    levels = (np.arange(n, dtype=np.float32) / n)[:, None, None, None]
    x = np.broadcast_to(levels, (n, SIZE, SIZE, 1)).copy()
    y = np.zeros_like(x)  # per-sample L1 vs 0 ~= its gray level at step 0

    data = cache_on_device(ArrayLoader(x, y, B))
    # lr=0 so parameters never move: every step measures the untouched net
    opt = make_optimizer(0.0, 0.0)

    def fresh():  # donation consumes the state, so each run re-inits
        params = jax.jit(_MODEL.init)(jax.random.PRNGKey(0),
                                      jnp.zeros((1, SIZE, SIZE, 1)))["params"]
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32))

    epoch_fn = make_train_epoch(_MODEL.apply, opt, batch_size=B, shuffle=True)
    _, l1 = epoch_fn(fresh(), data.x, data.y, jax.random.PRNGKey(1), data.n)
    _, l2 = epoch_fn(fresh(), data.x, data.y, jax.random.PRNGKey(2), data.n)

    # different keys -> different batch order, same full-epoch mean
    assert not np.array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(float(jnp.mean(l1)), float(jnp.mean(l2)),
                               rtol=1e-5)


def test_cache_on_device_rejects_augmenting_dataset():
    class _AugDs:
        augment = "optimized"

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((SIZE, SIZE, 1)), np.zeros((SIZE, SIZE, 1))

    with pytest.raises(ValueError, match="augment"):
        cache_on_device(_AugDs())


def test_batch_val_cache_shapes_and_masks(toy_data):
    x, y = toy_data
    data = ResidentData(jnp.asarray(x[:10]), jnp.asarray(y[:10]), 10)
    xb, yb, masks = batch_val_cache(data, 4)
    assert xb.shape == (3, 4, SIZE, SIZE, 1)
    assert yb.shape == xb.shape
    m = np.asarray(masks)
    assert m.shape == (3, 4)
    assert m.sum() == 10 and m[2].tolist() == [1.0, 1.0, 0.0, 0.0]
    # padded rows are zeros (masked out of every metric)
    np.testing.assert_array_equal(np.asarray(xb[2, 2:]), 0.0)


def test_resident_val_epoch_matches_stepwise(toy_data):
    x, y = toy_data
    state = _fresh_state()
    data = cache_on_device(ArrayLoader(x[:10], y[:10], 10,
                                       min_one_batch=True))
    xb, yb, masks = batch_val_cache(data, 4)

    val_step = make_val_step(_MODEL.apply)
    ref = []
    for i in range(xb.shape[0]):
        loss, psnr, ssim, _ = val_step(state.params, {}, xb[i], yb[i],
                                       masks[i])
        ref.append([float(loss), float(psnr), float(ssim),
                    float(masks[i].sum())])

    stats = make_val_epoch(_MODEL.apply)(state.params, {}, xb, yb, masks)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_train_model_resident_deterministic_and_learns(tmp_path, toy_data):
    """resident=True + device augmentation trains end to end; two seeded
    runs are bit-identical and the loss is finite and improving."""
    x, y = toy_data

    def run(out):
        return train_model(
            LightweightUNet(), ArrayLoader(x, y, 8), ArrayLoader(x[:8], y[:8], 8),
            epochs=3, lr=1e-3, output_dir=str(out), progress=False,
            resident=True, device_augment=True,
            validation_metrics_every=100, log_images_every=100)

    bp1, _, bv1, s1 = run(tmp_path / "a")
    bp2, _, bv2, _ = run(tmp_path / "b")
    assert np.isfinite(bv1)
    assert bv1 == bv2
    assert int(s1.step) == 3 * (len(x) // 8)
    for l1, l2 in zip(jax.tree_util.tree_leaves(bp1),
                      jax.tree_util.tree_leaves(bp2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_resident_segment_count_does_not_change_training(tmp_path, toy_data):
    """resident_segments only changes DISPATCH granularity (preemption
    drain latency), never the step sequence: the per-epoch batch plan is
    derived once and sliced, so K=1 (single-dispatch epoch) and K=4 train
    through identical batches and land on the same weights."""
    x, y = toy_data

    def run(out, k):
        return train_model(
            LightweightUNet(), ArrayLoader(x, y, 2),
            ArrayLoader(x[:8], y[:8], 8),
            epochs=2, lr=1e-3, output_dir=str(out), progress=False,
            resident=True, device_augment=True, resident_segments=k,
            validation_metrics_every=100, log_images_every=100)

    bp1, _, bv1, s1 = run(tmp_path / "k1", 1)
    bp4, _, bv4, s4 = run(tmp_path / "k4", 4)
    assert int(s1.step) == int(s4.step) == 2 * (len(x) // 2)
    # same math, different program boundaries: XLA may fuse a 16-step scan
    # differently than four 4-step scans, so float round-off (not bits)
    assert bv4 == pytest.approx(bv1, rel=1e-5)
    for l1, l4 in zip(jax.tree_util.tree_leaves(bp1),
                      jax.tree_util.tree_leaves(bp4)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l4),
                                   rtol=2e-5, atol=1e-6)


def test_resident_mesh_matches_single_device(toy_data):
    """The scanned epoch over an 8-device mesh (cache sharded on the data
    axis, batches constrained to the per-step path's sharding) reproduces
    the single-device epoch."""
    x, y = toy_data
    B = 8
    epoch_key = jax.random.PRNGKey(5)

    data1 = cache_on_device(ArrayLoader(x, y, B))
    fn1 = make_train_epoch(_MODEL.apply, _OPT, batch_size=B)
    s1, l1 = fn1(_fresh_state(), data1.x, data1.y, epoch_key, data1.n)

    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    data8 = cache_on_device(ArrayLoader(x, y, B), sharding=sh)
    fn8 = make_train_epoch(_MODEL.apply, _OPT, batch_size=B,
                           batch_sharding=sh)
    s8, l8 = fn8(replicate(_fresh_state(), mesh), data8.x, data8.y,
                 epoch_key, data8.n)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_resident_stateful_enhanced_unet(tmp_path, toy_data):
    """The scanned epoch threads mutable collections (BatchNorm stats) and
    dropout rngs exactly like the per-step path."""
    from image_enhancement_deglaring_tpu.models import EnhancedUNet

    x, y = toy_data
    # 5-level model needs >= 2^5 spatial extent
    x64 = np.repeat(np.repeat(x[:8], 2, axis=1), 2, axis=2)
    y64 = np.repeat(np.repeat(y[:8], 2, axis=1), 2, axis=2)
    _bp, bms, best_val, state = train_model(
        EnhancedUNet(), ArrayLoader(x64, y64, 4), ArrayLoader(x64[:4], y64[:4], 4),
        epochs=1, lr=1e-3, output_dir=str(tmp_path), progress=False,
        resident=True, device_augment=True,
    )
    assert np.isfinite(best_val)
    assert "batch_stats" in state.model_state
    bs = jax.tree_util.tree_leaves(state.model_state["batch_stats"])
    assert any(not np.allclose(np.asarray(b), 0) for b in bs)
    assert "batch_stats" in bms


def test_fits_on_device_sd1_scale():
    # the reference's full SD1 training set is a few % of one chip's HBM
    assert fits_on_device(1536, 512, dtype=jnp.bfloat16)
    assert not fits_on_device(200_000, 512, dtype=jnp.float32)


def test_cache_dtype_casts_inputs_only(toy_data):
    """bf16 caches follow the DevicePrefetcher policy: inputs ship in the
    compute dtype, targets stay f32 so loss math is untouched."""
    import jax.numpy as jnp

    x, y = toy_data
    data = cache_on_device(ArrayLoader(x, y, 4), dtype=np.dtype("bfloat16"))
    assert data.x.dtype == jnp.bfloat16
    assert data.y.dtype == jnp.float32


def test_epoch_batch_plan_clamps_batch_to_set():
    """batch_size > dataset trains one short step instead of zero."""
    import jax

    from image_enhancement_deglaring_tpu.train.resident import (
        epoch_batch_plan,
    )

    idx, aug_keys, drop_keys = epoch_batch_plan(
        jax.random.PRNGKey(0), 6, 8)
    assert idx.shape == (1, 6)
    assert aug_keys.shape[0] == 1 and drop_keys.shape[0] == 1
    # and the permutation covers the set exactly once at full epochs
    idx2, _, _ = epoch_batch_plan(jax.random.PRNGKey(0), 8, 4)
    assert sorted(np.asarray(idx2).ravel().tolist()) == list(range(8))


def test_cache_on_device_rejects_oversized_cache(toy_data, monkeypatch):
    import image_enhancement_deglaring_tpu.train.resident as resident_mod

    x, y = toy_data
    monkeypatch.setattr(resident_mod, "fits_on_device_bytes",
                        lambda n_bytes, **kw: False)
    with pytest.raises(ValueError, match="HBM"):
        resident_mod.cache_on_device(ArrayLoader(x, y, 4))
