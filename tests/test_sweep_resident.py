"""Resident (device-cached, scanned-epoch) sweep tests: the one-dispatch
group epoch matches the per-step vmapped path, resident validation matches
the ragged host-batch path, and run_sweep(resident=True) works end to end
on both one device and the 8-device mesh."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.ops.augment_device import (
    device_augment_batch,
)
from image_enhancement_deglaring_tpu.parallel import (
    Trial,
    VmappedTrialGroup,
    make_mesh,
    run_sweep,
)
from image_enhancement_deglaring_tpu.train.resident import (
    batch_val_cache,
    cache_on_device,
)
from tests.loaders import ArrayLoader

SIZE = 16


def _tiny_model():
    return LightweightUNet(features_start=2, num_groups=2)


def _trials(n=2, bs=8):
    return [Trial(trial_id=i, batch_size=bs, lr=1e-3 * (i + 1), wd=1e-5)
            for i in range(n)]


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(3)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    return x, y


def test_resident_group_epoch_matches_stepwise(toy):
    """shuffle=False resident epoch == per-step group path over the same
    sequential batches: same mean losses and same parameters."""
    x, y = toy
    bs = 8
    loader = ArrayLoader(x, y, bs)

    g_ref = VmappedTrialGroup(_tiny_model(), _trials(bs=bs), seed=0)
    per_batch = []
    for bx, by in loader:
        (g_ref.params, g_ref.model_state, g_ref.opt_state,
         losses) = g_ref._train_step(
            g_ref.params, g_ref.model_state, g_ref.opt_state,
            g_ref.lrs, g_ref.wds, jnp.asarray(bx), jnp.asarray(by),
            jax.random.PRNGKey(0))
        per_batch.append(np.asarray(losses))
    ref_mean = np.mean(per_batch, axis=0)

    g_res = VmappedTrialGroup(_tiny_model(), _trials(bs=bs), seed=0)
    data = cache_on_device(loader)
    res_mean = g_res.train_epoch_resident(data, 0, shuffle=False)

    np.testing.assert_allclose(res_mean, ref_mean, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref.params),
                    jax.tree_util.tree_leaves(g_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resident_val_matches_stepwise_ragged(toy):
    """Resident masked validation == the sample-weighted host val_epoch,
    including a ragged final batch."""
    x, y = toy
    g = VmappedTrialGroup(_tiny_model(), _trials(), seed=0)

    ragged = ArrayLoader(x[:10], y[:10], 4, ragged_tail=True)
    ref = g.val_epoch(ragged)

    data = cache_on_device(ArrayLoader(x[:10], y[:10], 10,
                                       min_one_batch=True))
    res = g.val_epoch_resident(batch_val_cache(data, 4), data.n)
    np.testing.assert_allclose(res, ref, rtol=1e-5)


def test_resident_shared_augmented_stream(toy):
    """With device augmentation, every trial still sees the SAME stream:
    two trials with identical hyperparameters train bit-identically."""
    x, y = toy
    trials = [Trial(trial_id=i, batch_size=8, lr=1e-3, wd=1e-5)
              for i in range(2)]
    g = VmappedTrialGroup(_tiny_model(), trials, seed=0,
                          augment_fn=device_augment_batch)
    data = cache_on_device(ArrayLoader(x, y, 8))
    losses = g.train_epoch_resident(data, 0)
    assert np.isfinite(losses).all()
    assert losses[0] == losses[1]
    for leaf in jax.tree_util.tree_leaves(g.params):
        a = np.asarray(leaf)
        np.testing.assert_array_equal(a[0], a[1])


def test_resident_epoch_shuffles_per_epoch(toy):
    """Different epochs draw different permutations (losses differ) from
    the seeded fold-in keys, deterministically per group seed."""
    x, y = toy
    # lr=0 trials: parameters never move, so per-step losses expose order
    trials = [Trial(trial_id=0, batch_size=4, lr=0.0, wd=0.0)]
    g1 = VmappedTrialGroup(_tiny_model(), trials, seed=0)
    data = cache_on_device(ArrayLoader(x, y, 4))
    _, _, _, l_e0 = g1._resident_train(
        g1.params, g1.model_state, g1.opt_state, g1.lrs, g1.wds,
        data.x, data.y, jax.random.fold_in(g1._base_key, 0), data.n, 4, True)
    g2 = VmappedTrialGroup(_tiny_model(), trials, seed=0)
    _, _, _, l_e1 = g2._resident_train(
        g2.params, g2.model_state, g2.opt_state, g2.lrs, g2.wds,
        data.x, data.y, jax.random.fold_in(g2._base_key, 1), data.n, 4, True)
    assert not np.array_equal(np.asarray(l_e0), np.asarray(l_e1))
    np.testing.assert_allclose(float(jnp.mean(l_e0)), float(jnp.mean(l_e1)),
                               rtol=1e-5)


def test_run_sweep_resident_end_to_end(tmp_path, toy):
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    result = run_sweep(
        _tiny_model, loader_factory, n_trials=4, max_epochs=2, min_iter=1,
        method="random", seed=0, output_dir=str(tmp_path),
        resident=True, augment_fn=device_augment_batch,
    )
    assert result["best"] is not None
    assert np.isfinite(result["best"]["best_val_loss"])
    assert len(result["trials"]) == 4
    assert os.path.exists(tmp_path / "sweep_results.json")
    assert os.path.exists(tmp_path / "best_trial_params.npz")
    with open(tmp_path / "sweep_results.json") as f:
        assert json.load(f)["best"]["trial_id"] == result["best"]["trial_id"]


def test_resident_group_mesh_matches_single_device(toy):
    """Trial axis sharded over the 8-device mesh + replicated cache
    reproduces the single-device resident epoch."""
    x, y = toy
    bs = 8
    n_trials = 8  # divides the mesh -> trial axis actually shards

    def trials():
        return [Trial(trial_id=i, batch_size=bs, lr=1e-3, wd=1e-5)
                for i in range(n_trials)]

    g1 = VmappedTrialGroup(_tiny_model(), trials(), seed=0)
    d1 = cache_on_device(ArrayLoader(x, y, bs))
    l1 = g1.train_epoch_resident(d1, 0)

    mesh = make_mesh(8)
    from image_enhancement_deglaring_tpu.parallel import replicated_sharding

    g8 = VmappedTrialGroup(_tiny_model(), trials(), mesh=mesh, seed=0)
    d8 = cache_on_device(ArrayLoader(x, y, bs),
                         sharding=replicated_sharding(mesh))
    l8 = g8.train_epoch_resident(d8, 0)

    np.testing.assert_allclose(l1, l8, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1.params),
                    jax.tree_util.tree_leaves(g8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_resident_bf16_group(toy):
    """bf16 trial groups with a bf16 train cache (the sweep CLI default;
    the reference sweep fixes mixed_precision ON) train to finite losses
    near the f32 resident trajectory, with f32 master params."""
    x, y = toy
    g16 = VmappedTrialGroup(
        LightweightUNet(features_start=2, num_groups=2, dtype=jnp.bfloat16),
        _trials(bs=8), seed=0, augment_fn=device_augment_batch)
    d16 = cache_on_device(ArrayLoader(x, y, 8), dtype=np.dtype("bfloat16"))
    l16 = g16.train_epoch_resident(d16, 0)

    g32 = VmappedTrialGroup(_tiny_model(), _trials(bs=8), seed=0,
                            augment_fn=device_augment_batch)
    d32 = cache_on_device(ArrayLoader(x, y, 8))
    l32 = g32.train_epoch_resident(d32, 0)

    assert np.isfinite(l16).all()
    np.testing.assert_allclose(l16, l32, rtol=0.05)
    for leaf in jax.tree_util.tree_leaves(g16.params):
        assert leaf.dtype == jnp.float32
    # f32 val cache against the bf16-trained params
    vdata = cache_on_device(ArrayLoader(x[:8], y[:8], 8))
    v = g16.val_epoch_resident(batch_val_cache(vdata, 8), vdata.n)
    assert np.isfinite(v).all()


def test_stepwise_group_applies_device_augment(toy):
    """augment_fn is honored in the per-step path too (not only resident):
    the augmented run diverges from the raw run, and identical trials
    still see one shared stream."""
    x, y = toy
    trials = [Trial(trial_id=i, batch_size=8, lr=1e-3, wd=1e-5)
              for i in range(2)]
    loader = ArrayLoader(x, y, 8)
    g_raw = VmappedTrialGroup(_tiny_model(), list(trials), seed=0)
    g_aug = VmappedTrialGroup(_tiny_model(), list(trials), seed=0,
                              augment_fn=device_augment_batch)
    l_raw = g_raw.train_epoch(loader, 0)
    l_aug = g_aug.train_epoch(loader, 0)
    assert np.isfinite(l_aug).all()
    assert not np.allclose(l_raw, l_aug)
    assert l_aug[0] == l_aug[1]  # same stream for identical trials
