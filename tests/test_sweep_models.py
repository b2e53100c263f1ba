"""Sweeping the non-basic model families (reference: sweep.py:135-143
builds basic/enhanced/optimized from the sweep config): OptimizedUNet is
stateless like LightweightUNet; EnhancedUNet threads BatchNorm running
stats and dropout through the vmapped trial axis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import EnhancedUNet, OptimizedUNet
from image_enhancement_deglaring_tpu.parallel import (
    Trial,
    VmappedTrialGroup,
    run_sweep,
)
from image_enhancement_deglaring_tpu.parallel.sweep import SearchSpace
from image_enhancement_deglaring_tpu.train.resident import cache_on_device
from tests.loaders import ArrayLoader

SIZE = 64  # EnhancedUNet pools 6x -> needs >=64


def _trials(n=2, bs=4, lr=1e-3):
    return [Trial(trial_id=i, batch_size=bs, lr=lr, wd=1e-5)
            for i in range(n)]


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(7)
    y = rng.random((8, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    return x, y


def test_optimized_group_trains(toy):
    x, y = toy
    # f=4 keeps every ConvBlock's channel count divisible by its group count
    g = VmappedTrialGroup(OptimizedUNet(init_features=4), _trials(), seed=0)
    assert not g.stateful
    losses = g.train_epoch(ArrayLoader(x, y, 4), 0)
    assert np.isfinite(losses).all()
    assert np.isfinite(g.val_epoch(ArrayLoader(x, y, 4))).all()


def test_enhanced_group_stateful_trains_and_updates_stats(toy):
    x, y = toy
    g = VmappedTrialGroup(EnhancedUNet(init_features=2), _trials(), seed=0)
    assert g.stateful and "batch_stats" in g.model_state
    stats0 = jax.tree_util.tree_map(np.asarray, g.model_state)

    losses = g.train_epoch(ArrayLoader(x, y, 4), 0)
    assert np.isfinite(losses).all()

    # BatchNorm running stats moved off their init values
    moved = [
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(g.model_state),
                        jax.tree_util.tree_leaves(stats0))
    ]
    assert any(moved)
    # eval-mode validation consumes the running stats
    assert np.isfinite(g.val_epoch(ArrayLoader(x, y, 4))).all()

    # halving compaction keeps model_state aligned with the trial axis
    g.keep([1])
    for leaf in jax.tree_util.tree_leaves(g.model_state):
        assert leaf.shape[0] == 1

    snap = g.snapshot_of(0)
    assert set(snap) == {"params", "batch_stats"}


def test_enhanced_identical_trials_stay_identical(toy):
    """Shared data + shared dropout keys: two trials with the same
    hyperparameters train bit-identically, stats included."""
    x, y = toy
    g = VmappedTrialGroup(EnhancedUNet(init_features=2), _trials(), seed=0)
    # same lr for both
    g.lrs = jnp.asarray([1e-3, 1e-3], jnp.float32)
    g.wds = jnp.asarray([1e-5, 1e-5], jnp.float32)
    g.train_epoch(ArrayLoader(x, y, 4), 0)
    for leaf in jax.tree_util.tree_leaves((g.params, g.model_state)):
        a = np.asarray(leaf)
        np.testing.assert_array_equal(a[0], a[1])


def test_enhanced_resident_epoch(toy):
    x, y = toy
    g = VmappedTrialGroup(EnhancedUNet(init_features=2), _trials(), seed=0)
    data = cache_on_device(ArrayLoader(x, y, 4))
    losses = g.train_epoch_resident(data, 0)
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()


def test_run_sweep_enhanced_artifact_bundles_stats(tmp_path, toy):
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x, y, bs, min_one_batch=True))

    result = run_sweep(
        lambda: EnhancedUNet(init_features=2), loader_factory,
        n_trials=2, max_epochs=1, min_iter=1, method="random", seed=0,
        output_dir=str(tmp_path), space=SearchSpace(batch_sizes=(4,)),
    )
    assert result["best"] is not None

    from image_enhancement_deglaring_tpu.utils.pytree import load_npz_tree

    tree = load_npz_tree(str(tmp_path / "best_trial_params.npz"))
    assert "params" in tree and "batch_stats" in tree
