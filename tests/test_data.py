"""Data layer tests: synthetic generator contract, split reproducibility,
triptych decode, loaders, and the dataset validator."""

import numpy as np
import pytest

from image_enhancement_deglaring_tpu.data import (
    GlareRemovalDataset,
    generate_synthetic_sd1,
    list_image_paths,
    make_dataloaders,
    seeded_split,
)
from image_enhancement_deglaring_tpu.data.pipeline import decode_triptych
from image_enhancement_deglaring_tpu.data.validate import check_png_dimensions


@pytest.fixture(scope="module")
def sd1_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd1")
    generate_synthetic_sd1(str(d), n_train=8, n_val=3, size=64, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def sd1_fullsize_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd1full")
    generate_synthetic_sd1(str(d), n_train=1, n_val=1, size=512, seed=1)
    return str(d)


def test_synthetic_matches_sd1_contract(sd1_fullsize_dir):
    # The generated data must pass the same validator the reference applies
    # to real SD1 (reference: scripts/check_png.py:9: 1536x512 RGBA).
    bad_dims, bad_chan, bad_pix, total = check_png_dimensions(sd1_fullsize_dir)
    assert total == 2
    assert bad_dims == [] and bad_chan == [] and bad_pix == []


def test_seeded_split_matches_reference_semantics():
    paths = [f"img_{i:03d}.png" for i in range(10)]
    train, val = seeded_split(list(paths), 0.2, seed=42)
    # exact reproduction of np.random.RandomState(42).shuffle on sorted list
    rng = np.random.RandomState(42)
    expect = sorted(paths)
    rng.shuffle(expect)
    assert train == expect[:8] and val == expect[8:]
    # deterministic across calls
    train2, val2 = seeded_split(list(paths), 0.2, seed=42)
    assert train == train2 and val == val2


def test_decode_triptych_shapes_and_range(sd1_dir):
    path = list_image_paths(sd1_dir)[0]
    glared, gt = decode_triptych(path, image_size=64)
    assert glared.shape == (64, 64) and gt.shape == (64, 64)
    assert glared.dtype == np.float32
    assert 0.0 <= glared.min() and glared.max() <= 1.0
    # glare adds brightness: glared mean must exceed ground truth mean
    assert glared.mean() > gt.mean()


def test_dataset_augmentation_is_deterministic(sd1_dir):
    paths = list_image_paths(sd1_dir)
    ds1 = GlareRemovalDataset(paths, image_size=64, seed=7, augment="optimized")
    ds2 = GlareRemovalDataset(paths, image_size=64, seed=7, augment="optimized")
    for i in range(3):
        a1, b1 = ds1[i]
        a2, b2 = ds2[i]
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


def test_loaders_shapes_and_epoch_shuffling(sd1_dir):
    train_loader, val_loader = make_dataloaders(
        sd1_dir + "/train", batch_size=4, val_split=0.25, seed=42, image_size=64,
    )
    assert train_loader.num_samples == 6 and val_loader.num_samples == 2
    batches = list(train_loader)
    assert len(batches) == 1  # drop_last: 6 // 4
    x, y = batches[0]
    assert x.shape == (4, 64, 64, 1) and y.shape == (4, 64, 64, 1)

    train_loader.set_epoch(0)
    first = next(iter(train_loader))[0]
    train_loader.set_epoch(1)
    second = next(iter(train_loader))[0]
    assert not np.array_equal(first, second)  # different epoch -> different order
    train_loader.set_epoch(0)
    again = next(iter(train_loader))[0]
    np.testing.assert_array_equal(first, again)  # same epoch -> same batches


def test_cache_images_equivalent(sd1_dir):
    paths = list_image_paths(sd1_dir)[:3]
    ds_nc = GlareRemovalDataset(paths, image_size=64, augment="none", cache_images=False)
    ds_c = GlareRemovalDataset(paths, image_size=64, augment="none", cache_images=True)
    for i in range(3):
        np.testing.assert_array_equal(ds_nc[i][0], ds_c[i][0])


def test_heavy_augment_runs(sd1_dir):
    paths = list_image_paths(sd1_dir)
    ds = GlareRemovalDataset(paths, image_size=64, seed=3, augment="heavy")
    x, y = ds[0]
    assert x.shape == (64, 64, 1) and y.shape == (64, 64, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()


def test_prefetcher_propagates_worker_errors():
    from image_enhancement_deglaring_tpu.data import DevicePrefetcher

    class BrokenLoader:
        def __iter__(self):
            yield (np.zeros((2, 4, 4, 1), np.float32),) * 2
            raise RuntimeError("decode exploded")

        def __len__(self):
            return 2

    pf = DevicePrefetcher(BrokenLoader())
    it = iter(pf)
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(it)
