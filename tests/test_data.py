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


def test_validator_flags_truncated_png(tmp_path):
    """'Invalid pixels' must be a falsifiable check: a truncated PNG (the
    corruption that actually breaks training mid-epoch) is flagged, not
    silently passed by the vacuous uint8-in-[0,255] assertion."""
    generate_synthetic_sd1(str(tmp_path), n_train=2, n_val=0, size=512,
                           seed=2)
    victim = sorted((tmp_path / "train").glob("*.png"))[0]
    data = victim.read_bytes()
    victim.write_bytes(data[: len(data) // 2])  # chop the IDAT stream
    bad_dims, bad_chan, bad_pix, total = check_png_dimensions(str(tmp_path))
    assert total == 2
    assert bad_pix == [f"train/{victim.name}"]


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


def test_num_workers_zero_loads_synchronously(sd1_dir):
    """num_workers=0 = in-process decoding (reference DataLoader
    semantics); batches must match the threaded path exactly."""
    threaded, _ = make_dataloaders(
        sd1_dir + "/train", batch_size=4, val_split=0.25, seed=42,
        image_size=64, num_workers=2,
    )
    sync, sync_val = make_dataloaders(
        sd1_dir + "/train", batch_size=4, val_split=0.25, seed=42,
        image_size=64, num_workers=0, cache_images=True,
    )
    for (xt, yt), (xs, ys) in zip(threaded, sync, strict=True):
        np.testing.assert_array_equal(xt, xs)
        np.testing.assert_array_equal(yt, ys)
    assert len(list(sync_val)) == len(sync_val)


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


# ---------------------------------------------------- heavy-augment parity
# albumentations is not installable here, so each transform is pinned
# against hand-derived goldens of the albumentations spec
# (reference: src/dataset.py:96-116).


class _FakeRng:
    """Feeds predetermined uniform/normal draws to an augmentation."""

    def __init__(self, uniforms):
        self.uniforms = list(uniforms)

    def uniform(self, lo, hi, size=None):
        u = self.uniforms.pop(0)
        return lo + (hi - lo) * u

    def random(self):
        return self.uniforms.pop(0)

    def normal(self, mean, std, shape):
        rng = np.random.default_rng(0)
        return rng.normal(mean, std, shape)


def test_brightness_contrast_matches_albumentations_formula():
    """RandomBrightnessContrast (brightness_by_max=True, float image):
    out = clip(img * (1 + contrast) + brightness * max_value)."""
    from image_enhancement_deglaring_tpu.data.augment import _brightness_contrast

    img = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    # draws: contrast u=0.75 -> alpha = 1 + (-0.2 + 0.4*0.75) = 1.1
    #        brightness u=0.25 -> beta = -0.2 + 0.4*0.25 = -0.1
    out = _brightness_contrast(img, _FakeRng([0.75, 0.25]))
    np.testing.assert_allclose(out, np.clip(img * 1.1 - 0.1, 0, 1), atol=1e-6)


def test_gamma_matches_albumentations_range_and_formula():
    """RandomGamma(gamma_limit=(80,120)): out = img ** (U(80,120)/100)."""
    from image_enhancement_deglaring_tpu.data.augment import heavy_augment

    img = np.full((8, 8), 0.25, np.float32)
    tgt = np.full((8, 8), 0.5, np.float32)
    # draws: rot90 no (.9), hflip no (.9), vflip no (.9), affine no (.9),
    # noise/blur no (.9), second OneOf yes (.1), pick gamma (.5),
    # gamma draw u=1.0 -> gamma = 1.2
    out, tgt_out = heavy_augment(img, tgt, _FakeRng(
        [0.9, 0.9, 0.9, 0.9, 0.9, 0.1, 0.5, 1.0]))
    np.testing.assert_allclose(out, 0.25 ** 1.2, atol=1e-6)
    np.testing.assert_array_equal(tgt_out, tgt)  # pixel ops never touch mask


def test_gauss_noise_variance_scale():
    """GaussNoise default var_limit=(10, 50) on the 0-255 scale: residual
    std must land in [sqrt(10)/255, sqrt(50)/255] (mid-gray, no clipping)."""
    from image_enhancement_deglaring_tpu.data.augment import _gauss_noise

    img = np.full((256, 256), 0.5, np.float32)
    rng = np.random.default_rng(7)
    lo, hi = np.sqrt(10.0) / 255.0, np.sqrt(50.0) / 255.0
    for _ in range(5):
        res = _gauss_noise(img, rng) - img
        assert lo * 0.9 <= res.std() <= hi * 1.1
        assert abs(res.mean()) < 3e-4  # zero-mean


def test_gaussian_blur_matches_cv2_separable_kernel():
    """GaussianBlur(blur_limit=3): ksize=3, sigma=0 -> cv2's [1,2,1]/4
    separable kernel. Interior pixels must equal the hand convolution."""
    import cv2

    rng = np.random.default_rng(3)
    img = rng.random((12, 12)).astype(np.float32)
    out = cv2.GaussianBlur(img, (3, 3), 0)
    w = np.array([0.25, 0.5, 0.25], np.float32)
    expect = np.zeros_like(img)
    for di, wi in zip((-1, 0, 1), w):
        for dj, wj in zip((-1, 0, 1), w):
            expect[1:-1, 1:-1] += wi * wj * img[1 + di : 11 + di, 1 + dj : 11 + dj]
    np.testing.assert_allclose(out[1:-1, 1:-1], expect[1:-1, 1:-1], atol=1e-6)


def test_affine_constant_zero_border():
    """A.Affine default border is constant 0 (NOT reflect-101, which was
    ShiftScaleRotate's default): rotating an all-ones image must produce
    black corners."""
    from image_enhancement_deglaring_tpu.data.augment import _affine

    ones = np.ones((64, 64), np.float32)
    out = _affine(ones, scale=1.0, tx=0.0, ty=0.0, angle=15.0)
    assert out[0, 0] == 0.0 and out[0, -1] == 0.0
    assert out[-1, 0] == 0.0 and out[-1, -1] == 0.0
    assert out[32, 32] == pytest.approx(1.0)


def test_affine_translation_golden():
    """translate_percent tx shifts content by round(tx * W) pixels."""
    from image_enhancement_deglaring_tpu.data.augment import _affine

    img = np.zeros((16, 16), np.float32)
    img[8, 4] = 1.0
    out = _affine(img, scale=1.0, tx=0.25, ty=0.0, angle=0.0)
    assert out[8, 8] == pytest.approx(1.0)  # moved 0.25 * 16 = 4 px right
    assert out[8, 4] == 0.0


def test_heavy_augment_affine_target_nearest_no_blending():
    """The reference warps the ground truth as an albumentations 'mask'
    (INTER_NEAREST, reference: src/dataset.py:70): a binary target must
    stay binary through the affine — bilinear blending would soften text
    strokes the model is trained to reproduce."""
    from image_enhancement_deglaring_tpu.data.augment import heavy_augment

    binary = (np.random.default_rng(1).random((64, 64)) > 0.5
              ).astype(np.float32)
    rotated_any = False
    for seed in range(40):  # ~20 of these fire the p=.5 affine branch
        img, tgt = heavy_augment(binary.copy(), binary.copy(),
                                 np.random.default_rng(seed))
        vals = np.unique(tgt)
        assert np.isin(vals, [0.0, 1.0]).all(), (seed, vals[:5])
        # the IMAGE is warped bilinearly, so a rotated draw shows blended
        # values there — proof the affine branch actually ran
        rotated_any |= not np.isin(np.unique(img), [0.0, 1.0]).all()
    assert rotated_any


def test_clahe_clip_limit_sampled_from_1_to_4():
    """A.CLAHE(clip_limit=4.0): scalar means U(1, 4) per call; output is
    the uint8 CLAHE rendering back in [0, 1]."""
    import cv2

    from image_enhancement_deglaring_tpu.data.augment import _clahe

    rng = np.random.default_rng(11)
    img = (np.linspace(0.4, 0.6, 64 * 64, dtype=np.float32)
           .reshape(64, 64))  # low contrast
    # golden: u=0.5 -> limit = 2.5
    out = _clahe(img, _FakeRng([0.5]))
    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    want = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(u8)
    np.testing.assert_array_equal((out * 255).astype(np.uint8), want)
    # property: CLAHE stretches low-contrast input
    assert _clahe(img, rng).std() > img.std()


def test_heavy_augment_geometry_applies_to_both_image_and_mask():
    from image_enhancement_deglaring_tpu.data.augment import heavy_augment

    rng = np.random.default_rng(0)
    img = rng.random((32, 32)).astype(np.float32)
    tgt = rng.random((32, 32)).astype(np.float32)
    # draws: rot90 yes (k from integers), hflip yes, vflip no, affine no,
    # both OneOf no
    class _R(_FakeRng):
        def integers(self, lo, hi):
            return 1

    out_i, out_t = heavy_augment(img, tgt, _R([0.1, 0.1, 0.9, 0.9, 0.9, 0.9]))
    np.testing.assert_array_equal(out_i, np.rot90(img, 1)[:, ::-1])
    np.testing.assert_array_equal(out_t, np.rot90(tgt, 1)[:, ::-1])


def test_prefetcher_depth_clamped_to_bounded_queue(capsys):
    """--prefetch_factor 0 (a torch user's 'disable prefetch') must not
    become queue.Queue(maxsize=0) == UNBOUNDED, which would eagerly ship
    the whole epoch to HBM; depth clamps to 1 (with a printed note, so the
    user learns prefetch cannot be fully disabled) and iteration works."""
    from image_enhancement_deglaring_tpu.data.dataset import DevicePrefetcher

    batches = [(np.full((2, 8, 8, 1), i, np.float32),
                np.zeros((2, 8, 8, 1), np.float32)) for i in range(4)]
    for depth in (0, -3):
        DevicePrefetcher._clamp_noted = False  # note prints ONCE per process
        pf = DevicePrefetcher(batches, prefetch=depth)
        assert pf.prefetch == 1
        assert "clamped to 1" in capsys.readouterr().out
        # the train loop builds a prefetcher per epoch per loader: later
        # constructions must clamp silently instead of spamming every epoch
        pf2 = DevicePrefetcher(batches, prefetch=depth)
        assert pf2.prefetch == 1
        assert "clamped" not in capsys.readouterr().out
        xs = [np.asarray(x)[0, 0, 0, 0] for x, _ in pf]
        assert xs == [0.0, 1.0, 2.0, 3.0]
    DevicePrefetcher._clamp_noted = False
    DevicePrefetcher(batches, prefetch=2)  # no note when depth is honored
    assert "clamped" not in capsys.readouterr().out


def test_prefetcher_abandoned_iteration_stops_worker():
    """Breaking out of iteration early (train-step exception, early stop)
    must not leave the producer thread blocked on a full queue forever."""
    import gc
    import threading
    import time

    from image_enhancement_deglaring_tpu.data.dataset import DevicePrefetcher

    batches = [(np.zeros((2, 8, 8, 1), np.float32),
                np.zeros((2, 8, 8, 1), np.float32)) for _ in range(50)]
    before = set(threading.enumerate())
    it = iter(DevicePrefetcher(batches, prefetch=2))
    next(it)  # start the worker, then abandon mid-epoch
    it.close()
    gc.collect()
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"prefetcher worker leaked: {leaked}"


# ------------------------------------------- round-3 data review fixes


def test_num_workers_zero_applies_to_val_loader_too(sd1_dir):
    """num_workers=0 promises synchronous in-process decode (reference
    DataLoader semantics) — the VAL loader must honor it as well, not
    silently keep a thread pool."""
    train_loader, val_loader = make_dataloaders(
        sd1_dir + "/train", batch_size=4, val_split=0.25, seed=42,
        image_size=64, num_workers=0,
    )
    assert train_loader.num_workers == 0
    assert val_loader.num_workers == 0
    # threaded case unchanged: val gets a smaller pool
    _, val_threaded = make_dataloaders(
        sd1_dir + "/train", batch_size=4, val_split=0.25, seed=42,
        image_size=64, num_workers=8,
    )
    assert val_threaded.num_workers == 4


def test_make_dataloaders_rejects_zero_train_batches(sd1_dir):
    """train split smaller than batch_size + drop_last would run ZERO steps
    per epoch and save the init-weight model as 'best' — must raise."""
    from image_enhancement_deglaring_tpu.data.dataset import make_dataloaders

    with pytest.raises(ValueError, match="zero steps"):
        make_dataloaders(sd1_dir, batch_size=512, image_size=32)


def test_heavy_augment_rotate90_factor_zero_is_identity():
    """A.RandomRotate90(p=.5) samples the factor from {0,1,2,3} when it
    fires — factor 0 (probability .25 of a fire) must leave the image
    unrotated, making the NET rotation probability .375, not .5."""
    from image_enhancement_deglaring_tpu.data.augment import heavy_augment

    img = np.arange(64, dtype=np.float32).reshape(8, 8) / 64.0

    class _R0(_FakeRng):
        def integers(self, lo, hi):
            assert (lo, hi) == (0, 4)  # albumentations' factor domain
            return 0

    # draws: rot90 FIRES (.1) but factor 0; everything else suppressed
    out, tgt = heavy_augment(img.copy(), img.copy(),
                             _R0([0.1, 0.9, 0.9, 0.9, 0.9, 0.9]))
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(tgt, img)


def test_decode_inference_image_float_inputs(tmp_path):
    """Float [0,1] arrays (2D and RGB) must match the uint8 path — feeding
    them straight into /255 (or uint8-rounding gray) would produce a
    near-black model input."""
    from image_enhancement_deglaring_tpu.data.pipeline import (
        decode_inference_image,
    )

    rng = np.random.default_rng(3)
    u8 = (rng.random((40, 40)) * 255).astype(np.uint8)
    want = decode_inference_image(u8, image_size=32)
    got = decode_inference_image(u8.astype(np.float32) / 255.0, image_size=32)
    np.testing.assert_array_equal(got, want)
    assert got.max() > 0.5  # NOT near-black

    rgb8 = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    want3 = decode_inference_image(rgb8, image_size=32)
    got3 = decode_inference_image(rgb8.astype(np.float32) / 255.0,
                                  image_size=32)
    np.testing.assert_allclose(got3, want3, atol=1 / 255.0)

    # a float array in [0,255] must raise, not saturate to all-white
    with pytest.raises(ValueError, match=r"\[0,1\]"):
        decode_inference_image(u8.astype(np.float32), image_size=32)


def test_decode_triptych_native_with_mask_fails_loudly(sd1_dir):
    """use_native=True + with_mask=True is unsupported by the native lib:
    the explicit request must raise, not silently run numpy."""
    from image_enhancement_deglaring_tpu.data.pipeline import (
        decode_triptych,
        list_image_paths,
    )

    path = list_image_paths(sd1_dir)[0]
    with pytest.raises(RuntimeError, match="mask"):
        decode_triptych(path, 32, with_mask=True, use_native=True)


def test_validator_scans_what_the_loader_consumes(tmp_path):
    """Nested dirs, uppercase extensions, and JPEGs are all consumed by the
    training loader, so the validator must see them too (a JPEG can never
    be RGBA -> flagged as invalid format, not invisible)."""
    from PIL import Image

    from image_enhancement_deglaring_tpu.data.validate import (
        check_png_dimensions,
    )

    train = tmp_path / "train" / "batch1"
    train.mkdir(parents=True)
    rgba = Image.fromarray(
        np.zeros((512, 1536, 4), np.uint8), mode="RGBA")
    rgba.save(train / "ok.PNG")
    Image.fromarray(np.zeros((512, 1536), np.uint8)).convert("RGB").save(
        train / "sneaky.jpg")
    bad_dims, bad_chan, bad_pix, total = check_png_dimensions(str(tmp_path))
    assert total == 2  # both found despite nesting/case/format
    assert any("sneaky" in rel for rel, _mode in bad_chan)
    assert not bad_dims and not bad_pix


def test_prefetcher_abandoned_iteration_prefetch_one():
    """prefetch=1 is the tight case: the consumer's drain can be refilled by
    a pending batch put before the worker's final sentinel put runs — the
    sentinel put must not block forever."""
    import gc
    import threading
    import time

    from image_enhancement_deglaring_tpu.data.dataset import DevicePrefetcher

    batches = [(np.zeros((2, 8, 8, 1), np.float32),
                np.zeros((2, 8, 8, 1), np.float32)) for _ in range(50)]
    before = set(threading.enumerate())
    it = iter(DevicePrefetcher(batches, prefetch=1))
    next(it)
    it.close()
    gc.collect()
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"prefetcher worker leaked: {leaked}"


def test_make_eval_loader_covers_every_image(sd1_dir):
    """No split, no shuffle, ragged final batch kept — the replacement for
    the make_dataloaders(val_split=1.0) idiom the zero-train-batch guard
    now rejects."""
    from image_enhancement_deglaring_tpu.data import make_eval_loader
    from image_enhancement_deglaring_tpu.data.pipeline import list_image_paths

    n_all = len(list_image_paths(sd1_dir))
    loader = make_eval_loader(sd1_dir, batch_size=max(2, n_all - 1),
                              image_size=32)
    seen = sum(x.shape[0] for x, _y in loader)
    assert seen == loader.num_samples == n_all


def test_loader_set_skip_batches_skips_decode_exactly():
    """Mid-epoch preemption resume fast-forwards at the batch-PLAN level:
    the skipped batches must never be decoded (no __getitem__), and the
    surviving batches must be IDENTICAL to iterate-and-discard (the index
    order is per-epoch seeded, so dropping leading windows is exact)."""
    from image_enhancement_deglaring_tpu.data.dataset import _Loader

    class CountingDataset:
        def __init__(self, n):
            self.n = n
            self.calls: list[int] = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.calls.append(int(i))
            a = np.full((4, 4, 1), i, np.float32)
            return a, a.copy()

    ds = CountingDataset(10)
    loader = _Loader(ds, 2, shuffle=True, drop_last=True, seed=3,
                     num_workers=0)
    loader.set_epoch(1)
    full = list(loader)
    full_calls = list(ds.calls)

    ds.calls.clear()
    loader.set_skip_batches(3)
    assert len(loader) == len(full) - 3
    rest = list(loader)
    assert len(rest) == len(full) - 3
    for (x1, y1), (x2, y2) in zip(full[3:], rest):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    assert ds.calls == full_calls[3 * 2:], "skipped batches were decoded"

    loader.set_skip_batches(0)  # reset restores full iteration
    assert len(list(loader)) == len(full)
    with pytest.raises(ValueError):
        loader.set_skip_batches(-1)
