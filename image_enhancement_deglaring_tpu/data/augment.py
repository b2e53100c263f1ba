"""Deterministic host-side augmentations.

Two pipelines mirroring the reference's albumentations stacks:

- ``optimized_augment`` (reference: src/optimized_dataset.py:147-174):
  HorizontalFlip(p=.5) on image+target, then OneOf(p=.5) of
  brightness/contrast (w=.8) or gaussian noise (w=.2) on the image only —
  albumentations applies pixel transforms to 'image' but not 'mask'.
- ``heavy_augment`` (reference: src/dataset.py:96-116): rotate90 / flips /
  affine (both), then noise-or-blur and brightness/gamma/CLAHE (image only).

Determinism matches the reference's scheme of seeding per sample index
(reference: src/optimized_dataset.py:90-95): pass ``np.random.default_rng
(seed + index)``.
"""

from __future__ import annotations

import numpy as np


def _brightness_contrast(img: np.ndarray, rng: np.random.Generator,
                         limit: float = 0.2) -> np.ndarray:
    alpha = 1.0 + rng.uniform(-limit, limit)  # contrast
    beta = rng.uniform(-limit, limit)  # brightness (by max, float images)
    return np.clip(img * alpha + beta, 0.0, 1.0).astype(np.float32)


def _gauss_noise(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    # albumentations GaussNoise default var_limit=(10, 50) on the 0-255 scale
    var = rng.uniform(10.0, 50.0) / (255.0 ** 2)
    noise = rng.normal(0.0, np.sqrt(var), img.shape).astype(np.float32)
    return np.clip(img + noise, 0.0, 1.0).astype(np.float32)


def optimized_augment(image: np.ndarray, target: np.ndarray,
                      rng: np.random.Generator):
    """Light augmentation used by the production training path."""
    if rng.random() < 0.5:
        image = image[:, ::-1].copy()
        target = target[:, ::-1].copy()
    if rng.random() < 0.5:
        if rng.random() < 0.8:
            image = _brightness_contrast(image, rng)
        else:
            image = _gauss_noise(image, rng)
    return image, target


def _affine(img: np.ndarray, scale: float, tx: float, ty: float, angle: float,
            interpolation=None):
    """Rotate/scale about the image center + translate, constant-0 border.

    Matches A.Affine's defaults (mode=cv2.BORDER_CONSTANT, cval=0) — the
    reference deliberately replaced ShiftScaleRotate (whose default was
    reflect-101) with Affine (reference: src/dataset.py:100-101), so
    out-of-frame area is black, not mirrored.
    """
    import cv2

    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
    m[0, 2] += tx * w
    m[1, 2] += ty * h
    return cv2.warpAffine(img, m, (w, h),
                          flags=(cv2.INTER_LINEAR if interpolation is None
                                 else interpolation),
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def heavy_augment(image: np.ndarray, target: np.ndarray,
                  rng: np.random.Generator):
    """Full augmentation stack (capability parity with the non-optimized
    dataset, reference: src/dataset.py:96-116). Returns images still in
    [0,1]; the reference's trailing Normalize(0.5, 0.5) is applied by the
    caller when requested."""
    import cv2

    # RandomRotate90(p=.5): albumentations samples the factor uniformly
    # from {0,1,2,3} when the transform fires, so each nonzero rotation
    # lands with p = .5/4 = .125 and the NET rotation probability is .375
    if rng.random() < 0.5:
        k = int(rng.integers(0, 4))
        if k:
            image = np.rot90(image, k).copy()
            target = np.rot90(target, k).copy()
    # HorizontalFlip(p=.5)
    if rng.random() < 0.5:
        image = image[:, ::-1].copy()
        target = target[:, ::-1].copy()
    # VerticalFlip(p=.3)
    if rng.random() < 0.3:
        image = image[::-1].copy()
        target = target[::-1].copy()
    # Affine(scale .9-1.1, translate 6.25%, rotate +-15, p=.5)
    if rng.random() < 0.5:
        scale = rng.uniform(0.9, 1.1)
        tx = rng.uniform(-0.0625, 0.0625)
        ty = rng.uniform(-0.0625, 0.0625)
        angle = rng.uniform(-15.0, 15.0)
        image = _affine(image, scale, tx, ty, angle)
        # the reference feeds the ground truth as the albumentations
        # 'mask' target (reference: src/dataset.py:70), and A.Affine warps
        # masks with INTER_NEAREST — hard target values, no edge blending
        target = _affine(target, scale, tx, ty, angle,
                         interpolation=cv2.INTER_NEAREST)
    # OneOf(noise, blur)(p=.5) — image only. GaussianBlur(blur_limit=3)
    # admits exactly ksize=3 (the only odd value in [3, 3]), so the kernel
    # is not "pinned" — it is the whole sampling range.
    if rng.random() < 0.5:
        if rng.random() < 0.5:
            image = _gauss_noise(image, rng)
        else:
            image = cv2.GaussianBlur(image, (3, 3), 0)
    # OneOf(brightness/contrast, gamma, CLAHE)(p=.5) — image only
    if rng.random() < 0.5:
        pick = rng.random()
        if pick < 1 / 3:
            image = _brightness_contrast(image, rng)
        elif pick < 2 / 3:
            # RandomGamma(gamma_limit=(80, 120)): gamma = U(80,120)/100
            gamma = rng.uniform(80.0, 120.0) / 100.0
            image = np.clip(image, 0.0, 1.0) ** gamma
        else:
            image = _clahe(image, rng)
    return image.astype(np.float32), target.astype(np.float32)


def _clahe(image: np.ndarray, rng: np.random.Generator,
           clip_limit: float = 4.0) -> np.ndarray:
    """A.CLAHE(clip_limit=4.0, tile_grid_size=(8, 8)): a scalar clip_limit
    means the per-call limit is sampled from U(1, clip_limit); CLAHE runs
    on the uint8 rendering (cv2 requirement) and returns to [0, 1]."""
    import cv2

    limit = rng.uniform(1.0, clip_limit)
    u8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    clahe = cv2.createCLAHE(clipLimit=limit, tileGridSize=(8, 8))
    return clahe.apply(u8).astype(np.float32) / 255.0
