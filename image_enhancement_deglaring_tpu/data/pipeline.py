"""SD1 triptych pipeline: path discovery, seeded split, host decode.

Data contract (reference: scripts/check_png.py:92-94): each sample is one
1536x512 RGBA PNG laid out [ground-truth | glared | glare-mask]
horizontally. Decode happens on host (PIL); everything after (split, gray,
resize, normalize) is plain numpy here, with on-device jit equivalents in
``ops.image`` for the serving path.

Split semantics are byte-compatible with the reference so validation sets
match run-for-run: sort paths, shuffle with ``np.random.RandomState(seed)``,
cut at ``1 - val_split`` (reference: src/optimized_dataset.py:198-217).
"""

from __future__ import annotations

import os

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg")


def list_image_paths(data_dir: str) -> list[str]:
    """Recursive scan for images, sorted (reference: src/optimized_dataset.py:198-206)."""
    paths = []
    for root, _, files in os.walk(data_dir):
        for f in files:
            if f.lower().endswith(_IMG_EXTS):
                paths.append(os.path.join(root, f))
    paths.sort()
    return paths


def seeded_split(paths: list[str], val_split: float, seed: int | None):
    """Reproduce the reference's train/val split exactly
    (reference: src/optimized_dataset.py:208-217)."""
    paths = sorted(paths)
    if seed is not None:
        rng = np.random.RandomState(seed)
        rng.shuffle(paths)
    else:
        np.random.shuffle(paths)
    split_idx = int(len(paths) * (1 - val_split))
    return paths[:split_idx], paths[split_idx:]


def _to_gray_uint8(img: np.ndarray) -> np.ndarray:
    """Luminance grayscale with uint8 rounding (matches cv2 RGB2GRAY semantics
    used at reference: src/optimized_dataset.py:70-71)."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.float32)
    g = img[..., 1].astype(np.float32)
    b = img[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def _resize_uint8(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize (cv2 if available — the reference's resizer — else PIL)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    try:
        import cv2

        return cv2.resize(img, (size, size))
    except ImportError:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


def decode_triptych(path: str, image_size: int = 512, *, with_mask: bool = False,
                    use_native: bool | None = None):
    """Decode one SD1 sample -> (glared, ground_truth[, mask]) float32 [0,1],
    each (H, W) at ``image_size``.

    Mirrors reference: src/optimized_dataset.py:56-79 (split thirds, gray,
    resize, /255). After PIL's entropy decode, the per-pixel work runs in
    the native C++ library when it is available (see ``native/``), with
    this numpy path as fallback.
    """
    from PIL import Image

    img = np.asarray(Image.open(path))

    if not with_mask:
        if use_native is None or use_native:
            from .. import native

            if native.native_available():
                return native.triptych_preprocess(img, image_size)
            if use_native:
                raise RuntimeError("native library unavailable")
    elif use_native:
        # honor the explicit request rather than silently running numpy —
        # a quiet fallback would mask native-vs-numpy discrepancies in
        # exactly the tests/benchmarks that set the flag
        raise RuntimeError("native decode does not support with_mask=True")

    third = img.shape[1] // 3
    gt = _to_gray_uint8(img[:, :third])
    glared = _to_gray_uint8(img[:, third : 2 * third])
    gt = _resize_uint8(gt, image_size).astype(np.float32) / 255.0
    glared = _resize_uint8(glared, image_size).astype(np.float32) / 255.0
    if with_mask:
        mask = _to_gray_uint8(img[:, 2 * third : 3 * third])
        mask = _resize_uint8(mask, image_size).astype(np.float32) / 255.0
        return glared, gt, mask
    return glared, gt


def decode_inference_image(path_or_array, image_size: int = 512, *,
                           use_native: bool | None = None) -> np.ndarray:
    """Single-image inference preprocessing: gray, resize, [0,1] (H, W)
    (reference: src/preprocess.py:54-90).

    Array inputs may be uint8 [0,255] or float [0,1]; floats are converted
    to the uint8 path up front — feeding a [0,1] float straight into the
    /255 normalization (or into the uint8-rounding gray conversion) would
    silently produce a near-black input. A float array holding [0,255]
    values raises rather than saturating every pixel to white.

    Like ``decode_triptych``, the per-pixel work (gray + resize + /255)
    runs in the native C++ library when available; the numpy/cv2 fallback
    agrees to within one uint8 quantization step."""
    if isinstance(path_or_array, (str, os.PathLike)):
        from PIL import Image

        img = np.asarray(Image.open(path_or_array))
    else:
        img = np.asarray(path_or_array)
        if np.issubdtype(img.dtype, np.floating):
            mx = float(img.max(initial=0.0))
            if mx > 1.0 + 1e-6:
                raise ValueError(
                    "float image values must be normalized to [0,1] "
                    f"(max={mx:g}); divide by 255 first or pass uint8")
            img = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
    if (use_native is None or use_native) and img.ndim in (2, 3) \
            and img.shape[0] >= 1 and img.shape[1] >= 1:
        from .. import native

        if native.native_available():
            return native.inference_preprocess(
                np.ascontiguousarray(img, np.uint8), image_size)
        if use_native:
            raise RuntimeError("native library unavailable")
    gray = _to_gray_uint8(img) if img.ndim == 3 else img
    gray = _resize_uint8(gray, image_size)
    return gray.astype(np.float32) / 255.0
