"""Generate the COMMITTED image fixtures under tests/fixtures/ and
frontend/samples/.

The reference checks real glare photographs into the repo
(reference: api/test_input1.png, frontend/samples/) and its API must
decode whatever PIL can open (reference: api/app.py:127-146). The SD1
photos are not redistributable, so these fixtures are synthesized — but
deliberately rendered and ENCODED to exercise the file-level decode
paths a runtime-generated clean PIL image never hits:

- photographed appearance: optical blur, Poisson shot + Gaussian read
  noise, vignetting, slight page tilt, and a JPEG round-trip (the
  artifacts a phone camera pipeline leaves in a "PNG" upload);
- odd encodings: Adam7-INTERLACED PNG (hand-written chunk stream — PIL
  can read but not write interlaced, so no runtime generator can cover
  this), 16-bit grayscale PNG, palette PNG with tRNS transparency,
  1-bit PNG, and a plain JPEG.

Deterministic (fixed seeds): re-running reproduces the committed bytes'
pixel content. Run from the repo root:  python scripts/make_fixtures.py
"""

import os
import struct
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")
SAMPLES = os.path.join(REPO, "frontend", "samples")


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur via np.convolve per axis (no cv2/scipy)."""
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = np.pad(img, ((radius, radius), (0, 0)), mode="edge")
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "valid"), 0, pad)
    pad = np.pad(img, ((0, 0), (radius, radius)), mode="edge")
    return np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 1, pad)


def photo_like_glare_image(seed: int, size: int = 512) -> np.ndarray:
    """A photographed-document-with-glare render (uint8 grayscale)."""
    from image_enhancement_deglaring_tpu.data.synthetic import (
        _document_page,
        _glare_field,
    )

    rng = np.random.default_rng(seed)
    # render oversized, then rotate slightly and crop — photographed pages
    # are never axis-aligned
    big = int(size * 1.25)
    page = _document_page(rng, big, big)
    angle = rng.uniform(-2.5, 2.5) * np.pi / 180.0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = cx = big / 2.0
    off = (big - size) / 2.0
    ys = (yy + off - cy) * np.cos(angle) - (xx + off - cx) * np.sin(angle) + cy
    xs = (yy + off - cy) * np.sin(angle) + (xx + off - cx) * np.cos(angle) + cx
    ys = np.clip(ys, 0, big - 1).astype(np.int32)
    xs = np.clip(xs, 0, big - 1).astype(np.int32)
    img = page[ys, xs]

    img = np.clip(img + _glare_field(rng, size, size), 0, 255)
    # camera pipeline: optical blur -> vignette -> shot + read noise
    img = _gaussian_blur(img, sigma=0.8)
    r2 = ((yy / size - 0.5) ** 2 + (xx / size - 0.5) ** 2)
    img *= (1.0 - 0.25 * r2 / 0.5)
    img = rng.poisson(np.clip(img, 0, 255) * 0.85) / 0.85
    img = img + rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def jpeg_roundtrip(gray: np.ndarray, quality: int = 82) -> np.ndarray:
    """Push the render through a JPEG encode/decode (block artifacts)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, "JPEG", quality=quality)
    return np.asarray(Image.open(io.BytesIO(buf.getvalue())))


# ------------------------------------------------------------------ Adam7
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def write_interlaced_png(path: str, rgba: np.ndarray) -> None:
    """Write an Adam7-interlaced RGBA8 PNG by hand (PIL cannot write
    interlaced PNGs, so committed bytes are the only way to test this
    decode path; format per the PNG spec, filter 0 on every scanline)."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = rgba[y0::dy, x0::dx]
        if sub.size == 0:  # pass is empty at this image size
            continue
        for row in sub:
            raw.append(0)  # filter type None
            raw.extend(row.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1)  # interlace=1
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(data)


def main() -> int:
    from PIL import Image

    os.makedirs(FIXTURES, exist_ok=True)
    os.makedirs(SAMPLES, exist_ok=True)

    # frontend samples: the two files _ensure_samples() looks for, but
    # photo-grade (noise/blur/tilt/JPEG artifacts) instead of the clean
    # runtime-synthesized fallback (frontend/app.py:40-63)
    for i, name in enumerate(["test_input1.png", "test_input2.png"]):
        gray = jpeg_roundtrip(photo_like_glare_image(seed=101 + i))
        rgba = np.stack([gray] * 3 + [np.full_like(gray, 255)], axis=-1)
        Image.fromarray(rgba, mode="RGBA").save(os.path.join(SAMPLES, name))

    # decode-path fixtures (smaller: these test file formats, not content)
    gray = photo_like_glare_image(seed=7, size=160)
    Image.fromarray(jpeg_roundtrip(gray), mode="L").save(
        os.path.join(FIXTURES, "photo_noise.png"))
    Image.fromarray(gray, mode="L").save(
        os.path.join(FIXTURES, "photo_noise.jpg"), "JPEG", quality=82)
    # 16-bit grayscale: full dynamic range so a >>8 or /255 confusion in
    # decode would be glaring
    img16 = (gray.astype(np.uint16) << 8) | gray.astype(np.uint16)
    Image.fromarray(img16).save(  # uint16 -> PIL mode I;16
        os.path.join(FIXTURES, "photo_16bit.png"))
    # palette PNG with tRNS transparency (quantized by PIL)
    Image.fromarray(np.stack([gray] * 3, axis=-1), mode="RGB").convert(
        "P", palette=Image.ADAPTIVE, colors=64).save(
        os.path.join(FIXTURES, "photo_palette_trns.png"), transparency=0)
    # 1-bit: thresholded document
    Image.fromarray(gray, mode="L").convert("1").save(
        os.path.join(FIXTURES, "photo_1bit.png"))
    # Adam7 interlaced RGBA (hand-written; see write_interlaced_png)
    rgba = np.stack([gray] * 3 + [np.full_like(gray, 255)], axis=-1)
    write_interlaced_png(
        os.path.join(FIXTURES, "photo_interlaced.png"), rgba)

    for d in (FIXTURES, SAMPLES):
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            print(f"{p}  {os.path.getsize(p)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
