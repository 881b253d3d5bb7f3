"""cv2 INTER_AREA fidelity for the matmul resampler (VERDICT r3 weak #4).

The reference's view pipeline resizes crops with cv2 INTER_AREA
(``_transforms/view_transform.py:61-76``); these tests pin the rebuild's
area-weight matrices element-exact against ``cv2.resize`` across downscale,
upscale, and mixed axes, on integer crop boxes (cv2 crops are integral).
"""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from lightly_train_tpu.ops.augment import crop_resize_matmul


def _golden(img, y0, x0, h, w, out_hw):
    crop = img[y0: y0 + h, x0: x0 + w]
    return cv2.resize(
        crop, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA
    )


@pytest.mark.parametrize(
    "crop_hw,out_hw",
    [
        ((48, 40), (16, 16)),   # both downscale (true area path)
        ((12, 10), (32, 32)),   # both upscale (2-tap path)
        ((48, 10), (16, 32)),   # mixed down/up
        ((10, 48), (32, 16)),   # mixed up/down
        ((33, 17), (16, 16)),   # non-integer scale downscale
    ],
)
def test_area_matches_cv2(crop_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3), dtype=np.float32)
    y0, x0 = 7, 5
    h, w = crop_hw
    ref = _golden(img, y0, x0, h, w, out_hw)
    got = np.asarray(
        crop_resize_matmul(
            jnp.asarray(img[None]),
            jnp.asarray([float(y0)]), jnp.asarray([float(x0)]),
            jnp.asarray([float(h)]), jnp.asarray([float(w)]),
            out_hw, method="area",
        )
    )[0]
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_area_batch_mixed_scales():
    """One batch mixing down- and up-scaling crops resolves per image."""
    rng = np.random.default_rng(1)
    img = rng.random((2, 64, 64, 3), dtype=np.float32)
    boxes = [(4, 6, 40, 36), (8, 2, 12, 10)]
    out = np.asarray(
        crop_resize_matmul(
            jnp.asarray(img),
            jnp.asarray([float(b[0]) for b in boxes]),
            jnp.asarray([float(b[1]) for b in boxes]),
            jnp.asarray([float(b[2]) for b in boxes]),
            jnp.asarray([float(b[3]) for b in boxes]),
            (24, 24), method="area",
        )
    )
    for i, (y0, x0, h, w) in enumerate(boxes):
        ref = _golden(img[i], y0, x0, h, w, (24, 24))
        np.testing.assert_allclose(out[i], ref, atol=2e-5)


def test_area_hflip_mirrors_output():
    rng = np.random.default_rng(2)
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    kw = dict(
        y0=jnp.asarray([4.0]), x0=jnp.asarray([6.0]),
        h=jnp.asarray([40.0]), w=jnp.asarray([36.0]), out_hw=(16, 16),
        method="area",
    )
    plain = np.asarray(
        crop_resize_matmul(jnp.asarray(img), **kw)
    )
    flipped = np.asarray(
        crop_resize_matmul(
            jnp.asarray(img), hflip=jnp.asarray([True]), **kw
        )
    )
    np.testing.assert_allclose(flipped, plain[:, :, ::-1], atol=1e-6)


def test_composed_view_pipeline_area_vs_cv2():
    """Crop -> area resize -> flip, as the SSL view pipeline composes it."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (80, 96, 3)).astype(np.float32)
    y0, x0, h, w = 10, 20, 56, 48
    ref = _golden(img, y0, x0, h, w, (224 // 8, 224 // 8))[:, ::-1]
    got = np.asarray(
        crop_resize_matmul(
            jnp.asarray(img[None]),
            jnp.asarray([float(y0)]), jnp.asarray([float(x0)]),
            jnp.asarray([float(h)]), jnp.asarray([float(w)]),
            (28, 28), hflip=jnp.asarray([True]), method="area",
        )
    )[0]
    np.testing.assert_allclose(got, ref, atol=2e-4)
