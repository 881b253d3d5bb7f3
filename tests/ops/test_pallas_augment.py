"""Pallas fused-geometry kernel: interpret-mode parity on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.augment import crop_resize_matmul, normalize
from lightly_train_tpu.ops.pallas.augment_kernel import fused_crop_resize_normalize


def test_fused_kernel_interpret_parity():
    B, H, W = 4, 64, 64
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    y0 = jnp.asarray(rng.uniform(0, 20, B), jnp.float32)
    x0 = jnp.asarray(rng.uniform(0, 20, B), jnp.float32)
    h = jnp.asarray(rng.uniform(20, 40, B), jnp.float32)
    w = jnp.asarray(rng.uniform(20, 40, B), jnp.float32)
    flips = jnp.asarray([True, False, True, False])
    boxes = jnp.stack([y0, x0, h, w], axis=1)
    out = fused_crop_resize_normalize(
        imgs, boxes, flips, (32, 32), interpret=True
    )
    ref = crop_resize_matmul(imgs, y0, x0, h, w, (32, 32)) / 255.0
    ref = jnp.where(flips[:, None, None, None], ref[:, :, ::-1, :], ref)
    ref = normalize(ref)
    assert out.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
