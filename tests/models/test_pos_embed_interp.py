"""Pos-embed resampling parity vs torch F.interpolate bicubic.

Multi-crop training resamples the learned pos-embed on EVERY forward
(224/14 grid != 16, locals 96/14 -> 6), so the resampling kernel is part of
trajectory parity. The flax implementation must reproduce torch's bicubic
(A=-0.75, antialias=False) with the reference's ``interpolate_offset=0.1``
scale kludge (``dinov2_vit_src/models/vision_transformer.py:251-300``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lightly_train_tpu.models.vit import interpolate_pos_embed  # noqa: E402


@pytest.mark.parametrize("m,g", [(14, 16), (14, 6), (4, 2), (16, 37), (14, 7)])
def test_matches_torch_interpolate(m, g):
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, m, m)).astype(np.float32)
    sx = float(g + 0.1) / m  # reference interpolate_offset=0.1 kludge
    ref = F.interpolate(
        torch.from_numpy(x), mode="bicubic", antialias=False,
        scale_factor=(sx, sx),
    ).numpy()
    pe = jnp.asarray(x.transpose(0, 2, 3, 1).reshape(1, m * m, 8))
    got = (
        np.asarray(interpolate_pos_embed(pe, (g, g)))
        .reshape(1, g, g, 8)
        .transpose(0, 3, 1, 2)
    )
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-5)


def test_identity_short_circuit():
    pe = jnp.arange(1 * 16 * 4, dtype=jnp.float32).reshape(1, 16, 4)
    out = interpolate_pos_embed(pe, (4, 4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))
