"""Tent-matmul samplers vs the explicit 4-tap gather formulation.

Round 5 rewrote ``ops/point_sampling.py`` to run bilinear point sampling
as MXU contractions with per-point tent weights (element-granular gathers
lower at ~1e8 taps/s on TPU and made the EoMT loss 14.5 s/step). The tent
formulation is exactly the 4-tap gather — these tests pin that equality
(and the grid_sample zero-padding convention) on the CPU test platform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.ops.point_sampling import (
    _sample_mm,
    bilinear_point_sample,
    bilinear_point_sample_rows,
    sample_slot_indicator,
)


def _gather_reference(grid, coords):
    """The original 4-tap formulation (B, C, gh, gw) @ (B, P, 2)."""
    B, C, gh, gw = grid.shape
    flat = grid.reshape(B, C, gh * gw)
    y = coords[..., 0] * gh - 0.5
    x = coords[..., 1] * gw - 0.5
    y0 = np.floor(y)
    x0 = np.floor(x)
    out = np.zeros((B, C, coords.shape[1]), np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            w = (y - y0 if dy else 1 - (y - y0)) * (
                x - x0 if dx else 1 - (x - x0)
            )
            inb = (yi >= 0) & (yi < gh) & (xi >= 0) & (xi < gw)
            lin = (
                np.clip(yi, 0, gh - 1) * gw + np.clip(xi, 0, gw - 1)
            ).astype(np.int64)
            g = np.take_along_axis(flat, lin[:, None, :], axis=2)
            out = out + g * (w * inb)[:, None, :]
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_sample_mm_equals_gather(seed):
    r = np.random.default_rng(seed)
    M, gh, gw, P = 3, 9, 13, 257
    grids = r.normal(size=(M, gh, gw)).astype(np.float32) * 3
    # include out-of-range + exactly-on-center coordinates
    coords = r.uniform(-0.2, 1.2, size=(M, P, 2)).astype(np.float32)
    coords[:, 0] = 0.5  # exact pixel centers
    got = np.asarray(_sample_mm(jnp.asarray(grids), jnp.asarray(coords)))
    want = _gather_reference(grids[:, None], coords)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_bilinear_point_sample_c1_dispatch():
    r = np.random.default_rng(0)
    grid = r.normal(size=(2, 1, 8, 8)).astype(np.float32)
    coords = r.uniform(0, 1, size=(2, 33, 2)).astype(np.float32)
    got = np.asarray(
        bilinear_point_sample(jnp.asarray(grid), jnp.asarray(coords))
    )
    want = _gather_reference(grid, coords)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rows_factorization_matches_materialized():
    """q_emb . sample(pixels) == sample(q_emb . pixels) (bilinear commutes
    with the D-contraction) — the matching-stage factorization."""
    r = np.random.default_rng(0)
    B, gh, gw, D, Q, P = 2, 6, 7, 5, 4, 65
    pixels = r.normal(size=(B, gh, gw, D)).astype(np.float32)
    q_emb = r.normal(size=(B, Q, D)).astype(np.float32)
    coords = r.uniform(-0.1, 1.1, size=(B, P, 2)).astype(np.float32)
    pix_pts = np.asarray(
        bilinear_point_sample_rows(jnp.asarray(pixels), jnp.asarray(coords))
    )
    got = np.einsum("bqd,bpd->bqp", q_emb, pix_pts)
    grid = np.einsum("bqd,bhwd->bqhw", q_emb, pixels)
    want = _gather_reference(grid, coords)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_slot_indicator_matches_onehot_gather():
    r = np.random.default_rng(0)
    B, H, W, S, P = 2, 12, 10, 3, 49
    id_map = r.integers(-1, 4, size=(B, H, W)).astype(np.int32)
    coords = r.uniform(-0.1, 1.1, size=(B, S, P, 2)).astype(np.float32)
    slots = np.array([0, 2, 3], np.int32)
    got = np.asarray(
        sample_slot_indicator(
            jnp.asarray(id_map), jnp.asarray(coords), jnp.asarray(slots)
        )
    )
    for s in range(S):
        ind = (id_map == slots[s]).astype(np.float32)
        want = _gather_reference(ind[:, None], coords[:, s])[:, 0]
        np.testing.assert_allclose(got[:, s], want, atol=2e-5, err_msg=f"slot {s}")


def test_sample_mm_gradient_flows():
    r = np.random.default_rng(0)
    grids = jnp.asarray(r.normal(size=(2, 8, 8)).astype(np.float32))
    coords = jnp.asarray(r.uniform(0, 1, size=(2, 17, 2)).astype(np.float32))

    g = jax.grad(lambda gr: jnp.sum(_sample_mm(gr, coords) ** 2))(grids)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
