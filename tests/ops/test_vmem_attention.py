"""VMEM-resident attention kernel: fwd/bwd parity vs XLA attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_train_tpu.ops.pallas.attention import (
    use_vmem_attention,
    vmem_attention,
)

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("shape", [(2, 17, 3, 8), (4, 33, 2, 16)])
def test_forward_matches_xla(shape):
    B, N, H, hd = shape
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ref = jax.nn.dot_product_attention(q, k, v)
    got = vmem_attention(q, k, v, interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_backward_matches_xla():
    shape = (2, 17, 3, 8)
    ks = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    co = jax.random.normal(ks[3], shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * co)

    def loss_got(q, k, v):
        return jnp.sum(vmem_attention(q, k, v, interpret=INTERPRET) * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_got, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        # bf16 probability cast inside the kernel bounds the tolerance.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=4e-2, rtol=4e-2
        )


def test_bf16_forward_close():
    shape = (2, 33, 2, 16)
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)
    ref = jax.nn.dot_product_attention(q, k, v)
    got = vmem_attention(q, k, v, interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_gate_is_off_on_cpu(monkeypatch):
    if jax.default_backend() == "tpu":
        assert use_vmem_attention()
        monkeypatch.setenv("LIGHTLY_TRAIN_VMEM_ATTENTION", "0")
        assert not use_vmem_attention()
    else:
        assert not use_vmem_attention()


@pytest.mark.parametrize("shape", [(2, 17, 3, 8), (4, 33, 2, 16)])
def test_flat_forward_matches_xla(shape):
    from lightly_train_tpu.ops.pallas.attention import flat_attention

    B, N, H, hd = shape
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ref = jax.nn.dot_product_attention(q, k, v).reshape(B, N, H * hd)
    got = flat_attention(
        q.reshape(B, N, H * hd), k.reshape(B, N, H * hd),
        v.reshape(B, N, H * hd), H, interpret=INTERPRET,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_flat_backward_matches_xla():
    from lightly_train_tpu.ops.pallas.attention import flat_attention

    B, N, H, hd = shape = (2, 17, 3, 8)
    D = H * hd
    ks = jax.random.split(jax.random.key(4), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    co = jax.random.normal(ks[3], shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * co)

    def loss_got(q, k, v):
        out = flat_attention(
            q.reshape(B, N, D), k.reshape(B, N, D), v.reshape(B, N, D), H,
            interpret=INTERPRET,
        )
        return jnp.sum(out.reshape(B, N, H, hd) * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_got, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=4e-2, rtol=4e-2
        )


def test_flat_attention_shard_map_multichip():
    """Multi-chip path: the kernel shard_maps over the registered mesh's
    data axis (interpret-mode on the virtual 8-device CPU mesh) and matches
    the unsharded result."""
    from lightly_train_tpu.ops.pallas import attention as A
    from lightly_train_tpu.parallel.mesh import get_default_mesh

    mesh = get_default_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs the multi-device test mesh")
    B, N, H, hd = 16, 17, 2, 8
    D = H * hd
    ks = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, D), jnp.float32)
    ref = A.flat_attention(q, k, v, H, interpret=True)
    A.set_active_mesh(mesh)
    try:
        import jax.sharding as shd

        sharding = shd.NamedSharding(mesh, shd.PartitionSpec("data"))
        qs = jax.device_put(q, sharding)
        ks_ = jax.device_put(k, sharding)
        vs = jax.device_put(v, sharding)
        got = jax.jit(
            lambda a, b, c: A.flat_attention(a, b, c, H, interpret=True)
        )(qs, ks_, vs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
        )
    finally:
        A.set_active_mesh(None)
