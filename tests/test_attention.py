"""Tests for ops/attention.py — the VMEM-resident SR-attention kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.ops.attention import sr_attention, sr_attention_reference


@pytest.mark.parametrize('g,n,m,d', [
    (2, 64, 16, 32),      # single q tile
    (3, 128, 64, 32),
    (1, 2100, 32, 32),    # pad path: n > tile and not a multiple
    (8, 256, 256, 32),    # sr_ratio = 1 (self-attention, M = N)
])
def test_matches_einsum_reference_f32(g, n, m, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, m, d)), jnp.float32)
    scale = d ** -0.5
    ref = sr_attention_reference(q, k, v, scale)
    got = sr_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bf16_tolerance():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 48, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 48, 32)), jnp.bfloat16)
    ref = np.asarray(sr_attention_reference(q, k, v, 0.176).astype(
        jnp.float32))
    got = np.asarray(sr_attention(q, k, v, 0.176, interpret=True).astype(
        jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize('g,n,m,d', [
    (2, 64, 16, 32),      # single q tile
    (1, 300, 32, 32),     # pad path: zero-padded dO rows must not leak
                          # into dk/dv
])
def test_grad_parity_vs_einsum_reference(g, n, m, d):
    """dq/dk/dv from the flash-style Pallas backward vs jax.grad through
    the einsum reference (f32, interpreter mode)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, m, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    scale = d ** -0.5

    def loss_kernel(q, k, v):
        return jnp.sum(sr_attention(q, k, v, scale, interpret=True) * t)

    def loss_ref(q, k, v):
        return jnp.sum(sr_attention_reference(q, k, v, scale) * t)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(('dq', 'dk', 'dv'), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_grad_bf16_tolerance():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 48, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 48, 32)), jnp.bfloat16)
    t = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.bfloat16)

    def loss_kernel(q, k, v):
        out = sr_attention(q, k, v, 0.176, interpret=True)
        return jnp.sum((out * t).astype(jnp.float32))

    def loss_ref(q, k, v):
        return jnp.sum((sr_attention_reference(q, k, v, 0.176) * t)
                       .astype(jnp.float32))

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(('dq', 'dk', 'dv'), got, ref):
        np.testing.assert_allclose(
            np.asarray(a.astype(jnp.float32)),
            np.asarray(b.astype(jnp.float32)),
            rtol=6e-2, atol=6e-2, err_msg=name)


def test_kv_length_guard():
    q = jnp.ones((1, 8, 32))
    kv = jnp.ones((1, 5000, 32))
    with pytest.raises(ValueError):
        sr_attention(q, kv, kv, 1.0, interpret=True)


def test_softmax_rows_sum_via_uniform_values():
    """Constant scores → attention output is the mean of v rows."""
    q = jnp.zeros((1, 16, 32))
    k = jnp.zeros((1, 8, 32))
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    out = sr_attention(q, k, v, 1.0, interpret=True)
    expect = jnp.broadcast_to(jnp.mean(v, axis=1, keepdims=True),
                              (1, 16, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)
