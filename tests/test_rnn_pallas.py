"""Trainable Pallas vanilla-RNN: forward + gradient parity vs scan autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.rnn_pallas import rnn_bidir_pallas


def _setup(t, b, f, h, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "fwd": cell_init(k1, "rnn", f, h),
        "bwd": cell_init(k2, "rnn", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (t, b, f), jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    return params, x, w_ih, w_hh


@pytest.mark.parametrize("t,b,f,h,chunk", [(16, 3, 5, 4, 8), (10, 2, 4, 4, 4)])
def test_forward_matches_scan(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h)
    ref = _scan_bidir_fused(params, x, "rnn", h, jnp.float32)
    got = rnn_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("t,b,f,h,chunk", [
    pytest.param(12, 2, 4, 4, 4, marks=pytest.mark.slow),
    (6, 2, 5, 4, 4),
])
def test_gradients_match_scan_autodiff(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h, seed=3)
    tgt = jax.random.normal(jax.random.PRNGKey(11), (t, b, 2 * h), jnp.float32)

    def loss_scan(x, w_ih, w_hh):
        p = {
            "fwd": {"w_ih": w_ih[0], "w_hh": w_hh[0]},
            "bwd": {"w_ih": w_ih[1], "w_hh": w_hh[1]},
        }
        out = _scan_bidir_fused(p, x, "rnn", h, jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    def loss_pallas(x, w_ih, w_hh):
        out = rnn_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True,
                               train=True)
        return jnp.sum((out - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(
        x, w_ih, w_hh
    )
    l_got, g_got = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(
        x, w_ih, w_hh
    )
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-5)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )


@pytest.mark.slow
def test_unpadded_tail_chunk():
    """T not divisible by the chunk exercises the pad/trim paths."""
    params, x, w_ih, w_hh = _setup(11, 2, 4, 4, seed=5)
    ref = _scan_bidir_fused(params, x, "rnn", 4, jnp.float32)
    got = rnn_bidir_pallas(x, w_ih, w_hh, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    def loss(w_hh):
        out = rnn_bidir_pallas(x, w_ih, w_hh, chunk=4, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(w_hh):
        p = {
            "fwd": {"w_ih": w_ih[0], "w_hh": w_hh[0]},
            "bwd": {"w_ih": w_ih[1], "w_hh": w_hh[1]},
        }
        return jnp.sum(_scan_bidir_fused(p, x, "rnn", 4, jnp.float32) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(w_hh)), np.asarray(jax.grad(loss_ref)(w_hh)),
        rtol=5e-4, atol=5e-5,
    )


@pytest.mark.parametrize("t,chunk", [
    pytest.param(8, 4, marks=pytest.mark.slow),
    (7, 1)])  # odd T -> chunk=1 covers the kernel + the new gate
def test_v2_matches_v1(t, chunk):
    """v2-layout kernels (ops/rnn_pallas_v2.py) vs v1, fwd+bwd+eval."""
    from ctc_pytorch_tpu.ops.rnn_pallas_v2 import rnn_bidir_v2

    params, x, w_ih, w_hh = _setup(t, 2, 6, 4, seed=9)
    tgt = jax.random.normal(jax.random.PRNGKey(11), (t, 2, 8), jnp.float32)

    def l1(x, wi, wh):
        out = rnn_bidir_pallas(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def l2(x, wi, wh):
        out = rnn_bidir_v2(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    v1, g1 = jax.value_and_grad(l1, argnums=(0, 1, 2))(x, w_ih, w_hh)
    v2, g2 = jax.value_and_grad(l2, argnums=(0, 1, 2))(x, w_ih, w_hh)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    e = rnn_bidir_v2(x, w_ih, w_hh, chunk=chunk, interpret=True,
                     train=False)
    r = rnn_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(e), np.asarray(r), rtol=1e-6,
                               atol=1e-7)
