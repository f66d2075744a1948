"""Trainable Pallas LSTM: forward + gradient parity vs scan autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.lstm_pallas_train import lstm_bidir_train


def _setup(t, b, f, h, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "fwd": cell_init(k1, "lstm", f, h),
        "bwd": cell_init(k2, "lstm", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (t, b, f), jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    return params, x, w_ih, w_hh


@pytest.mark.parametrize("t,b,f,h,chunk", [(16, 3, 5, 4, 8), (10, 2, 4, 4, 4)])
def test_forward_matches_scan(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h)
    ref = _scan_bidir_fused(params, x, "lstm", h, jnp.float32)
    got = lstm_bidir_train(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_batch_split_backward_matches_unsplit():
    """The two-half backward (bwd_split) must give identical gradients."""
    from ctc_pytorch_tpu.ops.lstm_pallas_train import lstm_scan_train

    t, b, f, h = 12, 8, 6, 4  # b2 = 16 -> halves of 8
    params, x, w_ih, w_hh = _setup(t, b, f, h, seed=9)
    xr = jnp.flip(x, axis=0)
    x2 = jnp.stack([x, xr]).reshape(2, t * b, -1)
    gx = jax.lax.dot_general(
        x2, w_ih, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    ).reshape(2, t, b, 4 * h)
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)

    def loss(gx, w_hh, split):
        ys = lstm_scan_train(gx, w_hh, 4, 2, True, split)
        return jnp.sum(ys ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1))(gx, w_hh, False)
    g_split = jax.grad(loss, argnums=(0, 1))(gx, w_hh, True)
    for name, a, b_ in zip(("dgx", "dw_hh"), g_split, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7, err_msg=name
        )


@pytest.mark.parametrize("t,b,f,h,chunk", [
    pytest.param(12, 2, 4, 4, 4, marks=pytest.mark.slow),
    (8, 3, 5, 4, 8),
])
def test_gradients_match_scan_autodiff(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h, seed=3)
    # a non-trivial loss over the outputs
    tgt = jax.random.normal(jax.random.PRNGKey(11), (t, b, 2 * h), jnp.float32)

    def loss_scan(x, w_ih, w_hh):
        p = {
            "fwd": {"w_ih": w_ih[0], "w_hh": w_hh[0]},
            "bwd": {"w_ih": w_ih[1], "w_hh": w_hh[1]},
        }
        out = _scan_bidir_fused(p, x, "lstm", h, jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    def loss_pallas(x, w_ih, w_hh):
        out = lstm_bidir_train(x, w_ih, w_hh, chunk=chunk, interpret=True)
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
