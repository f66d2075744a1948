"""Trainable Pallas GRU: forward + gradient parity vs scan autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.gru_pallas_train import gru_bidir_train


def _setup(t, b, f, h, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "fwd": cell_init(k1, "gru", f, h),
        "bwd": cell_init(k2, "gru", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (t, b, f), jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    return params, x, w_ih, w_hh


@pytest.mark.parametrize("t,b,f,h,chunk", [(16, 3, 5, 4, 8), (10, 2, 4, 4, 4)])
def test_forward_matches_scan(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h)
    ref = _scan_bidir_fused(params, x, "gru", h, jnp.float32)
    got = gru_bidir_train(x, w_ih, w_hh, chunk=chunk, interpret=True)
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
        out = _scan_bidir_fused(p, x, "gru", h, jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    def loss_pallas(x, w_ih, w_hh):
        out = gru_bidir_train(x, w_ih, w_hh, chunk=chunk, interpret=True)
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
    """T not divisible by either chunk exercises the pad/trim paths."""
    params, x, w_ih, w_hh = _setup(11, 2, 4, 4, seed=5)
    ref = _scan_bidir_fused(params, x, "gru", 4, jnp.float32)
    got = gru_bidir_train(x, w_ih, w_hh, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    def loss(w_hh):
        out = gru_bidir_train(x, w_ih, w_hh, chunk=4, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(w_hh):
        p = {
            "fwd": {"w_ih": w_ih[0], "w_hh": w_hh[0]},
            "bwd": {"w_ih": w_ih[1], "w_hh": w_hh[1]},
        }
        return jnp.sum(_scan_bidir_fused(p, x, "gru", 4, jnp.float32) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(w_hh)), np.asarray(jax.grad(loss_ref)(w_hh)),
        rtol=5e-4, atol=5e-5,
    )


def test_vmem_guards_for_large_hidden():
    """Shapes whose backward can't fit VMEM must be gated (callers fall
    back to the scan path) instead of dying inside Mosaic."""
    import jax.numpy as jnp

    from ctc_pytorch_tpu.ops.gru_pallas_train import gru_train_ok
    from ctc_pytorch_tpu.ops.lstm_pallas_train import train_v1_ok

    # flagship shapes fit
    assert train_v1_ok(128, 384, jnp.bfloat16)
    assert gru_train_ok(128, 256, jnp.bfloat16)
    # very large hidden sizes do not (fp32 weights alone exceed the budget)
    assert not train_v1_ok(128, 1024, jnp.float32)
    assert not gru_train_ok(128, 1024, jnp.float32)
