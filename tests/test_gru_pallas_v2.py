"""v2 GRU kernels: forward/eval/gradient parity vs the v1 kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import cell_init
from ctc_pytorch_tpu.ops.gru_pallas_train import gru_bidir_train
from ctc_pytorch_tpu.ops.gru_pallas_v2 import gru_bidir_v2, gru_v2_ok


def _setup(t, b, f, h, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "fwd": cell_init(k1, "gru", f, h),
        "bwd": cell_init(k2, "gru", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (t, b, f), jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    return x, w_ih, w_hh


@pytest.mark.parametrize("t,b,f,h,chunk", [
    pytest.param(8, 2, 6, 4, 4, marks=pytest.mark.slow),
    (7, 2, 6, 4, 1)])  # odd T -> chunk=1, exercises everything + chunk=1
def test_v2_gru_matches_v1(t, b, f, h, chunk):
    x, w_ih, w_hh = _setup(t, b, f, h)
    tgt = jax.random.normal(jax.random.PRNGKey(11), (t, b, 2 * h), jnp.float32)

    def l1(x, wi, wh):
        out = gru_bidir_train(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def l2(x, wi, wh):
        out = gru_bidir_v2(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    v1, g1 = jax.value_and_grad(l1, argnums=(0, 1, 2))(x, w_ih, w_hh)
    v2, g2 = jax.value_and_grad(l2, argnums=(0, 1, 2))(x, w_ih, w_hh)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    # eval path (no guard rows) bit-matches the train forward
    e = gru_bidir_v2(x, w_ih, w_hh, chunk=chunk, interpret=True, train=False)
    r = gru_bidir_train(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(e), np.asarray(r), rtol=1e-6,
                               atol=1e-7)


def test_unhoisted_backward_matches_hoisted(monkeypatch):
    """GRU chunk=1/large-h un-hoisted backward equals the hoisted pre-pass.

    gru_pallas_v2 reuses lstm_pallas_train_v2._use_hoist (imported at call
    time), so patching it there forces the un-hoisted branch here too.
    """
    import ctc_pytorch_tpu.ops.lstm_pallas_train_v2 as lv2

    x, w_ih, w_hh = _setup(7, 2, 6, 4)

    def loss(x, wi, wh):
        out = gru_bidir_v2(x, wi, wh, chunk=1, interpret=True)
        return jnp.sum(out ** 2)

    v_h, g_h = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w_ih, w_hh)
    monkeypatch.setattr(lv2, "_use_hoist", lambda c, b, h: False)
    v_u, g_u = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w_ih, w_hh)
    np.testing.assert_allclose(float(v_u), float(v_h), rtol=1e-6)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g_u, g_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_gru_v2_ok_gate():
    assert gru_v2_ok(200, 128, 256, jnp.bfloat16)
    assert gru_v2_ok(201, 128, 256, jnp.bfloat16)  # odd T -> chunk=1
    assert gru_v2_ok(95, 128, 256, jnp.bfloat16)  # the 863 front shape
    assert not gru_v2_ok(200, 128, 100, jnp.bfloat16)
