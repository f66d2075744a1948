"""Fused Pallas LSTM scan vs the lax.scan implementation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.lstm_pallas import lstm_bidir_pallas, lstm_scan_pallas


def _params(key, f, h):
    k1, k2 = jax.random.split(key)
    return {
        "fwd": cell_init(k1, "lstm", f, h),
        "bwd": cell_init(k2, "lstm", f, h),
    }


@pytest.mark.parametrize("t,b,f,h,chunk", [
    pytest.param(16, 4, 6, 8, 8, marks=pytest.mark.slow),
    (12, 2, 5, 4, 8),
])
def test_pallas_lstm_matches_scan(t, b, f, h, chunk):
    key = jax.random.PRNGKey(0)
    params = _params(key, f, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, b, f), jnp.float32)
    ref = _scan_bidir_fused(params, x, "lstm", h, jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    got = lstm_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_lstm_ragged_t_pads():
    # T not a multiple of chunk exercises the padding path
    t, b, f, h = 10, 2, 4, 4
    key = jax.random.PRNGKey(2)
    params = _params(key, f, h)
    x = jax.random.normal(jax.random.PRNGKey(3), (t, b, f), jnp.float32)
    ref = _scan_bidir_fused(params, x, "lstm", h, jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    got = lstm_bidir_pallas(x, w_ih, w_hh, chunk=8, interpret=True)
    assert got.shape == (t, b, 2 * h)
    # forward direction is exact; backward differs on padded-flip frames?
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
