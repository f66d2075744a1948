"""v2 LSTM kernel (in-kernel time reversal): equality with v1/scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.lstm_pallas import lstm_bidir_pallas
from ctc_pytorch_tpu.ops.lstm_pallas_v2 import lstm_bidir_pallas_v2, v2_ok


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


@pytest.mark.parametrize("t,b,f,h,chunk", [
    (16, 3, 5, 4, 4),
    pytest.param(8, 2, 4, 4, 8, marks=pytest.mark.slow),
    (9, 2, 4, 4, 1)])  # odd T -> chunk=1
def test_v2_matches_v1_and_scan(t, b, f, h, chunk):
    params, x, w_ih, w_hh = _setup(t, b, f, h)
    ref = _scan_bidir_fused(params, x, "lstm", h, jnp.float32)
    v1 = lstm_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True)
    v2 = lstm_bidir_pallas_v2(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-6, atol=1e-7)


def test_v2_ok_gate():
    assert v2_ok(80, 128, 384)
    assert not v2_ok(80, 128, 100)  # H not lane-aligned
    assert v2_ok(81, 128, 384)  # odd T -> chunk=1
