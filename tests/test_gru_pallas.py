"""Fused Pallas GRU kernel vs the lax.scan implementation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused, cell_init
from ctc_pytorch_tpu.ops.gru_pallas import gru_bidir_pallas


@pytest.mark.parametrize("t,b,f,h,chunk", [
    pytest.param(16, 4, 6, 8, 8, marks=pytest.mark.slow),
    (10, 2, 5, 4, 4),
])
def test_pallas_gru_matches_scan(t, b, f, h, chunk):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "fwd": cell_init(k1, "gru", f, h),
        "bwd": cell_init(k2, "gru", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (t, b, f), jnp.float32)
    ref = _scan_bidir_fused(params, x, "gru", h, jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    got = gru_bidir_pallas(x, w_ih, w_hh, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
