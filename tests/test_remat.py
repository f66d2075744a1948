"""remat (jax.checkpoint) option: identical results, grads still flow."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.ops import ctc_loss


def _cfg(remat):
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = 8
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 2
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.remat = remat
    return cfg


@pytest.mark.slow
def test_remat_matches_plain():
    spec0 = ModelSpec.from_config(_cfg(False), num_class=5)
    spec1 = ModelSpec.from_config(_cfg(True), num_class=5)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 8), jnp.float32)
    labels = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    il = jnp.asarray([12, 12])
    ll = jnp.asarray([2, 2])

    def loss_fn(spec):
        def f(p):
            lp, _ = CTCModel.apply(spec, p, state, x)
            return ctc_loss(lp, labels, il, ll, reduction="sum")
        return f

    l0, g0 = jax.value_and_grad(loss_fn(spec0))(params)
    l1, g1 = jax.value_and_grad(loss_fn(spec1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
