"""SPMD coverage of the production Pallas kernel path (VERDICT r2 item 4).

The data-mesh train step runs per-shard inside ``shard_map``; with the
Pallas RNN kernels forced off-TPU (interpret mode) and the Pallas CTC loss,
the sharded loss must equal the single-device loss bit-for-bit-ish: sync-BN
psums + global-denominator loss + psum'd grads reproduce global-batch math.
"""

import dataclasses

import numpy as np
import pytest

import jax

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.models import rnn as rnn_mod
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.parallel import make_mesh, replicate, shard_batch
from ctc_pytorch_tpu.train.loop import make_step_fns
from ctc_pytorch_tpu.train.state import create_train_state

pytestmark = pytest.mark.slow


def _spec(rnn_type="nn.LSTM"):
    cfg = Config()
    cfg.rnn_hidden_size = 128  # Pallas lane tiling needs H % 128 == 0
    cfg.rnn_layers = 1
    cfg.rnn_input_size = 24
    cfg.rnn_type = rnn_type
    cfg.dtype = "float32"
    cfg.cnn.add_cnn = False
    spec = ModelSpec.from_config(cfg, num_class=13)
    return cfg, dataclasses.replace(spec, use_pallas_rnn=True, drop_out=0.0)


@pytest.mark.parametrize("rnn_type", ["nn.LSTM", "nn.GRU"])
def test_mesh_pallas_loss_equals_single_device(rnn_type):
    n_dev = 8
    cfg, spec = _spec(rnn_type)
    b, t, l = 4 * n_dev, 16, 4  # 4 rows/shard: (2B) % 8 == 0 per device
    rng = np.random.RandomState(0)
    feats = rng.randn(b, t, cfg.rnn_input_size).astype(np.float32)
    frac = np.ones((b,), np.float32)
    labels = rng.randint(1, spec.num_class, size=(b, l)).astype(np.int32)
    label_lens = np.full((b,), l, np.int32)
    mask = np.ones((b,), np.float32)
    key = jax.random.PRNGKey(1)

    state1, tx = create_train_state(jax.random.PRNGKey(0), spec, 1e-3, 0.0)
    state2, _ = create_train_state(jax.random.PRNGKey(0), spec, 1e-3, 0.0)

    rnn_mod.FORCE_PALLAS_OFF_TPU = True
    try:
        train1, _ = make_step_fns(spec, tx, None, ctc_impl="pallas")
        st1, loss1, *_ = train1(state1, feats, frac, labels, label_lens,
                                mask, key)
        mesh = make_mesh(jax.devices()[:n_dev])
        trainN, _ = make_step_fns(spec, tx, mesh, ctc_impl="pallas")
        sharded = shard_batch((feats, frac, labels, label_lens, mask), mesh)
        stN, lossN, *_ = trainN(replicate(state2, mesh), *sharded,
                                replicate(key, mesh))
    finally:
        rnn_mod.FORCE_PALLAS_OFF_TPU = False
    assert np.isfinite(float(lossN))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=2e-5)
    # updated params must also agree: psum'd grads through the Pallas VJPs
    # under shard_map reproduce the single-device optimiser update
    l1 = jax.tree_util.tree_leaves_with_path(st1.params)
    lN = jax.tree_util.tree_leaves_with_path(stN.params)
    assert len(l1) == len(lN) > 0
    for (p1, a1), (pN, aN) in zip(l1, lN):
        assert p1 == pN
        # absolute tolerance: Adam normalises grads, so psum
        # reduction-order noise on a near-zero grad element can flip its
        # update direction (rel error unbounded) — but any missing/wrong
        # collective shifts most elements by the full ~lr=1e-3 step size,
        # an order above this bound
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(aN), rtol=0, atol=1e-4,
            err_msg=str(p1))
