"""Padding-masked BatchNorm (``bn_mask_padding``): the train step must be
exactly independent of the padded length.

Mechanism under test (models/layers.py ``batchnorm_apply`` + ctc_model.py):
the reference's BN planes normalise padding frames too (``model_ctc.py:29-32``),
so its training dynamics shift with the per-batch max length — measured as a
monotone PER ladder vs padding overshoot in PARITY_RUN.md.  With
``bn_mask_padding`` the BN statistics cover valid frames only and the padded
positions are zeroed after normalisation; because the RNN cells are bias-free
(``model_ctc.py:24-25``: ``bias=False``), zero inputs keep h == 0 through the
padding in both scan directions, so for no-CNN configs every tensor the loss
reads is identical whatever T the batch was padded to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctc_pytorch_tpu.config import CNNConfig
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.ops import ctc_loss


def _spec(cell="lstm", mask=True, drop=0.0):
    return ModelSpec(
        add_cnn=False,
        cnn=CNNConfig(),
        rnn_input_size=12,
        rnn_hidden_size=16,
        rnn_layers=2,
        rnn_cell=cell,
        bidirectional=True,
        batch_norm=True,
        num_class=7,
        drop_out=drop,
        compute_dtype="float32",
        use_pallas_rnn=False,
        pad_dynamics="valid" if mask else "padded",
    )


def _batch(t_pad, seed=0):
    rng = np.random.RandomState(seed)
    lens = np.array([5, 7, 4], np.int32)
    b = len(lens)
    x = np.zeros((b, t_pad, 12), np.float32)
    for i, l in enumerate(lens):
        x[i, :l] = rng.randn(l, 12)
    frac = lens.astype(np.float32) / np.float32(t_pad)
    labels = np.array([[1, 2, 3, 0], [2, 4, 5, 6], [3, 1, 0, 0]], np.int32)
    label_lens = np.array([3, 4, 2], np.int32)
    return jnp.asarray(x), jnp.asarray(frac), jnp.asarray(labels), \
        jnp.asarray(label_lens)


def _loss_and_grads(spec, params, state, t_pad, train, seed=0):
    x, frac, labels, label_lens = _batch(t_pad, seed)

    def loss_fn(p):
        out = CTCModel.apply(
            spec, p, state, x, train=train,
            rng=jax.random.PRNGKey(7) if train else None, frac=frac,
        )
        log_probs = out[0]
        t_out = log_probs.shape[0]
        input_sizes = (frac * t_out).astype(jnp.int32)
        nll = ctc_loss(log_probs, labels, input_sizes, label_lens,
                       reduction="none")
        return jnp.mean(nll), out[1]

    (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    return loss, grads, new_state


@pytest.mark.parametrize("cell", [
    "lstm",
    # the bias-free-zero property is per-cell; gru/rnn go in the slow tier
    pytest.param("gru", marks=pytest.mark.slow),
    pytest.param("rnn", marks=pytest.mark.slow),
])
def test_train_step_padding_invariant(cell):
    spec = _spec(cell)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    loss_a, grads_a, st_a = _loss_and_grads(spec, params, state, 8, True)
    loss_b, grads_b, st_b = _loss_and_grads(spec, params, state, 14, True)
    assert np.allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6)
    for ga, gb in zip(jax.tree_util.tree_leaves(grads_a),
                      jax.tree_util.tree_leaves(grads_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-5)
    # BN running statistics (training state the scheduler snapshots) match too
    for sa, sb in zip(jax.tree_util.tree_leaves(st_a),
                      jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-5, atol=1e-6)


def test_eval_padding_invariant():
    spec = _spec()
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    loss_a, _, _ = _loss_and_grads(spec, params, state, 8, False)
    loss_b, _, _ = _loss_and_grads(spec, params, state, 14, False)
    assert np.allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6)


def test_unmasked_bn_is_padding_sensitive():
    """Sanity: without the flag the same comparison must fail — otherwise the
    invariance test above proves nothing."""
    spec = _spec(mask=False)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    loss_a, _, _ = _loss_and_grads(spec, params, state, 8, True)
    loss_b, _, _ = _loss_and_grads(spec, params, state, 14, True)
    assert abs(float(loss_a) - float(loss_b)) > 1e-4


def test_masked_stats_match_unpadded_batch():
    """Masked BN statistics == plain BN statistics of the tightly-packed
    valid frames (direct check of the sufficient statistics)."""
    from ctc_pytorch_tpu.models.layers import batchnorm_apply, batchnorm_init

    rng = np.random.RandomState(1)
    lens = [5, 3]
    t, b, f = 9, 2, 4
    x = np.zeros((t, b, f), np.float32)
    rows = []
    for i, l in enumerate(lens):
        x[:l, i] = rng.randn(l, f)
        rows.append(x[:l, i])
    packed = np.concatenate(rows, 0)  # (sum(lens), F)
    mask = (np.arange(t)[:, None] < np.array(lens)[None, :]).astype(np.float32)

    params, state = batchnorm_init(f)
    out_m, st_m = batchnorm_apply(params, state, jnp.asarray(x), True,
                                  mask=jnp.asarray(mask))
    out_p, st_p = batchnorm_apply(params, state, jnp.asarray(packed), True)
    np.testing.assert_allclose(np.asarray(st_m["mean"]),
                               np.asarray(st_p["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_m["var"]),
                               np.asarray(st_p["var"]), rtol=1e-5, atol=1e-6)
    # valid positions normalised identically; padded positions exactly zero
    np.testing.assert_allclose(
        np.asarray(out_m)[:5, 0], np.asarray(out_p)[:5], rtol=1e-5, atol=1e-6
    )
    assert np.all(np.asarray(out_m)[5:, 0] == 0.0)
    assert np.all(np.asarray(out_m)[3:, 1] == 0.0)
