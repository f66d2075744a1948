"""Batch-sliced kernel dispatch: `_split_batch_run` wiring.

A batch just past the v2 kernels' VMEM gate (e.g. B=256 at the flagship
shape, where `train_v2_ok` fails but B=128 passes) must run the v2 kernel
over batch slices rather than fall to the v1/scan paths — the RNN layer is
independent across batch rows, so slicing axis 1 is exact
(tools/probe_batch_scale.py measured the fall-through at ~2x step time).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ctc_pytorch_tpu.models.rnn as rnn_mod
from ctc_pytorch_tpu.models.rnn import (
    _split_batch_run,
    rnn_layer_apply,
    rnn_layer_init,
)

T, B, F, H = 8, 16, 24, 128  # dispatch gate needs H % 128 == 0


def test_split_batch_run_slices_in_order():
    x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
    out = _split_batch_run(
        lambda t, b, h, cd: b <= 4, lambda xs: xs * 2.0, x, 2, 1, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2.0)


def test_split_batch_run_none_when_no_divisor_passes():
    x = jnp.zeros((2, 8, 3), jnp.float32)
    assert _split_batch_run(
        lambda t, b, h, cd: False, lambda xs: xs, x, 2, 1, jnp.float32) is None


def _layer(seed=0):
    params, state = rnn_layer_init(
        jax.random.PRNGKey(seed), cell="lstm", input_size=F, hidden_size=H,
        bidirectional=True, batch_norm=False)
    x = jax.random.normal(jax.random.PRNGKey(seed + 5), (T, B, F), jnp.float32)
    return params, state, x


@pytest.mark.parametrize("train", [True, False])
def test_dispatch_splits_past_v2_gate(monkeypatch, train):
    """Full batch fails the (patched) v2 gate, half passes: the sliced v2
    output and its gradients must match the whole-batch scan path."""
    params, state, x = _layer()
    gate = lambda t, b, h, cd=None: b <= B // 2
    monkeypatch.setattr(
        "ctc_pytorch_tpu.ops.lstm_pallas_train_v2.train_v2_ok", gate)
    monkeypatch.setattr("ctc_pytorch_tpu.ops.lstm_pallas_v2.v2_ok", gate)
    monkeypatch.setattr(rnn_mod, "FORCE_PALLAS_OFF_TPU", True)

    def run(p, pallas):
        out, _ = rnn_layer_apply(
            p, state, x, cell="lstm", hidden_size=H, drop_rate=0.0,
            train=train, compute_dtype=jnp.float32, pallas=pallas)
        return jnp.sum(out ** 2)

    if train:
        v_k, g_k = jax.value_and_grad(run)(params, True)
        v_s, g_s = jax.value_and_grad(run)(params, False)
        for (pk, ak), (ps, a_s) in zip(
                jax.tree_util.tree_leaves_with_path(g_k),
                jax.tree_util.tree_leaves_with_path(g_s)):
            assert pk == ps
            np.testing.assert_allclose(np.asarray(ak), np.asarray(a_s),
                                       rtol=2e-4, atol=1e-5, err_msg=str(pk))
    else:
        v_k = run(params, True)
        v_s = run(params, False)
    np.testing.assert_allclose(float(v_k), float(v_s), rtol=1e-5)


@pytest.mark.parametrize("cell,patch", [
    ("gru", "ctc_pytorch_tpu.ops.gru_pallas_v2.gru_v2_ok"),
    ("rnn", "ctc_pytorch_tpu.ops.rnn_pallas_v2.rnn_v2_ok"),
])
def test_dispatch_splits_gru_rnn(monkeypatch, cell, patch):
    params, state = rnn_layer_init(
        jax.random.PRNGKey(1), cell=cell, input_size=F, hidden_size=H,
        bidirectional=True, batch_norm=False)[0:2]
    x = jax.random.normal(jax.random.PRNGKey(6), (T, B, F), jnp.float32)
    monkeypatch.setattr(patch, lambda t, b, h, cd=None: b <= B // 2)
    monkeypatch.setattr(rnn_mod, "FORCE_PALLAS_OFF_TPU", True)

    def run(pallas):
        out, _ = rnn_layer_apply(
            params, state, x, cell=cell, hidden_size=H, drop_rate=0.0,
            train=True, compute_dtype=jnp.float32, pallas=pallas)
        return out

    np.testing.assert_allclose(
        np.asarray(run(True)), np.asarray(run(False)), rtol=2e-5, atol=1e-6)
