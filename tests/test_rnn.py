"""RNN cell golden tests against torch nn.LSTM/GRU/RNN (bias-free, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from ctc_pytorch_tpu.models.rnn import (
    _flip_within_lengths,
    cell_init,
    rnn_layer_apply,
    rnn_layer_init,
    _scan_direction,
)


def _torch_rnn(cell, input_size, hidden, bidirectional, seed=0):
    torch.manual_seed(seed)
    klass = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU, "rnn": torch.nn.RNN}[cell]
    return klass(input_size, hidden, bidirectional=bidirectional, bias=False)


def _params_from_torch(mod, cell, bidirectional):
    """Convert torch weights into our (in, n*H) transposed layout."""
    params = {"fwd": {
        "w_ih": jnp.asarray(mod.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(mod.weight_hh_l0.detach().numpy().T),
    }}
    if bidirectional:
        params["bwd"] = {
            "w_ih": jnp.asarray(mod.weight_ih_l0_reverse.detach().numpy().T),
            "w_hh": jnp.asarray(mod.weight_hh_l0_reverse.detach().numpy().T),
        }
    return params


@pytest.mark.parametrize("cell", ["lstm", "gru", "rnn"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_cell_matches_torch(cell, bidirectional):
    t, b, f, h = 7, 3, 5, 4
    rng = np.random.RandomState(0)
    x = rng.randn(t, b, f).astype(np.float32)
    mod = _torch_rnn(cell, f, h, bidirectional)
    with torch.no_grad():
        ref, _ = mod(torch.from_numpy(x))
    params = _params_from_torch(mod, cell, bidirectional)
    ours, _ = rnn_layer_apply(
        params, {}, jnp.asarray(x),
        cell=cell, hidden_size=h, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_flip_within_lengths():
    x = jnp.arange(12, dtype=jnp.float32).reshape(4, 3, 1)
    lengths = jnp.asarray([4, 2, 3])
    out = np.asarray(_flip_within_lengths(x, lengths))[:, :, 0]
    # col 0: full reverse of [0,3,6,9]
    np.testing.assert_array_equal(out[:, 0], [9, 6, 3, 0])
    # col 1: first 2 reversed, padding stays
    np.testing.assert_array_equal(out[:, 1], [4, 1, 7, 10])
    # col 2: first 3 reversed
    np.testing.assert_array_equal(out[:, 2], [8, 5, 2, 11])


def test_masked_bidirectional_matches_packed_torch():
    """Length-aware reversal == torch packed-sequence semantics (863 path)."""
    t, b, f, h = 8, 3, 4, 5
    rng = np.random.RandomState(1)
    x = rng.randn(t, b, f).astype(np.float32)
    lengths = np.array([8, 5, 3])
    for i, l in enumerate(lengths):
        x[l:, i] = 0.0
    mod = _torch_rnn("lstm", f, h, True, seed=2)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths)
    )
    with torch.no_grad():
        out_packed, _ = mod(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed, total_length=t)
    ref = ref.numpy()
    params = _params_from_torch(mod, "lstm", True)
    ours, _ = rnn_layer_apply(
        params, {}, jnp.asarray(x),
        cell="lstm", hidden_size=h, lengths=jnp.asarray(lengths),
        compute_dtype=jnp.float32,
    )
    ours = np.asarray(ours)
    # ALL rows, not just the valid prefix: pad_packed_sequence zero-fills
    # beyond each length and the lengths mode reproduces that exactly
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_lengths_mode_pallas_matches_scan():
    """The Pallas kernels serve lengths mode via a zeroed padded tail
    (bias-free cells keep the reverse state exactly zero through padding);
    every row -- valid and pad -- must match the scan path."""
    from ctc_pytorch_tpu.models import rnn as rnn_mod

    t, b, f, h = 6, 8, 4, 128  # h lane-aligned so the kernel gate passes
    rng = np.random.RandomState(3)
    x = rng.randn(t, b, f).astype(np.float32)
    lengths = np.array([6, 5, 3, 2, 6, 4, 1, 5])
    for i, l in enumerate(lengths):
        x[l:, i] = rng.randn(t - l, f)  # garbage in the padded tail
    for cell in ("lstm", "gru", "rnn"):
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        params = {
            "fwd": cell_init(k1, cell, f, h),
            "bwd": cell_init(k2, cell, f, h),
        }
        ref, _ = rnn_layer_apply(
            params, {}, jnp.asarray(x), cell=cell, hidden_size=h,
            lengths=jnp.asarray(lengths), compute_dtype=jnp.float32,
            pallas=False,
        )
        old_flag = rnn_mod.FORCE_PALLAS_OFF_TPU
        rnn_mod.FORCE_PALLAS_OFF_TPU = True
        try:
            got, _ = rnn_layer_apply(
                params, {}, jnp.asarray(x), cell=cell, hidden_size=h,
                lengths=jnp.asarray(lengths), compute_dtype=jnp.float32,
                pallas=True,
            )
        finally:
            rnn_mod.FORCE_PALLAS_OFF_TPU = old_flag
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=cell)
        # padded rows are exactly zero (pad_packed_sequence contract)
        for i, l in enumerate(lengths):
            np.testing.assert_array_equal(np.asarray(got)[l:, i], 0.0)


def test_init_shapes():
    key = jax.random.PRNGKey(0)
    p, s = rnn_layer_init(key, "lstm", 6, 8, True, True)
    assert p["fwd"]["w_ih"].shape == (6, 32)
    assert p["fwd"]["w_hh"].shape == (8, 32)
    assert p["bwd"]["w_ih"].shape == (6, 32)
    assert p["bn"]["scale"].shape == (6,)
    assert "bn" in s
