"""v2 trainable LSTM kernel: forward + gradient parity vs the v1 kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.rnn import cell_init
from ctc_pytorch_tpu.ops.lstm_pallas_train import lstm_bidir_train
from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import (
    lstm_bidir_train_v2,
    train_v2_ok,
)


def _setup(t, b, f, h, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "fwd": cell_init(k1, "lstm", f, h),
        "bwd": cell_init(k2, "lstm", f, h),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (t, b, f), jnp.float32)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    return x, w_ih, w_hh


@pytest.mark.parametrize("t,b,f,h,chunk", [
    (7, 2, 6, 4, 1),  # odd T -> chunk=1, the newest dispatch surface
    pytest.param(8, 2, 6, 4, 4, marks=pytest.mark.slow),
    pytest.param(12, 3, 5, 4, 2, marks=pytest.mark.slow)])
def test_v2_train_matches_v1(t, b, f, h, chunk):
    x, w_ih, w_hh = _setup(t, b, f, h)
    tgt = jax.random.normal(jax.random.PRNGKey(11), (t, b, 2 * h), jnp.float32)

    def l1(x, wi, wh):
        out = lstm_bidir_train(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def l2(x, wi, wh):
        out = lstm_bidir_train_v2(x, wi, wh, chunk=chunk, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    v1, g1 = jax.value_and_grad(l1, argnums=(0, 1, 2))(x, w_ih, w_hh)
    v2, g2 = jax.value_and_grad(l2, argnums=(0, 1, 2))(x, w_ih, w_hh)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_unhoisted_backward_matches_hoisted(monkeypatch):
    """The chunk=1/large-h un-hoisted backward equals the hoisted pre-pass.

    _use_hoist picks the un-hoisted serial step only at chunk=1 with
    b*h > 128*256 (VMEM pressure erases the hoist's win there); force it
    at a tiny shape so interpret mode covers the branch.
    """
    import ctc_pytorch_tpu.ops.lstm_pallas_train_v2 as lv2

    x, w_ih, w_hh = _setup(7, 2, 6, 4)

    def loss(x, wi, wh):
        out = lstm_bidir_train_v2(x, wi, wh, chunk=1, interpret=True)
        return jnp.sum(out ** 2)

    v_h, g_h = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w_ih, w_hh)
    monkeypatch.setattr(lv2, "_use_hoist", lambda c, b, h: False)
    v_u, g_u = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w_ih, w_hh)
    np.testing.assert_allclose(float(v_u), float(v_h), rtol=1e-6)
    for name, a, b_ in zip(("dx", "dw_ih", "dw_hh"), g_u, g_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_use_hoist_crossover():
    from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import _use_hoist

    assert _use_hoist(2, 128, 384)       # chunked: always hoist
    assert _use_hoist(1, 128, 256)       # small plane: hoist
    assert not _use_hoist(1, 128, 384)   # chunk=1 large h: un-hoisted


def test_pick_chunk_skips_hoist_bytes_when_unhoisted():
    """At chunk=1 with b*h past the hoist crossover the kernel allocates
    only a dummy scratch — the VMEM estimate must not charge the full
    hoist footprint, or shapes that fit the un-hoisted chunk=1 kernel
    get bounced to the slower v1/scan path (ADVICE r4, low)."""
    from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import (
        _pick_chunk, _use_hoist)

    # (b=192, h=384) bf16: chunk=1 un-hoisted fits the 13 MiB budget,
    # but bufs + the 24*c*b*h*4 hoist bytes would not
    assert not _use_hoist(1, 192, 384)
    assert _pick_chunk(80, 192, 384, 2) == 1

    from ctc_pytorch_tpu.ops.gru_pallas_v2 import _pick_chunk as _pc_gru

    assert _pc_gru(80, 224, 384, 2) >= 1


def test_train_v2_ok_gate():
    assert train_v2_ok(80, 128, 384, jnp.bfloat16)
    assert train_v2_ok(81, 128, 384, jnp.bfloat16)  # odd T -> chunk=1
    assert train_v2_ok(95, 128, 256, jnp.bfloat16)  # the 863 front shape
    assert not train_v2_ok(80, 128, 100, jnp.bfloat16)  # unaligned H
    # fp32 streams at the flagship shape exceed VMEM -> v1 path
    assert not train_v2_ok(80, 128, 384, jnp.float32)
