"""Pallas CTC kernels vs the scan implementation (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.ops import ctc_loss
from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas


def _case(seed, t=14, b=3, c=6, lmax=4):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, b, c).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lens = rng.randint(t // 2, t + 1, size=b)
    label_lens = rng.randint(1, lmax + 1, size=b)
    labels = np.zeros((b, lmax), np.int32)
    for i in range(b):
        labels[i, : label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    return lp, jnp.asarray(labels), jnp.asarray(input_lens), jnp.asarray(label_lens)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_loss_matches_scan(seed):
    lp, labels, il, ll = _case(seed)
    ref = ctc_loss(lp, labels, il, ll, reduction="none")
    got = ctc_loss_pallas(lp, labels, il, ll, reduction="none",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_pallas_grad_matches_scan():
    lp, labels, il, ll = _case(5)
    f_ref = lambda x: ctc_loss(x, labels, il, ll, reduction="sum")
    f_pal = lambda x: ctc_loss_pallas(x, labels, il, ll, reduction="sum",
                                      interpret=True)
    g_ref = np.asarray(jax.grad(f_ref)(lp))
    g_pal = np.asarray(jax.grad(f_pal)(lp))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-6)


def test_pallas_infeasible_utterance_keeps_grads_finite():
    """An utterance whose labels cannot align in its frames (input shorter
    than the label sequence) must behave like the scan path: huge finite
    loss, ZERO gradient for that row, other rows unaffected.

    Regression: _lse3 underflowed to log(0) = -inf for unreachable DP
    cells, and -exp(gamma - (-inf)) turned the whole gradient Inf/NaN."""
    t, b, c, lmax = 10, 3, 6, 8
    rng = np.random.RandomState(3)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(t, b, c), jnp.float32), -1)
    labels = jnp.asarray(rng.randint(1, c, size=(b, lmax)), jnp.int32)
    il = jnp.asarray([t, 3, t])  # row 1: 3 frames for 8 labels — infeasible
    ll = jnp.asarray([4, lmax, 4])

    loss_pal = ctc_loss_pallas(lp, labels, il, ll, reduction="none",
                               interpret=True)
    assert np.isfinite(np.asarray(loss_pal)).all()
    assert float(loss_pal[1]) > 1e20  # impossible alignment: huge loss

    # zero_infinity drops the infeasible row entirely (torch's knob)
    z = ctc_loss_pallas(lp, labels, il, ll, reduction="none",
                        zero_infinity=True, interpret=True)
    assert float(z[1]) == 0.0
    np.testing.assert_allclose(np.asarray(z)[[0, 2]],
                               np.asarray(loss_pal)[[0, 2]])

    f_pal = lambda x: ctc_loss_pallas(x, labels, il, ll, reduction="sum",
                                      interpret=True)
    f_ref = lambda x: ctc_loss(x, labels, il, ll, reduction="sum")
    g_pal = np.asarray(jax.grad(f_pal)(lp))
    g_ref = np.asarray(jax.grad(f_ref)(lp))
    assert np.isfinite(g_pal).all()
    np.testing.assert_array_equal(g_pal[:, 1, :], 0.0)  # dead row: zero grad
    np.testing.assert_allclose(g_pal[:, 0, :], g_ref[:, 0, :],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_pal[:, 2, :], g_ref[:, 2, :],
                               rtol=1e-4, atol=1e-6)


def test_vmem_overflow_falls_back_to_scan(monkeypatch):
    """Shapes too big for VMEM must silently take the scan path."""
    import ctc_pytorch_tpu.ops.ctc_pallas as cp

    assert not cp._pallas_fits_vmem(t_max=2000, b=256, s=201)
    assert cp._pallas_fits_vmem(t_max=160, b=64, s=97)

    def _boom(*a, **k):  # the kernels must never be entered
        raise AssertionError("pallas path used for an over-budget shape")

    monkeypatch.setattr(cp, "_neg_ll_pallas", _boom)
    # force the decision with a tiny budget so the test stays fast
    monkeypatch.setattr(cp, "_pallas_fits_vmem", lambda *a, **k: False)
    lp, labels, il, ll = _case(7)
    ref = ctc_loss(lp, labels, il, ll, reduction="none")
    got = ctc_loss_pallas(lp, labels, il, ll, reduction="none",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_pallas_empty_label_and_short_input():
    t, b, c = 6, 2, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(np.random.RandomState(0).randn(t, b, c), jnp.float32), -1
    )
    labels = jnp.asarray([[0, 0], [1, 1]], jnp.int32)
    il = jnp.asarray([6, 2])
    ll = jnp.asarray([0, 2])
    ref = ctc_loss(lp, labels, il, ll, reduction="none")
    got = ctc_loss_pallas(lp, labels, il, ll, reduction="none",
                          interpret=True)
    # utterance 0: all-blank likelihood; utterance 1: impossible (inf-ish)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5)
    assert float(got[1]) > 1e20 and float(ref[1]) > 1e20
