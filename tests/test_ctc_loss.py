"""CTC loss golden tests against torch.nn.CTCLoss (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from ctc_pytorch_tpu.ops import ctc_loss, ctc_forward_score


def _random_case(seed, t=20, b=4, c=6, lmax=7, tmin=10):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, b, c).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    input_lens = rng.randint(tmin, t + 1, size=b)
    label_lens = rng.randint(1, lmax + 1, size=b)
    labels = np.zeros((b, lmax), np.int32)
    for i in range(b):
        labels[i, : label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    return log_probs, labels, input_lens, label_lens


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_loss_matches_torch(seed):
    log_probs, labels, input_lens, label_lens = _random_case(seed)
    t_lp = torch.from_numpy(log_probs).double().requires_grad_(True)
    torch_loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
        torch.log_softmax(t_lp, -1) * 0 + t_lp,  # already log-probs
        torch.from_numpy(labels).long(),
        torch.from_numpy(input_lens).long(),
        torch.from_numpy(label_lens).long(),
    )
    ours = ctc_loss(
        jnp.asarray(log_probs),
        jnp.asarray(labels),
        jnp.asarray(input_lens),
        jnp.asarray(label_lens),
        reduction="sum",
    )
    np.testing.assert_allclose(float(ours), float(torch_loss), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_grad_matches_torch_through_log_softmax(seed):
    """Composed training gradient (logits -> log_softmax -> ctc) vs torch.

    torch's nn.CTCLoss backward returns the *logits*-space gradient for its
    log_probs argument (valid only after log_softmax); our VJP is the exact
    gradient wrt log-probs, so the comparison must compose both with
    log_softmax — which is also exactly how both frameworks train.
    """
    rng = np.random.RandomState(seed)
    t, b, c = 15, 3, 5
    logits = rng.randn(t, b, c).astype(np.float32)
    input_lens = rng.randint(8, t + 1, size=b)
    label_lens = rng.randint(1, 6, size=b)
    labels = np.zeros((b, 6), np.int32)
    for i in range(b):
        labels[i, : label_lens[i]] = rng.randint(1, c, size=label_lens[i])

    t_logits = torch.from_numpy(logits).double().requires_grad_(True)
    loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
        torch.log_softmax(t_logits, -1),
        torch.from_numpy(labels).long(),
        torch.from_numpy(input_lens).long(),
        torch.from_numpy(label_lens).long(),
    )
    loss.backward()
    torch_grad = t_logits.grad.numpy()

    fn = lambda lg: ctc_loss(
        jax.nn.log_softmax(lg, axis=-1), jnp.asarray(labels),
        jnp.asarray(input_lens), jnp.asarray(label_lens), reduction="sum",
    )
    ours_grad = np.asarray(jax.grad(fn)(jnp.asarray(logits)))
    # fp32 scan accumulation noise bounds agreement (math verified exact in
    # float64 against torch double: see ops/ctc_loss.py docstring)
    np.testing.assert_allclose(ours_grad, torch_grad, rtol=2e-3, atol=2e-3)


def test_custom_vjp_matches_autodiff_through_score():
    log_probs, labels, input_lens, label_lens = _random_case(7, t=12, b=2, c=5)
    # forward score path (no custom vjp) vs the custom-vjp loss path
    fn_auto = lambda lp: -jnp.sum(
        ctc_forward_score(
            lp, jnp.asarray(labels), jnp.asarray(input_lens), jnp.asarray(label_lens)
        )
    )
    fn_custom = lambda lp: ctc_loss(
        lp, jnp.asarray(labels), jnp.asarray(input_lens), jnp.asarray(label_lens),
        reduction="sum",
    )
    lp = jnp.asarray(log_probs)
    np.testing.assert_allclose(float(fn_auto(lp)), float(fn_custom(lp)), rtol=1e-5)
    g_auto = np.asarray(jax.grad(fn_auto)(lp))
    g_custom = np.asarray(jax.grad(fn_custom)(lp))
    np.testing.assert_allclose(g_custom, g_auto, rtol=2e-3, atol=2e-3)


def test_sum_over_batch_reduction():
    # the reference trains with CTCLoss(sum) / batch_size (train_ctc.py:47-48)
    log_probs, labels, input_lens, label_lens = _random_case(3)
    args = (
        jnp.asarray(log_probs), jnp.asarray(labels),
        jnp.asarray(input_lens), jnp.asarray(label_lens),
    )
    s = ctc_loss(*args, reduction="sum")
    sb = ctc_loss(*args, reduction="sum_over_batch")
    np.testing.assert_allclose(float(sb), float(s) / log_probs.shape[1], rtol=1e-6)


def test_mean_reduction_matches_torch():
    """torch 'mean': divide each loss by its target length, then mean over
    the batch (regression: ours returned the SUM of length-normalised
    losses — B x torch's value)."""
    log_probs, labels, input_lens, label_lens = _random_case(11)
    torch_loss = torch.nn.CTCLoss(blank=0, reduction="mean")(
        torch.from_numpy(np.asarray(log_probs)),
        torch.from_numpy(np.asarray(labels)),
        torch.from_numpy(np.asarray(input_lens)),
        torch.from_numpy(np.asarray(label_lens)),
    )
    args = (
        jnp.asarray(log_probs), jnp.asarray(labels),
        jnp.asarray(input_lens), jnp.asarray(label_lens),
    )
    ours = ctc_loss(*args, reduction="mean")
    np.testing.assert_allclose(float(ours), float(torch_loss), rtol=1e-5)
    from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas

    ours_p = ctc_loss_pallas(*args, reduction="mean", interpret=True)
    np.testing.assert_allclose(float(ours_p), float(torch_loss), rtol=1e-5)


def test_empty_label():
    # all-blank path: loss = -sum_t log p(blank)
    t, b, c = 6, 1, 4
    logits = np.random.RandomState(0).randn(t, b, c).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    ours = ctc_loss(
        jnp.asarray(lp), jnp.zeros((1, 3), jnp.int32),
        jnp.asarray([t]), jnp.asarray([0]), reduction="sum",
    )
    expect = -lp[:, 0, 0].sum()
    np.testing.assert_allclose(float(ours), expect, rtol=1e-5)


def test_impossible_alignment_is_inf_and_zero_infinity():
    # T shorter than required extended length -> inf (torch zero_infinity=False)
    lp = np.log(np.full((2, 1, 3), 1.0 / 3, np.float32))
    labels = jnp.asarray([[1, 1, 1]])  # needs T >= 5 (repeats need blanks)
    loss = ctc_loss(jnp.asarray(lp), labels, jnp.asarray([2]), jnp.asarray([3]),
                    reduction="none")
    assert float(loss[0]) > 1e20
    loss0 = ctc_loss(jnp.asarray(lp), labels, jnp.asarray([2]), jnp.asarray([3]),
                     reduction="none", zero_infinity=True)
    assert float(loss0[0]) == 0.0
