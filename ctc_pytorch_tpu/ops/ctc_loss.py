"""CTC loss: log-space alpha-beta dynamic program, batched and jittable.

TPU-native replacement for ``nn.CTCLoss`` (``timit/steps/train_ctc.py:144``)
and warp-ctc (``my_863_corpus/steps/cnn_lstm_ctc.py:9,163``).

Design
------
* the whole batch advances one time-step per ``lax.scan`` iteration over the
  **static padded** T; per-utterance lengths are handled by *freezing* each
  utterance's alpha row once ``t >= input_length`` — no dynamic shapes, no
  host sync, grads flow only through valid frames;
* extended-label tensors (``z = [blank, l1, blank, ..., lL, blank]``) are
  precomputed as (B, S=2L+1) gathers, so the inner step is pure VPU work:
  three shifted adds, a ``logsumexp``, and one gather of ``log_probs[t]``;
* matches torch semantics: ``reduction='sum'`` + division by batch size is the
  reference's ``loss = CTCLoss_sum / B`` (``train_ctc.py:47-48``);
  ``zero_infinity`` supported (torch default False);
* gradients: a hand-derived backward using the beta recursion is provided as a
  ``custom_vjp`` — the standard CTC gradient
  ``dL/dlogits(t,k) = p(t,k) - gamma(t,k)`` evaluated entirely in log space.

The reference's blank index is 0 (``Vocab``: blank=0), which we default.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) interleaved with blanks."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _emit_scores(log_probs: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """emit[t,b,s] = log_probs[t,b,ext[b,s]] as a one-hot matmul.

    A lane-axis ``take_along_axis`` gather lowers terribly on TPU (measured
    ~9 ms at T=80,B=128,S=97 on v5e — a quarter of the whole train step);
    the one-hot contraction is exact (each row multiplies one entry by 1.0)
    and runs on the MXU in well under a millisecond.
    """
    c = log_probs.shape[-1]
    onehot = jax.nn.one_hot(ext, c, dtype=log_probs.dtype, axis=1)  # (B,C,S)
    return jnp.einsum(
        "tbc,bcs->tbs", log_probs, onehot, preferred_element_type=jnp.float32
    )


def _ctc_alpha(
    log_probs: jnp.ndarray,  # (T, B, C) log-softmax outputs
    ext: jnp.ndarray,  # (B, S) extended labels
    input_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the alpha recursion; returns (per-utt log-likelihood, final alpha)."""
    t_max, b, _ = log_probs.shape
    s = ext.shape[1]
    s_len = 2 * label_lengths + 1  # valid extended length per utterance

    # mask for the "skip" transition: allowed into position s when
    # ext[s] != blank and ext[s] != ext[s-2]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    skip_ok = (ext != ext_prev2) & (jnp.arange(s)[None, :] % 2 == 1)
    # odd positions hold real labels; even are blanks (skip never enters blanks)
    skip_add = jnp.where(skip_ok, 0.0, NEG_INF)

    pos_mask = jnp.arange(s)[None, :] < s_len[:, None]  # (B, S) valid positions

    emit = _emit_scores(log_probs, ext)  # (T, B, S): log p(t, z_s)

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit[0, :, 1], NEG_INF))
    alpha0 = jnp.where(pos_mask, alpha0, NEG_INF)

    def step(alpha, inputs):
        emit_t, t = inputs
        stay = alpha
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :s]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :s]
        cand = jnp.stack([stay, prev1, prev2 + skip_add], axis=0)
        new = jax.scipy.special.logsumexp(cand, axis=0) + emit_t
        new = jnp.where(pos_mask, new, NEG_INF)
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)  # freeze finished utterances
        return new, None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(step, alpha0, (emit[1:], ts))

    # log-likelihood = logsumexp of the last two valid positions
    idx_last = jnp.maximum(s_len - 1, 0)
    idx_prev = jnp.maximum(s_len - 2, 0)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(s_len >= 2, a_prev, NEG_INF)
    ll = jnp.logaddexp(a_last, a_prev)
    return ll, alpha


def ctc_forward_score(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance log P(labels | log_probs); (T,B,C),(B,L) -> (B,)."""
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    ll, _ = _ctc_alpha(log_probs, ext, input_lengths, label_lengths)
    return ll


# ---------------------------------------------------------------------------
# custom VJP: gradient via gamma = alpha * beta
# ---------------------------------------------------------------------------

def _ctc_grad(
    log_probs: jnp.ndarray,
    ext: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    ll: jnp.ndarray,
) -> jnp.ndarray:
    """d(-ll_b)/d(log_probs) for each utterance, (T, B, C).

    Exact gradient wrt the *log-probability* inputs: with
    gamma(t,s) = alpha(t,s) + beta(t,s) − emit(t,s) (log domain, path mass
    through state s at time t), d(−ll)/dlogp(t,k) = −γ(t,k) where
    γ(t,k) = exp(logsumexp_{s: z_s=k} gamma(t,s) − ll).

    (torch's nn.CTCLoss instead returns p−γ — the gradient wrt *logits*,
    valid only when its input came from log_softmax.  Composing this −γ VJP
    with log_softmax yields exactly p−γ, so end-to-end training gradients
    match torch; see tests/test_ctc_loss.py.)

    Implemented as a forward alpha scan and a reverse beta scan, both storing
    (T, B, S); the class-axis scatter is a one-hot matmul (MXU-friendly).
    """
    t_max, b, c = log_probs.shape
    s = ext.shape[1]
    s_len = 2 * label_lengths + 1
    pos_mask = jnp.arange(s)[None, :] < s_len[:, None]

    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    skip_ok_in = (ext != ext_prev2) & (jnp.arange(s)[None, :] % 2 == 1)
    skip_add_in = jnp.where(skip_ok_in, 0.0, NEG_INF)
    # for beta: transition out of s into s+2 allowed iff skip into s+2 allowed
    skip_add_out = jnp.pad(skip_add_in, ((0, 0), (0, 2)))[:, 2:]

    emit = _emit_scores(log_probs, ext)

    # ---- forward: store all alphas -------------------------------------
    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit[0, :, 1], NEG_INF)
    )
    alpha0 = jnp.where(pos_mask, alpha0, NEG_INF)

    def fwd_step(alpha, inputs):
        emit_t, t = inputs
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :s]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :s]
        cand = jnp.stack([alpha, prev1, prev2 + skip_add_in], axis=0)
        new = jax.scipy.special.logsumexp(cand, axis=0) + emit_t
        new = jnp.where(pos_mask, new, NEG_INF)
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, new

    _, alphas_rest = jax.lax.scan(
        fwd_step, alpha0, (emit[1:], jnp.arange(1, t_max))
    )
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # (T, B, S)

    # ---- backward: beta recursion (reverse scan) ------------------------
    # beta(T_b-1, s) = emit(T_b-1, s) for s in {S-1, S-2}; frozen for t >= T_b.
    idx_last = jnp.maximum(s_len - 1, 0)
    idx_prev = jnp.maximum(s_len - 2, 0)

    def beta_init_row(emit_T):  # (B, S) emission at each utterance's last frame
        beta = jnp.full((b, s), NEG_INF)
        beta = beta.at[jnp.arange(b), idx_last].set(
            jnp.take_along_axis(emit_T, idx_last[:, None], 1)[:, 0]
        )
        prev_val = jnp.take_along_axis(emit_T, idx_prev[:, None], 1)[:, 0]
        beta = beta.at[jnp.arange(b), idx_prev].set(
            jnp.where(s_len >= 2, prev_val, beta[jnp.arange(b), idx_prev])
        )
        return beta

    # emission at each utterance's final valid frame
    t_last = jnp.maximum(input_lengths - 1, 0)
    emit_at_last = emit[t_last, jnp.arange(b)]  # (B, S)
    beta_last = beta_init_row(emit_at_last)

    def bwd_step(beta, inputs):
        emit_t, t = inputs
        # transitions out of s: stay, s+1, s+2 (if allowed)
        nxt1 = jnp.pad(beta, ((0, 0), (0, 1)), constant_values=NEG_INF)[:, 1:]
        nxt2 = jnp.pad(beta, ((0, 0), (0, 2)), constant_values=NEG_INF)[:, 2:]
        cand = jnp.stack([beta, nxt1, nxt2 + skip_add_out], axis=0)
        new = jax.scipy.special.logsumexp(cand, axis=0) + emit_t
        new = jnp.where(pos_mask, new, NEG_INF)
        # at t == T_b - 1 (re)initialise; for t >= T_b keep frozen init
        is_last = (t == input_lengths - 1)[:, None]
        init_row = beta_init_row(emit_t)
        new = jnp.where(is_last, init_row, new)
        new = jnp.where((t > input_lengths - 1)[:, None], beta_last, new)
        return new, new

    _, betas = jax.lax.scan(
        bwd_step,
        beta_last,
        (emit, jnp.arange(t_max)),
        reverse=True,
    )  # (T, B, S)

    # gamma(t,s) = alpha + beta - emit (emit counted twice in the product)
    gamma = alphas + betas - emit
    gamma = jnp.where(pos_mask[None], gamma, NEG_INF)

    # scatter-add over classes in log space via segment trick:
    # lse_k(t,b) = logsumexp over {s: ext[b,s]==k} of gamma(t,b,s)
    one_hot = jax.nn.one_hot(ext, log_probs.shape[2], dtype=log_probs.dtype)
    gmax = jnp.max(gamma, axis=2, keepdims=True)
    gmax_safe = jnp.maximum(gmax, NEG_INF / 2)
    expg = jnp.exp(gamma - gmax_safe)
    dens = jnp.einsum("tbs,bsc->tbc", expg, one_hot)  # (T, B, C)
    log_dens = jnp.where(dens > 0, jnp.log(jnp.maximum(dens, 1e-37)), NEG_INF)
    log_gamma_k = log_dens + gmax_safe

    frame_valid = (
        jnp.arange(t_max)[:, None] < input_lengths[None, :]
    )[..., None]  # (T, B, 1)
    grad = -jnp.exp(log_gamma_k - ll[None, :, None])
    return jnp.where(frame_valid, grad, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_neg_ll(log_probs, labels, input_lengths, label_lengths, blank):
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    ll, _ = _ctc_alpha(log_probs, ext, input_lengths, label_lengths)
    return -ll


def _ctc_neg_ll_fwd(log_probs, labels, input_lengths, label_lengths, blank):
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    ll, _ = _ctc_alpha(log_probs, ext, input_lengths, label_lengths)
    return -ll, (log_probs, ext, input_lengths, label_lengths, ll)


def _ctc_neg_ll_bwd(blank, residuals, g):
    log_probs, ext, input_lengths, label_lengths, ll = residuals
    grad = _ctc_grad(log_probs, ext, input_lengths, label_lengths, ll)
    return (grad * g[None, :, None], None, None, None)


_ctc_neg_ll.defvjp(_ctc_neg_ll_fwd, _ctc_neg_ll_bwd)


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum_over_batch",
    zero_infinity: bool = False,
) -> jnp.ndarray:
    """CTC loss over a padded batch.

    Args:
      log_probs: (T, B, C) log-softmax outputs (time-major, like torch).
      labels: (B, L) padded target indices.
      input_lengths / label_lengths: (B,) valid lengths.
      reduction: 'none' | 'sum' | 'mean' (torch: sum of per-utt loss / label
        lengths) | 'sum_over_batch' (the reference's ``sum / batch_size``,
        ``train_ctc.py:47-48``).
    """
    neg_ll = _ctc_neg_ll(log_probs, labels, input_lengths, label_lengths, blank)
    if zero_infinity:
        neg_ll = jnp.where(neg_ll >= -NEG_INF / 2, 0.0, neg_ll)
    if reduction == "none":
        return neg_ll
    if reduction == "sum":
        return jnp.sum(neg_ll)
    if reduction == "mean":
        # torch: divide each loss by its target length, then MEAN over batch
        return jnp.mean(neg_ll / jnp.maximum(label_lengths, 1))
    if reduction == "sum_over_batch":
        return jnp.sum(neg_ll) / neg_ll.shape[0]
    raise ValueError(f"unknown reduction {reduction!r}")
