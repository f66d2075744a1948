"""Pallas TPU kernels for the CTC dynamic program.

The lax.scan CTC (ops/ctc_loss.py) issues T sequential fused ops; these
kernels run the whole alpha (and beta) recursion inside ONE Pallas program
with the state held in VMEM — no per-step dispatch, no scan overhead.  At
TIMIT shapes everything fits VMEM comfortably (emit (T,B,S) fp32 at T=160,
B=64, S=97 is ~4 MB < 16 MB); larger shapes fall back to the scan path.

Kernels are pure VPU work (lane-rolled adds + 3-way logsumexp per step); the
class gather that builds ``emit`` and the one-hot matmul in the gradient
stay outside in XLA where they fuse with the model.

Exposed:
  * ``ctc_alpha_pallas`` — alphas (T,B,S) forward DP
  * ``ctc_beta_pallas``  — betas (T,B,S) reverse DP (rows past each
    utterance's last frame are don't-care; the gradient masks them)
  * ``ctc_loss_pallas``  — drop-in for ops.ctc_loss with a custom VJP built
    from the two kernels (the same exact −γ gradient; see ops/ctc_loss.py)

Pass ``interpret=True`` off-TPU (tests run the interpreter on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ctc_pytorch_tpu.ops.ctc_loss import NEG_INF, _emit_scores, _extend_labels
from ctc_pytorch_tpu.ops.lstm_pallas import VMEM_BUDGET, _auto_interpret


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    # when all three args sit at ~NEG_INF the sum underflows to exactly 0
    # and log(0) = -inf would leak into the DP table — and through
    # -exp(gamma - ll) into Inf/NaN gradients for any utterance whose
    # labels cannot be aligned in its frames.  Pin those cells to exactly
    # NEG_INF: unreachable mass stays ~25 orders below the gmax_safe floor,
    # so the gradient's exp(gamma - gmax_safe) underflows to a true 0 and
    # infeasible utterances get finite huge loss + ZERO gradients, like the
    # lax.scan path.  (A log-floor instead would lift dead cells to the
    # gmax_safe scale and produce garbage gradients.)
    return jnp.where(
        m <= NEG_INF / 2, NEG_INF,
        m_safe + jnp.log(jnp.maximum(s, 1e-37)),
    )


def _roll_prev(x, n, col, fill=NEG_INF):
    """x shifted +n along the lane axis: out[:, j] = x[:, j-n]."""
    return jnp.where(col >= n, pltpu.roll(x, n, 1), fill)


def _roll_next(x, n, s, col, fill=NEG_INF):
    """x shifted -n along the lane axis: out[:, j] = x[:, j+n].

    pltpu.roll requires a non-negative shift; -n mod s is the same rotation.
    """
    return jnp.where(col < s - n, pltpu.roll(x, s - n, 1), fill)


def _alpha_kernel(emit_ref, skip_ref, mask_ref, len_ref, alphas_ref):
    t_max, b, s = emit_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    emit0 = emit_ref[0]
    init = jnp.where(col <= 1, emit0, NEG_INF)
    init = jnp.where(mask_ref[:] > 0, init, NEG_INF)
    alphas_ref[0] = init
    lengths = len_ref[:]  # (B, 1) int32

    def step(t, alpha):
        prev1 = _roll_prev(alpha, 1, col)
        prev2 = _roll_prev(alpha, 2, col)
        new = _lse3(alpha, prev1, prev2 + skip_ref[:]) + emit_ref[t]
        new = jnp.where(mask_ref[:] > 0, new, NEG_INF)
        new = jnp.where(t < lengths, new, alpha)  # freeze finished utts
        alphas_ref[t] = new
        return new

    jax.lax.fori_loop(1, t_max, step, init)


def _beta_kernel(emit_ref, skipout_ref, mask_ref, len_ref, slen_ref,
                 betas_ref):
    t_max, b, s = emit_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    lengths = len_ref[:]  # (B, 1)
    s_len = slen_ref[:]  # (B, 1)
    carry0 = jnp.full((b, s), NEG_INF)

    def step(i, beta):
        t = t_max - 1 - i
        emit_t = emit_ref[t]
        nxt1 = _roll_next(beta, 1, s, col)
        nxt2 = _roll_next(beta, 2, s, col)
        new = _lse3(beta, nxt1, nxt2 + skipout_ref[:]) + emit_t
        new = jnp.where(mask_ref[:] > 0, new, NEG_INF)
        # terminal row at each utterance's final frame: emit at the last
        # two extended positions (BeamSearch-free CTC terminal condition)
        terminal = jnp.where(
            (col == s_len - 1) | (col == s_len - 2), emit_t, NEG_INF
        )
        new = jnp.where(t == lengths - 1, terminal, new)
        # rows past the last frame are don't-care (gradient masks them)
        betas_ref[t] = new
        return new

    jax.lax.fori_loop(0, t_max, step, carry0)


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def ctc_alpha_pallas(
    emit: jnp.ndarray,
    skip_add: jnp.ndarray,
    pos_mask: jnp.ndarray,
    input_lengths: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    t_max, b, s = emit.shape
    lengths = input_lengths.astype(jnp.int32).reshape(b, 1)
    return pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        in_specs=_vmem_specs(4),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emit.astype(jnp.float32), skip_add.astype(jnp.float32),
      pos_mask.astype(jnp.float32), lengths)


def ctc_beta_pallas(
    emit: jnp.ndarray,
    skip_add_out: jnp.ndarray,
    pos_mask: jnp.ndarray,
    input_lengths: jnp.ndarray,
    s_len: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    t_max, b, s = emit.shape
    lengths = input_lengths.astype(jnp.int32).reshape(b, 1)
    slen = s_len.astype(jnp.int32).reshape(b, 1)
    return pl.pallas_call(
        _beta_kernel,
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        in_specs=_vmem_specs(5),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emit.astype(jnp.float32), skip_add_out.astype(jnp.float32),
      pos_mask.astype(jnp.float32), lengths, slen)


# ---------------------------------------------------------------------------
# drop-in loss with custom VJP over the two kernels
# ---------------------------------------------------------------------------

def _prepare(log_probs, labels, blank):
    t_max, b, c = log_probs.shape
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    s = ext.shape[1]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    skip_ok = (ext != ext_prev2) & (jnp.arange(s)[None, :] % 2 == 1)
    skip_in = jnp.where(skip_ok, 0.0, NEG_INF)
    skip_out = jnp.pad(skip_in, ((0, 0), (0, 2)))[:, 2:]
    emit = _emit_scores(log_probs, ext)
    return ext, emit, skip_in, skip_out


def _ll_from_alphas(alphas, input_lengths, s_len):
    t_max, b, s = alphas.shape
    t_last = jnp.maximum(input_lengths - 1, 0)
    final = alphas[t_last, jnp.arange(b)]  # (B, S)
    idx_last = jnp.maximum(s_len - 1, 0)
    idx_prev = jnp.maximum(s_len - 2, 0)
    a_last = jnp.take_along_axis(final, idx_last[:, None], 1)[:, 0]
    a_prev = jnp.take_along_axis(final, idx_prev[:, None], 1)[:, 0]
    a_prev = jnp.where(s_len >= 2, a_prev, NEG_INF)
    return jnp.logaddexp(a_last, a_prev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _neg_ll_pallas(log_probs, labels, input_lengths, label_lengths, blank,
                   interpret):
    ll, _ = _neg_ll_pallas_fwd(
        log_probs, labels, input_lengths, label_lengths, blank, interpret
    )
    return ll


def _neg_ll_pallas_fwd(log_probs, labels, input_lengths, label_lengths,
                       blank, interpret):
    ext, emit, skip_in, skip_out = _prepare(log_probs, labels, blank)
    s = ext.shape[1]
    s_len = 2 * label_lengths + 1
    pos_mask = (jnp.arange(s)[None, :] < s_len[:, None]).astype(jnp.float32)
    alphas = ctc_alpha_pallas(emit, skip_in, pos_mask, input_lengths,
                              interpret)
    ll = _ll_from_alphas(alphas, input_lengths, s_len)
    return -ll, (log_probs, ext, emit, skip_out, pos_mask, alphas,
                 input_lengths, s_len, ll)


def _neg_ll_pallas_bwd(blank, interpret, res, g):
    (log_probs, ext, emit, skip_out, pos_mask, alphas, input_lengths, s_len,
     ll) = res
    t_max, b, c = log_probs.shape
    betas = ctc_beta_pallas(emit, skip_out, pos_mask, input_lengths, s_len,
                            interpret)
    gamma = alphas + betas - emit
    gamma = jnp.where(pos_mask[None] > 0, gamma, NEG_INF)
    one_hot = jax.nn.one_hot(ext, c, dtype=log_probs.dtype)
    gmax = jnp.maximum(jnp.max(gamma, axis=2, keepdims=True), NEG_INF / 2)
    dens = jnp.einsum("tbs,bsc->tbc", jnp.exp(gamma - gmax), one_hot)
    log_dens = jnp.where(dens > 0, jnp.log(jnp.maximum(dens, 1e-37)), NEG_INF)
    log_gamma_k = log_dens + gmax
    frame_valid = (
        jnp.arange(t_max)[:, None] < input_lengths[None, :]
    )[..., None]
    grad = jnp.where(
        frame_valid, -jnp.exp(log_gamma_k - ll[None, :, None]), 0.0
    )
    return (grad * g[None, :, None], None, None, None)


_neg_ll_pallas.defvjp(_neg_ll_pallas_fwd, _neg_ll_pallas_bwd)


def _pallas_fits_vmem(t_max: int, b: int, s: int,
                      budget: int = VMEM_BUDGET) -> bool:
    """Whether the alpha/beta kernels' VMEM residents fit the budget.

    Each kernel holds ``emit`` (T,B,S) in + the (T,B,S) DP table out, plus
    three small (B,S) operands, all fp32.  Shapes are static at trace time,
    so this is a plain Python decision.
    """
    bytes_needed = (2 * t_max * b * s + 3 * b * s) * 4
    return bytes_needed <= budget


def ctc_loss_pallas(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum_over_batch",
    zero_infinity: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for ``ops.ctc_loss`` backed by the Pallas DP kernels.

    Shapes whose DP tables would overflow the VMEM budget automatically
    take the lax.scan path (ops/ctc_loss.py) — same math, same VJP.
    """
    t_max, b, _ = log_probs.shape
    s = 2 * labels.shape[1] + 1
    if not _pallas_fits_vmem(t_max, b, s):
        from ctc_pytorch_tpu.ops.ctc_loss import ctc_loss as _ctc_scan
        return _ctc_scan(log_probs, labels, input_lengths, label_lengths,
                         blank=blank, reduction=reduction,
                         zero_infinity=zero_infinity)
    neg_ll = _neg_ll_pallas(
        log_probs, labels, input_lengths.astype(jnp.int32),
        label_lengths.astype(jnp.int32), blank, interpret,
    )
    if zero_infinity:
        # same contract as ops.ctc_loss: infeasible utterances (loss at the
        # ~-NEG_INF scale) are zeroed instead of dominating the batch
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
