"""Levenshtein edit distance, vectorised over the batch.

Replaces the ``editdistance`` C++ extension used in the training loop
(``timit/models/model_ctc.py:7,200``) and matches the pure-python DP in
``timit/utils/ctcDecoder.py:131-149`` (unit costs for ins/del/sub).

The batched variant runs the DP with numpy across the whole batch at once
(anti-diagonal-free row sweep, vectorised over B); plenty fast for per-step
training WER at TIMIT scale, with no native dependency.  A jnp version is
exposed for fully on-device metric computation.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Classic O(|ref|*|hyp|) DP, identical costs to ctcDecoder.py:131-149."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1)
    cur = np.empty(m + 1, dtype=np.int64)
    ref = list(ref)
    hyp_arr = np.asarray(list(hyp))
    for i in range(1, n + 1):
        cur[0] = i
        sub = prev[:-1] + (hyp_arr != ref[i - 1])
        # insertion needs a left-to-right scan; do it with a running min
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        for j in range(1, m + 1):  # resolve the sequential insertion term
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return int(prev[m])


def batch_edit_distance(
    refs: List[np.ndarray], hyps: List[np.ndarray]
) -> np.ndarray:
    """Edit distance for each (ref, hyp) pair."""
    return np.array([edit_distance(r, h) for r, h in zip(refs, hyps)])


def padded_edit_distance(
    refs: np.ndarray, ref_lens: np.ndarray, hyps: np.ndarray, hyp_lens: np.ndarray
) -> np.ndarray:
    """Batched edit distance over padded (B, L) arrays.

    Dispatches to the C++ kernel (native/ctc_native.cpp) when it builds,
    else the vectorised numpy DP below."""
    from ctc_pytorch_tpu import native

    if native.available():
        return native.batch_edit_distance_native(refs, ref_lens, hyps, hyp_lens)
    return _padded_edit_distance_numpy(refs, ref_lens, hyps, hyp_lens)


def _padded_edit_distance_numpy(
    refs: np.ndarray, ref_lens: np.ndarray, hyps: np.ndarray, hyp_lens: np.ndarray
) -> np.ndarray:
    """Batched DP over padded (B, L) arrays, vectorised across B.

    DP over the hyp axis row-by-row; the per-row insertion recurrence is a
    prefix-min, computed with a log-steps doubling trick so the whole batch
    advances together.
    """
    b, n_max = refs.shape
    m_max = hyps.shape[1]
    prev = np.broadcast_to(np.arange(m_max + 1, dtype=np.int64), (b, m_max + 1)).copy()
    # positions beyond hyp_lens are clamped later; run full DP then gather
    for i in range(1, n_max + 1):
        active = i <= ref_lens  # (B,)
        ref_tok = refs[:, i - 1][:, None]  # (B, 1)
        sub = prev[:, :-1] + (hyps != ref_tok)
        dele = prev[:, 1:] + 1
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(sub, dele)
        # prefix-min for insertions: cur[j] = min(cur[j], cur[k] + (j-k))
        base = cur - np.arange(m_max + 1)[None, :]
        np.minimum.accumulate(base, axis=1, out=base)
        cur = np.minimum(cur, base + np.arange(m_max + 1)[None, :])
        prev = np.where(active[:, None], cur, prev)
    return prev[np.arange(b), np.minimum(hyp_lens, m_max)]


def padded_edit_distance_device(refs, ref_lens, hyps, hyp_lens):
    """Fully on-device batched edit distance (jittable jnp twin of
    ``_padded_edit_distance_numpy``).

    Lets the per-step training WER accumulate on device: the host loop
    fetches one scalar pair per epoch/print instead of (tokens, lengths)
    planes every step — on tunnelled/high-latency rigs those per-step
    fetches dominated the WER-on epoch rate.
    """
    import jax
    import jax.numpy as jnp

    b, n_max = refs.shape
    m_max = hyps.shape[1]
    refs = refs.astype(jnp.int32)
    hyps = hyps.astype(jnp.int32)
    ar = jnp.arange(m_max + 1, dtype=jnp.int32)
    init = jnp.broadcast_to(ar, (b, m_max + 1)).astype(jnp.int32)

    def body(prev, x):
        ref_tok, i = x
        sub = prev[:, :-1] + (hyps != ref_tok[:, None]).astype(jnp.int32)
        dele = prev[:, 1:] + 1
        cur = jnp.concatenate(
            [jnp.full((b, 1), i, jnp.int32), jnp.minimum(sub, dele)], axis=1
        )
        # prefix-min for insertions: cur[j] = min_k (cur[k] + (j - k))
        base = jax.lax.cummin(cur - ar, axis=1)
        cur = jnp.minimum(cur, base + ar)
        active = (i <= ref_lens)[:, None]
        return jnp.where(active, cur, prev), None

    prev, _ = jax.lax.scan(
        body, init,
        (refs.T, jnp.arange(1, n_max + 1, dtype=jnp.int32)),
    )
    return prev[jnp.arange(b), jnp.minimum(hyp_lens, m_max)]
