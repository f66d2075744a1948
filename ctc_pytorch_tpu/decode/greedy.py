"""Greedy (best-path) CTC decoding — batched, on-device.

Replaces ``GreedyDecoder`` (``timit/utils/ctcDecoder.py:152-166``): per-frame
argmax, collapse repeats, drop blanks.  The argmax+collapse runs fully
vectorised under jit on (B, T) index arrays; only the final string conversion
touches the host.  Collapse rule proved equal to the reference's
(`_process_string(remove_rep=True)` skips a token equal to the **raw**
previous frame, so repeats separated by blank survive).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def greedy_indices(log_probs: jnp.ndarray) -> jnp.ndarray:
    """(T, B, C) -> (B, T) argmax indices."""
    return jnp.argmax(log_probs, axis=-1).T


@jax.jit
def greedy_collapse(indices: jnp.ndarray, lengths: jnp.ndarray,
                    blank: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse repeats + remove blanks, batched with static shapes.

    (B, T) indices -> (B, T) left-packed tokens (padded with ``blank``) and
    (B,) output lengths.  keep[t] = idx[t] != blank and idx[t] != idx[t-1]
    and t < length — identical to ``compute_wer``'s loop
    (``model_ctc.py:187-202``) and ``_process_string(remove_rep=True)``.
    """
    b, t = indices.shape
    prev = jnp.pad(indices, ((0, 0), (1, 0)), constant_values=-1)[:, :t]
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    keep = (indices != blank) & (indices != prev) & valid
    # left-pack kept tokens: destination position = cumsum of keep - 1
    dest = jnp.cumsum(keep, axis=1) - 1
    out_len = jnp.sum(keep, axis=1)
    dest = jnp.where(keep, dest, t - 1)  # dump discarded tokens at the end
    out = jnp.full((b, t), blank, indices.dtype)
    # scatter per row via one-hot trick: out[b, dest[b,t]] = idx[b,t] for kept
    out = out.at[jnp.arange(b)[:, None], dest].set(
        jnp.where(keep, indices, blank)
    )
    # positions >= out_len may have been overwritten by the dumped tokens
    pos = jnp.arange(t)[None, :]
    out = jnp.where(pos < out_len[:, None], out, blank)
    return out, out_len


class GreedyDecoder:
    """API-compatible greedy decoder producing reference-format strings."""

    def __init__(self, int2char, space_idx: int = -1, blank_index: int = 0):
        from ctc_pytorch_tpu.decode.metrics import Scorer

        self.scorer = Scorer(int2char, space_idx, blank_index)
        self.blank_index = blank_index

    def decode(self, log_probs, frame_seq_len) -> List[str]:
        """(T, B, C) log-probs + (B,) lengths -> list of decoded strings."""
        idx = greedy_indices(jnp.asarray(log_probs))
        tokens, lens = greedy_collapse(
            idx, jnp.asarray(frame_seq_len), self.blank_index
        )
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        return [
            self.scorer.to_string(tokens[i], int(lens[i]))
            for i in range(tokens.shape[0])
        ]

    def batch_errors(
        self, log_probs, frame_seq_len, targets, target_sizes
    ) -> Tuple[int, int]:
        """Training-loop token error count (``compute_wer`` semantics)."""
        idx = greedy_indices(jnp.asarray(log_probs))
        tokens, lens = greedy_collapse(
            idx, jnp.asarray(frame_seq_len), self.blank_index
        )
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        targets = np.asarray(targets)
        tsizes = np.asarray(target_sizes, np.int64)
        from ctc_pytorch_tpu.ops.editdistance import padded_edit_distance

        if tokens.shape[1] == 0:  # zero-capacity hyps: all deletions
            dists = tsizes
        else:
            dists = padded_edit_distance(targets, tsizes, tokens, lens)
        return int(np.sum(dists)), int(np.sum(tsizes))
