"""Context splicing, frame skipping, downsample padding — batched and jittable.

Reproduces the per-utterance numpy transforms of the reference data pipeline
(``timit/utils/tools.py:66-86`` and ``timit/utils/data_loader.py:104-110``)
as shape-static batched ops so they can run on device, fused behind the
frontend, or on host over numpy arrays (jnp works on both).

Semantics proved against the reference:
  * ``make_context(feat, l, r)``: columns ordered [left_l … left_1, centre,
    right_1 … right_r] with **edge replication** at utterance boundaries.
  * ``skip_feat(feat, skip)``: keep frames where ``i % skip == 0``.
  * downsample padding: zero-pad rows until ``T % n_downsample == 0``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def make_context(feats: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """(..., T, F) -> (..., T, F*(left+1+right)) with edge replication."""
    if left == 0 and right == 0:
        return feats
    cols = []
    for shift in range(-left, right + 1):
        if shift < 0:
            first = jnp.repeat(feats[..., :1, :], -shift, axis=-2)
            cols.append(jnp.concatenate([first, feats[..., :shift, :]], axis=-2))
        elif shift > 0:
            last = jnp.repeat(feats[..., -1:, :], shift, axis=-2)
            cols.append(jnp.concatenate([feats[..., shift:, :], last], axis=-2))
        else:
            cols.append(feats)
    return jnp.concatenate(cols, axis=-1)


def skip_frames(feats: jnp.ndarray, skip: int) -> jnp.ndarray:
    """(..., T, F) -> (..., ceil(T/skip), F), keeping frames i % skip == 0."""
    if skip in (0, 1):
        return feats
    return feats[..., ::skip, :]


def skipped_len(t: int, skip: int) -> int:
    if skip in (0, 1):
        return t
    return -(-t // skip)  # ceil


def pad_to_downsample(feats: jnp.ndarray, n_downsample: int) -> jnp.ndarray:
    """Zero-pad the time axis so ``T % n_downsample == 0`` (host/static only)."""
    if n_downsample <= 1:
        return feats
    t = feats.shape[-2]
    rem = t % n_downsample
    if rem == 0:
        return feats
    pad = [(0, 0)] * feats.ndim
    pad[-2] = (0, n_downsample - rem)
    return jnp.pad(feats, pad)


def downsampled_len(t: int, n_downsample: int) -> int:
    if n_downsample <= 1:
        return t
    return t + (-t) % n_downsample


def splice_and_skip(
    feats: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    left_ctx: int,
    right_ctx: int,
    n_skip_frame: int,
    n_downsample: int,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full per-utterance transform of ``SpeechDataset.__getitem__``
    (``timit/utils/data_loader.py:104-110``), batched.

    For a batched padded input the edge replication uses the padded edge; with
    zero padding this matches the reference's per-utterance behaviour for all
    frames the CTC length bookkeeping considers valid.  Returns the new valid
    lengths alongside.
    """
    out = make_context(feats, left_ctx, right_ctx)
    out = skip_frames(out, n_skip_frame)
    out = pad_to_downsample(out, n_downsample)
    if lengths is None:
        return out, None
    new_len = lengths
    if n_skip_frame > 1:
        new_len = -(-new_len // n_skip_frame)
    return out, new_len
