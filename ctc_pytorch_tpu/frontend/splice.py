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


def make_context(
    feats: jnp.ndarray, left: int, right: int,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(..., T, F) -> (..., T, F*(left+1+right)) with edge replication.

    ``lengths`` (leading-axes shaped, optional): per-utterance valid frame
    counts for a batched padded input.  Without it the right-edge
    replication uses the PADDED edge, so the last ``right`` valid frames of
    a shorter-than-padding utterance would see padding/garbage frames as
    context instead of the reference's replicated last valid frame
    (``tools.py:66-75``) — pass lengths whenever T is padded."""
    if left == 0 and right == 0:
        return feats
    if lengths is not None:
        t = feats.shape[-2]
        pos = jnp.arange(t)
        last = (lengths.astype(jnp.int32) - 1).reshape(
            lengths.shape + (1,)
        )  # (..., 1)
        cols = []
        for shift in range(-left, right + 1):
            idx = jnp.clip(pos + shift, 0, jnp.maximum(last, 0))  # (..., T)
            cols.append(jnp.take_along_axis(feats, idx[..., None], axis=-2))
        return jnp.concatenate(cols, axis=-1)
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

    With ``lengths`` the context splice replicates each utterance's OWN edge
    (not the padded edge) and the returned valid lengths include the
    pad-to-downsample round-up, matching ``SpeechDataset``'s host-side
    contract exactly (``skipped_len`` then ``downsampled_len``).
    """
    out = make_context(feats, left_ctx, right_ctx, lengths=lengths)
    out = skip_frames(out, n_skip_frame)
    out = pad_to_downsample(out, n_downsample)
    if lengths is None:
        return out, None
    new_len = lengths
    if n_skip_frame > 1:
        new_len = -(-new_len // n_skip_frame)
    if n_downsample > 1:
        # the reference zero-pads each item's rows to a multiple of
        # n_downsample and the PADDED count is the item's length
        # (data_loader.py:106-110)
        new_len = new_len + (-new_len) % n_downsample
    new_len = jnp.minimum(new_len, out.shape[-2])
    return out, new_len
