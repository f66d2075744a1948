"""Global CMVN: corpus-level mean/variance normalisation.

TPU-native replacement for Kaldi ``compute-cmvn-stats`` + ``apply-cmvn
--norm-vars=true`` (``timit/steps/make_feat.sh:28-30,36``): stats are computed
once on the training split and applied to every split.

Stats accumulate as ``(count, sum, sumsq)`` so they compose across batches and
across data-parallel shards — ``accumulate_cmvn`` can run under ``shard_map``
with a ``psum`` over the data axis, giving an exact global reduction over ICI.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CmvnStats(NamedTuple):
    count: jnp.ndarray  # scalar, number of frames
    sum: jnp.ndarray  # (F,)
    sumsq: jnp.ndarray  # (F,)


def init_cmvn(dim: int) -> CmvnStats:
    z = jnp.zeros((dim,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    return CmvnStats(jnp.zeros((), z.dtype), z, z)


def accumulate_cmvn(
    stats: CmvnStats,
    feats: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> CmvnStats:
    """Add a (B, T, F) padded batch (mask (B, T) marks valid frames).

    When ``axis_name`` is given the per-shard partial sums are ``psum``-ed so
    every shard holds the global stats.
    """
    x = feats.astype(stats.sum.dtype)
    if frame_mask is not None:
        m = frame_mask.astype(x.dtype)[..., None]
        x = x * m
        count = jnp.sum(frame_mask.astype(stats.count.dtype))
        sq = jnp.sum((feats.astype(x.dtype) ** 2) * m, axis=(0, 1))
    else:
        count = jnp.asarray(x.shape[0] * x.shape[1], stats.count.dtype)
        sq = jnp.sum(x * x, axis=(0, 1))
    s = jnp.sum(x, axis=(0, 1))
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
    return CmvnStats(stats.count + count, stats.sum + s, stats.sumsq + sq)


def finalize_cmvn(stats: CmvnStats, eps: float = 1e-10):
    """Return (mean, inv_std) from accumulated stats (norm_vars=True)."""
    count = jnp.maximum(stats.count, 1.0)
    mean = stats.sum / count
    var = jnp.maximum(stats.sumsq / count - mean * mean, eps)
    return mean.astype(jnp.float32), jax.lax.rsqrt(var).astype(jnp.float32)


def apply_cmvn(
    feats: jnp.ndarray, mean: jnp.ndarray, inv_std: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """(…, F) -> normalised; ``inv_std=None`` reproduces ``--norm-vars=false``."""
    out = feats - mean
    if inv_std is not None:
        out = out * inv_std
    return out


def compute_global_cmvn(feats_iter, dim: int):
    """Host-side one-pass reduction over an iterable of (feats, mask) batches."""
    stats = init_cmvn(dim)
    for item in feats_iter:
        if isinstance(item, tuple):
            feats, mask = item
        else:
            feats, mask = item, None
        if feats.ndim == 2:
            feats = feats[None]
            mask = None if mask is None else mask[None]
        stats = accumulate_cmvn(stats, jnp.asarray(feats), mask)
    return finalize_cmvn(stats)
