"""Splice/skip semantics vs a direct transcription of tools.py:66-86."""

import numpy as np

from ctc_pytorch_tpu.frontend import make_context, pad_to_downsample, skip_frames
from ctc_pytorch_tpu.frontend.splice import downsampled_len, skipped_len, splice_and_skip


def _ref_make_context(feature, left, right):
    # independent numpy transcription of the reference semantics:
    # shifted stacks with edge replication, columns [left..centre..right]
    if left == 0 and right == 0:
        return feature
    feats = [feature]
    for _ in range(left):
        feats.append(np.vstack((feats[-1][0], feats[-1][:-1])))
    feats.reverse()
    for _ in range(right):
        feats.append(np.vstack((feats[-1][1:], feats[-1][-1])))
    return np.hstack(feats)


def test_make_context_matches_reference():
    rng = np.random.RandomState(0)
    feat = rng.randn(7, 3).astype(np.float32)
    for left, right in [(0, 2), (1, 1), (2, 0), (3, 2)]:
        ours = np.asarray(make_context(feat, left, right))
        ref = _ref_make_context(feat, left, right)
        np.testing.assert_allclose(ours, ref, err_msg=f"l={left} r={right}")


def test_make_context_batched():
    rng = np.random.RandomState(1)
    batch = rng.randn(4, 9, 5).astype(np.float32)
    ours = np.asarray(make_context(batch, 1, 2))
    for b in range(4):
        np.testing.assert_allclose(ours[b], _ref_make_context(batch[b], 1, 2))


def test_skip_frames():
    feat = np.arange(22).reshape(11, 2).astype(np.float32)
    out = np.asarray(skip_frames(feat, 2))
    np.testing.assert_array_equal(out[:, 0], [0, 4, 8, 12, 16, 20])
    assert out.shape[0] == skipped_len(11, 2) == 6


def test_pad_to_downsample():
    feat = np.ones((7, 3), np.float32)
    out = np.asarray(pad_to_downsample(feat, 4))
    assert out.shape == (8, 3)
    assert (out[7] == 0).all()
    assert downsampled_len(7, 4) == 8


def test_full_pipeline_matches_reference_composition():
    rng = np.random.RandomState(2)
    feat = rng.randn(33, 4).astype(np.float32)
    # reference: skip_feat(make_context(feat, 0, 2), 2) then pad to %2
    ref = _ref_make_context(feat, 0, 2)[::2]
    if ref.shape[0] % 2:
        ref = np.vstack([ref, np.zeros((1, ref.shape[1]))])
    ours, new_len = splice_and_skip(feat[None], np.array([33]), 0, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(ours)[0], ref, rtol=1e-6)
    # valid length includes the pad-to-downsample round-up, the same
    # contract as SpeechDataset (skipped_len 17 -> downsampled_len 18)
    assert int(new_len[0]) == 18
