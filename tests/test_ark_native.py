"""Native ark loader (ark_native.cpp) vs the python read+splice+skip+pad."""

import os

import numpy as np
import pytest

from ctc_pytorch_tpu import native
from ctc_pytorch_tpu.data.dataset import _splice_numpy
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter


def _python_ref(mat, left, right, skip, ds):
    ref = _splice_numpy(mat, left, right)[::skip]
    rem = ref.shape[0] % ds
    if rem:
        ref = np.vstack([ref, np.zeros((ds - rem, ref.shape[1]), np.float32)])
    return ref


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_matches_python_reference(tmp_path):
    rng = np.random.RandomState(0)
    ark, scp = str(tmp_path / "x.ark"), str(tmp_path / "x.scp")
    mats = {}
    with ArkWriter(ark, scp) as w:
        for i in range(5):
            m = rng.randn(7 + 13 * i, 9).astype(np.float32)
            mats[f"u{i}"] = m
            w.write(f"u{i}", m)
    entries = [line.split() for line in open(scp)]
    for utt, rx in entries:
        for (l, r, sk, ds) in [(0, 0, 1, 1), (1, 2, 2, 2), (3, 3, 1, 4),
                               (0, 2, 3, 1)]:
            got = native.ark_load_processed_native(rx, l, r, sk, ds)
            assert got is not None
            np.testing.assert_array_equal(got, _python_ref(mats[utt], l, r,
                                                           sk, ds))


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_rejects_non_bfm(tmp_path):
    p = tmp_path / "bad.ark"
    p.write_bytes(b"not an ark at all")
    assert native.ark_load_processed_native(f"{p}:0", 0, 0, 1, 1) is None


def test_dataset_preload_consistency(tmp_path):
    """preload() fills the same cache entries __getitem__ would."""
    from ctc_pytorch_tpu.config import Config
    from ctc_pytorch_tpu.data.dataset import SpeechDataset
    from ctc_pytorch_tpu.vocab import Vocab

    rng = np.random.RandomState(1)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(6):
            w.write(f"u{i}", rng.randn(10 + i, 5).astype(np.float32))
    units = tmp_path / "units"
    units.write_text("a\nb\n")
    lab = tmp_path / "lab"
    lab.write_text("".join(f"u{i} a b a\n" for i in range(6)))
    cfg = Config()
    cfg.left_ctx, cfg.right_ctx = 1, 1
    cfg.n_skip_frame, cfg.n_downsample = 2, 2
    vocab = Vocab(str(units))
    ds1 = SpeechDataset(vocab, scp, lab, cfg)
    ds1.preload(workers=3)
    ds2 = SpeechDataset(vocab, scp, lab, cfg)
    for i in range(6):
        f1, l1, u1 = ds1[i]
        f2, l2, u2 = ds2[i]
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
        assert u1 == u2
