"""Native C++ kernels vs their python references."""

import numpy as np
import pytest

from ctc_pytorch_tpu import native
from ctc_pytorch_tpu.decode.beam import ctc_beam_search
from ctc_pytorch_tpu.decode.ngram_lm import LanguageModel, train_bigram_lm
from ctc_pytorch_tpu.ops.editdistance import (
    _padded_edit_distance_numpy,
    edit_distance,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable / native build failed"
)


def test_native_edit_distance_matches_python():
    rng = np.random.RandomState(0)
    b, rl, hl = 16, 12, 14
    refs = rng.randint(0, 5, size=(b, rl)).astype(np.int32)
    hyps = rng.randint(0, 5, size=(b, hl)).astype(np.int32)
    ref_lens = rng.randint(0, rl + 1, size=b).astype(np.int32)
    hyp_lens = rng.randint(0, hl + 1, size=b).astype(np.int32)
    got = native.batch_edit_distance_native(refs, ref_lens, hyps, hyp_lens)
    ref_np = _padded_edit_distance_numpy(refs, ref_lens, hyps, hyp_lens)
    np.testing.assert_array_equal(got, ref_np)
    for i in range(b):
        assert got[i] == edit_distance(
            refs[i, : ref_lens[i]], hyps[i, : hyp_lens[i]]
        )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_beam_matches_python(seed):
    rng = np.random.RandomState(seed)
    t, c = 12, 5
    probs = rng.dirichlet(np.ones(c), size=t).astype(np.float32)
    y_py, s_py = ctc_beam_search(probs, beam_width=8)
    y_c, s_c = native.ctc_beam_search_native(probs, beam_width=8)
    assert y_c == y_py
    np.testing.assert_allclose(s_c, s_py, rtol=1e-5)


def test_native_beam_with_lm(tmp_path):
    train_bigram_lm(["aa bb aa", "bb aa", "aa bb"], tmp_path / "lm.arpa")
    lm = LanguageModel(tmp_path / "lm.arpa")
    table = lm.dense_table({0: "blank", 1: "aa", 2: "bb"}, 3)
    rng = np.random.RandomState(7)
    for trial in range(5):
        probs = rng.dirichlet(np.ones(3), size=10).astype(np.float32)
        y_py, s_py = ctc_beam_search(probs, 6, table, 0.2, 0, 8)
        y_c, s_c = native.ctc_beam_search_native(probs, 6, table, 0.2, 0, 8)
        assert y_c == y_py, trial
        np.testing.assert_allclose(s_c, s_py, rtol=1e-5)


def test_native_beam_blank_skip_and_863_fixture():
    mat = np.array([[0.4, 0.0, 0.6], [0.4, 0.0, 0.6]], np.float32)
    y, _ = native.ctc_beam_search_native(mat, 10, blank=2)
    assert y == (0,)
    probs = np.array([[0.95, 0.05], [0.2, 0.8]], np.float32)
    y1, _ = native.ctc_beam_search_native(probs, 10)
    y2, _ = native.ctc_beam_search_native(probs[1:], 10)
    assert y1 == y2
