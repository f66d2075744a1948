"""On-device batched beam search vs the python dict-algorithm decoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from ctc_pytorch_tpu.decode.beam import ctc_beam_search
from ctc_pytorch_tpu.decode.beam_device import batched_beam_search
from ctc_pytorch_tpu.decode.ngram_lm import LanguageModel, train_bigram_lm


def _random_batch(seed, b=4, t=12, c=5):
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.ones(c), size=(b, t)).astype(np.float32)
    lengths = rng.randint(t // 2, t + 1, size=b).astype(np.int32)
    return probs, lengths


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_device_beam_matches_python_no_lm(seed):
    probs, lengths = _random_batch(seed)
    seqs, lens, scores = batched_beam_search(
        jnp.asarray(probs), jnp.asarray(lengths), beam_width=8, max_len=16
    )
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    for i in range(probs.shape[0]):
        y_ref, s_ref = ctc_beam_search(
            probs[i], beam_width=8, length=int(lengths[i])
        )
        got = tuple(seqs[i][: lens[i]])
        assert got == tuple(y_ref), (i, got, y_ref)
        np.testing.assert_allclose(scores[i], s_ref, rtol=1e-4)


def test_device_beam_with_lm(tmp_path):
    train_bigram_lm(["aa bb aa bb", "bb aa", "aa aa bb"], tmp_path / "lm.arpa")
    lm = LanguageModel(tmp_path / "lm.arpa")
    int2char = {0: "blank", 1: "aa", 2: "bb"}
    table = lm.dense_table(int2char, 3).astype(np.float32)
    for seed in range(4):
        probs, lengths = _random_batch(seed + 10, b=3, t=10, c=3)
        seqs, lens, scores = batched_beam_search(
            jnp.asarray(probs), jnp.asarray(lengths), beam_width=6,
            max_len=12, lm_table=jnp.asarray(table), lm_alpha=0.2,
        )
        seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
        for i in range(probs.shape[0]):
            y_ref, s_ref = ctc_beam_search(
                probs[i], 6, table, 0.2, 0, int(lengths[i])
            )
            got = tuple(seqs[i][: lens[i]])
            assert got == tuple(y_ref), (seed, i, got, y_ref)
            np.testing.assert_allclose(scores[i], s_ref, rtol=1e-4)


def test_device_beam_blank_skip_and_fixture():
    # 863 fixture: blank is the LAST class there; ours expects blank arg
    mat = np.array([[[0.4, 0.0, 0.6], [0.4, 0.0, 0.6]]], np.float32)
    seqs, lens, _ = batched_beam_search(
        jnp.asarray(mat), jnp.asarray([2]), beam_width=10, max_len=4, blank=2
    )
    assert tuple(np.asarray(seqs)[0][: int(lens[0])]) == (0,)
    # blank-skip: frame with p(blank) > 0.9 must not change the result
    probs = np.array([[[0.95, 0.05], [0.2, 0.8]]], np.float32)
    s1, l1, _ = batched_beam_search(jnp.asarray(probs), jnp.asarray([2]),
                                    beam_width=4, max_len=4)
    s2, l2, _ = batched_beam_search(jnp.asarray(probs[:, 1:]),
                                    jnp.asarray([1]), beam_width=4, max_len=4)
    assert tuple(np.asarray(s1)[0][: int(l1[0])]) == tuple(
        np.asarray(s2)[0][: int(l2[0])]
    )
