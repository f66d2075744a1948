"""Decoder tests: greedy collapse, beam search vs brute force, metrics, LM."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from ctc_pytorch_tpu.decode import (
    BeamDecoder,
    GreedyDecoder,
    LanguageModel,
    Scorer,
    ctc_beam_search,
    train_bigram_lm,
)
from ctc_pytorch_tpu.decode.greedy import greedy_collapse, greedy_indices
from ctc_pytorch_tpu.ops import ctc_forward_score


def _naive_collapse(seq, blank=0):
    # direct transcription of compute_wer's pred loop (model_ctc.py:190-198)
    pred = []
    for j in range(len(seq)):
        if seq[j] == blank:
            continue
        if j == 0:
            pred.append(seq[j])
        if j > 0 and seq[j] != seq[j - 1]:
            pred.append(seq[j])
    return pred


def test_greedy_collapse_matches_reference_loop():
    rng = np.random.RandomState(0)
    for trial in range(20):
        t = rng.randint(3, 15)
        seq = rng.randint(0, 4, size=t)
        length = rng.randint(1, t + 1)
        tokens, lens = greedy_collapse(
            jnp.asarray(seq[None]), jnp.asarray([length])
        )
        expect = _naive_collapse(list(seq[:length]))
        got = list(np.asarray(tokens)[0][: int(lens[0])])
        assert got == expect, (seq[:length], got, expect)


def test_greedy_decoder_strings():
    # frames: classes argmax = [1, 1, 0, 2, 2], collapse -> [1, 2]
    lp = np.full((5, 1, 3), -5.0, np.float32)
    for t, k in enumerate([1, 1, 0, 2, 2]):
        lp[t, 0, k] = -0.01
    int2char = {0: "blank", 1: "aa", 2: "bb"}
    dec = GreedyDecoder(int2char)
    out = dec.decode(lp, [5])
    assert out == [" aa bb"]  # space_idx=-1 prepends separators (reference)


def test_greedy_batch_errors():
    lp = np.full((4, 1, 3), -5.0, np.float32)
    for t, k in enumerate([1, 0, 2, 2]):
        lp[t, 0, k] = -0.01
    dec = GreedyDecoder({0: "blank", 1: "a", 2: "b"})
    errs, total = dec.batch_errors(lp, [4], np.array([[1, 2]]), [2])
    assert (errs, total) == (0, 2)
    errs, total = dec.batch_errors(lp, [4], np.array([[1, 1]]), [2])
    assert (errs, total) == (1, 2)


def test_beam_search_863_fixture():
    # my_863_corpus/steps/BeamSearch.py:130-140: expected 'a'
    mat = np.array([[0.4, 0.0, 0.6], [0.4, 0.0, 0.6]], np.float64)
    y, _ = ctc_beam_search(mat, beam_width=10, blank_index=2)
    assert y == (0,)  # class "a"


def _brute_force_best(probs, blank=0):
    """argmax over all labellings of CTC score / length (length-normalised)."""
    t, c = probs.shape
    lp = np.log(probs)[:, None, :].astype(np.float32)
    best, best_score = (), -np.inf
    for l in range(0, t + 1):
        for labels in itertools.product([k for k in range(c) if k != blank], repeat=l):
            arr = np.zeros((1, max(l, 1)), np.int32)
            arr[0, :l] = labels
            score = float(
                ctc_forward_score(
                    jnp.asarray(lp), jnp.asarray(arr),
                    jnp.asarray([t]), jnp.asarray([l]),
                )[0]
            )
            score = score / (l if l else 1)
            if score > best_score:
                best, best_score = labels, score
    return best, best_score


@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow),
                                  pytest.param(2, marks=pytest.mark.slow)])
def test_beam_search_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    t, c = 4, 3
    probs = rng.dirichlet(np.ones(c) * 2, size=t)
    # keep blank prob below the skip threshold so no frames are dropped
    probs[:, 0] = np.minimum(probs[:, 0], 0.8)
    probs /= probs.sum(axis=1, keepdims=True)
    y, score = ctc_beam_search(probs, beam_width=200)
    expect, expect_score = _brute_force_best(probs)
    assert tuple(y) == tuple(expect)
    np.testing.assert_allclose(score, expect_score, rtol=1e-4)


def test_native_beam_matches_python_fuzz():
    """C++ search vs the dict-keyed python parity search on random inputs.

    Regression: the native search kept per-frame extension indices only, so
    a prefix pruned at time t and RE-CREATED later got a fresh node and its
    probability mass split instead of merging (diverged on ~0.5% of random
    cases under tight beams).  Node ids are now canonical per label tuple."""
    from ctc_pytorch_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    n_lm = 0
    for case in range(200):
        t = rng.randint(5, 14)
        c = rng.randint(3, 6)
        beam = rng.randint(2, 7)
        probs = rng.dirichlet(np.ones(c) * 0.7, size=t).astype(np.float32)
        if case % 3 == 0:  # every third case with a random bigram LM
            lm = np.log(
                rng.dirichlet(np.ones(c + 1), size=c + 1).astype(np.float32)
            )
            alpha = 0.3
            n_lm += 1
        else:
            lm, alpha = None, 0.0
        y_py, s_py = ctc_beam_search(
            probs, beam_width=beam, lm_table=lm, lm_alpha=alpha,
        )
        y_nat, s_nat = native.ctc_beam_search_native(
            probs, beam, lm, alpha, 0, t
        )
        assert tuple(y_nat) == tuple(y_py), (case, y_nat, y_py)
        np.testing.assert_allclose(s_nat, s_py, rtol=1e-6, atol=1e-9,
                                   err_msg=str(case))
    assert n_lm > 50


def test_beam_blank_skip():
    # a frame with blank prob > 0.9 is skipped entirely (BeamSearch.py:93-94)
    probs = np.array([[0.95, 0.05], [0.2, 0.8]])
    y1, _ = ctc_beam_search(probs, beam_width=10)
    y2, _ = ctc_beam_search(probs[1:], beam_width=10)
    assert y1 == y2


def test_scorer_reference_metrics():
    s = Scorer({0: "blank", 1: "aa", 2: "bb"}, space_idx=-1)
    hyp = s.to_string([1, 2], 2)
    assert hyp == " aa bb"
    # wer over spaces; cer over characters including spaces
    cer, wer = s.score_batch([hyp], [[1, 1]], [2])
    assert wer == 1
    assert s.num_word == 2
    assert s.num_char == len(" aa aa")


ARPA = """
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\t</s>\t0.0
-0.4\t<s>\t-0.3
-0.6\taa\t-0.2
-0.7\tbb\t-0.1

\\2-grams:
-0.1\t<s> aa
-0.2\taa bb
-0.3\tbb </s>

\\end\\
"""


def test_arpa_reader_semantics(tmp_path):
    import math

    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    lm = LanguageModel(p)
    ln10 = math.log(10)
    # direct bigram
    np.testing.assert_allclose(lm.get_bi_prob("aa", "bb"), -0.2 * ln10, rtol=1e-6)
    # backoff: bo(bb) + p(aa)
    np.testing.assert_allclose(
        lm.get_bi_prob("bb", "aa"), (-0.1 + -0.6) * ln10, rtol=1e-6
    )
    # empty-history maps to <s>, empty-successor to </s> (NgramLM.py:70-73)
    np.testing.assert_allclose(lm.get_bi_prob("", "aa"), -0.1 * ln10, rtol=1e-6)
    np.testing.assert_allclose(lm.get_bi_prob("bb", ""), -0.3 * ln10, rtol=1e-6)
    # full sentence score
    np.testing.assert_allclose(
        lm.score_bg("aa bb"), (-0.1 - 0.2 - 0.3) * ln10, rtol=1e-6
    )
    # dense table agrees with get_bi_prob
    int2char = {0: "blank", 1: "UNK", 2: "aa", 3: "bb"}
    table = lm.dense_table(int2char, 4)
    np.testing.assert_allclose(table[2, 3], lm.get_bi_prob("aa", "bb"), rtol=1e-6)
    np.testing.assert_allclose(table[4, 2], lm.get_bi_prob("", "aa"), rtol=1e-6)
    np.testing.assert_allclose(table[3, 4], lm.get_bi_prob("bb", ""), rtol=1e-6)


def test_train_bigram_lm_roundtrip(tmp_path):
    sents = ["aa bb aa", "aa bb", "bb aa", "aa aa bb"]
    out = tmp_path / "bg.arpa"
    train_bigram_lm(sents, out)
    lm = LanguageModel(out)
    # seen bigram more probable than unseen
    assert lm.get_bi_prob("aa", "bb") > lm.get_bi_prob("bb", "bb")
    # conditional distributions approximately normalised:
    # sum_b p(b|a) over {aa, bb, </s>} close to 1
    import math

    total = sum(
        math.exp(lm.get_bi_prob("aa", w)) for w in ["aa", "bb", "</s>"]
    )
    assert 0.9 < total < 1.1
    # a trained LM drives beam search without error
    probs = np.array([[0.3, 0.3, 0.4], [0.2, 0.5, 0.3]])
    table = lm.dense_table({0: "blank", 1: "aa", 2: "bb"}, 3)
    y, _ = ctc_beam_search(probs, 5, table, lm_alpha=0.1)
    assert isinstance(y, tuple)


def test_beam_decoder_wrapper(tmp_path):
    train_bigram_lm(["aa bb", "bb aa"], tmp_path / "lm.arpa")
    lp = np.log(np.array(
        [[[0.1, 0.8, 0.1]], [[0.2, 0.2, 0.6]]], np.float64
    ))
    dec = BeamDecoder(
        {0: "blank", 1: "aa", 2: "bb"}, beam_width=5,
        lm_path=str(tmp_path / "lm.arpa"), lm_alpha=0.01,
    )
    out = dec.decode(lp, [2, 2][:1])
    assert out == ["aa bb"]
