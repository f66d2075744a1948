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


def _peaked_batch(seed, b, t, c, alpha):
    """Low-entropy frames produce heavy prefix merging in the search."""
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.full(c, alpha), size=(b, t)).astype(np.float32)
    lengths = rng.randint(max(t // 2, 1), t + 1, size=b).astype(np.int32)
    return probs, lengths


@pytest.mark.parametrize(
    "seed,b,t,c,width,alpha",
    [
        # merge-heavy: tiny alphabet, peaked frames, many repeats
        (0, 3, 60, 4, 16, 0.3),
        (1, 3, 60, 4, 16, 0.3),
        (2, 2, 80, 6, 24, 0.5),
        (3, 2, 120, 8, 12, 0.2),
        # wide-alphabet case
        (4, 2, 50, 40, 8, 0.4),
    ],
)
def test_device_beam_property_randomised(seed, b, t, c, width, alpha):
    probs, lengths = _peaked_batch(seed, b, t, c, alpha)
    seqs, lens, scores = batched_beam_search(
        jnp.asarray(probs), jnp.asarray(lengths), beam_width=width,
        max_len=t + 2,
    )
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    for i in range(b):
        y_ref, s_ref = ctc_beam_search(
            probs[i], beam_width=width, length=int(lengths[i])
        )
        got = tuple(seqs[i][: lens[i]])
        assert got == tuple(y_ref), (seed, i, got, y_ref)
        np.testing.assert_allclose(scores[i], s_ref, rtol=1e-4)


@pytest.mark.slow
def test_device_beam_property_large():
    """VERDICT-sized case: T=400, C=70, width=32."""
    probs, lengths = _peaked_batch(11, 1, 400, 70, 0.15)
    seqs, lens, scores = batched_beam_search(
        jnp.asarray(probs), jnp.asarray(lengths), beam_width=32, max_len=402,
    )
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    y_ref, s_ref = ctc_beam_search(
        probs[0], beam_width=32, length=int(lengths[0])
    )
    assert tuple(seqs[0][: lens[0]]) == tuple(y_ref)
    np.testing.assert_allclose(scores[0], s_ref, rtol=1e-4)


def test_device_beam_sharded_matches_single_device(tmp_path):
    """Mesh-sharded batched decode (batch split over the 8-device data
    axis, uneven batch padded up) returns exactly the single-device
    results, LM fusion included — SPMD serving path."""
    import jax

    from ctc_pytorch_tpu.decode.beam_device import batched_beam_search_sharded
    from ctc_pytorch_tpu.parallel import make_mesh

    train_bigram_lm(["aa bb aa bb", "bb aa", "aa aa bb"], tmp_path / "lm.arpa")
    lm = LanguageModel(tmp_path / "lm.arpa")
    table = lm.dense_table({0: "blank", 1: "aa", 2: "bb"}, 3).astype(
        np.float32)
    probs, lengths = _random_batch(7, b=11, t=10, c=3)  # 11 % 8 != 0
    ref = batched_beam_search(
        jnp.asarray(probs), jnp.asarray(lengths), beam_width=6, max_len=12,
        lm_table=jnp.asarray(table), lm_alpha=0.2,
    )
    mesh = make_mesh(jax.devices()[:8])
    got = batched_beam_search_sharded(
        probs, lengths, mesh, beam_width=6, max_len=12,
        lm_table=jnp.asarray(table), lm_alpha=0.2,
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(got[2]), rtol=1e-6)


def test_decode_on_device_truncation_warning(caplog):
    import logging

    from ctc_pytorch_tpu.decode.beam import BeamDecoder

    int2char = {0: "blank", 1: "aa", 2: "bb"}
    dec = BeamDecoder(int2char, beam_width=4)
    # alternating strong labels force a hypothesis longer than max_len=2
    probs = np.tile(
        np.array([[0.05, 0.9, 0.05], [0.05, 0.05, 0.9]], np.float32), (4, 1)
    )[None]  # (1, 8, 3)
    log_probs = np.log(probs).transpose(1, 0, 2)  # (T, B, C)
    with caplog.at_level(logging.WARNING):
        dec.decode_on_device(log_probs, np.asarray([8]), max_len=2)
    assert any("max_len" in r.message for r in caplog.records)


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
