"""Data pipeline tests: ark I/O roundtrip, dataset transforms, bucketing."""

import numpy as np
import pytest

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.data import (
    ArkWriter,
    SpeechDataLoader,
    SpeechDataset,
    collate,
    load_mat,
    read_scp,
    read_text_ark,
)
from ctc_pytorch_tpu.data.kaldi_io import iter_ark, read_cmvn_stats_text
from ctc_pytorch_tpu.vocab import Vocab


def _write_corpus(tmp_path, n=10, dim=13, seed=0):
    rng = np.random.RandomState(seed)
    mats = {}
    with ArkWriter(tmp_path / "feats.ark", tmp_path / "feats.scp") as w:
        for i in range(n):
            utt = f"utt{i:02d}"
            mat = rng.randn(rng.randint(20, 80), dim).astype(np.float32)
            mats[utt] = mat
            w.write(utt, mat)
    units = ["aa", "bb", "cc", "dd"]
    (tmp_path / "units").write_text("\n".join(units) + "\n")
    with open(tmp_path / "phn_text", "w") as f:
        for i in range(n):
            labs = rng.choice(units, size=rng.randint(2, 9))
            f.write(f"utt{i:02d} {' '.join(labs)}\n")
    return mats


def test_ark_roundtrip(tmp_path):
    mats = _write_corpus(tmp_path)
    scp = read_scp(tmp_path / "feats.scp")
    assert len(scp) == 10
    for utt, rx in scp:
        np.testing.assert_array_equal(load_mat(rx), mats[utt])
    for utt, mat in iter_ark(tmp_path / "feats.ark"):
        np.testing.assert_array_equal(mat, mats[utt])


def test_mat_rows_header_peek(tmp_path):
    """mat_rows reads only the ark header; must agree with the full load
    (lengths() uses it so bucketing doesn't decode the corpus twice)."""
    from ctc_pytorch_tpu.data.kaldi_io import mat_rows

    mats = _write_corpus(tmp_path)
    for utt, rx in read_scp(tmp_path / "feats.scp"):
        assert mat_rows(rx) == mats[utt].shape[0]
    bad = tmp_path / "bad.ark"
    bad.write_bytes(b"not an ark")
    assert mat_rows(f"{bad}:0") is None


def test_audio_num_samples_header_peek(tmp_path):
    from ctc_pytorch_tpu.data.prep.sphere import (
        audio_num_samples, read_audio, write_wav,
    )

    s = (np.random.RandomState(0).randn(4321) * 500).astype(np.int16)
    write_wav(tmp_path / "a.wav", s)
    assert audio_num_samples(tmp_path / "a.wav") == 4321
    assert len(read_audio(tmp_path / "a.wav")) == 4321
    assert audio_num_samples(tmp_path / "missing.wav") is None


def test_loader_early_break_stops_producer(tmp_path):
    """Breaking out of a loader iteration mid-epoch must stop the producer
    thread (regression: it stayed blocked on q.put forever, leaking one
    thread + pinned batches per aborted iteration)."""
    import threading
    import time

    _write_corpus(tmp_path, n=10)
    cfg = Config()
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, str(tmp_path / "feats.scp"),
                       str(tmp_path / "phn_text"), cfg)
    loader = SpeechDataLoader(ds, 2, shuffle=False, num_buckets=1)
    before = threading.active_count()
    for _ in range(3):
        for i, b in enumerate(loader):
            if i == 0:
                break  # early exit: generator closed at the yield
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_text_ark(tmp_path):
    p = tmp_path / "feats.txt"
    p.write_text(
        "utt1  [\n  1.0 2.0 3.0 \n  4.0 5.0 6.0 ]\n"
        "utt2  [\n  7.0 8.0 9.0 ]\n"
    )
    feats = read_text_ark(p)
    np.testing.assert_allclose(feats["utt1"], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(feats["utt2"], [[7, 8, 9]])


def test_cmvn_stats_text(tmp_path):
    p = tmp_path / "cmvn.txt"
    p.write_text(" [\n  10.0 20.0 5 \n  30.0 50.0 0 ]\n")
    s, sq, count = read_cmvn_stats_text(p)
    np.testing.assert_allclose(s, [10.0, 20.0])
    np.testing.assert_allclose(sq, [30.0, 50.0])
    assert count == 5


def _cfg():
    cfg = Config()
    cfg.left_ctx, cfg.right_ctx = 0, 2
    cfg.n_skip_frame, cfg.n_downsample = 2, 2
    return cfg


def test_dataset_transform_contract(tmp_path):
    mats = _write_corpus(tmp_path)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text", _cfg())
    feat, label, utt = ds[0]
    raw = mats[utt]
    # spliced to 3x dim, skipped by 2, padded to even length
    assert feat.shape[1] == raw.shape[1] * 3
    expect_t = -(-raw.shape[0] // 2)
    expect_t += expect_t % 2
    assert feat.shape[0] == expect_t
    assert ds.lengths()[0] == expect_t
    assert label.dtype == np.int32


def test_collate_fractional_sizes(tmp_path):
    _write_corpus(tmp_path)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text", _cfg())
    items = [ds[i] for i in range(4)]
    batch = collate(items)
    t_max = max(it[0].shape[0] for it in items)
    assert batch.feats.shape[1] == t_max
    np.testing.assert_allclose(
        batch.input_frac, [it[0].shape[0] / t_max for it in items], rtol=1e-6
    )
    # reference zero-pads (create_input, data_loader.py:129)
    longest = int(np.argmax([it[0].shape[0] for it in items]))
    short = int(np.argmin([it[0].shape[0] for it in items]))
    if items[short][0].shape[0] < t_max:
        assert (batch.feats[short, items[short][0].shape[0]:] == 0).all()
    np.testing.assert_array_equal(
        batch.feats[longest, : items[longest][0].shape[0]], items[longest][0]
    )


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_bucketed_loader_static_shapes(tmp_path, mode):
    _write_corpus(tmp_path, n=20)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text", _cfg())
    loader = SpeechDataLoader(ds, batch_size=4, num_buckets=3, seed=1,
                              mode=mode)
    shapes = set()
    seen = []
    n_items = 0
    for batch in loader:
        shapes.add(batch.feats.shape[1:])
        assert batch.feats.shape[0] == 4  # padded to full batch
        assert batch.feats.shape[1] % 8 == 0  # aligned buckets
        n_items += int(batch.example_mask.sum())
        for u, m in zip(batch.utts, batch.example_mask):
            if m:
                seen.append(u)
        # every real item fits its bucket
        assert (batch.input_lengths <= batch.feats.shape[1]).all()
    assert n_items == 20
    assert sorted(seen) == sorted(f"utt{i:02d}" for i in range(20))
    assert len(shapes) <= 3  # bounded compilation


def test_quantized_mode_reference_composition(tmp_path):
    """Quantized mode = reference-exact batch COMPOSITION (same utterance
    order as num_buckets=0 with the same seed) with T quantized up to a
    bounded boundary set (static shapes for XLA)."""
    _write_corpus(tmp_path, n=22)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text",
                       _cfg())
    exact = SpeechDataLoader(ds, batch_size=4, num_buckets=0, seed=5)
    quant = SpeechDataLoader(ds, batch_size=4, num_buckets=3, seed=5,
                             mode="quantized")
    bounds = quant.batcher.boundaries
    for epoch in (0, 2):
        exact.set_epoch(epoch)
        quant.set_epoch(epoch)
        eb, qb = list(exact), list(quant)
        assert len(eb) == len(qb)
        shapes = set()
        for e, q in zip(eb, qb):
            assert e.utts == q.utts  # identical composition AND order
            shapes.add(q.feats.shape[1])
            # t_pad is the smallest boundary >= this batch's max length
            t_max = int(e.input_lengths[e.example_mask > 0].max())
            expect = min(b for b in bounds if b >= t_max)
            assert q.feats.shape[1] == expect
            np.testing.assert_array_equal(e.input_lengths, q.input_lengths)
            # padded region is zeros; real content identical
            t_exact = e.feats.shape[1]
            np.testing.assert_array_equal(q.feats[:, :t_exact], e.feats)
            assert (q.feats[:, t_exact:] == 0).all()
            # frac contract follows the QUANTIZED pad (frames / T_pad)
            np.testing.assert_allclose(
                q.input_frac, e.input_lengths / q.feats.shape[1], rtol=1e-6)
        assert shapes <= set(bounds)


def test_quantized_boundaries_track_batch_max():
    """Quantized-mode boundaries sit at quantiles of the per-batch MAX
    length distribution, so the padding overhead over the reference's
    per-batch-max padding stays small.  (Utterance-length quantiles would
    put every boundary below where random-composition batch maxes land,
    padding nearly every batch to ~global max — measured ~2 dev PER points
    worse at hard regimes.)"""
    from ctc_pytorch_tpu.data.batching import BucketBatcher

    rng = np.random.RandomState(0)
    # speech-like right-skewed lengths: many short, few long
    lengths = np.clip(50 + rng.gamma(2.0, 40.0, size=512), None, 500)
    lengths = lengths.astype(np.int64)
    lab = np.full(512, 10)
    b = BucketBatcher(lengths, lab, batch_size=8, num_buckets=8, seed=3,
                      mode="quantized")
    tot_pad = tot_max = 0
    shapes = set()
    for chunk, t_pad, _ in b.epoch_batches(0):
        m = int(lengths[chunk].max())
        assert t_pad >= m  # never truncates
        shapes.add(t_pad)
        tot_pad += t_pad * len(chunk)
        tot_max += m * len(chunk)
    overshoot = tot_pad / tot_max - 1.0
    # mean padded frames within ~10% of reference per-batch-max padding
    assert overshoot < 0.10, overshoot
    assert len(shapes) <= 8  # still a bounded compiled-shape set
    # global-max padding (what utterance quantiles degenerate to) would
    # cost far more on this distribution
    top = max(b.boundaries)
    global_overshoot = top * 512 / tot_max - 1.0
    assert global_overshoot > 2 * overshoot


def test_quantized_smaller_than_one_batch():
    """Corpus with fewer utterances than batch_size: boundary simulation
    has zero full batches — must fall back to raw lengths, not crash
    (regression: np.quantile on an empty batch-max array)."""
    from ctc_pytorch_tpu.data.batching import BucketBatcher

    lengths = np.array([40, 55, 61])
    lab = np.array([5, 6, 7])
    b = BucketBatcher(lengths, lab, batch_size=8, num_buckets=4,
                      mode="quantized")
    batches = list(b.epoch_batches(0))
    assert len(batches) == 1
    chunk, t_pad, _ = batches[0]
    assert sorted(chunk.tolist()) == [0, 1, 2]
    assert t_pad >= 61


def test_quantized_device_cache_equals_host(tmp_path):
    """DeviceCachedLoader in quantized mode (single top-bound plane +
    per-batch slice) matches the host loader batch-for-batch."""
    from ctc_pytorch_tpu.data.batching import DeviceCachedLoader

    _write_corpus(tmp_path, n=19)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text",
                       _cfg())
    host = SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=3,
                            mode="quantized")
    dev = DeviceCachedLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=3,
                         mode="quantized"))
    assert dev.total_bytes() == DeviceCachedLoader.estimate_bytes(host)
    for epoch in (0, 1):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        hb, db = list(host), list(dev)
        assert len(hb) == len(db)
        for h, d in zip(hb, db):
            assert h.utts == d.utts
            np.testing.assert_array_equal(h.feats, np.asarray(d.feats))
            np.testing.assert_array_equal(h.labels, np.asarray(d.labels))
            np.testing.assert_allclose(h.input_frac,
                                       np.asarray(d.input_frac), rtol=1e-6)
            np.testing.assert_array_equal(h.example_mask,
                                          np.asarray(d.example_mask))


def test_loader_epoch_shuffle_deterministic(tmp_path):
    _write_corpus(tmp_path, n=16)
    vocab = Vocab(tmp_path / "units")
    ds = SpeechDataset(vocab, tmp_path / "feats.scp", tmp_path / "phn_text", _cfg())
    loader = SpeechDataLoader(ds, batch_size=4, num_buckets=2, seed=7)
    order0 = [tuple(b.utts) for b in loader]
    order0b = [tuple(b.utts) for b in loader]
    assert order0 == order0b  # same epoch -> same order
    loader.set_epoch(1)
    order1 = [tuple(b.utts) for b in loader]
    assert order0 != order1  # different epoch -> reshuffled
