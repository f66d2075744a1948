"""Corpus prep tests: sphere reader, phone folding, TIMIT layout walk."""

import numpy as np

from ctc_pytorch_tpu.data.prep import (
    normalize_phones,
    phone_map,
    prepare_timit,
    read_audio,
    read_sphere,
)
from ctc_pytorch_tpu.data.prep.sphere import write_wav


def _write_sphere(path, samples, rate=16000):
    header = (
        f"NIST_1A\n   1024\nsample_rate -i {rate}\n"
        f"channel_count -i 1\nsample_n_bytes -i 2\n"
        f"sample_byte_format -s2 01\nsample_count -i {len(samples)}\n"
        "sample_coding -s3 pcm\nend_head\n"
    ).encode()
    header = header + b" " * (1024 - len(header))
    path.write_bytes(header + np.asarray(samples, "<i2").tobytes())


def test_sphere_reader(tmp_path):
    samples = (np.sin(np.linspace(0, 100, 1600)) * 10000).astype(np.int16)
    p = tmp_path / "x.wav"
    _write_sphere(p, samples)
    out, rate = read_sphere(p)
    assert rate == 16000
    np.testing.assert_array_equal(out, samples)
    # read_audio auto-detects sphere vs riff
    np.testing.assert_array_equal(read_audio(p), samples.astype(np.float32))
    q = tmp_path / "y.wav"
    write_wav(q, samples)
    np.testing.assert_array_equal(read_audio(q), samples.astype(np.float32))


def test_phone_folding():
    # 60->39: closures and silence fold to sil, q drops
    assert normalize_phones(["h#", "sh", "ix", "q", "kcl", "k"], "60-39") == [
        "sil", "sh", "ih", "sil", "k"
    ]
    # 60->48: q drops, h# -> sil, kcl -> cl
    assert normalize_phones(["h#", "q", "kcl", "ax-h"], "60-48") == [
        "sil", "cl", "ax"
    ]
    m48 = phone_map("48-39")
    assert m48["cl"] == "sil" and m48["ix"] == "ih"
    assert len({v for v in phone_map("60-39").values() if v}) == 39
    assert len({v for v in phone_map("60-48").values() if v}) == 48


def _fake_timit(root):
    rng = np.random.RandomState(0)
    for split, spk in [("train", "fabc0"), ("train", "mdef0"),
                       ("test", "mdab0"), ("test", "faks0")]:
        d = root / split / "dr1" / spk
        d.mkdir(parents=True)
        for sent in ["si100", "sx42", "sa1"]:  # sa must be excluded
            samples = (rng.randn(800) * 1000).astype(np.int16)
            _write_sphere(d / f"{sent}.wav", samples)
            (d / f"{sent}.phn").write_text("0 400 h#\n400 600 sh\n600 800 q\n")
            (d / f"{sent}.wrd").write_text("400 600 she\n")


def test_prepare_timit(tmp_path):
    _fake_timit(tmp_path / "timit")
    counts = prepare_timit(tmp_path / "timit", tmp_path / "data", "60-39")
    assert counts["train"] == 4  # 2 speakers x 2 non-SA sentences
    assert counts["test"] == 2  # mdab0 in the core test set
    assert counts["dev"] == 2  # faks0 in the dev set
    scp = (tmp_path / "data" / "train" / "wav.scp").read_text().splitlines()
    assert all("_sa" not in line.split()[0] for line in scp)
    phn = (tmp_path / "data" / "train" / "phn_text").read_text().splitlines()
    utt, *phones = phn[0].split()
    assert phones == ["sil", "sh"]  # q dropped, h# folded
    units = (tmp_path / "data" / "units").read_text().split()
    assert units == ["sh", "sil"]
