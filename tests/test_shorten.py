"""Shorten decoder tests (stage-0 prep: sph2pipe replacement).

The bit-level vector below is hand-packed from the format definition
(independent of the package's _BitWriter), so the decoder is pinned to the
shorten spec, not to our own encoder.  Roundtrips cover the DIFF predictor
family, nmean offsets, blocksize changes, and ragged final blocks; the
committed fixture (`tests/fixtures/shorten_v2.sph`) pins byte-level
stability of a full SPHERE + embedded-shorten read.
"""

from pathlib import Path

import numpy as np
import pytest

from ctc_pytorch_tpu.data.prep import shorten as sh
from ctc_pytorch_tpu.data.prep.sphere import read_audio, read_sphere

FIXDIR = Path(__file__).parent / "fixtures"


# ---- independent bit packing helpers (spec-derived, not _BitWriter) ------
def _uvar_bits(v: int, k: int) -> str:
    high, low = v >> k, v & ((1 << k) - 1)
    return "0" * high + "1" + (format(low, f"0{k}b") if k else "")


def _ulong_bits(v: int, k: int) -> str:
    return _uvar_bits(k, sh.ULONGSIZE) + _uvar_bits(v, k)


def _var_bits(v: int, k: int) -> str:
    zz = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
    return _uvar_bits(zz, k + 1)


def _bits_to_bytes(bits: str) -> bytes:
    bits += "0" * (-len(bits) % 32)  # pad to a 32-bit word
    return bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )


def test_hand_packed_diff1_stream():
    """v2 mono S16LH stream, blocksize 4, one DIFF1 block [3, 1, -2, 0]."""
    bits = (
        _ulong_bits(sh.TYPE_S16LH, 3)  # ftype 5
        + _ulong_bits(1, 1)            # nchan
        + _ulong_bits(4, 3)            # blocksize
        + _ulong_bits(0, 0)            # maxnlpc
        + _ulong_bits(0, 0)            # nmean
        + _ulong_bits(0, 0)            # nskip
        + _uvar_bits(sh.FN_DIFF1, sh.FNSIZE)
        + _uvar_bits(2, sh.ENERGYSIZE)  # resn = 2
        # residuals vs prev (init history 0): 3, -2, -3, 2
        + _var_bits(3, 2) + _var_bits(-2, 2) + _var_bits(-3, 2)
        + _var_bits(2, 2)
        + _uvar_bits(sh.FN_QUIT, sh.FNSIZE)
    )
    data = sh.MAGIC + bytes([2]) + _bits_to_bytes(bits)
    samples, ftype = sh.decode_shorten(data)
    assert ftype == sh.TYPE_S16LH
    np.testing.assert_array_equal(samples, [3, 1, -2, 0])


def test_hand_packed_bitshift_and_zero():
    """FN_BITSHIFT applies to output only; FN_ZERO emits zeros."""
    bits = (
        _ulong_bits(sh.TYPE_S16LH, 3)
        + _ulong_bits(1, 1) + _ulong_bits(2, 2)  # blocksize 2
        + _ulong_bits(0, 0) + _ulong_bits(0, 0) + _ulong_bits(0, 0)
        + _uvar_bits(sh.FN_BITSHIFT, sh.FNSIZE)
        + _uvar_bits(1, sh.BITSHIFTSIZE)          # bitshift 1
        + _uvar_bits(sh.FN_DIFF0, sh.FNSIZE)
        + _uvar_bits(2, sh.ENERGYSIZE)
        + _var_bits(5, 2) + _var_bits(-3, 2)      # DIFF0: raw values
        + _uvar_bits(sh.FN_ZERO, sh.FNSIZE)
        + _uvar_bits(sh.FN_QUIT, sh.FNSIZE)
    )
    data = sh.MAGIC + bytes([2]) + _bits_to_bytes(bits)
    samples, _ = sh.decode_shorten(data)
    np.testing.assert_array_equal(samples, [10, -6, 0, 0])


def test_hand_packed_nmean_negative_blocks():
    """v2 nmean=4 offset math uses C truncating division (shorten.c does
    ``sum / nmean`` and ``sum / blocksize`` on longs, truncating toward
    zero) — floor division diverges whenever a block sum is negative.

    Hand derivation (blocksize 4, S16LH so offsets start [0,0,0,0]):
      block 1: coffset = trunc((2 + 0)/4) = 0; DIFF0 res [-9,-5,-11,-7]
               -> samples [-9,-5,-11,-7]; stored mean
               trunc((2 - 32)/4) = -7   (floor would give -8)
      block 2: coffset = trunc((2 + (0+0+0-7))/4) = trunc(-5/4) = -1
               (floor: -2); DIFF0 res [1,2,3,4] -> samples [0,1,2,3];
               stored mean trunc((2 + 6)/4) = 2
      block 3: coffset = trunc((2 + (0-7+2))/4) = trunc(-3/4) = 0
               (floor: -1); DIFF0 res [5,5,5,5] -> samples [5,5,5,5]
    """
    res_blocks = [[-9, -5, -11, -7], [1, 2, 3, 4], [5, 5, 5, 5]]
    bits = (
        _ulong_bits(sh.TYPE_S16LH, 3)
        + _ulong_bits(1, 1)            # nchan
        + _ulong_bits(4, 3)            # blocksize
        + _ulong_bits(0, 0)            # maxnlpc
        + _ulong_bits(4, 3)            # nmean = 4
        + _ulong_bits(0, 0)            # nskip
    )
    for res in res_blocks:
        bits += _uvar_bits(sh.FN_DIFF0, sh.FNSIZE)
        bits += _uvar_bits(4, sh.ENERGYSIZE)
        for r in res:
            bits += _var_bits(r, 4)
    bits += _uvar_bits(sh.FN_QUIT, sh.FNSIZE)
    data = sh.MAGIC + bytes([2]) + _bits_to_bytes(bits)
    samples, _ = sh.decode_shorten(data)
    np.testing.assert_array_equal(
        samples, [-9, -5, -11, -7, 0, 1, 2, 3, 5, 5, 5, 5])


def test_cdiv_matches_c_semantics():
    for a in range(-25, 26):
        for b in (1, 2, 3, 4, 7):
            assert sh._cdiv(a, b) == int(a / b), (a, b)


def _speechlike(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    sig = (
        6000 * np.sin(2 * np.pi * 120 * t / 16000)
        + 2500 * np.sin(2 * np.pi * 731 * t / 16000)
        + rng.randn(n) * 300
    )
    return np.clip(sig, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("nmean", [0, 4])
@pytest.mark.parametrize("n", [1000, 256, 300])
def test_roundtrip_s16(n, nmean):
    x = _speechlike(n, seed=n + nmean)
    enc = sh.encode_shorten(x, nmean=nmean)
    dec, ftype = sh.decode_shorten(enc)
    assert ftype == sh.TYPE_S16LH
    np.testing.assert_array_equal(dec, x.astype(np.int32))
    assert len(enc) < 2 * n  # actually compresses vs 2 bytes/sample


def test_roundtrip_u16():
    x = _speechlike(700, seed=3)
    enc = sh.encode_shorten(x, ftype=sh.TYPE_U16LH)
    dec, ftype = sh.decode_shorten(enc)
    assert ftype == sh.TYPE_U16LH
    np.testing.assert_array_equal(dec, x.astype(np.int32))


def test_roundtrip_extremes_and_dc():
    for x in (
        np.zeros(300, np.int16),
        np.full(300, 1234, np.int16),
        np.array([32767, -32768] * 200, np.int16),
    ):
        dec, _ = sh.decode_shorten(sh.encode_shorten(x))
        np.testing.assert_array_equal(dec, x.astype(np.int32))


def test_ulaw_alaw_tables():
    # canonical G.711 values
    u = sh._ulaw_to_linear(np.array([0x00, 0x80, 0xFF, 0x7F], np.uint8))
    np.testing.assert_array_equal(u, [-32124, 32124, 0, 0])
    a = sh._alaw_to_linear(np.array([0x55, 0xD5, 0x2A, 0xAA], np.uint8))
    np.testing.assert_array_equal(a, [8, -8, 32256, -32256])


def _sphere_bytes(payload: bytes, n_samples: int) -> bytes:
    header = (
        "NIST_1A\n   1024\n"
        "channel_count -i 1\n"
        f"sample_count -i {n_samples}\n"
        "sample_rate -i 16000\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s26 pcm,embedded-shorten-v2.00\n"
        "end_head\n"
    ).encode()
    return header + b" " * (1024 - len(header)) + payload


def test_read_sphere_embedded_shorten(tmp_path):
    x = _speechlike(1600, seed=9)
    p = tmp_path / "utt.sph"
    p.write_bytes(_sphere_bytes(sh.encode_shorten(x), len(x)))
    samples, rate = read_sphere(p)
    assert rate == 16000 and samples.dtype == np.int16
    np.testing.assert_array_equal(samples, x)
    wav = read_audio(p)
    np.testing.assert_allclose(wav, x.astype(np.float32))


def test_committed_fixture_pins_bytes():
    """The committed .sph fixture decodes to the committed samples —
    byte-level stability independent of today's encoder."""
    sph = FIXDIR / "shorten_v2.sph"
    ref = np.load(FIXDIR / "shorten_v2_samples.npz")["samples"]
    samples, _ = read_sphere(sph)
    np.testing.assert_array_equal(samples, ref)
