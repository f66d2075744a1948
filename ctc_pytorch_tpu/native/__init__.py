"""ctypes bindings for the native host-side kernels (ctc_native.cpp).

Builds the shared library on first use with g++ (no pybind11 dependency);
falls back silently when no compiler is available — callers must check
``available()`` and keep the pure-python path working.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_log = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "ctc_native.cpp"
_SRC_ARK = _HERE / "ark_native.cpp"
_LIB_PATH = _HERE / "libctc_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), str(_SRC_ARK), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError) as exc:
        detail = getattr(exc, "stderr", b"") or b""
        _log.warning(
            "native ctc library build failed (%s); falling back to the "
            "pure-python decoder paths. stderr: %s",
            exc, detail.decode("utf-8", "replace")[:500],
        )
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src_mtime = max(_SRC.stat().st_mtime, _SRC_ARK.stat().st_mtime)
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as exc:
            _log.warning(
                "native ctc library failed to load (%s); falling back to "
                "the pure-python decoder paths", exc,
            )
            _build_failed = True
            return None
        lib.batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ctc_beam_search.restype = ctypes.c_int32
        lib.ctc_beam_search.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.ark_dims.restype = ctypes.c_int32
        lib.ark_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ark_load_processed.restype = ctypes.c_int32
        lib.ark_load_processed.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.ark_open.restype = ctypes.c_int32
        lib.ark_open.argtypes = [ctypes.c_char_p]
        lib.ark_close.argtypes = [ctypes.c_int32]
        lib.ark_dims_fd.restype = ctypes.c_int32
        lib.ark_dims_fd.argtypes = [
            ctypes.c_int32, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ark_load_processed_fd.restype = ctypes.c_int32
        lib.ark_load_processed_fd.argtypes = [
            ctypes.c_int32, ctypes.c_long, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def batch_edit_distance_native(
    refs: np.ndarray, ref_lens: np.ndarray, hyps: np.ndarray,
    hyp_lens: np.ndarray,
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    refs = np.ascontiguousarray(refs, np.int32)
    hyps = np.ascontiguousarray(hyps, np.int32)
    ref_lens = np.ascontiguousarray(ref_lens, np.int32)
    hyp_lens = np.ascontiguousarray(hyp_lens, np.int32)
    b = refs.shape[0]
    out = np.zeros(b, np.int64)
    lib.batch_edit_distance(
        _ptr(refs, ctypes.c_int32), _ptr(ref_lens, ctypes.c_int32),
        _ptr(hyps, ctypes.c_int32), _ptr(hyp_lens, ctypes.c_int32),
        b, refs.shape[1] if refs.ndim > 1 else 0,
        hyps.shape[1] if hyps.ndim > 1 else 0, _ptr(out, ctypes.c_int64),
    )
    return out


def ctc_beam_search_native(
    probs: np.ndarray,
    beam_width: int,
    lm_table: Optional[np.ndarray] = None,
    lm_alpha: float = 0.0,
    blank: int = 0,
    length: Optional[int] = None,
) -> Tuple[Tuple[int, ...], float]:
    lib = _load()
    assert lib is not None
    probs = np.ascontiguousarray(probs, np.float32)
    t, c = probs.shape
    length = t if length is None else int(length)
    out_seq = np.zeros(max(t, 1), np.int32)
    out_score = ctypes.c_double(0.0)
    if lm_table is not None:
        lm_arr = np.ascontiguousarray(lm_table, np.float32)
        lm_ptr = _ptr(lm_arr, ctypes.c_float)
        lm_dim = lm_arr.shape[0]
    else:
        lm_ptr = ctypes.POINTER(ctypes.c_float)()
        lm_dim = 0
    n = lib.ctc_beam_search(
        _ptr(probs, ctypes.c_float), t, c, length, beam_width, lm_ptr,
        lm_dim, lm_alpha, blank, _ptr(out_seq, ctypes.c_int32),
        ctypes.byref(out_score),
    )
    return tuple(int(x) for x in out_seq[:n]), float(out_score.value)


# per-path cached fds for the fd/pread loader: each ark file is opened once
# per process; pread has no seek state so threads share a single fd safely
_ark_fds: dict = {}
_ark_fd_lock = threading.Lock()


def _ark_fd(lib, path: str) -> int:
    fd = _ark_fds.get(path)
    if fd is not None:
        return fd
    with _ark_fd_lock:
        fd = _ark_fds.get(path)
        if fd is None:
            fd = int(lib.ark_open(path.encode()))
            _ark_fds[path] = fd
    return fd


def close_ark_files() -> None:
    """Close all cached ark fds (tests / long-lived servers)."""
    lib = _load()
    with _ark_fd_lock:
        for fd in _ark_fds.values():
            if lib is not None and fd >= 0:
                lib.ark_close(fd)
        _ark_fds.clear()


def ark_load_processed_native(
    rxspec: str, left: int, right: int, skip: int, downsample: int,
) -> Optional[np.ndarray]:
    """Read an "ark:offset" BFM matrix and splice/skip/pad it natively.

    Returns None when the native library is unavailable or the entry is not
    an uncompressed float matrix — callers fall back to the python reader.
    The ctypes call releases the GIL, so a ThreadPoolExecutor over
    utterances gets real parallelism (SpeechDataset.preload).  The ark file
    is opened once and reused via positional reads (pread), so the per-
    utterance cost is two small preads + one payload pread — no fopen.
    """
    lib = _load()
    if lib is None:
        return None
    if ":" in rxspec:
        path, off_s = rxspec.rsplit(":", 1)
        offset = int(off_s)
    else:
        path, offset = rxspec, 0
    fd = _ark_fd(lib, path)
    if fd < 0:
        return None
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.ark_dims_fd(fd, offset, ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    skip = max(skip, 1)
    downsample = max(downsample, 1)
    rows_sk = (rows.value + skip - 1) // skip
    rows_out = rows_sk + (-rows_sk) % downsample
    cols_out = cols.value * (left + 1 + right)
    out = np.empty((max(rows_out, 1), cols_out), np.float32)
    got = lib.ark_load_processed_fd(
        fd, offset, left, right, skip, downsample,
        _ptr(out, ctypes.c_float), out.shape[0],
    )
    if got < 0:
        return None
    return out[:got]
