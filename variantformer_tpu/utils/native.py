"""ctypes bridge to the native (C++) components, with build-on-demand.

The shared library is built from variantformer_tpu/native/ at first use (or
via ``make -C variantformer_tpu/native``); when no toolchain is available the
callers fall back to their pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
LIB_PATH = NATIVE_DIR / "build" / "libvfxbpe.so"
SEQ_LIB_PATH = NATIVE_DIR / "build" / "libvfxseq.so"

_lock = threading.Lock()
_lib = None
_lib_failed = False
_seq_lib = None
_seq_lib_failed = False


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return LIB_PATH.exists()
    except Exception as exc:
        log.warning("native build failed: %s", exc)
        return False


def get_library():
    """Load (building if necessary) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not LIB_PATH.exists() and os.environ.get("VFX_NO_NATIVE") != "1":
            _build_library()
        if not LIB_PATH.exists():
            _lib_failed = True
            return None
        lib = ctypes.CDLL(str(LIB_PATH))
        lib.vfx_bpe_create.restype = ctypes.c_void_p
        lib.vfx_bpe_create.argtypes = [
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
        ]
        lib.vfx_bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.vfx_bpe_encode.restype = ctypes.c_int32
        lib.vfx_bpe_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int32,
        ]
        lib.vfx_bpe_encode_batch.restype = ctypes.c_int64
        lib.vfx_bpe_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def get_seq_library():
    """Load (building if necessary) the native sequence library, or None."""
    global _seq_lib, _seq_lib_failed
    with _lock:
        if _seq_lib is not None or _seq_lib_failed:
            return _seq_lib
        if not SEQ_LIB_PATH.exists() and os.environ.get("VFX_NO_NATIVE") != "1":
            _build_library()
        if not SEQ_LIB_PATH.exists():
            _seq_lib_failed = True
            return None
        lib = ctypes.CDLL(str(SEQ_LIB_PATH))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        lib.vfx_consensus.restype = ctypes.c_int64
        lib.vfx_consensus.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, i64p, ctypes.c_char_p, i64p, i64p, i64p,
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vfx_reverse_complement.restype = None
        lib.vfx_reverse_complement.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        _seq_lib = lib
        return _seq_lib


def native_consensus(
    seq: str, region_start: int, variants, snps_only: bool
) -> tuple[str, int] | None:
    """C++ consensus over [region_start, region_start+len(seq)).
    ``variants``: iterable of VcfVariant. Returns None if unavailable."""
    lib = get_seq_library()
    if lib is None:
        return None
    variants = list(variants)
    n = len(variants)
    pos = np.asarray([v.pos for v in variants], np.int64)
    # Per-field contiguous blobs: each allele i spans off[i]..off[i+1].
    refs = [v.ref.encode() for v in variants]
    a0s = [v.alleles[0].encode() for v in variants]
    a1s = [v.alleles[1].encode() for v in variants]
    field_blob = b"".join(refs) + b"".join(a0s) + b"".join(a1s)
    r_off = np.zeros(n + 1, np.int64)
    z_off = np.zeros(n + 1, np.int64)
    o_off = np.zeros(n + 1, np.int64)
    acc = 0
    for i, b in enumerate(refs):
        r_off[i] = acc
        acc += len(b)
    r_off[n] = acc
    for i, b in enumerate(a0s):
        z_off[i] = acc
        acc += len(b)
    z_off[n] = acc
    for i, b in enumerate(a1s):
        o_off[i] = acc
        acc += len(b)
    o_off[n] = acc

    seq_b = seq.encode()
    max_out = len(seq_b) + sum(len(b) for b in a0s + a1s) + 16
    out = ctypes.create_string_buffer(max_out)
    applied = ctypes.c_int32(0)
    written = lib.vfx_consensus(
        seq_b, len(seq_b), region_start, n, pos, field_blob,
        r_off, z_off, o_off, int(snps_only), out, max_out,
        ctypes.byref(applied),
    )
    if written < 0:
        return None
    return out.raw[:written].decode(), applied.value


class NativeBPE:
    """Native BPE encoder over id-space merges."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        n = len(merges)
        left = np.empty(n, np.int32)
        right = np.empty(n, np.int32)
        result = np.empty(n, np.int32)
        for i, (a, b) in enumerate(merges):
            left[i] = vocab[a]
            right[i] = vocab[b]
            result[i] = vocab[a + b]
        char_to_id = np.full(256, -1, np.int32)
        for token, tid in vocab.items():
            if len(token) == 1:
                char_to_id[ord(token)] = tid
        self._handle = lib.vfx_bpe_create(n, left, right, result, char_to_id)
        if not self._handle:
            raise RuntimeError("vfx_bpe_create failed")

    def encode_word(self, word: str):
        n = len(word)
        if n == 0:
            return [], []
        out_ids = np.empty(n, np.int32)
        out_starts = np.empty(n, np.int32)
        out_ends = np.empty(n, np.int32)
        count = self._lib.vfx_bpe_encode(
            self._handle, word.encode("ascii"), n, out_ids, out_starts, out_ends, n
        )
        if count < 0:
            raise ValueError(f"native BPE encode failed (code {count})")
        ids = out_ids[:count].tolist()
        offsets = list(zip(out_starts[:count].tolist(), out_ends[:count].tolist()))
        return ids, offsets

    def encode_word_ids(self, word: str) -> np.ndarray:
        """Array-only fast path (no offsets, no Python lists)."""
        n = len(word)
        if n == 0:
            return np.zeros(0, np.int32)
        out_ids = np.empty(n, np.int32)
        out_starts = np.empty(n, np.int32)
        out_ends = np.empty(n, np.int32)
        count = self._lib.vfx_bpe_encode(
            self._handle, word.encode("ascii"), n, out_ids, out_starts, out_ends, n
        )
        if count < 0:
            raise ValueError(f"native BPE encode failed (code {count})")
        return out_ids[:count]

    def encode_word_ids_offsets(
        self, word: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Like encode_word but array-only: (ids, starts, ends) int32."""
        n = len(word)
        if n == 0:
            z = np.zeros(0, np.int32)
            return z, z.copy(), z.copy()
        out_ids = np.empty(n, np.int32)
        out_starts = np.empty(n, np.int32)
        out_ends = np.empty(n, np.int32)
        count = self._lib.vfx_bpe_encode(
            self._handle, word.encode("ascii"), n, out_ids, out_starts, out_ends, n
        )
        if count < 0:
            raise ValueError(f"native BPE encode failed (code {count})")
        return out_ids[:count], out_starts[:count], out_ends[:count]

    def encode_words_ids(
        self, words: list[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Encode many words in ONE native call (one GIL release instead of
        one per word — see the convoy note in bpe.cpp). Returns
        (flat_ids, per_word_counts)."""
        if not words:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        text = "".join(words).encode("ascii")
        bounds = np.zeros(len(words) + 1, np.int64)
        np.cumsum([len(w) for w in words], out=bounds[1:])
        out_ids = np.empty(len(text), np.int32)
        out_counts = np.empty(len(words), np.int32)
        total = self._lib.vfx_bpe_encode_batch(
            self._handle, text, bounds, len(words), out_ids, out_counts,
            len(text),
        )
        if total < 0:
            raise ValueError(f"native BPE encode failed (code {total})")
        return out_ids[:total], out_counts

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.vfx_bpe_destroy(self._handle)
        except Exception:
            pass
