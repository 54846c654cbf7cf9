"""ctypes bridge to the native runtime layer (native/*.cc).

The native library accelerates and hardens the HOST side of the framework —
container parsing/validation, BPE prompt encoding for the serving loop, and
host sampling — mirroring the reference's C core (src/tensors.c,
src/tokenizer.c, src/sampler.c). The TPU compute path is unaffected.

Everything here is optional: ``available()`` is False until
``make -C native`` has produced ``calm_tpu/_native/libcalm_native.so``
(or CALM_TPU_NATIVE points at a build), and every caller falls back to the
pure-Python implementation. Tests assert Python/native parity.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_NAMES = ("libcalm_native.so",)


@lru_cache(maxsize=1)
def _load():
    path = os.environ.get("CALM_TPU_NATIVE")
    candidates = [path] if path else []
    here = os.path.dirname(__file__)
    candidates += [os.path.join(here, "_native", n) for n in _LIB_NAMES]
    for cand in candidates:
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            _declare(lib)
            return lib
    return None


def _declare(lib):
    c = ctypes
    lib.cn_last_error.restype = c.c_char_p

    lib.cn_tensors_open.argtypes = [c.c_char_p]
    lib.cn_tensors_open.restype = c.c_void_p
    lib.cn_tensors_parse.argtypes = [c.c_void_p, c.c_size_t]
    lib.cn_tensors_parse.restype = c.c_void_p
    lib.cn_tensors_close.argtypes = [c.c_void_p]
    lib.cn_tensor_count.argtypes = [c.c_void_p]
    lib.cn_tensor_count.restype = c.c_int
    lib.cn_tensor_name.argtypes = [c.c_void_p, c.c_int]
    lib.cn_tensor_name.restype = c.c_char_p
    lib.cn_tensor_info.argtypes = [
        c.c_void_p, c.c_char_p, c.POINTER(c.c_char_p), c.POINTER(c.c_int),
        c.POINTER(c.c_int64), c.POINTER(c.c_void_p), c.POINTER(c.c_int64)]
    lib.cn_tensor_info.restype = c.c_int
    lib.cn_metadata_count.argtypes = [c.c_void_p]
    lib.cn_metadata_count.restype = c.c_int
    lib.cn_metadata_key.argtypes = [c.c_void_p, c.c_int]
    lib.cn_metadata_key.restype = c.c_char_p
    lib.cn_metadata_find.argtypes = [c.c_void_p, c.c_char_p]
    lib.cn_metadata_find.restype = c.c_char_p

    lib.cn_tokenizer_create.argtypes = [
        c.c_void_p, c.c_size_t, c.POINTER(c.c_float), c.c_int, c.c_int]
    lib.cn_tokenizer_create.restype = c.c_void_p
    lib.cn_tokenizer_free.argtypes = [c.c_void_p]
    lib.cn_tokenizer_encode.argtypes = [
        c.c_void_p, c.c_void_p, c.c_size_t, c.c_int,
        c.POINTER(c.c_int), c.c_size_t]
    lib.cn_tokenizer_encode.restype = c.c_int
    lib.cn_tokenizer_find.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.cn_tokenizer_find.restype = c.c_int

    lib.cn_rand64.argtypes = [c.POINTER(c.c_uint64)]
    lib.cn_rand64.restype = c.c_uint64
    lib.cn_sample_argmax.argtypes = [c.POINTER(c.c_float), c.c_int]
    lib.cn_sample_argmax.restype = c.c_int
    lib.cn_sample_minp.argtypes = [
        c.POINTER(c.c_float), c.c_int, c.c_float, c.c_float,
        c.POINTER(c.c_uint64)]
    lib.cn_sample_minp.restype = c.c_int


def available() -> bool:
    return _load() is not None


def last_error() -> str:
    lib = _load()
    return lib.cn_last_error().decode() if lib else "native library not built"


class NativeContainer:
    """Validating parse of a container via the C++ reader.

    Used as a second validation opinion and for parity tests; the numpy
    reader in calm_tpu/container.py remains the data path (it hands zero-copy
    memmap views straight to jax.device_put).
    """

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._h = lib.cn_tensors_open(path.encode())
        if not self._h:
            raise ValueError(f"native parse failed: {last_error()}")

    def names(self) -> list[str]:
        n = self._lib.cn_tensor_count(self._h)
        return [self._lib.cn_tensor_name(self._h, i).decode() for i in range(n)]

    def info(self, name: str):
        c = ctypes
        tag = c.c_char_p()
        ndim = c.c_int()
        shape = (c.c_int64 * 8)()
        data = c.c_void_p()
        nbytes = c.c_int64()
        rc = self._lib.cn_tensor_info(self._h, name.encode(), c.byref(tag),
                                      c.byref(ndim), shape, c.byref(data),
                                      c.byref(nbytes))
        if rc != 0:
            raise KeyError(name)
        return (tag.value.decode(), tuple(shape[: ndim.value]),
                int(nbytes.value))

    def metadata(self) -> dict[str, str]:
        out = {}
        for i in range(self._lib.cn_metadata_count(self._h)):
            k = self._lib.cn_metadata_key(self._h, i).decode()
            out[k] = self._lib.cn_metadata_find(self._h, k.encode()).decode()
        return out

    def close(self):
        if self._h:
            self._lib.cn_tensors_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def parse_bytes(data: bytes) -> bool:
    """Parse an in-memory container; True iff the native parser accepts it."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    buf = ctypes.create_string_buffer(data, len(data))
    h = lib.cn_tensors_parse(ctypes.cast(buf, ctypes.c_void_p), len(data))
    if h:
        lib.cn_tensors_close(h)
        return True
    return False


class NativeTokenizer:
    """BPE encode via the C++ heap-merge implementation."""

    def __init__(self, pieces: list[bytes], scores: np.ndarray, bos_id: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        blob = b"".join(p + b"\0" for p in pieces)
        self._blob = ctypes.create_string_buffer(blob, len(blob))  # keep alive
        self._scores = np.ascontiguousarray(scores, dtype=np.float32)
        self._h = lib.cn_tokenizer_create(
            ctypes.cast(self._blob, ctypes.c_void_p), len(blob),
            self._scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pieces), bos_id)
        if not self._h:
            raise ValueError("native tokenizer rejected the vocab")

    def encode(self, data: bytes, bos: bool = False) -> list[int]:
        cap = len(data) + 3
        out = (ctypes.c_int * cap)()
        n = self._lib.cn_tokenizer_encode(
            self._h, ctypes.cast(ctypes.create_string_buffer(data, len(data)),
                                 ctypes.c_void_p),
            len(data), int(bos), out, cap)
        if n < 0:
            raise RuntimeError("native encode overflow")
        return list(out[:n])

    def __del__(self):
        try:
            if self._h:
                self._lib.cn_tokenizer_free(self._h)
        except Exception:
            pass


def sample_minp(logits: np.ndarray, temperature: float, minp: float,
                state: int) -> tuple[int, int]:
    """One min-p draw; returns (token, new_rng_state)."""
    lib = _load()
    logits = np.ascontiguousarray(logits, dtype=np.float32)
    st = ctypes.c_uint64(state)
    idx = lib.cn_sample_minp(
        logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(logits),
        temperature, minp, ctypes.byref(st))
    return idx, st.value
