"""The .calm model container: a single safetensors file holding quantized
weights, tokenizer tensors, and hyperparameter metadata.

Design mirrors the reference container contract (reference: src/tensors.c,
custom writer tools/convert.py:502-536) re-implemented for host-side numpy:

- one mmap-able file; the host never copies weight bytes (np.memmap views)
- strict validation on every fetch: exact dtype and shape or hard failure
  (reference: tensors_get, src/tensors.c:325-342)
- 256-byte aligned tensor data, tokenizer tensors appended last
- fp8 stored with safetensors dtype tag F8_E5M2; gf4 stored as I32 words

Shard-aware loading rides the memmap: :meth:`TensorFile.get` returns a
zero-copy view, and slicing it (calm_tpu.model.WeightDesc /
calm_tpu.parallel.sharding.load_weights_sharded) faults in only the sliced
file pages — each host of a multi-host mesh reads just its shard.
"""

from __future__ import annotations

import json
import math
import os
from typing import Mapping, Sequence

import numpy as np
import ml_dtypes

ALIGN = 256

# safetensors dtype tag <-> numpy dtype (reference dtype table: src/tensors.c:75-83)
DTYPES = {
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
}
DTYPE_TAGS = {v: k for k, v in DTYPES.items()}

MAX_HEADER = 64 * 1024 * 1024


class ContainerError(Exception):
    pass


class TensorFile:
    """Read-only mmap view of a .calm safetensors container."""

    def __init__(self, path: str):
        self.path = path
        size = os.path.getsize(path)
        if size < 8:
            raise ContainerError("file too small for safetensors header")

        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        hsize = int.from_bytes(bytes(self._mm[:8]), "little")
        if hsize > MAX_HEADER or 8 + hsize > size:
            raise ContainerError(f"invalid header size {hsize}")

        try:
            header = json.loads(bytes(self._mm[8 : 8 + hsize]).decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ContainerError(f"invalid header JSON: {e}") from e
        if not isinstance(header, dict):
            raise ContainerError("header is not a JSON object")

        self.metadata: dict[str, str] = {}
        self._tensors: dict[str, tuple[np.dtype, tuple[int, ...], int, int]] = {}

        data_size = size - 8 - hsize
        for name, desc in header.items():
            if name == "__metadata__":
                if not isinstance(desc, dict) or not all(
                    isinstance(k, str) and isinstance(v, str) for k, v in desc.items()
                ):
                    raise ContainerError("metadata must map strings to strings")
                self.metadata = desc
                continue
            if not isinstance(desc, dict):
                raise ContainerError(f"tensor {name!r}: not an object")
            try:
                tag = desc["dtype"]
                shape = tuple(int(d) for d in desc["shape"])
                begin, end = (int(x) for x in desc["data_offsets"])
            except (KeyError, TypeError, ValueError) as e:
                raise ContainerError(f"tensor {name!r}: malformed descriptor") from e
            if tag not in DTYPES:
                raise ContainerError(f"tensor {name!r}: unsupported dtype {tag!r}")
            dtype = DTYPES[tag]
            # element count with overflow guard (reference: src/tensors.c:97-112)
            n = 1
            for d in shape:
                if d < 0 or (d and n > 2**63 // max(d, 1)):
                    raise ContainerError(f"tensor {name!r}: shape overflow")
                n *= d
            if not (0 <= begin <= end <= data_size):
                raise ContainerError(f"tensor {name!r}: offsets out of range")
            if end - begin != n * dtype.itemsize:
                raise ContainerError(f"tensor {name!r}: size mismatch")
            self._tensors[name] = (dtype, shape, 8 + hsize + begin, 8 + hsize + end)

        self._data_off = 8 + hsize

    # -- lookups ----------------------------------------------------------

    def names(self) -> list[str]:
        return list(self._tensors)

    def find(self, name: str, layer: int | None = None):
        """Return the (dtype, shape) descriptor or None (tensors_find)."""
        key = name % layer if layer is not None and "%d" in name else name
        t = self._tensors.get(key)
        return (t[0], t[1]) if t else None

    def nbytes(self, name: str) -> int:
        dtype, shape, begin, end = self._tensors[name]
        return end - begin

    def get(self, name: str, layer: int | None = None,
            dtype: np.dtype | None = None,
            shape: Sequence[int] | None = None) -> np.ndarray:
        """Zero-copy fetch with hard dtype/shape validation.

        Mirrors the reference's load-time validation surface
        (src/tensors.c:325-342): a mis-converted model cannot half-load.
        """
        key = name % layer if layer is not None and "%d" in name else name
        if key not in self._tensors:
            raise ContainerError(f"tensor {key!r} not found in {self.path}")
        tdtype, tshape, begin, end = self._tensors[key]
        if dtype is not None and np.dtype(dtype) != tdtype:
            raise ContainerError(
                f"tensor {key!r}: dtype mismatch (file {tdtype}, want {np.dtype(dtype)})")
        if shape is not None and tuple(shape) != tshape:
            raise ContainerError(
                f"tensor {key!r}: shape mismatch (file {tshape}, want {tuple(shape)})")
        return self._mm[begin:end].view(tdtype).reshape(tshape)

    def count_bytes(self, prefix: str, contains: str | None = None):
        """(bytes, params) over tensors matching a name prefix/substring.

        Parameter counting mirrors the reference (src/run.c:131-152): gf4
        words (I32) count as 8 parameters each.
        """
        total_bytes = 0
        params = 0
        for name, (dtype, shape, begin, end) in self._tensors.items():
            if not name.startswith(prefix):
                continue
            if contains and contains not in name:
                continue
            n = math.prod(shape) if shape else 1
            if dtype == np.dtype(np.int32):
                n *= 8  # gf4 packs 8 weights per i32 word
            params += n
            total_bytes += end - begin
        return total_bytes, params

    def close(self):
        self._mm = None


def write_tensors(path: str, tensors: Mapping[str, np.ndarray],
                  metadata: Mapping[str, str] | None = None) -> None:
    """Write a .calm safetensors file with 256-byte-aligned tensor data.

    Tensor order is preserved; callers append tokenizer tensors last so the
    large weight tensors stay aligned (reference: tools/convert.py:492-495).
    """
    header: dict = {}
    if metadata:
        if not all(isinstance(v, str) for v in metadata.values()):
            raise ContainerError("metadata values must be strings")
        header["__metadata__"] = dict(metadata)

    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in DTYPE_TAGS:
            raise ContainerError(f"tensor {name!r}: unsupported dtype {arr.dtype}")
        size = arr.nbytes
        header[name] = {
            "dtype": DTYPE_TAGS[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + size],
        }
        arrays.append(arr)
        offset += size

    hjson = json.dumps(header).encode("utf-8")
    hjson += b" " * (-(len(hjson) + 8) % ALIGN)

    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for arr in arrays:
            f.write(arr.tobytes())
