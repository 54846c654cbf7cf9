"""Parity tests: native C++ runtime layer vs the pure-Python reference.

The native layer (native/*.cc via calm_tpu/native.py) mirrors the
reference's C core (src/tensors.c, src/tokenizer.c, src/sampler.c). These
tests pin it bit-for-bit to the Python implementations. Skipped when the
library hasn't been built (`make native`).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from calm_tpu import container, native  # noqa: E402
from calm_tpu.sampler import Sampler, XorshiftRng  # noqa: E402
from calm_tpu.tokenizer import Tokenizer  # noqa: E402

from modelgen import tiny_config, write_tiny_model  # noqa: E402


def _ensure_built():
    if native.available():
        return True
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    try:
        subprocess.run(["make", "-C", root], check=True, capture_output=True)
    except Exception:
        return False
    native._load.cache_clear()
    return native.available()


pytestmark = pytest.mark.skipif(not _ensure_built(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "m.calm")
    write_tiny_model(path, tiny_config(dtype="fp8", vocab_size=272), seed=3)
    return path


# ---- container parser ----


def test_container_parity(model_path):
    py = container.TensorFile(model_path)
    nat = native.NativeContainer(model_path)
    assert sorted(nat.names()) == sorted(py.names())
    assert nat.metadata() == py.metadata
    for name in py.names():
        arr = py.get(name)
        tag, shape, nbytes = nat.info(name)
        assert shape == arr.shape
        assert nbytes == arr.nbytes
        assert container.DTYPES[tag] == arr.dtype


def test_container_rejects_corruption(model_path):
    blob = bytearray(open(model_path, "rb").read())
    # both parsers must reject the same malformed headers
    cases = [
        blob[:4],                                   # truncated size
        b"\xff" * 8 + blob[8:],                     # absurd header size
        blob[:8] + b"not json" + blob[16:],         # broken JSON
    ]
    for bad in cases:
        assert not native.parse_bytes(bytes(bad))
        with pytest.raises(Exception):
            import tempfile
            with tempfile.NamedTemporaryFile(suffix=".calm") as f:
                f.write(bad)
                f.flush()
                container.TensorFile(f.name)


def test_container_rejects_bad_offsets():
    # tensor extending past the data section
    hdr = (b'{"t":{"dtype":"F32","shape":[4],"data_offsets":[0,16]}}')
    blob = len(hdr).to_bytes(8, "little") + hdr + b"\x00" * 8  # only 8 bytes
    assert not native.parse_bytes(blob)
    # size mismatch vs shape
    hdr = (b'{"t":{"dtype":"F32","shape":[5],"data_offsets":[0,16]}}')
    blob = len(hdr).to_bytes(8, "little") + hdr + b"\x00" * 16
    assert not native.parse_bytes(blob)


# ---- tokenizer ----


def _mk_tokenizer():
    pieces = [b"<unk>", b"<s>", b"</s>", b"<|im_end|>", b"<|im_start|>"]
    pieces += [bytes([b]) for b in range(97, 123)]  # a-z singles
    pieces += [b"he", b"ll", b"llo", b"hello", b" ", b" he", b"th", b"the",
               b"\xe4\xbd\xa0", b"\xe5\xa5\xbd", b"\xe4\xbd\xa0\xe5\xa5\xbd"]
    pieces += [f"<0x{b:02X}>".encode() for b in range(256)]
    scores = np.zeros(len(pieces), np.float32)
    for i, p in enumerate(pieces):
        scores[i] = float(len(p)) + 0.01 * i  # longer merges first, unique
    os.environ["CALM_TPU_NO_NATIVE"] = "1"   # force pure-Python reference
    try:
        py = Tokenizer(pieces, scores, bos_id=1, eos_id=2)
    finally:
        del os.environ["CALM_TPU_NO_NATIVE"]
    nat = native.NativeTokenizer(pieces, scores, bos_id=1)
    return py, nat


def test_tokenizer_parity_basic():
    py, nat = _mk_tokenizer()
    for text in ["hello", "the llama", "hello<|im_end|>x",
                 "<|im_start|>hi<|im_end|>", "你好 hello 你好",
                 "", " ", "zzz", "h" * 100, "<|unclosed", "a<|b|>c"]:
        data = text.encode("utf-8")
        assert nat.encode(data, bos=True) == py.encode(text, bos=True), text
        assert nat.encode(data, bos=False) == py.encode(text, bos=False), text


def test_tokenizer_parity_random():
    py, nat = _mk_tokenizer()
    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(0, 120))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert nat.encode(data, bos=True) == py.encode(data, bos=True), trial


def test_tokenizer_parity_real_vocab(model_path):
    tf = container.TensorFile(model_path)
    tok = Tokenizer.from_container(tf)  # native-backed when available
    assert tok._native is not None
    os.environ["CALM_TPU_NO_NATIVE"] = "1"
    try:
        pytok = Tokenizer.from_container(tf)
        assert pytok._native is None
    finally:
        del os.environ["CALM_TPU_NO_NATIVE"]
    for text in ["hello world", "the quick brown fox", "fill260<|eot|>"]:
        assert tok.encode(text, bos=True) == pytok.encode(text, bos=True)


# ---- sampler ----


def test_rng_parity():
    st = np.uint64(42)
    py = XorshiftRng(42)
    import ctypes
    lib = native._load()
    state = ctypes.c_uint64(42)
    for _ in range(100):
        v = lib.cn_rand64(ctypes.byref(state))
        want = py.next_u32()
        got = (v & 0xFFFFFFFFFFFFFFFF) >> 32
        assert got == want


def test_minp_parity():
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(4, 400))
        logits = rng.normal(0, 3, n).astype(np.float32)
        temp = float(rng.uniform(0.1, 1.5))
        minp = float(rng.uniform(0.01, 0.9))
        seed = int(rng.integers(1, 2**31))

        py = Sampler(n, seed=seed, temperature=temp, minp=minp)
        want = py.sample(logits.copy())

        got, _ = native.sample_minp(logits, temp, minp, seed if seed else 1)
        assert got == want, (trial, n, temp, minp)


def test_argmax_parity():
    lib = native._load()
    rng = np.random.default_rng(3)
    for _ in range(20):
        logits = rng.normal(0, 1, 100).astype(np.float32)
        import ctypes
        got = lib.cn_sample_argmax(
            logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 100)
        assert got == int(np.argmax(logits))
