"""Container (.calm safetensors) reader/writer tests, including the
validation surface that the reference fuzzes (malformed headers must raise
ContainerError, never crash or half-load)."""

import json

import numpy as np
import ml_dtypes
import pytest

from calm_tpu import container
from calm_tpu.config import ModelConfig


def write_sample(tmp_path, metadata=None):
    t = {
        "model.embed.weight": np.arange(24, dtype=np.float16).reshape(4, 6),
        "model.norm.weight": np.ones(6, dtype=np.float32),
        "tokenizer.tokens": np.frombuffer(b"a\0b\0c\0d\0", dtype=np.uint8),
    }
    path = str(tmp_path / "m.calm")
    container.write_tensors(path, t, metadata or {"dim": "6", "n_layers": "1"})
    return path, t


def test_roundtrip(tmp_path):
    path, tensors = write_sample(tmp_path)
    tf = container.TensorFile(path)
    assert tf.metadata["dim"] == "6"
    for name, arr in tensors.items():
        got = tf.get(name, dtype=arr.dtype, shape=arr.shape)
        np.testing.assert_array_equal(got, arr)


def test_alignment(tmp_path):
    path, _ = write_sample(tmp_path)
    tf = container.TensorFile(path)
    assert tf._data_off % container.ALIGN == 0


def test_get_validation(tmp_path):
    path, _ = write_sample(tmp_path)
    tf = container.TensorFile(path)
    with pytest.raises(container.ContainerError):
        tf.get("model.embed.weight", dtype=np.float32)  # wrong dtype
    with pytest.raises(container.ContainerError):
        tf.get("model.embed.weight", shape=(4, 7))      # wrong shape
    with pytest.raises(container.ContainerError):
        tf.get("nonexistent")
    assert tf.find("nonexistent") is None
    assert tf.find("model.layers.%d.foo", 3) is None


def test_layer_formatting(tmp_path):
    t = {"model.layers.2.attn.norm.weight": np.ones(4, dtype=np.float32)}
    path = str(tmp_path / "m.calm")
    container.write_tensors(path, t, {})
    tf = container.TensorFile(path)
    got = tf.get("model.layers.%d.attn.norm.weight", 2, np.float32, (4,))
    np.testing.assert_array_equal(got, t["model.layers.2.attn.norm.weight"])


def test_fp8_and_gf4_dtypes(tmp_path):
    t = {
        "w8": np.zeros((2, 8), dtype=ml_dtypes.float8_e5m2),
        "w4": np.zeros((2, 2), dtype=np.int32),
    }
    path = str(tmp_path / "m.calm")
    container.write_tensors(path, t, {})
    tf = container.TensorFile(path)
    assert tf.get("w8").dtype == np.dtype(ml_dtypes.float8_e5m2)
    assert tf.get("w4").dtype == np.int32


def test_count_bytes(tmp_path):
    t = {
        "model.w4": np.zeros((4, 2), dtype=np.int32),     # 8 words -> 64 params
        "model.w16": np.zeros((4, 4), dtype=np.float16),  # 16 params
        "tokenizer.tokens": np.zeros(3, dtype=np.uint8),
    }
    path = str(tmp_path / "m.calm")
    container.write_tensors(path, t, {})
    tf = container.TensorFile(path)
    nbytes, params = tf.count_bytes("model.")
    assert params == 64 + 16
    assert nbytes == 8 * 4 + 16 * 2


def test_memmap_slicing_is_shard_read(tmp_path):
    """get() views the memmap zero-copy; slicing a view materializes only
    the slice — the primitive load_weights_sharded's WeightDescs use for
    per-host shard reads."""
    t = {"w": np.arange(64, dtype=np.float16).reshape(8, 8)}
    path = str(tmp_path / "m.calm")
    container.write_tensors(path, t, {})
    tf = container.TensorFile(path)
    view = tf.get("w")
    assert isinstance(view, np.memmap) or view.base is not None  # zero-copy
    np.testing.assert_array_equal(np.ascontiguousarray(view[2:4]), t["w"][2:4])
    np.testing.assert_array_equal(np.ascontiguousarray(view[:, 6:8]),
                                  t["w"][:, 6:8])


@pytest.mark.parametrize("mutate", [
    lambda h, d: (h[:4], d),                               # truncated header len
    lambda h, d: (b"\xff" * 8 + h[8:], d),                 # absurd header size
    lambda h, d: (h, d[: len(d) // 2]),                    # truncated data
])
def test_malformed_files(tmp_path, mutate):
    path, _ = write_sample(tmp_path)
    raw = open(path, "rb").read()
    hsize = int.from_bytes(raw[:8], "little")
    header, data = raw[: 8 + hsize], raw[8 + hsize :]
    header, data = mutate(header, data)
    bad = str(tmp_path / "bad.calm")
    with open(bad, "wb") as f:
        f.write(header + data)
    with pytest.raises(container.ContainerError):
        container.TensorFile(bad)


def test_malformed_header_json(tmp_path):
    hjson = b'{"t": {"dtype": "F32", "shape": [4], "data_offsets": [0, 99]}}'
    hjson += b" " * (-(len(hjson) + 8) % 256)
    bad = str(tmp_path / "bad.calm")
    with open(bad, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        f.write(b"\0" * 16)  # not enough data for claimed offsets
    with pytest.raises(container.ContainerError):
        container.TensorFile(bad)


def test_overflow_shape(tmp_path):
    hdr = {"t": {"dtype": "F32", "shape": [2**40, 2**40], "data_offsets": [0, 16]}}
    hjson = json.dumps(hdr).encode()
    hjson += b" " * (-(len(hjson) + 8) % 256)
    bad = str(tmp_path / "bad.calm")
    with open(bad, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        f.write(b"\0" * 16)
    with pytest.raises(container.ContainerError):
        container.TensorFile(bad)


def test_config_metadata_roundtrip():
    cfg = ModelConfig(dim=64, hidden_dim=128, head_dim=16, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=100, seq_len=256,
                      rope_theta=1e6, rotary_dim=16, norm_eps=1e-6,
                      norm_ln=False, dtype="fp8", bos_token_id=1, eos_token_id=2)
    md = cfg.to_metadata()
    assert all(isinstance(v, str) for v in md.values())
    cfg2 = ModelConfig.from_metadata(md)
    assert cfg2.dim == 64 and cfg2.seq_len == 256 and cfg2.dtype == "fp8"
    assert cfg2.rope_theta == 1e6 and not cfg2.norm_ln


def test_config_seq_len_clamp():
    md = {"dim": "8", "hidden_dim": "16", "n_layers": "1", "n_heads": "2",
          "n_kv_heads": "2", "vocab_size": "10", "head_dim": "4",
          "max_seq_len": "131072"}
    assert ModelConfig.from_metadata(md).seq_len == 4096      # clamped
    assert ModelConfig.from_metadata(md, context=8192).seq_len == 8192
    md["max_seq_len"] = "2048"
    assert ModelConfig.from_metadata(md).seq_len == 2048      # model max kept


def test_parser_mutation_fuzz(tmp_path):
    """Python-side mini-fuzz (complements the ASan'd C++ fuzzer): random
    byte mutations of a valid container must either parse or raise
    ContainerError — never crash, never mis-load."""
    import random

    from calm_tpu.container import ContainerError, TensorFile, write_tensors

    path = str(tmp_path / "seed.calm")
    write_tensors(path, {"a": np.arange(64, dtype=np.float32).reshape(8, 8),
                         "b.scale": np.ones(1, np.float32)},
                  {"arch": "llama", "dim": "8"})
    seed = open(path, "rb").read()

    rng = random.Random(1234)
    for _ in range(3000):
        buf = bytearray(seed)
        for _ in range(rng.randint(1, 8)):
            op = rng.random()
            if op < 0.6:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.8 and len(buf) > 16:
                del buf[rng.randrange(len(buf) - 8):][:rng.randint(1, 64)]
            else:
                pos = rng.randrange(len(buf))
                buf[pos:pos] = bytes(rng.randrange(256)
                                     for _ in range(rng.randint(1, 16)))
        p = str(tmp_path / "mut.calm")
        with open(p, "wb") as f:
            f.write(buf)
        try:
            tf = TensorFile(p)
            for name in tf.names():
                np.asarray(tf.get(name)).sum()  # touch every byte
        except ContainerError:
            pass  # rejected cleanly
