"""Tokenizer tests: BPE merge order, special tokens, byte fallback, round-trip
through container tensors."""

import numpy as np
import pytest

from calm_tpu.tokenizer import Tokenizer, tokenizer_bound


def make_vocab(extra=(), scores_map=None):
    """Small byte-level vocab: single printable chars + merges."""
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [bytes([c]) for c in range(ord("a"), ord("z") + 1)]
    pieces += [b" ", b"he", b"ll", b"hell", b"hello",
               b" w", b" wo", b" wor", b" worl", b" world"]
    pieces += list(extra)
    scores = np.zeros(len(pieces), dtype=np.float32)
    default = {b"he": -1, b"ll": -2, b"hell": -3, b"hello": -4,
               b" w": -5, b" wo": -6, b" wor": -7, b" worl": -8, b" world": -9}
    for piece, s in {**default, **(scores_map or {})}.items():
        scores[pieces.index(piece)] = s
    return Tokenizer(pieces, scores, bos_id=1, eos_id=2)


def test_basic_merge():
    t = make_vocab()
    ids = t.encode("hello world")
    assert [t.pieces[i] for i in ids] == [b"hello", b" world"]


def test_bos_eos():
    t = make_vocab()
    ids = t.encode("hello", bos=True, eos=True)
    assert ids[0] == t.bos_id and ids[-1] == t.eos_id
    assert [t.pieces[i] for i in ids[1:-1]] == [b"hello"]


def test_merge_priority():
    # higher score should merge first: give "ll" the best score and verify
    # "hello" still assembles (merge order changes, result may differ)
    t = make_vocab(scores_map={b"ll": -1, b"he": -2})
    ids = t.encode("hello")
    assert b"".join(t.pieces[i] for i in ids) == b"hello"


def test_special_tokens():
    t = make_vocab(extra=(b"<|eot_id|>",))
    assert t.eot_id == t.find(b"<|eot_id|>")
    ids = t.encode("hello<|eot_id|>world")
    assert t.eot_id in ids
    # the special token did not get split
    pieces = [t.pieces[i] for i in ids]
    assert b"<|eot_id|>" in pieces


def test_unknown_special_falls_through():
    t = make_vocab()
    ids = t.encode("<|nope|>")  # not in vocab: encoded char by char (< | not in vocab -> dropped)
    assert all(0 <= i < t.vocab_size for i in ids)


def test_byte_fallback():
    pieces = [b"<s>", b"</s>"] + [f"<0x{b:02X}>".encode() for b in range(256)]
    scores = np.zeros(len(pieces), dtype=np.float32)
    t = Tokenizer(pieces, scores, bos_id=0, eos_id=1)
    assert t.byte_fallbacks == 2
    ids = t.encode("hi")
    assert ids == [2 + ord("h"), 2 + ord("i")]
    assert t.decode(ids) == "hi"


def test_utf8_codepoint_grouping():
    pieces = [b"<s>", b"</s>", "é".encode("utf-8")] + [f"<0x{b:02X}>".encode() for b in range(256)]
    scores = np.zeros(len(pieces), dtype=np.float32)
    t = Tokenizer(pieces, scores, bos_id=0, eos_id=1)
    ids = t.encode("é")
    assert ids == [2]  # grouped as one codepoint, found in vocab
    ids = t.encode("ü")  # not in vocab: falls back to 2 bytes
    assert len(ids) == 2
    assert t.decode(ids) == "ü"


def test_decode_strips_space_after_bos():
    pieces = [b"<s>", b"</s>", b" hello", b"x"]
    t = Tokenizer(pieces, np.zeros(4, dtype=np.float32), bos_id=0, eos_id=1)
    assert t.decode_piece(0, 2) == b"hello"   # after BOS
    assert t.decode_piece(3, 2) == b" hello"  # elsewhere


def test_from_tensors_roundtrip():
    t = make_vocab()
    blob = b"".join(p + b"\0" for p in t.pieces)
    t2 = Tokenizer.from_tensors(np.frombuffer(blob, dtype=np.uint8),
                                t.scores, 1, 2, t.vocab_size)
    assert t2.encode("hello world") == t.encode("hello world")


def test_from_tensors_validation():
    with pytest.raises(ValueError):
        Tokenizer.from_tensors(np.frombuffer(b"a\0b", dtype=np.uint8),
                               np.zeros(2, np.float32), 0, 1, 2)  # no trailing NUL
    with pytest.raises(ValueError):
        Tokenizer.from_tensors(np.frombuffer(b"a\0b\0", dtype=np.uint8),
                               np.zeros(3, np.float32), 0, 1, 3)  # count mismatch


def test_bound():
    t = make_vocab()
    for text in ["hello world", "abc", "", "hello<|x|>"]:
        assert len(t.encode(text, bos=True)) <= tokenizer_bound(len(text.encode())) - 1
