import time

import numpy as np
import pytest

from rag_application_tpu import native
from rag_application_tpu.index.analyzer import Analyzer
from rag_application_tpu.index.native_analyzer import NativeAnalyzer, make_analyzer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")

TEXTS = [
    "The quick brown foxes are jumping over the lazy dogs!",
    "Sparse retrieval with BM25 ranking functions and fusion.",
    "Tokenization, stemming & stopword removal --- edge-cases 123.",
    "",
    "aaa",
    "UPPER lower MiXeD 42x x42",
    "information retrieval organizations nationalization",
]


def test_native_matches_python_token_streams():
    py = Analyzer()
    nat = NativeAnalyzer()
    for text in TEXTS:
        py_tokens = py.tokenize(text)
        nat_tokens = nat.tokenize(text)
        assert nat_tokens == py_tokens, (text, nat_tokens, py_tokens)


def test_native_vocab_ids_are_insertion_ordered():
    nat = NativeAnalyzer()
    ids1 = nat.encode("alpha beta gamma", grow=True)
    assert ids1 == [0, 1, 2]
    ids2 = nat.encode("beta delta", grow=True)
    assert ids2 == [1, 3]
    # grow=False drops unseen
    assert nat.encode("beta zeta", grow=False) == [1]
    assert len(nat) == 4


def test_native_vocab_roundtrip():
    nat = NativeAnalyzer()
    nat.encode("one two three", grow=True)
    vocab = nat.vocab
    nat2 = NativeAnalyzer()
    nat2.vocab = vocab
    assert nat2.encode("two three", grow=False) == nat.encode(
        "two three", grow=False)


def test_native_batch_encode():
    nat = NativeAnalyzer()
    flat, offsets = nat.encode_batch(["alpha beta", "beta gamma", ""],
                                     grow=True)
    assert offsets.tolist() == [0, 2, 4, 4]
    assert flat[:2].tolist() == [0, 1]
    assert flat[2:4].tolist() == [1, 2]


def test_native_unicode_and_long_tokens():
    py = Analyzer()
    nat = NativeAnalyzer()
    text = "café résumé " + "x" * 200 + " normal"
    # both treat non-ascii as separators; overlong tokens must not crash
    assert nat.encode(text, grow=True) is not None
    assert py.tokenize("normal") == ["normal"]


def test_native_is_faster_than_python():
    docs = [f"document number {i} about retrieval systems with boxes "
            f"and ranking functions token{i % 997}" for i in range(3000)]
    py = Analyzer()
    t0 = time.perf_counter()
    for d in docs:
        py.encode(d, grow=True)
    t_py = time.perf_counter() - t0

    nat = NativeAnalyzer()
    t0 = time.perf_counter()
    nat.encode_batch(docs, grow=True)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


def test_make_analyzer_fallback():
    a = make_analyzer(prefer_native=False)
    assert isinstance(a, Analyzer)
    b = make_analyzer()
    assert b.encode("hello world", grow=True) == [0, 1]
