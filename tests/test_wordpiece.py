"""WordPiece parity vs transformers.BertTokenizer (offline oracle).

The oracle is constructed from a synthetic vocab file — no downloads —
so this is a pure-function equivalence test of the tokenization pipeline
(basic tokenizer + greedy longest-match WordPiece)."""

import numpy as np
import pytest

from rag_application_tpu.models.wordpiece import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over "
    "lazy dog un ##believ ##able , . ! ? ' a b c d e f g h i j k l m n o p "
    "q r s t u v w x y z ##a ##b ##c ##d ##e ##f ##g ##h ##i ##j ##k ##l "
    "##m ##n ##o ##p ##q ##r ##s ##t ##u ##v ##w ##x ##y ##z 1 2 3 ##1 ##2 "
    "##3 hello world te ##st caf ##e 中 国"
).split()

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "unbelievable!!! really?",
    "Hello, World. test TEST te st",
    "café CAFÉ",          # accent stripping
    "中国 hello",          # CJK isolation
    "a-b_c'd",            # punctuation splits
    "   spaced\t\tout\n\nlines   ",
    "123 321 12q",
    "zzzzzzzzzzzzzzzzzzzzzzzzz qqq",
    "",
    "!@#$%^&*()",
]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return transformers.BertTokenizer(str(p), do_lower_case=True)


@pytest.fixture(scope="module")
def ours(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab2") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return WordPieceTokenizer.from_vocab_file(str(p))


@pytest.mark.parametrize("text", TEXTS)
def test_tokenize_matches_hf(oracle, ours, text):
    assert ours.tokenize(text) == oracle.tokenize(text)


@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_hf(oracle, ours, text):
    got = ours.encode(text, max_len=16)
    want = oracle.encode(text, truncation=True, max_length=16)
    assert got == want


def test_encode_batch_shapes(ours):
    ids, mask = ours.encode_batch(TEXTS[:4], max_len=12)
    assert ids.shape == mask.shape and ids.shape[0] == 4
    assert ids.dtype == np.int32 and mask.dtype == bool
    assert (ids[~mask] == ours.pad_id).all()
    # row 0 starts with [CLS] and its live span ends with [SEP]
    assert ids[0, 0] == ours.cls_id
    last = mask[0].sum() - 1
    assert ids[0, last] == ours.sep_id


def test_random_text_fuzz_vs_hf(oracle, ours):
    rng = np.random.default_rng(0)
    alphabet = list("abcdefghij ,.!?'-_ 123中国é ") + ["##", "ZZ"]
    for _ in range(200):
        n = rng.integers(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert ours.tokenize(text) == oracle.tokenize(text), repr(text)


def test_drives_bert_encoder(ours):
    """End-to-end: WordPiece ids through the JAX BERT tower."""
    import jax.numpy as jnp

    from rag_application_tpu.models.bert import BertEncoder

    enc = BertEncoder(vocab_size=len(VOCAB), hidden=32, num_layers=1, heads=4,
                      mlp_dim=64, max_len=16)
    ids, mask = ours.encode_batch(["the quick fox", "hello world"], max_len=16)
    import jax
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(mask))
    out = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------- native C path

EXTRA = TEXTS + [
    "x" * 150,                      # overlong word -> [UNK]
    "x" * 100,                      # exactly max_chars -> pieced
    "aa" * 400,                     # truncation at max_len
    "the [CLS] trick",              # bracket punctuation splits
    "tab\tnewline\nmix",
]


def test_native_matches_python_encode_batch(ours):
    from rag_application_tpu.native import wordpiece_lib

    if not wordpiece_lib.available():
        pytest.skip("no C compiler")
    py = WordPieceTokenizer(dict(ours.vocab), native=False)
    nat = WordPieceTokenizer(dict(ours.vocab), native=True)
    assert nat._native is not None
    for max_len in (6, 16, 64):
        ids_p, mask_p = py.encode_batch(EXTRA, max_len)
        ids_n, mask_n = nat.encode_batch(EXTRA, max_len)
        assert ids_p.shape == ids_n.shape
        np.testing.assert_array_equal(mask_p, mask_n)
        np.testing.assert_array_equal(ids_p, ids_n)


def test_native_fallback_rows(ours):
    from rag_application_tpu.native import wordpiece_lib

    if not wordpiece_lib.available():
        pytest.skip("no C compiler")
    nat = WordPieceTokenizer(dict(ours.vocab), native=True)
    texts = ["hello world", "café 中国", "the fox"]
    ids, mask = nat.encode_batch(texts, 16)
    py = WordPieceTokenizer(dict(ours.vocab), native=False)
    ids_p, mask_p = py.encode_batch(texts, 16)
    np.testing.assert_array_equal(ids, ids_p)
    np.testing.assert_array_equal(mask, mask_p)


def test_native_fuzz_ascii(ours):
    from rag_application_tpu.native import wordpiece_lib

    if not wordpiece_lib.available():
        pytest.skip("no C compiler")
    py = WordPieceTokenizer(dict(ours.vocab), native=False)
    nat = WordPieceTokenizer(dict(ours.vocab), native=True)
    rng = np.random.default_rng(1)
    chars = list("abcdefghijklmnopqrstuvwxyzABC  ,.!?'-_#[]()123\t\n")
    batch = []
    for _ in range(300):
        n = rng.integers(0, 60)
        batch.append("".join(rng.choice(chars) for _ in range(n)))
    ids_p, mask_p = py.encode_batch(batch, 32)
    ids_n, mask_n = nat.encode_batch(batch, 32)
    np.testing.assert_array_equal(ids_p, ids_n)
    np.testing.assert_array_equal(mask_p, mask_n)
