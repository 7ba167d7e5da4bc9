"""Native C++ BPE engine vs the pure-Python implementation."""

import numpy as np
import pytest

from gill_tpu.native import get_bpe_engine
from gill_tpu.tokenizer import GPT2BPETokenizer, bytes_to_unicode


def _toy_tokenizer():
    b2u = bytes_to_unicode()
    a, b, c = b2u[ord("a")], b2u[ord("b")], b2u[ord("c")]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
             a: 4, b: 5, c: 6, a + b: 7, a + b + c: 8, b + c: 9}
    merges = [f"{a} {b}", f"{a+b} {c}", f"{b} {c}"]
    return vocab, merges


def test_native_matches_python():
    vocab, merges = _toy_tokenizer()
    tok_py = GPT2BPETokenizer(vocab, merges)
    tok_py._native = None  # force python path
    tok_nat = GPT2BPETokenizer(vocab, merges)
    if tok_nat._native is None:
        pytest.skip("no C++ toolchain")
    for s in ["abc", "ab", "ba", "abcabc", "cab", "aabbcc", "abab"]:
        py = tok_py.encode(s, add_special_tokens=False)
        tok_nat._id_cache.clear()
        nat = tok_nat.encode(s, add_special_tokens=False)
        assert py == nat, (s, py, nat)


def test_native_matches_python_random_merges():
    rng = np.random.RandomState(0)
    b2u = bytes_to_unicode()
    chars = [b2u[ord(ch)] for ch in "abcdefgh"]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in chars:
        vocab[ch] = len(vocab)
    merges = []
    symbols = list(chars)
    for _ in range(20):
        l, r = rng.choice(symbols, 2)
        if l + r not in vocab:
            vocab[l + r] = len(vocab)
            merges.append(f"{l} {r}")
            symbols.append(l + r)
    tok_py = GPT2BPETokenizer(dict(vocab), list(merges))
    tok_py._native = None
    tok_nat = GPT2BPETokenizer(dict(vocab), list(merges))
    if tok_nat._native is None:
        pytest.skip("no C++ toolchain")
    for _ in range(50):
        s = "".join(rng.choice(list("abcdefgh"), rng.randint(1, 24)))
        assert tok_py.encode(s, add_special_tokens=False) == \
            tok_nat.encode(s, add_special_tokens=False), s
