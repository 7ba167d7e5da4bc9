import os

import numpy as np

from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer


def test_tiny_roundtrip():
    tok = GPT2BPETokenizer.tiny()
    s = "hello world!\nA picture of a dog."
    ids = tok.encode(s, add_special_tokens=False)
    assert tok.decode(ids) == s
    ids_bos = tok.encode(s, add_special_tokens=True)
    assert ids_bos[0] == tok.bos_token_id == 2
    assert tok.decode(ids_bos, skip_special_tokens=True) == s


def test_special_token_layout():
    tok = GPT2BPETokenizer.tiny()
    assert tok.pad_token_id == 1
    assert tok.eos_token_id == 2
    assert tok.bos_token_id == 2


def test_img_token_registration():
    tok = GPT2BPETokenizer.tiny()
    base = len(tok)
    img_ids = setup_gill_tokenizer(tok, num_tokens=8)
    # <|image|> then [IMG0..7]
    assert tok.cls_token_id == base
    assert img_ids == list(range(base + 1, base + 9))
    assert len(tok) == base + 9
    # added tokens round-trip and tokenize to single ids
    enc = tok.encode("a dog[IMG0][IMG1]", add_special_tokens=False)
    assert enc[-2:] == img_ids[:2]
    assert tok.decode(enc) == "a dog[IMG0][IMG1]"
    # skip_special_tokens drops <|image|> but keeps [IMG] (they are plain
    # added tokens, matching HF behavior in the reference demo).
    enc2 = tok.encode("<|image|>x[IMG0]", add_special_tokens=False)
    assert tok.decode(enc2, skip_special_tokens=True) == "x[IMG0]"


def test_padding_truncation():
    tok = GPT2BPETokenizer.tiny()
    out = tok(["abc", "a"], padding="max_length", truncation=True,
              max_length=6, return_tensors="np")
    assert out.input_ids.shape == (2, 6)
    assert out.attention_mask.sum(axis=1).tolist() == [4, 2]
    assert out.input_ids[1, -1] == tok.pad_token_id


def test_bpe_merges():
    # Tiny custom vocab with one merge: "ab" merged.
    b2u = __import__("gill_tpu.tokenizer", fromlist=["bytes_to_unicode"]).bytes_to_unicode()
    a, b = b2u[ord("a")], b2u[ord("b")]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, a: 4, b: 5, a + b: 6}
    tok = GPT2BPETokenizer(vocab, merges=[f"{a} {b}"])
    assert tok.encode("ab", add_special_tokens=False) == [6]
    assert tok.encode("ba", add_special_tokens=False) == [5, 4]
    assert tok.decode([6, 5]) == "abb"


# Edge-case battery for HF-exactness: contractions, runs of spaces,
# leading/trailing whitespace, newlines/tabs, unicode/multi-byte, emoji,
# digits, punctuation clusters, merge-chain words from the fixture corpus.
HF_PARITY_STRINGS = [
    "Hello world", "A picture of a dog.", "unbelievable  spacing\n",
    "don't can't we're I'll it's you've I'm he'd",
    "   leading and trailing   ", "tabs\there\tand\nnewlines\n\n",
    "numbers 1234 42 3.14159", "punct?! (yes; really...) \"quoted\"",
    "café naïve 北京 Москва 🙂", "CamelCaseWords snake_case kebab-case",
    "the picture of the image generation retrieval",
    "Q: show me a photo of a cat\nA:", "",
    "a", " ", "  ", "\n", "ÿ\x00mixed\x7fbytes",
]


def test_matches_hf_gpt2_on_fixture():
    """HF-exactness against transformers' real GPT2Tokenizer implementation
    loading the committed byte-level BPE fixture (runs everywhere — no
    network; fixture built by scripts/make_tokenizer_fixture.py with the
    standard BPE training algorithm). The reference gets AutoTokenizer for
    free (main.py:255); this pins our from-scratch encoder to the same
    algorithm HF executes."""
    import pytest

    transformers = pytest.importorskip("transformers")
    d = os.path.join(os.path.dirname(__file__), "fixtures", "tok")
    hf = transformers.GPT2Tokenizer(
        vocab_file=os.path.join(d, "vocab.json"),
        merges_file=os.path.join(d, "merges.txt"))
    ours = GPT2BPETokenizer.from_files(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"),
        bos_token="<|endoftext|>", eos_token="<|endoftext|>",
        unk_token="<|endoftext|>", pad_token=None)
    for s in HF_PARITY_STRINGS:
        assert ours.encode(s, add_special_tokens=False) == hf.encode(s), s
        if "\x00" not in s and "\x7f" not in s:
            assert ours.decode(
                ours.encode(s, add_special_tokens=False)) == s, s


def test_matches_hf_gpt2_when_available():
    """Same parity against the REAL gpt2/OPT assets when present locally
    (auto-activates outside the zero-egress CI image)."""
    try:
        from transformers import GPT2Tokenizer

        hf = GPT2Tokenizer.from_pretrained("gpt2")
    except Exception:
        import pytest

        pytest.skip("no local HF gpt2 tokenizer assets")
    ours = GPT2BPETokenizer(hf.encoder, [" ".join(m) for m in hf.bpe_ranks])
    for s in HF_PARITY_STRINGS:
        assert ours.encode(s, add_special_tokens=False) == hf.encode(s)
