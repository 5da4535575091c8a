"""Cross-implementation parity: our CLIP BPE vs transformers' CLIPTokenizer
over a shared on-disk vocab (no downloads). Oracle for the BPE merge loop,
whitespace/lowercase handling, special tokens, padding and added tokens."""

import json

import pytest

transformers = pytest.importorskip("transformers")

from lora_tpu.data.tokenizer import BOS, EOS, CLIPTokenizer


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    chars = list("abcdefghilmnoprstuwy")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = ["h e", "l l", "ll o</w>", "he llo</w>", "w o", "wo r",
              "l d</w>", "wor ld</w>", "t h", "th e</w>", "d o", "do g</w>",
              "c a", "ca t</w>", "a</w> b</w>"]
    for m in merges:
        a, b = m.split()
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)
    vp = d / "vocab.json"
    mp = d / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vp), str(mp)


@pytest.fixture(scope="module")
def pair(vocab_files):
    vp, mp = vocab_files
    hf = transformers.CLIPTokenizer(vp, mp, model_max_length=16)
    ours = CLIPTokenizer.from_files(vp, mp, model_max_length=16)
    return hf, ours


@pytest.mark.parametrize("text", [
    "hello world",
    "the dog",
    "cat  hello   THE WORLD",
    "do g gg",
    "abc",
    "",
])
def test_encode_matches_hf(pair, text):
    hf, ours = pair
    ref = hf(text, padding="max_length", truncation=True,
             max_length=16)["input_ids"]
    got = ours([text], max_length=16)["input_ids"][0]
    assert got == ref, (text, got, ref)


def test_added_tokens_match_hf(pair):
    hf, ours = pair
    assert hf.add_tokens("<s1>") == ours.add_tokens("<s1>") == 1
    assert (hf.convert_tokens_to_ids("<s1>")
            == ours.convert_tokens_to_ids("<s1>"))
    text = "hello <s1> world"
    ref = hf(text, padding="max_length", truncation=True,
             max_length=16)["input_ids"]
    got = ours([text], max_length=16)["input_ids"][0]
    assert got == ref
