from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab, write_vocab


def test_decode_word_boundary_and_controls(tmp_path):
    vocab = ["<unk>", "<|startoftranscript|>", "▁hello", "▁world", "s", ",", "▁."]
    p = tmp_path / "vocab.txt"
    write_vocab(str(p), vocab)
    tok = Tokenizer.from_file(str(p))
    assert len(tok) == 7
    assert tok.blank_id == 7
    # controls skipped, ▁ -> space, leading space stripped, blank skipped
    assert tok.decode([1, 2, 3, 4, 7]) == "hello worlds"
    assert tok.decode([2, 5, 3]) == "hello, world"


def test_is_punct_only():
    assert Tokenizer.is_punct_only(",")
    assert Tokenizer.is_punct_only("▁.")
    assert Tokenizer.is_punct_only("!?")
    assert not Tokenizer.is_punct_only("▁hello")
    assert not Tokenizer.is_punct_only("a,")
    assert not Tokenizer.is_punct_only("▁")


def test_out_of_range_and_controls():
    tok = Tokenizer(["a", "<b>", "c"])
    assert tok.token_at(99) == ""
    assert tok.decode([0, 1, 2, 99]) == "ac"


def test_synthetic_vocab_layout():
    v = make_synthetic_vocab(64)
    assert len(v) == 64
    assert "<|startoftranscript|>" in v
    assert "<|en|>" in v
    assert len(set(v)) == 64
    tok = Tokenizer(v)
    assert tok.token_id("<|startoftranscript|>") >= 0


def test_encode_roundtrip_and_greedy():
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    tok = Tokenizer(make_synthetic_vocab(64))
    # decode of arbitrary non-control ids -> text; re-encoding must decode
    # back to the same text (ids may differ: greedy vs original path)
    import numpy as np
    rng = np.random.default_rng(0)
    ctrl = [i for i, t in enumerate(tok.vocab) if Tokenizer.is_control(t)]
    ids = [int(i) for i in rng.integers(0, len(tok.vocab), 12)
           if i not in ctrl]
    text = tok.decode(ids)
    assert text
    assert tok.decode(tok.encode(text)) == text
    # longest-match: "▁aa" and "▁a" both exist in the synthetic vocab; a
    # word "aa" must encode to the single longer piece, not ▁a + a-piece
    assert tok.token_id("▁aa") >= 0 and tok.token_id("▁a") >= 0
    assert tok.encode("aa") == [tok.token_id("▁aa")]
    # duplicated vocab lines encode to the FIRST (canonical) id
    dup = Tokenizer(["<unk>", "▁x", "▁x"], blank_id=3)
    assert dup.encode("x") == [1]
    # unrepresentable characters fall back to <unk> (present in synthetic)
    unk = tok.token_id("<unk>")
    enc2 = tok.encode("@@@")
    assert all(e == unk for e in enc2 if tok.token_at(e) == "<unk>")
    assert unk in enc2
