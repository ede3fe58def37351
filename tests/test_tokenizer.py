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
