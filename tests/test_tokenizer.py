import os

from voxtral_tpu.tokenizer import Tokenizer, make_test_tokenizer_json


def test_tokenizer_decode(tmp_path):
    path = os.path.join(tmp_path, "tekken.json")
    make_test_tokenizer_json(path, vocab_size=200)
    tok = Tokenizer(path)
    assert tok.n_special == 100
    assert tok.vocab_size == 300
    # specials decode to nothing
    assert tok.decode_piece(1) == ""
    assert tok.decode_piece(2) == ""
    # vocab id 0 -> first printable byte (space)
    assert tok.decode_piece(100) == " "
    assert tok.decode([100, 101, 102]) == " !\""
    # specials skipped inside sequences
    assert tok.decode([1, 100, 2, 101]) == " !"
    assert not tok.is_text(1)
    assert tok.is_text(100)
    # out of range ids are inert
    assert tok.decode_piece(10_000) == ""


def test_stream_decoder_split_utf8(tmp_path):
    """A UTF-8 character split across two tokens must decode correctly in
    the streaming path (the reference CLI writes raw token bytes, so the
    terminal concatenates them; decode_piece per token would emit U+FFFD)."""
    import base64
    import json

    from voxtral_tpu.tokenizer import Tokenizer
    vocab = [
        {"rank": 0, "token_bytes": base64.b64encode(b"caf").decode()},
        {"rank": 1, "token_bytes": base64.b64encode(b"\xc3").decode()},
        {"rank": 2, "token_bytes": base64.b64encode(b"\xa9").decode()},
    ]
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps({
        "config": {"default_num_special_tokens": 100},
        "special_tokens": [], "vocab": vocab}))
    tok = Tokenizer(str(p))
    ids = [100, 101, 102]
    assert tok.decode(ids) == "café"
    # per-token lossy decode corrupts the split character...
    assert "�" in "".join(tok.decode_piece(i) for i in ids)
    # ...the incremental stream decoder does not
    sd = tok.stream_decoder()
    assert "".join(sd.piece(i) for i in ids) + sd.flush() == "café"
    # dangling half character at stream end -> replacement char on flush
    sd2 = tok.stream_decoder()
    assert sd2.piece(101) == ""
    assert sd2.flush() == "�"
