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
