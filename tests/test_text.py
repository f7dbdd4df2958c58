import numpy as np

from lipreading_tpu.text import DEFAULT_VOCAB, Vocab, normalize_text


def test_normalize():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("  it's   ME ") == "it's me"
    assert normalize_text("[Music]#$%") == "music"


def test_vocab_roundtrip():
    v = DEFAULT_VOCAB
    s = "the quick brown's fox"
    ids = v.encode(s)
    assert v.decode(ids) == s
    assert ids.dtype == np.int32
    assert v.size == 31


def test_encode_target_framing():
    v = Vocab()
    ids, n = v.encode_target("ab", max_len=8)
    assert list(ids[:4]) == [v.sos_id, v.encode("a")[0], v.encode("b")[0], v.eos_id]
    assert n == 4
    assert all(i == v.pad_id for i in ids[4:])
    assert v.decode(ids) == "ab"


def test_ctc_greedy_collapse():
    v = Vocab()
    a = int(v.encode("a")[0])
    b = int(v.encode("b")[0])
    blank = v.blank_id
    assert v.decode_ctc_greedy([blank, a, a, blank, a, b, b, blank]) == "aab"
    assert v.decode_ctc_greedy([blank, blank]) == ""
