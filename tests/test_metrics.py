from lipreading_tpu.metrics import cer, corpus_cer, edit_distance, wer


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0
    assert edit_distance(["a", "b"], ["b"]) == 1
    assert edit_distance(["a", "b"], ["c", "d"]) == 2


def test_cer_wer():
    assert cer("abc", "abc") == 0.0
    assert cer("abd", "abc") == 1 / 3
    assert wer("the cat", "the cat sat") == 1 / 3
    assert cer("", "") == 0.0
    assert wer("x", "") == 1.0


def test_corpus_metrics():
    assert corpus_cer(["ab", "cd"], ["ab", "ce"]) == 1 / 4
