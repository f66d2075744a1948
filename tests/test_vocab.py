from ctc_pytorch_tpu.vocab import Vocab, build_units


def test_vocab_index_contract(tmp_path):
    # blank=0, UNK=1, file order after (timit/utils/data_loader.py:13-47)
    p = tmp_path / "units"
    p.write_text("aa\nae\nah\n")
    v = Vocab(p)
    assert v.word2index["blank"] == 0
    assert v.word2index["UNK"] == 1
    assert v.word2index["aa"] == 2
    assert v.word2index["ae"] == 3
    assert v.n_words == 5
    assert v.encode("aa zz ah") == [2, 1, 4]  # OOV -> UNK
    assert v.decode([2, 3]) == ["aa", "ae"]


def test_build_units(tmp_path):
    lab = tmp_path / "phn_text"
    lab.write_text("utt1 b a c\nutt2 a d\n")
    out = tmp_path / "units"
    v = build_units([lab], out)
    # sorted unique, like steps/get_model_units.py
    assert out.read_text().splitlines() == ["a", "b", "c", "d"]
    assert v.word2index["a"] == 2
    assert len(v) == 6
