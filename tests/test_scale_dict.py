"""Tokenizer + Dealer machinery at production vocabulary scale.

The embedded mini-dictionary proves rule correctness; these tests load
the generated 50k-entry dictionary (the reference's huqie.txt size
class — its real file is a runtime download, not in the repo) plus
ner/df tables at the reference's entry counts, and golden-pin the
bidirectional max-match + DFS reconciliation and the Dealer idf blend
at that density.  The generator is LCG-seeded, so the golden strings
are bit-stable.
"""

import pytest

from ragflow_spark.extractlib.huqie import HuqieTokenizer
from ragflow_spark.extractlib.scale_dict import (dict_words,
                                                 generate_df_table,
                                                 generate_huqie_dict,
                                                 generate_ner_table,
                                                 generate_synonyms)
from ragflow_spark.extractlib.termweight import TermWeightDealer


@pytest.fixture(scope="module")
def big():
    text = generate_huqie_dict()
    return text, HuqieTokenizer(dict_text=text)


def test_dict_scale_and_trie_roundtrip(big):
    text, tok = big
    lines = text.splitlines()
    assert len(lines) == 50000
    # freq round-trips through the log fold for a sample of entries;
    # tags come from SOME entry of the word (duplicate generated words
    # resolve highest-frequency-wins, the load_dict rule)
    from ragflow_spark.extractlib.scale_dict import TAGS
    for line in lines[:: 5000]:
        word, freq, tag = line.split()
        assert tok.freq(word) > 0
        assert tok.tag(word) in TAGS


def test_tokenize_golden_at_scale(big):
    text, tok = big
    ws = dict_words(text, 8)
    sent_cjk = "".join(w for w in ws if not w[0].isascii())
    out = tok.tokenize(sent_cjk)
    # golden: every sampled dictionary word recovered from the
    # unsegmented concatenation, in order
    assert out == ("槥镔彣寞 鐅晊媙熲 "
                   "頷沆堃拴 漛廢 "
                   "毞泃袾叕 煊鑥腺 "
                   "鮏鑌髭")
    assert tok.tokenize("ethloqu") == "ethloqu"


def test_tokenize_ambiguous_overlap_deterministic(big):
    text, tok = big
    # find an overlap pair: 2-char words x, y whose junction chars
    # also form an entry — the DFS has competing segmentations
    two = [ln.split()[0] for ln in text.splitlines()
           if len(ln.split()[0]) == 2 and not ln.split()[0][0].isascii()]
    vocab = set(two)
    pair = None
    for x in two[:400]:
        for y in two[:400]:
            if x[1] + y[0] in vocab and x != y:
                pair = (x, y)
                break
        if pair:
            break
    assert pair, "generated dict has no overlap pair in sample"
    s = pair[0] + pair[1]
    out1 = tok.tokenize(s)
    out2 = tok.tokenize(s)
    assert out1 == out2                       # deterministic
    assert "".join(out1.split()) == s         # lossless segmentation


def test_dealer_weights_golden_at_scale(big):
    text, tok = big
    dealer = TermWeightDealer(ne=generate_ner_table(),
                              df=generate_df_table(), tokenizer=tok)
    ws = dict_words(text, 8)
    sent_cjk = "".join(w for w in ws if not w[0].isascii())
    out = dealer.weights(tok.tokenize(sent_cjk).split())
    got = [(t, round(w, 6)) for t, w in out]
    assert got == [
        ("槥镔彣寞", 0.149482),
        ("鐅晊媙熲", 0.224223),
        ("頷沆堃拴", 0.074741),
        ("漛廢", 0.077017),
        ("毞泃袾叕", 0.023105),
        ("煊鑥腺", 0.224223),
        ("鮏鑌髭", 0.227209),
    ]
    # weights normalize to 1 over the query
    assert abs(sum(w for _t, w in out) - 1.0) < 1e-6


def test_synonyms_scale():
    from ragflow_spark.extractlib.synonyms import SynonymDealer

    syn = generate_synonyms()
    dealer = SynonymDealer(dictionary=syn)
    assert len(syn) == 10000
    k = next(iter(syn))
    assert dealer.lookup(k) == syn[k].split()
