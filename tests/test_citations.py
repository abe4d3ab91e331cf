"""insert_citations (extractlib/citations.py) vs the reference
semantics at rag/nlp/search.py:163-250."""

from ragflow_spark.extractlib.citations import insert_citations, split_pieces


def _unit(i, dim=4):
    v = [0.0] * dim
    v[i % dim] = 1.0
    return v


def test_split_pieces_sentence_boundaries():
    # the separator's first char reattaches to its sentence; the
    # leftover '. ' survives as a sub-5-char piece that citation
    # scoring skips but assembly keeps (reference parity verified
    # against a verbatim run of search.py:189-193)
    out = split_pieces("alpha beats beta. gamma wins delta.")
    assert out == ["alpha beats beta", ". ", "gamma wins delta."]
    assert "".join(out) == "alpha beats beta. gamma wins delta."


def test_split_pieces_keeps_code_fences_whole():
    ans = "before text. ```code block. with dots``` after text."
    out = [p for p in split_pieces(ans) if p]
    assert any(p.startswith("```code block") and p.endswith("```\n")
               for p in out)


def test_insert_citations_marks_best_chunk():
    chunks = ["fast query merge scan", "spark stream window row"]
    chunk_v = [_unit(0), _unit(1)]
    res, seted = insert_citations(
        "the fast query merges the scan table",
        chunks, chunk_v, encode=lambda texts: [_unit(0)] * len(texts))
    assert seted == {"0"}
    assert res.endswith(" ##0$$")


def test_insert_citations_below_threshold_cites_nothing():
    chunks = ["fast query merge scan"]
    chunk_v = [_unit(0)]
    # orthogonal vector + zero token overlap -> sim never reaches 0.32
    res, seted = insert_citations(
        "completely unrelated giraffe painting",
        chunks, chunk_v, encode=lambda texts: [_unit(1)] * len(texts))
    assert seted == set()
    assert "##" not in res


def test_insert_citations_dedups_across_pieces():
    chunks = ["fast query merge scan"]
    chunk_v = [_unit(0)]
    ans = "the fast query merges scans. the fast query merges again."
    res, seted = insert_citations(
        ans, chunks, chunk_v,
        encode=lambda texts: [_unit(0)] * len(texts))
    # both pieces match chunk 0; the marker appears exactly once
    assert seted == {"0"}
    assert res.count("##0$$") == 1


def test_insert_citations_empty_chunks_passthrough():
    res, seted = insert_citations("whatever answer.", [], [],
                                  encode=lambda t: [])
    assert res == "whatever answer." and seted == set()


def test_insert_citations_dim_mismatch_zeroes_chunk():
    chunks = ["fast query merge scan", "spark stream window row"]
    chunk_v = [_unit(0, dim=4), _unit(1, dim=8)]  # second wrong dim
    res, seted = insert_citations(
        "the fast query merges the scan table",
        chunks, chunk_v, encode=lambda texts: [_unit(0)] * len(texts))
    assert seted == {"0"}
