"""Official xxHash64 test vectors (xxHash spec, seed 0)."""

from ragflow_spark.extractlib.xxh64 import chunk_id, xxh64_hexdigest


def test_official_vectors():
    assert xxh64_hexdigest(b"") == "ef46db3751d8e999"
    assert xxh64_hexdigest(b"a") == "d24ec4f1a98c6e5b"
    assert xxh64_hexdigest(b"abc") == "44bc2cf5ad770999"
    assert xxh64_hexdigest(b"as") == "1c330fb2d66be179"
    assert (xxh64_hexdigest(b"Call me Ishmael. Some years ago--never mind "
                            b"how long precisely-")
            == "02a2e85470d6fd96")


def test_long_inputs_cover_all_tail_paths():
    for n in range(0, 70):
        a = xxh64_hexdigest(b"x" * n)
        b = xxh64_hexdigest(b"x" * n)
        assert a == b and len(a) == 16


def test_chunk_id_matches_reference_formula():
    # task_executor.py:266: xxh64(content + doc_key) over utf-8 bytes
    cid = chunk_id("chunk text", "https://host0.example.com/doc/1")
    assert cid == xxh64_hexdigest(
        "chunk texthttps://host0.example.com/doc/1".encode()
    )
