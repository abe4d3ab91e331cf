"""find_codec cascade semantics (reference rag/nlp/__init__.py:53-71)."""

from ragflow_spark.extractlib.codec import decode_blob, find_codec


def test_pure_ascii_maps_to_utf8():
    assert find_codec(b"<html>hello</html>") == "utf-8"


def test_utf8_cjk():
    blob = "<title>文档</title>".encode("utf-8")
    assert find_codec(blob) == "utf-8"
    assert decode_blob(blob) == "<title>文档</title>"


def test_gbk_detected_as_gb2312_subset():
    txt = "<title>文档 42</title><p>plain ascii body</p>"
    blob = txt.encode("gbk")
    # gb2312 precedes gbk in the cascade and covers these chars
    assert find_codec(blob) == "gb2312"
    assert decode_blob(blob) == txt


def test_utf16_bom():
    txt = "<title>文档</title>" + "x" * 2000  # force >1KiB prefix path
    blob = txt.encode("utf-16")
    assert find_codec(blob) == "utf_16"
    assert decode_blob(blob) == txt


def test_prefix_truncation_mid_multibyte_falls_to_whole_blob():
    # craft: 1023 ascii bytes then a 2-byte gbk char -> prefix cuts the
    # pair; whole-blob decode succeeds
    txt = "a" * 1023 + "文"
    blob = txt.encode("gbk")
    codec = find_codec(blob)
    assert blob.decode(codec) == txt
