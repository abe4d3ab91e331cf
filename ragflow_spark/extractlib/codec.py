"""Byte-encoding detection.

Reimplements the semantics of the reference ``find_codec``
(/root/reference/rag/nlp/__init__.py:53-71): the reference runs chardet on the
first 1 KiB but *only* uses the result for the "ascii -> utf-8" shortcut; the
actual decision is a deterministic cascade over a fixed codec list, trying the
1 KiB prefix first and then the whole blob.

Divergence (documented): the sandbox has no chardet. Pure-ASCII detection is
exact (all bytes < 0x80), which reproduces the only chardet-dependent branch
the reference actually acts on. Everything else is the same cascade in the
same order, so the chosen codec is identical for any blob the cascade decides.
"""

from __future__ import annotations

# Same candidate list and order as the reference (rag/nlp/__init__.py:32-51).
ALL_CODECS = [
    "utf-8", "gb2312", "gbk", "utf_16", "ascii", "big5", "big5hkscs",
    "cp037", "cp273", "cp424", "cp437",
    "cp500", "cp720", "cp737", "cp775", "cp850", "cp852", "cp855", "cp856",
    "cp857", "cp858", "cp860", "cp861", "cp862", "cp863", "cp864", "cp865",
    "cp866", "cp869", "cp874", "cp875", "cp932", "cp949", "cp950", "cp1006",
    "cp1026", "cp1125", "cp1140", "cp1250", "cp1251", "cp1252", "cp1253",
    "cp1254", "cp1255", "cp1256", "cp1257", "cp1258", "euc_jp",
    "euc_jis_2004", "euc_jisx0213", "euc_kr", "gb18030", "hz", "iso2022_jp",
    "iso2022_jp_1", "iso2022_jp_2", "iso2022_jp_2004", "iso2022_jp_3",
    "iso2022_jp_ext", "iso2022_kr", "latin_1", "iso8859_2", "iso8859_3",
    "iso8859_4", "iso8859_5", "iso8859_6", "iso8859_7", "iso8859_8",
    "iso8859_9", "iso8859_10", "iso8859_11", "iso8859_13", "iso8859_14",
    "iso8859_15", "iso8859_16", "johab", "koi8_r", "koi8_t", "koi8_u",
    "kz1048", "mac_cyrillic", "mac_greek", "mac_iceland", "mac_latin2",
    "mac_roman", "mac_turkish", "ptcp154", "shift_jis", "shift_jis_2004",
    "shift_jisx0213", "utf_32", "utf_32_be", "utf_32_le", "utf_16_be",
    "utf_16_le", "utf_7", "windows-1250", "windows-1251", "windows-1252",
    "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258", "latin-2",
]


def find_codec(blob: bytes) -> str:
    """Return the codec name used to decode ``blob``.

    Mirrors /root/reference/rag/nlp/__init__.py:53-71: ascii shortcut, then
    the fixed cascade (prefix first, whole blob second), utf-8 fallback.
    """
    head = blob[:1024]
    if head and head.isascii():  # all bytes < 0x80, C-speed
        # chardet would report ascii with confidence 1.0 -> reference
        # returns "utf-8" (rag/nlp/__init__.py:55-57).
        return "utf-8"

    for c in ALL_CODECS:
        try:
            head.decode(c)
            return c
        except Exception:
            pass
        try:
            blob.decode(c)
            return c
        except Exception:
            pass

    return "utf-8"


def decode_blob(blob: bytes) -> str:
    """binary -> str exactly as RAGFlowHtmlParser.__call__ does
    (/root/reference/deepdoc/parser/html_parser.py:31-37):
    ``blob.decode(find_codec(blob), errors="ignore")``.
    """
    return blob.decode(find_codec(blob), errors="ignore")
