"""Legacy PowerPoint 97-2003 ``.ppt`` text extraction — from scratch.

A beyond-reference extension: the reference's presentation template
dispatches ``\\.pptx?$`` (``rag/app/presentation.py:108``) but feeds the
bytes to python-pptx, which rejects the legacy binary container — so a
reference user with ``.ppt`` decks simply crashes.  We extract the
deterministic text layer directly from the public [MS-PPT]
specification so the presentation template (one chunk per slide) also
covers the legacy container:

* the ``PowerPoint Document`` stream is a tree of 8-byte-headed
  records (``recVer``/``recInstance``, ``recType``, ``recLen``);
  ``recVer == 0xF`` marks a container holding child records;
* ``SlideListWithText`` (0x0FF0) interleaves one ``SlidePersistAtom``
  (0x03F3) per slide with that slide's text atoms;
* ``TextCharsAtom`` (0x0FA0) is UTF-16LE text, ``TextBytesAtom``
  (0x0FA8) one byte per char over the same Windows-1252-style map the
  ``.doc`` compressed pieces use; the PPT paragraph mark ``\\r`` and
  line break ``\\x0b`` both fold to ``\\n``.

The slide text shape mirrors ``RAGFlowPptParser`` on PPTX
(``deepdoc/parser/ppt_parser.py:61-79``): text blocks of one slide
joined by newlines, one chunk per slide downstream.
"""

from __future__ import annotations

import struct

from ragflow_spark.extractlib.cfb import CfbError, build_cfb, read_cfb
from ragflow_spark.extractlib.docparse import _COMPRESSED_TRANS

RT_DOCUMENT = 0x03E8
RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
RT_SLIDE_PERSIST_ATOM = 0x03F3
RT_TEXT_HEADER_ATOM = 0x0F9F
RT_TEXT_CHARS_ATOM = 0x0FA0
RT_TEXT_BYTES_ATOM = 0x0FA8

_PPT_TRANS = str.maketrans({"\r": "\n", "\x0b": "\n", "\x00": None})


class PptError(ValueError):
    """Not a PowerPoint binary, or a malformed one."""


def _walk(data: bytes, off: int, end: int, slides: list[list[str]],
          depth: int = 0):
    if depth > 64:
        # hostile nesting: a crafted file with thousands of nested
        # containers must degrade as a PptError (caught upstream),
        # never a RecursionError that escapes the handler
        raise PptError("container nesting too deep")
    while off + 8 <= end:
        ver_inst, rectype, reclen = struct.unpack_from("<HHI", data, off)
        off += 8
        if off + reclen > end:
            raise PptError("record overruns its container")
        if (ver_inst & 0x000F) == 0x000F:
            _walk(data, off, off + reclen, slides, depth + 1)
        elif rectype == RT_SLIDE_PERSIST_ATOM:
            slides.append([])
        elif rectype == RT_TEXT_CHARS_ATOM:
            txt = data[off:off + reclen].decode("utf-16-le", "replace")
            if slides:
                slides[-1].append(txt.translate(_PPT_TRANS))
        elif rectype == RT_TEXT_BYTES_ATOM:
            txt = data[off:off + reclen].decode("latin-1").translate(
                _COMPRESSED_TRANS)
            if slides:
                slides[-1].append(txt.translate(_PPT_TRANS))
        off += reclen


def parse_ppt(blob: bytes) -> list[str]:
    """Per-slide text of a legacy ``.ppt`` binary (text blocks joined
    by newline — the RAGFlowPptParser slide shape)."""
    try:
        streams = read_cfb(blob)
    except CfbError as e:
        raise PptError(str(e)) from e
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise PptError("no PowerPoint Document stream")
    slides: list[list[str]] = []
    _walk(doc, 0, len(doc), slides)
    return ["\n".join(t.rstrip("\n") for t in blocks)
            for blocks in slides]


# -------------------------------------------------------------------------
# Writer (corpus generator side)
# -------------------------------------------------------------------------

def _rec(ver_inst: int, rectype: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rectype, len(payload)) + payload


def build_ppt(slides: list[list[str]]) -> bytes:
    """Write a minimal spec-shaped ``.ppt``: one SlidePersistAtom per
    slide followed by its text atoms.  ASCII-safe blocks are stored as
    TextBytesAtom, everything else as UTF-16 TextCharsAtom (both
    decode paths exercised by the zh/en corpus mix)."""
    body = b""
    for i, blocks in enumerate(slides):
        persist = struct.pack("<IIhHI", 0, 1, 0, 0, 256 + i)
        body += _rec(0, RT_SLIDE_PERSIST_ATOM, persist)
        for text in blocks:
            raw = text.replace("\n", "\r")
            body += _rec(0, RT_TEXT_HEADER_ATOM, struct.pack("<I", 0))
            if all(0x20 <= ord(c) < 0x7F or c == "\r" for c in raw):
                body += _rec(0, RT_TEXT_BYTES_ATOM,
                             raw.encode("latin-1"))
            else:
                body += _rec(0, RT_TEXT_CHARS_ATOM,
                             raw.encode("utf-16-le"))
    slwt = _rec(0x000F, RT_SLIDE_LIST_WITH_TEXT, body)
    doc = _rec(0x000F, RT_DOCUMENT, slwt)
    current_user = struct.pack("<IIHHHH", 20, 0xE391C05F, 3, 0, 0xF03E,
                               0)
    return build_cfb([
        ("PowerPoint Document", doc),
        ("Current User", current_user),
    ])
