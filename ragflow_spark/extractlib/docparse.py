"""Legacy Word 97-2003 ``.doc`` text extraction — from scratch.

The reference has no native ``.doc`` parser: ``rag/app/naive.py:449-460``
(and the same branch in ``book.py:114`` / ``laws.py:185``) hands the
binary to Apache Tika (``parser.from_buffer``), splits the returned
``content`` on newlines, and keeps the non-empty lines as sections.
Tika delegates to POI's HWPF, which resolves the text through the FIB
and the piece table.  We implement that deterministic core directly
from the public [MS-DOC] specification:

* FIB: ``wIdent``/``nFib`` validation, the ``fWhichTblStm`` bit
  selecting the ``0Table``/``1Table`` stream, ``ccpText`` from
  FibRgLw97, ``fcClx``/``lcbClx`` from FibRgFcLcb97 (fixed offset
  0x01A2 in every Word 97+ FIB — the 97 block is a prefix of all
  later layouts).
* Clx: leading ``Prc`` (0x01) property blocks skipped, ``Pcdt``
  (0x02) holding the PlcPcd piece table.
* PlcPcd: n+1 CPs + n PCDs; each PCD's ``FcCompressed`` carries bit
  30 ``fCompressed`` — set means one byte per char at offset fc/2
  with the spec's fixed remap table over Windows-1252, clear means
  UTF-16LE at fc.

Control characters are folded to the line shape the reference's
``content.split('\\n')`` consumes: paragraph mark (0x0D), cell mark
(0x07), vertical tab (0x0B) and page break (0x0C) become ``\\n``;
field/object markers (0x13/0x14/0x15, 0x01/0x02/0x05/0x08) are
dropped; the non-breaking hyphen (0x1E) renders ``-`` and the soft
hyphen (0x1F) renders empty, matching POI's replacement choices.
"""

from __future__ import annotations

import struct

from ragflow_spark.extractlib.cfb import CfbError, build_cfb, read_cfb

# [MS-DOC] 2.9.74 FcCompressed: bytes that do NOT map to their ANSI
# value when fCompressed is set.
_COMPRESSED_MAP = {
    0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
    0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰",
    0x8A: "Š", 0x8B: "‹", 0x8C: "Œ", 0x91: "‘",
    0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™",
    0x9A: "š", 0x9B: "›", 0x9C: "œ", 0x9F: "Ÿ",
}
_COMPRESSED_TRANS = str.maketrans(
    {chr(k): v for k, v in _COMPRESSED_MAP.items()})

_CTRL_TRANS = str.maketrans({
    "\x0d": "\n", "\x07": "\n", "\x0b": "\n", "\x0c": "\n",
    "\x01": None, "\x02": None, "\x05": None, "\x08": None,
    "\x13": None, "\x14": None, "\x15": None,
    "\x1e": "-", "\x1f": None, "\x00": None,
})

_FC_CLX = 0x01A2  # FibRgFcLcb97 pair 33: 154 + 33 * 8


class DocError(ValueError):
    """Not a Word binary document, or a malformed one."""


def _u16(b: bytes, off: int) -> int:
    if off + 2 > len(b):
        raise DocError("FIB truncated")
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    if off + 4 > len(b):
        raise DocError("FIB truncated")
    return struct.unpack_from("<I", b, off)[0]


def parse_doc(blob: bytes) -> str:
    """Extract the main document text of a ``.doc`` binary.

    Returns the text with paragraph marks folded to ``\\n`` — the same
    shape the reference splits (``naive.py:454``). Raises DocError on
    anything that is not a Word compound file.
    """
    try:
        streams = read_cfb(blob)
    except CfbError as e:
        raise DocError(str(e)) from e
    word = streams.get("WordDocument")
    if word is None:
        raise DocError("no WordDocument stream")
    if _u16(word, 0) != 0xA5EC:
        raise DocError("bad FIB wIdent")
    flags = _u16(word, 10)
    if flags & 0x0100:
        raise DocError("encrypted document")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        # tolerate a writer that set the bit wrong but shipped one stream
        table = streams.get("1Table") or streams.get("0Table")
    if table is None:
        raise DocError("no table stream")
    ccp_text = _u32(word, 76)  # FibRgLw97.ccpText (fibRgLw @64 + 12)
    fc_clx = _u32(word, _FC_CLX)
    lcb_clx = _u32(word, _FC_CLX + 4)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise DocError("Clx out of range")
    clx = table[fc_clx:fc_clx + lcb_clx]

    # walk Prc blocks, find the Pcdt
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        if i + 3 > len(clx):
            raise DocError("truncated Prc")
        cb = struct.unpack_from("<h", clx, i + 1)[0]
        i += 3 + max(cb, 0)
    if i >= len(clx) or clx[i] != 0x02:
        raise DocError("no Pcdt in Clx")
    lcb = struct.unpack_from("<I", clx, i + 1)[0]
    plc = clx[i + 5:i + 5 + lcb]
    if len(plc) < lcb or (lcb - 4) % 12 != 0:
        raise DocError("malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    for j in range(n):
        cp0, cp1 = cps[j], cps[j + 1]
        if cp1 <= cp0:
            raise DocError("non-increasing piece CPs")
        # clip to the main document range (the piece table also covers
        # footnote/header subdocuments past ccpText)
        if cp0 >= ccp_text:
            break
        count = min(cp1, ccp_text) - cp0
        fc_raw = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * j + 2)[0]
        if fc_raw & 0x40000000:  # fCompressed
            off = (fc_raw & 0x3FFFFFFF) // 2
            raw = word[off:off + count]
            if len(raw) < count:
                raise DocError("compressed piece out of range")
            out.append(raw.decode("latin-1").translate(_COMPRESSED_TRANS))
        else:
            off = fc_raw & 0x3FFFFFFF
            raw = word[off:off + 2 * count]
            if len(raw) < 2 * count:
                raise DocError("unicode piece out of range")
            out.append(raw.decode("utf-16-le"))
    return "".join(out).translate(_CTRL_TRANS)


def doc_lines(blob: bytes) -> list[str]:
    """Non-empty text lines — exactly the reference's section list
    (``naive.py:453-455``: ``content.split('\\n')`` keep-truthy)."""
    return [ln for ln in parse_doc(blob).split("\n") if ln]


# -------------------------------------------------------------------------
# Writer (corpus generator side)
# -------------------------------------------------------------------------

_FIB_SIZE = 1472  # Word 97 writers emit 1472-byte FIBs; text follows


def _split_pieces(text: str, group: int = 2) -> list[str]:
    """Split on paragraph marks into multi-paragraph pieces so corpus
    files genuinely exercise the piece table."""
    paras = text.split("\r")
    # re-attach the \r to each paragraph (the final element is the tail
    # after the last mark — usually empty)
    units = [p + "\r" for p in paras[:-1]]
    if paras[-1]:
        units.append(paras[-1])
    pieces = ["".join(units[i:i + group])
              for i in range(0, len(units), group)]
    return [p for p in pieces if p]


def build_doc(lines: list[str], piece_group: int = 2) -> bytes:
    """Write a Word 97 binary whose main text is ``lines`` (one
    paragraph each).

    Pieces alternate compressed/UTF-16 by content (ASCII-safe pieces
    are stored compressed) and are laid into the WordDocument stream in
    REVERSE order, so any reader that ignores the piece table and scans
    linearly produces scrambled text — a regression guard for
    `parse_doc`.
    """
    text = "".join(ln + "\r" for ln in lines)
    pieces = _split_pieces(text, piece_group) or ["\r"]

    # encode pieces; assign file offsets from the END of the list
    encoded: list[tuple[str, bytes, bool]] = []
    for p in pieces:
        compressed = all(
            (0x20 <= ord(c) < 0x7F) or c in "\r\t" for c in p)
        data = (p.encode("latin-1") if compressed
                else p.encode("utf-16-le"))
        encoded.append((p, data, compressed))
    offsets: dict[int, int] = {}
    pos = _FIB_SIZE
    for idx in range(len(encoded) - 1, -1, -1):
        offsets[idx] = pos
        pos += len(encoded[idx][1])
    word_len = pos

    word = bytearray(word_len)
    struct.pack_into("<H", word, 0, 0xA5EC)        # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)        # nFib (Word 97)
    struct.pack_into("<H", word, 6, 0x0409)        # lid
    struct.pack_into("<H", word, 10, 0x0200)       # fWhichTblStm = 1
    struct.pack_into("<H", word, 12, 0x00BF)       # nFibBack
    struct.pack_into("<I", word, 24, _FIB_SIZE)    # fcMin (compat)
    struct.pack_into("<I", word, 28, word_len)     # fcMac (compat)
    struct.pack_into("<H", word, 32, 0x000E)       # csw
    struct.pack_into("<H", word, 62, 0x0016)       # cslw
    struct.pack_into("<I", word, 64, word_len)     # cbMac
    cp_total = sum(len(p) for p, _, _ in encoded)
    struct.pack_into("<I", word, 76, cp_total)     # ccpText
    struct.pack_into("<H", word, 152, 0x005D)      # cbRgFcLcb (93)
    for idx, (_, data, _) in enumerate(encoded):
        word[offsets[idx]:offsets[idx] + len(data)] = data

    # 1Table: a dummy Prc (exercises the skip path) + Pcdt/PlcPcd
    n = len(encoded)
    plc = bytearray()
    cp = 0
    cps = [0]
    for p, _, _ in encoded:
        cp += len(p)
        cps.append(cp)
    for c in cps:
        plc += struct.pack("<I", c)
    for idx, (_, _, compressed) in enumerate(encoded):
        fc = (offsets[idx] * 2) | 0x40000000 if compressed \
            else offsets[idx]
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = bytearray()
    clx += b"\x01" + struct.pack("<h", 2) + b"\x00\x00"   # dummy Prc
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    fc_clx = 64  # leave a spec-plausible gap at the stream head
    table = bytearray(fc_clx) + clx
    struct.pack_into("<I", word, _FC_CLX, fc_clx)
    struct.pack_into("<I", word, _FC_CLX + 4, len(clx))

    return build_cfb([
        ("WordDocument", bytes(word)),
        ("1Table", bytes(table)),
        ("\x05SummaryInformation", b"\x00" * 48),
    ])
