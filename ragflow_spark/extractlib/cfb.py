"""Compound File Binary (OLE2) container — from-scratch reader + writer.

The reference delegates legacy binary Office formats to Apache Tika
(``rag/app/naive.py:27,449-460`` ``from tika import parser``), which in
turn wraps Apache POI's OLE2 filesystem.  We re-implement the container
layer from the public [MS-CFB] specification so the legacy ``.doc`` /
``.ppt`` text extractors (``docparse.py`` / ``pptparse.py``) can run
inside an Arrow batch with zero native dependencies.

Reader supports the structures real-world files use: v3 (512-byte
sectors) and v4 (4096-byte) headers, header + chained DIFAT, FAT sector
chains with cycle guards, the mini stream (streams below the
``miniStreamCutoff`` live in 64-byte mini sectors chained through the
miniFAT), and the red-black directory tree (walked exhaustively — we do
not trust sibling ordering).

Writer (`build_cfb`) produces spec-shaped v3 files for the corpus
generator: small streams go to the mini stream, directory siblings form
the required name-ordered BST, and FAT/DIFAT/miniFAT are emitted
exactly as the spec lays them out, so the reader is exercised on the
same shapes POI would produce.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF

MINI_SECTOR_SIZE = 64
MINI_STREAM_CUTOFF = 4096


class CfbError(ValueError):
    """Malformed or unsupported compound file."""


def is_cfb(blob: bytes) -> bool:
    return blob[:8] == MAGIC


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


class _Entry:
    __slots__ = ("name", "objtype", "left", "right", "child", "start",
                 "size", "sid")

    def __init__(self, name, objtype, left, right, child, start, size,
                 sid):
        self.name = name
        self.objtype = objtype
        self.left = left
        self.right = right
        self.child = child
        self.start = start
        self.size = size
        self.sid = sid


class CfbReader:
    """Parse a compound file; expose ``streams`` as {name: bytes}.

    Storages are flattened: an entry's name is its directory-entry name
    (Word/PowerPoint keep their streams at the root, so path nesting is
    not needed; nested names would collide only in exotic files, where
    the first-walked entry wins).
    """

    def __init__(self, blob: bytes):
        if len(blob) < 512:
            raise CfbError("file shorter than a CFB header")
        if not is_cfb(blob):
            raise CfbError("bad CFB magic")
        self._blob = blob
        major = _u16(blob, 26)
        sector_shift = _u16(blob, 30)
        if major == 3:
            if sector_shift != 9:
                raise CfbError("v3 header with sector shift != 9")
        elif major == 4:
            if sector_shift != 12:
                raise CfbError("v4 header with sector shift != 12")
        else:
            raise CfbError(f"unsupported major version {major}")
        if _u16(blob, 28) != 0xFFFE:
            raise CfbError("bad byte-order mark")
        self._ssz = 1 << sector_shift
        mini_shift = _u16(blob, 32)
        if mini_shift != 6:
            raise CfbError("mini sector shift != 6")
        self._num_fat = _u32(blob, 44)
        self._dir_start = _u32(blob, 48)
        self._mini_cutoff = _u32(blob, 56)
        self._minifat_start = _u32(blob, 60)
        self._num_minifat = _u32(blob, 64)
        self._difat_start = _u32(blob, 68)
        self._num_difat = _u32(blob, 72)
        self._nsect = max(0, (len(blob) - self._ssz) // self._ssz)
        self._fat = self._read_fat()
        self._entries = self._read_directory()
        root = self._entries[0]
        if root.objtype != 5:
            raise CfbError("directory entry 0 is not the root storage")
        self._mini_stream = self._read_chain(root.start, root.size)
        self._minifat = self._read_minifat()
        self.streams: dict[str, bytes] = {}
        self._walk(root.child)

    # -- sectors ---------------------------------------------------------

    def _sector(self, sid: int) -> bytes:
        off = self._ssz * (sid + 1)
        if sid >= self._nsect or off + self._ssz > len(self._blob):
            raise CfbError(f"sector {sid} out of range")
        return self._blob[off:off + self._ssz]

    def _read_fat(self) -> list[int]:
        per = self._ssz // 4
        difat: list[int] = list(
            struct.unpack_from("<109I", self._blob, 76))
        sid = self._difat_start
        guard = 0
        while sid not in (ENDOFCHAIN, FREESECT):
            sec = self._sector(sid)
            vals = struct.unpack_from(f"<{per}I", sec, 0)
            difat.extend(vals[:-1])
            sid = vals[-1]
            guard += 1
            if guard > self._num_difat + 1:
                raise CfbError("DIFAT chain longer than declared")
        fat: list[int] = []
        used = 0
        for fsid in difat:
            if fsid in (FREESECT, ENDOFCHAIN):
                continue
            fat.extend(struct.unpack_from(f"<{per}I", self._sector(fsid)))
            used += 1
            if used >= self._num_fat:
                break
        if used < self._num_fat:
            raise CfbError("fewer FAT sectors than the header declares")
        return fat

    def _read_chain(self, start: int, size: int) -> bytes:
        if start in (ENDOFCHAIN, FREESECT) or size == 0:
            return b""
        out = bytearray()
        sid = start
        seen = set()
        while sid != ENDOFCHAIN:
            if sid in seen:
                raise CfbError("cycle in FAT chain")
            seen.add(sid)
            out += self._sector(sid)
            if len(out) >= size + self._ssz:
                raise CfbError("FAT chain longer than stream size")
            if sid >= len(self._fat):
                raise CfbError(f"sector {sid} missing from FAT")
            sid = self._fat[sid]
        if len(out) < size:
            raise CfbError("FAT chain shorter than stream size")
        return bytes(out[:size])

    def _read_minifat(self) -> list[int]:
        raw = self._read_chain(
            self._minifat_start, self._num_minifat * self._ssz)
        return list(struct.unpack_from(f"<{len(raw) // 4}I", raw))

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        seen = set()
        while sid != ENDOFCHAIN:
            if sid in seen:
                raise CfbError("cycle in miniFAT chain")
            seen.add(sid)
            off = sid * MINI_SECTOR_SIZE
            if off + MINI_SECTOR_SIZE > len(self._mini_stream):
                raise CfbError(f"mini sector {sid} out of range")
            out += self._mini_stream[off:off + MINI_SECTOR_SIZE]
            if sid >= len(self._minifat):
                raise CfbError(f"mini sector {sid} missing from miniFAT")
            sid = self._minifat[sid]
        if len(out) < size:
            raise CfbError("miniFAT chain shorter than stream size")
        return bytes(out[:size])

    # -- directory -------------------------------------------------------

    def _read_directory(self) -> list[_Entry]:
        # Directory stream size is not in the header (v3 declares 0
        # transaction fields); read the chain until ENDOFCHAIN.
        out = bytearray()
        sid = self._dir_start
        seen = set()
        while sid != ENDOFCHAIN:
            if sid in seen:
                raise CfbError("cycle in directory chain")
            seen.add(sid)
            out += self._sector(sid)
            if sid >= len(self._fat):
                raise CfbError("directory sector missing from FAT")
            sid = self._fat[sid]
        entries = []
        for i in range(len(out) // 128):
            e = out[i * 128:(i + 1) * 128]
            nlen = _u16(e, 64)
            if nlen < 2 or nlen > 64:
                name = ""
            else:
                name = e[:nlen - 2].decode("utf-16-le", "replace")
            objtype = e[66]
            size = struct.unpack_from("<Q", e, 120)[0]
            if self._ssz == 512:
                # v3 writers may leave garbage in the high 4 bytes
                size &= 0xFFFFFFFF
            entries.append(_Entry(
                name, objtype, _u32(e, 68), _u32(e, 72), _u32(e, 76),
                _u32(e, 116), size, i))
        if not entries:
            raise CfbError("empty directory")
        return entries

    def _walk(self, sid: int) -> None:
        stack = [sid]
        seen = set()
        while stack:
            cur = stack.pop()
            if cur == NOSTREAM or cur in seen:
                continue
            seen.add(cur)
            if cur >= len(self._entries):
                raise CfbError(f"directory id {cur} out of range")
            e = self._entries[cur]
            stack.extend((e.left, e.right))
            if e.objtype == 1:  # storage: flatten its subtree
                stack.append(e.child)
            elif e.objtype == 2 and e.name not in self.streams:
                if e.size < self._mini_cutoff:
                    self.streams[e.name] = self._read_mini_chain(
                        e.start, e.size)
                else:
                    self.streams[e.name] = self._read_chain(
                        e.start, e.size)


def read_cfb(blob: bytes) -> dict[str, bytes]:
    """Parse ``blob``; return {stream name: bytes} (storages flattened)."""
    return CfbReader(blob).streams


# -------------------------------------------------------------------------
# Writer (corpus generator side)
# -------------------------------------------------------------------------

def _dir_key(name: str):
    # [MS-CFB] 2.6.4: shorter names first, then case-insensitive UTF-16
    # code-unit order.
    return (len(name), name.upper())


def _bst(ids: list[int], keyed: list[str]):
    """Balanced BST over name-sorted sibling ids -> (root, {id: (l, r)})."""
    links: dict[int, list[int]] = {i: [NOSTREAM, NOSTREAM] for i in ids}

    def build(lo: int, hi: int) -> int:
        if lo > hi:
            return NOSTREAM
        mid = (lo + hi) // 2
        node = ids[mid]
        links[node][0] = build(lo, mid - 1)
        links[node][1] = build(mid + 1, hi)
        return node

    ids = sorted(ids, key=lambda i: _dir_key(keyed[i]))
    root = build(0, len(ids) - 1)
    return root, links


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Write a v3 compound file holding root-level ``streams``.

    Streams shorter than the 4096-byte cutoff are placed in the mini
    stream (64-byte sectors through the miniFAT), like real writers.
    """
    ssz = 512
    per = ssz // 4
    names = [n for n, _ in streams]
    if len(set(names)) != len(names):
        raise ValueError("duplicate stream names")
    for n in names:
        if len(n.encode("utf-16-le")) > 62:
            raise ValueError(f"stream name too long: {n!r}")

    # --- mini stream assembly
    mini_data = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for name, data in streams:
        if 0 < len(data) < MINI_STREAM_CUTOFF:
            first = len(minifat)
            nsec = (len(data) + MINI_SECTOR_SIZE - 1) // MINI_SECTOR_SIZE
            mini_data += data
            pad = nsec * MINI_SECTOR_SIZE - len(data)
            mini_data += b"\x00" * pad
            minifat.extend(range(first + 1, first + nsec))
            minifat.append(ENDOFCHAIN)
            mini_start[name] = first

    # --- regular sectors: [directory][miniFAT][mini stream][big streams]
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        if not data:
            return ENDOFCHAIN
        first = len(sectors)
        nsec = (len(data) + ssz - 1) // ssz
        for i in range(nsec):
            sectors.append(data[i * ssz:(i + 1) * ssz].ljust(ssz, b"\x00"))
        fat.extend(range(first + 1, first + nsec))
        fat.append(ENDOFCHAIN)
        return first

    # directory placeholder chain (patched later)
    n_entries = 1 + len(streams)
    dir_sectors = (n_entries * 128 + ssz - 1) // ssz
    dir_start = add_chain(b"\x00" * (dir_sectors * ssz))

    minifat_blob = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start = add_chain(minifat_blob)
    n_minifat_sectors = (len(minifat_blob) + ssz - 1) // ssz

    mini_stream_start = add_chain(bytes(mini_data))

    big_start: dict[str, int] = {}
    for name, data in streams:
        if len(data) >= MINI_STREAM_CUTOFF:
            big_start[name] = add_chain(data)

    # --- FAT sectors themselves (marked FATSECT); header DIFAT only
    # (109 entries is plenty for corpus files; assert, don't truncate).
    # The FAT must have an entry for every sector including the FAT
    # sectors: smallest n with ceil((len(sectors) + n) / per) <= n.
    n_fat_sectors = 1
    while (len(sectors) + n_fat_sectors + per - 1) // per > n_fat_sectors:
        n_fat_sectors += 1
    if n_fat_sectors > 109:
        raise ValueError("file too large for header-only DIFAT")
    fat_start = len(sectors)
    fat = fat + [FATSECT] * n_fat_sectors
    pad = n_fat_sectors * per - len(fat)
    fat += [FREESECT] * pad
    fat_blob = b"".join(struct.pack("<I", v) for v in fat)
    for i in range(n_fat_sectors):
        sectors.append(fat_blob[i * ssz:(i + 1) * ssz])

    # --- directory entries
    def entry(name: str, objtype: int, left: int, right: int, child: int,
              start: int, size: int) -> bytes:
        raw = bytearray(128)
        enc = name.encode("utf-16-le")
        raw[:len(enc)] = enc
        struct.pack_into("<H", raw, 64, len(enc) + 2 if name else 0)
        raw[66] = objtype
        raw[67] = 1  # black
        struct.pack_into("<III", raw, 68, left, right, child)
        struct.pack_into("<I", raw, 116, start)
        struct.pack_into("<Q", raw, 120, size)
        return bytes(raw)

    sib_root, links = _bst(list(range(1, n_entries)),
                           [""] + [n for n, _ in streams])
    dir_blob = bytearray()
    dir_blob += entry("Root Entry", 5, NOSTREAM, NOSTREAM, sib_root,
                      mini_stream_start if mini_data else ENDOFCHAIN,
                      len(mini_data))
    for i, (name, data) in enumerate(streams, start=1):
        if name in mini_start:
            start, size = mini_start[name], len(data)
        elif name in big_start:
            start, size = big_start[name], len(data)
        else:
            start, size = ENDOFCHAIN, 0
        left, right = links[i]
        dir_blob += entry(name, 2, left, right, NOSTREAM, start, size)
    free = entry("", 0, NOSTREAM, NOSTREAM, NOSTREAM, FREESECT, 0)
    while len(dir_blob) < dir_sectors * ssz:
        dir_blob += free
    for i in range(dir_sectors):
        sectors[dir_start + i] = bytes(dir_blob[i * ssz:(i + 1) * ssz])

    # --- header
    header = bytearray(512)
    header[:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor
    struct.pack_into("<H", header, 26, 3)        # major
    struct.pack_into("<H", header, 28, 0xFFFE)   # byte order
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, n_fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, MINI_STREAM_CUTOFF)
    struct.pack_into("<I", header, 60,
                     minifat_start if minifat else ENDOFCHAIN)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_start + i for i in range(n_fat_sectors)]
    difat += [FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", header, 76, *difat)

    return bytes(header) + b"".join(sectors)
