"""Pin every corruption guard in the [MS-CFB] container reader/writer.

Each test builds a valid v3 file with ``build_cfb`` and patches the one
structure a guard checks, asserting the specific ``CfbError`` message so
a refactor cannot silently swap which guard fires.  Offsets are read
from the header / directory rather than assumed, mirroring how a
hostile file would be crafted against the spec layout.
"""

import struct

import pytest

from ragflow_spark.extractlib.cfb import (ENDOFCHAIN, CfbError, build_cfb,
                                          read_cfb)

SSZ = 512


def _sector_off(sid: int) -> int:
    return SSZ * (sid + 1)


def _u16(b, off):
    return struct.unpack_from("<H", b, off)[0]


def _u32(b, off):
    return struct.unpack_from("<I", b, off)[0]


def _small():
    # one 100-byte stream -> mini stream (2 mini sectors, 128-byte
    # mini stream occupying one regular sector)
    return bytearray(build_cfb([("S", b"x" * 100)]))


def _patch_u16(b, off, v):
    struct.pack_into("<H", b, off, v)


def _patch_u32(b, off, v):
    struct.pack_into("<I", b, off, v)


def _expect(blob, msg):
    with pytest.raises(CfbError, match=msg):
        read_cfb(bytes(blob))


# -- header guards ---------------------------------------------------------

def test_bad_magic_at_full_header_length():
    _expect(bytes(SSZ), "bad CFB magic")


def test_v3_sector_shift_guard():
    b = _small()
    _patch_u16(b, 30, 10)
    _expect(b, "v3 header with sector shift != 9")


def test_v4_sector_shift_guard():
    b = _small()
    _patch_u16(b, 26, 4)          # major v4, shift still 9
    _expect(b, "v4 header with sector shift != 12")


def test_unsupported_major_version():
    b = _small()
    _patch_u16(b, 26, 5)
    _expect(b, "unsupported major version 5")


def test_byte_order_mark_guard():
    b = _small()
    _patch_u16(b, 28, 0xFFFF)
    _expect(b, "bad byte-order mark")


def test_mini_sector_shift_guard():
    b = _small()
    _patch_u16(b, 32, 7)
    _expect(b, "mini sector shift != 6")


def test_root_entry_must_be_storage():
    b = _small()
    dir_off = _sector_off(_u32(b, 48))
    b[dir_off + 66] = 2           # root objtype -> stream
    _expect(b, "directory entry 0 is not the root storage")


# -- FAT / DIFAT guards ----------------------------------------------------

def test_difat_chain_loop_guard():
    b = _small()
    # point the chained-DIFAT start at the directory sector and make
    # that sector's next-DIFAT pointer (last u32) point to itself
    dir_sid = _u32(b, 48)
    _patch_u32(b, 68, dir_sid)
    _patch_u32(b, _sector_off(dir_sid) + SSZ - 4, dir_sid)
    _expect(b, "DIFAT chain longer than declared")


def test_fewer_fat_sectors_than_declared():
    b = _small()
    _patch_u32(b, 44, 5)
    _expect(b, "fewer FAT sectors than the header declares")


def test_fat_chain_cycle_on_mini_stream():
    b = _small()
    fat_sid = _u32(b, 76)         # first DIFAT entry = first FAT sector
    dir_off = _sector_off(_u32(b, 48))
    root_start = _u32(b, dir_off + 116)
    _patch_u32(b, _sector_off(fat_sid) + 4 * root_start, root_start)
    _expect(b, "cycle in FAT chain")


def test_fat_chain_longer_than_stream_size():
    # 600-byte mini payload -> 640-byte mini stream over TWO regular
    # sectors; shrinking the root size below one sector makes the
    # still-2-sector chain overrun it
    b = bytearray(build_cfb([("S", b"x" * 600)]))
    dir_off = _sector_off(_u32(b, 48))
    struct.pack_into("<Q", b, dir_off + 120, 100)
    _expect(b, "FAT chain longer than stream size")


def test_fat_chain_shorter_than_stream_size():
    b = _small()
    dir_off = _sector_off(_u32(b, 48))
    struct.pack_into("<Q", b, dir_off + 120, 600)
    _expect(b, "FAT chain shorter than stream size")


def test_chain_sector_missing_from_fat():
    # grow the file so sectors exist beyond the FAT's 128 entries, then
    # point the root mini-stream start into that un-FAT-covered tail
    b = _small()
    b += bytes(SSZ * 130)
    dir_off = _sector_off(_u32(b, 48))
    _patch_u32(b, dir_off + 116, 129)
    _expect(b, "sector 129 missing from FAT")


def test_directory_sector_missing_from_fat():
    b = _small()
    b += bytes(SSZ * 130)
    _patch_u32(b, 48, 129)
    _expect(b, "directory sector missing from FAT")


# -- miniFAT guards --------------------------------------------------------

def _minifat_entry_off(b, idx):
    return _sector_off(_u32(b, 60)) + 4 * idx


def test_minifat_cycle():
    b = _small()
    _patch_u32(b, _minifat_entry_off(b, 0), 0)
    _expect(b, "cycle in miniFAT chain")


def test_mini_sector_out_of_range():
    b = _small()
    _patch_u32(b, _minifat_entry_off(b, 0), 10)
    _expect(b, "mini sector 10 out of range")


def test_mini_sector_missing_from_minifat():
    b = _small()
    _patch_u32(b, 64, 0)          # declare zero miniFAT sectors
    _expect(b, "mini sector 0 missing from miniFAT")


def test_minifat_chain_shorter_than_stream_size():
    b = _small()
    _patch_u32(b, _minifat_entry_off(b, 0), ENDOFCHAIN)
    _expect(b, "miniFAT chain shorter than stream size")


# -- directory guards ------------------------------------------------------

def test_empty_directory():
    b = _small()
    _patch_u32(b, 48, ENDOFCHAIN)
    _expect(b, "empty directory")


def test_directory_id_out_of_range():
    b = _small()
    dir_off = _sector_off(_u32(b, 48))
    _patch_u32(b, dir_off + 76, 50)   # root.child -> nonexistent id
    _expect(b, "directory id 50 out of range")


# -- writer guards + uncommon shapes --------------------------------------

def test_builder_rejects_duplicate_names():
    with pytest.raises(ValueError, match="duplicate stream names"):
        build_cfb([("S", b"a"), ("S", b"b")])


def test_builder_rejects_overlong_name():
    with pytest.raises(ValueError, match="stream name too long"):
        build_cfb([("N" * 32, b"a")])


def test_big_stream_only_file_has_no_minifat():
    # with no sub-cutoff streams the miniFAT and mini stream are empty
    # chains (ENDOFCHAIN starts); reader must still round-trip
    data = bytes(range(256)) * 20          # 5120 bytes >= cutoff
    blob = build_cfb([("BIG", data)])
    assert _u32(blob, 64) == 0             # zero miniFAT sectors
    assert read_cfb(blob) == {"BIG": data}


def test_builder_rejects_file_beyond_header_difat():
    with pytest.raises(ValueError, match="header-only DIFAT"):
        build_cfb([("HUGE", bytes(7_200_000))])
