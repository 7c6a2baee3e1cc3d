"""Minimal pure-stdlib legacy ``.xls`` (BIFF8) reader — the upload-path
scan the reference performs through xlrd (``helpers.py:71-82``), which
is absent from this environment.  Round 3 honestly rejected ``.xls`` at
the S4 gate; this module restores reference parity for the common case:
single-workbook BIFF8 files with string/number/boolean cells.

Public-format implementation only: the OLE2 compound-document layout
([MS-CFB]) and the BIFF8 record structures ([MS-XLS]) are openly
documented; no external library is used.

Scope (documented): BIFF8 (Excel 97+) worksheets; cell records
LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / BLANK / MULBLANK and
FORMULA with cached numeric or STRING results; SST with CONTINUE
spanning.  Charts, macros, encryption, BIFF5 and rich-text formatting
runs are out of scope (formatting runs are skipped, text kept).
"""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# --------------------------------------------------------------------------
# OLE2 compound document ([MS-CFB])
# --------------------------------------------------------------------------

def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _ole_stream(data: bytes, *names: str) -> bytes:
    """Extract a named stream from an OLE compound document."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE compound document (bad magic)")
    sector_size = 1 << _u16(data, 30)
    mini_size = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    first_dir = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    first_minifat = _u32(data, 60)
    first_difat = _u32(data, 68)
    n_difat = _u32(data, 72)

    # Per [MS-CFB] §2.1 sector #n begins at byte (n + 1) * sector_size:
    # the 512-byte header occupies the rest of "sector -1" when
    # sector_size > 512 (v4 files use 4096-byte sectors).  The previous
    # ``512 + sid * sector_size`` form was only correct for v3.
    def sector(sid: int) -> bytes:
        off = (sid + 1) * sector_size
        return data[off: off + sector_size]

    # Hard bound for any chain walk: a well-formed chain can never have
    # more sectors than the file itself contains.  Walking past this
    # means a cycle or corrupt FAT, never a legitimately huge stream.
    max_sectors = len(data) // sector_size + 1

    # FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    fat_sids: list[int] = []
    for i in range(109):
        sid = _u32(data, 76 + 4 * i)
        if sid != _FREESECT:
            fat_sids.append(sid)
    sid = first_difat
    for _ in range(n_difat):
        if sid in (_ENDOFCHAIN, _FREESECT):
            break
        blk = sector(sid)
        for off in range(0, sector_size - 4, 4):
            v = _u32(blk, off)
            if v != _FREESECT:
                fat_sids.append(v)
        sid = _u32(blk, sector_size - 4)
    fat_sids = fat_sids[:n_fat]
    fat = b"".join(sector(s) for s in fat_sids)

    def chain(start: int) -> bytes:
        """Walk a FAT chain to its END-OF-CHAIN marker.

        Never truncates a valid stream: the only bound is the count of
        sectors physically present in the file, so hitting it (or an
        out-of-range sector id) means a cyclic/corrupt FAT and raises
        instead of silently returning a partial stream.
        """
        out, sid, seen = [], start, 0
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if seen >= max_sectors:
                raise ValueError("cyclic FAT chain in compound document")
            if 4 * sid + 4 > len(fat) or (sid + 1) * sector_size >= len(data):
                raise ValueError(f"FAT sector id {sid} out of range")
            out.append(sector(sid))
            sid = _u32(fat, 4 * sid)
            seen += 1
        return b"".join(out)

    directory = chain(first_dir)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        name_len = _u16(directory, off + 64)
        etype = directory[off + 66]
        if etype == 0 or name_len < 2:
            continue
        name = directory[off: off + name_len - 2].decode("utf-16-le", "replace")
        entries.append(
            {
                "name": name,
                "type": etype,
                "start": _u32(directory, off + 116),
                "size": _u32(directory, off + 120),
            }
        )
    root = next(e for e in entries if e["type"] == 5)

    target = None
    for want in names:
        target = next(
            (e for e in entries if e["type"] == 2 and e["name"] == want), None
        )
        if target:
            break
    if target is None:
        raise ValueError(f"stream not found: {names}")

    if target["size"] < mini_cutoff:
        # stored in the mini stream (root entry's chain) via the mini FAT
        mini_container = chain(root["start"])
        minifat = chain(first_minifat)
        # Bound the walk like chain(): a valid mini chain for this stream
        # needs at most ceil(size / mini_size) sectors; more means a
        # cyclic/corrupt mini FAT on the untrusted-upload path.
        max_mini = -(-target["size"] // mini_size) + 1
        out, sid, seen = [], target["start"], 0
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if seen >= max_mini:
                raise ValueError("cyclic mini-FAT chain in compound document")
            if 4 * sid + 4 > len(minifat) or sid * mini_size >= len(mini_container):
                raise ValueError(f"mini-FAT sector id {sid} out of range")
            out.append(mini_container[sid * mini_size: (sid + 1) * mini_size])
            sid = _u32(minifat, 4 * sid)
            seen += 1
        return b"".join(out)[: target["size"]]
    return chain(target["start"])[: target["size"]]


# --------------------------------------------------------------------------
# BIFF8 records ([MS-XLS])
# --------------------------------------------------------------------------

class _Records:
    """Iterator over (opcode, payload) BIFF records from an offset."""

    def __init__(self, stream: bytes, pos: int = 0):
        self.stream = stream
        self.pos = pos

    def __iter__(self):
        return self

    def __next__(self):
        if self.pos + 4 > len(self.stream):
            raise StopIteration
        op, ln = struct.unpack_from("<HH", self.stream, self.pos)
        payload = self.stream[self.pos + 4: self.pos + 4 + ln]
        self.pos += 4 + ln
        return op, payload


def _parse_sst(first_payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared String Table incl. CONTINUE spanning: at a record boundary
    mid-string, the continuation restarts with a fresh grbit byte for
    the remaining characters."""
    chunks = [first_payload] + continues
    ci, pos = 0, 8  # skip cstTotal/cstUnique
    n_unique = _u32(first_payload, 4)

    def remaining() -> int:
        return len(chunks[ci]) - pos

    def advance():
        nonlocal ci, pos
        while ci < len(chunks) and pos >= len(chunks[ci]):
            ci += 1
            pos = 0

    def read(n: int) -> bytes:
        nonlocal pos
        out = b""
        while n:
            advance()
            take = min(n, len(chunks[ci]) - pos)
            out += chunks[ci][pos: pos + take]
            pos += take
            n -= take
        return out

    strings: list[str] = []
    for _ in range(n_unique):
        advance()
        cch = struct.unpack("<H", read(2))[0]
        grbit = read(1)[0]
        c_run = struct.unpack("<H", read(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", read(4))[0] if grbit & 0x04 else 0
        got: list[str] = []
        need = cch
        high = bool(grbit & 0x01)
        while need:
            if remaining() <= 0:
                # char data resumes in the next CONTINUE chunk, which
                # begins with a fresh grbit byte for the remainder
                if ci + 1 >= len(chunks):
                    break
                ci, pos = ci + 1, 0
                high = bool(read(1)[0] & 0x01)
                continue
            width = 2 if high else 1
            take = min(need, remaining() // width)
            if take == 0:  # sub-char tail (non-conformant); skip chunk
                ci, pos = ci + 1, 0
                if ci >= len(chunks):
                    break
                high = bool(read(1)[0] & 0x01)
                continue
            raw = chunks[ci][pos: pos + take * width]
            pos += take * width
            got.append(raw.decode("utf-16-le" if high else "latin-1", "replace"))
            need -= take
        read(4 * c_run)
        read(cb_ext)
        strings.append("".join(got))
    return strings


def _unicode_inline(payload: bytes, off: int) -> str:
    """XLUnicodeString at ``off``: cch u16, grbit u8, chars."""
    cch = _u16(payload, off)
    grbit = payload[off + 2]
    start = off + 3
    if grbit & 0x01:
        return payload[start: start + 2 * cch].decode("utf-16-le", "replace")
    return payload[start: start + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float | int:
    cents = rk & 0x01
    is_int = rk & 0x02
    if is_int:
        v: float | int = rk >> 2
        if v >= 1 << 29:
            v -= 1 << 30
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100 if cents else v


def parse_xls_bytes(data: bytes, sheet: int = 0) -> list[list]:
    """Parse BIFF8 bytes into a dense list-of-rows (None for blanks)."""
    wb = _ole_stream(data, "Workbook", "Book")

    # --- workbook globals: BOUNDSHEET offsets + SST --------------------
    sheet_offsets: list[int] = []
    sst: list[str] = []
    recs = _Records(wb)
    pending_sst: bytes | None = None
    sst_continues: list[bytes] = []
    for op, payload in recs:
        if op == 0x0085:  # BOUNDSHEET
            sheet_offsets.append(_u32(payload, 0))
        elif op == 0x00FC:  # SST
            pending_sst = payload
            sst_continues = []
        elif op == 0x003C and pending_sst is not None:  # CONTINUE
            sst_continues.append(payload)
        elif op == 0x000A:  # EOF of globals substream
            break
        elif pending_sst is not None and op not in (0x00FC, 0x003C):
            sst = _parse_sst(pending_sst, sst_continues)
            pending_sst = None
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, sst_continues)
    if not sheet_offsets:
        raise ValueError("no BOUNDSHEET records (not a BIFF8 workbook?)")
    if sheet >= len(sheet_offsets):
        raise ValueError(f"sheet {sheet} out of range ({len(sheet_offsets)})")

    # --- worksheet substream ------------------------------------------
    cells: dict[tuple[int, int], object] = {}
    pending_formula_cell: tuple[int, int] | None = None
    for op, payload in _Records(wb, sheet_offsets[sheet]):
        if op == 0x000A:  # EOF
            break
        if op == 0x00FD:  # LABELSST
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = sst[_u32(payload, 6)]
        elif op == 0x0204:  # LABEL (inline unicode)
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = _unicode_inline(payload, 6)
        elif op == 0x0203:  # NUMBER
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = struct.unpack_from("<d", payload, 6)[0]
        elif op == 0x027E:  # RK
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = _rk_value(_u32(payload, 6))
        elif op == 0x00BD:  # MULRK
            r, c0 = _u16(payload, 0), _u16(payload, 2)
            n = (len(payload) - 6) // 6
            for i in range(n):
                cells[(r, c0 + i)] = _rk_value(_u32(payload, 4 + 6 * i + 2))
        elif op == 0x0205:  # BOOLERR
            r, c = _u16(payload, 0), _u16(payload, 2)
            val, is_err = payload[6], payload[7]
            cells[(r, c)] = None if is_err else bool(val)
        elif op == 0x0006:  # FORMULA — cached numeric or string result
            r, c = _u16(payload, 0), _u16(payload, 2)
            num = payload[6:14]
            if num[6:8] == b"\xff\xff":
                if num[0] == 0x00:  # string result follows in STRING
                    pending_formula_cell = (r, c)
                elif num[0] == 0x01:  # boolean
                    cells[(r, c)] = bool(num[2])
                # 0x02 error, 0x03 empty -> None (leave unset)
            else:
                cells[(r, c)] = struct.unpack("<d", num)[0]
        elif op == 0x0207 and pending_formula_cell is not None:  # STRING
            cells[pending_formula_cell] = _unicode_inline(payload, 0)
            pending_formula_cell = None

    if not cells:
        return []
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    return [
        [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
    ]
