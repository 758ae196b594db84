"""Minimal Compound File Binary (CFB / OLE2) reader + writer, pure stdlib.

HWP v5 documents are CFB containers (reference:
modules/mrc_service/file_parser/hwp_parser.py:11-67 walks them with
``olefile``, absent here). This implements the subset of [MS-CFB] the HWP
parser needs — version 3, 512-byte sectors, header-resident DIFAT (109
FAT sectors ≈ 6.9 GB file ceiling, far beyond any document):

  * reader: header -> FAT -> directory tree -> stream extraction, with
    the < 4096-byte streams read from the mini stream via the mini FAT
  * writer: deterministic layout (mini stream, big streams, mini FAT,
    directory, FAT) used to synthesize test fixtures — both the mini and
    regular FAT paths are exercised by construction

Sector chains terminate with ENDOFCHAIN (0xFFFFFFFE); FAT/DIFAT sectors
mark themselves 0xFFFFFFFD/0xFFFFFFFC; free entries are 0xFFFFFFFF.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
SECT = 512
MINI_SECT = 64
MINI_CUTOFF = 4096
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD

#: directory entry object types
TYPE_STORAGE = 1
TYPE_STREAM = 2
TYPE_ROOT = 5
NOSTREAM = 0xFFFFFFFF


class CfbError(ValueError):
    pass


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _Entry:
    __slots__ = ("name", "type", "left", "right", "child", "start", "size")

    def __init__(self, raw: bytes):
        name_len = struct.unpack_from("<H", raw, 64)[0]
        self.name = raw[: max(0, name_len - 2)].decode("utf-16-le") if name_len >= 2 else ""
        self.type = raw[66]
        self.left, self.right, self.child = struct.unpack_from("<III", raw, 68)
        self.start = struct.unpack_from("<I", raw, 116)[0]
        self.size = struct.unpack_from("<Q", raw, 120)[0]


class CfbReader:
    """Parse a CFB container; ``streams()`` yields path-tuple -> bytes."""

    def __init__(self, buf: bytes):
        if buf[:8] != MAGIC:
            raise CfbError("not a CFB container (bad magic)")
        (sector_shift,) = struct.unpack_from("<H", buf, 30)
        if (1 << sector_shift) != SECT:
            raise CfbError(f"unsupported sector size {1 << sector_shift}")
        self.buf = buf
        (self.n_fat,) = struct.unpack_from("<I", buf, 44)
        (self.dir_start,) = struct.unpack_from("<I", buf, 48)
        (self.minifat_start,) = struct.unpack_from("<I", buf, 60)
        (self.n_minifat,) = struct.unpack_from("<I", buf, 64)
        difat = struct.unpack_from("<109I", buf, 76)
        fat_sectors = [s for s in difat[: self.n_fat] if s != FREESECT]
        fat = []
        for s in fat_sectors:
            fat.extend(struct.unpack_from(f"<{SECT // 4}I", buf, SECT * (s + 1)))
        self.fat = fat
        minifat = []
        for s in self._chain(self.minifat_start):
            minifat.extend(struct.unpack_from(f"<{SECT // 4}I", buf, SECT * (s + 1)))
        self.minifat = minifat

        dir_raw = b"".join(self._sector(s) for s in self._chain(self.dir_start))
        self.entries = [
            _Entry(dir_raw[i : i + 128])
            for i in range(0, len(dir_raw), 128)
            if dir_raw[i + 66] != 0  # type 0 = unallocated
        ]
        root = self.entries[0]
        if root.type != TYPE_ROOT:
            raise CfbError("first directory entry is not the root")
        self.mini_stream = self._read_chain(root.start, root.size)

    def _sector(self, s: int) -> bytes:
        off = SECT * (s + 1)
        if off + SECT > len(self.buf):
            raise CfbError(f"sector {s} beyond end of file")
        return self.buf[off : off + SECT]

    def _chain(self, start: int) -> list[int]:
        out, s = [], start
        while s not in (ENDOFCHAIN, FREESECT):
            if s >= len(self.fat):
                # a silent stop here would return a truncated stream as
                # if complete — malformed chains must fail loudly
                raise CfbError(f"FAT chain references out-of-range sector {s}")
            out.append(s)
            s = self.fat[s]
            if len(out) > len(self.fat) + 1:
                raise CfbError("FAT chain cycle")
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        data = b"".join(self._sector(s) for s in self._chain(start))
        return data[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out, s = [], start
        while s != ENDOFCHAIN:
            if s == FREESECT or s >= len(self.minifat):
                # mirror _chain: a malformed mini-FAT next-pointer must
                # fail loudly, not IndexError / silently append nothing
                raise CfbError(f"mini FAT chain references out-of-range sector {s}")
            out.append(self.mini_stream[MINI_SECT * s : MINI_SECT * (s + 1)])
            s = self.minifat[s]
            if len(out) > len(self.minifat) + 1:
                raise CfbError("mini FAT chain cycle")
        return b"".join(out)[:size]

    def _walk(self, idx: int, prefix: tuple, out: dict) -> None:
        if idx == NOSTREAM:
            return
        e = self.entries[idx]
        self._walk(e.left, prefix, out)
        self._walk(e.right, prefix, out)
        path = prefix + (e.name,)
        if e.type == TYPE_STREAM:
            out[path] = e
        elif e.type == TYPE_STORAGE:
            self._walk(e.child, path, out)

    def list_streams(self) -> list[tuple[str, ...]]:
        out: dict = {}
        self._walk(self.entries[0].child, (), out)
        return sorted(out)

    def read_stream(self, path: tuple[str, ...]) -> bytes:
        out: dict = {}
        self._walk(self.entries[0].child, (), out)
        if path not in out:
            raise CfbError(f"no stream {path}")
        e = out[path]
        if e.size < MINI_CUTOFF:
            return self._read_mini_chain(e.start, e.size)
        return self._read_chain(e.start, e.size)


# ---------------------------------------------------------------------------
# writer (fixture synthesis)
# ---------------------------------------------------------------------------


def _pad(b: bytes, unit: int) -> bytes:
    rem = len(b) % unit
    return b if rem == 0 else b + b"\x00" * (unit - rem)


def _dir_entry(
    name: str, typ: int, start: int, size: int,
    left: int = NOSTREAM, right: int = NOSTREAM, child: int = NOSTREAM,
) -> bytes:
    raw = bytearray(128)
    enc = name.encode("utf-16-le")
    raw[: len(enc)] = enc
    struct.pack_into("<H", raw, 64, len(enc) + 2)
    raw[66] = typ
    raw[67] = 1  # black
    struct.pack_into("<III", raw, 68, left, right, child)
    struct.pack_into("<I", raw, 116, start)
    struct.pack_into("<Q", raw, 120, size)
    return bytes(raw)


def cfb_write(streams: dict[tuple[str, ...], bytes]) -> bytes:
    """Serialize path-tuple -> bytes into a CFB container.

    One storage level is supported (paths of length 1 or 2) — all the HWP
    layout needs. Small streams (< 4096 B) go to the mini stream; large
    ones get regular FAT chains, so fixtures exercise both read paths.
    """
    # --- mini stream + mini FAT ------------------------------------------
    small = {p: b for p, b in streams.items() if len(b) < MINI_CUTOFF}
    big = {p: b for p, b in streams.items() if len(b) >= MINI_CUTOFF}
    mini_stream = b""
    minifat: list[int] = []
    mini_start: dict[tuple, int] = {}
    for p in sorted(small):
        if not small[p]:  # empty stream: no sectors, chain is ENDOFCHAIN
            mini_start[p] = ENDOFCHAIN
            continue
        data = _pad(small[p], MINI_SECT)
        n = len(data) // MINI_SECT
        mini_start[p] = len(minifat)
        minifat.extend(list(range(len(minifat) + 1, len(minifat) + n)) + [ENDOFCHAIN])
        mini_stream += data
    minifat_raw = _pad(
        b"".join(struct.pack("<I", v) for v in minifat) or struct.pack("<I", FREESECT),
        SECT,
    )

    # --- regular-sector layout: [mini stream][big streams][miniFAT][dir][FAT]
    sectors: list[bytes] = []
    fat: list[int] = []

    def alloc(data: bytes, mark: int | None = None) -> int:
        data = _pad(data, SECT)
        n = len(data) // SECT
        start = len(sectors)
        for i in range(n):
            sectors.append(data[SECT * i : SECT * (i + 1)])
            if mark is not None:
                fat.append(mark)
            else:
                fat.append(start + i + 1 if i < n - 1 else ENDOFCHAIN)
        return start

    ministream_start = alloc(mini_stream) if mini_stream else ENDOFCHAIN
    big_start = {p: alloc(big[p]) for p in sorted(big)}
    minifat_start = alloc(minifat_raw)
    n_minifat = len(minifat_raw) // SECT

    # --- directory tree: root -> right-sibling chains ---------------------
    top = sorted({p[0] for p in streams})
    entries: list[bytes] = [b""]  # root placeholder at index 0
    meta: list[dict] = [dict(name="Root Entry", typ=TYPE_ROOT)]

    def start_size(p: tuple) -> tuple[int, int]:
        if p in big_start:
            return big_start[p], len(big[p])
        return mini_start[p], len(small[p])

    # allocate ids in deterministic order: top-level first, then children
    ids: dict[tuple, int] = {}
    for name in top:
        ids[(name,)] = len(meta)
        meta.append(dict(name=name))
    for name in top:
        kids = sorted(p for p in streams if len(p) == 2 and p[0] == name)
        for p in kids:
            ids[p] = len(meta)
            meta.append(dict(name=p[1]))

    def sibling_chain(paths: list[tuple]) -> int:
        """Link as a right-sibling chain; returns head id (or NOSTREAM)."""
        if not paths:
            return NOSTREAM
        for a, b in zip(paths, paths[1:]):
            meta[ids[a]]["right"] = ids[b]
        return ids[paths[0]]

    for name in top:
        kids = sorted(p for p in streams if len(p) == 2 and p[0] == name)
        i = ids[(name,)]
        if (name,) in streams:
            meta[i].update(typ=TYPE_STREAM)
        else:
            meta[i].update(typ=TYPE_STORAGE, child=sibling_chain(kids))
        for p in kids:
            meta[ids[p]].update(typ=TYPE_STREAM)
    root_child = sibling_chain([(n,) for n in top])

    raw_entries = [
        _dir_entry(
            "Root Entry", TYPE_ROOT, ministream_start, len(mini_stream),
            child=root_child,
        )
    ]
    for m in meta[1:]:
        p = next(q for q, i in ids.items() if i == len(raw_entries))
        if m["typ"] == TYPE_STREAM:
            st, sz = start_size(p)
        else:
            st, sz = 0, 0
        raw_entries.append(
            _dir_entry(
                m["name"], m["typ"], st, sz,
                right=m.get("right", NOSTREAM), child=m.get("child", NOSTREAM),
            )
        )
    dir_raw = _pad(b"".join(raw_entries), SECT)
    dir_start = alloc(dir_raw)

    # --- FAT sector(s) -----------------------------------------------------
    n_data = len(sectors)
    n_fat = 1
    while (n_data + n_fat) * 4 > n_fat * SECT:
        n_fat += 1
    fat_start = len(sectors)
    fat_full = fat + [FATSECT] * n_fat
    fat_raw = _pad(b"".join(struct.pack("<I", v) for v in fat_full), SECT)
    fat_raw += b"\xff" * (n_fat * SECT - len(fat_raw))
    for i in range(n_fat):
        sectors.append(fat_raw[SECT * i : SECT * (i + 1)])

    # --- header ------------------------------------------------------------
    hdr = bytearray(SECT)
    hdr[:8] = MAGIC
    struct.pack_into("<H", hdr, 24, 0x003E)  # minor
    struct.pack_into("<H", hdr, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", hdr, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", hdr, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", hdr, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, MINI_CUTOFF)
    struct.pack_into("<I", hdr, 60, minifat_start)
    struct.pack_into("<I", hdr, 64, n_minifat)
    struct.pack_into("<I", hdr, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", hdr, 72, 0)
    for i in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * i, fat_start + i if i < n_fat else FREESECT)
    return bytes(hdr) + b"".join(sectors)
