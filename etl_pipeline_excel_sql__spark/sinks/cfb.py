"""Minimal Compound File Binary (OLE2) writer + reader, pure stdlib.

Implements just enough of the PUBLIC [MS-CFB] specification (Microsoft
Open Specifications, v3 / 512-byte sectors) to carry a VBA project
storage inside an ``.xlsm``: a root storage, nested storages, and
streams, with small streams in the mini stream as the spec requires
(cutoff 4096, 64-byte mini sectors).

Deliberate simplifications, each spec-legal:

* at most 109 FAT sectors (header DIFAT only — caps file size at ~55 MB,
  far above any macro project);
* directory red-black metadata is emitted as a BALANCED BST with every
  node black. [MS-CFB] 2.6.4 explicitly tells readers to tolerate
  writer red-black violations ("an implementation MAY not validate" /
  known writers emit non-conforming trees); name ordering (length, then
  case-insensitive) IS honored, which is what readers key on.
* timestamps zero (spec-legal "unknown").

The reader half exists for round-trip tests and is written against the
spec, not against the writer's internals (it follows FAT/miniFAT chains
and the directory tree like any foreign reader would).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

SECT = 512
MINISECT = 64
MINI_CUTOFF = 4096

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD

_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _name_key(name: str) -> tuple[int, str]:
    """[MS-CFB] 2.6.4 directory ordering: length first, then uppercase."""
    return (len(name), name.upper())


@dataclass
class _Entry:
    name: str
    objtype: int  # 1 storage, 2 stream, 5 root
    data: bytes = b""
    children: dict[str, "_Entry"] = field(default_factory=dict)
    # assigned during layout:
    sid: int = -1
    left: int = FREESECT
    right: int = FREESECT
    child: int = FREESECT
    start: int = ENDOFCHAIN
    size: int = 0


class CfbWriter:
    """Collects (path, bytes) streams, then serializes one CFB file."""

    def __init__(self) -> None:
        self._root = _Entry("Root Entry", 5)

    def add_stream(self, path: tuple[str, ...], data: bytes) -> None:
        if not path:
            raise ValueError("empty path")
        for part in path:  # 64B name field: 31 UTF-16 chars + null
            if len(part.encode("utf-16-le")) > 62:
                raise ValueError(f"name too long: {part!r}")
        node = self._root
        for part in path[:-1]:
            node = node.children.setdefault(part, _Entry(part, 1))
            if node.objtype != 1:
                raise ValueError(f"{part!r} is not a storage")
        leaf = path[-1]
        if leaf in node.children:
            raise ValueError(f"duplicate stream {path!r}")
        node.children[leaf] = _Entry(leaf, 2, data=data)

    # -- layout ----------------------------------------------------------
    def _flatten(self) -> list[_Entry]:
        """Assign stream ids: root is 0; each storage's children form a
        balanced BST threaded via left/right/child sids."""
        order: list[_Entry] = [self._root]

        def walk(storage: _Entry) -> None:
            kids = sorted(storage.children.values(), key=lambda e: _name_key(e.name))
            for k in kids:
                k.sid = len(order)
                order.append(k)
            # balanced BST over the sorted kids
            def build(lo: int, hi: int) -> int:
                if lo > hi:
                    return FREESECT
                mid = (lo + hi) // 2
                kids[mid].left = build(lo, mid - 1)
                kids[mid].right = build(mid + 1, hi)
                return kids[mid].sid

            storage.child = build(0, len(kids) - 1)
            for k in kids:
                if k.objtype == 1:
                    walk(k)

        walk(self._root)
        return order

    def tobytes(self) -> bytes:
        entries = self._flatten()
        streams = [e for e in entries if e.objtype == 2]

        # mini stream: concatenation of all small streams, 64B-padded
        mini_parts: list[bytes] = []
        minifat: list[int] = []
        for e in streams:
            if 0 < len(e.data) < MINI_CUTOFF:
                first = len(minifat)
                n = (len(e.data) + MINISECT - 1) // MINISECT
                mini_parts.append(
                    e.data + b"\x00" * (n * MINISECT - len(e.data))
                )
                minifat.extend(list(range(first + 1, first + n)) + [ENDOFCHAIN])
                e.start, e.size = first, len(e.data)
            elif len(e.data) == 0:
                e.start, e.size = ENDOFCHAIN, 0
        ministream = b"".join(mini_parts)

        # sector plan: [FAT][dir...][miniFAT...][ministream...][big...]
        def nsect(nbytes: int) -> int:
            return (nbytes + SECT - 1) // SECT

        ndir = nsect(len(entries) * 128) or 1
        nminifat = nsect(len(minifat) * 4)
        nmini = nsect(len(ministream))
        big = [e for e in streams if len(e.data) >= MINI_CUTOFF]
        nbig = sum(nsect(len(e.data)) for e in big)
        total = 1 + ndir + nminifat + nmini + nbig
        if total > 128:  # one FAT sector maps 128 sectors
            nfat = (total + 127) // 128  # re-plan with nfat FAT sectors
            while nfat * 128 < nfat + ndir + nminifat + nmini + nbig:
                nfat += 1
            if nfat > 109:
                raise ValueError("file too large for header-DIFAT-only CFB")
        else:
            nfat = 1

        fat: list[int] = [FREESECT] * (nfat * 128)
        pos = 0
        for _ in range(nfat):
            fat[pos] = FATSECT
            pos += 1
        dir_start = pos
        for i in range(ndir):
            fat[pos] = pos + 1 if i < ndir - 1 else ENDOFCHAIN
            pos += 1
        minifat_start = pos if nminifat else ENDOFCHAIN
        for i in range(nminifat):
            fat[pos] = pos + 1 if i < nminifat - 1 else ENDOFCHAIN
            pos += 1
        mini_start = pos if nmini else ENDOFCHAIN
        for i in range(nmini):
            fat[pos] = pos + 1 if i < nmini - 1 else ENDOFCHAIN
            pos += 1
        for e in big:
            n = nsect(len(e.data))
            e.start, e.size = pos, len(e.data)
            for i in range(n):
                fat[pos] = pos + 1 if i < n - 1 else ENDOFCHAIN
                pos += 1

        root = entries[0]
        root.start = mini_start
        root.size = len(ministream)

        # header
        difat = [FREESECT] * 109
        for i in range(nfat):
            difat[i] = i
        header = struct.pack(
            "<8s16sHHHHH6sIIIIIIIII",
            _SIG,
            b"\x00" * 16,
            0x003E,  # minor
            0x0003,  # major (v3)
            0xFFFE,  # little-endian
            0x0009,  # 512B sectors
            0x0006,  # 64B mini sectors
            b"\x00" * 6,
            0,  # num dir sectors (MUST be 0 for v3)
            nfat,
            dir_start,
            0,  # transaction signature
            MINI_CUTOFF,
            minifat_start,
            nminifat,
            ENDOFCHAIN,  # first DIFAT sector (header-only)
            0,  # num DIFAT sectors
        ) + b"".join(struct.pack("<I", s) for s in difat)
        assert len(header) == SECT

        # directory sectors
        dirbytes = b"".join(_pack_entry(e) for e in entries)
        dirbytes += b"\x00" * (ndir * SECT - len(dirbytes))

        fatbytes = b"".join(struct.pack("<I", v) for v in fat)
        minifatbytes = b"".join(struct.pack("<I", v) for v in minifat)
        minifatbytes += b"\x00" * (nminifat * SECT - len(minifatbytes))
        minibytes = ministream + b"\x00" * (nmini * SECT - len(ministream))
        bigbytes = b"".join(
            e.data + b"\x00" * (nsect(len(e.data)) * SECT - len(e.data))
            for e in big
        )
        return header + fatbytes + dirbytes + minifatbytes + minibytes + bigbytes


def _pack_entry(e: _Entry) -> bytes:
    raw = e.name.encode("utf-16-le")
    if len(raw) > 62:
        raise ValueError(f"name too long: {e.name!r}")
    return struct.pack(
        "<64sHBBIII16sIQQIQ",
        raw + b"\x00\x00",
        len(raw) + 2,
        e.objtype,
        1,  # black
        e.left,
        e.right,
        e.child,
        b"\x00" * 16,
        0,  # state bits
        0,
        0,  # timestamps
        0 if e.objtype == 1 else e.start,  # storages MUST carry 0
        e.size,
    )


# -- reader --------------------------------------------------------------


def _chain(fat: list[int], start: int) -> list[int]:
    out, s = [], start
    while s not in (ENDOFCHAIN, FREESECT):
        out.append(s)
        s = fat[s]
        if len(out) > len(fat):
            raise ValueError("FAT chain cycle")
    return out


def read_cfb(data: bytes) -> dict[tuple[str, ...], bytes]:
    """Parse a CFB file into {path: stream bytes} (spec-driven reader)."""
    if data[:8] != _SIG:
        raise ValueError("not a CFB file")
    (
        nfat,
        dir_start,
        _tsig,
        cutoff,
        minifat_start,
        nminifat,
    ) = struct.unpack_from("<IIIIII", data, 44)
    difat = list(struct.unpack_from("<109I", data, 76))

    def sector(i: int) -> bytes:
        return data[SECT + i * SECT : SECT + (i + 1) * SECT]

    fatbytes = b"".join(sector(s) for s in difat[:nfat])
    fat = list(struct.unpack(f"<{len(fatbytes) // 4}I", fatbytes))

    dirbytes = b"".join(sector(s) for s in _chain(fat, dir_start))
    entries = []
    for off in range(0, len(dirbytes), 128):
        raw = dirbytes[off : off + 128]
        if len(raw) < 128:
            break
        (nlen,) = struct.unpack_from("<H", raw, 64)
        if nlen == 0:
            continue
        name = raw[: nlen - 2].decode("utf-16-le")
        objtype = raw[66]
        left, right, child = struct.unpack_from("<III", raw, 68)
        (start,) = struct.unpack_from("<I", raw, 116)
        (size,) = struct.unpack_from("<Q", raw, 120)
        entries.append((name, objtype, left, right, child, start, size))

    root = entries[0]
    ministream = b"".join(sector(s) for s in _chain(fat, root[5]))[: root[6]]
    minifatbytes = b"".join(sector(s) for s in _chain(fat, minifat_start))
    minifat = (
        list(struct.unpack(f"<{len(minifatbytes) // 4}I", minifatbytes))
        if nminifat
        else []
    )

    def stream_bytes(start: int, size: int) -> bytes:
        if size == 0:
            return b""
        if size < cutoff:
            chunks = [
                ministream[s * MINISECT : (s + 1) * MINISECT]
                for s in _chain(minifat, start)
            ]
        else:
            chunks = [sector(s) for s in _chain(fat, start)]
        return b"".join(chunks)[:size]

    out: dict[tuple[str, ...], bytes] = {}

    def walk(sid: int, prefix: tuple[str, ...]) -> None:
        if sid in (FREESECT, ENDOFCHAIN) or sid >= len(entries):
            return
        name, objtype, left, right, child, start, size = entries[sid]
        walk(left, prefix)
        walk(right, prefix)
        if objtype == 2:
            out[prefix + (name,)] = stream_bytes(start, size)
        elif objtype == 1:
            walk(child, prefix + (name,))

    walk(root[4], ())
    return out
