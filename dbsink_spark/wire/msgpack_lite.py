"""Minimal MessagePack codec (pure python, no dependencies).

Implements the public MessagePack spec for the types a dbsink message
can contain: nil, bool, int, float, str, bin, array, map. Mirrors the
reference's codec contract (reference dbsink/utils.py:42-45):

* pack: ``use_bin_type=True`` semantics — ``bytes`` use the bin family,
  ``str`` the str family.
* unpack: ``use_list=False`` (arrays decode to tuples) and
  ``raw=False`` (str payloads decode to ``str``).

Used as the fallback when the real ``msgpack`` wheel is absent; the
byte output is spec-canonical (smallest representation), so payloads
interoperate with any conforming implementation.
"""

from __future__ import annotations

import struct


def packb(obj) -> bytes:
    buf = bytearray()
    _pack(obj, buf)
    return bytes(buf)


def _pack(obj, buf: bytearray) -> None:
    if obj is None:
        buf.append(0xC0)
    elif obj is True:
        buf.append(0xC3)
    elif obj is False:
        buf.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, buf)
    elif isinstance(obj, float):
        buf.append(0xCB)
        buf += struct.pack(">d", obj)
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        n = len(raw)
        if n < 32:
            buf.append(0xA0 | n)
        elif n < 2**8:
            buf += struct.pack(">BB", 0xD9, n)
        elif n < 2**16:
            buf += struct.pack(">BH", 0xDA, n)
        else:
            buf += struct.pack(">BI", 0xDB, n)
        buf += raw
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 2**8:
            buf += struct.pack(">BB", 0xC4, n)
        elif n < 2**16:
            buf += struct.pack(">BH", 0xC5, n)
        else:
            buf += struct.pack(">BI", 0xC6, n)
        buf += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            buf.append(0x90 | n)
        elif n < 2**16:
            buf += struct.pack(">BH", 0xDC, n)
        else:
            buf += struct.pack(">BI", 0xDD, n)
        for item in obj:
            _pack(item, buf)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            buf.append(0x80 | n)
        elif n < 2**16:
            buf += struct.pack(">BH", 0xDE, n)
        else:
            buf += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, buf)
            _pack(v, buf)
    else:
        raise TypeError(f"msgpack_lite cannot pack {type(obj).__name__}")


def _pack_int(x: int, buf: bytearray) -> None:
    if 0 <= x <= 0x7F:
        buf.append(x)
    elif -32 <= x < 0:
        buf.append(x + 0x100)  # 0xE0..0xFF two's-complement negative fixint
    elif 0 < x < 2**8:
        buf += struct.pack(">BB", 0xCC, x)
    elif 0 < x < 2**16:
        buf += struct.pack(">BH", 0xCD, x)
    elif 0 < x < 2**32:
        buf += struct.pack(">BI", 0xCE, x)
    elif 0 < x < 2**64:
        buf += struct.pack(">BQ", 0xCF, x)
    elif -(2**7) <= x < 0:
        buf += struct.pack(">Bb", 0xD0, x)
    elif -(2**15) <= x < 0:
        buf += struct.pack(">Bh", 0xD1, x)
    elif -(2**31) <= x < 0:
        buf += struct.pack(">Bi", 0xD2, x)
    elif -(2**63) <= x < 0:
        buf += struct.pack(">Bq", 0xD3, x)
    else:
        raise OverflowError(f"int out of msgpack range: {x}")


def unpackb(data: bytes):
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after msgpack object at {pos}")
    return obj


def _unpack(mv: memoryview, pos: int):
    b = mv[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(mv, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(mv, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return str(mv[pos : pos + n], "utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):
        width = {0xC4: 1, 0xC5: 2, 0xC6: 4}[b]
        n = int.from_bytes(mv[pos : pos + width], "big")
        pos += width
        return bytes(mv[pos : pos + n]), pos + n
    if b == 0xCA:
        return struct.unpack_from(">f", mv, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", mv, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        width = {0xCC: 1, 0xCD: 2, 0xCE: 4, 0xCF: 8}[b]
        return int.from_bytes(mv[pos : pos + width], "big"), pos + width
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        width = {0xD0: 1, 0xD1: 2, 0xD2: 4, 0xD3: 8}[b]
        return int.from_bytes(mv[pos : pos + width], "big", signed=True), pos + width
    if b in (0xD9, 0xDA, 0xDB):
        width = {0xD9: 1, 0xDA: 2, 0xDB: 4}[b]
        n = int.from_bytes(mv[pos : pos + width], "big")
        pos += width
        return str(mv[pos : pos + n], "utf-8"), pos + n
    if b in (0xDC, 0xDD):
        width = {0xDC: 2, 0xDD: 4}[b]
        n = int.from_bytes(mv[pos : pos + width], "big")
        return _unpack_array(mv, pos + width, n)
    if b in (0xDE, 0xDF):
        width = {0xDE: 2, 0xDF: 4}[b]
        n = int.from_bytes(mv[pos : pos + width], "big")
        return _unpack_map(mv, pos + width, n)
    raise ValueError(f"msgpack_lite: unsupported type byte 0x{b:02x}")


def _unpack_array(mv: memoryview, pos: int, n: int):
    items = []
    for _ in range(n):
        obj, pos = _unpack(mv, pos)
        items.append(obj)
    return tuple(items), pos  # use_list=False semantics


def _unpack_map(mv: memoryview, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        out[k] = v
    return out, pos
