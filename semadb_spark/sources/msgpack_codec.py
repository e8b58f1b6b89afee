"""Minimal msgpack codec (public spec: https://msgpack.org/ spec.md).

The environment has no msgpack package, so S1's application/msgpack request
decode (reference httpapi/utils/encdec.go:44-56) is backed by this
self-contained implementation of the format families the point API uses:
nil/bool, all int widths, float32/64, str/bin, array, map. Ext types are
decoded to an (ExtType code, bytes) tuple for completeness; the point schema
never produces them.

``packb`` exists for round-trip tests and symmetric client use; it always
emits the shortest encoding for a value (like reference clients do).
"""

from __future__ import annotations

import struct
from typing import Any, NamedTuple


class ExtType(NamedTuple):
    code: int
    data: bytes


class MsgpackError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Decoding


def unpackb(data: bytes) -> Any:
    """Decode one msgpack object; trailing bytes are an error."""
    obj, off = _decode(memoryview(data), 0)
    if off != len(data):
        raise MsgpackError(f"trailing bytes after msgpack object at offset {off}")
    return obj


def _take(buf: memoryview, off: int, n: int) -> tuple[memoryview, int]:
    if off + n > len(buf):
        raise MsgpackError("truncated msgpack data")
    return buf[off : off + n], off + n


def _decode(buf: memoryview, off: int) -> tuple[Any, int]:
    if off >= len(buf):
        raise MsgpackError("truncated msgpack data")
    b = buf[off]
    off += 1
    # fix families
    if b <= 0x7F:  # positive fixint
        return b, off
    if b >= 0xE0:  # negative fixint
        return b - 0x100, off
    if 0x80 <= b <= 0x8F:
        return _decode_map(buf, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _decode_array(buf, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        raw, off = _take(buf, off, b & 0x1F)
        return str(raw, "utf-8"), off
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        n, off = _decode_len(buf, off, 1 << (b - 0xC4))
        raw, off = _take(buf, off, n)
        return bytes(raw), off
    if b in (0xC7, 0xC8, 0xC9):  # ext8/16/32
        n, off = _decode_len(buf, off, 1 << (b - 0xC7))
        code, off = _take(buf, off, 1)
        raw, off = _take(buf, off, n)
        return ExtType(struct.unpack(">b", code)[0], bytes(raw)), off
    if b == 0xCA:
        raw, off = _take(buf, off, 4)
        return struct.unpack(">f", raw)[0], off
    if b == 0xCB:
        raw, off = _take(buf, off, 8)
        return struct.unpack(">d", raw)[0], off
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        n = 1 << (b - 0xCC)
        raw, off = _take(buf, off, n)
        return int.from_bytes(raw, "big", signed=False), off
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        n = 1 << (b - 0xD0)
        raw, off = _take(buf, off, n)
        return int.from_bytes(raw, "big", signed=True), off
    if 0xD4 <= b <= 0xD8:  # fixext1/2/4/8/16
        n = 1 << (b - 0xD4)
        code, off = _take(buf, off, 1)
        raw, off = _take(buf, off, n)
        return ExtType(struct.unpack(">b", code)[0], bytes(raw)), off
    if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
        n, off = _decode_len(buf, off, 1 << (b - 0xD9))
        raw, off = _take(buf, off, n)
        return str(raw, "utf-8"), off
    if b in (0xDC, 0xDD):  # array16/32
        n, off = _decode_len(buf, off, 2 << (b - 0xDC))
        return _decode_array(buf, off, n)
    if b in (0xDE, 0xDF):  # map16/32
        n, off = _decode_len(buf, off, 2 << (b - 0xDE))
        return _decode_map(buf, off, n)
    raise MsgpackError(f"unknown msgpack type byte 0x{b:02x}")


def _decode_len(buf: memoryview, off: int, width: int) -> tuple[int, int]:
    raw, off = _take(buf, off, width)
    return int.from_bytes(raw, "big", signed=False), off


def _decode_array(buf: memoryview, off: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, off = _decode(buf, off)
        out.append(v)
    return out, off


def _decode_map(buf: memoryview, off: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, off = _decode(buf, off)
        v, off = _decode(buf, off)
        if not isinstance(k, str):
            # JSON-tagged struct maps always key by string; reject others to
            # keep parity with the reference's struct decode
            raise MsgpackError(f"non-string map key {k!r}")
        out[k] = v
    return out, off


# ---------------------------------------------------------------------------
# Encoding (shortest form)


def packb(obj: Any) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _encode(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _encode_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        n = len(raw)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDB)
            out += n.to_bytes(4, "big")
        out += raw
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        raw = bytes(obj)
        n = len(raw)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xC6)
            out += n.to_bytes(4, "big")
        out += raw
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDD)
            out += n.to_bytes(4, "big")
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDF)
            out += n.to_bytes(4, "big")
        for k, v in obj.items():
            if not isinstance(k, str):
                raise MsgpackError(f"non-string map key {k!r}")
            _encode(k, out)
            _encode(v, out)
    else:
        raise MsgpackError(f"cannot msgpack-encode {type(obj).__name__}")


def _encode_int(v: int, out: bytearray) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v <= 0xFF:
        out += bytes((0xCC, v))
    elif 0 <= v <= 0xFFFF:
        out.append(0xCD)
        out += v.to_bytes(2, "big")
    elif 0 <= v <= 0xFFFFFFFF:
        out.append(0xCE)
        out += v.to_bytes(4, "big")
    elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
        out.append(0xCF)
        out += v.to_bytes(8, "big")
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += v.to_bytes(1, "big", signed=True)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += v.to_bytes(2, "big", signed=True)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += v.to_bytes(4, "big", signed=True)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += v.to_bytes(8, "big", signed=True)
    else:
        raise MsgpackError(f"integer out of msgpack range: {v}")
