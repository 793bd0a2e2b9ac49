"""TypedBytes wire codec — Hadoop Streaming's binary record format.

Re-expresses the typedbytes encoding (hadoop-tools/hadoop-streaming
.../typedbytes/TypedBytesInput.java / TypedBytesOutput.java,
IdentifierResolver.java:36-37 ``-io typedbytes`` — SURVEY §2.3/§1.2):
a 1-byte type code followed by a big-endian payload.

Type codes (TypedBytesInput.java readType):
  0 bytes, 1 byte, 2 bool, 3 int, 4 long, 5 float, 6 double, 7 string,
  8 vector, 9 list (0xFF-terminated), 10 map.

The codec is pure Python and symmetric (``loads(dumps(x)) == x``). The
line-oriented ``rdd.pipe`` boundary can't carry raw binary frames, so pipes
that need typedbytes wrap each frame in base64 via ``dumps_b64``/``loads_b64``
— the subprocess sees one encoded frame per line (framing is the transport's
job in the reference too; the HTTP shuffle does it there).
"""

from __future__ import annotations

import base64
import struct
from io import BytesIO

BYTES, BYTE, BOOL, INT, LONG, FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = range(11)
_LIST_END = 0xFF
# Decoder-side terminator marker. MUST be out-of-band (a unique object): the
# integer 255 is a legal decoded VALUE, and comparing values against the
# terminator byte truncated lists containing it (found by hypothesis).
_END = object()


def _write(obj, out: BytesIO) -> None:
    if isinstance(obj, bool):  # before int — bool is an int subclass
        out.write(bytes([BOOL, 1 if obj else 0]))
    elif isinstance(obj, (bytes, bytearray)):
        out.write(bytes([BYTES]))
        out.write(struct.pack(">i", len(obj)))
        out.write(bytes(obj))
    elif isinstance(obj, int):
        if -(2**31) <= obj < 2**31:
            out.write(bytes([INT]))
            out.write(struct.pack(">i", obj))
        else:
            out.write(bytes([LONG]))
            out.write(struct.pack(">q", obj))
    elif isinstance(obj, float):
        out.write(bytes([DOUBLE]))
        out.write(struct.pack(">d", obj))
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out.write(bytes([STRING]))
        out.write(struct.pack(">i", len(b)))
        out.write(b)
    elif isinstance(obj, tuple):  # vector: counted sequence
        out.write(bytes([VECTOR]))
        out.write(struct.pack(">i", len(obj)))
        for x in obj:
            _write(x, out)
    elif isinstance(obj, list):  # list: terminator-delimited sequence
        out.write(bytes([LIST]))
        for x in obj:
            _write(x, out)
        out.write(bytes([_LIST_END]))
    elif isinstance(obj, dict):
        out.write(bytes([MAP]))
        out.write(struct.pack(">i", len(obj)))
        for k, v in obj.items():
            _write(k, out)
            _write(v, out)
    else:
        raise TypeError(f"typedbytes cannot encode {type(obj).__name__}")


def _read(inp: BytesIO):
    t = inp.read(1)
    if not t:
        raise EOFError("typedbytes: truncated stream")
    code = t[0]
    if code == _LIST_END:
        return _END  # out-of-band sentinel consumed by the LIST branch
    if code == BYTES:
        (n,) = struct.unpack(">i", inp.read(4))
        return inp.read(n)
    if code == BYTE:
        return struct.unpack(">b", inp.read(1))[0]
    if code == BOOL:
        return inp.read(1)[0] != 0
    if code == INT:
        return struct.unpack(">i", inp.read(4))[0]
    if code == LONG:
        return struct.unpack(">q", inp.read(8))[0]
    if code == FLOAT:
        return struct.unpack(">f", inp.read(4))[0]
    if code == DOUBLE:
        return struct.unpack(">d", inp.read(8))[0]
    if code == STRING:
        (n,) = struct.unpack(">i", inp.read(4))
        return inp.read(n).decode("utf-8")
    if code == VECTOR:
        (n,) = struct.unpack(">i", inp.read(4))
        return tuple(_read(inp) for _ in range(n))
    if code == LIST:
        out = []
        while True:
            v = _read(inp)
            if v is _END:
                break
            out.append(v)
        return out
    if code == MAP:
        (n,) = struct.unpack(">i", inp.read(4))
        return {_read(inp): _read(inp) for _ in range(n)}
    raise ValueError(f"typedbytes: unknown type code {code}")


def dumps(obj) -> bytes:
    """Encode one value as a typedbytes frame."""
    out = BytesIO()
    _write(obj, out)
    return out.getvalue()


def loads(frame: bytes):
    """Decode one typedbytes frame to a value."""
    return _read(BytesIO(frame))


def dumps_kv(key, value) -> bytes:
    """Encode a (key, value) record — the streaming wire unit."""
    return dumps(key) + dumps(value)


def loads_kv(frame: bytes):
    inp = BytesIO(frame)
    return _read(inp), _read(inp)


def dumps_b64(key, value) -> str:
    """One base64 line per record — the rdd.pipe-safe framing."""
    return base64.b64encode(dumps_kv(key, value)).decode("ascii")


def loads_b64(line: str):
    return loads_kv(base64.b64decode(line))
