"""Avro binary codec + Confluent Schema Registry wire format.

Pure-python implementation of the public Avro 1.x binary encoding
(zigzag varints, little-endian floats, length-prefixed bytes/str,
index-prefixed unions, block-encoded maps/arrays) for the schema
shapes dbsink feeds carry — primitives, records, unions, maps, arrays,
enums, fixed. Reference behavior being reproduced: the Avro consumer
path of dbsink (reference dbsink/utils.py:33-41, schema.avsc).

The Confluent framing is ``0x00 magic | 4-byte big-endian schema id |
avro binary body`` — what a Schema-Registry-aware producer puts on the
topic. ``RegistryClient`` fetches schemas over the registry's public
REST surface (GET /schemas/ids/{id}, /subjects/{s}/versions/latest).

In Spark the JVM fast path is ``from_avro`` (see
``codecs.spark_from_avro``) when the spark-avro module is on the
classpath; this module is the python-side twin used by Arrow-batched
mapping transforms and by environments without the jar (like this
one).
"""

from __future__ import annotations

import io
import json
import struct
import urllib.request


# ---------------------------------------------------------------- encode

def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag + varint. Public — the object-container module
    (`avro_container`) uses these for block headers, so they are part
    of this module's cross-module contract, not internals."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


# internal aliases (every encoder/decoder below predates the public
# promotion and calls the underscore names)
_zigzag_encode = zigzag_encode
_zigzag_decode = zigzag_decode


def _union_branch(schema: list, value) -> int:
    """Pick the union branch for a python value (null, bool, int→long
    preferred, float→double preferred, str, bytes, dict→map/record,
    list→array)."""

    def matches(s, v):
        t = s["type"] if isinstance(s, dict) else s
        if v is None:
            return t == "null"
        if isinstance(v, bool):
            return t == "boolean"
        if isinstance(v, int):
            return t in ("long", "int")
        if isinstance(v, float):
            return t in ("double", "float")
        if isinstance(v, str):
            return t in ("string", "enum")
        if isinstance(v, (bytes, bytearray)):
            return t in ("bytes", "fixed")
        if isinstance(v, dict):
            return t in ("map", "record")
        if isinstance(v, (list, tuple)):
            return t == "array"
        return False

    # prefer the widest numeric branch (long/double) like standard encoders
    order = sorted(
        range(len(schema)),
        key=lambda i: (
            (schema[i]["type"] if isinstance(schema[i], dict) else schema[i])
            not in ("long", "double")
        ),
    )
    for i in order:
        if matches(schema[i], value):
            return i
    # promotion pass: int is encodable as float/double (Avro numeric
    # promotion) when the union has no integer branch
    if isinstance(value, int) and not isinstance(value, bool):
        for i in order:
            t = schema[i]["type"] if isinstance(schema[i], dict) else schema[i]
            if t in ("double", "float"):
                return i
    raise TypeError(f"no union branch for {type(value).__name__} in {schema}")


def encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        i = _union_branch(schema, value)
        out.write(_zigzag_encode(i))
        encode(schema[i], value, out)
        return
    else:
        t = schema["type"]

    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag_encode(int(value)))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "string":
        raw = value.encode("utf-8")
        out.write(_zigzag_encode(len(raw)))
        out.write(raw)
    elif t == "bytes":
        out.write(_zigzag_encode(len(value)))
        out.write(bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                v = value[f["name"]]
            elif "default" in f:
                v = f["default"]
            else:
                raise KeyError(f"record field {f['name']!r} missing and has no default")
            encode(f["type"], v, out)
    elif t == "map":
        if value:
            out.write(_zigzag_encode(len(value)))
            for k, v in value.items():
                raw = k.encode("utf-8")
                out.write(_zigzag_encode(len(raw)))
                out.write(raw)
                encode(schema["values"], v, out)
        out.write(_zigzag_encode(0))
    elif t == "array":
        if value:
            out.write(_zigzag_encode(len(value)))
            for v in value:
                encode(schema["items"], v, out)
        out.write(_zigzag_encode(0))
    elif t == "enum":
        out.write(_zigzag_encode(schema["symbols"].index(value)))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(bytes(value))
    else:
        raise TypeError(f"avro_lite cannot encode type {t!r}")


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Checked read: truncated wire input must RAISE, not decode to a
    wrong value (an EOF boolean must not become False, a short string
    must not silently truncate)."""
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"avro_lite: truncated input (wanted {n} bytes, got {len(data)})")
    return data


def decode(schema, buf: io.BytesIO):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        i = _zigzag_decode(buf)
        return decode(schema[i], buf)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if t == "string":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n).decode("utf-8")
    if t == "bytes":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n)
    if t == "record":
        return {f["name"]: decode(f["type"], buf) for f in schema["fields"]}
    if t == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                _ = _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                klen = _zigzag_decode(buf)
                k = _read_exact(buf, klen).decode("utf-8")
                out[k] = decode(schema["values"], buf)
    if t == "array":
        items = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return items
            if n < 0:
                _ = _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                items.append(decode(schema["items"], buf))
    if t == "enum":
        return schema["symbols"][_zigzag_decode(buf)]
    if t == "fixed":
        return _read_exact(buf, schema["size"])
    raise TypeError(f"avro_lite cannot decode type {t!r}")


def dumps(schema, value) -> bytes:
    out = io.BytesIO()
    encode(schema, value, out)
    return out.getvalue()


def loads(schema, data: bytes):
    return decode(schema, io.BytesIO(data))


# ------------------------------------------------- Confluent wire framing

MAGIC = 0


def frame(schema_id: int, body: bytes) -> bytes:
    return bytes([MAGIC]) + schema_id.to_bytes(4, "big") + body


def unframe(data: bytes) -> tuple[int, bytes]:
    if not data or data[0] != MAGIC:
        raise ValueError("not a Confluent-framed Avro message (bad magic byte)")
    return int.from_bytes(data[1:5], "big"), data[5:]


# ------------------------------------------------------- registry client

class RegistryClient:
    """Minimal Schema Registry REST client (schema fetch only, cached)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self._by_id: dict[int, object] = {}

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(f"{self.url}{path}") as resp:  # noqa: S310
            return json.load(resp)

    def schema_by_id(self, schema_id: int):
        if schema_id not in self._by_id:
            payload = self._get(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = json.loads(payload["schema"])
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, object]:
        """(schema_id, parsed schema) for a subject's latest version.
        Kafka convention: value schemas live under '<topic>-value'."""
        payload = self._get(f"/subjects/{subject}/versions/latest")
        schema = json.loads(payload["schema"])
        self._by_id[payload["id"]] = schema
        return payload["id"], schema
