"""Avro Object Container File reader/writer (pure python).

Closes the "avro FILE" source gap this environment leaves open: the
spark-avro connector jar is absent, so ``.avro`` container files were
unreadable even though the wire codec (`avro_lite`) fully handles the
binary record encoding. The container format is public spec
(https://avro.apache.org/docs/current/specification/#object-container-files):

    magic 'Obj\\x01'
    file-metadata map (bytes->bytes): avro.schema (JSON), avro.codec
    16-byte sync marker
    repeated blocks: [record-count long][byte-size long][data][sync]

Codecs supported: ``null`` (raw) and ``deflate`` (zlib raw stream,
RFC 1951 — the two codecs the spec requires every implementation to
read). Records decode through ``avro_lite.decode`` — the same
schema-driven walker the Confluent wire path uses, so both paths stay
semantics-identical.

The writer exists for tests and for the sink-side "land a batch as an
.avro file" utility; single-block-per-call keeps it simple (callers
append blocks by re-calling ``write_block``).
"""

from __future__ import annotations

import io
import json
import os
import zlib

from . import avro_lite

MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}
_SYNC = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"


def read_container(path: str) -> tuple[dict, list]:
    """Parse an Avro Object Container File → (schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = avro_lite.decode(_META_SCHEMA, buf)
    schema = json.loads(meta[b"avro.schema"] if b"avro.schema" in meta else meta["avro.schema"])
    codec = meta.get(b"avro.codec", meta.get("avro.codec", b"null"))
    if isinstance(codec, bytes):
        codec = codec.decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = avro_lite._zigzag_decode(buf)
        size = avro_lite._zigzag_decode(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bb = io.BytesIO(block)
        for _ in range(n):
            records.append(avro_lite.decode(schema, bb))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, records


def write_container(path: str, schema: dict, records: list, codec: str = "null") -> None:
    """Write records as a single-block Avro Object Container File."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    body = io.BytesIO()
    for r in records:
        avro_lite.encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        out = io.BytesIO()
        avro_lite.encode(_META_SCHEMA, meta, out)
        f.write(out.getvalue())
        f.write(_SYNC)
        if records:
            cnt = io.BytesIO()
            cnt.write(avro_lite._zigzag_encode(len(records)))
            cnt.write(avro_lite._zigzag_encode(len(block)))
            f.write(cnt.getvalue())
            f.write(block)
            f.write(_SYNC)
