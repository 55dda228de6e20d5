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

``write_container`` emits a fresh single-block file;
``append_container`` adds further blocks to an existing file (it
re-reads the header so appended blocks reuse the file's own schema,
codec, and sync marker). Both exist for tests and the sink-side "land
a batch as an .avro file" utility — DRIVER-side helpers by contract.
Large container files belong on the executor path instead:
``spark.read.format("binaryFile")`` + a mapInPandas decode against
``avro_lite`` (``read_container`` enforces this with a size guard).
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

# read_container materializes the whole file in driver memory — fine
# for the CLI replay / test fixtures it serves, an OOM for a data lake
# file. The guard fails fast with the executor-path pointer instead.
MAX_DRIVER_BYTES = 256 * 1024 * 1024
# append_container header-read bound: magic + metadata map + sync must
# fit; 4 MiB dwarfs any real schema while keeping the read cheap on
# block-laden files
_APPEND_HEADER_BYTES = 4 * 1024 * 1024


def _read_header(buf: io.BytesIO, path: str) -> tuple[dict, str, bytes]:
    """Parse magic + metadata map + sync → (schema, codec, sync)."""
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = avro_lite.decode(_META_SCHEMA, buf)
    schema = json.loads(
        meta[b"avro.schema"] if b"avro.schema" in meta else meta["avro.schema"]
    )
    codec = meta.get(b"avro.codec", meta.get("avro.codec", b"null"))
    if isinstance(codec, bytes):
        codec = codec.decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError(
            f"{path}: truncated Avro container — sync marker incomplete "
            f"({len(sync)}/16 bytes after the metadata map)"
        )
    return schema, codec, sync


def _encode_block(schema: dict, records: list, codec: str, sync: bytes) -> bytes:
    """Serialize one [count][size][data][sync] block."""
    body = io.BytesIO()
    for r in records:
        avro_lite.encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    out = io.BytesIO()
    out.write(avro_lite.zigzag_encode(len(records)))
    out.write(avro_lite.zigzag_encode(len(block)))
    out.write(block)
    out.write(sync)
    return out.getvalue()


def read_container(
    path: str, max_bytes: int = MAX_DRIVER_BYTES
) -> tuple[dict, list]:
    """Parse an Avro Object Container File → (schema, records).

    Driver-side by contract: refuses files over ``max_bytes`` (pass a
    larger limit explicitly to override) — route big containers
    through ``spark.read.format("binaryFile")`` + mapInPandas over
    ``avro_lite.decode`` so the bytes stay executor-side.
    """
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"{path}: {size} bytes exceeds the driver-side limit "
            f"({max_bytes}); read large .avro containers on executors "
            "via spark.read.format('binaryFile') + mapInPandas over "
            "avro_lite.decode, or pass max_bytes explicitly"
        )
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf, path)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = avro_lite.zigzag_decode(buf)
        size = avro_lite.zigzag_decode(buf)
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
    """Write records as a fresh single-block Avro Object Container
    File (truncates ``path``); grow an existing file with
    ``append_container``."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
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
            f.write(_encode_block(schema, records, codec, _SYNC))


def append_container(path: str, records: list) -> None:
    """Append one block to an EXISTING container file, reusing the
    file's own schema, codec, and sync marker (spec-conformant: a
    container is any number of sync-delimited blocks after the
    header)."""
    if not records:
        return
    with open(path, "rb") as f:
        # header prefix only: magic + metadata map + sync. 4 MiB bounds
        # the read for block-laden files while dwarfing any real schema
        head = f.read(_APPEND_HEADER_BYTES)
    try:
        schema, codec, sync = _read_header(io.BytesIO(head), path)
    except Exception as exc:
        # a metadata map that exhausts the bounded read window fails
        # deep inside the zigzag/map decode (EOFError) — or, if it
        # ends within 16 bytes of the window edge, as the truncated-
        # sync ValueError. Either way, when the window was read FULL
        # the file is not necessarily damaged: name the real cause.
        # only a file LARGER than the window can blame the window — a
        # file truncated at exactly the window size keeps its accurate
        # truncation/EOF diagnosis (round-8 review)
        window_edge = (
            len(head) == _APPEND_HEADER_BYTES
            and os.path.getsize(path) > _APPEND_HEADER_BYTES
            and (
                not isinstance(exc, ValueError)
                or "sync marker incomplete" in str(exc)
            )
        )
        if window_edge:
            raise ValueError(
                f"{path}: container header exceeds the "
                f"{_APPEND_HEADER_BYTES}-byte append read window "
                "(oversized metadata map?) — read the file with "
                "read_container and rewrite it instead"
            ) from exc
        raise
    with open(path, "ab") as f:
        f.write(_encode_block(schema, records, codec, sync))
