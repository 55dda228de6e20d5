"""Wire codecs for message values: json / msgpack / avro.

Mirrors the reference's packing choices (reference dbsink/utils.py:33-51):
``json`` (default), ``msgpack`` (optional dependency, gated), ``avro``
(Schema Registry driven, gated). Each codec is a (pack, unpack) pair
used by the batch replay source to simulate the wire and by the
streaming decode stage.

NaN/Infinity are scrubbed to null on pack, matching the reference's
``ignore_nan=True`` (dbsink/utils.py:46-49; golden
tests/test_dbsink.py:64-76).

In the Spark pipeline the decode happens either:
* JVM-side with ``from_json``/``from_avro`` when a fixed wire schema is
  declared (fast path), or
* inside the mapping's Arrow-batched ``mapInPandas`` for dynamic
  payloads (these ``unpack`` callables).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass

from .functions.structural import scrub_special_floats


@dataclass(frozen=True)
class Codec:
    name: str
    pack: Callable[[object], bytes | str]
    unpack: Callable[[bytes | str], object]


def _json_pack(obj) -> str:
    return json.dumps(scrub_special_floats(obj))


def _json_unpack(raw) -> object:
    if isinstance(raw, (bytes, bytearray)):
        raw = raw.decode("utf-8")
    return json.loads(raw)


JSON_CODEC = Codec("json", _json_pack, _json_unpack)


def _msgpack_codec() -> Codec:
    try:
        import msgpack  # type: ignore
    except ImportError as e:  # pragma: no cover - gated dependency
        raise ImportError("msgpack is not installed; use packing='json'") from e

    return Codec(
        "msgpack",
        lambda obj: msgpack.packb(obj, use_bin_type=True),
        lambda raw: msgpack.loads(raw, use_list=False, raw=False),
    )


def _avro_codec(registry_url: str) -> Codec:  # pragma: no cover - gated dependency
    raise ImportError(
        "avro decoding requires a Schema Registry client; in Spark use "
        "pyspark.sql.avro.functions.from_avro with the fetched schema JSON"
    )


def get_codec(packing: str = "json", registry_url: str | None = None) -> Codec:
    if packing == "json":
        return JSON_CODEC
    if packing == "msgpack":
        return _msgpack_codec()
    if packing == "avro":
        return _avro_codec(registry_url or "")
    raise ValueError(f"unknown packing {packing!r}")
