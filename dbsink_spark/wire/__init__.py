"""Wire-format implementations (public specs, dependency-free).

``msgpack_lite`` — MessagePack (https://msgpack.org/ spec) pack/unpack
with the same surface the reference uses (`packb(use_bin_type=True)` /
`loads(use_list=False, raw=False)` — reference dbsink/utils.py:42-45).

``avro_lite`` — Avro binary encoding (Avro 1.x specification) plus the
Confluent Schema Registry wire framing (magic byte + 4-byte schema id)
the reference's Avro consumer consumes (reference dbsink/utils.py:33-41).
"""
