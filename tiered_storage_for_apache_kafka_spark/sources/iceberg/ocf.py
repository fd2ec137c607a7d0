"""Avro Object Container File codec + the Iceberg format version.

Split from the original sources/iceberg.py (r7); provenance and
parity citations live in the package __init__ and the function
docstrings.
"""

from __future__ import annotations

import io
import json

from tiered_storage_for_apache_kafka_spark.avro import avro_decode, avro_encode


FORMAT_VERSION = 2

# -- Avro Object Container File (Avro spec section "Object Container Files") --

_OCF_MAGIC = b"Obj\x01"
_OCF_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_avro_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    extra_meta: dict[str, bytes] | None = None,
) -> int:
    """Write records as a single-block Avro OCF; returns the file length.
    The sync marker is derived deterministically from the schema + path
    so repeated commits of identical content are byte-identical."""
    import hashlib

    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    meta.update(extra_meta or {})
    sync = hashlib.md5(path.encode() + meta["avro.schema"]).digest()
    out = io.BytesIO()
    out.write(_OCF_MAGIC)
    out.write(avro_encode(meta, _OCF_META_SCHEMA))
    out.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            block.write(avro_encode(rec, schema))
        payload = block.getvalue()
        buf = io.BytesIO()
        avro_encode(len(records), "long", buf)
        avro_encode(len(payload), "long", buf)
        out.write(buf.getvalue())
        out.write(payload)
        out.write(sync)
    data = out.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def read_avro_ocf(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Read an Avro OCF back: (schema-from-header, records, file meta).
    Decodes against the schema parsed from the file header — the same
    thing an external reader does — not a Python-side schema object."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta = avro_decode(buf, _OCF_META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = avro_decode(buf, "long")
        _size = avro_decode(buf, "long")
        for _ in range(n):
            records.append(avro_decode(buf, schema))
        if buf.read(16) != sync:
            raise ValueError("Avro OCF sync marker mismatch")
    return schema, records, meta


# -- Spark schema -> Iceberg schema (field-id assignment) ---------------------
