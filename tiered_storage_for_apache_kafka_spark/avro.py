"""Minimal Avro binary codec + Confluent wire-format header + registry.

Parity target: the reference's Iceberg-mode record decode (I2) resolves
each key/value's schema from the 5-byte Confluent wire header (magic
``0x00`` + big-endian 4-byte schema id, `IcebergRemoteStorageManager.
java:346-350`) against Schema Registry
(`AvroSchemaRegistryStructureProvider.java:33-92`), falling back to raw
``bytes`` when the payload doesn't parse (:283-289).

This module implements the public Avro 1.x binary encoding (zigzag
varints, length-prefixed strings/bytes, unions by branch index, arrays
in blocks — the Apache Avro specification) in pure Python so executors
can decode without any external binding, plus a `LocalSchemaRegistry`
with the same id→schema contract as a real registry client. Supported
types cover the reference's conversion matrix (`SchemaUtils.java:48-58`):
null, boolean, int, long, float, double, bytes, string, record, array,
map, union.

Everything here is driver/executor-side Python; the Spark-facing decode
stage lives in `sources/segment_source.py::decode_avro_records`.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

MAGIC = 0


# -- zigzag varint ------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while (n & ~0x7F) != 0:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n]))


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# -- encode / decode against a schema ----------------------------------------


def avro_encode(value: Any, schema: Any, out: io.BytesIO | None = None) -> bytes:
    top = out is None
    if out is None:
        out = io.BytesIO()
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, list):  # union: branch index then value
        for i, branch in enumerate(schema):
            if _matches(value, branch):
                _write_long(out, i)
                avro_encode(value, branch, out)
                break
        else:
            raise TypeError(f"value {value!r} matches no union branch {schema}")
    elif t == "null":
        pass
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_long(out, len(value))
        out.write(value)
    elif t == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif t == "record":
        for field in schema["fields"]:
            avro_encode(value[field["name"]], field["type"], out)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                avro_encode(item, schema["items"], out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                avro_encode(k, "string", out)
                avro_encode(v, schema["values"], out)
        _write_long(out, 0)
    else:
        raise TypeError(f"unsupported Avro type {t!r}")
    return out.getvalue() if top else b""


def _matches(value: Any, schema: Any) -> bool:
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return value is None
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t == "string":
        return isinstance(value, str)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


def avro_decode(data: bytes | io.BytesIO, schema: Any) -> Any:
    buf = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, list):
        idx = _read_long(buf)
        return avro_decode(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "record":
        return {f["name"]: avro_decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(avro_decode(buf, schema["items"]))
        return out
    if t == "map":
        out_m: dict = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode("utf-8")
                out_m[k] = avro_decode(buf, schema["values"])
        return out_m
    raise TypeError(f"unsupported Avro type {t!r}")


# -- Confluent wire format + registry -----------------------------------------


def confluent_frame(schema_id: int, payload: bytes) -> bytes:
    """magic byte 0x00 + 4-byte big-endian schema id + Avro body."""
    return struct.pack(">bI", MAGIC, schema_id) + payload


def parse_confluent_header(data: bytes) -> tuple[int, bytes] | None:
    """Return (schema_id, body) or None when the frame is not wire-format
    (wrong magic / too short) — the caller keeps raw bytes (fallback
    typing, `IcebergRemoteStorageManager.java:283-289`)."""
    if len(data) < 5 or data[0] != MAGIC:
        return None
    (schema_id,) = struct.unpack(">I", data[1:5])
    return schema_id, data[5:]


class LocalSchemaRegistry:
    """id → schema store with the registry-client contract (register /
    get-by-id). Serializable as a plain dict so executors can hold it;
    swap for a confluent-kafka client in production."""

    def __init__(self, schemas: dict[int, Any] | None = None):
        self._schemas: dict[int, Any] = dict(schemas or {})

    def register(self, schema_id: int, schema: Any) -> None:
        self._schemas[schema_id] = schema

    def get(self, schema_id: int) -> Any | None:
        return self._schemas.get(schema_id)

    def to_json(self) -> str:
        return json.dumps({str(k): v for k, v in self._schemas.items()})

    @classmethod
    def from_json(cls, s: str) -> "LocalSchemaRegistry":
        return cls({int(k): v for k, v in json.loads(s).items()})

    def decode(self, data: bytes | None) -> tuple[Any | None, bytes | None]:
        """Registry-driven decode with fallback typing: returns
        (parsed, None) on success, (None, raw) when the payload has no
        wire header, an unknown schema id, or fails to parse."""
        if data is None:
            return None, None
        header = parse_confluent_header(bytes(data))
        if header is None:
            return None, bytes(data)
        schema_id, body = header
        schema = self.get(schema_id)
        if schema is None:
            return None, bytes(data)
        try:
            return avro_decode(body, schema), None
        except Exception:
            return None, bytes(data)


class HttpSchemaRegistry:
    """Confluent Schema Registry REST client (stdlib-only, no external
    dependency) with the same decode contract as `LocalSchemaRegistry`
    — the network twin of the reference's
    `AvroSchemaRegistryStructureProvider.java:33-92`.

    Implements the two calls the decode path needs:

    - ``GET  /schemas/ids/{id}``               (schema by global id)
    - ``POST /subjects/{subject}/versions``    (register, returns id)

    Schemas are cached per id after first fetch (the reference caches via
    `CachedSchemaRegistryClient`); unknown ids / network failures degrade
    to fallback typing (raw bytes), never an executor crash. For executor
    distribution, `snapshot()` exports the warmed cache as a
    `LocalSchemaRegistry` so the hot decode loop never does I/O.
    """

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._cache: dict[int, Any] = {}

    def _request(self, method: str, path: str, payload: dict | None = None):
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
            method=method,
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    def register(self, subject: str, schema: Any) -> int:
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": json.dumps(schema)},
        )
        schema_id = int(out["id"])
        self._cache[schema_id] = schema
        return schema_id

    def get(self, schema_id: int) -> Any | None:
        cached = self._cache.get(schema_id)
        if cached is not None:
            return cached
        try:
            out = self._request("GET", f"/schemas/ids/{schema_id}")
        except Exception:
            return None  # unknown id / registry down → fallback typing
        schema = json.loads(out["schema"])
        self._cache[schema_id] = schema
        return schema

    def snapshot(self) -> LocalSchemaRegistry:
        """Warmed-cache export for broadcast to executors (decode loops
        must not perform per-record HTTP)."""
        return LocalSchemaRegistry(dict(self._cache))

    # same decode contract as LocalSchemaRegistry
    decode = LocalSchemaRegistry.decode
