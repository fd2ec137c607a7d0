"""Avro wire-format decode (I2 parity): codec round-trips (hypothesis),
Confluent header resolution, fallback typing, and the distributed
mapInPandas decode stage over tiered segments."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.avro import (
    LocalSchemaRegistry,
    avro_decode,
    avro_encode,
    confluent_frame,
    parse_confluent_header,
)

RECORD_SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "user_id", "type": "long"},
        {"name": "value", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "scores", "type": {"type": "array", "items": "int"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
    ],
}


@given(
    user_id=st.integers(min_value=-(2**62), max_value=2**62),
    value=st.floats(allow_nan=False, allow_infinity=False),
    tag=st.none() | st.text(max_size=40),
    scores=st.lists(st.integers(min_value=-(2**30), max_value=2**30), max_size=8),
    attrs=st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_avro_roundtrip_property(user_id, value, tag, scores, attrs):
    rec = {"user_id": user_id, "value": value, "tag": tag,
           "scores": scores, "attrs": attrs}
    assert avro_decode(avro_encode(rec, RECORD_SCHEMA), RECORD_SCHEMA) == rec


def test_confluent_header():
    body = avro_encode({"user_id": 1, "value": 2.0, "tag": None,
                        "scores": [], "attrs": {}}, RECORD_SCHEMA)
    framed = confluent_frame(7, body)
    assert parse_confluent_header(framed) == (7, body)
    assert parse_confluent_header(b"\x01xxxxxx") is None  # wrong magic
    assert parse_confluent_header(b"\x00\x00") is None  # short


def test_registry_fallback_typing():
    reg = LocalSchemaRegistry({1: RECORD_SCHEMA})
    rec = {"user_id": 5, "value": 1.5, "tag": "t", "scores": [1],
           "attrs": {"a": "b"}}
    ok, raw = reg.decode(confluent_frame(1, avro_encode(rec, RECORD_SCHEMA)))
    assert ok == rec and raw is None
    # unknown schema id -> raw preserved
    blob = confluent_frame(99, b"\x01\x02")
    ok, raw = reg.decode(blob)
    assert ok is None and raw == blob
    # non-wire payload -> raw preserved
    ok, raw = reg.decode(b"plain bytes")
    assert ok is None and raw == b"plain bytes"
    # registry serde round-trip
    reg2 = LocalSchemaRegistry.from_json(reg.to_json())
    assert reg2.get(1) == RECORD_SCHEMA


def test_distributed_avro_decode_over_tiered_segments(spark, tmp_path):
    """End-to-end: avro-framed values tiered into segments, read back and
    decoded executor-side via the registry; one record deliberately
    non-wire → lands in value_raw."""
    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        decode_avro_records,
        manager_conf,
        read_tiered_records,
        tier_events_table,
    )

    schema = {"type": "record", "name": "V", "fields": [
        {"name": "k", "type": "long"}]}
    reg = LocalSchemaRegistry({1: schema})

    rows = []
    for i in range(200):
        if i % 50 == 7:
            payload = b"not-avro-%d" % i
        else:
            payload = confluent_frame(1, avro_encode({"k": i * 10}, schema))
        rows.append((i, "2024-01-01 00:00:00", i % 5, "t", float(i), payload))
    events = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
              "value DOUBLE, props BINARY",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # reuse the tiering writer: value column = our avro payloads
    events = events.withColumn("props", F.base64("props"))  # JSON-safe carry

    conf = manager_conf(str(tmp_path / "store"), chunk_size=1024)
    manifests = tier_events_table(spark, events, conf)
    records = read_tiered_records(spark, manifests, conf)
    # swap the JSON value for the raw avro payload carried in props
    payload = F.unbase64(
        F.get_json_object(F.col("value").cast("string"), "$.props")
    )
    records = records.withColumn("value", payload)

    decoded = decode_avro_records(records, reg.to_json()).cache()
    good = decoded.filter(F.col("value_json").isNotNull())
    fell_back = decoded.filter(F.col("value_raw").isNotNull())
    assert decoded.count() == 200
    assert fell_back.count() == 4  # offsets 7, 57, 107, 157
    assert good.count() == 196
    k_by_offset = {
        r.offset: json.loads(r.value_json)["k"] for r in good.collect()
    }
    assert all(k == off * 10 for off, k in k_by_offset.items())
    raws = {bytes(r.value_raw) for r in fell_back.collect()}
    assert raws == {b"not-avro-%d" % i for i in (7, 57, 107, 157)}
    assert good.select("schema_id").distinct().collect() == [(1,)]


def test_http_schema_registry_roundtrip():
    """HttpSchemaRegistry speaks the Confluent REST contract (stdlib
    urllib) against a local stub: register → get-by-id → cached decode →
    snapshot() export for executors; unknown ids and a downed registry
    degrade to fallback typing."""
    import http.server
    import threading

    from tiered_storage_for_apache_kafka_spark.avro import HttpSchemaRegistry

    store: dict[int, str] = {}
    next_id = [0]

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/schemas/ids/"):
                sid = int(self.path.rsplit("/", 1)[1])
                if sid in store:
                    self._send(200, {"schema": store[sid]})
                else:
                    self._send(404, {"error_code": 40403, "message": "not found"})
            else:
                self._send(404, {"error_code": 404, "message": "bad path"})

        def do_POST(self):
            if self.path.startswith("/subjects/") and self.path.endswith("/versions"):
                n = int(self.headers["Content-Length"])
                req = json.loads(self.rfile.read(n).decode())
                next_id[0] += 1
                store[next_id[0]] = req["schema"]
                self._send(200, {"id": next_id[0]})
            else:
                self._send(404, {"error_code": 404, "message": "bad path"})

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        reg = HttpSchemaRegistry(url)
        sid = reg.register("events-value", RECORD_SCHEMA)
        assert sid == 1

        # fresh client: fetches by id over HTTP, then caches
        reader = HttpSchemaRegistry(url)
        assert reader.get(sid) == RECORD_SCHEMA
        assert reader.get(999) is None  # unknown id -> fallback typing

        value = {
            "user_id": 7, "value": 1.5, "tag": "t",
            "scores": [1, 2], "attrs": {"a": "b"},
        }
        frame = confluent_frame(sid, avro_encode(value, RECORD_SCHEMA))
        parsed, raw = reader.decode(frame)
        assert parsed == value and raw is None
        parsed, raw = reader.decode(b"\x01not-wire")
        assert parsed is None and raw == b"\x01not-wire"

        # snapshot(): warmed cache exported for executor broadcast
        local = reader.snapshot()
        assert local.get(sid) == RECORD_SCHEMA
        parsed, _ = local.decode(frame)
        assert parsed == value
    finally:
        srv.shutdown()

    # registry unreachable: get degrades to None (fallback), no raise
    dead = HttpSchemaRegistry("http://127.0.0.1:1", timeout=0.2)
    assert dead.get(1) is None
