"""Minimal Apache Iceberg Puffin file writer/reader (the public Puffin
spec: https://iceberg.apache.org/puffin-spec/).

Parity target: the reference packages each segment's Kafka aux indexes
and a data-file list as Puffin blobs and registers the file as an
Iceberg snapshot statistics file (`iceberg/manifest/SegmentManifest
Writer.java:35-112`, blob type names in `BlobTypes.java`). This module
implements the container format itself in pure Python:

    Magic | blob payloads ... | Magic | FooterPayload (JSON) |
    FooterPayloadSize (4-byte LE) | Flags (4 bytes) | Magic

Blobs are written uncompressed (``compression-codec`` omitted), which
every Puffin reader accepts. The footer JSON carries per-blob
``type / fields / snapshot-id / sequence-number / offset / length``
exactly as the spec requires, so an external Iceberg reader can load
the statistics file without this engine present.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"

# reference blob type names (BlobTypes.java) — public contract
OFFSET_INDEX = "aiven-tiered-storage-offset-index"
TIMESTAMP_INDEX = "aiven-tiered-storage-timestamp-index"
PRODUCER_SNAPSHOT_INDEX = "aiven-tiered-storage-producer-snapshot-index"
TRANSACTION_INDEX = "aiven-tiered-storage-transaction-index"
LEADER_EPOCH_INDEX = "aiven-tiered-storage-leader-epoch-index"
FILE_LIST = "aiven-tiered-storage-file-list"


def write_puffin(
    path: str,
    blobs: list[tuple[str, bytes]],
    snapshot_id: int,
    sequence_number: int,
    created_by: str = "tiered-storage-for-apache-kafka spark engine",
) -> dict:
    """Write a Puffin file; blobs are (type, payload) in order. A type
    may appear only once (`SegmentManifestWriter.writeBlob` contract).
    Returns {"file_size", "footer_size", "blob_metadata"} — the fields
    an Iceberg ``statistics`` entry needs (GenericStatisticsFile)."""
    seen: set[str] = set()
    for btype, _ in blobs:
        if btype in seen:
            raise ValueError(f"{btype} blob already written")
        seen.add(btype)
    return write_puffin_file(
        path,
        [{"type": btype, "payload": payload} for btype, payload in blobs],
        snapshot_id=snapshot_id,
        sequence_number=sequence_number,
        created_by=created_by,
    )


def read_puffin(path: str) -> dict:
    """Read a Puffin file the way an external reader does: validate the
    leading magic, seek to the trailing footer (Magic..payload..size..
    flags..Magic), parse the footer JSON, then slice each blob by its
    recorded offset/length. Returns {"blobs": {type: bytes},
    "metadata": footer-json}."""
    entries, meta = _read_puffin_entries(path)
    return {
        "blobs": {e["type"]: e["payload"] for e in entries},
        "metadata": meta,
    }


DELETION_VECTOR_V1 = "deletion-vector-v1"  # Iceberg v3 DV blob type


def write_puffin_file(
    path: str,
    blob_specs: list[dict],
    snapshot_id: int,
    sequence_number: int,
    created_by: str = "tiered-storage-for-apache-kafka spark engine",
) -> dict:
    """Generalized Puffin writer: a blob spec is ``{"type", "payload",
    "properties"?, "fields"?}``. Unlike :func:`write_puffin` (the
    reference's one-blob-per-type segment manifests), a type may repeat
    — Iceberg v3 deletion vectors store MANY ``deletion-vector-v1``
    blobs in one file, distinguished by their ``referenced-data-file``
    property. Returns the same shape plus per-blob offsets."""
    out = bytearray(MAGIC)
    blob_meta = []
    for spec in blob_specs:
        offset = len(out)
        payload = spec["payload"]
        out += payload
        bm = {
            "type": spec["type"],
            "fields": list(spec.get("fields") or []),
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "offset": offset,
            "length": len(payload),
        }
        if spec.get("properties"):
            bm["properties"] = dict(spec["properties"])
        blob_meta.append(bm)
    footer_payload = json.dumps(
        {"blobs": blob_meta, "properties": {"created-by": created_by}}
    ).encode()
    footer_start = len(out)
    out += MAGIC
    out += footer_payload
    out += struct.pack("<i", len(footer_payload))
    out += struct.pack("<i", 0)
    out += MAGIC
    with open(path, "wb") as f:
        f.write(out)
    return {
        "file_size": len(out),
        "footer_size": len(out) - footer_start,
        "blob_metadata": blob_meta,
    }


def read_puffin_blobs(path: str) -> list[dict]:
    """Read a Puffin file preserving repeated blob types: returns a
    list of ``{"type", "properties", "payload"}`` in footer order (the
    dict-keyed :func:`read_puffin` collapses repeats)."""
    entries, _meta = _read_puffin_entries(path)
    return entries


def _read_puffin_entries(path: str) -> tuple[list[dict], dict]:
    """Shared footer parse for :func:`read_puffin` /
    :func:`read_puffin_blobs`: validate magics, parse the footer JSON,
    slice each blob by its recorded offset/length."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError("not a Puffin file: bad leading magic")
    if data[-4:] != MAGIC:
        raise ValueError("not a Puffin file: bad trailing magic")
    (flags,) = struct.unpack("<i", data[-8:-4])
    if flags & 0x1:
        raise ValueError("compressed Puffin footer payload not supported")
    (payload_size,) = struct.unpack("<i", data[-12:-8])
    payload_end = len(data) - 12
    payload_start = payload_end - payload_size
    if data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError("Puffin footer magic mismatch")
    meta = json.loads(data[payload_start:payload_end].decode())
    entries = []
    for bm in meta["blobs"]:
        start, length = bm["offset"], bm["length"]
        if start + length > payload_start - 4:
            raise ValueError("Puffin blob overlaps the footer")
        if bm.get("compression-codec"):
            raise ValueError("compressed Puffin blobs not supported")
        entries.append(
            {
                "type": bm["type"],
                "fields": list(bm.get("fields") or []),
                "properties": bm.get("properties") or {},
                "payload": data[start : start + length],
            }
        )
    return entries, meta
