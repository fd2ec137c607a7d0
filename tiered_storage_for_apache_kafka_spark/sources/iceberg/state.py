"""Table-metadata state: version files, refs, prior-state loading.

Split from the original sources/iceberg.py (r7); provenance and
parity citations live in the package __init__ and the function
docstrings.
"""

from __future__ import annotations

import json
import os
import re

from tiered_storage_for_apache_kafka_spark.sources.iceberg.ocf import (
    read_avro_ocf,
)


def _advance_main(refs: dict | None, snapshot_id: int) -> dict:
    """New refs map for a commit: advance the ``main`` branch head,
    PRESERVE every other ref — user tags and branches must survive
    unrelated commits (spec "Snapshot References"; clobbering them was
    a latent bug while main was the only ref that ever existed)."""
    out = dict(refs or {})
    out["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    return out


def _default_spec(meta: dict) -> dict:
    """The table's DEFAULT partition spec (``default-spec-id`` — new
    writes use it; older data files stay scoped to the spec their
    manifest records, per the Iceberg spec's evolution rules)."""
    sid = meta.get("default-spec-id", 0)
    return next(s for s in meta["partition-specs"] if s["spec-id"] == sid)


def _specs_by_id(meta: dict) -> dict[int, dict]:
    """spec-id -> spec dict, for interpreting each manifest's partition
    struct/summary under the spec it was written with."""
    return {s["spec-id"]: s for s in meta["partition-specs"]}


def _current_schema_struct(meta: dict) -> dict:
    """The metadata's current schema struct (single place to fail on a
    missing/corrupt current-schema-id)."""
    return next(
        sc for sc in meta["schemas"] if sc["schema-id"] == meta["current-schema-id"]
    )


def _write_metadata_version(meta_dir: str, version: int, meta: dict) -> None:
    """Write v{N}.metadata.json + version-hint atomically-enough for the
    single-writer model all three maintenance/commit paths share.

    ``metadata-log`` is capped to the table property
    ``write.metadata.previous-versions-max`` (Iceberg's default 100) —
    without the cap every commit re-serializes an ever-growing history
    list and long-lived streaming tables pay O(table-age) per commit
    for a log nobody walks past its head."""
    cap = int(
        (meta.get("properties") or {}).get(
            "write.metadata.previous-versions-max", 100
        )
    )
    log = meta.get("metadata-log") or []
    if len(log) > cap:
        meta = {**meta, "metadata-log": log[-cap:]}
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))


def _prev_total_records(meta: dict) -> int:
    """Running table total from the current snapshot's summary (correct
    across expiration and compaction, unlike summing surviving
    snapshots' added-records)."""
    cur_id = meta.get("current-snapshot-id", -1)
    if cur_id == -1:
        return 0
    cur = next((s for s in meta["snapshots"] if s["snapshot-id"] == cur_id), None)
    if cur is None:
        return 0
    return int(cur["summary"].get("total-records", 0))



def _default_table_name(table_dir: str) -> str:
    """The one naming rule for catalog tables defaulted from a path —
    every catalog call site must use this (a writer and reader deriving
    names differently would split one table across two catalog
    entries)."""
    return os.path.basename(os.path.normpath(table_dir))


def _current_state_meta(
    table_dir: str, catalog=None, table_name: str | None = None
) -> tuple[int, dict, str | None]:
    """(version, metadata, resolved_table_name) WITHOUT parsing
    manifests — for consumers that only need metadata.json content
    (replay-skip checks, time travel, maintenance state): parsing every
    manifest Avro just to read snapshot summaries would make those
    paths O(table) instead of O(metadata)."""
    if catalog is None:
        version, meta = _load_current_metadata(table_dir)
        return version, meta, table_name
    if table_name is None:
        table_name = _default_table_name(table_dir)
    resp = catalog.load_table(table_name)
    if resp is None:
        raise FileNotFoundError(f"table {table_name!r} not in catalog")
    m = re.search(r"v(\d+)\.metadata\.json$", resp["metadata-location"])
    return (int(m.group(1)) if m else 1), resp["metadata"], table_name


def _load_prior_state(table_dir: str, catalog=None, table_name: str | None = None):
    """Current table state for a commit: from the version-hint file
    layout, or — when a REST catalog is configured — from the catalog
    service (`GET /v1/namespaces/{ns}/tables/{t}`), which is then the
    source of truth for the metadata pointer. Manifest files themselves
    live in storage either way, so entry parsing is shared."""
    if catalog is None:
        return read_table_metadata(table_dir)
    if table_name is None:
        table_name = _default_table_name(table_dir)
    resp = catalog.load_table(table_name)
    if resp is None:
        return None
    meta = resp["metadata"]
    m = re.search(r"v(\d+)\.metadata\.json$", resp["metadata-location"])
    version = int(m.group(1)) if m else 1
    manifest_files, manifests = _parse_current_manifests(meta)
    return {
        "version": version,
        "metadata": meta,
        "manifest_list": manifest_files,
        "manifests": manifests,
    }



def _prev_summary_counter(
    meta: dict, key: str, at_snapshot_id: int | None = None
) -> int:
    """Running counter from a snapshot's summary — the CURRENT one by
    default, or an explicit lineage head (branch commits chain their
    totals off the branch parent, not off main)."""
    cur_id = (
        meta.get("current-snapshot-id", -1)
        if at_snapshot_id is None
        else at_snapshot_id
    )
    if cur_id == -1:
        return 0
    cur = next((s for s in meta["snapshots"] if s["snapshot-id"] == cur_id), None)
    if cur is None:
        return 0
    return int(cur["summary"].get(key, 0))


def _prev_total_pos_deletes(meta: dict) -> int:
    return _prev_summary_counter(meta, "total-position-deletes")



def _parse_current_manifests(meta: dict) -> tuple[list[dict], list[dict]]:
    """Current snapshot's manifest list (Avro) -> each manifest (Avro) ->
    data-file entries; shared by the file-layout and REST-catalog loaders
    (the manifests live in storage in both protocols)."""
    manifests: list[dict] = []
    manifest_files: list[dict] = []
    if meta.get("current-snapshot-id", -1) != -1:
        cur = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, manifest_files, _ = read_avro_ocf(cur["manifest-list"])
        for mf in manifest_files:
            _, entries, mmeta = read_avro_ocf(mf["manifest_path"])
            manifests.append({"file": mf, "entries": entries, "meta": mmeta})
    return manifest_files, manifests


def read_table_metadata(table_dir: str) -> dict | None:
    """Open the table the way an external HadoopCatalog reader does:
    version-hint → v{N}.metadata.json → current snapshot's manifest
    list (Avro) → each manifest (Avro) → data-file entries. Returns
    ``{"version", "metadata", "manifest_list", "manifests"}`` or None
    when no metadata exists yet."""
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as f:
        version = int(f.read().strip())
    with open(os.path.join(table_dir, "metadata", f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    manifest_files, manifests = _parse_current_manifests(meta)
    return {
        "version": version,
        "metadata": meta,
        "manifest_list": manifest_files,
        "manifests": manifests,
    }


# -- the read side: scan planning FROM the Iceberg metadata -------------------



def _load_current_metadata(table_dir: str) -> tuple[int, dict]:
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        raise FileNotFoundError(f"no Iceberg metadata under {table_dir}")
    with open(hint) as f:
        version = int(f.read().strip())
    with open(os.path.join(table_dir, "metadata", f"v{version}.metadata.json")) as f:
        return version, json.load(f)



def _maintenance_state(table_dir: str, catalog, table_name: str | None):
    """(version, metadata, table_name) for a maintenance op — from the
    file layout, or from the catalog service when one manages the
    table (maintaining a catalog table through the file layout would
    fork the pointer: the next catalog commit would silently undo it).
    Metadata-only: the maintenance ops read the manifest lists they
    need themselves."""
    return _current_state_meta(table_dir, catalog, table_name)


def _maintenance_requirements(meta: dict) -> list[dict]:
    head = (meta.get("refs") or {}).get("main", {}).get("snapshot-id")
    return [
        {"type": "assert-table-uuid", "uuid": meta["table-uuid"]},
        {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": head},
    ]
