"""Incremental windows and the changelog reader.

Split from the original sources/iceberg.py (r7); provenance and
parity citations live in the package __init__ and the function
docstrings.
"""

from __future__ import annotations

import os as _os

from tiered_storage_for_apache_kafka_spark.sources.iceberg.manifests import (
    _is_rewrite_output,
    _read_planned_files,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.ocf import (
    read_avro_ocf,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
    _apply_residuals,
    _empty_table_df,
    _file_matches,
    _manifest_pruned,
    _plan_snapshot,
    _read_plan_with_identity,
    _read_snapshot,
    _resolve_constraints,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
    _current_state_meta,
    _specs_by_id,
)


def plan_incremental_scan(
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
    source_predicates: dict | None = None,
) -> list[dict]:
    """Iceberg incremental APPEND scan (what Spark's
    ``spark.readStream.format("iceberg")`` and batch
    ``start-snapshot-id`` options plan): the data files appended
    STRICTLY AFTER ``from_snapshot_id`` up to and including
    ``to_snapshot_id`` (default: current). Selection is by data
    sequence number — robust across `rewrite_manifests`, whose
    carried-over entries keep their original sequence numbers, so
    compaction is never mistaken for new data.

    A row-delta (delete) snapshot inside the window is an explicit
    error, exactly like the Java incremental append scan: silently
    handing a consumer appended rows while hiding that other rows were
    retracted would corrupt any downstream incremental materialization.
    An expired ``from_snapshot_id`` is an error too (the changelog gap
    is unrecoverable; re-bootstrap from a full scan).

    ``source_predicates`` (as in :func:`plan_scan`) SCOPES the window
    to the matching partitions: files of other partitions are pruned
    (manifest summaries first, partition tuples second), and — the
    per-partition append-only contract — a delete file is only a
    window error when its partition scope can overlap the predicate's;
    a consumer materializing one day's partition is neither billed for
    nor blocked by retractions elsewhere in the table."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    return _plan_incremental_from_meta(
        meta, from_snapshot_id, to_snapshot_id,
        _resolve_constraints(meta, None, None, None, source_predicates),
    )


def _is_engine_dv(d: dict, location: str) -> bool:
    """Whether a PUFFIN delete entry is an ENGINE-produced deletion
    vector: written by `commit_deletion_vectors` into the table's own
    ``deletes/`` dir with a per-blob locator and referenced data file.
    Foreign DVs (another writer's Puffin) stay excluded from keyed
    resolution — whether their bitmap is fresh or re-stamps a
    superseded predecessor is unknowable, and a re-stamped retraction
    emitted at the new sequence would wrongly retract keys re-inserted
    since."""
    p = str(d.get("file_path", ""))
    rel = _os.path.relpath(p, location)
    return (
        not rel.startswith("..")
        and rel.split(_os.sep)[0] == "deletes"
        and _os.path.basename(p).startswith("dv-")
        and p.endswith(".puffin")
        and d.get("referenced_data_file") is not None
        and d.get("content_offset") is not None
        and d.get("content_size_in_bytes") is not None
    )


def dv_keyed_plan(meta: dict, dv_entries: list[dict]) -> list[dict]:
    """Resolve window DV entries to executor-ready KEYED-RETRACTION
    plans (r13): each returns the locator of the bitmap holding
    exactly the rows NEWLY retracted at that entry's sequence.

    Four cases, in order:
    - the entry's Puffin file carries an ``engine-dv-delta-v1``
      sibling blob for the referenced file (every r13+ supersede
      writes one) — its locator is the plan;
    - the spec blob itself carries the ``delta: self`` property
      (every r13+ FIRST DV stamps it) — the blob is certified
      entirely fresh, durably (no manifest-history proof needed, so
      snapshot expiration cannot invalidate it);
    - neither stamp (a pre-delta commit) but the current manifests
      list NO prior DV for the file below the entry's seq, with the
      tombstone GC horizon at <= 1 (full history live, so nothing
      listable was dropped) — the spec blob is provably fresh;
    - otherwise REFUSE: a pre-delta superseding DV (or one whose
      predecessors' tombstones were GC'd) re-stamps old retractions
      at its own seq, and emitting them keyed would retract
      re-inserted keys. The caller surfaces the standard
      re-bootstrap recipe.

    Driver cost: one Puffin footer parse per distinct window DV file
    plus one manifest sweep for priors — both O(window), only on DV
    windows."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
        ENGINE_DV_DELTA_V1,
    )
    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        _read_puffin_entries,
    )

    gc_horizon = min(
        (int(s["sequence-number"]) for s in meta.get("snapshots", [])),
        default=0,
    )
    # prior DV entries (ANY status — supersede tombstones included)
    # per referenced file, from the current manifest list
    refs = {e["referenced_data_file"] for e in dv_entries}
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mfs, _ = read_avro_ocf(cur["manifest-list"])
    priors_by_ref: dict[str, list[dict]] = {}
    for mf in mfs:
        if int(mf.get("content") or 0) != 1:
            continue
        _, entries, _ = read_avro_ocf(mf["manifest_path"])
        for e in entries:
            d = e["data_file"]
            ref = d.get("referenced_data_file")
            if (
                d.get("content") == 1
                and d.get("file_format") == "PUFFIN"
                and ref in refs
            ):
                seq = e.get("sequence_number")
                if seq is None:
                    seq = mf.get("sequence_number", 0)
                priors_by_ref.setdefault(ref, []).append(
                    {
                        "file_path": d["file_path"],
                        "content_offset": d.get("content_offset"),
                        "content_size_in_bytes": d.get(
                            "content_size_in_bytes"
                        ),
                        "_seq": int(seq),
                    }
                )
    footer_cache: dict[str, list[dict]] = {}
    out = []
    for e in dv_entries:
        path, ref = e["file_path"], e["referenced_data_file"]
        if path not in footer_cache:
            _entries, fmeta = _read_puffin_entries(path)
            footer_cache[path] = fmeta["blobs"]
        delta = next(
            (
                bm
                for bm in footer_cache[path]
                if bm["type"] == ENGINE_DV_DELTA_V1
                and (bm.get("properties") or {}).get(
                    "referenced-data-file"
                )
                == ref
            ),
            None,
        )
        if delta is not None:
            out.append(
                {
                    **e,
                    "delta_offset": delta["offset"],
                    "delta_size": delta["length"],
                }
            )
            continue
        main = next(
            (
                bm
                for bm in footer_cache[path]
                if bm["type"] != ENGINE_DV_DELTA_V1
                and (bm.get("properties") or {}).get(
                    "referenced-data-file"
                )
                == ref
            ),
            None,
        )
        if (
            main is not None
            and (main.get("properties") or {}).get("delta") == "self"
        ):
            out.append(
                {
                    **e,
                    "delta_offset": e["content_offset"],
                    "delta_size": e["content_size_in_bytes"],
                }
            )
            continue
        prior = [
            p
            for p in priors_by_ref.get(ref, [])
            if p["_seq"] < int(e["_seq"])
            and p["file_path"] != path
        ]
        if not prior and gc_horizon <= 1:
            out.append(
                {
                    **e,
                    "delta_offset": e["content_offset"],
                    "delta_size": e["content_size_in_bytes"],
                }
            )
            continue
        raise ValueError(
            f"deletion vector {path} (sequence {e['_seq']}) supersedes "
            "earlier deletion vectors but carries no engine delta blob "
            "(written before delta tracking, or its predecessors' "
            "tombstones were expired): its bitmap re-stamps old "
            "retractions at the new sequence and cannot be emitted as "
            "keyed retractions — consume the window with "
            "read_iceberg_changelog or re-bootstrap from a full sync"
        )
    return out


def _plan_seq_window(
    meta: dict,
    lo_seq: int,
    hi_seq: int,
    constraints: dict | None = None,
    eq_sink: list | None = None,
    pos_sink: list | None = None,
    dv_sink: list | None = None,
) -> list[dict]:
    """Data files appended with ``lo_seq < seq <= hi_seq``, planned from
    the CURRENT snapshot — correct even when every snapshot inside the
    window has been expired, because carried-over manifest entries keep
    their original sequence numbers. Shared by the batch incremental
    scan and the streaming source so their window/delete semantics can
    never drift.

    Safety: a DELETE FILE with a sequence number inside the window is
    an explicit error (rows were retracted; an append-only changelog
    cannot represent it). This checks the delete FILES themselves, not
    snapshot summaries — summaries disappear with snapshot expiration,
    the files do not.

    Scale: manifests are pruned by their sequence-number bounds before
    being opened — ``manifest.sequence_number <= lo`` means every entry
    is <= lo (entries never postdate their manifest), and
    ``min_sequence_number > hi`` means every entry is > hi — so a
    bounded window over a long history opens only the overlapping
    manifests."""
    cur_id = meta.get("current-snapshot-id", -1)
    if cur_id == -1 or hi_seq <= lo_seq:
        return []
    cur = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur_id)
    _, manifest_files, _ = read_avro_ocf(cur["manifest-list"])
    # snapshots that REWROTE data files (rewrite_data_files): their
    # added files are compaction output, not logical appends — skip
    # them; conversely the data entries they tombstoned are still
    # logical appends for windows that contain the original append.
    # Like the Java IncrementalAppendScan this consults snapshot
    # summaries, so it degrades if the rewrite snapshot is expired
    # while an older window is still queried (the tombstoned DELETE
    # files keep the retraction guard itself durable).
    rewrite_ids = _data_rewrite_snapshot_ids(meta)
    constraints = constraints or {}
    specs_by_id = _specs_by_id(meta) if constraints else None
    # keyed-changelog mode: a convert_equality_deletes output file
    # (path marker, durable like _compacted-) is VIEW-NEUTRAL — its
    # positions retract rows the window's (tombstoned, original-seq)
    # equality entries already retract — so it can be SKIPPED instead
    # of failing every continuous consumer that must cross the
    # conversion snapshot. Sound exactly when the window floor is
    # at-or-above the tombstone GC horizon (min live-snapshot seq):
    # GC only drops delete tombstones with seq <= horizon, so a
    # window with lo >= horizon provably still holds every equality
    # entry that covers the skipped positions. A horizon of <= 1 is
    # equally safe at ANY lo: the table's full history is live, every
    # PAST horizon was also <= 1, and an equality delete can never
    # carry seq 1 (it needs a data commit below it) — so nothing
    # coverable was ever dropped. Below the horizon otherwise, the
    # conservative refusal stands (re-bootstrap, same contract as an
    # expired changelog).
    gc_horizon = min(
        (int(s["sequence-number"]) for s in meta.get("snapshots", [])),
        default=0,
    )
    out: list[dict] = []
    for mf in manifest_files:
        if int(mf.get("sequence_number", 0)) <= lo_seq:
            continue  # every entry predates the window
        if int(mf.get("min_sequence_number", 0)) > hi_seq:
            continue  # every entry postdates the window
        if _manifest_pruned(mf, constraints, specs_by_id):
            # outside the predicate's partition scope — data AND
            # delete entries alike (per-partition append-only: a
            # retraction elsewhere doesn't break THIS window)
            continue
        _, entries, _ = read_avro_ocf(mf["manifest_path"])
        for e in entries:
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf.get("sequence_number", 0)
            seq = int(seq)
            if not (lo_seq < seq <= hi_seq):
                continue
            d = e["data_file"]
            if constraints and not _file_matches(d, constraints):
                continue  # other partitions' files and deletes
            # the retraction guard fires for TOMBSTONED (status=2)
            # delete files too: a DV supersede or data-file rewrite
            # tombstones the old delete entry, but the rows it
            # retracted inside the window are still retracted — the
            # tombstone must not blind the guard
            if (
                eq_sink is not None
                and d.get("content") == 1
                and _os.path.basename(str(d["file_path"])).startswith(
                    "delete-eqconv-"
                )
                and (lo_seq >= gc_horizon or gc_horizon <= 1)
            ):
                continue  # conversion output (see gc_horizon note)
            if d.get("content") == 2 and eq_sink is not None:
                # keyed-changelog mode (the iceberg_cdc stream): an
                # equality delete IS key-representable — collect it as
                # a delete-key batch instead of failing the window.
                # Tombstoned entries (a later rewrite_data_files
                # materialized them) still retract within THIS window,
                # so status is deliberately not checked.
                eq_sink.append(
                    {"file_path": d["file_path"], "_seq": seq}
                )
                continue
            if (
                pos_sink is not None
                and d.get("content") == 1
                and d.get("file_format") != "PUFFIN"
                and not _os.path.basename(str(d["file_path"])).startswith(
                    "delete-eqconv-"
                )
            ):
                # keyed-changelog mode WITH declared merge keys (r12):
                # a position-delete file (an `update_where` / DELETE
                # retraction) resolves to keyed retractions — the
                # reader looks up each deleted (file, pos) identity's
                # PRE-IMAGE key columns in its target data file, so a
                # live mirror crosses a row-level UPDATE without
                # re-bootstrapping. SOUND because engine position
                # deletes match the MERGED view at commit time: each
                # retracted identity is its key's then-live row, so
                # delete_key at the delete's seq is exact. Two stay
                # excluded: eqconv conversion files (they re-stamp OLD
                # retractions at the conversion's NEWER seq — a key
                # re-inserted in between would be wrongly retracted;
                # the view-neutral skip above already handles them at
                # or above the GC horizon); ENGINE deletion vectors
                # resolve via dv_sink below (r13), foreign ones still
                # refuse.
                pos_sink.append(
                    {"file_path": d["file_path"], "_seq": seq}
                )
                continue
            if (
                dv_sink is not None
                and d.get("content") == 1
                and d.get("file_format") == "PUFFIN"
                and _is_engine_dv(d, meta["location"])
            ):
                # keyed-changelog mode WITH merge keys: an engine
                # deletion vector resolves to keyed retractions too
                # (r13) — the planner later picks the FRESH-only
                # bitmap (the engine delta blob, or the whole bitmap
                # for a first DV) via dv_keyed_plan, and the reader
                # looks up pre-image keys in the referenced data file
                # exactly like parquet position deletes. Foreign DVs
                # fall through to the refusal below.
                dv_sink.append(
                    {
                        "file_path": d["file_path"],
                        "_seq": seq,
                        "referenced_data_file": d.get(
                            "referenced_data_file"
                        ),
                        "content_offset": d.get("content_offset"),
                        "content_size_in_bytes": d.get(
                            "content_size_in_bytes"
                        ),
                    }
                )
                continue
            if d.get("content") in (1, 2):
                raise ValueError(
                    f"row-delta delete file {d['file_path']} has sequence "
                    f"number {seq} inside the incremental window ({lo_seq}, "
                    f"{hi_seq}]; an append-only changelog cannot represent "
                    "row retraction"
                    + (
                        " (positions are key-representable only with "
                        "declared merge keys: pass "
                        ".option('mergeKeys', 'k1,k2') to iceberg_cdc "
                        "to emit keyed retractions for them, consume "
                        "the window with read_iceberg_changelog, or "
                        "re-bootstrap from a full sync; view-neutral "
                        "convert_equality_deletes output is skipped "
                        "automatically unless the window predates the "
                        "tombstone GC horizon)"
                        if eq_sink is not None
                        else ""
                    )
                )
            # compaction output is never a logical append, whatever its
            # status — the path marker survives snapshot expiration and
            # manifest compaction, unlike summary lookups
            compacted = _is_rewrite_output(d["file_path"], meta["location"])
            if e["status"] == 2:
                if compacted:
                    continue  # replaced output of an earlier rewrite
                if e.get("snapshot_id") in rewrite_ids:
                    # tombstoned by a data-file rewrite: compacted, not
                    # logically deleted — the file (still on disk until
                    # vacuum) serves the window's appended rows
                    out.append({**d, "_seq": seq})
                    continue
                raise ValueError(
                    f"data file {d['file_path']} (sequence {seq}) was "
                    f"removed inside the window ({lo_seq}, {hi_seq}] by "
                    "a snapshot this metadata no longer explains (an "
                    "expired rewrite or a foreign overwrite); cannot "
                    "certify the window append-only — re-bootstrap from "
                    "a full scan"
                )
            if compacted or e.get("snapshot_id") in rewrite_ids:
                continue  # compaction output, not a logical append
            out.append({**d, "_seq": seq})
    return out


def _data_rewrite_snapshot_ids(meta: dict) -> set:
    """Snapshot ids whose commit REWROTE data files (operation
    ``replace`` that deleted data files — `rewrite_data_files`;
    `rewrite_manifests` is also ``replace`` but touches no files)."""
    out = set()
    for s in meta["snapshots"]:
        summary = s.get("summary") or {}
        if (
            summary.get("operation") == "replace"
            and int(summary.get("deleted-data-files", "0") or 0) > 0
        ):
            out.add(s["snapshot-id"])
    return out


def _plan_incremental_from_meta(
    meta: dict,
    from_snapshot_id: int,
    to_snapshot_id: int | None,
    constraints: dict | None = None,
) -> list[dict]:
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in by_id:
        raise ValueError(
            f"from snapshot {from_snapshot_id} expired or never existed — "
            "re-bootstrap from a full scan"
        )
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id", -1)
    if to_snapshot_id not in by_id:
        raise ValueError(f"to snapshot {to_snapshot_id} not found")
    from_seq = int(by_id[from_snapshot_id]["sequence-number"])
    to_seq = int(by_id[to_snapshot_id]["sequence-number"])
    if to_seq < from_seq:
        raise ValueError("to snapshot predates from snapshot")
    return _plan_seq_window(meta, from_seq, to_seq, constraints)


def read_iceberg_incremental(
    spark,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
    source_predicates: dict | None = None,
):
    """The rows appended between two snapshots (see
    :func:`plan_incremental_scan`) — the batch form of an incremental
    training-data ingestion step: each run consumes exactly the new
    corpus shards, never rereads history. One metadata load serves both
    the plan and the schema typing. ``source_predicates`` scopes the
    window to the matching partitions at the metadata grain and applies
    the row residuals, like :func:`read_iceberg_table`."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    constraints = _resolve_constraints(
        meta, None, None, None, source_predicates
    )
    files = _plan_incremental_from_meta(
        meta, from_snapshot_id, to_snapshot_id, constraints
    )
    if not files:
        return _empty_table_df(spark, meta)
    return _apply_residuals(
        _read_planned_files(
            spark, table_dir, meta, [f["file_path"] for f in files]
        ),
        source_predicates,
    )


def read_iceberg_changelog(
    spark,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
    source_predicates: dict | None = None,
):
    """NET changelog between two snapshots as typed change rows — the
    CDC read that the append-only incremental scan refuses when deletes
    are present (Iceberg's changelog scan / Spark's
    ``create_changelog_view``): every table column plus
    ``_change_type`` (``insert`` | ``delete``). Row identity is
    (data file, row position) — the same identity position deletes use
    — so the diff is exact: a row appended AND deleted inside the
    window nets out, replacement rows from a CDC upsert surface as
    deletes of the old identities plus inserts of the new ones.

    Scale shape: inserts are read METADATA-ONLY (the window's appended
    files, already net of later in-window deletes because the ``to``
    snapshot's view applies them); only rows of PRE-WINDOW files need
    the row-level anti-join (old-file rows can only disappear), and
    both sides of that join are pruned to pre-window files first. No
    full-table diff is ever materialized.

    ``source_predicates`` scopes the changelog to the matching
    partitions: both snapshots' plans prune other partitions' data AND
    delete files at the metadata grain (deletes match per (file, pos) /
    per key, so applying them against the partition subset is sound),
    and the row residuals apply to the typed change rows — the
    per-partition CDC subscription shape."""
    from pyspark.sql import functions as F

    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    constraints = _resolve_constraints(
        meta, None, None, None, source_predicates
    )
    specs = _specs_by_id(meta)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in by_id:
        raise ValueError(
            f"from snapshot {from_snapshot_id} expired or never existed — "
            "re-bootstrap from a full scan"
        )
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id", -1)
    if to_snapshot_id not in by_id:
        raise ValueError(f"to snapshot {to_snapshot_id} not found")
    from_seq = int(by_id[from_snapshot_id]["sequence-number"])
    to_seq = int(by_id[to_snapshot_id]["sequence-number"])
    if to_seq < from_seq:
        raise ValueError("to snapshot predates from snapshot")
    # a data-file rewrite inside the window churns every surviving
    # row's (file, pos) identity — the net diff would report the whole
    # table as delete+insert. Same rows by construction, so the honest
    # answer is to refuse and have the caller split the window at the
    # rewrite (Spark's changelog likewise skips REPLACE snapshots).
    rewrite_ids = _data_rewrite_snapshot_ids(meta)
    for s in meta["snapshots"]:
        if (
            from_seq < int(s["sequence-number"]) <= to_seq
            and s["snapshot-id"] in rewrite_ids
        ):
            raise ValueError(
                f"changelog window spans data-file rewrite snapshot "
                f"{s['snapshot-id']} (rewrite_data_files churns row "
                "identity); split the window at the rewrite"
            )
    ids = ["__iceberg_file", "__iceberg_pos"]
    # ONE manifest walk of the `to` snapshot; the window/pre-window
    # split is a FILE-LEVEL plan split (two separately planned scans),
    # not a post-scan row filter — each data file is read at most once
    # and only the files a side needs are opened
    to_data, to_deletes = _plan_snapshot(
        by_id[to_snapshot_id], constraints, specs_by_id=specs
    )
    # durable twin of the summary-based refusal above: rewrite output
    # carries the _compacted- path marker, so an expired rewrite
    # snapshot (e.g. a tag keeps `from` alive across expiration) still
    # cannot slip identity-churned files into the diff as inserts
    for d in to_data:
        if (
            _is_rewrite_output(d["file_path"], meta["location"])
            and from_seq < d["_seq"] <= to_seq
        ):
            raise ValueError(
                f"changelog window spans data-file rewrite output "
                f"{d['file_path']} (rewrite_data_files churns row "
                "identity); split the window at the rewrite"
            )
    if not to_data:
        return (
            _empty_table_df(spark, meta)
            .withColumn("_change_type", F.lit(""))
            .where(F.lit(False))
        )
    def _residuals(df):
        return _apply_residuals(df, source_predicates)

    new_data = [d for d in to_data if from_seq < d["_seq"] <= to_seq]
    old_data = [d for d in to_data if d["_seq"] <= from_seq]

    def mk_inserted():
        if not new_data:
            return None
        return _residuals(
            _read_plan_with_identity(
                spark, table_dir, meta, new_data, to_deletes
            )
        ).withColumn("_change_type", F.lit("insert")).drop(*ids)

    # PURE-APPEND fast path: when the window holds no delete files and
    # every data file of the `from` snapshot survives in the `to`
    # snapshot, no pre-window row can have disappeared (pre-window
    # delete files apply identically to both views), so the delete side
    # is empty BY METADATA — skip the row-level diff entirely. This is
    # the common window on an append-mostly CDC table: its changelog
    # cost stays O(appended bytes) instead of O(table). The check is
    # metadata-only, so it runs BEFORE any Spark construction and the
    # fast path builds only the insert side.
    if not any(from_seq < d["_seq"] <= to_seq for d in to_deletes):
        from_data, _ = _plan_snapshot(
            by_id[from_snapshot_id], constraints, specs_by_id=specs
        )
        if {d["file_path"] for d in from_data} <= {
            d["file_path"] for d in old_data
        }:
            inserted = mk_inserted()
            if inserted is not None:
                return inserted
            return (
                _empty_table_df(spark, meta)
                .withColumn("_change_type", F.lit(""))
                .where(F.lit(False))
            )

    # the three sides (insert scan, `from`-view scan, pre-window files
    # at the `to` view) are independent metadata-heavy constructions:
    # build them from a small thread pool so their py4j round-trips
    # overlap (guide §2.6) — each side's plan is exactly what the
    # sequential construction produced
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_inserted = pool.submit(mk_inserted)
        f_a = pool.submit(
            _read_snapshot, spark, table_dir, meta,
            by_id[from_snapshot_id], constraints, True,
        )
        f_b_old = (
            pool.submit(
                _read_plan_with_identity, spark, table_dir, meta,
                old_data, to_deletes,
            )
            if old_data
            else None
        )
        inserted = f_inserted.result()
        a = f_a.result()
        b_old = f_b_old.result() if f_b_old is not None else None
    if a is None or not old_data:
        # table was empty at `from`: everything live in-window is new
        if inserted is not None:
            return inserted
        return (
            _empty_table_df(spark, meta)
            .withColumn("_change_type", F.lit(""))
            .where(F.lit(False))
        )
    deleted = (
        _residuals(a.join(b_old.select(*ids), ids, "left_anti"))
        .withColumn("_change_type", F.lit("delete"))
        .drop(*ids)
    )
    if inserted is None:
        return deleted
    # allowMissingColumns: a window spanning a schema evolution has
    # delete rows read under the pre-evolution file schema — added
    # optional columns fill with null instead of failing the union
    return inserted.unionByName(deleted, allowMissingColumns=True)


def changelog_safe_windows(
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> list[tuple[int, int]]:
    """Split ``(from, to]`` into the maximal changelog-readable
    sub-windows a long-lived CDC consumer hops through on a MAINTAINED
    table: REPLACE snapshots (``rewrite_manifests`` /
    ``rewrite_data_files`` output) carry no logical row changes, but a
    window spanning one is refused by :func:`read_iceberg_changelog`
    (physical rewrites inside the window would otherwise surface as
    phantom delete+insert pairs). Real consumers — and Iceberg's own
    incremental reads — consume up to each replace boundary, then hop
    the replace snapshot itself; this returns those hops as
    ``(from_id, to_id)`` pairs, each safe to hand to
    :func:`read_iceberg_changelog`, skipping replace snapshots and any
    empty stretch. Windows are planned from the SURVIVING snapshot
    list, so a consumer must stay ahead of ``expire_snapshots`` (its
    checkpoint must be a live snapshot — the same contract the
    changelog itself enforces with its re-bootstrap error)."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    by_id = {s["snapshot-id"]: s for s in snaps}
    if from_snapshot_id not in by_id:
        raise ValueError(
            f"from-snapshot {from_snapshot_id} is not live (expired?); "
            "re-bootstrap the consumer from a full scan"
        )
    to_id = (
        to_snapshot_id
        if to_snapshot_id is not None
        else meta["current-snapshot-id"]
    )
    if to_id == -1 or to_id not in by_id:
        raise ValueError(f"to-snapshot {to_id} is not live")
    lo_seq = by_id[from_snapshot_id]["sequence-number"]
    hi_seq = by_id[to_id]["sequence-number"]
    windows: list[tuple[int, int]] = []
    lo = from_snapshot_id
    last_change: int | None = None
    for s in snaps:
        seq = s["sequence-number"]
        if seq <= lo_seq or seq > hi_seq:
            continue
        if (s.get("summary") or {}).get("operation") == "replace":
            if last_change is not None:
                windows.append((lo, last_change))
            lo = s["snapshot-id"]
            last_change = None
        else:
            last_change = s["snapshot-id"]
    if last_change is not None:
        windows.append((lo, last_change))
    return windows
