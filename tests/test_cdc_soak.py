"""The CDC soak gauntlet: 30 merge rounds against a Python-dict
oracle with every maintenance plane composed — eq->pos conversion,
delete-plane compaction, sorted data compaction, snapshot expiration,
orphan sweep — while a continuous MIRROR catches up through all of it
(including conversion and rewrite windows) and must converge to the
closed-form state at the end. The round-10 plane's integration test:
merge in, maintain, stream out, replicate.

r12 adds the UPDATE round (r=22) and the RENAME round (r=27): a
row-level update crossed via keyed retractions, and a mid-soak
``val -> text`` rename — later batches carry the new name, pre-rename
files resolve by (epoch, field id), and the final mirror catch-up
propagates the rename to the replica before applying its window.

r12's UPDATE round: at round 22 a row-level ``update_where``
hits the source (position deletes + updated copies in one snapshot);
the r=30 mirror catch-up crosses its window via keyed retractions —
the declared mergeKeys resolve the deleted identities to pre-image
keys — with no re-bootstrap.

r11 adds the EVOLVING-SCHEMA round: at round 18 the feed grows a
``score double`` column (the normal life of a CDC feed); the merge
evolves the source schema in-commit, the r=20 conversion and r=25
expiration run over the evolved table, and the r=30 mirror catch-up
(a fresh query pinning the evolved schema) replicates both the column
and the null-padding of pre-evolution rows.
"""

from __future__ import annotations

import pytest

from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
    commit_deletion_vectors,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    convert_equality_deletes,
    update_table_schema,
    update_where,
    expire_snapshots,
    merge_upsert,
    read_iceberg_table,
    read_table_metadata,
    remove_orphan_files,
    rewrite_data_files,
    rewrite_position_deletes,
    write_iceberg_table,
)
from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
    mirror_iceberg_table,
)

SPEC = [("id_bucket", "bucket[4]", "id")]
N_ROUNDS = 30
BASE_KEYS = 400
EVOLVE_ROUND = 18  # the feed gains `score double` + `meta struct` here
RENAME_ROUND = 27  # the feed renames val -> text here (r12)
NESTED_RENAME_ROUND = 28  # meta.ts -> meta.event_ts here (r13)


def _expected_round_ops(r: int):
    """The closed-form changelog for round r (1-based): upserts as
    {id: val}, deletes as a set of ids. Keys stride the base range
    plus per-round inserts at 10_000*r + j."""
    ups = {
        i: f"r{r}-{i}"
        for i in range(BASE_KEYS)
        if i % 10 == r % 10
    }
    ups.update(
        {10_000 * r + j: f"ins{r}-{j}" for j in range(5)}
    )
    dels = {
        i for i in range(BASE_KEYS) if i % 37 == r % 37 and i % 10 != r % 10
    }
    if r % 5 == 0:
        # resurrect keys round r-1 deleted (they carry r's values)
        ups.update(
            {
                i: f"res{r}-{i}"
                for i in range(BASE_KEYS)
                if i % 37 == (r - 1) % 37 and i % 10 != (r - 1) % 10
            }
        )
    return ups, dels


@pytest.mark.parametrize("mirror_every", [10])
def test_cdc_soak_gauntlet(spark, tmp_path, mirror_every):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    state = {i: f"v{i}" for i in range(BASE_KEYS)}
    base = spark.createDataFrame(
        [(i, v) for i, v in state.items()], "id bigint, val string"
    )
    ms = 1_000
    write_iceberg_table(spark, base, src, now_ms=ms, partition_spec=SPEC)

    def mirror_catchup():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SPEC,
        )
        q.awaitTermination()

    score_state: dict = {}  # id -> score for rows written post-evolution
    meta_state: dict = {}  # id -> meta.ts value, same lifecycle
    for r in range(1, N_ROUNDS + 1):
        ms += 1_000
        ups, dels = _expected_round_ops(r)
        vcol = "text" if r > RENAME_ROUND else "val"
        if r < EVOLVE_ROUND:
            rows = [(k, v, "u") for k, v in ups.items()] + [
                (k, None, "d") for k in dels if k not in ups
            ]
            batch = spark.createDataFrame(
                rows, f"id bigint, {vcol} string, op string"
            )
        else:
            # the feed evolved: every upsert now carries a score AND a
            # metadata struct (r13 — nested DDL needs a struct to act
            # on); the struct's ts field renames at r=28
            tscol = "event_ts" if r > NESTED_RENAME_ROUND else "ts"
            rows = [
                (k, v, float(r), (r * 1_000 + k % 1_000,), "u")
                for k, v in ups.items()
            ] + [
                (k, None, None, None, "d") for k in dels if k not in ups
            ]
            batch = spark.createDataFrame(
                rows,
                f"id bigint, {vcol} string, score double, "
                f"meta struct<{tscol}:bigint>, op string",
            )
        merge_upsert(
            spark, batch, src, on=["id"], op_col="op",
            partition_spec=SPEC, now_ms=ms,
        )
        state.update(ups)
        if r >= EVOLVE_ROUND:
            score_state.update({k: float(r) for k in ups})
            meta_state.update(
                {k: r * 1_000 + k % 1_000 for k in ups}
            )
        for k in dels:
            if k not in ups:
                state.pop(k, None)
                score_state.pop(k, None)
                meta_state.pop(k, None)

        if r in (10, 20):
            ms += 1_000
            convert_equality_deletes(spark, src, now_ms=ms)
        if r == 12:
            ms += 1_000
            rewrite_position_deletes(spark, src, now_ms=ms)
        if r == 15:
            ms += 1_000
            rewrite_data_files(spark, src, now_ms=ms, sort_by=["id"])
        if r == 22:
            # r12: a row-level UPDATE mid-stream — the r=30 mirror
            # catch-up (checkpoint at 20) crosses its position-delete
            # window via keyed retractions (mergeKeys), no re-bootstrap
            ms += 1_000
            update_where(
                spark, src, "id % 50 = 22", {"val": "concat(val, '+')"},
                now_ms=ms,
            )
            for k in list(state):
                if k % 50 == 22:
                    state[k] = state[k] + "+"
        if r == 24:
            # r13: a DELETION-VECTOR delete mid-stream, AFTER the r=20
            # conversion and BEFORE the r=30 catch-up — the window
            # resolves the DV to keyed retractions (fresh bitmap via
            # dv_keyed_plan), no re-bootstrap and no safe-window hop
            ms += 1_000
            commit_deletion_vectors(
                spark, src, "id % 61 = 24", now_ms=ms
            )
            for k in list(state):
                if k % 61 == 24:
                    state.pop(k, None)
                    score_state.pop(k, None)
                    meta_state.pop(k, None)
        if r == RENAME_ROUND:
            # r12: the feed renames its value column mid-soak — a
            # metadata-only DDL; later batches carry the new name,
            # pre-rename files resolve by (epoch, field id), and the
            # r=30 mirror catch-up PROPAGATES the rename to the
            # replica before applying the window
            ms += 1_000
            update_table_schema(src, rename={"val": "text"}, now_ms=ms)
        if r == NESTED_RENAME_ROUND:
            # r13: a NESTED rename one round later — meta.ts ->
            # meta.event_ts; the r=30 catch-up crosses BOTH rename
            # epochs and propagates the nested rename to the replica
            # by field id
            ms += 1_000
            update_table_schema(
                src, rename={"meta.ts": "event_ts"}, now_ms=ms
            )
        if r == 25:
            # keep_last large enough that the GC horizon stays BELOW
            # the mirror's r=10 checkpoint — a tighter retention would
            # (correctly) refuse the r=30 catch-up and force a mirror
            # re-bootstrap; operational rule: retention must cover the
            # slowest keyed consumer's lag
            ms += 1_000
            expire_snapshots(src, keep_last=20, now_ms=ms)
            # crash-free merges leave NO orphans (explicit-file
            # commits); the sweep composes as a no-op and must not
            # disturb anything
            remove_orphan_files(src, older_than_timestamp_ms=10**14)
        if r % mirror_every == 0 and r != 20:
            # catch-up crosses the r=10 conversion, the r=12 rpd, and
            # the r=15 rewrite windows (checkpoint at 10 -> window
            # (10, 30] minus the skipped maintenance); r=20's
            # conversion is crossed by the r=30 catch-up
            mirror_catchup()

    # source head equals the closed form — including the evolved
    # columns (pre-evolution rows read null, post-evolution their
    # round; meta.event_ts through the r=28 NESTED rename)
    exp_full = {
        k: (v, score_state.get(k), meta_state.get(k))
        for k, v in state.items()
    }

    def _snap(tbl):
        return {
            r_["id"]: (
                r_["text"],
                r_["score"],
                None if r_["meta"] is None else r_["meta"]["event_ts"],
            )
            for r_ in read_iceberg_table(spark, tbl).collect()
        }

    got_src = _snap(src)
    assert got_src == exp_full
    src_meta = read_table_metadata(src)["metadata"]
    # one evolution + the r=27 rename + the r=28 nested rename
    assert len(src_meta["schemas"]) == 4
    # the mirror converged through every maintenance window AND the
    # schema evolution (its own schema count proves it evolved too)
    got_dst = _snap(dst)
    assert got_dst == exp_full
    assert len(read_table_metadata(dst)["metadata"]["schemas"]) >= 2
    # the delete planes stayed bounded: conversions retired the eq
    # plane up to r=20; only post-20 merges' eq files remain live
    back = read_table_metadata(src)
    live_eq_seqs = sorted(
        e["sequence_number"]
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") == 2
    )
    conv2_seq = next(
        int(s["sequence-number"])
        for s in back["metadata"]["snapshots"]
        if s["summary"].get("converted-equality-delete-files")
        and int(s["sequence-number"]) > 15
    )
    assert live_eq_seqs and min(live_eq_seqs) > conv2_seq
