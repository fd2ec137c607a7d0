"""Cross-verb COMMIT-RACE coverage (split from test_mutation_fuzz.py
so the two halves shard independently): the seeded catalog-race
program plus the directed interleavings for verbs the randomized
rival pool excludes (cherry-pick, replace_partitions, and the
compaction/update pair). All schedules inject a rival commit through
a wrapped catalog ``commit_table`` between the primary's plan and its
commit — exact and replayable, never sleep-based.
"""

from __future__ import annotations

import random

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    bucket_hash_long,
    commit_position_deletes,
    merge_upsert,
    read_iceberg_table,
    replace_partitions,
    rewrite_data_files,
    update_where,
    write_iceberg_table,
)

N_BUCKETS = 4
SPEC = [("id_bucket", f"bucket[{N_BUCKETS}]", "id")]


def _bkt(i: int) -> int:
    return (bucket_hash_long(i) & 0x7FFFFFFF) % N_BUCKETS


def _df(spark, rows, schema="id bigint, grp bigint, v bigint"):
    return spark.createDataFrame(rows, schema)


def _state(spark, tdir):
    return {
        r["id"]: (r["grp"], r["v"])
        for r in read_iceberg_table(spark, tdir).collect()
    }


@pytest.mark.parametrize("seed", [307])
def test_random_catalog_race_program_matches_model(spark, tmp_path, seed):
    """CROSS-VERB commit-race seeded program (r13): at every step a
    PRIMARY verb (merge / update_where / positional DELETE / append)
    plans against the current base while a RIVAL verb (a different
    one) commits between its plan and its commit — injected through a
    wrapped catalog ``commit_table``, so the schedule is exact and
    replayable. The optimistic-retry path must re-plan the primary on
    the rival's base; the model applies rival THEN primary (the
    serialized order the race resolves to), and full-state equality is
    asserted after every step."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    rng = random.Random(seed)
    tdir = str(tmp_path / f"racefuzz-{seed}")
    ms = [1_000]

    def tick() -> int:
        ms[0] += 1_000
        return ms[0]

    model: dict[int, dict] = {
        i: {"grp": i % 5, "v": i * 10} for i in range(40)
    }
    next_id = [5_000]

    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        write_iceberg_table(
            spark,
            _df(spark, [(i, d["grp"], d["v"]) for i, d in model.items()]),
            tdir, now_ms=tick(), partition_spec=SPEC,
            catalog=cat, table_name="t",
        )

        def cat_state():
            return {
                r["id"]: (r["grp"], r["v"])
                for r in read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="t"
                ).collect()
            }

        # each verb = (run(now_ms), apply_to_model()) — apply mirrors
        # the verb's semantics against whatever the state is WHEN IT
        # RUNS, so rival-then-primary ordering falls out of call order
        def v_append():
            rows = []
            ids = []
            for _ in range(3):
                next_id[0] += 1
                i = next_id[0]
                rows.append((i, i % 5, i * 10))
                ids.append(i)

            def run():
                write_iceberg_table(
                    spark, _df(spark, rows), tdir, now_ms=tick(),
                    partition_spec=SPEC, catalog=cat, table_name="t",
                )

            def apply():
                for i in ids:
                    model[i] = {"grp": i % 5, "v": i * 10}

            return run, apply

        def v_merge():
            m, r = rng.randint(3, 7), rng.randint(0, 2)
            k = rng.randint(1, 9)

            def run():
                # merge batches are key-addressed: a FIXED key set
                # derived from the modulus keeps run/apply in lockstep
                # whatever state the verb lands on
                rows = [
                    (i, i % 5, i * 100 + k, "u")
                    for i in range(40) if i % m == r
                ] + [(900 + k, 0, k, "i")]
                merge_upsert(
                    spark,
                    spark.createDataFrame(
                        rows,
                        "id bigint, grp bigint, v bigint, op string",
                    ),
                    tdir, on=["id"], op_col="op", partition_spec=SPEC,
                    catalog=cat, table_name="t", now_ms=tick(),
                )

            def apply():
                for i in range(40):
                    if i % m == r:
                        model[i] = {"grp": i % 5, "v": i * 100 + k}
                model[900 + k] = {"grp": 0, "v": k}

            return run, apply

        def v_update():
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            k = rng.randint(1, 99)

            def run():
                update_where(
                    spark, tdir, f"id % {m} = {r}", {"v": f"v + {k}"},
                    now_ms=tick(), catalog=cat, table_name="t",
                )

            def apply():
                for i, d in model.items():
                    if i % m == r:
                        d["v"] = d["v"] + k

            return run, apply

        def v_posdelete():
            m, r = rng.randint(5, 9), rng.randint(0, 4)

            def run():
                commit_position_deletes(
                    spark, tdir, f"id % {m} = {r}", now_ms=tick(),
                    catalog=cat, table_name="t",
                )

            def apply():
                for i in [i for i in model if i % m == r]:
                    model.pop(i)

            return run, apply

        verbs = [v_append, v_merge, v_update, v_posdelete]
        trace = []
        for step in range(6):
            p_kind, r_kind = rng.sample(verbs, 2)
            p_run, p_apply = p_kind()
            r_run, r_apply = r_kind()
            trace.append((p_kind.__name__, r_kind.__name__))
            fired = {"done": False}
            orig = cat.commit_table

            def racing(table, requirements, updates, now_ms):
                if not fired["done"]:
                    fired["done"] = True
                    cat.commit_table = orig  # rival commits unwrapped
                    try:
                        r_run()
                        r_apply()
                    finally:
                        cat.commit_table = racing
                return orig(table, requirements, updates, now_ms)

            cat.commit_table = racing
            try:
                p_run()
            finally:
                cat.commit_table = orig
            assert fired["done"], (
                f"step {step}: primary {p_kind.__name__} never reached "
                "commit — the race was not exercised"
            )
            p_apply()
            got = cat_state()
            exp = {i: (d["grp"], d["v"]) for i, d in model.items()}
            assert got == exp, (
                f"seed={seed} diverged at step {step}; trace={trace}; "
                f"diff={ {i: (got.get(i), exp.get(i)) for i in set(got) | set(exp) if got.get(i) != exp.get(i)} }"
            )
        kinds = {p for p, _ in trace} | {r for _, r in trace}
        assert len(kinds) >= 3  # the program really mixed verbs


def test_cherry_pick_races_fast_forwarded_head(spark, tmp_path):
    """Directed cross-verb race (r13): an APPEND commits between a
    cherry-pick's plan and its commit. The single-attempt cherry-pick
    surfaces a clean conflict (never a torn commit), and the manual
    retry converges: final state = base + staged pick + rival append."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        cherry_pick_snapshot,
        create_ref,
    )
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = str(tmp_path / "pickrace")
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        write_iceberg_table(
            spark, _df(spark, [(i, i % 5, i * 10) for i in range(10)]),
            tdir, now_ms=1_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        meta = create_ref(
            tdir, "wap", kind="branch", now_ms=2_000,
            catalog=cat, table_name="t",
        )
        write_iceberg_table(
            spark, _df(spark, [(100, 0, 1_000)]), tdir, now_ms=3_000,
            partition_spec=SPEC, branch="wap",
            catalog=cat, table_name="t",
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (  # noqa: E501
            _current_state_meta,
        )

        _v, cur_meta, _t = _current_state_meta(tdir, cat, "t")
        staged = cur_meta["refs"]["wap"]["snapshot-id"]
        fired = {"done": False}
        orig = cat.commit_table

        def racing(table, requirements, updates, now_ms):
            if not fired["done"]:
                fired["done"] = True
                cat.commit_table = orig
                try:
                    write_iceberg_table(
                        spark, _df(spark, [(200, 1, 2_000)]), tdir,
                        now_ms=3_500, partition_spec=SPEC,
                        catalog=cat, table_name="t",
                    )
                finally:
                    cat.commit_table = racing
            return orig(table, requirements, updates, now_ms)

        cat.commit_table = racing
        try:
            cherry_pick_snapshot(
                tdir, staged, now_ms=4_000, catalog=cat, table_name="t"
            )
            conflicted = False
        except CommitConflictError:
            conflicted = True
        finally:
            cat.commit_table = orig
        if conflicted:
            cherry_pick_snapshot(
                tdir, staged, now_ms=5_000, catalog=cat, table_name="t"
            )
        got = {
            r["id"]: r["v"]
            for r in read_iceberg_table(
                spark, tdir, catalog=cat, table_name="t"
            ).collect()
        }
        exp = {i: i * 10 for i in range(10)} | {100: 1_000, 200: 2_000}
        assert got == exp


GSPEC = [("grp", "identity", None)]


def _cat_state(spark, tdir, cat):
    return {
        r["id"]: (r["grp"], r["v"])
        for r in read_iceberg_table(
            spark, tdir, catalog=cat, table_name="t"
        ).collect()
    }


def _race_once(cat, rival):
    """Patch ``cat.commit_table`` so the FIRST commit attempt is
    preceded by ``rival()`` landing its own commit — the canonical
    plan/commit interleaving (the primary verb planned against a base
    the rival then moved). Returns a restore function."""
    orig = cat.commit_table
    fired = {"done": False}

    def racing(table, requirements, updates, now_ms):
        if not fired["done"]:
            fired["done"] = True
            cat.commit_table = orig
            try:
                rival()
            finally:
                cat.commit_table = racing
        return orig(table, requirements, updates, now_ms)

    cat.commit_table = racing
    return lambda: setattr(cat, "commit_table", orig)


def test_replace_partitions_races_append(spark, tmp_path):
    """Directed cross-verb race: an APPEND commits between a
    `replace_partitions` plan and its commit — one row into a cell
    being replaced, one into an untouched cell. The optimistic retry
    re-plans on the moved base, and the outcome equals the SERIAL
    append-then-replace: the replaced cell holds exactly the
    replacement rows (dynamic-overwrite semantics swallow the rival's
    row there — same as serial), the untouched cell keeps the rival's
    row, and nothing tears."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = str(tmp_path / "replrace")
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        write_iceberg_table(
            spark,
            _df(spark, [(i, i % 3, i * 10) for i in range(12)]),
            tdir, now_ms=1_000, partition_spec=GSPEC,
            catalog=cat, table_name="t",
        )

        def rival():
            write_iceberg_table(
                spark, _df(spark, [(101, 1, 1_111), (202, 2, 2_222)]),
                tdir, now_ms=2_500, partition_spec=GSPEC,
                catalog=cat, table_name="t",
            )

        restore = _race_once(cat, rival)
        try:
            replace_partitions(
                spark, _df(spark, [(500, 1, 5_000), (501, 1, 5_010)]),
                tdir, now_ms=3_000, catalog=cat, table_name="t",
            )
        finally:
            restore()
        got = _cat_state(spark, tdir, cat)
        exp = {
            i: (i % 3, i * 10) for i in range(12) if i % 3 != 1
        } | {500: (1, 5_000), 501: (1, 5_010), 202: (2, 2_222)}
        assert got == exp


def _live_delete_targets_are_live_files(spark, tdir, cat):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (  # noqa: E501
        files_table,
        position_deletes_table,
    )

    targets = {
        r["file_path"]
        for r in position_deletes_table(
            spark, tdir, catalog=cat, table_name="t"
        ).select("file_path").distinct().collect()
    }
    live = {
        r["file_path"]
        for r in files_table(spark, tdir, catalog=cat, table_name="t")
        .select("file_path").collect()
    }
    return targets <= live


def test_update_where_races_compaction(spark, tmp_path):
    """Directed cross-verb race: `rewrite_data_files` commits between
    an `update_where`'s plan and its commit. The update's position
    deletes name exact (file, pos) identities in files the compaction
    just tombstoned — committing them would silently retract nothing.
    The retry re-plans against the compacted base: final state equals
    serial compact-then-update, and every live position delete
    references a LIVE data file."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = str(tmp_path / "updcompact")
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        for lo in (0, 12):  # two appends -> multiple files to compact
            write_iceberg_table(
                spark,
                _df(spark, [(i, i % 3, i * 10) for i in range(lo, lo + 12)]),
                tdir, now_ms=1_000 + lo, partition_spec=GSPEC,
                catalog=cat, table_name="t",
            )

        restore = _race_once(
            cat,
            lambda: rewrite_data_files(
                spark, tdir, now_ms=2_500, catalog=cat, table_name="t"
            ),
        )
        try:
            update_where(
                spark, tdir, "id % 5 = 2", {"v": "v + 1000000"},
                now_ms=3_000, catalog=cat, table_name="t",
            )
        finally:
            restore()
        got = _cat_state(spark, tdir, cat)
        exp = {
            i: (i % 3, i * 10 + (1_000_000 if i % 5 == 2 else 0))
            for i in range(24)
        }
        assert got == exp
        assert _live_delete_targets_are_live_files(spark, tdir, cat)


def test_compaction_races_update_where(spark, tmp_path):
    """Directed cross-verb race, roles swapped: an `update_where`
    commits between a compaction's plan and its commit. A compaction
    that shipped its pre-planned output would RESURRECT the pre-update
    rows (its rewrite materialized the merged view as of the OLD
    base). The retry re-compacts against the updated base: updated
    values survive, row count is unchanged, and delete debt never
    points at tombstoned files."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = str(tmp_path / "compactupd")
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        for lo in (0, 12):
            write_iceberg_table(
                spark,
                _df(spark, [(i, i % 3, i * 10) for i in range(lo, lo + 12)]),
                tdir, now_ms=1_000 + lo, partition_spec=GSPEC,
                catalog=cat, table_name="t",
            )

        restore = _race_once(
            cat,
            lambda: update_where(
                spark, tdir, "id % 5 = 2", {"v": "v + 1000000"},
                now_ms=2_500, catalog=cat, table_name="t",
            ),
        )
        try:
            rewrite_data_files(
                spark, tdir, now_ms=3_000, catalog=cat, table_name="t"
            )
        finally:
            restore()
        got = _cat_state(spark, tdir, cat)
        exp = {
            i: (i % 3, i * 10 + (1_000_000 if i % 5 == 2 else 0))
            for i in range(24)
        }
        assert got == exp
        assert _live_delete_targets_are_live_files(spark, tdir, cat)
