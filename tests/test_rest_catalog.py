"""Iceberg REST-catalog protocol (client + in-repo fake service):
commit via REST → plan_scan reads the same snapshot; optimistic
concurrency (409 CommitFailedException → reload + rebase retry).
Parity: the reference's pluggable catalog-service commit path
(`RemoteStorageManagerConfig.java:261-284`,
`IcebergTableManager.java:46-95`) over the public REST catalog spec."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
    CommitConflictError,
    FakeRestCatalogServer,
    RestCatalogClient,
    apply_updates,
    check_requirements,
)


@pytest.fixture()
def table(spark, tmp_path):
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.table_mode import write_table

    df = (
        spark.range(120)
        .select(
            (F.col("id") % 3).cast("int").alias("partition"),
            F.col("id").alias("offset"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
        )
        .repartition(3, "partition")
    )
    tdir = str(tmp_path / "rest_table")
    write_table(df, tdir)
    return tdir, df


@pytest.fixture()
def server():
    with FakeRestCatalogServer() as srv:
        yield srv


def _clone_data_file(tdir: str, suffix: str) -> str:
    """Stage one more data file (same bytes, new path = new file to
    Iceberg) in partition=0."""
    src = sorted(glob.glob(os.path.join(tdir, "partition=0", "*.parquet")))[0]
    dst = os.path.join(tdir, "partition=0", f"extra-{suffix}.parquet")
    shutil.copyfile(src, dst)
    return dst


def test_config_and_missing_table(server):
    client = RestCatalogClient(server.base_url)
    assert client.config() == {"defaults": {}, "overrides": {}}
    assert client.load_table("nope") is None


def test_commit_via_rest_then_plan_scan(server, table):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
        read_table_metadata,
    )

    tdir, df = table
    client = RestCatalogClient(server.base_url)
    meta = commit_append(tdir, df.schema, now_ms=1_000, catalog=client)
    assert meta["current-snapshot-id"] == 1
    assert server.commit_count == 1

    # the catalog's metadata and the on-disk file layout agree, so an
    # external file-layout reader opens the same snapshot
    loaded = client.load_table("rest_table")
    assert loaded["metadata"]["current-snapshot-id"] == 1
    back = read_table_metadata(tdir)
    assert back["metadata"]["current-snapshot-id"] == 1
    assert back["metadata"]["table-uuid"] == meta["table-uuid"]

    files = plan_scan(tdir)
    assert len(files) == 3
    assert sum(f["record_count"] for f in files) == 120
    # pruned scan still works through the REST-committed metadata
    p0 = plan_scan(tdir, partition_value=0)
    assert len(p0) == 1


def test_second_append_advances_head(server, table):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
    )

    tdir, df = table
    client = RestCatalogClient(server.base_url)
    commit_append(tdir, df.schema, now_ms=1_000, catalog=client)
    extra = _clone_data_file(tdir, "b")
    meta = commit_append(
        tdir, df.schema, now_ms=2_000, catalog=client, files=[extra]
    )
    assert len(meta["snapshots"]) == 2
    head = meta["snapshots"][-1]
    assert head["parent-snapshot-id"] == meta["snapshots"][0]["snapshot-id"]
    assert meta["refs"]["main"]["snapshot-id"] == head["snapshot-id"]
    assert len(plan_scan(tdir)) == 4


def test_zero_new_files_is_noop_commit(server, table):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import commit_append

    tdir, df = table
    client = RestCatalogClient(server.base_url)
    commit_append(tdir, df.schema, now_ms=1_000, catalog=client)
    commits_before = server.commit_count
    meta = commit_append(tdir, df.schema, now_ms=2_000, catalog=client)
    assert server.commit_count == commits_before  # nothing to commit
    assert len(meta["snapshots"]) == 1


class RacingClient(RestCatalogClient):
    """Injects one competing commit (through a plain client) right
    before this writer's first commit attempt — a deterministic lost
    race."""

    def __init__(self, base_url, tdir, schema, races: int = 1):
        super().__init__(base_url)
        self.tdir = tdir
        self.schema = schema
        self.races_left = races
        self.raced_files: list[str] = []

    def commit_table(self, table, requirements, updates, now_ms):
        if self.races_left > 0:
            self.races_left -= 1
            from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
                commit_append,
            )

            rival_file = _clone_data_file(
                self.tdir, f"rival{self.races_left}"
            )
            self.raced_files.append(rival_file)
            commit_append(
                self.tdir,
                self.schema,
                now_ms=now_ms + 1,
                catalog=RestCatalogClient(self.base_url),
                files=[rival_file],
            )
        return super().commit_table(table, requirements, updates, now_ms)


def test_conflict_reloads_and_rebases(server, table):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
    )

    tdir, df = table
    plain = RestCatalogClient(server.base_url)
    commit_append(tdir, df.schema, now_ms=1_000, catalog=plain)

    mine = _clone_data_file(tdir, "mine")
    racing = RacingClient(server.base_url, tdir, df.schema, races=1)
    meta = commit_append(
        tdir, df.schema, now_ms=5_000, catalog=racing, files=[mine]
    )
    # one 409, then the rebase landed on top of the rival's snapshot
    assert server.conflict_count == 1
    assert len(meta["snapshots"]) == 3
    rival_snap, my_snap = meta["snapshots"][1], meta["snapshots"][2]
    assert my_snap["parent-snapshot-id"] == rival_snap["snapshot-id"]
    assert meta["refs"]["main"]["snapshot-id"] == my_snap["snapshot-id"]
    # both writers' files are live
    paths = {os.path.basename(f["file_path"]) for f in plan_scan(tdir)}
    assert os.path.basename(mine) in paths
    assert os.path.basename(racing.raced_files[0]) in paths


def test_conflict_exhausts_retries(server, table):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import commit_append

    tdir, df = table
    plain = RestCatalogClient(server.base_url)
    commit_append(tdir, df.schema, now_ms=1_000, catalog=plain)
    mine = _clone_data_file(tdir, "mine2")
    always_losing = RacingClient(server.base_url, tdir, df.schema, races=99)
    with pytest.raises(CommitConflictError):
        commit_append(
            tdir, df.schema, now_ms=5_000, catalog=always_losing,
            files=[mine], max_commit_retries=2,
        )
    assert server.conflict_count == 2


def test_schema_evolution_via_rest(server, table, spark):
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import write_table

    tdir, df = table
    client = RestCatalogClient(server.base_url)
    commit_append(tdir, df.schema, now_ms=1_000, catalog=client)

    evolved_df = df.withColumn("lang", F.lit("en"))
    write_table(evolved_df.limit(30).repartition(1, "partition"), tdir)
    meta = commit_append(tdir, evolved_df.schema, now_ms=2_000, catalog=client)
    assert len(meta["schemas"]) == 2
    new_schema = meta["schemas"][-1]
    assert meta["current-schema-id"] == new_schema["schema-id"]
    assert any(f["name"] == "lang" for f in new_schema["fields"])
    # file layout agrees
    back = read_table_metadata(tdir)
    assert back["metadata"]["current-schema-id"] == new_schema["schema-id"]


def test_requirements_unit():
    meta = {
        "table-uuid": "u1",
        "refs": {"main": {"snapshot-id": 7, "type": "branch"}},
    }
    assert check_requirements(None, [{"type": "assert-create"}]) is None
    assert "exists" in check_requirements(meta, [{"type": "assert-create"}])
    assert check_requirements(
        meta, [{"type": "assert-table-uuid", "uuid": "u1"}]
    ) is None
    assert check_requirements(
        meta, [{"type": "assert-table-uuid", "uuid": "u2"}]
    )
    assert check_requirements(
        meta,
        [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 7}],
    ) is None
    assert check_requirements(
        meta,
        [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 6}],
    )
    assert check_requirements(
        None,
        [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None}],
    ) is None


def test_apply_updates_unit():
    meta = {
        "schemas": [{"schema-id": 0, "fields": []}],
        "current-schema-id": 0,
        "snapshots": [],
        "snapshot-log": [],
        "last-sequence-number": 0,
        "refs": {},
        "properties": {},
    }
    snap = {
        "snapshot-id": 11,
        "sequence-number": 1,
        "timestamp-ms": 123,
        "manifest-list": "x",
    }
    out = apply_updates(
        meta,
        [
            {"action": "add-snapshot", "snapshot": snap},
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": 11,
            },
            {"action": "set-properties", "updates": {"k": "v"}},
        ],
        now_ms=456,
    )
    assert out["current-snapshot-id"] == 11
    assert out["last-sequence-number"] == 1
    assert out["snapshot-log"][-1]["snapshot-id"] == 11
    assert out["properties"]["k"] == "v"
    assert out["last-updated-ms"] == 456
    # unknown action rejected
    with pytest.raises(ValueError):
        apply_updates(meta, [{"action": "mystery"}], 1)


def _batch_df(spark, src, where):
    return spark.read.parquet(src).where(where).selectExpr(
        "CAST(id % 2 AS INT) AS partition",
        "named_struct('partition', CAST(id % 2 AS INT), 'offset', id, "
        "'timestamp_us', id * 1000) AS kafka",
        "CAST(CAST(id AS STRING) AS BINARY) AS value",
    )


def test_streaming_commit_through_catalog(server, spark, tmp_path):
    """Micro-batch Iceberg commits route through the REST catalog when
    configured — the reference's production path (catalog service owns
    the pointer) — and the (app_id, batch_id) replay-skip check reads
    catalog state, so exactly-once semantics survive the protocol
    switch."""
    import os

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        commit_envelope_batch,
    )

    src = str(tmp_path / "src")
    tdir = str(tmp_path / "stream_rest")
    os.makedirs(tdir, exist_ok=True)
    spark.range(0, 40).write.mode("append").parquet(src)
    client = RestCatalogClient(server.base_url)
    batch = _batch_df(spark, src, "id < 40")

    assert commit_envelope_batch(
        batch, 0, tdir, app_id="ck-A", catalog=client, table_name="stream_rest"
    ) is True
    assert server.commit_count >= 1
    # replay of the same (app, batch): skipped — decided from CATALOG state
    commits = server.commit_count
    assert commit_envelope_batch(
        batch, 0, tdir, app_id="ck-A", catalog=client, table_name="stream_rest"
    ) is False
    assert server.commit_count == commits
    # second batch: one more snapshot, chained
    spark.range(40, 60).write.mode("append").parquet(src)
    batch2 = _batch_df(spark, src, "id >= 40 AND id < 60")
    assert commit_envelope_batch(
        batch2, 1, tdir, app_id="ck-A", catalog=client, table_name="stream_rest"
    ) is True
    loaded = client.load_table("stream_rest")["metadata"]
    assert len(loaded["snapshots"]) == 2
    assert loaded["snapshots"][1]["summary"]["batch-id"] == "1"
    # file layout agrees with the catalog; reads see both batches
    assert read_table_metadata(tdir)["metadata"]["current-snapshot-id"] == \
        loaded["current-snapshot-id"]
    assert read_iceberg_table(spark, tdir).count() == 60
