"""Empirical scaling probe: run the heaviest operator families at 1x
(sf0.1) and at a synthetic 10x corpus and report the cost ratio — the
direct evidence behind every "this plan survives 100x" claim in the
operator docstrings.

The 10x corpus is 10 perturbed replicas of sf0.1 documents/embeddings
(distinct trailing token / +0.001*r vector shift), which also stresses
the near-dup machinery with a realistic 1000x larger candidate-pair
surface (every doc gains 9 near-duplicates).

Usage:  python bench_scaling.py           # builds /tmp/sfx10 if absent
Output: one aligned table; ratios ≲ data ratio (10) mean sub-linear
scaling (fixed overheads amortize); ~10 means linear (expected for the
fixed-K IVF probe and Lloyd iterations — at real scale K grows ~sqrt(N)
so per-cell cost stays flat).

Measured on local[32] (2026-08-14, round 5; events replicated 10x with
shifted event_id/user_id so the tiered store, the offset domain, and the
streaming key cardinality all grow 10x):

    query                             1x_s    10x_s  ratio
    dedup_exact                       0.22     0.50    2.3
    dedup_lines_keep_first            0.45     0.43    1.0
    quality_classifier_score          1.61     1.99    1.2
    dedup_minhash_lsh                 0.16     0.17    1.1
    dedup_ngram_jaccard               1.86     4.09    2.2   (pairs 256 -> 213k)
    simhash64_near_dup_pairs          1.64     2.43    1.5   (pairs 299 -> 186k)
    dedup_connected_components        0.05     0.06    1.2
    bm25_topk_docs                    0.99     1.88    1.9
    hybrid_rrf_retrieval              1.50     2.84    1.9
    kmeans_embedding_clusters         0.51     2.09    4.1   (linear/iteration, expected)
    ann_ivf_kmeans_topk               1.42     7.28    5.1   (fixed K: linear; scale K~sqrt(N))
    heavy_hitters_cms                 1.37     2.72    2.0
    pack_sequences                    0.34     1.17    3.4
    cdc_chunk_dedup_stats             0.77     2.96    3.8
    multimodal_image_decode           0.57     2.43    4.3
    tiered_roundtrip_agg              0.30     0.72    2.4   (full-store scan, sub-linear)
    tiered_offset_range_fetch         0.64     0.67    1.0   (fixed window: FLAT)
    streaming_windowed_counts         1.12     1.62    1.4
    streaming_dedup_exact             1.18     1.32    1.1
    streaming_user_totals_stateful    1.92     7.46    3.9   (rows 1.5k -> 15k, sub-linear/row)
    iceberg_scan_pruned               0.22     0.21    1.0   (metadata-planned prune: FLAT)

    tiered read, fixed offset window 100-599 (bytes-fetched accounting):
      1x : store  3.4 MB -> fetched 21.4 KB over 4 boundary segments
      10x: store 33.6 MB -> fetched 21.4 KB over 4 boundary segments
    Bytes pulled from the store are EXACTLY FLAT while the store grows
    10x — the range-planning win measured, not asserted (a whole-segment
    reader would fetch a constant fraction of the store instead).

    Re-measured round 6 (post index-cache / codec / catalog changes):
    every ratio within noise of round 5 or better (dedup_exact 2.0,
    multimodal_image_decode 3.1, simhash64 2.0, dedup_ngram_jaccard 2.4,
    tiered fixed-window 1.1, iceberg_scan_pruned 1.0), and the fixed
    offset window fetched EXACTLY 21.4 KB at both store scales again.

    Re-measured round 7 (post split-compaction / fast-path / transform
    work; full table in the round-7 transcript): every prior family
    within noise or BETTER — iceberg_changelog_scan 0.6x (the
    pure-append fast path), tiered fixed-window fetch EXACTLY 21.4 KB
    at both store scales again. New round-7 rows:
      iceberg_maintenance_soak            1.48 -> 1.31   0.9x (capped source: FLAT by design)
      iceberg_day_partition_scan          0.62 -> 0.58   0.9x (4 files opened at BOTH scales)
      iceberg_bucket_partition_scan       1.70 -> 1.54   0.9x (1 bucket opened at BOTH scales)
      multimodal_jpeg_progressive_decode  2.61 -> 22.63  8.7x (narrow map, rows 10x: linear, expected)

    Re-measured round 8 (post multi-field-spec generalization + typed
    partition values; full table in the round-8 transcript): every
    prior family within noise of r7 (three rows measured during a
    concurrent pytest run were re-measured clean: kmv_set_ops_audit
    6.3x, containment_sketch_audit 7.2x, iceberg_changelog_scan 1.6x —
    all matching their r6/r7 shapes), tiered fixed-window fetch EXACTLY
    21.4 KB at both store scales again. New round-8 rows:
      iceberg_multifield_partition_scan  1.87 -> 2.21  1.2x (ANDed
        (day, bucket) pruning opens ONE cell at BOTH scales)
      iceberg_spec_evolution_scan        0.66 -> 0.75  1.1x (both spec
        generations pruned via per-manifest spec-id at BOTH scales)
    The 100x METADATA grid (file/manifest counts, not rows) lives in
    --metadata-100x: day-window 4 files and composite lookup 1 cell at
    64/640/6400 files, streaming commit cost flat at 1000 commits.

    Iceberg row-delta plane (--position-deletes, round 6; 2% of rows
    deleted by predicate, measured after a warmup pass):
      1x  (400k rows): commit 0.96 s, read clean 0.28 s, read MoR 1.30 s
      10x (4M rows):   commit 0.83 s, read clean 0.24 s, read MoR 1.65 s
    The delete commit is flat at these scales (fixed job overheads
    dominate the distributed plan+write), and the merge-on-read
    anti-join overhead grew 1.4x while the data grew 10x — the delete
    set stays a broadcast, the corpus never re-shuffles.

    Column-stats bounds pruning (--bounds-pruning, round 6): a FIXED
    offset window planned over sorted-band tables at 40 vs 400 bands:
      bands= 40  files_total= 40  files_planned=3  plan_ms=  5.0  compacted= 2.4
      bands=400  files_total=400  files_planned=3  plan_ms= 50.8  compacted=22.1
    Files planned (the term that drives read cost) EXACTLY FLAT at 10x
    table size; plan walk is O(manifests) pre-compaction and O(entries)
    after — the same shape as the Java planner, and the reason
    rewrite_manifests exists for long-lived streaming tables.

    Round-6 families (main table, measured 2026-08-15):
      weighted_sample_pps      0.28 ->  0.48  (1.7x: partial top-K holds)
      kmv_set_ops_audit        1.96 -> 15.14  (7.7x: the EXACT COUNT
        DISTINCT audit side is linear by design — it is the ground
        truth the sketch replaces; the sketch build itself is top-K)
      containment_sketch_audit 0.91 ->  6.26  (6.9x while the audited
        pair surface grew 100x: 30k -> 3.0M pairs)
      iceberg_changelog_scan   1.80 ->  2.72  (1.5x: window-file plan
        split keeps the diff delta-sized)

    Round-6 late families (measured 2026-08-15, post host restart):
      tiered_read_committed         0.67 ->  1.75  (2.6x: full-store
        transactional scan + wire decode + visibility filter — same
        sub-linear shape as tiered_roundtrip_agg's full scan)
      txn_aborted_index_scan        0.62 ->  0.79  (1.3x: metadata-only
        — index blobs, never segment bytes; near flat)
      leader_epoch_checkpoint_scan  0.65 ->  1.25  (1.9x: checkpoint
        blobs per segment, segment count grows 10x)
      iceberg_files_table           0.60 ->  0.58  (1.0x: manifest-list
        driver read flat; entries parse executor-side)
      char_diversity_quality        0.31 ->  0.29  (count() prunes the
        aggregate values, so this row measures only the group-by keys;
        the simpson expression itself is a narrow map, linear in chars
        by construction and bench-measured at sf0.1 under noop-force)

    Incremental window planning (--incremental-window, round 6): a FIXED
    3-band window planned at 40 vs 400 total bands:
      bands= 40  window_files=3  plan_ms= 1.1  compacted= 2.0
      bands=400  window_files=3  plan_ms= 9.6  compacted=18.1
    Files planned EXACTLY FLAT; note the inversion vs full scans: the
    sequence-bounded manifest pruning skips per-commit manifests
    unopened (fast pre-compaction), while a compacted table's single
    manifest must be fully decoded — compaction optimizes FULL scans,
    per-commit manifests optimize bounded windows; both shapes stay
    far under the cost of opening even one data file.

    Deletion vectors + data-file compaction (main-table probes plus a
    dedicated 400k-vs-4M-row run, round 6):
      iceberg_dv_scan            0.81 -> 0.72  (1.0x: DV merge-on-read
        stays a broadcast bitmap anti-join; read cost tracks live rows)
      iceberg_rewrite_datafiles  0.56 -> 0.62  (1.1x: post-compaction
        read is a plain pruned scan, zero delete files)
      rows=400k: dv_commit 3.55s  rewrite_data_files 3.62s  read 0.44s
      rows=4M:   dv_commit 1.15s  rewrite_data_files 2.63s  read 0.18s
    The DV commit and the rewrite are FLAT-to-falling at 10x rows —
    both are one distributed job whose fixed scheduling overheads
    dominate at these scales; the rewrite's driver-side work is only
    O(#files) footer stats, so the 100-TB shape is the parquet write
    itself, perfectly parallel.

    Iceberg metadata-plane WRITE side (--iceberg-commits, round 6;
    1-file appends, pure metadata, no Spark):
      commits   1-10 :  3.6 ms/commit
      commits  91-100: 17.9 ms/commit  (manifest list grown to 100)
      rewrite_manifests: 15.2 ms -> 1 manifest; plan_scan 100 files 2.3 ms
      commits 101-110:  8.1 ms/commit  (post-compaction: cost RESET)
      commits 191-200: 20.6 ms/commit  (regrows -> compaction is periodic
                                        maintenance, as in real Iceberg)
    Commit cost is linear in live manifests (each append re-reads the
    manifest list and carries live manifests forward) and compaction
    resets it — measured, matching the Java library's appendFiles
    behavior; the residual slope is the known-files dedup set, the
    documented O(files-per-commit) driver-side term.
      via REST catalog: 5.7 ms/commit (1-10), 25.8 (91-100) — the HTTP
      round-trip + server-side update application adds ~2-8 ms/commit,
      constant in table age (the protocol is not the scaling term).
"""

from __future__ import annotations

import os
import time

PROBES = [
    "dedup_exact",
    "dedup_lines_keep_first",
    "quality_classifier_score",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash64_near_dup_pairs",
    "dedup_connected_components",
    "bm25_topk_docs",
    "hybrid_rrf_retrieval",
    "kmeans_embedding_clusters",
    "ann_ivf_kmeans_topk",
    "heavy_hitters_cms",
    "pack_sequences",
    "cdc_chunk_dedup_stats",
    "multimodal_image_decode",
    # round-5 extension: the tiered read path and the streaming families
    # (events is replicated 10x with shifted event_id/user_id, so the
    # store, the offset domain, and the key cardinality all grow 10x)
    "tiered_roundtrip_agg",
    "tiered_offset_range_fetch",
    "streaming_windowed_counts",
    "streaming_dedup_exact",
    "streaming_user_totals_stateful",
    "iceberg_scan_pruned",  # metadata-planned scan: prune cost is O(manifests)
    # round-6 extension: the sketch/sampling families and the CDC
    # changelog (the banded fixtures are covered by the dedicated
    # metadata probes instead — their cost is in commit count, not rows)
    "weighted_sample_pps",
    "kmv_set_ops_audit",
    "containment_sketch_audit",
    "iceberg_changelog_scan",
    # late-r6: the full delete plane — DV commit+read and the
    # rewrite-data-files compaction (one distributed read + one
    # distributed write; cost scales with live rows, never with
    # snapshot count)
    "iceberg_dv_scan",
    "iceberg_rewrite_datafiles",
    # round-6 late extension: the transactional read family (store,
    # aborted-range count, and epoch chains all grow 10x; note the 10x
    # event_ids are sparse — replicas offset by 500k — which the wire
    # arithmetic handles, only the DuckDB oracles assume density),
    # the diversity gate, and the distributed metadata-table read
    "tiered_read_committed",
    "txn_aborted_index_scan",
    "leader_epoch_checkpoint_scan",
    "char_diversity_quality",
    "iceberg_files_table",
    # round-7 extension: the composed maintenance gauntlet (source
    # capped by design — the schedule is the subject; flat expected),
    # the partition-transform scans (pruning is metadata-grain: the
    # day window opens 4 files and the bucket lookup 1 bucket at both
    # scales; fixture build cost grows with rows, the READ should not),
    # and the progressive-JPEG decode (narrow Arrow map over documents,
    # rows grow 10x so decode cost ~10x/linear is the expected shape)
    "iceberg_maintenance_soak",
    "iceberg_day_partition_scan",
    "iceberg_bucket_partition_scan",
    "multimodal_jpeg_progressive_decode",
    # round-8 extension: the multi-field spec point lookup (ANDed
    # two-field pruning opens ONE (day, bucket) cell at both scales)
    # and the spec-evolution read (two hive generations unioned; the
    # day window prunes both via per-manifest spec-id resolution —
    # fixture build grows with rows, the READ plan should not)
    "iceberg_multifield_partition_scan",
    "iceberg_spec_evolution_scan",
]

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_SF = "/tmp/sfx10"
REPLICAS = 10


def build_10x() -> None:
    import duckdb

    os.makedirs(BIG_SF, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT doc_id + 500000 * r AS doc_id,
         text || ' rep' || CAST(r AS VARCHAR) AS text,
         lang, source, n_chars + 5 AS n_chars
  FROM read_parquet('{BASE_SF}/documents.parquet'),
       generate_series(0, {REPLICAS - 1}) t(r)
) TO '{BIG_SF}/documents.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT vec_id + 500000 * r AS vec_id,
         list_transform(embedding, x -> x + 0.001 * r) AS embedding,
         label
  FROM read_parquet('{BASE_SF}/embeddings.parquet'),
       generate_series(0, {REPLICAS - 1}) t(r)
) TO '{BIG_SF}/embeddings.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT event_id + 500000 * r AS event_id,
         ts,
         user_id + 100000 * r AS user_id,
         event_type, value, props
  FROM read_parquet('{BASE_SF}/events.parquet'),
       generate_series(0, {REPLICAS - 1}) t(r)
) TO '{BIG_SF}/events.parquet' (FORMAT PARQUET)
""")
    for t in ["region", "nation", "customer", "supplier",
              "part", "orders", "lineitem"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE_SF}/{t}.parquet')) "
            f"TO '{BIG_SF}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    from tiered_storage_for_apache_kafka_spark.operators import QUERIES
    from tiered_storage_for_apache_kafka_spark.session import get_spark

    if not os.path.exists(f"{BIG_SF}/documents.parquet"):
        build_10x()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    def run(sf: str) -> dict[str, tuple[float, int]]:
        out = {}
        for name in PROBES:
            t0 = time.time()
            n = QUERIES[name](spark, sf).count()
            out[name] = (round(time.time() - t0, 2), n)
        return out

    run(BASE_SF)  # warm shared caches
    base = run(BASE_SF)
    run(BIG_SF)  # warm 10x caches
    big = run(BIG_SF)
    print(f"{'query':32s} {'1x_s':>7} {'10x_s':>8} {'ratio':>6}  rows 1x->10x")
    for name in PROBES:
        b, n1 = base[name]
        g, n2 = big[name]
        ratio = round(g / b, 1) if b > 0.01 else float("inf")
        print(f"{name:32s} {b:7.2f} {g:8.2f} {ratio:6.1f}  {n1}->{n2}")
    probe_tiered_bytes(spark)
    spark.stop()


def probe_tiered_bytes(spark) -> None:
    """Bytes-fetched accounting for the byte-range-planned tiered read
    (round-4 verdict ask #8): for the fixed offset window the queries
    use, the bytes pulled from the store must stay ~FLAT while the store
    grows 10x — the direct measurement of the range-planning win (a
    whole-segment reader would hold a constant fraction of store size,
    not a constant byte count)."""
    from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
    from tiered_storage_for_apache_kafka_spark.operators import tiered as T
    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        TOPIC,
        TOPIC_ID,
        _build_manager,
        fetch_segment_window,
    )

    print()
    print(f"{'tiered read (window '+str(T.OFFSET_RANGE_LO)+'-'+str(T.OFFSET_RANGE_HI)+')':42s} "
          f"{'store_MB':>9} {'fetched_KB':>11} {'segs':>5} {'recs':>6}")
    for label, sf in (("1x", BASE_SF), ("10x", BIG_SF)):
        manifests, conf = T._tier(spark, sf)
        rows = manifests.collect()
        store_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(conf["root"]) for f in fs
        )
        mgr = _build_manager(conf)
        counter = {"bytes": 0}
        orig_fetch = mgr.backend.fetch

        def counting(key, byte_range=None, _o=orig_fetch, _c=counter):
            import io

            with (_o(key, byte_range) if byte_range is not None else _o(key)) as f:
                data = f.read()
            _c["bytes"] += len(data)
            return io.BytesIO(data)

        mgr.backend.fetch = counting
        lo, hi = T.OFFSET_RANGE_LO, T.OFFSET_RANGE_HI
        segs = 0
        for r in rows:
            if r.end_offset < lo or r.start_offset > hi:
                continue
            segs += 1
            meta = SegmentMetadata(
                TOPIC, TOPIC_ID, int(r.partition), int(r.start_offset),
                int(r.end_offset), r.segment_uuid,
            )
            fetch_segment_window(mgr, meta, lo, hi)
        print(f"{label:42s} {store_bytes/1e6:9.1f} {counter['bytes']/1e3:11.1f} "
              f"{segs:5d} {hi-lo+1:6d}")


def probe_iceberg_commit_cost() -> None:
    """Write-side curve of the Iceberg metadata plane (round-5 verdict
    ask #8): per-commit cost as snapshots accumulate, then
    `rewrite_manifests`, then more commits — measuring whether
    compaction actually resets the O(manifests-per-commit) term (each
    append re-reads the prior manifest list and carries every live
    manifest forward). Pure-metadata probe: 1-row parquet data files via
    pyarrow, no Spark session. Run: python bench_scaling.py --iceberg-commits

    Round-8 finding (via probe_metadata_100x's 100x commit leg): the
    default mode's curve here (4 -> 18 -> 26 ms over 200 commits) is
    dominated by the committed-file DEDUP walk, which parses every
    manifest entry per commit and which compaction cannot bound — plus
    an unbounded metadata-log re-serialization. Fixes:
    ``commit_append(..., assume_new_files=True)`` for callers with an
    exactly-once contract (the streaming ingest path), and the Iceberg
    ``write.metadata.previous-versions-max`` cap (default 100). Under
    the full ops posture the commit cost is FLAT at 1000 commits —
    see probe_metadata_100x.
    """
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
        read_table_metadata,
        rewrite_manifests,
    )

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    tdir = tempfile.mkdtemp(prefix="iceberg-commit-probe-")
    os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
    tbl = pa.table({"partition": pa.array([0], pa.int32()),
                    "offset": pa.array([0], pa.int64())})

    def one_commit(i: int) -> float:
        path = os.path.join(tdir, "partition=0", f"f{i:04d}.parquet")
        pq.write_table(tbl, path)
        t0 = time.perf_counter()
        commit_append(tdir, schema, now_ms=i + 1, files=[path])
        return time.perf_counter() - t0

    def bucket(lo: int, hi: int) -> float:
        return sum(times[lo:hi]) / (hi - lo) * 1000

    times = [one_commit(i) for i in range(100)]
    manifests_before = len(read_table_metadata(tdir)["manifest_list"])
    t0 = time.perf_counter()
    rewrite_manifests(tdir, now_ms=10_000)
    compact_ms = (time.perf_counter() - t0) * 1000
    manifests_after = len(read_table_metadata(tdir)["manifest_list"])
    t0 = time.perf_counter()
    n_files = len(plan_scan(tdir))
    scan_ms = (time.perf_counter() - t0) * 1000
    times += [one_commit(100 + i) for i in range(100)]
    print("iceberg commit cost (ms/commit, 1-file appends):")
    print(f"  commits   1-10 : {bucket(0, 10):7.1f}")
    print(f"  commits  91-100: {bucket(90, 100):7.1f}   "
          f"(manifest list grew to {manifests_before} manifests)")
    print(f"  rewrite_manifests: {compact_ms:.1f} ms -> {manifests_after} manifest; "
          f"plan_scan of {n_files} files: {scan_ms:.1f} ms")
    print(f"  commits 101-110: {bucket(100, 110):7.1f}   (post-compaction)")
    print(f"  commits 191-200: {bucket(190, 200):7.1f}")
    shutil.rmtree(tdir, ignore_errors=True)

    # the same curve through the REST-catalog protocol: what the HTTP
    # round-trip + server-side update application adds per commit
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir2 = tempfile.mkdtemp(prefix="iceberg-commit-rest-probe-")
    os.makedirs(os.path.join(tdir2, "partition=0"), exist_ok=True)
    with FakeRestCatalogServer() as srv:
        client = RestCatalogClient(srv.base_url)

        def one_rest_commit(i: int) -> float:
            path = os.path.join(tdir2, "partition=0", f"f{i:04d}.parquet")
            pq.write_table(tbl, path)
            t0 = time.perf_counter()
            commit_append(tdir2, schema, now_ms=i + 1, files=[path],
                          catalog=client)
            return time.perf_counter() - t0

        times = [one_rest_commit(i) for i in range(100)]
        print("iceberg commit cost via REST catalog (ms/commit):")
        print(f"  commits   1-10 : {bucket(0, 10):7.1f}")
        print(f"  commits  91-100: {bucket(90, 100):7.1f}")
    shutil.rmtree(tdir2, ignore_errors=True)




def probe_transform_pruning() -> None:
    """Partition-transform pruning curve (round 7): plan cost of a
    fixed 4-day source-range window on a day(ts)-partitioned table as
    the table grows 64 -> 640 day-files. Pure metadata (pyarrow 1-row
    files + commit_append), no Spark.

    Measured 2026-08-15 (this host). FIRST run (single-manifest
    compaction): one 640-day manifest forced 38 ms of entry filtering
    where ten 64-day manifests planned in 2.8 ms via summary pruning,
    and rewrite_manifests DESTROYED the granularity (29.9 ms after).
    The probe's finding became the fix — rewrite_manifests now splits
    output into partition-clustered manifests of target_entries each —
    and the re-measure closes the loop:
      days= 64 commits=  1  plan_ms=  2.5  files=4
      days=640 commits=  1  plan_ms= 24.0  files=4
      days=640 commits= 10  plan_ms=  2.9  files=4
        after split rewrite (target 64): plan_ms= 2.9  files=4
    The window opens a CONSTANT 4 files at every size, and compaction
    now preserves the summary-pruning index (2.9 ms before == after).
    Run: python bench_scaling.py --transform-pruning
    """
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
        rewrite_manifests,
    )

    MICROS_PER_DAY = 86_400_000_000
    schema = T.StructType(
        [
            T.StructField("ts_us", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )

    def build(n_days: int, n_commits: int) -> str:
        tdir = tempfile.mkdtemp(prefix="transform-prune-")
        per = n_days // n_commits
        for c in range(n_commits):
            files = []
            for d in range(c * per, (c + 1) * per):
                dd = os.path.join(tdir, f"ts_day={d}")
                os.makedirs(dd, exist_ok=True)
                path = os.path.join(dd, "f.parquet")
                pq.write_table(
                    pa.table(
                        {
                            "ts_us": pa.array([d * MICROS_PER_DAY], pa.int64()),
                            "v": pa.array([d], pa.int64()),
                        }
                    ),
                    path,
                )
                files.append(path)
            commit_append(
                tdir, schema, partition_col="ts_day", now_ms=c + 1,
                files=files, partition_transform="day",
                partition_source="ts_us",
            )
        return tdir

    lo, hi = 10 * MICROS_PER_DAY, 14 * MICROS_PER_DAY - 1
    for n_days, n_commits in ((64, 1), (640, 1), (640, 10)):
        tdir = build(n_days, n_commits)

        def plan_ms() -> tuple[float, int]:
            t0 = time.perf_counter()
            files = plan_scan(tdir, source_range=(lo, hi))
            return (time.perf_counter() - t0) * 1000, len(files)

        ms, n = plan_ms()
        line = f"days={n_days:4d} commits={n_commits:3d}  plan_ms={ms:6.1f}  files={n}"
        if n_commits > 1:
            rewrite_manifests(tdir, now_ms=n_commits + 1, target_entries=64)
            ms2, n2 = plan_ms()
            line += f"  after split rewrite (target 64): plan_ms={ms2:6.1f} files={n2}"
        print(line)
        assert n == 4, n
        shutil.rmtree(tdir, ignore_errors=True)


def probe_metadata_100x() -> None:
    """100x metadata-plane flatness (round-8 verdict ask #5): the brief's
    bar is 100x survival, but the grid only went to 10x — and the 10x
    transform-pruning probe caught a real bug (manifest-granularity
    collapse) a grid would have missed. This probe synthesizes metadata
    to 100x FILE counts (data stays 1 row/file — the claim under test
    is metadata flatness, not byte throughput) for the three
    pruning-sensitive planes:

      1. day-window plan: 64 -> 640 -> 6400 day-files; a fixed 4-day
         window must open exactly 4 files at every scale, with plan
         cost bounded by summary pruning after the partition-clustered
         manifest split.
      2. composite (day(ts), bucket[8](id)) point lookup: 64 -> 640 ->
         6400 (day, bucket) cells; an ANDed two-field predicate must
         open exactly ONE cell at every scale.
      3. streaming-commit cost at 100x table age: 1-file explicit
         commits under the real ops posture (assume_new_files +
         rewrite_manifests + expire_snapshots every 64) must stay FLAT
         — this leg is what CAUGHT the round-8 fix chain: the
         known-set dedup walk was O(table-age) per commit (fixed:
         assume_new_files), and metadata-log grew unboundedly (fixed:
         write.metadata.previous-versions-max cap, Iceberg's default).

    4. (round-9) write_iceberg_table append at 100x table FILE count:
       the writer's staging-dir file capture makes one append's cost
       O(batch) — the round-8 walk-diff was O(table listing) per
       append, exactly the class of driver-side cost legs 1-3 rule out
       elsewhere.

    Measured 2026-08-15 (this host), after the fixes:
      day-window  files=4/4/4   plan_ms 2.6 / 2.9 / 6.3   (64/640/6400)
      composite   files=1/1/1   plan_ms 4.3 / 2.9 / 5.2   (64/640/6400 cells)
      commits     1-10: 1.8ms   991-1000: 4.6ms           (flat at 100x age)
      writer append (staged capture) 596 / 533 / 490 ms at 64/640/6400
        table files — FLAT, wall time is the Spark write job itself
      scoped-inc  files=4/4/4  plan_ms 2.7 / 3.3 / 7.2  (128/1280/6400
        day-files; the scoped changelog/stream seq-window planner gives
        the same 4 files at 2.7 / 3.5 / 7.0 ms)
    Plan cost grows ~2.4x for 100x files (manifest-list length), files
    opened constant. Run: python bench_scaling.py --metadata-100x
    """
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        bucket_hash_long,
        commit_append,
        expire_snapshots,
        plan_scan,
        rewrite_manifests,
    )

    MICROS_PER_DAY = 86_400_000_000
    day_schema = T.StructType(
        [T.StructField("ts_us", T.LongType()), T.StructField("v", T.LongType())]
    )

    def build_days(n_days: int) -> str:
        tdir = tempfile.mkdtemp(prefix="m100x-day-")
        for c in range(0, n_days, 64):
            files = []
            for d in range(c, min(c + 64, n_days)):
                dd = os.path.join(tdir, f"ts_day={d}")
                os.makedirs(dd, exist_ok=True)
                path = os.path.join(dd, "f.parquet")
                pq.write_table(
                    pa.table(
                        {
                            "ts_us": pa.array([d * MICROS_PER_DAY], pa.int64()),
                            "v": pa.array([d], pa.int64()),
                        }
                    ),
                    path,
                )
                files.append(path)
            commit_append(
                tdir, day_schema, partition_col="ts_day", now_ms=c + 1,
                files=files, partition_transform="day",
                partition_source="ts_us", assume_new_files=True,
            )
        rewrite_manifests(tdir, now_ms=n_days + 10, target_entries=64)
        return tdir

    lo, hi = 10 * MICROS_PER_DAY, 14 * MICROS_PER_DAY - 1
    for n_days in (64, 640, 6400):
        tdir = build_days(n_days)
        t0 = time.perf_counter()
        files = plan_scan(tdir, source_range=(lo, hi))
        ms = (time.perf_counter() - t0) * 1000
        print(f"day-window  days={n_days:5d}  plan_ms={ms:6.1f}  files={len(files)}")
        assert len(files) == 4, len(files)
        shutil.rmtree(tdir, ignore_errors=True)

    # -- composite (day, bucket[8]) point lookup ------------------------------
    N_B = 8
    comp_schema = T.StructType(
        [
            T.StructField("ts_us", T.LongType()),
            T.StructField("id", T.LongType()),
        ]
    )
    comp_spec = [("ts_day", "day", "ts_us"), ("id_bucket", f"bucket[{N_B}]", "id")]

    def build_cells(n_cells: int) -> str:
        n_days = n_cells // N_B
        tdir = tempfile.mkdtemp(prefix="m100x-comp-")
        # one id per (day, bucket) cell: scan ids until each day has
        # every bucket filled (deterministic, spec Murmur3 routing)
        batch: list[str] = []
        for d in range(n_days):
            need = set(range(N_B))
            i = 0
            while need:
                b = (bucket_hash_long(i) & 0x7FFFFFFF) % N_B
                if b in need:
                    need.remove(b)
                    dd = os.path.join(tdir, f"ts_day={d}", f"id_bucket={b}")
                    os.makedirs(dd, exist_ok=True)
                    path = os.path.join(dd, "f.parquet")
                    pq.write_table(
                        pa.table(
                            {
                                "ts_us": pa.array(
                                    [d * MICROS_PER_DAY + i], pa.int64()
                                ),
                                "id": pa.array([i], pa.int64()),
                            }
                        ),
                        path,
                    )
                    batch.append(path)
                i += 1
            if len(batch) >= 512 or d == n_days - 1:
                commit_append(
                    tdir, comp_schema, now_ms=d + 1, files=batch,
                    partition_spec=comp_spec, assume_new_files=True,
                )
                batch = []
        rewrite_manifests(tdir, now_ms=n_days + 10, target_entries=64)
        return tdir

    probe_id = 3  # some id present on every day by construction's scan
    for n_cells in (64, 640, 6400):
        tdir = build_cells(n_cells)
        d = 5 % (n_cells // N_B)
        window = (d * MICROS_PER_DAY, (d + 1) * MICROS_PER_DAY - 1)
        t0 = time.perf_counter()
        files = plan_scan(
            tdir, source_predicates={"ts_us": window, "id": probe_id}
        )
        ms = (time.perf_counter() - t0) * 1000
        cells = {
            (f["partition"]["ts_day"], f["partition"]["id_bucket"])
            for f in files
        }
        print(
            f"composite   cells={n_cells:5d}  plan_ms={ms:6.1f}  "
            f"files={len(files)}  cells_opened={len(cells)}"
        )
        assert len(cells) == 1, cells
        shutil.rmtree(tdir, ignore_errors=True)

    # -- partition-scoped incremental/changelog/stream planning at 100x -------
    # (round-9 verdict ask #4: these planes landed after the r8 grid and
    # had only 1x/10x shapes. The claim: a day-scoped incremental window,
    # changelog, and stream batch each open ONLY the in-scope files,
    # constant while total metadata grows 100x.)
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _plan_seq_window,
        plan_incremental_scan,
        read_table_metadata,
    )

    def build_days_multisnap(n_days: int) -> tuple[str, int]:
        """Like build_days but WITHOUT the final manifest compaction and
        returning an early from-snapshot id, so incremental windows and
        per-snapshot stream batches exist to scope."""
        tdir = tempfile.mkdtemp(prefix="m100x-inc-")
        first_id = None
        for c in range(0, n_days, 64):
            files = []
            for d in range(c, min(c + 64, n_days)):
                dd = os.path.join(tdir, f"ts_day={d}")
                os.makedirs(dd, exist_ok=True)
                path = os.path.join(dd, "f.parquet")
                pq.write_table(
                    pa.table(
                        {
                            "ts_us": pa.array([d * MICROS_PER_DAY], pa.int64()),
                            "v": pa.array([d], pa.int64()),
                        }
                    ),
                    path,
                )
                files.append(path)
            meta = commit_append(
                tdir, day_schema, partition_col="ts_day", now_ms=c + 1,
                files=files, partition_transform="day",
                partition_source="ts_us", assume_new_files=True,
            )
            if first_id is None:
                first_id = meta["current-snapshot-id"]
        return tdir, first_id

    scope = {"ts_us": (66 * MICROS_PER_DAY, 70 * MICROS_PER_DAY - 1)}
    for n_days in (128, 1280, 6400):  # >=2 snapshots at the smallest
        tdir, from_id = build_days_multisnap(n_days)
        # scoped incremental: window = everything after snapshot 1,
        # scope = a fixed 4-day slice living entirely inside the window
        t0 = time.perf_counter()
        inc = plan_incremental_scan(
            tdir, from_id, source_predicates=scope
        )
        inc_ms = (time.perf_counter() - t0) * 1000
        # scoped changelog planning: same window is pure-append, so the
        # changelog plan IS the incremental plan; assert via the shared
        # seq-window planner under constraints (what read_iceberg_changelog
        # and the stream's partitions() both call)
        meta = read_table_metadata(tdir)["metadata"]
        lo_seq = next(
            int(s["sequence-number"])
            for s in meta["snapshots"]
            if s["snapshot-id"] == from_id
        )
        hi_seq = meta["last-sequence-number"]
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
            _resolve_constraints,
        )

        t0 = time.perf_counter()
        stream_files = _plan_seq_window(
            meta, lo_seq, hi_seq,
            _resolve_constraints(meta, None, None, None, scope),
        )
        stream_ms = (time.perf_counter() - t0) * 1000
        print(
            f"scoped-inc   days={n_days:5d}  plan_ms={inc_ms:6.1f}  "
            f"files={len(inc)}   stream/changelog plan_ms={stream_ms:6.1f}  "
            f"files={len(stream_files)}"
        )
        assert len(inc) == 4, len(inc)
        assert len(stream_files) == 4, len(stream_files)
        shutil.rmtree(tdir, ignore_errors=True)

    # -- write_iceberg_table append cost at 100x table file count -------------
    # (round-9: the writer's file capture is staging-based; its cost
    # must be O(batch), INDEPENDENT of how many files the table already
    # holds — the round-8 walk-diff was O(table listing) per append)
    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        write_iceberg_table,
    )

    spark = get_spark(app_name="m100x-writer")
    append_df = spark.createDataFrame(
        [(7 * MICROS_PER_DAY + i, 1000 + i) for i in range(8)],
        "ts_us long, v long",
    )
    wspec = [("ts_day", "day", "ts_us")]
    writer_ms = {}
    for n_days in (64, 640, 6400):
        tdir = build_days(n_days)
        write_iceberg_table(  # warm the session's write path once
            spark, append_df, tdir, partition_spec=wspec, now_ms=n_days + 20
        )
        t0 = time.perf_counter()
        write_iceberg_table(
            spark, append_df, tdir, partition_spec=wspec, now_ms=n_days + 30
        )
        writer_ms[n_days] = (time.perf_counter() - t0) * 1000
        shutil.rmtree(tdir, ignore_errors=True)
    print(
        "write_iceberg_table append (ms, table files 64/640/6400): "
        + "  ".join(f"{writer_ms[n]:6.0f}" for n in (64, 640, 6400))
    )

    # -- streaming-commit cost at 100x table age ------------------------------
    tdir = tempfile.mkdtemp(prefix="m100x-commit-")
    os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
    tbl = pa.table(
        {"partition": pa.array([0], pa.int32()), "offset": pa.array([0], pa.int64())}
    )
    pschema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    times = []
    for i in range(1000):
        path = os.path.join(tdir, "partition=0", f"f{i:05d}.parquet")
        pq.write_table(tbl, path)
        t0 = time.perf_counter()
        commit_append(
            tdir, pschema, now_ms=2 * i + 1, files=[path],
            assume_new_files=True,
        )
        times.append((time.perf_counter() - t0) * 1000)
        if (i + 1) % 64 == 0:
            rewrite_manifests(tdir, now_ms=2 * i + 2)
            expire_snapshots(tdir, keep_last=8, now_ms=2 * i + 2)
    n = len(plan_scan(tdir))
    assert n == 1000, n
    print(
        f"commit cost (assume_new_files + maintenance every 64): "
        f"1-10 {sum(times[:10]) / 10:5.1f} ms   "
        f"491-500 {sum(times[490:500]) / 10:5.1f} ms   "
        f"991-1000 {sum(times[-10:]) / 10:5.1f} ms"
    )
    shutil.rmtree(tdir, ignore_errors=True)


def probe_zorder_pruning() -> None:
    """Z-order clustering at 1x and 10x row counts (round-9): after
    `rewrite_data_files(zorder_by=["x", "y"])`, a column-bounds probe
    on EITHER dimension alone must open a strictly-shrinking FRACTION
    of the table's files — the interleave gives every file tight
    bounds on both axes, where a linear sort serves only its leading
    column. Run: python bench_scaling.py --zorder

    Measured 2026-08-15 (this host; 16 files at both scales, the
    domain grows ~3x per axis at 10x rows):
      n= 4096  files=16  x-probe 8/16  y-probe 8/16
      n=40960  files=16  x-probe 4/16  y-probe 4/16
    The opened FRACTION shrinks as the domain grows past the fixed
    16x16 probe box (1/2 -> 1/4 on EACH axis independently): every
    file's z-range covers less of the box — the multi-dimension analog
    of the sorted-table bounds-pruning probe, on BOTH axes at once."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        plan_scan,
        rewrite_data_files,
        write_iceberg_table,
    )

    spark = get_spark(app_name="zorder-probe")
    for n in (4096, 40960):
        tdir = tempfile.mkdtemp(prefix="zorder-probe-")
        side = 64 if n == 4096 else 202  # ~sqrt(n) grid side
        df = spark.range(n).select(
            F.col("id"),
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
            F.lit(0).cast("int").alias("partition"),
        )
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["x", "y"], max_records_per_file=n // 16,
        )
        total = len(plan_scan(tdir))
        xs = len(plan_scan(tdir, column_bounds=("x", 8, 23)))
        ys = len(plan_scan(tdir, column_bounds=("y", 8, 23)))
        print(
            f"zorder n={n:6d}  files={total:4d}  "
            f"x-probe {xs}/{total}  y-probe {ys}/{total}"
        )
        assert 0 < xs < total and 0 < ys < total
        shutil.rmtree(tdir, ignore_errors=True)


def probe_rest_contention() -> None:
    """Optimistic-concurrency cost under REAL contention (round-6
    verdict ask #8): N writer threads race M commits each against one
    REST-catalog table; losers reload-and-rebase (the protocol's 409
    path, unit-tested for both interleavings — this measures it). The
    invariant checked: every commit lands (N*M snapshots, zero lost
    updates); the numbers reported: lost-race count, rebase cost
    (commit latency vs snapshot count per contention level). Pure
    metadata probe, no Spark. Run: python bench_scaling.py --rest-contention

    This probe CAUGHT a livelock when first run (round 7): with no
    backoff between retries, 4 tight-loop writers burned an 8-retry
    budget re-racing inside the window they had just lost (59 conflicts
    /60 commits, 26 snapshots lost). Fix: exponential backoff with
    jitter in every catalog commit loop (``commit_retry_backoff`` —
    real Iceberg's commit.retry.min-wait-ms shape). Measured after the
    fix (2026-08-15, this host):
      writers=1  commits=60  snapshots=60  conflicts=0   mean  13.2 ms/commit
      writers=4  commits=60  snapshots=60  conflicts=16  mean  58.9 ms/commit
      writers=8  commits=64  snapshots=64  conflicts=24  mean 134.2 ms/commit
    Every commit lands; rebase cost grows with the conflict rate, not
    with table size — each retry re-reads one metadata version and
    re-stages O(batch) manifest entries, the same shape real Iceberg's
    CommitFailedException loop has.
    """
    import shutil
    import tempfile
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _current_state_meta,
        commit_append,
    )
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    schema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    tbl = pa.table({"partition": pa.array([0], pa.int32()),
                    "offset": pa.array([0], pa.int64())})

    for n_writers, per_writer in ((1, 60), (4, 15), (8, 8)):
        tdir = tempfile.mkdtemp(prefix="rest-contention-")
        os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
        with FakeRestCatalogServer() as srv:
            conflicts = [0] * n_writers
            latencies: list[float] = []
            lat_lock = threading.Lock()

            def writer(wid: int) -> None:
                client = RestCatalogClient(srv.base_url)
                real = client.commit_table

                def counting(*a, **kw):
                    try:
                        return real(*a, **kw)
                    except CommitConflictError:
                        conflicts[wid] += 1
                        raise

                client.commit_table = counting
                for i in range(per_writer):
                    path = os.path.join(
                        tdir, "partition=0", f"w{wid}-f{i:03d}.parquet"
                    )
                    pq.write_table(tbl, path)
                    t0 = time.perf_counter()
                    commit_append(
                        tdir, schema, now_ms=wid * 1_000 + i + 1,
                        files=[path], catalog=client,
                        max_commit_retries=8,
                    )
                    with lat_lock:
                        latencies.append(time.perf_counter() - t0)

            threads = [
                threading.Thread(target=writer, args=(w,))
                for w in range(n_writers)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            # final state via the catalog (the committed source of truth)
            _v, final, _t = _current_state_meta(tdir, RestCatalogClient(srv.base_url), None)
            n_commits = n_writers * per_writer
            n_snaps = len(final["snapshots"])
            mean_ms = sum(latencies) / len(latencies) * 1000
            print(
                f"writers={n_writers}  commits={n_commits}  "
                f"snapshots={n_snaps}  conflicts={sum(conflicts)}  "
                f"mean {mean_ms:.1f} ms/commit  "
                f"{'OK' if n_snaps == n_commits else 'LOST UPDATES'}"
            )
            assert n_snaps == n_commits, "lost update under contention"
        shutil.rmtree(tdir, ignore_errors=True)


def probe_position_deletes() -> None:
    """Scale curve of the Iceberg row-delta plane (round 6): delete
    planning/commit and merge-on-read overhead at 1x and 10x row
    counts. The claims under measurement: (a) the delete commit costs
    ~O(matched rows) — it is a distributed scan plus one delete-file
    write per partition; (b) the merge-on-read anti-join adds a small,
    scale-stable overhead to reads (the delete set broadcast-joins)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        write_table,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    print(
        f"{'position deletes':18s} {'rows':>9} {'commit_del_s':>13} "
        f"{'read_clean_s':>13} {'read_mor_s':>11} {'mor_overhead':>13}"
    )
    # warmup pass first: the very first Spark jobs pay codegen/broadcast
    # init that would otherwise land entirely on the 1x row
    for label, n in (("warmup", 50_000), ("1x", 400_000), ("10x", 4_000_000)):
        tdir = tempfile.mkdtemp(prefix=f"posdel-{label}-")
        df = spark.range(n).select(
            (F.col("id") % 8).cast("int").alias("partition"),
            F.col("id").alias("offset"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ).repartition(8, "partition")
        write_table(df, tdir)
        ice.commit_append(tdir, df.schema)

        t0 = time.time()
        ice.read_iceberg_table(spark, tdir).agg(F.sum("offset")).collect()
        read_clean = time.time() - t0

        t0 = time.time()
        ice.commit_position_deletes(spark, tdir, "offset % 50 = 7")  # 2%
        commit_del = time.time() - t0

        t0 = time.time()
        ice.read_iceberg_table(spark, tdir).agg(F.sum("offset")).collect()
        read_mor = time.time() - t0

        if label != "warmup":
            print(
                f"{label:18s} {n:9d} {commit_del:13.2f} {read_clean:13.2f} "
                f"{read_mor:11.2f} {read_mor - read_clean:12.2f}s"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()

def probe_rpd_merge() -> None:
    """Scale curve of rewrite_position_deletes (round 10): the merge is
    one distributed pass over DELETE bytes — cost must be ~linear in
    accumulated delete files/rows and FLAT in table size (the table's
    data bytes are never read; only the live-path list joins in). Legs:

      1x      400k-row table,  4 delete commits
      10x-del 400k-row table, 40 delete commits (10x delete files/rows)
      10x-tbl   4M-row table,  4 delete commits (same delete plane as 1x)
      capped  the 10x-del table re-merged under max_rows_per_delete_file

    Claims: rpd(10x-del) ~ 10x rpd(1x) or better (per-file overhead
    amortizes), rpd(10x-tbl) ~ rpd(1x) (table-size-flat), and the row
    cap changes output file count, not asymptotics."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        write_table,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    print(
        f"{'rpd merge':10s} {'tbl_rows':>9} {'del_files':>9} "
        f"{'del_rows':>9} {'rpd_s':>7} {'files_out':>9}"
    )

    def _build(n_rows: int, n_commits: int, label: str) -> str:
        tdir = tempfile.mkdtemp(prefix=f"rpd-{label}-")
        df = spark.range(n_rows).select(
            (F.col("id") % 8).cast("int").alias("partition"),
            F.col("id").alias("offset"),
        ).repartition(8, "partition")
        write_table(df, tdir)
        ice.commit_append(tdir, df.schema)
        for k in range(n_commits):
            # ~0.025% of rows per commit, disjoint across commits
            ice.commit_position_deletes(
                spark, tdir, f"offset % 4001 = {k}", now_ms=(k + 2) * 1_000
            )
        return tdir

    def _delete_plane(tdir: str) -> tuple[int, int]:
        back = ice.read_table_metadata(tdir)
        files = rows = 0
        for m in back["manifests"]:
            for e in m["entries"]:
                d = e["data_file"]
                if e["status"] != 2 and d.get("content") == 1:
                    files += 1
                    rows += int(d["record_count"])
        return files, rows

    legs = [
        ("warmup", 50_000, 3, None),
        ("1x", 400_000, 4, None),
        ("10x-del", 400_000, 40, None),
        ("10x-tbl", 4_000_000, 4, None),
        ("capped", 400_000, 40, 64),
    ]
    for label, n_rows, n_commits, cap in legs:
        tdir = _build(n_rows, n_commits, label)
        n_files, n_del_rows = _delete_plane(tdir)
        t0 = time.time()
        ice.rewrite_position_deletes(
            spark, tdir, now_ms=10**9, max_rows_per_delete_file=cap
        )
        rpd_s = time.time() - t0
        files_out, rows_out = _delete_plane(tdir)
        assert rows_out == n_del_rows, (rows_out, n_del_rows)
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {n_files:9d} "
                f"{n_del_rows:9d} {rpd_s:7.2f} {files_out:9d}"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_cdc_upsert() -> None:
    """Scale curve of merge_upsert (round 10): the merge never reads
    the target table — a fixed-size CDC batch must cost the SAME
    against a 10x-larger table (flat), and a 10x batch against the
    same table ~10x (linear in batch). Legs:

      1x       400k-row table, 4k-row batch
      10x-tbl    4M-row table, 4k-row batch  (claim: ~flat vs 1x)
      10x-batch 400k-row table, 40k-row batch (claim: ~linear in batch)

    Each batch is 50% updates / 25% deletes / 25% inserts (selected on
    the batch index, so the mix is stride-independent), merged on a
    bucket[8] key spec (partition-scoped retractions — the scale-good
    path)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    def _build(n_rows: int, label: str) -> str:
        tdir = tempfile.mkdtemp(prefix=f"cdc-{label}-")
        df = spark.range(n_rows).select(
            F.col("id"),
            (F.col("id") % 10).cast("bigint").alias("grp"),
            (F.col("id") * 3).cast("bigint").alias("v"),
        )
        ice.write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=spec
        )
        return tdir

    def _batch(n: int, table_rows: int, evolve: bool = False):
        k = F.col("id")  # batch index; keys stride over the table
        scaled = k * (table_rows // n)
        cols = [
            F.when(k % 4 == 1, scaled + table_rows)
            .otherwise(scaled)
            .alias("id"),  # k%4==1 -> brand-new key (insert)
            (scaled % 10).cast("bigint").alias("grp"),
            (scaled * 7).cast("bigint").alias("v"),
        ]
        if evolve:
            # schema-drifted batch (r11): a brand-new optional column —
            # the merge evolves the table schema in the same commit
            cols.append((scaled * 1.0).alias("score"))
        cols += [
            F.when(k % 4 == 2, F.lit("d")).otherwise(F.lit("u")).alias("op"),
            (k % 2).cast("bigint").alias("seq"),
        ]
        return spark.range(n).select(*cols)

    legs = [
        ("warmup", 50_000, 1_000, False),
        ("1x", 400_000, 4_000, False),
        # same table+batch size, schema-drifted: evolution must cost
        # only the metadata update (delta vs 1x ~= 0, never O(table))
        ("1x-evolve", 400_000, 4_000, True),
        ("10x-tbl", 4_000_000, 4_000, False),
        ("10x-evolve", 4_000_000, 4_000, True),
        ("10x-batch", 400_000, 40_000, False),
    ]
    import sys as _sys

    if "--full" in _sys.argv:
        legs.append(("100x-tbl", 40_000_000, 4_000, False))
    print(
        f"{'cdc upsert':10s} {'tbl_rows':>9} {'batch':>7} "
        f"{'merge_s':>8} {'live_rows':>10} {'schemas':>8}"
    )
    for label, n_rows, n_batch, evolve in legs:
        tdir = _build(n_rows, label)
        batch = _batch(n_batch, n_rows, evolve)
        t0 = time.time()
        meta = ice.merge_upsert(
            spark, batch, tdir, on=["id"], op_col="op", seq_col="seq",
            partition_spec=spec, now_ms=2_000,
        )
        merge_s = time.time() - t0
        n_live = ice.read_iceberg_table(spark, tdir).count()
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {n_batch:7d} "
                f"{merge_s:8.2f} {n_live:10d} {len(meta['schemas']):8d}"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_update_where() -> None:
    """Scale curve of update_where (r11): an UPDATE matching a
    FIXED-SIZE id range on a SORTED, record-capped table must cost
    ~the same as the table grows — the predicate prunes to the
    overlapping sorted slices at the metadata level, the rewrite
    touches only the matched rows, and the position-delete plan's scan
    projects only the predicate + identity columns. Legs: same 4k-row
    id window updated inside 400k / 4M-row tables, plus a 10x-match
    leg (40k rows matched at 400k) to show the linear-in-matches
    axis."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    def _build(n_rows: int, label: str) -> str:
        tdir = tempfile.mkdtemp(prefix=f"upd-{label}-")
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") * 3).cast("bigint").alias("v")
        )
        ice.write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=spec,
            sort_by=["id"], max_records_per_file=max(4_096, n_rows // 64),
        )
        return tdir

    legs = [
        ("warmup", 50_000, 1_000),
        ("1x", 400_000, 4_000),
        ("10x-tbl", 4_000_000, 4_000),
        ("10x-match", 400_000, 40_000),
    ]
    import sys as _sys

    if "--full" in _sys.argv:
        # the 100x-shaped third point: same 4k-row match inside a
        # 40M-row table — flat means the prune, not the table, is
        # paying (r12, VERDICT task #8)
        legs.append(("100x-tbl", 40_000_000, 4_000))
    print(
        f"{'update':10s} {'tbl_rows':>9} {'matched':>8} "
        f"{'update_s':>9} {'n_upd':>7}"
    )
    for label, n_rows, n_match in legs:
        tdir = _build(n_rows, label)
        lo = n_rows // 2
        pred = f"id >= {lo} AND id < {lo + n_match}"
        t0 = time.time()
        meta = ice.update_where(
            spark, tdir, pred, {"v": "v + 1"}, now_ms=2_000
        )
        update_s = time.time() - t0
        n_upd = int(meta["snapshots"][-1]["summary"]["added-records"])
        assert n_upd == n_match, (n_upd, n_match)
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {n_match:8d} "
                f"{update_s:9.2f} {n_upd:7d}"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_replace_partitions() -> None:
    """Scale curve of replace_partitions (r11): overwriting ONE
    identity cell must cost ~that cell's rows + the batch, flat as the
    TABLE grows with the cell held constant (the membership predicate
    pushes to parquet on an identity source, so untouched cells' files
    prune at scan). Legs: 10-cell tables of 400k / 4M rows, one cell
    (~10%% of rows at 1x, ~1%% at 10x... cell size held at 40k rows by
    widening the cell count 10x with the table) overwritten by a
    4k-row batch."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("grp", "identity", None)]

    def _build(n_rows: int, n_cells: int, label: str) -> str:
        tdir = tempfile.mkdtemp(prefix=f"rp-{label}-")
        df = spark.range(n_rows).select(
            F.col("id"),
            (F.col("id") % n_cells).cast("bigint").alias("grp"),
            (F.col("id") * 3).cast("bigint").alias("v"),
        )
        ice.write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=spec
        )
        return tdir

    legs = [
        ("warmup", 50_000, 5),
        ("1x", 400_000, 10),      # cell = 40k rows
        ("10x-tbl", 4_000_000, 100),  # cell still = 40k rows
    ]
    import sys as _sys

    if "--full" in _sys.argv:
        # cell still 40k rows inside a 40M-row / 1000-cell table
        legs.append(("100x-tbl", 40_000_000, 1_000))
    print(
        f"{'replace':10s} {'tbl_rows':>9} {'cell_rows':>9} "
        f"{'replace_s':>10}"
    )
    for label, n_rows, n_cells in legs:
        tdir = _build(n_rows, n_cells, label)
        batch = spark.range(4_000).select(
            (F.col("id") + n_rows).alias("id"),
            F.lit(3).cast("bigint").alias("grp"),
            F.lit(0).cast("bigint").alias("v"),
        )
        t0 = time.time()
        meta = ice.replace_partitions(spark, batch, tdir, now_ms=2_000)
        replace_s = time.time() - t0
        n_del = int(
            meta["snapshots"][-1]["summary"]["added-position-deletes"]
        )
        assert n_del == n_rows // n_cells, (n_del, n_rows // n_cells)
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {n_rows // n_cells:9d} "
                f"{replace_s:10.2f}"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_rename_epochs() -> None:
    """Read-cost curve of the per-epoch rename resolution (r12): a
    full-table aggregate over 2M rows split across 1 / 4 / 8 naming
    epochs (a rename DDL between appends) must cost ~the same — the
    epoch machinery only adds one scan GROUP per live epoch (unioned),
    never a shuffle or extra file I/O, so read cost follows bytes, not
    rename history."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    N = 2_000_000
    N_APPENDS = 8  # held constant so file count never confounds the
    # comparison: every leg is 8 appends; only the RENAMES between
    # them vary (0 / 3 / 7 -> 1 / 4 / 8 naming epochs)
    print(f"{'rename-read':12s} {'epochs':>7} {'scan_s':>8} {'sum_ok':>7}")
    for label, n_epochs in (("warmup", 1), ("1-epoch", 1), ("4-epoch", 4),
                            ("8-epoch", 8)):
        tdir = tempfile.mkdtemp(prefix=f"ren-{label}-")
        per = N // N_APPENDS
        col = "v0"
        renames_at = {
            int((k + 1) * N_APPENDS / n_epochs) - 1
            for k in range(n_epochs - 1)
        }
        for e in range(N_APPENDS):
            df = spark.range(e * per, (e + 1) * per).select(
                F.col("id"), (F.col("id") * 3).cast("bigint").alias(col)
            )
            ice.write_iceberg_table(spark, df, tdir, now_ms=1_000 + e)
            if e in renames_at:
                new = f"v{e + 1}"
                ice.update_table_schema(
                    tdir, rename={col: new}, now_ms=2_000 + e
                )
                col = new
        t0 = _t.time()
        row = (
            ice.read_iceberg_table(spark, tdir)
            .agg(F.sum(col).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        scan_s = _t.time() - t0
        ok = int(row["n"] == N and row["s"] == 3 * (N * (N - 1) // 2))
        if label != "warmup":
            print(f"{label:12s} {n_epochs:7d} {scan_s:8.2f} {ok:7d}")
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_nested_rename_read() -> None:
    """Read-cost curve of NESTED rename resolution (r13): like
    --rename but the value column lives inside a struct and the DDLs
    rename the STRUCT FIELD (``env.v0 -> env.v1 -> …``), so pre-rename
    scan groups pay the per-epoch struct REBUILD projection
    (`manifests._realias_expr` — F.struct re-assembly with null
    preservation) instead of a flat alias. 2M rows, 8 appends, 1 / 4 /
    8 naming epochs: the rebuild is JVM-side projection work inside
    the same scan stage, so cost must stay ~flat in epoch count."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    N = 2_000_000
    N_APPENDS = 8  # constant file count; only renames vary
    print(f"{'nested-ren':12s} {'epochs':>7} {'scan_s':>8} {'sum_ok':>7}")
    for label, n_epochs in (("warmup", 1), ("1-epoch", 1), ("4-epoch", 4),
                            ("8-epoch", 8)):
        tdir = tempfile.mkdtemp(prefix=f"nren-{label}-")
        per = N // N_APPENDS
        col = "v0"
        renames_at = {
            int((k + 1) * N_APPENDS / n_epochs) - 1
            for k in range(n_epochs - 1)
        }
        for e in range(N_APPENDS):
            df = spark.range(e * per, (e + 1) * per).select(
                F.col("id"),
                F.struct(
                    (F.col("id") * 3).cast("bigint").alias(col),
                    (F.col("id") % 7).cast("bigint").alias("tag"),
                ).alias("env"),
            )
            ice.write_iceberg_table(spark, df, tdir, now_ms=1_000 + e)
            if e in renames_at:
                new = f"v{e + 1}"
                ice.update_table_schema(
                    tdir, rename={f"env.{col}": new}, now_ms=2_000 + e
                )
                col = new
        t0 = _t.time()
        row = (
            ice.read_iceberg_table(spark, tdir)
            .agg(
                F.sum(f"env.{col}").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        scan_s = _t.time() - t0
        ok = int(row["n"] == N and row["s"] == 3 * (N * (N - 1) // 2))
        if label != "warmup":
            print(f"{label:12s} {n_epochs:7d} {scan_s:8.2f} {ok:7d}")
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_mirror() -> None:
    """Scale curve of mirror_iceberg_table catch-up (round 10): after
    the initial sync, replicating ONE source merge batch must cost the
    SAME against a 10x-larger table — the stream window plans only the
    commit's files and the merge apply never reads the destination.
    Legs: initial sync (table-sized, the one full pass) then a 4k-row
    catch-up batch at 1x (400k rows) and 10x (4M rows) table sizes."""
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        mirror_iceberg_table,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    print(
        f"{'mirror':10s} {'tbl_rows':>9} {'sync_s':>7} "
        f"{'catchup_s':>10} {'dst_rows':>9}"
    )
    for label, n_rows in (("warmup", 50_000), ("1x", 400_000),
                          ("10x-tbl", 4_000_000)):
        root = tempfile.mkdtemp(prefix=f"mirror-{label}-")
        src, dst = _os.path.join(root, "src"), _os.path.join(root, "dst")
        ckpt = _os.path.join(root, "ckpt")
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") * 3).cast("bigint").alias("v")
        )
        ice.write_iceberg_table(
            spark, df, src, now_ms=1_000, partition_spec=spec
        )

        def run():
            q = mirror_iceberg_table(
                spark, src, dst, on=["id"], checkpoint_dir=ckpt,
                partition_spec=spec,
            )
            q.awaitTermination()

        t0 = time.time()
        run()
        sync_s = time.time() - t0
        batch = spark.range(4_000).select(
            (F.col("id") * (n_rows // 4_000)).alias("id"),
            (F.col("id") * 7).cast("bigint").alias("v"),
            F.lit("u").alias("op"),
        )
        ice.merge_upsert(
            spark, batch, src, on=["id"], op_col="op",
            partition_spec=spec, now_ms=2_000,
        )
        t0 = time.time()
        run()
        catchup_s = time.time() - t0
        n_dst = ice.read_iceberg_table(spark, dst).count()
        # r12 leg: catch-up ACROSS a row-level UPDATE window — the
        # stream resolves the update's position deletes to pre-image
        # keyed retractions (target-file key columns only); a fixed
        # 4k-row match must cost ~the same at 10x the table
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (  # noqa: E501
            update_where,
        )

        lo = n_rows // 2
        update_where(
            spark, src, f"id >= {lo} AND id < {lo + 4_000}",
            {"v": "v + 1"}, now_ms=3_000,
        )
        t0 = time.time()
        run()
        upd_catchup_s = time.time() - t0
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {sync_s:7.2f} "
                f"{catchup_s:10.2f} {n_dst:9d} upd_catchup={upd_catchup_s:.2f}"
            )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def probe_mirror_wide() -> None:
    """WIDE-match keyed-retraction probe (round 13): the --mirror
    UPDATE leg uses a fixed 4k-row match; this one matches 10% OF THE
    TABLE at 400k / 4M / 40M rows, so the per-target-file
    ``pf.read(columns=keys).take(positions)`` cost model of the
    pre-image resolution (`iceberg_stream._keyed_retraction_batches`)
    is measured wide, not just narrow. Expectation: catch-up cost
    ~linear in MATCHED rows (the retraction and re-insert volume), not
    super-linear — parallelism comes from one stream partition per
    position-delete file (one per partition cell under bucket[8])."""
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
        update_where,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        mirror_iceberg_table,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    print(
        f"{'mirrorwide':10s} {'tbl_rows':>9} {'matched':>8} "
        f"{'sync_s':>7} {'upd_s':>6} {'catchup_s':>10}"
    )
    for label, n_rows in (
        ("warmup", 50_000), ("400k", 400_000),
        ("4M", 4_000_000), ("40M", 40_000_000),
    ):
        root = tempfile.mkdtemp(prefix=f"mirrorw-{label}-")
        src, dst = _os.path.join(root, "src"), _os.path.join(root, "dst")
        ckpt = _os.path.join(root, "ckpt")
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") * 3).cast("bigint").alias("v")
        )
        ice.write_iceberg_table(
            spark, df, src, now_ms=1_000, partition_spec=spec
        )

        def run():
            q = mirror_iceberg_table(
                spark, src, dst, on=["id"], checkpoint_dir=ckpt,
                partition_spec=spec,
            )
            q.awaitTermination()

        t0 = time.time()
        run()
        sync_s = time.time() - t0
        matched = n_rows // 10
        t0 = time.time()
        update_where(
            spark, src, "id % 10 = 3", {"v": "v + 1"}, now_ms=2_000,
        )
        upd_s = time.time() - t0
        t0 = time.time()
        run()
        catchup_s = time.time() - t0
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {matched:8d} "
                f"{sync_s:7.2f} {upd_s:6.2f} {catchup_s:10.2f}"
            )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def probe_dv_retraction() -> None:
    """Scale curve of DV keyed retractions (r13): after a mirror
    sync, a `commit_deletion_vectors` DELETE matching 10% of the
    table is crossed by the catch-up — the window DV resolves via
    `dv_keyed_plan` (one footer parse driver-side) and the reader
    decodes the fresh bitmap + gathers pre-image keys executor-side
    (`_read_dv_keys`). Same cost model as --mirror-wide's
    position-delete path plus the bitmap decode; expectation:
    catch-up ~linear in DELETED rows, flat in table size beyond
    them."""
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        mirror_iceberg_table,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    print(
        f"{'dvretract':10s} {'tbl_rows':>9} {'deleted':>8} "
        f"{'sync_s':>7} {'dv_s':>6} {'catchup_s':>10}"
    )
    for label, n_rows in (
        ("warmup", 50_000), ("400k", 400_000),
        ("4M", 4_000_000), ("40M", 40_000_000),
    ):
        root = tempfile.mkdtemp(prefix=f"dvret-{label}-")
        src, dst = _os.path.join(root, "src"), _os.path.join(root, "dst")
        ckpt = _os.path.join(root, "ckpt")
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") * 3).cast("bigint").alias("v")
        )
        ice.write_iceberg_table(
            spark, df, src, now_ms=1_000, partition_spec=spec
        )

        def run():
            q = mirror_iceberg_table(
                spark, src, dst, on=["id"], checkpoint_dir=ckpt,
                partition_spec=spec,
            )
            q.awaitTermination()

        t0 = time.time()
        run()
        sync_s = time.time() - t0
        t0 = time.time()
        commit_deletion_vectors(spark, src, "id % 10 = 3", now_ms=2_000)
        dv_s = time.time() - t0
        t0 = time.time()
        run()
        catchup_s = time.time() - t0
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} {n_rows // 10:8d} "
                f"{sync_s:7.2f} {dv_s:6.2f} {catchup_s:10.2f}"
            )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def probe_eqconv() -> None:
    """Scale curve of convert_equality_deletes (round 10): the pass is
    ONE distributed key+identity scan of the data plus tiny delete
    writes — cost must be ~linear in TABLE rows (it reads them) and
    ~flat in the NUMBER of eq-delete files (key sets broadcast;
    10x more files of the same total keys add only metadata). Legs:

      1x       400k rows, 8 merge batches (8 eq files, ~3.2k keys)
      10x-tbl    4M rows, 8 merge batches (same-shape eq plane)
      10x-eq   400k rows, 80 merge batches (10x eq files, same total keys)
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.session import get_spark
    from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spec = [("id_bucket", "bucket[8]", "id")]

    def _build(n_rows: int, n_batches: int, label: str) -> str:
        tdir = tempfile.mkdtemp(prefix=f"eqconv-{label}-")
        df = spark.range(n_rows).select(
            F.col("id"),
            (F.col("id") * 3).cast("bigint").alias("v"),
        )
        ice.write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=spec
        )
        # ~3200 deleted keys total, spread over n_batches merges
        per = 3_200 // n_batches
        for b in range(n_batches):
            keys = spark.range(per).select(
                (F.col("id") * n_batches + b).alias("id"),
                F.lit(None).cast("bigint").alias("v"),
                F.lit("d").alias("op"),
                F.lit(1).cast("bigint").alias("seq"),
            )
            ice.merge_upsert(
                spark, keys, tdir, on=["id"], op_col="op", seq_col="seq",
                partition_spec=spec, now_ms=(b + 2) * 1_000,
            )
        return tdir

    legs = [
        ("warmup", 50_000, 2),
        ("1x", 400_000, 8),
        ("10x-tbl", 4_000_000, 8),
        ("10x-eq", 400_000, 80),
    ]
    print(
        f"{'eqconv':10s} {'tbl_rows':>9} {'eq_files':>9} "
        f"{'convert_s':>10} {'pos_rows':>9}"
    )
    for label, n_rows, n_batches in legs:
        tdir = _build(n_rows, n_batches, label)
        t0 = time.time()
        meta = ice.convert_equality_deletes(spark, tdir, now_ms=10**9)
        conv_s = time.time() - t0
        summ = meta["snapshots"][-1]["summary"]
        if label != "warmup":
            print(
                f"{label:10s} {n_rows:9d} "
                f"{int(summ['converted-equality-delete-files']):9d} "
                f"{conv_s:10.2f} "
                f"{int(summ['total-position-deletes']):9d}"
            )
        shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


def probe_bounds_pruning() -> None:
    """Column-stats pruning flatness: commit N sorted offset bands, then
    plan a FIXED offset window with plan_scan(column_bounds=...) at N
    and 10N bands. Files planned (and bytes behind them) must be flat —
    the metadata analog of the tiered fixed-window byte probe. Pure
    metadata: 1-row files. Run: python bench_scaling.py --bounds-pruning
    """
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_scan,
    )

    schema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def build(n_bands: int) -> str:
        tdir = tempfile.mkdtemp(prefix=f"iceberg-bounds-{n_bands}-")
        os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
        for b in range(n_bands):
            path = os.path.join(tdir, "partition=0", f"band{b:05d}.parquet")
            pq.write_table(
                pa.table(
                    {
                        "partition": pa.array([0, 0], pa.int32()),
                        "offset": pa.array(
                            [b * 100, b * 100 + 99], pa.int64()
                        ),
                    }
                ),
                path,
            )
            commit_append(tdir, schema, now_ms=b + 1, files=[path])
        return tdir

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        rewrite_manifests,
    )

    for n in (40, 400):
        tdir = build(n)
        t0 = time.perf_counter()
        planned = plan_scan(tdir, column_bounds=("offset", 500, 799))
        ms = (time.perf_counter() - t0) * 1000
        total = len(plan_scan(tdir))
        rewrite_manifests(tdir, now_ms=n + 10)
        t0 = time.perf_counter()
        planned2 = plan_scan(tdir, column_bounds=("offset", 500, 799))
        ms2 = (time.perf_counter() - t0) * 1000
        assert {f["file_path"] for f in planned2} == {
            f["file_path"] for f in planned
        }
        print(
            f"bands={n:4d}  files_total={total:4d}  "
            f"files_planned={len(planned)}  plan_ms={ms:7.1f}  "
            f"plan_ms_compacted={ms2:6.1f}"
        )


def probe_incremental_window() -> None:
    """Delta-tracking cost: a FIXED 3-band incremental window planned
    against tables with 40 vs 400 total bands — files planned and rows
    read must track the DELTA, not the table; the manifest walk is
    bounded by the seq-window manifest pruning (pre-compaction it still
    opens O(manifests) lists, so both raw and compacted shapes are
    shown). Run: python bench_scaling.py --incremental-window
    """
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        plan_incremental_scan,
        read_table_metadata,
        rewrite_manifests,
    )

    schema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def build(n_bands: int) -> str:
        tdir = tempfile.mkdtemp(prefix=f"iceberg-inc-{n_bands}-")
        os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
        for b in range(n_bands):
            path = os.path.join(tdir, "partition=0", f"band{b:05d}.parquet")
            pq.write_table(
                pa.table(
                    {
                        "partition": pa.array([0, 0], pa.int32()),
                        "offset": pa.array([b * 100, b * 100 + 99], pa.int64()),
                    }
                ),
                path,
            )
            commit_append(tdir, schema, now_ms=b + 1, files=[path])
        return tdir

    for n in (40, 400):
        tdir = build(n)
        snaps = read_table_metadata(tdir)["metadata"]["snapshots"]
        frm, to = snaps[4]["snapshot-id"], snaps[7]["snapshot-id"]
        t0 = time.perf_counter()
        files = plan_incremental_scan(tdir, frm, to)
        ms = (time.perf_counter() - t0) * 1000
        rewrite_manifests(tdir, now_ms=n + 10)
        t0 = time.perf_counter()
        files2 = plan_incremental_scan(tdir, frm, to)
        ms2 = (time.perf_counter() - t0) * 1000
        assert {f["file_path"] for f in files2} == {f["file_path"] for f in files}
        print(
            f"bands={n:4d}  window_files={len(files)}  "
            f"plan_ms={ms:7.1f}  plan_ms_compacted={ms2:6.1f}"
        )


if __name__ == "__main__":
    import sys

    if "--iceberg-commits" in sys.argv:
        probe_iceberg_commit_cost()
    elif "--metadata-100x" in sys.argv:
        probe_metadata_100x()
    elif "--zorder" in sys.argv:
        probe_zorder_pruning()
    elif "--rest-contention" in sys.argv:
        probe_rest_contention()
    elif "--transform-pruning" in sys.argv:
        probe_transform_pruning()
    elif "--bounds-pruning" in sys.argv:
        probe_bounds_pruning()
    elif "--incremental-window" in sys.argv:
        probe_incremental_window()
    elif "--rpd-merge" in sys.argv:
        probe_rpd_merge()
    elif "--cdc-upsert" in sys.argv:
        probe_cdc_upsert()
    elif "--eqconv" in sys.argv:
        probe_eqconv()
    elif "--mirror-wide" in sys.argv:
        probe_mirror_wide()
    elif "--dv-retraction" in sys.argv:
        probe_dv_retraction()
    elif "--mirror" in sys.argv:
        probe_mirror()
    elif "--update-where" in sys.argv:
        probe_update_where()
    elif "--nested-rename" in sys.argv:
        probe_nested_rename_read()
    elif "--rename" in sys.argv:
        probe_rename_epochs()
    elif "--replace" in sys.argv:
        probe_replace_partitions()
    elif "--position-deletes" in sys.argv:
        probe_position_deletes()
    else:
        main()
