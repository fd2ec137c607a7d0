#!/usr/bin/env python
"""Sharded test runner: the full pytest suite across N concurrent
pytest subprocesses (default 4), each with its own SparkSession.

Why: the suite's wall clock is dominated by a handful of serial,
Spark-bound modules (the 171-query DuckDB gate precompute, the
bare-session driver-compat gate, the 100-batch maintenance soak, the
streaming/datasource suites). pytest-xdist is not available in this
container, and in-process thread pools are already used inside the two
gate modules — file-level process sharding is the remaining
parallelism. local[32] has the cores for 4 x local[8] JVMs; testdata
and tmp fixtures are per-process, so shards share nothing.

Files are greedy-bin-packed by the duration table below (measured
2026-08-15, single-process run); unknown files go to the lightest bin.

Usage: python scripts/run_tests_sharded.py [N_SHARDS]
Exit code: 0 iff every shard passed. Per-shard tails print on failure.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

# seconds per test file, measured single-process (same host);
# only the ordering/ratios matter for packing
DURATIONS = {
    # r10 re-estimates: the soak gauntlets grew (merge + conversion
    # composed in) and the merge/eqconv/cdc-stream/mirror files are new
    "test_iceberg_soak.py": 290,  # r13 final: measured-shard re-estimate
    "test_iceberg_merge.py": 220,
    "test_cdc_soak.py": 160,  # r13: + nested-rename and DV rounds
    "test_queries_vs_duckdb.py": 235,  # r13 final: 206 queries, measured
    "test_iceberg_multifield.py": 150,
    "test_driver_session_parity.py": 200,
    "test_iceberg_eqconv.py": 105,
    # r11: slimmed to the 1 non-oracled query (value-level replay of the
    # oracled ones moved to test_driver_session_parity.py)
    "test_bare_session.py": 30,
    "test_iceberg_mirror.py": 330,  # r13: + lineage/adoption/drop-crossing + lost-ckpt legs
    "test_iceberg_cdc_stream.py": 180,  # r13: + DV keyed-retraction legs
    "test_datasource.py": 65,
    "test_iceberg.py": 60,
    "test_deletion_vectors.py": 70,
    "test_plans.py": 45,
    "test_streaming.py": 35,
    "test_iceberg_transforms.py": 30,
    "test_iceberg_schema_ddl.py": 60,
    "test_iceberg_update.py": 65,
    "test_iceberg_rename.py": 130,  # r12 (incl. stream-epoch leg)
    "test_iceberg_nested_rename.py": 110,  # r13 (incl. container/stream/mirror legs)
    "test_iceberg_ref_retention.py": 25,  # new r12
    "test_iceberg_rollback.py": 25,
    "test_iceberg_cherrypick.py": 35,  # new r12
    "test_iceberg_replace.py": 30,
    "test_mutation_fuzz.py": 360,  # r13: programs 1-3 (races split out)
    "test_mutation_fuzz_races.py": 115,  # r13: catalog-race program + directed races
    "test_curation.py": 25,
    "test_rest_catalog.py": 25,
    "test_iceberg_meta_tables.py": 25,
    "test_asof.py": 18,
    "test_filtering.py": 15,
    "test_multimodal.py": 15,
    "test_bpe.py": 12,
    "test_text_extra.py": 12,
    "test_table_mode.py": 10,
    "test_label_propagation.py": 10,
    "test_avro.py": 10,
    "test_selector.py": 8,
    "test_metrics.py": 8,
    "test_api_matrix.py": 8,
}
DEFAULT_COST = 6


def main() -> int:
    # default raised 4 -> 5 (r10), 5 -> 6 (r11): each round's new
    # plane grows the suite past the previous packing (r11 added the
    # mutation planes + parity gate + fuzz gauntlet, ~80 tests; 5
    # shards measured 500.6 s wall with a 499.8 s straggler). 6 x
    # local[8] on 32 cores measured 423.0 s wall / max shard 422.2 s,
    # all green — mild oversubscription, no flakes, back inside the
    # ratified 480 s budget
    # default raised 6 -> 7 (r12): the rename matrix, DDL fuzz, and
    # mirror/stream legs grew the suite past the 6-shard packing
    # (598.2 s wall); 7 x local[8] on 32 cores measured 531.9 s with
    # stale weights, re-packed after re-weighting the heavy gates
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(root, "tests", "test_*.py"))
    )
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n_shards)]
    for f in sorted(files, key=lambda f: -DURATIONS.get(f, DEFAULT_COST)):
        cost, members = min(bins, key=lambda b: b[0])
        i = bins.index((cost, members))
        bins[i] = (cost + DURATIONS.get(f, DEFAULT_COST), members + [f])

    t0 = time.time()
    procs = []
    for i, (cost, members) in enumerate(bins):
        if not members:
            continue  # bare pytest would re-run the WHOLE suite
        args = [
            sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
            *(os.path.join("tests", m) for m in members),
        ]
        procs.append(
            (
                i,
                members,
                subprocess.Popen(
                    args,
                    cwd=root,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )
    failed = False
    for i, members, p in procs:
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-1] if out.strip() else "(no output)"
        print(f"shard {i}: {tail}")
        if p.returncode != 0:
            failed = True
            print(f"--- shard {i} failure tail ({', '.join(members)}) ---")
            print("\n".join(out.strip().splitlines()[-40:]))
    print(f"total wall: {time.time() - t0:.1f}s across {n_shards} shards")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
