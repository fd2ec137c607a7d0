"""BPE trainer: independent pure-Python replay of the full training
loop (pair counting, argmax with tie-break, fixed-pass merge
application) must reproduce the distributed trainer's merge table."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from tiered_storage_for_apache_kafka_spark.operators.bpe import (
    BPE_MERGES,
    END_OF_WORD,
    MERGE_PASSES,
)

SF = "/root/testdata/sf0.001"


def _python_bpe(words: Counter) -> list[tuple[int, str, str, int]]:
    vocab = {
        " ".join(list(w)) + f" {END_OF_WORD}": f for w, f in words.items()
    }
    out = []
    for rank in range(1, BPE_MERGES + 1):
        pairs: Counter = Counter()
        for seq, f in vocab.items():
            syms = seq.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a} {b}"] += f
        if not pairs:
            break
        # max count, lexicographically smallest pair on ties
        pair = min(pairs, key=lambda p: (-pairs[p], p))
        merged = pair.replace(" ", "")
        out.append((rank, pair, merged, pairs[pair]))
        new_vocab: dict[str, int] = {}
        for seq, f in vocab.items():
            s = f" {seq} "
            for _ in range(MERGE_PASSES):
                s = s.replace(f" {pair} ", f" {merged} ")
            new_vocab[s.strip()] = new_vocab.get(s.strip(), 0) + f
        vocab = new_vocab
    return out


def test_trainer_matches_independent_python_reference(spark):
    from tiered_storage_for_apache_kafka_spark.operators import QUERIES

    got = [
        (r.merge_rank, r.pair, r.merged, r.cnt)
        for r in QUERIES["bpe_train_merges"](spark, SF)
        .orderBy("merge_rank")
        .collect()
    ]

    con = duckdb.connect()
    text = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    words: Counter = Counter()
    for (t,) in text:
        for w in re.split(r"\s+", t.strip()):
            if w:
                words[w] += 1
    expected = _python_bpe(words)

    assert got == expected
    assert len(got) == BPE_MERGES
    # the learner actually learns: every selected pair had real support
    # (counts need not be monotone — a merge can create a new hot pair)
    assert all(c > 0 for _r, _p, _m, c in got)
    # merged symbols compose over rounds (some merge builds on another)
    merged_syms = [m for _r, _p, m, _c in got]
    assert any(len(m) > 2 for m in merged_syms)
