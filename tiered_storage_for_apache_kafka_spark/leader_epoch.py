"""Kafka leader-epoch checkpoint codec + epoch lookup.

The reference tiers the LEADER_EPOCH aux index as an opaque blob
(`SegmentIndexesV1Builder.java:27-64`; served back through
`fetchIndex(..., LEADER_EPOCH)` `KafkaRemoteStorageManager.java:486-530`)
— brokers use it to rebuild the leader-epoch cache when reconstructing
state from tiered segments (KIP-405 follower fetch / unclean-recovery
reconciliation). This module implements the blob's *content*: the
public Apache Kafka `CheckpointFile` text format as written by
`LeaderEpochCheckpointFile` (storage module), and the lookup semantics
of `LeaderEpochFileCache.epochForOffset`.

On-disk format (CheckpointFile.java, version 0):

    0                 <- file-format version
    <n>               <- entry count
    <epoch> <offset>  <- one "epoch startOffset" line per entry,
    ...                  ascending in both fields

An entry means: partition leadership moved to `epoch` at `offset`
(inclusive); the epoch of any offset is the last entry at or below it.
"""

from __future__ import annotations

from dataclasses import dataclass

CHECKPOINT_VERSION = 0


@dataclass(frozen=True)
class EpochEntry:
    """One leader-epoch transition (EpochEntry.java fields)."""

    epoch: int
    start_offset: int


def encode_leader_epoch_checkpoint(entries: list[EpochEntry]) -> bytes:
    """Serialize in Kafka's CheckpointFile text layout (version line,
    count line, one entry per line)."""
    lines = [str(CHECKPOINT_VERSION), str(len(entries))]
    lines += [f"{e.epoch} {e.start_offset}" for e in entries]
    return ("\n".join(lines) + "\n").encode("utf-8")


def decode_leader_epoch_checkpoint(buf: bytes) -> list[EpochEntry]:
    """Parse a checkpoint blob; rejects unknown versions, malformed
    lines, and count mismatches (a truncated upload must not silently
    shorten the epoch chain a broker rebuilds from)."""
    text = buf.decode("utf-8")
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) < 2:
        raise ValueError("checkpoint too short")
    version = int(lines[0])
    if version != CHECKPOINT_VERSION:
        raise ValueError(f"unknown checkpoint version {version}")
    n = int(lines[1])
    entry_lines = lines[2:]
    if len(entry_lines) != n:
        raise ValueError(
            f"checkpoint declares {n} entries but carries {len(entry_lines)}"
        )
    entries = []
    for ln in entry_lines:
        parts = ln.split()
        if len(parts) != 2:
            raise ValueError(f"malformed checkpoint line: {ln!r}")
        entries.append(EpochEntry(int(parts[0]), int(parts[1])))
    return entries


def epoch_for_offset(entries: list[EpochEntry], offset: int) -> int | None:
    """The leader epoch in force at `offset`: the last entry whose
    start_offset <= offset (`LeaderEpochFileCache.epochForOffset`
    semantics). None when the offset predates every entry."""
    best: int | None = None
    for e in entries:  # entries ascend; a scan is fine at checkpoint sizes
        if e.start_offset <= offset:
            best = e.epoch
        else:
            break
    return best
