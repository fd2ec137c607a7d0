"""Object-key scheme.

Parity: ``core/.../ObjectKeyFactory.java:43-53,81-144``:
``$(prefix)$(topic)-$(topicId)/$(partition)/$(zero-padded-20 startOffset)-$(uuid).$(suffix)``
with suffixes ``log`` / ``indexes`` / ``rsm-manifest``. The 20-digit
zero-padding makes lexicographic object listing equal numeric offset
order — which is also what makes S3 listing and Spark's file ordering
agree with Kafka offset order for free.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class Suffix(str, enum.Enum):
    LOG = "log"
    INDEXES = "indexes"
    MANIFEST = "rsm-manifest"


@dataclass(frozen=True)
class ObjectKey:
    prefix: str
    topic: str
    topic_id: str
    partition: int
    start_offset: int
    segment_uuid: str
    suffix: Suffix

    @property
    def value(self) -> str:
        return (
            f"{self.prefix}{self.topic}-{self.topic_id}/{self.partition}/"
            f"{self.start_offset:020d}-{self.segment_uuid}.{self.suffix.value}"
        )


class ObjectKeyFactory:
    def __init__(self, prefix: str = "", mask_prefix: bool = False):
        # mask_prefix: render keys with the prefix hidden in logs /
        # error messages (reference ObjectKeyFactory.java maskPrefix —
        # the wire always carries the real prefix; only DISPLAY forms
        # are masked)
        self.prefix = prefix
        self.mask_prefix = mask_prefix

    def display(self, key: str) -> str:
        """Key as it should appear in logs/errors: prefix masked when
        configured."""
        if self.mask_prefix and self.prefix and key.startswith(self.prefix):
            return "..." + key[len(self.prefix):]
        return key

    def key(
        self,
        topic: str,
        topic_id: str,
        partition: int,
        start_offset: int,
        segment_uuid: str,
        suffix: Suffix,
    ) -> str:
        if start_offset < 0:
            raise ValueError("start_offset must be >= 0")
        return ObjectKey(
            self.prefix, topic, topic_id, partition, start_offset, segment_uuid, suffix
        ).value

    def all_keys(
        self, topic: str, topic_id: str, partition: int, start_offset: int, segment_uuid: str
    ) -> dict[Suffix, str]:
        return {
            s: self.key(topic, topic_id, partition, start_offset, segment_uuid, s)
            for s in Suffix
        }
