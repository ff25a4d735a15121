"""Store configuration — schema-by-configuration, mirroring ``dbase.Options``.

Reference: `dbase/dbase.go:30-53` (DatabaseName, DataPath, IndexDepth,
PayloadSize, BucketDuration, Resolution, SegmentSize, MaxROBuckets) with the
invariant ``BucketDuration % Resolution == 0`` (`dbase/dbase.go:71-73`).

``segment_size`` has no Spark meaning (parquet row-groups / file splits are
built-in, `dblock/dblock.go:249-297` → SURVEY.md §4); it is accepted and
ignored so reference configs round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class StoreConfig:
    database_name: str
    data_path: str
    index_depth: int
    payload_size: int
    bucket_duration: int  # ns, width of one time bucket (partition)
    resolution: int  # ns, slot width; ts is floored to this on ingest
    max_hot_buckets: int = 2  # `dbase/dbase.go:17-20` (maxHotBuckets)
    max_cold_buckets: int = 4  # cache-size only in the reference; unused here
    segment_size: int = 0  # storage-internal in the reference; unused here
    tag_cols: tuple[str, ...] = field(init=False)

    def __post_init__(self) -> None:
        if self.index_depth <= 0:
            raise ValueError("index_depth must be positive")
        if self.payload_size <= 0:
            raise ValueError("payload_size must be positive")
        if self.resolution <= 0 or self.bucket_duration <= 0:
            raise ValueError("resolution and bucket_duration must be positive")
        # invariant from `dbase/dbase.go:71-73`
        if self.bucket_duration % self.resolution != 0:
            raise ValueError("bucket_duration must be a multiple of resolution")
        object.__setattr__(
            self, "tag_cols", tuple(f"tag{i + 1}" for i in range(self.index_depth))
        )

    @property
    def slots_per_bucket(self) -> int:
        # `dbucket/dbucket.go:90-91`: pldCount = BucketDuration / Resolution
        return self.bucket_duration // self.resolution

    @property
    def zero_payload(self) -> bytes:
        # the gap-fill sentinel: missing slots are zero bytes, not null
        # (`dbase/dbase.go:75-81`)
        return bytes(self.payload_size)

    def floor_to_resolution(self, ts: int) -> int:
        # `dbase/dbase.go:127`
        return ts - ts % self.resolution

    def floor_to_bucket(self, ts: int) -> int:
        # `dbase/dbase.go:148-151`
        return ts - ts % self.bucket_duration

    def hot_min_base(self, now: int) -> int:
        """Base ts of the oldest hot bucket at virtual ``now``.

        A bucket is hot iff ``base > now_base - bucket_duration*max_hot_buckets``
        (`dbase/dbase.go:403-424`).
        """
        return self.floor_to_bucket(now) - self.bucket_duration * (self.max_hot_buckets - 1)
