"""Error taxonomy mirroring the reference's sentinel errors.

Reference errors (all in Go):
- ``ErrFuture``      — write/read beyond virtual now   (`dbase/dbase.go:129-132`)
- ``ErrInvValues``   — wrong tag arity / empty tag      (`dbase/dbase.go:134-142`)
- ``ErrInvPayload``  — wrong payload size               (`dbase/dbase.go:144-146`)
- ``ErrInvTime``     — bad range (end < start, future)  (`dbase/dbase.go:166-170`)
- ``ErrReadOnly``    — write to a cold (read-only) bucket (`dbucket/dbucket.go:120-122`)
- ``ErrCantRmHot``   — retention touching hot buckets   (`dbase/dbase.go:326-330`)
"""


class KdbSparkError(Exception):
    """Base class for engine errors."""


class ValidationError(KdbSparkError):
    """Invalid input row(s): tag arity, empty tag, payload size.

    Reference: `dbase/dbase.go:134-146`.
    """


class FutureTimestampError(ValidationError):
    """Timestamp beyond the virtual ``now``. Reference: `dbase/dbase.go:129-132`."""


class ColdWriteError(KdbSparkError):
    """Write routed to a read-only (cold) bucket.

    Reference: `dbucket/dbucket.go:120-122`; hot/cold routing
    `dbase/dbase.go:403-424`.
    """


class RangeError(KdbSparkError):
    """Invalid query range. Reference: `dbase/dbase.go:166-170`, `:238-241`."""


class HotBucketRemoveError(KdbSparkError):
    """Retention cutoff would delete a hot bucket.

    Reference: `dbase/dbase.go:326-330`.
    """


class ConcurrentWriteError(KdbSparkError):
    """Optimistic-concurrency conflict on a versioned table: the commit
    was planned against a snapshot that another writer superseded before
    the claim. The merge must be re-planned against the new snapshot —
    committing the stale plan would silently drop the concurrent commit
    (lost update). Same contract as Delta's ConcurrentAppendException.
    """


class CorruptManifestError(KdbSparkError):
    """A versioned-table manifest is torn or garbled: truncated/invalid
    JSON, wrong shape, or a version field that disagrees with its file
    name. The read fails LOUDLY instead of silently serving a partial
    file set — the engine analog of the reference's corrupt-index-load
    detection (`mindex/mindex.go:198-210`: a truncated/overrun index
    element errors the load; only the pre-allocated zero tail is
    tolerated). Intact versions of the same table remain readable by
    explicit version pin — corruption is per-manifest, never
    table-poisoning.
    """
