from .ingest import (  # noqa: F401
    parse_wire_batch,
    read_fanout,
    read_samples_table,
    start_ingest,
    store_is_dirty,
    synthetic_rate_source,
    write_samples_batch,
)
from .compact import (  # noqa: F401
    RetentionRequiresCompactionError,
    apply_retention,
    compact_store,
)
from .store import (  # noqa: F401
    ConcurrentCommitError,
    MaintenanceLockHeldError,
    gc_store,
    maintenance_lock,
    read_min_t,
    resolve_store,
)
from .downsample import streaming_downsample  # noqa: F401
from .stateful import streaming_sessionize  # noqa: F401
