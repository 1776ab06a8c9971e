from .ingest import (  # noqa: F401
    parse_wire_batch,
    read_samples_table,
    start_ingest,
    synthetic_rate_source,
    write_samples_batch,
)
from .stateful import streaming_sessionize  # noqa: F401
