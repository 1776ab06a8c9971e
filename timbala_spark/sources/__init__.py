from .events import events_to_samples, load_table  # noqa: F401
from .remote_write import remote_write_batch_to_samples  # noqa: F401
from .wire import (  # noqa: F401
    decode_payloads,
    decode_write_request,
    encode_write_request,
)
