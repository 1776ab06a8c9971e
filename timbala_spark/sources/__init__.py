from .events import events_to_samples, load_table  # noqa: F401
from .remote_write import remote_write_batch_to_samples  # noqa: F401
