"""timbala_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mattbostock/timbala (PromQL over labeled
time series), plus large-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Everything compiles to declarative DataFrame plans: Catalyst does the
optimizing, Tungsten the execution; there are no custom Catalyst rules
(SURVEY.md §4.2).
"""

from .compiler import PromQLBadQueryError, PromQLEvalError  # noqa: F401
from .engine import Engine, MAX_POINTS_PER_SERIES  # noqa: F401
from .model import (  # noqa: F401
    DEFAULT_LOOKBACK_MS,
    SAMPLES_SCHEMA,
    dedup_replicas,
    prepare_samples,
)
from .rollup import build_rollup  # noqa: F401

__version__ = "0.1.0"
