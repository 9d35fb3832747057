"""xdlake_spark: a PySpark-native Delta Lake table engine + LLM-data-pipeline
operators.

Re-expresses the capabilities of the reference implementation
(xbrianh/xdlake — a pure-Python/PyArrow Delta Lake library) on Spark:
driver-side transaction log + DataFrame scan/write/delete execution,
plus dedup / similarity-search / text-analysis / multimodal operators
designed for 100 TB-scale pipelines.
"""

from .log import DeltaLog, SchemaMode, WriteMode
from .sources.storage import Location, register_filesystem
from .table import CommitConflictError, DeltaTable


def register_data_source(spark) -> None:
    """Register the ``xdlake`` batch + streaming format on a session."""
    from .sources.datasource import register
    register(spark)


__all__ = ["DeltaTable", "DeltaLog", "WriteMode", "SchemaMode",
           "Location", "register_filesystem", "register_data_source",
           "CommitConflictError"]
__version__ = "0.1.0"
