from modular_etl_data_platform_spark.operators.dedup import dedupe_latest
from modular_etl_data_platform_spark.operators.delta_export import (
    export_delta_snapshot,
)
from modular_etl_data_platform_spark.operators.transforms import (
    apply_transformations,
)
from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog,
    ConcurrentWriteError,
    ConstraintViolationError,
    FileSystemLogStore,
    InMemoryLogStore,
    LogStore,
    VersionedTable,
    convert_to_versioned,
    is_versioned_table,
)

__all__ = [
    "apply_transformations",
    "dedupe_latest",
    "export_delta_snapshot",
    "CommitLog",
    "ConcurrentWriteError",
    "ConstraintViolationError",
    "FileSystemLogStore",
    "InMemoryLogStore",
    "LogStore",
    "VersionedTable",
    "convert_to_versioned",
    "is_versioned_table",
]
