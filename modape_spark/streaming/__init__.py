from .incremental_batch import run_incremental_batch  # noqa: F401
