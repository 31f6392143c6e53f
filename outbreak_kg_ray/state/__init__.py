from .checkpoint import Checkpointer, doc_range_partitions  # noqa: F401
