from .sequences import read_raw_sequences, RAW_SCHEMA
from .sinks import MultiSinkWriter, read_sink

__all__ = ["read_raw_sequences", "RAW_SCHEMA", "MultiSinkWriter", "read_sink"]
