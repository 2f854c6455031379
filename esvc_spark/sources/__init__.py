from .io import read_source, write_sink

__all__ = ["read_source", "write_sink"]
