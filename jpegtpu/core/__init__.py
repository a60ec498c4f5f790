from jpegtpu.core import tables, ops  # noqa: F401
