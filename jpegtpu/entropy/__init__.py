from jpegtpu.entropy import huffman_tables, scan, assemble  # noqa: F401
