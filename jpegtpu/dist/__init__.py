from jpegtpu.dist import mesh, shard  # noqa: F401
