from jpegtpu.container import jfif  # noqa: F401
