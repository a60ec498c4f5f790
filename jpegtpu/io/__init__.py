from jpegtpu.io import ppm  # noqa: F401
