from jpegtpu.kernels import fused_dctq  # noqa: F401
