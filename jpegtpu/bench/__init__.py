from jpegtpu.bench import telemetry  # noqa: F401
