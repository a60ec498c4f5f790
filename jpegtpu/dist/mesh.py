"""Device-mesh helpers.

The reference is single-process single-device (SURVEY §2.14: no DP/TP/PP/...,
no comm backend of any kind). The TPU-native scaling story replaces that
absence: a 2D mesh ('data' = image batch, 'row' = MCU rows within an image),
`shard_map` over it, and XLA collectives over ICI for segment-length prefix
sums and bitstream gathers. Multi-host initialization uses
jax.distributed.initialize + the same mesh spanning all processes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
ROW_AXIS = "row"


def make_mesh(n_data: Optional[int] = None, n_row: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """2D ('data', 'row') mesh over the given (default: all) devices.

    With only one factor given, the other takes the remaining devices. With
    neither, prefer rows (intra-image parallelism) up to 8, batch beyond.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_row is None:
        n_row = min(n, 8)
        n_data = n // n_row
    elif n_data is None:
        n_data = n // n_row
    elif n_row is None:
        n_row = n // n_data
    if n_data * n_row != n:
        raise ValueError(f"mesh {n_data}x{n_row} != {n} devices")
    arr = np.array(devices).reshape(n_data, n_row)
    return Mesh(arr, (DATA_AXIS, ROW_AXIS))


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host pods (DCN control plane; data
    plane stays on ICI within a slice). No external comm library — XLA
    collectives are the backend (SURVEY §5 'Distributed communication')."""
    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
