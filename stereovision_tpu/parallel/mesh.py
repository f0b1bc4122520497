"""Device-mesh utilities: the communication backend of the framework.

The reference has no distributed layer (SURVEY.md §2.11); scaling here is new
TPU-native design: XLA collectives over ICI/DCN through ``jax.sharding.Mesh`` +
``shard_map``/``pjit``. Axes:

- ``frame`` — data parallelism over frames / calibration images (the batched
  loops of camera_calibration.py:58-85 and fused_depth_map.py:2591 scale here)
- ``tile``  — spatial parallelism inside one disparity solve (rows of the cost
  volume; halo exchange handled by the disparity wrapper)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(frame: int | None = None, tile: int = 1, devices=None) -> Mesh:
    """Build a (frame, tile) mesh. Defaults to all devices on the frame axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if frame is None:
        frame = n // tile
    assert frame * tile == n, f"{frame}×{tile} != {n} devices"
    arr = np.asarray(devices).reshape(frame, tile)
    return Mesh(arr, ("frame", "tile"))


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bootstrap: call once per host before building meshes.

    On cloud TPU pods with default env configuration,
    ``jax.distributed.initialize()`` auto-discovers everything; pass explicit
    values for manual clusters. After this, ``jax.devices()`` spans all hosts
    and `make_mesh()` builds pod-wide meshes whose collectives ride ICI within
    a slice and DCN across slices.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
