"""Device-mesh helpers for the distributed engine (SURVEY.md §2.4).

The reference has no scale-out at all (ROS DDS pub/sub only,
`/root/reference/package.xml:11-24`); the TPU build introduces SLAM-specific
data parallelism: landmark-sharded bundle adjustment and pose-graph blocks
over ICI collectives. These helpers build the `jax.sharding.Mesh` used by
parallel/sharded_ba.py and the multi-chip dry-run entry point.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


LM_AXIS = "lm"  # landmark-sharding axis (BA Schur reduction rides psum here)
KF_AXIS = "kf"  # keyframe-sharding axis (pose-graph / map-block ops)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (LM_AXIS,),
    devices=None,
) -> Mesh:
    """1-D (default) or n-D mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # split n into a near-square factorization for 2-D meshes
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (a, n // a)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def pad_to_multiple(x, axis: int, multiple: int, fill=0):
    """Pad `axis` of array x up to a multiple (sharding needs even splits)."""
    import jax.numpy as jnp

    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=fill)
