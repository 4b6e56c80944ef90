"""Device-mesh helpers for multi-chip sharded execution.

The reference is strictly single-GPU (SURVEY.md §5: no NCCL/MPI anywhere;
``torch.cuda.set_device`` is the whole story).  The TPU-native framework
does better: GEMMs and the models built on them scale over a
``jax.sharding.Mesh`` with XLA collectives riding ICI.  These helpers pick a
near-square (dp, tp) factorization of the available devices so both batch
(data) and feature (model) axes shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def _factor(n: int) -> tuple:
    """Near-square factorization n = a*b with a <= b."""
    a = int(n ** 0.5)
    while a > 1 and n % a:
        a -= 1
    return a, n // a


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              devices=None) -> Mesh:
    """Build a 2D mesh over the first ``n_devices`` devices.

    axis_names defaults to ('dp', 'tp'): data-parallel × tensor-parallel.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"asked for {n_devices} devices, "
                         f"have {len(devices)}")
    devices = devices[:n_devices]
    if len(axis_names) == 1:
        shape = (n_devices,)
    elif len(axis_names) == 2:
        shape = _factor(n_devices)
    else:
        raise ValueError("make_mesh supports 1D or 2D meshes")
    import numpy as np
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
