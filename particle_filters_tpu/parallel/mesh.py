"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_batch: int = 1,
    n_particles: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 2-D mesh ``('batch', 'particles')``.

    ``batch`` shards independent sequences (data parallelism); ``particles``
    shards the particle ensemble (the SMC analog of sequence parallelism —
    SURVEY.md §5.7). Defaults to all devices on the particle axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_particles is None:
        if len(devs) % n_batch != 0:
            raise ValueError(
                f"{len(devs)} devices not divisible by n_batch={n_batch}."
            )
        n_particles = len(devs) // n_batch
    if n_batch * n_particles > len(devs):
        raise ValueError(
            f"Mesh {n_batch}x{n_particles} needs more than {len(devs)} devices."
        )
    grid = np.asarray(devs[: n_batch * n_particles]).reshape(
        n_batch, n_particles
    )
    return Mesh(grid, ("batch", "particles"))
