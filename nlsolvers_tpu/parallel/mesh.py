"""Device mesh construction helpers.

Replaces the reference's orchestration fabric (SLURM job arrays + mpi4py,
SURVEY.md §2.6): instead of 210 independent jobs, one process group over a
`jax.sharding.Mesh` whose axes are

    batch  - trajectory parallelism (the reference's only parallel axis)
    gy, gx - spatial grid decomposition (new capability)
"""

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "factor_devices"]


def factor_devices(n, dims=3):
    """Factor n devices into a near-balanced tuple, largest axis first."""
    shape = [1] * dims
    remaining = n
    i = 0
    while remaining > 1:
        # peel the smallest prime factor
        for p in range(2, remaining + 1):
            if remaining % p == 0:
                break
        shape[i % dims] *= p
        remaining //= p
        i += 1
    shape.sort(reverse=True)
    return tuple(shape)


def make_mesh(axis_names=("batch", "gy", "gx"), shape=None, devices=None):
    """Build a Mesh over the available devices.

    If `shape` is None the device count is auto-factored over the axes.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor_devices(n, dims=len(axis_names))
    assert math.prod(shape) == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
