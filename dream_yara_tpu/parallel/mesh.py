"""Device mesh construction for the DREAM mapper.

Mesh axes (SURVEY.md §5.8, BASELINE.json north_star):
  'data' — read batches stream data-parallel (reference: OpenMP over reads)
  'bin'  — FM-index shards resident per device (reference: the bin loop)

The IBF is replicated (it is small relative to the index set); per-bin FM
arrays are sharded along DeviceFMSet axis 0 over 'bin'.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def mesh_factors(n_devices: int, n_bins: int) -> tuple[int, int]:
    """Split devices into (data, bin) axes: as many bin shards as divide both
    the device count and (padded) bin count, rest to data parallelism."""
    bin_size = 1
    for cand in range(min(n_devices, n_bins), 0, -1):
        if n_devices % cand == 0:
            bin_size = cand
            break
    return n_devices // bin_size, bin_size


def make_mesh(n_devices: int | None = None, n_bins: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    data, bins = mesh_factors(len(devices), n_bins)
    arr = np.array(devices).reshape(data, bins)
    return Mesh(arr, ("data", "bin"))
