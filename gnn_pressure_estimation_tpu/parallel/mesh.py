"""Device mesh construction for data × graph parallelism.

The two scaling axes of this workload (SURVEY.md §2.4):

- ``data``  — data parallelism over snapshot batches (the reference trains
  single-device only, train.py:306-309; this is the natural TPU replacement)
- ``graph`` — edge/node partition parallelism over the WDN graph (the
  sequence-parallel analog; boundary features ride ICI collectives)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    gp: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: tuple = ("data", "graph"),
) -> Mesh:
    """Mesh over ``dp × gp`` devices. ``dp=None`` uses all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % gp == 0, f"{n} devices not divisible by gp={gp}"
        dp = n // gp
    need = dp * gp
    assert need <= n, f"mesh {dp}x{gp} needs {need} devices, have {n}"
    arr = np.array(devices[:need]).reshape(dp, gp)
    return Mesh(arr, axis_names=axis_names)
