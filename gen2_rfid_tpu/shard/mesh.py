"""Device mesh construction for sharded capture decode.

The reference is single-process with no parallelism of any kind
(SURVEY.md section 2.5); this axis layout is new design.  Mesh axes:

* ``time`` - overlap-save time-block sharding of one long capture (the DSP
  analogue of data/sequence parallelism); halos ride ICI via ``ppermute``.
* ``chan`` - independent frequency channels / antennas (embarrassingly
  parallel axis).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

TIME_AXIS = "time"
CHAN_AXIS = "chan"


def make_mesh(
    n_time: Optional[int] = None, n_chan: int = 1, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_time is None:
        n_time = len(devices) // n_chan
    assert n_time * n_chan <= len(devices), (n_time, n_chan, len(devices))
    dev = np.asarray(devices[: n_time * n_chan]).reshape(n_time, n_chan)
    return Mesh(dev, (TIME_AXIS, CHAN_AXIS))
