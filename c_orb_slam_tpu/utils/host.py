"""Host↔device transfer discipline.

The reference is a shared-memory C++ program where "reading a result" is
free. Here every device→host readback is a round trip over the runtime
transport (PCIe, or a network tunnel on remote-attached TPU), with a
~10-30 ms floor per call. The per-frame SLAM loop therefore follows two
rules, enforced via this module:

1. ONE `fetch()` per pipeline stage — `jax.device_get` of a pytree batches
   arbitrarily many arrays into a single transfer.
2. Pull only small things (poses, index vectors, masks); anything large
   stays device-resident.
"""

from __future__ import annotations

import jax


def fetch(*arrays):
    """Single-round-trip device→host transfer of all given arrays.

    Returns numpy arrays (or scalars unchanged), one per argument.
    """
    out = jax.device_get(arrays)
    return out if len(arrays) != 1 else out[0]
