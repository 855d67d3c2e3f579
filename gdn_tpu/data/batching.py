"""Shared batching helper for the host-side train loaders.

The reference's torch DataLoader exposes drop_last; our looping
training iterators deliberately drop the trailing partial batch each
epoch (the samples return after the next shuffle).  For loop=False
consumers (finite passes: validation-loss sweeps, export jobs) dropping
the tail silently loses data, so the final partial batch is PADDED to
the static batch size by repeating the last sample — TPU programs need
static shapes — and the caller zeroes the padded rows' validity masks
so they contribute nothing to masked losses/metrics.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def iter_batch_indices(
    order: np.ndarray, batch_size: int, loop: bool
) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield (indices, n_padded) chunks of exactly ``batch_size``.

    With loop=True the trailing partial chunk is dropped (it reappears
    after the next shuffle).  With loop=False it is padded by repeating
    the final index; ``n_padded`` tells the caller how many trailing
    rows are padding (zero their masks).
    """
    n = len(order)
    usable = n - n % batch_size
    for start in range(0, usable, batch_size):
        yield order[start : start + batch_size], 0
    rem = n - usable
    if rem and not loop:
        idx = np.concatenate(
            [order[usable:], np.repeat(order[n - 1 : n], batch_size - rem)]
        )
        yield idx, batch_size - rem
