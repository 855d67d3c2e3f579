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

from typing import Dict, Iterator, Tuple

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


class SeekableLoaderMixin:
    """Deterministic data-order resume for the host train loaders
    (SURVEY.md §5 checkpoint/resume; VERDICT r2 item 7).

    The batch sequence is a pure function of (seed, batch index): the
    shuffle RNG is reconstructed from ``self._seed`` and the index
    machinery (shuffles + chunking, no image decode) is replayed for
    ``n`` batches.  ``seek(state.step)`` after a checkpoint restore
    therefore replays data exactly as an uninterrupted run — no extra
    cursor needs to live in the orbax payload, because ``step`` (already
    persisted) IS the cursor.  Requires unchanged loader configuration
    (seed, batch size, list file) across the resume; ``seek`` applies to
    the next ``__iter__`` only.

    Host classes provide: entries, batch_size, shuffle, loop, _seed,
    _rng, _make_batch(idx).
    """

    _skip: int = 0

    def seek(self, n_batches: int) -> None:
        self._rng = np.random.default_rng(self._seed)
        self._skip = int(n_batches)

    def _index_iter(self) -> Iterator[Tuple[np.ndarray, int]]:
        order = np.arange(len(self.entries))
        if self.loop and len(order) < self.batch_size:
            # loop=True drops the partial tail chunk; with fewer samples
            # than one batch NOTHING would ever be yielded and the
            # consumer would block forever — fail loudly instead.
            raise ValueError(
                f"dataset has {len(order)} samples < batch_size "
                f"{self.batch_size}; a looping loader would never yield "
                "a batch (shrink batch_size or enlarge the list)"
            )
        while True:
            if self.shuffle:
                self._rng.shuffle(order)
            yield from iter_batch_indices(order, self.batch_size, self.loop)
            if not self.loop:
                break

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        skip, self._skip = self._skip, 0
        for idx, n_pad in self._index_iter():
            if skip:
                skip -= 1
                continue
            batch = self._make_batch(idx)
            if n_pad:
                # padded rows must not contribute to masked losses
                if "mask" in batch:
                    batch["mask"][-n_pad:] = 0.0
                else:
                    # wire-format batch: the device derives the mask as
                    # depth > 0, so zeroed counts mask the padding out
                    batch["depth"][-n_pad:] = 0
            yield batch
