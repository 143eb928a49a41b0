"""Samplers — re-design of `/root/reference/yolox/data/samplers.py`, torch-free.

`InfiniteSampler` is the data-parallel sharding mechanism: a seeded infinite
shuffled index stream, strided by (rank, world_size). `YoloBatchSampler`
yields batches of `(mosaic_flag, idx, sample_seed)` tuples; the per-sample
seed makes augmentation deterministic for a given (seed, global sample
ordinal) independent of worker scheduling.
"""

from __future__ import annotations

import itertools
from typing import Iterator, List, Optional, Tuple

import numpy as np


class InfiniteSampler:
    """Infinite shuffled index stream, rank-strided (`samplers.py:28-83`)."""

    def __init__(self, size: int, shuffle: bool = True,
                 seed: Optional[int] = 0, rank: int = 0,
                 world_size: int = 1):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = int(seed or 0)
        self._rank = rank
        self._world_size = world_size

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(
            self._infinite_indices(), self._rank, None, self._world_size)

    def _infinite_indices(self):
        rng = np.random.default_rng(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)

    def __len__(self):
        return self._size // self._world_size


class YoloBatchSampler:
    """Batches of (mosaic, idx, seed) tuples (`samplers.py:12-25`)."""

    def __init__(self, sampler, batch_size: int, drop_last: bool = False,
                 mosaic: bool = True, seed: int = 0):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.mosaic = mosaic
        self.seed = seed

    def __iter__(self) -> Iterator[List[Tuple[bool, int, int]]]:
        batch = []
        ordinal = 0
        for idx in self.sampler:
            sample_seed = (self.seed * 1_000_003 + ordinal) & 0x7FFFFFFF
            batch.append((self.mosaic, int(idx), sample_seed))
            ordinal += 1
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


class SequentialBatchSampler:
    """Finite sequential batches for evaluation, rank-strided by batch.

    Replaces torch's DistributedSampler + sequential loader combination for
    the eval path (`config.py:363-382`): process r takes batches
    r, r + world, r + 2*world, ... so all processes make the same number of
    passes (trailing processes may get an empty final batch).
    """

    def __init__(self, size: int, batch_size: int, rank: int = 0,
                 world_size: int = 1):
        self.size = size
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size

    def __iter__(self):
        all_batches = [
            [(False, i, None) for i in range(start,
                                             min(start + self.batch_size,
                                                 self.size))]
            for start in range(0, self.size, self.batch_size)
        ]
        for b in all_batches[self.rank::self.world_size]:
            yield b

    def __len__(self):
        n_batches = (self.size + self.batch_size - 1) // self.batch_size
        return (n_batches - self.rank + self.world_size - 1) \
            // self.world_size
