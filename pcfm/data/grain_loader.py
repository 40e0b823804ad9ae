"""Grain-backed loader (alternative to the thread loader in loader.py).

ROADMAP #7: `grain` (Google's JAX-native input pipeline) gives
multi-PROCESS workers — h5py holds the GIL during decompression, so at
high shard throughput the thread pool in ``DataLoader`` can saturate a
core; grain's worker processes sidestep that entirely.

Semantics vs the thread loader:
  * same item pipeline: per-item ``ds.get(idx, rng)`` with a
    deterministically seeded RandomState (grain supplies a per-record,
    per-epoch generator derived from the loader seed);
  * same collate() contract and batch keys;
  * sharding via grain ShardOptions (rank/world), drop_remainder
    matching drop_last;
  * ONE deviation: the shuffle order is grain's internal per-epoch
    reshuffle keyed off ``seed`` — ``epoch_batches(ep)`` consumes the
    next len(self) batches from a persistent stream instead of
    re-deriving order from ``ep`` (grain owns epoch bookkeeping).

Select with ``--loader_backend grain``.
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from pcfm.data.loader import collate


class _IndexSource:
    """Trivial random-access source: record i -> i."""

    def __init__(self, n: int):
        self._n = int(n)

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> int:
        return int(i)


def _make_load_item(dataset):
    """grain RandomMapTransform running the per-item pipeline.  Built at
    module level holding ONLY the dataset (the transform is pickled to
    every worker process — a closure over __init__ would drag the whole
    loader scope along)."""
    import grain.python as pg

    class _LoadItem(pg.RandomMapTransform):
        def __init__(self):
            self.ds = dataset

        def random_map(self, idx, rng: np.random.Generator):
            rs = np.random.RandomState(int(rng.integers(0, 2 ** 31 - 1)))
            return self.ds.get(int(idx), rs)

    return _LoadItem()


class GrainLoader:
    """Drop-in for pcfm.data.loader.DataLoader backed by grain."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 num_workers: int = 0, rank: int = 0, world_size: int = 1,
                 prefetch: int = 4):
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.drop_last = bool(drop_last)
        self.world_size = max(1, int(world_size))
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self.rank = int(rank)
        self.num_workers = max(0, int(num_workers))
        self.prefetch = max(1, int(prefetch))

        if self.drop_last:
            # persistent infinite stream; epoch_batches consumes exactly
            # one grain epoch per call (nb batches + shard remainder)
            self._loader = self._make_loader(num_epochs=None,
                                             seed=self.seed)
        else:
            # drop_last=False needs a REAL epoch boundary (StopIteration)
            # for the partial tail batch — an infinite sampler would fill
            # the tail with next-epoch records and skip the remainder
            # drain (ADVICE r2); build one finite loader per epoch instead
            self._loader = None
        self._it = None

    def _make_loader(self, num_epochs, seed):
        import grain.python as pg
        sampler = pg.IndexSampler(
            num_records=len(self.ds),
            shard_options=pg.ShardOptions(
                shard_index=self.rank, shard_count=self.world_size,
                drop_remainder=True),
            shuffle=self.shuffle, num_epochs=num_epochs, seed=seed)
        return pg.DataLoader(
            data_source=_IndexSource(len(self.ds)), sampler=sampler,
            operations=[_make_load_item(self.ds)],
            worker_count=self.num_workers,
            worker_buffer_size=self.prefetch)

    def __len__(self) -> int:
        n = len(self.ds) // self.world_size
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def epoch_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        if not self.drop_last:
            # fresh single-epoch stream, reshuffled by epoch; the final
            # partial batch comes out of the natural StopIteration
            it = iter(self._make_loader(num_epochs=1,
                                        seed=self.seed + int(epoch)))
            items = []
            for rec in it:
                items.append(rec)
                if len(items) == self.batch_size:
                    yield collate(items)
                    items = []
            if items:
                yield collate(items)
            return
        if self._it is None:
            self._it = iter(self._loader)
        nb = len(self)
        for _ in range(nb):
            items = []
            try:
                for _ in range(self.batch_size):
                    items.append(next(self._it))
            except StopIteration:                      # pragma: no cover
                return
            yield collate(items)
        # drain the shard remainder (shard_n % batch_size records) so the
        # NEXT call starts exactly at grain's own epoch boundary —
        # otherwise nominal epochs drift across grain's reshuffles and
        # records get duplicated/skipped within a reported epoch
        rem = (len(self.ds) // self.world_size) - nb * self.batch_size
        for _ in range(rem):
            try:
                next(self._it)
            except StopIteration:                      # pragma: no cover
                return


def make_loader(backend: str, *args, **kwargs):
    """Factory: 'thread' (default) or 'grain'."""
    if backend == "grain":
        return GrainLoader(*args, **kwargs)
    from pcfm.data.loader import DataLoader
    return DataLoader(*args, **kwargs)
