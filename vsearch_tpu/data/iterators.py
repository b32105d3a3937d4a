"""Deterministic sharded data iterators.

Counterpart of reference src/ir/data/ddp_iterators.py:10-305. Semantics
preserved: per-shard contiguous slice of a seeded epoch permutation,
max-iterations set by the largest shard (short shards pad from their own
head), ``offset`` for mid-epoch resume, multi-dataset interleaving with a
seeded source schedule where each batch comes from one dataset. Shards
here map to JAX *processes* (hosts) rather than torch ranks; per-device
splitting happens by sharding the global batch over the mesh.
"""
from __future__ import annotations

import itertools
import logging
import math
import random
from typing import Iterator, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)


class ShardedDataIterator:
    """reference ddp_iterators.py:10-129 (with its undefined-variable
    strict-batch bug fixed: padding comes from the shard head)."""

    def __init__(self, dataset, shard_id: int = 0, num_shards: int = 1,
                 batch_size: int = 1, shuffle: bool = True,
                 shuffle_seed: int = 0, offset: int = 0,
                 strict_batch_size: bool = False):
        self.dataset = dataset
        total_size = len(dataset)
        self.shards_num = max(num_shards, 1)
        self.shard_id = max(shard_id, 0)
        samples_per_shard = math.ceil(total_size / self.shards_num)
        self.shard_start_idx = self.shard_id * samples_per_shard
        self.shard_end_idx = min(self.shard_start_idx + samples_per_shard,
                                 total_size)
        if strict_batch_size:
            self.max_iterations = math.ceil(samples_per_shard / batch_size)
        else:
            self.max_iterations = samples_per_shard // batch_size
        self.iteration = offset
        self.shuffle = shuffle
        self.batch_size = batch_size
        self.shuffle_seed = shuffle_seed
        self.strict_batch_size = strict_batch_size

    def total_data_len(self) -> int:
        return len(self.dataset)

    def iterations_num(self) -> int:
        return self.max_iterations - self.iteration

    def max_iterations_num(self) -> int:
        return self.max_iterations

    def get_iteration(self) -> int:
        return self.iteration

    def get_shard_indices(self, epoch: int) -> List[int]:
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            # seeded by (shuffle_seed + epoch) so every shard derives the
            # same permutation and resume is deterministic
            random.Random(self.shuffle_seed + epoch).shuffle(indices)
        return indices[self.shard_start_idx: self.shard_end_idx]

    def iterate_ds_data(self, epoch: int = 0) -> Iterator[List]:
        max_iterations = self.max_iterations - self.iteration
        shard_indices = self.get_shard_indices(epoch)
        for i in range(self.iteration * self.batch_size,
                       len(shard_indices), self.batch_size):
            items_idxs = shard_indices[i: i + self.batch_size]
            if self.strict_batch_size and len(items_idxs) < self.batch_size:
                items_idxs.extend(
                    shard_indices[: self.batch_size - len(items_idxs)])
            self.iteration += 1
            yield [self.dataset[idx] for idx in items_idxs]
        # short shards keep pace with the largest one by re-yielding the
        # shard head
        while self.iteration < max_iterations:
            self.iteration += 1
            items_idxs = shard_indices[: self.batch_size]
            yield [self.dataset[idx] for idx in items_idxs]
        self.iteration = 0

    def iterate_ds_sampled_data(self, num_iterations: int, epoch: int = 0
                                ) -> Iterator[List]:
        self.iteration = 0
        shard_indices = self.get_shard_indices(epoch)
        cycle_it = itertools.cycle(shard_indices)
        for _ in range(num_iterations):
            items_idxs = [next(cycle_it) for _ in range(self.batch_size)]
            self.iteration += 1
            yield [self.dataset[idx] for idx in items_idxs]
        self.iteration = 0

    def get_dataset(self):
        return self.dataset


class LocalShardedDataIterator(ShardedDataIterator):
    """Loads only the local shard's data (reference
    ddp_iterators.py:132-146)."""

    def load_data(self):
        self.dataset.load_data(start_pos=self.shard_start_idx,
                               end_pos=self.shard_end_idx)

    def get_shard_indices(self, epoch: int) -> List[int]:
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.shuffle_seed + epoch).shuffle(indices)
        return indices


class MultiSetDataIterator:
    """Interleaves multiple datasets; each batch comes from exactly one
    dataset, schedule is a seeded shuffle (reference
    ddp_iterators.py:150-253)."""

    def __init__(self, datasets: List[ShardedDataIterator],
                 shuffle_seed: int = 0, shuffle: bool = True,
                 sampling_rates: Optional[Sequence[float]] = None,
                 rank: int = 0):
        self.iterables = datasets
        self.total_data = sum(it.total_data_len() for it in datasets)
        self.shuffle_seed = shuffle_seed
        self.shuffle = shuffle
        self.iteration = 0
        self.rank = rank
        if sampling_rates:
            self.max_its_pr_ds = [
                int(ds.max_iterations_num() * sampling_rates[i])
                for i, ds in enumerate(datasets)]
        else:
            self.max_its_pr_ds = [ds.max_iterations_num()
                                  for ds in datasets]
        self.max_iterations = sum(self.max_its_pr_ds)

    def total_data_len(self) -> int:
        return self.total_data

    def get_max_iterations(self) -> int:
        return self.max_iterations

    def get_iteration(self) -> int:
        return self.iteration

    def iterate_ds_data(self, epoch: int = 0
                        ) -> Iterator[Tuple[List, int]]:
        data_src_indices: List[int] = []
        iterators = []
        for source, src_its in enumerate(self.max_its_pr_ds):
            data_src_indices.extend([source] * src_its)
            iterators.append(self.iterables[source].iterate_ds_sampled_data(
                src_its, epoch=epoch))
        if self.shuffle:
            random.Random(self.shuffle_seed + epoch).shuffle(
                data_src_indices)
        for source_idx in data_src_indices:
            next_item = next(iterators[source_idx], None)
            if next_item is not None:
                self.iteration += 1
                yield next_item, source_idx
        for it in iterators:
            next(it, None)
        for it in self.iterables:
            it.iteration = 0
        self.iteration = 0

    def get_dataset(self, ds_id: int):
        return self.iterables[ds_id].get_dataset()

    def get_datasets(self):
        return [it.get_dataset() for it in self.iterables]


def get_data_iterator(datasets: Sequence, batch_size: int,
                      is_train_set: bool = True, shuffle: bool = True,
                      shuffle_seed: int = 0, offset: int = 0,
                      rank: int = 0, num_shards: int = 1,
                      shard_id: int = 0,
                      sampling_rates: Optional[Sequence[float]] = None,
                      require_positive: bool = True,
                      require_hard_negative: bool = True,
                      local_shards: bool = False) -> MultiSetDataIterator:
    """Factory (reference ddp_iterators.py:257-305): loads data in a
    rank-randomized order (avoids FS congestion), wraps each dataset in a
    sharded iterator, interleaves."""
    load_order = list(datasets)
    random.Random(rank).shuffle(load_order)
    for ds in load_order:
        if is_train_set:
            ds.load_data(require_positive, require_hard_negative)
        else:
            ds.load_data()
    cls = LocalShardedDataIterator if local_shards else ShardedDataIterator
    sharded = [cls(ds, shard_id=shard_id, num_shards=num_shards,
                   batch_size=batch_size, shuffle=shuffle,
                   shuffle_seed=shuffle_seed, offset=offset)
               for ds in datasets]
    return MultiSetDataIterator(
        sharded, shuffle_seed, shuffle,
        sampling_rates=sampling_rates if is_train_set else [1],
        rank=rank)
