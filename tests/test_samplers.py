"""Sampler parity tests: same cases (and expected outputs) as the
reference's own suite (reference: tests/test_data_samplers.py:26-149)."""

import itertools

import numpy as np
import pytest

from mmt_psm_tpu.data.samplers import (
    BatchSampler,
    GroupedBatchSampler,
    IterationBasedBatchSampler,
    RandomSampler,
    SequentialSampler,
    ShardSampler,
    WeightedRandomSubsetSampler,
)


class SubsetSampler:
    def __init__(self, indices):
        self.indices = indices

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


def test_grouped_respect_order_simple():
    dataset = list(range(40))
    group_ids = [i // 10 for i in dataset]
    for batch_size in [1, 3, 5, 6]:
        bs = GroupedBatchSampler(SequentialSampler(40), group_ids, batch_size, False)
        merged = list(itertools.chain.from_iterable(bs))
        assert merged == dataset


def test_grouped_respect_order():
    group_ids = [0, 0, 1, 0, 1, 1, 0, 1, 1, 0]
    expected = [
        [[0], [1], [2], [3], [4], [5], [6], [7], [8], [9]],
        [[0, 1, 3], [2, 4, 5], [6, 9], [7, 8]],
        [[0, 1, 3, 6], [2, 4, 5, 7], [8], [9]],
    ]
    for idx, batch_size in enumerate([1, 3, 4]):
        bs = GroupedBatchSampler(SequentialSampler(10), group_ids, batch_size, False)
        assert list(bs) == expected[idx]


def test_grouped_drop_uneven():
    group_ids = [0, 0, 1, 0, 1, 1, 0, 1, 1, 0]
    bs = GroupedBatchSampler(SequentialSampler(10), group_ids, 3, True)
    assert list(bs) == [[0, 1, 3], [2, 4, 5]]


def test_grouped_subset_sampler():
    group_ids = [0, 0, 1, 0, 1, 1, 0, 1, 1, 0]
    bs = GroupedBatchSampler(SubsetSampler([0, 3, 5, 6, 7, 8]), group_ids, 3, False)
    assert list(bs) == [[0, 3, 6], [5, 7, 8]]


def test_grouped_permuted_subset_sampler():
    group_ids = [0, 0, 1, 0, 1, 1, 0, 1, 1, 0]
    bs = GroupedBatchSampler(SubsetSampler([5, 0, 6, 1, 3, 8]), group_ids, 3, False)
    assert list(bs) == [[5, 8], [0, 6, 1], [3]]
    bs = GroupedBatchSampler(SubsetSampler([5, 0, 6, 1, 3, 8]), group_ids, 3, True)
    assert list(bs) == [[0, 6, 1]]


def test_grouped_len_consistent():
    rng = np.random.default_rng(0)
    group_ids = rng.integers(0, 2, 10).tolist()
    bs = GroupedBatchSampler(RandomSampler(10, seed=1), group_ids, 3, True)
    result = list(bs)
    assert len(result) == len(bs)
    bs2 = GroupedBatchSampler(RandomSampler(10, seed=2), group_ids, 3, True)
    n = len(bs2)
    assert len(list(bs2)) == n


@pytest.mark.parametrize("batch_size", [2, 3, 4])
@pytest.mark.parametrize("num_iterations", [4, 10, 20])
@pytest.mark.parametrize("drop_last", [False, True])
def test_iteration_based_sampler(batch_size, num_iterations, drop_last):
    bs = BatchSampler(SequentialSampler(10), batch_size, drop_last=drop_last)
    it = IterationBasedBatchSampler(bs, num_iterations)
    assert len(it) == num_iterations
    for i, batch in enumerate(it):
        start = (i % len(bs)) * batch_size
        end = min(start + batch_size, 10)
        assert batch == list(range(start, end))


def test_shard_sampler_partition():
    shards = [list(ShardSampler(10, 4, i, shuffle=False)) for i in range(4)]
    assert all(len(s) == 3 for s in shards)  # ceil(10/4), padded
    seen = sorted(itertools.chain.from_iterable(shards))
    assert set(seen) == set(range(10))  # covers everything (with repeats)

    a0 = list(ShardSampler(10, 4, 0, shuffle=True, seed=5))
    a0b = list(ShardSampler(10, 4, 0, shuffle=True, seed=5))
    assert a0 == a0b  # deterministic per epoch


def test_weighted_sampler_bias():
    w = [0.0] * 9 + [1.0]
    s = WeightedRandomSubsetSampler(w, 20, seed=0)
    assert all(i == 9 for i in s)
