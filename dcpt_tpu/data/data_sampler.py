"""Per-host sharded index sampler for iteration-based training.

TPU-native equivalent of the reference's ``EnlargedSampler``
(``basicsr/data/data_sampler.py:7-50``): epoch-seeded permutation of an
enlarged index space, modulo mapping onto the real dataset, rank-strided
subsampling so each host reads a disjoint slice.  On TPU the "rank" is
``jax.process_index()`` — one sampler per host, each feeding the host's local
devices.
"""

from __future__ import annotations

import math

import numpy as np


class EnlargedSampler:
    """``torch_compat=True`` reproduces the reference's exact epoch-seeded
    ``torch.randperm`` sequence (``data_sampler.py:30-43``) so a migrating
    user can replay a torch training run's data order bit-for-bit; the
    default numpy permutation is equally deterministic but a DIFFERENT
    sequence (yml: ``datasets.train.torch_compat_sampler: true``)."""

    def __init__(self, dataset, num_replicas: int, rank: int, ratio: int = 1,
                 torch_compat: bool = False):
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.torch_compat = torch_compat
        self.num_samples = math.ceil(len(dataset) * ratio / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def __iter__(self):
        if self.torch_compat:
            import torch  # test/migration dep only — not on the default path

            g = torch.Generator()
            g.manual_seed(self.epoch)
            indices = torch.randperm(self.total_size, generator=g).numpy()
        else:
            indices = np.random.default_rng(self.epoch).permutation(self.total_size)
        indices = indices % len(self.dataset)
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
