"""ConcatDataset with per-dataset enlarge ratios and ``dataset_idx`` stamping.

Reference: ``basicsr/data/concat_dataset.py:42-102``.  The stamped
``dataset_idx`` — which sub-dataset (= degradation type) a sample came from —
is the weak-supervision label every DCPT model trains on.
"""

from __future__ import annotations

import bisect
from typing import Iterable, Sequence


class ConcatDataset:
    def __init__(self, datasets: Iterable, enlarge_ratios: Sequence[int]):
        self.datasets = list(datasets)
        self.enlarge_ratios = list(enlarge_ratios)
        assert len(self.datasets) > 0, "datasets should not be an empty iterable"
        assert len(self.datasets) == len(self.enlarge_ratios), (
            f"The numbers of datasets is not the same as the numbers of enlarge_ratios, "
            f"{len(self.datasets)} v.s. {len(self.enlarge_ratios)}."
        )
        self.cumulative_sizes = self.cumsum(self.datasets, self.enlarge_ratios)
        self.datasets_length = [len(d) for d in self.datasets]

    @staticmethod
    def cumsum(sequence, enlarge_ratios):
        r, s = [], 0
        for e, ratio in zip(sequence, enlarge_ratios):
            length = len(e) * ratio
            r.append(length + s)
            s += length
        return r

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx):
        if idx < 0:
            if -idx > len(self):
                raise ValueError("absolute value of index should not exceed dataset length")
            idx = len(self) + idx
        dataset_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        if dataset_idx == 0:
            sample_idx = idx % self.datasets_length[dataset_idx]
        else:
            sample_idx = (idx - self.cumulative_sizes[dataset_idx - 1]) % self.datasets_length[dataset_idx]
        data = self.datasets[dataset_idx][sample_idx]
        data["dataset_idx"] = dataset_idx
        return data
