"""Samplers: index generators that order and shard dataset access.

Reference parity: ``/root/reference/antmmf/datasets/samplers.py`` — ``sequential``
(:48), ``random`` (:69), ``distributed_sampler`` (:128, rank-sharded with
``set_epoch`` seeding and optional eval split), ``class_balance_sampler`` (:193).

In the TPU build "rank" is the JAX process index: each host loads only its slice
of the global batch (per-host data slice, SURVEY.md §2.3), and the trainer forms
the global array with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from antmmf_tpu.common.registry import registry


class AntmmfSampler:
    """Base: iterable over dataset indices. ``set_epoch`` reseeds shuffling."""

    def __init__(self, dataset, **kwargs):
        self.dataset = dataset
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[int]:
        raise NotImplementedError


@registry.register_sampler("sequential_sampler")
class SequentialSampler(AntmmfSampler):
    def __iter__(self) -> Iterator[int]:
        return iter(range(len(self.dataset)))


@registry.register_sampler("random_sampler")
class RandomSampler(AntmmfSampler):
    def __init__(self, dataset, seed: int = 0, **kwargs):
        super().__init__(dataset)
        self.seed = int(seed)

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        return iter(rng.permutation(len(self.dataset)).tolist())


@registry.register_sampler("distributed_sampler")
class DistributedSampler(AntmmfSampler):
    """Rank-sharded sampler: pads to a multiple of world size (wrap-around) so every
    process yields the same count — required for SPMD lockstep (the reference makes
    the same guarantee so "MOE module work fine", base_trainer.py:592)."""

    def __init__(
        self,
        dataset,
        shuffle: bool = True,
        seed: int = 0,
        num_replicas: Optional[int] = None,
        rank: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(dataset)
        if num_replicas is None or rank is None:
            import jax

            num_replicas = num_replicas if num_replicas is not None else jax.process_count()
            rank = rank if rank is not None else jax.process_index()
        self.num_replicas = int(num_replicas)
        self.rank = int(rank)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        n = len(dataset)
        self.num_samples = -(-n // self.num_replicas)  # ceil
        self.total_size = self.num_samples * self.num_replicas

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n).tolist()
        else:
            order = list(range(n))
        # wrap-around pad to total_size
        order += order[: self.total_size - n]
        return iter(order[self.rank : self.total_size : self.num_replicas])


@registry.register_sampler("class_balance_sampler")
class ClassBalanceSampler(AntmmfSampler):
    """Sample inversely proportional to class frequency. Dataset must expose
    ``get_label(idx)`` or annotations with a ``label`` field."""

    def __init__(self, dataset, seed: int = 0, **kwargs):
        super().__init__(dataset)
        self.seed = int(seed)
        labels = []
        for i in range(len(dataset)):
            if hasattr(dataset, "get_label"):
                labels.append(dataset.get_label(i))
            else:
                labels.append(dataset[i].get("label", 0))
        labels = np.asarray(labels)
        _, inverse, counts = np.unique(labels, return_inverse=True, return_counts=True)
        weights = 1.0 / counts[inverse]
        self.probs = weights / weights.sum()

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        n = len(self.dataset)
        return iter(rng.choice(n, size=n, replace=True, p=self.probs).tolist())


def build_sampler(sampler_config, dataset, **extra) -> AntmmfSampler:
    cfg = dict(sampler_config or {})
    name = cfg.get("type", "sequential_sampler")
    params = dict(cfg.get("params", {}))
    params.update(extra)
    cls = registry.get_sampler_class(name)
    return cls(dataset, **params)
