"""Resumable data samplers (numpy): rank-strided and resolution-bucketed.

Reference: `/root/reference/f_lite/sampler.py`. Semantics preserved:
- `StatefulDistributedSampler`: epoch+seed-deterministic shuffle, pad to
  even divisibility (or drop), resume via `start_index`; state_dict maps
  global_step -> `start_index = step * batch_size % N` (`sampler.py:126-137`);
  iteration slices `indices[start*R + rank :: R]` (`sampler.py:96-97`).
- `ResolutionBucketSampler`: batches formed within aspect buckets, batch
  list deterministically shuffled, sharded `rank::num_replicas`, resumable
  via `start_batch_index = global_step % len` (`sampler.py:175-311`).
"""

from __future__ import annotations

import math

import numpy as np


class StatefulDistributedSampler:
    def __init__(
        self,
        dataset,
        batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.start_index = 0
        self.num_samples = len(dataset)
        self.total_size = self.num_samples

    def __iter__(self):
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            indices = rs.permutation(self.num_samples)
        else:
            indices = np.arange(self.num_samples)

        if not self.drop_last:
            pad = self.total_size - len(indices)
            if pad > 0:
                reps = math.ceil(pad / len(indices))
                indices = np.concatenate(
                    [indices, np.tile(indices, reps)[:pad]]
                )
        else:
            indices = indices[: self.total_size]

        indices = indices[self.start_index * self.num_replicas + self.rank:]
        indices = indices[:: self.num_replicas]
        return iter(indices.tolist())

    def __len__(self):
        return max(
            0, self.num_samples - self.start_index * self.num_replicas
        )

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def state_dict(self, global_step: int) -> dict:
        # epoch is part of the resume state: the shuffle permutation is
        # keyed on seed+epoch, so a resume that restarted at epoch 0
        # would replay epoch-0 sample order instead of continuing the
        # interrupted epoch's
        return {
            "start_index": (global_step * self.batch_size)
            % self.num_samples,
            "epoch": self.epoch,
            "seed": self.seed,
            "shuffle": self.shuffle,
        }

    def load_state_dict(self, state: dict):
        self.start_index = state.get("start_index", 0)
        self.epoch = state.get("epoch", 0)
        self.seed = state.get("seed", self.seed)
        self.shuffle = state.get("shuffle", self.shuffle)

    def reset(self, specific_index: int = 0):
        self.start_index = specific_index


class ResolutionBucketSampler:
    """Yields index *batches*, one aspect bucket per batch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_replicas: int | None = None,
        rank: int | None = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
    ):
        if getattr(dataset, "aspect_ratio_buckets", None) is None:
            dataset.setup_aspect_ratio_buckets()
        self.dataset = dataset
        self.buckets = dataset.aspect_ratio_buckets
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.start_batch_index = 0

    def __iter__(self):
        rs = np.random.RandomState(self.seed + self.epoch)
        batches = []
        for _aspect, indices in self.buckets.items():
            idx = np.asarray(indices)
            if self.shuffle:
                idx = idx[rs.permutation(len(idx))]
            for i in range(0, len(idx), self.batch_size):
                b = idx[i : i + self.batch_size]
                if len(b) == self.batch_size or not self.drop_last:
                    batches.append(b.tolist())
        if self.shuffle:
            order = rs.permutation(len(batches))
            batches = [batches[i] for i in order]
        if self.num_replicas is not None and self.rank is not None:
            batches = batches[self.rank :: self.num_replicas]
        return iter(batches[self.start_batch_index :])

    def _total_batches(self) -> int:
        """Full-epoch batch count, independent of the resume offset."""
        if self.drop_last:
            total = sum(
                len(v) // self.batch_size for v in self.buckets.values()
            )
        else:
            total = sum(
                -(-len(v) // self.batch_size)
                for v in self.buckets.values()
            )
        if self.num_replicas is not None:
            total = -(-total // self.num_replicas)
        return total

    def __len__(self):
        return max(0, self._total_batches() - self.start_batch_index)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def state_dict(self, global_step: int) -> dict:
        # modulus must be the FULL epoch length: len(self) shrinks by the
        # restored offset after a resume, which would make every later
        # save map global_step to the wrong position
        n = self._total_batches()
        return {
            "start_batch_index": global_step % n if n else 0,
            "epoch": self.epoch,
            "seed": self.seed,
            "shuffle": self.shuffle,
        }

    def load_state_dict(self, state: dict):
        self.start_batch_index = state.get("start_batch_index", 0)
        self.epoch = state.get("epoch", 0)
        self.seed = state.get("seed", self.seed)
        self.shuffle = state.get("shuffle", self.shuffle)

    def reset(self, specific_batch_index: int = 0):
        self.start_batch_index = specific_batch_index
