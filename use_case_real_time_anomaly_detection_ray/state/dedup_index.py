"""Sharded streaming-dedup index — the one place the engine drops to raw
Ray actors, because a SHARED MUTABLE INDEX across pipeline runs is the one
semantics ``ray.data.Dataset`` cannot express (stages are pure functions of
their input blocks; state must live outside the streaming executor).

The reference's analog is the materialized dedup target fed by scheduled
copy ticks (``tinybird/pipes/dedup_log.pipe:6`` + the per-minute copy
cadence): each tick INSERTs only rows whose key hasn't been seen by any
earlier tick. Here the "seen" set is hash-sharded over ``n_shards`` actors
(place them across the cluster; each holds ~|keys|/shards 8-byte hashes),
and a tick's batches query/update their shard subsets in one round trip.

Scale note: the index holds 64-bit key hashes, ~8 GB per 10^9 distinct
keys across all shards — size ``n_shards`` so a shard fits a node's heap.
``check_and_add`` is atomic per shard (actor calls serialize), so a key
racing in from two concurrent batches is admitted exactly once.
"""

from __future__ import annotations

import numpy as np

import ray


@ray.remote
class DedupShard:
    """One hash shard of the seen-key set. ``check_and_add`` returns the
    is-new mask for its input (and admits the new keys), atomically."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        seen = self._seen
        out = np.empty(len(hashes), bool)
        for i, h in enumerate(hashes.tolist()):
            if h in seen:
                out[i] = False
            else:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._seen)


class DedupIndex:
    """Facade over ``n_shards`` :class:`DedupShard` actors.

    ``filter_new(hashes)`` partitions the input by ``hash % n_shards``,
    issues one ``check_and_add`` per touched shard (concurrently), and
    reassembles the is-new mask in input order.
    """

    def __init__(self, n_shards: int = 8) -> None:
        self.n_shards = int(n_shards)
        self.shards = [DedupShard.remote() for _ in range(self.n_shards)]

    def filter_new(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        mask = np.empty(len(h), bool)
        refs, idxs = [], []
        for s in np.unique(shard_of):
            idx = np.flatnonzero(shard_of == s)
            refs.append(self.shards[int(s)].check_and_add.remote(h[idx]))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            mask[idx] = res
        return mask

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))
