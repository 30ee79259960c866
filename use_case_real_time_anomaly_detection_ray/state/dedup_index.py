"""Sharded streaming-dedup index — the one place the engine drops to raw
Ray actors, because a SHARED MUTABLE INDEX across pipeline runs is the one
semantics ``ray.data.Dataset`` cannot express (stages are pure functions of
their input blocks; state must live outside the streaming executor).

The reference's analog is the materialized dedup target fed by scheduled
copy ticks (``tinybird/pipes/dedup_log.pipe:6`` + the per-minute copy
cadence): each tick INSERTs only rows whose key hasn't been seen by any
earlier tick. Here the "seen" set is hash-sharded over ``n_shards`` actors
(place them across the cluster; each holds ~|keys|/shards key hashes), and
a tick's batches query/update their shard subsets in one round trip.

Scale shape, per shard:

- **Vectorized probes, no per-row Python.** The seen set is an
  open-addressing (linear-probing) hash table in numpy arrays; a batch is
  one probe loop whose every step is a vectorized gather/compare over the
  still-unresolved queries (expected O(1) probes/key at ≤0.6 load). Keys
  are stored Fibonacci-mixed (bijective, so equality is preserved) and the
  table slot is the mixed key's top bits — the hot path costs ONE random
  gather per key per probe; tick/generation metadata is only gathered for
  the hit subset. Mixed value 0 can only come from key 0, which is
  handled scalar-side, so 0 doubles as the empty sentinel with no
  per-slot occupancy array.
- **First-occurrence-wins within a batch**, vectorized: claimants of the
  same empty slot (and retry hits of the same key) are tie-broken by a
  stable argsort over the (small) contended subset, lowest batch position
  first.
- **Idempotent under Ray re-execution.** Each admitted key records the
  admitting tick; ``check_and_add`` returns is-new OR owned-by-THIS-tick
  (first in-batch occurrence only, so the mask is reproduced exactly).
  If Ray retries / lineage-reconstructs a block task (worker crash, lost
  object), the re-executed task re-sends keys its first execution admitted
  and gets the *same* mask back — instead of seeing its own keys as
  "already seen" and silently dropping the block. A key raced in from two
  *different* ticks is still admitted exactly once (actor calls serialize;
  first tick wins ownership).
- 16 bytes/slot (uint64 mixed key, uint64 packed tick-id<<32|call-no
  metadata) at 0.35-0.6 load ≈ 27-46 B/key: ~35 GB per 10^9 distinct
  keys across all shards — size ``n_shards`` so a shard fits a node's
  heap.
"""

from __future__ import annotations

import numpy as np

import ray

#: Fibonacci-hash multiplier. ODD, hence bijective on uint64: equality of
#: mixed keys ⇔ equality of raw keys, and mixed==0 ⇔ raw==0.
_MIX = np.uint64(0x9E3779B97F4A7C15)
_ONE = np.uint64(1)
_TICK_SHIFT = np.uint64(32)
_CALL_MASK = np.uint64(0xFFFFFFFF)


def _first_of_group(slots: np.ndarray) -> np.ndarray:
    """Indices (into ``slots``) of the first element of each equal-value
    group, input order preserved within groups — the vectorized
    first-in-batch-occurrence-wins tie-break."""
    order = np.argsort(slots, kind="stable")
    se = slots[order]
    first = np.empty(len(se), bool)
    first[:1] = True
    first[1:] = se[1:] != se[:-1]
    return order[first]


@ray.remote
class DedupShard:
    """One hash shard of the seen-key index. ``check_and_add`` returns the
    keep mask for its input (and admits the new keys), atomically."""

    def __init__(self) -> None:
        self._cap = 0
        self._size = 0
        self._call = 0
        self._tick_ids: dict[str, int] = {}
        self._tab: np.ndarray | None = None   # mixed keys; 0 = empty
        self._meta: np.ndarray | None = None  # (tick id << 32) | call number
        self._zero_seen = False                # raw key 0, scalar-side
        self._zero_tick = 0
        self._zero_gen = 0

    def _ensure_capacity(self, extra: int) -> None:
        if self._cap and self._size + extra <= 0.6 * self._cap:
            return
        cap = 1 << max(10, int(np.ceil(np.log2(max(1, self._size + extra) / 0.35))))
        old_tab, old_meta = self._tab, self._meta
        self._cap = cap
        self._shift = np.uint64(64 - int(np.log2(cap)))
        self._mask = np.uint64(cap - 1)
        self._tab = np.zeros(cap, np.uint64)
        self._meta = np.empty(cap, np.uint64)
        if old_tab is not None and self._size:
            occ = old_tab != 0
            self._rehash(old_tab[occ], old_meta[occ])

    def _rehash(self, mixed: np.ndarray, meta: np.ndarray) -> None:
        """Re-insert distinct, absent mixed keys into the (fresh) table."""
        slot = mixed >> self._shift
        active = np.arange(len(mixed))
        while active.size:
            s = slot[active]
            empty = self._tab[s] == 0
            e_act, e_slots = active[empty], s[empty]
            if e_act.size:
                win = _first_of_group(e_slots)
                ws, wa = e_slots[win], e_act[win]
                self._tab[ws] = mixed[wa]
                self._meta[ws] = meta[wa]
                keep = np.ones(len(active), bool)
                keep[np.flatnonzero(empty)[win]] = False
                active = active[keep]
            # everyone still active advances: occupied slots can't hold a
            # distinct absent key, and claim losers just lost their slot
            slot[active] = (slot[active] + _ONE) & self._mask

    def check_and_add(self, hashes: np.ndarray, tick: str) -> np.ndarray:
        # `tick` is REQUIRED: owned-by-this-tick re-admission (the Ray
        # retry-idempotence contract) means two calls sharing one tick
        # label do NOT dedup against each other — a constant default
        # would silently turn cross-batch dedup off for any caller that
        # forgot the label. Pass a distinct label per tick/micro-batch.
        h = np.asarray(hashes, np.uint64)
        n = len(h)
        out = np.zeros(n, bool)
        if n == 0:
            return out
        self._ensure_capacity(n)
        self._call += 1
        cur = self._call
        tid = self._tick_ids.setdefault(tick, len(self._tick_ids) + 1)
        tid_u, cur_u = np.uint64(tid), np.uint64(cur)
        meta_u = np.uint64((tid << 32) | cur)
        t = h * _MIX
        zero = np.flatnonzero(h == 0)
        if len(zero):
            if not self._zero_seen:
                self._zero_seen, self._zero_tick, self._zero_gen = True, tid, cur
                out[zero[0]] = True
            elif self._zero_tick == tid and self._zero_gen != cur:
                out[zero[0]] = True  # re-executed task of the owning tick
        slot = t >> self._shift
        active = np.flatnonzero(h != 0)  # ascending: ties → lowest position
        while active.size:
            s = slot[active]
            tv = self._tab[s]  # the ONE per-key random gather on this path
            hit = tv == t[active]
            empty = tv == 0
            if hit.any():
                h_act, h_slots = active[hit], s[hit]
                m = self._meta[h_slots]
                owned = (m >> _TICK_SHIFT == tid_u) & ((m & _CALL_MASK) != cur_u)
                # owned: key admitted by an EARLIER call of this tick → a Ray
                # re-execution; reproduce the original mask (True at the first
                # in-batch occurrence only). Not owned / gen==cur (in-batch
                # duplicate of a key admitted this call): stays False.
                if owned.any():
                    o_act, o_slots = h_act[owned], h_slots[owned]
                    out[o_act[_first_of_group(o_slots)]] = True
            claim_lost = np.zeros(len(active), bool)
            if empty.any():
                e_idx = np.flatnonzero(empty)
                e_act, e_slots = active[e_idx], s[e_idx]
                win = _first_of_group(e_slots)
                ws, wa = e_slots[win], e_act[win]
                self._tab[ws] = t[wa]
                self._meta[ws] = meta_u
                out[wa] = True
                self._size += len(wa)
                # claim losers re-check the SAME slot next round: if the
                # winner holds their key they're in-batch dups (gen==cur →
                # False); otherwise they keep probing from there.
                claim_lost[e_idx] = True
                claim_lost[e_idx[win]] = False
            advance = ~hit & ~empty
            slot[active[advance]] = (slot[active[advance]] + _ONE) & self._mask
            active = active[advance | claim_lost]
        return out

    def size(self) -> int:
        return self._size + (1 if self._zero_seen else 0)


class DedupIndex:
    """Facade over ``n_shards`` :class:`DedupShard` actors.

    ``filter_new(hashes, tick)`` partitions the input by
    ``hash % n_shards``, issues one ``check_and_add`` per touched shard
    (concurrently), and reassembles the keep mask in input order. Pass the
    tick/micro-batch label so re-executed tasks of the same tick are
    answered idempotently (see module docstring).
    """

    def __init__(self, n_shards: int = 8) -> None:
        self.n_shards = int(n_shards)
        self.shards = [DedupShard.remote() for _ in range(self.n_shards)]

    def filter_new(self, hashes: np.ndarray, tick: str) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        mask = np.empty(len(h), bool)
        refs, idxs = [], []
        for s in np.unique(shard_of):
            idx = np.flatnonzero(shard_of == s)
            refs.append(self.shards[int(s)].check_and_add.remote(h[idx], tick))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            mask[idx] = res
        return mask

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))
