"""Seed chaining: sweep over hits building best k-mer chains per (read,
contig, orientation), then dominance-filtered mapping candidates.

Semantics-parity redesign of the reference's splay-tree sweep (chain_thread
map.c:1020-1922).  The reference keeps active hits (those within MAX_GAP of
the sweep position in A) in a splay tree keyed on (diag, apos) augmented with
subtree bpos min/max, and for each new hit finds

  pred  = the active node with the smallest key  > (diag,apos) having
          bpos >= bpos - MAX_GAP  (predOf map.c:1262),
  prev  = the largest-apos active node on pred's diagonal with
          bpos >= bpos - MAX_GAP  (leftmost map.c:1279),
  succ  = the active node with the largest key < (diag,apos) having
          bpos <= bpos            (succOf map.c:1303),

extends whichever gives the higher cost (cost += min(kmer, advance); ties
prefer succ, map.c:1823-1826), tracks each chain's best node via orig->orig,
and absorbs the predecessor when the new node is nearly colinear
(|ddiag| <= .2*dapos, map.c:1837,1852).  These are order-statistics queries on
the *set* of active nodes — independent of tree shape — so this implementation
replaces the splay tree with a sorted key list (bisect) with identical
results.  Chains whose cost reaches HITMIN*kmer become candidates, subject to
the MIN_PIECE/0.9-score dominance rule over the read's candidate stack
(map.c:1668-1766), which persists across reference blocks and orientations
(the reads[].coff cache, map.c:1875).
"""

from __future__ import annotations

from bisect import bisect_left, insort
from dataclasses import dataclass, field

import numpy as np

HITMIN = 3        # map.c:34
MAX_GAP = 1000    # map.c:36
MIN_PIECE = 300   # map.c:37


class _Node:
    __slots__ = ("apos", "bpos", "diag", "cost", "frm", "orig", "best",
                 "absorbed")

    def __init__(self, apos, bpos):
        self.apos = apos
        self.bpos = bpos
        self.diag = apos - bpos
        self.cost = 0
        self.frm = None
        self.orig = self
        self.best = self      # valid only on origin nodes (C's orig->orig)
        self.absorbed = False

    @property
    def key(self):
        return (self.diag, self.apos)


@dataclass
class Candidate:
    score: int
    bread: int      # global contig index (block offset added)
    comp: int
    afirst: int
    alast: int
    bfirst: int
    blast: int
    length: int
    jumps: list = field(default_factory=list)  # (adisp, bdisp) last-to-first


def _chain_length(h: _Node) -> int:
    """Compress same-diagonal steps < 100bp apart; return remaining link count
    (chain_length map.c:1243-1260).  Mutates frm pointers like the original."""
    n = 0
    x = h
    y = x.frm
    while y is not None:
        da = x.apos - y.apos
        if da == x.bpos - y.bpos and da < 100:
            y = x.frm = y.frm
        else:
            n += 1
            x = y
            y = x.frm
    return n


class ChainState:
    """Per-reads-block chaining state persisted across reference blocks:
    the candidate stack per read (reads[].coff equivalent) and the optional
    repeat-profile coverage counters."""

    def __init__(self, nreads: int, kmer: int, profile=False, rlens=None,
                 spacing=100):
        self.nreads = nreads
        self.kmer = kmer
        self.hithr = HITMIN * kmer
        self.cands: list[list[Candidate]] = [[] for _ in range(nreads)]
        self.profile = profile
        self.spacing = spacing
        if profile:
            self.cover = [np.zeros((int(rlens[i]) - 1) // spacing + 2, np.int32)
                          for i in range(nreads)]
        else:
            self.cover = None

    # -- one (aread, bread) group -------------------------------------------

    def _sweep_group(self, apos_arr, bpos_arr):
        """Run the chain sweep over one group's hits (ascending apos order).
        Returns the end-of-group scan list: active nodes in decreasing key
        order followed by expired chain-best nodes in REVERSE expiry order
        (the reference prepends each expiring node, map.c:1790-1794, so its
        expired list is LIFO — the order decides which of two equal-span
        LAs survives Handle_Redundancies)."""
        keys: list[tuple] = []      # sorted ascending (diag, apos)
        nodes: dict[tuple, _Node] = {}
        queue: list[_Node] = []
        qhead = 0
        expired: list[_Node] = []

        for apos, bpos in zip(apos_arr, bpos_arr):
            # expire hits out of the MAX_GAP window (map.c:1787-1796)
            while qhead < len(queue) and queue[qhead].apos < apos - MAX_GAP:
                nd = queue[qhead]
                if not nd.absorbed:
                    i = bisect_left(keys, nd.key)
                    del keys[i]
                    del nodes[nd.key]
                    if nd.orig.best is nd:
                        expired.append(nd)
                qhead += 1

            nd = _Node(apos, bpos)
            insort(keys, nd.key)
            nodes[nd.key] = nd

            thresh = bpos - MAX_GAP
            # pred: smallest key > nd.key with bpos >= thresh
            l = None
            i = bisect_left(keys, nd.key) + 1
            while i < len(keys):
                cand = nodes[keys[i]]
                if cand.bpos >= thresh:
                    l = cand
                    break
                i += 1
            if l is not None:
                # leftmost: largest-apos active node on l's diagonal with
                # bpos >= thresh (same-diag larger apos always qualifies)
                j = bisect_left(keys, (l.diag + 1, -1)) - 1
                cand = nodes[keys[j]]
                l = cand if cand.diag == l.diag else l

            # succ: largest key < nd.key with bpos <= bpos
            r = None
            i = bisect_left(keys, nd.key) - 1
            while i >= 0:
                cand = nodes[keys[i]]
                if cand.bpos <= bpos:
                    r = cand
                    break
                i -= 1

            lcost = rcost = 0
            if l is not None:
                lcost = l.cost + (self.kmer if apos >= l.apos + self.kmer
                                  else apos - l.apos)
            if r is not None:
                rcost = r.cost + (self.kmer if bpos >= r.bpos + self.kmer
                                  else bpos - r.bpos)
            if lcost > rcost:
                rcost = 0
            else:
                lcost = 0

            if lcost > 0:
                self._extend(nd, l, lcost, keys, nodes)
            elif rcost > 0:
                self._extend(nd, r, rcost, keys, nodes)
            else:
                nd.frm = None
                nd.cost = self.kmer
                nd.orig = nd

            queue.append(nd)

        # end of group: active set in DECREASING key order + expired LIFO
        # (linearize map.c:1205-1225 yields decreasing (diag,apos), with the
        # prepend-built expired list appended)
        scan = [nodes[k] for k in reversed(keys)]
        scan.extend(reversed(expired))
        return scan

    def _extend(self, nd: _Node, p: _Node, cost: int, keys, nodes):
        nd.frm = p
        nd.cost = cost
        nd.orig = p if p.frm is None else p.orig
        if cost >= nd.orig.best.cost:
            nd.orig.best = nd
            if abs(p.diag - nd.diag) <= .2 * (nd.apos - p.apos):
                i = bisect_left(keys, p.key)
                del keys[i]
                del nodes[p.key]
                p.absorbed = True

    # -- candidate insertion with dominance (map.c:1641-1767) ----------------

    def _consider(self, ar, h: _Node, bread_global, comp):
        ab = h.orig.apos - self.kmer
        bb = h.orig.bpos - self.kmer
        ae = h.apos
        be = h.bpos
        length = _chain_length(h)
        jumps = []
        g = h
        f = h.frm
        while f is not None:
            jumps.append((g.apos - f.apos, g.bpos - f.bpos))
            g = f
            f = f.frm
        self._push_candidate(ar, h.cost, ab, ae, bb, be, length, jumps,
                             bread_global, comp)

    def _push_candidate(self, ar, cost, ab, ae, bb, be, length, jumps,
                        bread_global, comp):
        if self.profile:
            cnt = self.cover[ar]
            tb = ab // self.spacing
            te = (ae - 1) // self.spacing + 1
            if cnt[tb] < 0x7FFF and cnt[te] > -0xFFFF:
                cnt[tb] += 1
                cnt[te] -= 1

        stack = self.cands[ar]
        d = 0
        dominated = False
        while d < len(stack):
            D = stack[d]
            in_a = D.afirst < ab + MIN_PIECE and D.alast > ae - MIN_PIECE
            in_b = ab < D.afirst + MIN_PIECE and ae > D.alast - MIN_PIECE
            if in_a:
                if in_b:
                    if .9 * D.score >= cost:
                        dominated = True
                        break
                    elif D.score <= .9 * cost:
                        del stack[d]
                    else:
                        d += 1
                else:
                    if .9 * D.score >= cost:
                        dominated = True
                        break
                    d += 1
            else:
                if in_b:
                    if D.score <= .9 * cost:
                        del stack[d]
                    else:
                        d += 1
                else:
                    d += 1
        if dominated:
            return

        stack.insert(0, Candidate(score=cost, bread=bread_global, comp=comp,
                                  afirst=ab, alast=ae, bfirst=bb, blast=be,
                                  length=length, jumps=jumps))

    # -- public entry --------------------------------------------------------

    def process_hits(self, hits, bstart: int, comp: int,
                     native: bool = True, device: bool = False) -> None:
        """Chain all hits of one Match_Filter pass (one ref block, one
        orientation).  hits must be sorted by (aread, bread, apos).

        device=True runs the batched XLA sweep (ops.chain_jax) for groups
        within its capacity and the native sweep for the rest — identical
        results either way.  native=True uses the C++ sweep
        (damapper_tpu/native/chain_sweep.cpp); falls back to the Python
        sweep if the native library cannot be built."""
        n = len(hits)
        if n == 0:
            return
        if device:
            self._process_hits_device(hits, bstart, comp)
            return
        if native:
            try:
                self._process_hits_native(hits, bstart, comp)
                return
            except (OSError, ImportError, FileNotFoundError):
                pass
        aread, bread = hits.aread, hits.bread
        apos1 = hits.apos + 1           # 1-based end coords (map.c:1784)
        bpos1 = apos1 - hits.diag
        # group boundaries on (aread, bread)
        brk = np.flatnonzero((np.diff(aread.astype(np.int64)) != 0) |
                             (np.diff(bread.astype(np.int64)) != 0)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [n]])
        for s, e in zip(starts, ends):
            ar = int(aread[s])
            br = int(bread[s])
            scan = self._sweep_group(apos1[s:e], bpos1[s:e])
            for h in scan:
                if h.cost >= self.hithr and h.orig.best is h:
                    self._consider(ar, h, br + bstart, comp)

    def _process_hits_native(self, hits, bstart: int, comp: int) -> None:
        import ctypes

        from ..native import chain_lib

        lib = chain_lib()
        aread = np.ascontiguousarray(hits.aread, np.int32)
        bread = np.ascontiguousarray(hits.bread, np.int32)
        apos1 = np.ascontiguousarray(hits.apos + 1, np.int32)
        bpos1 = np.ascontiguousarray(apos1 - hits.diag, np.int32)
        h = lib.chain_sweep(len(aread),
                            aread.ctypes.data, bread.ctypes.data,
                            apos1.ctypes.data, bpos1.ctypes.data, self.kmer)
        try:
            nmeta = lib.result_meta_len(h)
            if nmeta == 0:
                return
            meta = np.ctypeslib.as_array(lib.result_meta(h),
                                         shape=(nmeta,)).reshape(-1, 8)
            njmp = lib.result_jumps_len(h)
            jarr = np.ctypeslib.as_array(lib.result_jumps(h),
                                         shape=(njmp,)) if njmp else \
                np.zeros(0, np.int32)
            cur = 0
            for row in meta:
                ar, br, cost, ab, ae, bb, be, length = (int(x) for x in row)
                # jump pairs = number of remaining links after compression
                npairs = 0
                j = cur
                # count pairs: they equal the compressed-chain link count
                npairs = length
                jumps = [(int(jarr[2 * p + j]), int(jarr[2 * p + j + 1]))
                         for p in range(npairs)]
                cur += 2 * npairs
                self._push_candidate(ar, cost, ab, ae, bb, be, length, jumps,
                                     br + bstart, comp)
        finally:
            lib.result_free(h)

    def _process_hits_device(self, hits, bstart: int, comp: int) -> None:
        """Batched XLA sweep for bucketable groups + native sweep for
        oversized ones, candidates pushed in exact group order."""
        from . import chain_jax

        aread, bread = hits.aread, hits.bread
        apos1 = np.ascontiguousarray(hits.apos + 1, np.int32)
        bpos1 = np.ascontiguousarray(apos1 - hits.diag, np.int32)
        n = len(apos1)
        brk = np.flatnonzero((np.diff(aread.astype(np.int64)) != 0) |
                             (np.diff(bread.astype(np.int64)) != 0)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [n]])

        dev = chain_jax.sweep_hits_device(apos1, bpos1, starts, ends,
                                          self.kmer)

        # native sweep over the concatenation of oversized groups (group
        # order preserved; the native library segments by (aread, bread))
        big = [gi for gi in range(len(starts)) if gi not in dev]
        big_res: dict[int, list] = {}
        if big:
            rows = np.concatenate([np.arange(starts[gi], ends[gi])
                                   for gi in big])
            big_res = self._native_sweep_rows(
                aread[rows], bread[rows], apos1[rows], bpos1[rows], big)

        for gi in range(len(starts)):
            s, e = int(starts[gi]), int(ends[gi])
            ar = int(aread[s])
            br = int(bread[s])
            if gi in dev:
                ems = chain_jax.emit_group(dev[gi], apos1[s:e], bpos1[s:e],
                                           e - s, self.kmer, self.hithr)
            else:
                ems = big_res.get(gi, [])
            for (cost, ab, ae, bb, be, length, jumps) in ems:
                if cost >= self.hithr:
                    self._push_candidate(ar, cost, ab, ae, bb, be, length,
                                         jumps, br + bstart, comp)

    def _native_sweep_rows(self, aread, bread, apos1, bpos1, gis):
        """Run the native sweep over selected rows; returns
        {group_index: [(cost, ab, ae, bb, be, length, jumps), ...]}."""
        from ..native import chain_lib

        lib = chain_lib()
        aread = np.ascontiguousarray(aread, np.int32)
        bread = np.ascontiguousarray(bread, np.int32)
        apos1 = np.ascontiguousarray(apos1, np.int32)
        bpos1 = np.ascontiguousarray(bpos1, np.int32)
        h = lib.chain_sweep(len(aread), aread.ctypes.data, bread.ctypes.data,
                            apos1.ctypes.data, bpos1.ctypes.data, self.kmer)
        out: dict[int, list] = {}
        try:
            nmeta = lib.result_meta_len(h)
            if nmeta == 0:
                return out
            meta = np.ctypeslib.as_array(lib.result_meta(h),
                                         shape=(nmeta,)).reshape(-1, 8)
            njmp = lib.result_jumps_len(h)
            jarr = np.ctypeslib.as_array(lib.result_jumps(h),
                                         shape=(njmp,)) if njmp else \
                np.zeros(0, np.int32)
            # map (ar, br) -> group index (each (ar, br) is one group)
            keymap = {}
            gi_iter = iter(gis)
            seen = set()
            for i in range(len(aread)):
                k = (int(aread[i]), int(bread[i]))
                if k not in seen:
                    seen.add(k)
                    keymap[k] = next(gi_iter)
            cur = 0
            for row in meta:
                ar, br, cost, ab, ae, bb, be, length = (int(x) for x in row)
                jumps = [(int(jarr[cur + 2 * p]), int(jarr[cur + 2 * p + 1]))
                         for p in range(length)]
                cur += 2 * length
                out.setdefault(keymap[(ar, br)], []).append(
                    (cost, ab, ae, bb, be, length, jumps))
        finally:
            lib.result_free(h)
        return out
