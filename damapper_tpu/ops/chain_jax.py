"""Device (XLA) chain DP: the batched equivalent of the splay-tree seed
chaining sweep (reference chain_thread map.c:1020-1922).

The host implementations (ops.chain._sweep_group / native/chain_sweep.cpp)
process one (aread, bread) group's hits sequentially with an ordered active
set.  The queries made per hit are order statistics over the set of LIVE
nodes (those within MAX_GAP of the sweep position, not absorbed):

  pred  = smallest (diag, apos) key > new with bpos >= bpos - MAX_GAP,
  left  = largest-apos live node on pred's diagonal,
  succ  = largest key < new with bpos <= bpos.

Since hits arrive sorted by apos, "within MAX_GAP" is a sliding window over
the hit array, so liveness needs no ordered container at all: the step for
hit i is a handful of masked reductions over the group's arrays.  The sweep
becomes a `lax.scan` of O(C) vector steps, vmapped over many groups padded
to a common capacity C (bucketed by group size).  Per-group results are
bit-exact with the host sweep (integer absorb rule 5*|ddiag| <= dapos is
exact for the reference's `|ddiag| <= .2*dapos` float comparison).

The candidate dominance stack (map.c:1668-1766) stays on host: it is
inherently order-dependent across reference blocks and costs O(candidates),
not O(hits).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .chain import MAX_GAP

_I32MAX = np.int32(0x7FFFFFFF)
_I32MIN = np.int32(-0x80000000)


@functools.partial(jax.jit, static_argnames=("kmer",))
def _sweep_bucket(apos, bpos, nvalid, kmer: int):
    """Vmapped chain sweep over one bucket of padded groups.

    apos/bpos: int32[L, C] 1-based hit coordinates, ascending apos per lane
               (padding after nvalid entries).
    nvalid:    int32[L] live hits per lane.
    Returns per-hit state arrays int32[L, C]:
      cost, frm (-1 = origin), orig, best (per-ORIGIN best node index),
      absorbed, expired (flagged at expiry with the best check), estep
      (step index at which the node expires; >= C means never).
    """

    def lane(ap_v, bp_v, nv):
        C = ap_v.shape[0]
        idx = jnp.arange(C, dtype=jnp.int32)
        valid = idx < nv
        big = jnp.where(valid, ap_v, _I32MAX)
        dg_v = ap_v - bp_v
        # first step i whose apos exceeds apos[j] + MAX_GAP (strict >,
        # matching `queue[head].apos < apos - MAX_GAP`)
        estep = jnp.searchsorted(big, jnp.where(
            valid, ap_v + MAX_GAP, _I32MAX), side="right").astype(jnp.int32)
        estep = jnp.where(valid, estep, C + 1)

        def step(carry, i):
            cost, frm, orig, best, absorbed, expired = carry
            ap = ap_v[i]
            bp = bp_v[i]
            dg = dg_v[i]

            # flag nodes expiring at this step whose chain-best they are
            # (pad steps must not expire anyone: the host sweep stops at
            # the group's last live hit)
            expiring = (estep == i) & (idx < i) & ~absorbed & valid & valid[i]
            isbest = best[orig] == idx
            expired = expired | (expiring & isbest)

            live = (idx < i) & (estep > i) & ~absorbed & valid
            keygt = (dg_v > dg) | ((dg_v == dg) & (ap_v > ap))
            keylt = (dg_v < dg) | ((dg_v == dg) & (ap_v < ap))

            thr = bp - MAX_GAP
            # pred: min key among live, key>new, bpos >= thr
            cl = live & keygt & (bp_v >= thr)
            dmin = jnp.min(jnp.where(cl, dg_v, _I32MAX))
            cld = cl & (dg_v == dmin)
            amin = jnp.min(jnp.where(cld, ap_v, _I32MAX))
            l = jnp.argmax(cld & (ap_v == amin)).astype(jnp.int32)
            has_l = cl.any()
            # leftmost: largest-apos live node on l's diagonal
            cll = live & (dg_v == dmin)
            amax = jnp.max(jnp.where(cll, ap_v, _I32MIN))
            l2 = jnp.argmax(cll & (ap_v == amax)).astype(jnp.int32)
            l = jnp.where(has_l, l2, l)

            # succ: max key among live, key<new, bpos <= bp
            cr = live & keylt & (bp_v <= bp)
            dmax = jnp.max(jnp.where(cr, dg_v, _I32MIN))
            crd = cr & (dg_v == dmax)
            armax = jnp.max(jnp.where(crd, ap_v, _I32MIN))
            r = jnp.argmax(crd & (ap_v == armax)).astype(jnp.int32)
            has_r = cr.any()

            adv_l = jnp.minimum(jnp.int32(kmer), ap - ap_v[l])
            adv_r = jnp.minimum(jnp.int32(kmer), bp - bp_v[r])
            lcost = jnp.where(has_l, cost[l] + adv_l, 0)
            rcost = jnp.where(has_r, cost[r] + adv_r, 0)
            use_l = (lcost > rcost) & (lcost > 0)
            use_r = ~use_l & (rcost > 0)

            p = jnp.where(use_l, l, r)
            ext = use_l | use_r
            ncost = jnp.where(use_l, lcost, rcost)

            porig = jnp.where(frm[p] < 0, p, orig[p])
            new_cost = jnp.where(ext, ncost, jnp.int32(kmer))
            new_orig = jnp.where(ext, porig, i)
            new_frm = jnp.where(ext, p, jnp.int32(-1))

            cost = cost.at[i].set(jnp.where(valid[i], new_cost, 0))
            frm = frm.at[i].set(jnp.where(valid[i], new_frm, -1))
            orig = orig.at[i].set(jnp.where(valid[i], new_orig, i))

            improved = ext & (ncost >= cost[best[porig]]) & valid[i]
            best = best.at[porig].set(
                jnp.where(improved, i, best[porig]))
            dd = jnp.abs(dg_v[p] - dg)
            da = ap - ap_v[p]
            absorb = improved & (5 * dd <= da)
            absorbed = absorbed.at[p].set(
                jnp.where(absorb, True, absorbed[p]))
            return (cost, frm, orig, best, absorbed, expired), None

        init = (jnp.zeros(C, jnp.int32), jnp.full(C, -1, jnp.int32),
                idx, idx, jnp.zeros(C, bool), jnp.zeros(C, bool))
        (cost, frm, orig, best, absorbed, expired), _ = lax.scan(
            step, init, jnp.arange(C, dtype=jnp.int32))
        return (cost, frm, orig, best, absorbed.astype(jnp.int32),
                expired.astype(jnp.int32), estep)

    return jax.vmap(lane)(apos, bpos, nvalid)


# host-side cache of per-bucket jitted entry points is implicit via jax.jit
_MAXC = 2048      # groups above this route to the host sweep


def sweep_hits_device(apos1: np.ndarray, bpos1: np.ndarray,
                      starts: np.ndarray, ends: np.ndarray, kmer: int):
    """Run the chain sweep on device for all groups of size <= _MAXC.

    apos1/bpos1: 1-based hit coordinates (global arrays over all groups).
    Returns dict group_index -> per-group host state tuple
      (cost, frm, orig, best, absorbed, expired, estep), each np.int32[G],
    for device-routed groups; larger groups are absent (host fallback)."""
    sizes = ends - starts
    out: dict[int, tuple] = {}
    # bucket by capacity class
    buckets: dict[int, list[int]] = {}
    for gi, sz in enumerate(sizes):
        if sz > _MAXC:
            continue
        cap = max(8, 1 << int(sz - 1).bit_length())
        buckets.setdefault(cap, []).append(gi)

    for cap, gis in buckets.items():
        # lane count padded to a power-of-two class so each (L, C) pair
        # compiles once (padded lanes are empty groups)
        L = max(8, 1 << int(len(gis) - 1).bit_length())
        ap = np.zeros((L, cap), np.int32)
        bp = np.zeros((L, cap), np.int32)
        nv = np.zeros(L, np.int32)
        for li, gi in enumerate(gis):
            s, e = starts[gi], ends[gi]
            g = e - s
            ap[li, :g] = apos1[s:e]
            bp[li, :g] = bpos1[s:e]
            # padding apos must sort after all live entries for searchsorted
            ap[li, g:] = _I32MAX
            nv[li] = g
        cost, frm, orig, best, absorbed, expired, estep = (
            np.asarray(x) for x in _sweep_bucket(
                jnp.asarray(ap), jnp.asarray(bp), jnp.asarray(nv), kmer))
        for li, gi in enumerate(gis):
            g = int(nv[li])
            out[gi] = (cost[li, :g], frm[li, :g], orig[li, :g],
                       best[li, :g], absorbed[li, :g], expired[li, :g],
                       estep[li, :g])
    return out


def emit_group(state, apos1, bpos1, gsize: int, kmer: int, hithr: int):
    """Reproduce the end-of-group scan + candidate emission from device
    state: yields (cost, ab, ae, bb, be, length, jumps) in the host sweep's
    exact order (active set by decreasing key, then expiries in REVERSE
    queue order — the reference prepends each expiring node so its expired
    list is LIFO, map.c:1790-1794; chain_length same-diagonal compression
    applied)."""
    cost, frm, orig, best, absorbed, expired, estep = state
    diag = apos1 - bpos1
    active = (~absorbed.astype(bool)) & (estep >= gsize)
    act_idx = np.flatnonzero(active)
    # decreasing (diag, apos) order
    order = np.lexsort((-apos1[act_idx], -diag[act_idx]))
    scan = list(act_idx[order]) + list(np.flatnonzero(expired)[::-1])

    res = []
    frm_l = frm.copy()      # chain_length mutates links
    for h in scan:
        if cost[h] < hithr or best[orig[h]] != h:
            continue
        # chain_length compression (map.c:1243-1260)
        n = 0
        x = h
        y = frm_l[x]
        while y >= 0:
            da = apos1[x] - apos1[y]
            if da == bpos1[x] - bpos1[y] and da < 100:
                y = frm_l[x] = frm_l[y]
            else:
                n += 1
                x = y
                y = frm_l[x]
        jumps = []
        g = h
        f = frm_l[g]
        while f >= 0:
            jumps.append((int(apos1[g] - apos1[f]),
                          int(bpos1[g] - bpos1[f])))
            g = f
            f = frm_l[g]
        o = orig[h]
        res.append((int(cost[h]), int(apos1[o]) - kmer, int(apos1[h]),
                    int(bpos1[o]) - kmer, int(bpos1[h]), n, jumps))
    return res
