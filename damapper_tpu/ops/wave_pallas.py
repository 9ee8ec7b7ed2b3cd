"""Pallas/Mosaic wave segment kernel: the production TPU compute path.

The XLA while-loop engine (wave_jax) pays hundreds of microseconds per wave
on this backend; the same loop compiled as ONE Mosaic kernel runs at
~microsecond waves because the band state never leaves VMEM.  Design:

 * The per-wave body of the O(nd) trace-point wave (reference
   align.c:353-1946; semantics identical to damapper_tpu.ops.wave_jax) is
   restructured as a lane-masked PHASE MACHINE over groups of G lanes so
   every loop condition reduces to a scalar (Mosaic requires scalar `scf`
   conditions):

     phase 0 -> wave start: band expand, border init, pick3 inheritance,
                snake init                                  [masked per lane]
     phase 1 -> one snake step per iteration (match-plane lookup, <=16
                columns); when a lane's snake completes it runs the
                post-wave block (clips, pebble drops, best/trim triggers,
                stores, band prune) and returns to phase 0  [masked]

 * Everything a Mosaic kernel cannot do on this toolchain is hoisted to an
   outer XLA driver loop that calls the kernel repeatedly ("segments"):
     - match-plane (re)loads from the big sequence arrays (manual DMA is
       unavailable): a lane whose snake leaves its windows STALLS and the
       driver rebuilds its planes (stall_reload),
     - the boundary-clip REACH test, which reads one sequence byte per side
       (stall_rest),
     - pebble-pool writes: drops append to a small per-segment buffer with
       globally consistent pool indices; the driver scatters the buffer
       into the pool between segments (stall_dbuf when full).
   A segment runs until every lane is stalled or finished, so the kernel
   typically executes hundreds of waves per launch.

 * The wave-0 prologue (seed snake, initial pebbles, initial clip) runs in
   the driver (XLA) once per batch - it is tiny and needs raw sequence
   access.

Outputs are bit-identical to wave_jax/_host (same trim/more selection, same
pebble chains); the differential tests drive all three.
"""

from __future__ import annotations

import functools
import os
import pathlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .spec import PATH_LEN, TRIM_LEN, TRIM_MLAG, WAVE_LAG

INT32_MAX = np.int32(0x7FFFFFFF)
NEG_BIG = -np.int32(0x40000000)
THI_MASK = np.uint32((1 << 29) - 1)
PATH_TOP_HI_BIT = 28
SS = int(os.environ.get('DAMAPPER_WAVE_SS', 16))  # snake cols per phase-1 iter
if SS != 16:
    import sys as _sys
    print("damapper_tpu: DAMAPPER_WAVE_SS != 16 is only validated on the "
          "XLA twin; SS=32 is known to MISCOMPILE on the Mosaic toolchain "
          "(docs/MOSAIC_ISSUES.md #5)", file=_sys.stderr)

i32 = jnp.int32
u32 = jnp.uint32


# ---------------------------------------------------------------------------
# state container: a flat dict of (G|B, ...) arrays (order matters for the
# pallas call plumbing)
# ---------------------------------------------------------------------------

BAND_I32 = ("V", "M", "NA", "NB", "HA", "HB", "MA", "MB",
            "sy", "sm", "wha", "whb", "wma", "wmb",
            "ltk", "ltc", "lty", "ltha", "lthb")
#   lt*: lazy per-slot trim candidates — the driver epilogue extracts the
#   (dif, rel)-max slot instead of the kernel paying one-hot reductions
#   per wave (reference align.c trim updates, leftmost-trigger semantics)
TRIM_RB = 10     # rel bits in the lazy-trim ordering key (W <= 512)
BAND_U32 = ("Thi", "Tlo", "sthi", "stlo")
BAND_MSK = ("sact", "sca", "scb")          # stored i32 0/1
SCALARS = ("low", "hgh", "dif", "more", "besta", "besty", "lasta",
           "trima", "trimy", "trimd", "trimha", "trimhb",
           "morem", "morea", "morey", "mored", "moreha", "morehb",
           "overflow", "avail", "banchor", "kanchor",
           "phase", "live", "stall_reload", "stall_rest", "stall_dbuf",
           "dcnt", "abase", "bbase", "aoffp", "boffp", "kit")
PLANES = ("mstopN", "mb4N", "ma4N", "mstopW", "mb4W", "ma4W")
#   bitmask match planes, (.., (BW//32)*W) u32 in q-major layout (word q of
#   band slot w at column q*W + w): bit j%32 of word j//32 set when column
#   j of the slot's window is a stop / b-sentinel / a-sentinel.  q-major
#   keeps each word plane a contiguous (G, W) slice and the minor dim a
#   multiple of the 128-lane tile
DBUFS = ("dbuf",)    # (.., 4*DBUF) i32 SoA plane [h | k | d | n]
DRANK = int(os.environ.get("DAMAPPER_WAVE_DRANK", 2))  # drop ranks/trip

ORDER = BAND_I32 + BAND_U32 + BAND_MSK + SCALARS + PLANES + DBUFS

# persistent-kernel variant (make_persistent_driver): the match planes are
# 3D code planes REBUILT INSIDE the kernel (carried through the in-kernel
# driver loop, never operands), and two extra per-lane scalars map global
# sequence positions into the lane's VMEM-resident window
PLANES3D = ("codeN", "codeW")              # (.., W, BW) i32
PSCALARS = SCALARS + ("awst", "bwst", "oit")
PORDER = BAND_I32 + BAND_U32 + BAND_MSK + PSCALARS + DBUFS


def state_arrays(n, W, BW, DBUF):
    st = {}
    for nm in BAND_I32:
        st[nm] = jnp.zeros((n, W), i32)
    for nm in BAND_U32:
        st[nm] = jnp.zeros((n, W), u32)
    for nm in BAND_MSK:
        st[nm] = jnp.zeros((n, W), i32)
    for nm in SCALARS:
        st[nm] = jnp.zeros((n,), i32)
    for nm in PLANES:
        st[nm] = jnp.zeros((n, (BW // 32) * W), u32)
    st["dbuf"] = jnp.zeros((n, 4 * DBUF), i32)
    return st


# ---------------------------------------------------------------------------
# packed-operand plumbing (DAMAPPER_WAVE_PACKOPS=1): the per-launch fixed
# cost of a Mosaic custom call scales with its operand list (each aliased
# operand pays a layout boundary).  Packing the state into FOUR contiguous
# buffers — i32 band rows, u32 band rows (+ bitmask planes), per-lane
# scalar columns, drop buffer — cuts ~60 operands to 4 without touching
# kernel semantics: the kernel slices the packs with static offsets.
# ---------------------------------------------------------------------------


def _mk_packer(W, BWW, scalar_names, with_planes):
    i32_names = BAND_I32 + BAND_MSK
    u32w_names = BAND_U32
    plane_names = PLANES if with_planes else ()

    def pack(st):
        bi = jnp.concatenate([st[nm] for nm in i32_names], axis=1)
        bu = jnp.concatenate([st[nm] for nm in u32w_names]
                             + [st[nm] for nm in plane_names], axis=1)
        sc = jnp.stack([st[nm] for nm in scalar_names], axis=1)
        return bi, bu, sc

    def unpack(bi, bu, sc):
        st = {}
        off = 0
        for nm in i32_names:
            st[nm] = bi[:, off:off + W]
            off += W
        off = 0
        for nm in u32w_names:
            st[nm] = bu[:, off:off + W]
            off += W
        for nm in plane_names:
            st[nm] = bu[:, off:off + BWW * W]
            off += BWW * W
        for k, nm in enumerate(scalar_names):
            st[nm] = sc[:, k:k + 1][:, 0]
        return st

    def store(bi_ref, bu_ref, sc_ref, res):
        off = 0
        for nm in i32_names:
            bi_ref[:, off:off + W] = res[nm]
            off += W
        off = 0
        for nm in u32w_names:
            bu_ref[:, off:off + W] = res[nm]
            off += W
        for nm in plane_names:
            bu_ref[:, off:off + BWW * W] = res[nm]
            off += BWW * W
        for k, nm in enumerate(scalar_names):
            sc_ref[:, k:k + 1] = res[nm][:, None]

    return pack, unpack, store


# ---------------------------------------------------------------------------
# lane-packed state plumbing (DAMAPPER_WAVE_LANEPACK=1): (B, ...) unpacked
# driver state <-> (B//2, ...) lane-packed kernel state.  XLA-side reshapes
# only; the kernel sees two wave lanes per vreg row (see make_segment).
# ---------------------------------------------------------------------------


def _lp_pack_state(st, W):
    out = {}
    for nm, v in st.items():
        if nm in PLANES:
            B, QW = v.shape
            Q = QW // W
            out[nm] = v.reshape(B // 2, 2, Q, W).transpose(0, 2, 1, 3) \
                       .reshape(B // 2, Q * 2 * W)
        elif v.ndim == 1:               # per-lane scalar -> half-broadcast
            B = v.shape[0]
            out[nm] = jnp.broadcast_to(v.reshape(B // 2, 2, 1),
                                       (B // 2, 2, W)) \
                         .reshape(B // 2, 2 * W)
        else:   # band row / dbuf plane: lanes pair up side by side
            B = v.shape[0]
            out[nm] = v.reshape(B // 2, 2 * v.shape[1])
    return out


def _lp_unpack_state(st, W):
    out = {}
    for nm, v in st.items():
        if nm in PLANES:
            B2, QW2 = v.shape
            Q = QW2 // (2 * W)
            out[nm] = v.reshape(B2, Q, 2, W).transpose(0, 2, 1, 3) \
                       .reshape(B2 * 2, Q * W)
        elif nm in PSCALARS:            # superset of SCALARS
            B2 = v.shape[0]
            out[nm] = v.reshape(B2, 2, W)[:, :, 0].reshape(B2 * 2)
        else:
            B2 = v.shape[0]
            out[nm] = v.reshape(B2 * 2, v.shape[1] // 2)
    return out


def _mk_packer_lp(WR, BWW, scalar_names=None, with_planes=True):
    """Operand fusion for the lane-packed kernel: every state field is a
    2D row (scalars included), so the whole state fits TWO aliased
    operands (i32, u32) plus the drop buffer."""
    if scalar_names is None:
        scalar_names = SCALARS
    i32_names = BAND_I32 + BAND_MSK + scalar_names
    u32_names = BAND_U32
    plane_names = PLANES if with_planes else ()

    def pack(st):
        bi = jnp.concatenate([st[nm] for nm in i32_names], axis=1)
        bu = jnp.concatenate([st[nm] for nm in u32_names]
                             + [st[nm] for nm in plane_names], axis=1)
        return bi, bu

    def unpack(bi, bu):
        st = {}
        off = 0
        for nm in i32_names:
            st[nm] = bi[:, off:off + WR]
            off += WR
        off = 0
        for nm in u32_names:
            st[nm] = bu[:, off:off + WR]
            off += WR
        for nm in plane_names:
            st[nm] = bu[:, off:off + BWW * WR]
            off += BWW * WR
        return st

    def store(bi_ref, bu_ref, res):
        off = 0
        for nm in i32_names:
            bi_ref[:, off:off + WR] = res[nm]
            off += WR
        off = 0
        for nm in u32_names:
            bu_ref[:, off:off + WR] = res[nm]
            off += WR
        for nm in plane_names:
            bu_ref[:, off:off + BWW * WR] = res[nm]
            off += BWW * WR

    return pack, unpack, store


# ---------------------------------------------------------------------------
# the segment step: pure jnp over (G, ...) arrays with scalar-cond whiles.
# Runs identically under plain XLA (used by the CPU tests) and inside the
# pallas kernel.
# ---------------------------------------------------------------------------


def _mk_lane_ops(W, lanepack):
    """Layout algebra shared by the segment body and the persistent-kernel
    reload: per-lane broadcast, within-band ring rolls, and per-lane
    reductions, for the unpacked (G, W) and lane-packed (G, 2W) layouts.

    lanepack: TWO wave lanes ride one vreg row.  Band arrays are
    (G, 2W) with lane 2g in columns [0, W) and lane 2g+1 in [W, 2W);
    per-lane scalars are HALF-BROADCAST rows of the same shape (every
    column of a half holds the lane's value, so scalar/band arithmetic
    stays elementwise); reductions become within-half butterflies and
    the ring rolls become within-half rolls.  At W=64 this fills the
    128-lane vreg minor dim that the unpacked layout leaves half empty."""
    Wm = W - 1
    WR = 2 * W if lanepack else W

    class L:
        pass

    if lanepack:
        def slots():
            return jax.lax.broadcasted_iota(i32, (1, WR), 1) & Wm

        def b2(x):                   # lane value is already a row
            return x

        def b2w(x):                  # lane value over the 2*WR drop row
            return jnp.concatenate([x, x], axis=1)

        def rollW(arr, s):           # circular roll within each W half
            t = s % W
            if t == 0:
                return arr
            return jnp.where(slots() >= t, jnp.roll(arr, t, axis=1),
                             jnp.roll(arr, t - W, axis=1))

        def _butterfly(v, op):
            s = 1
            while s < W:
                v = op(v, rollW(v, s))
                s *= 2
            return v

        def rmax(v):
            return _butterfly(v, jnp.maximum)

        def rmin(v):
            return _butterfly(v, jnp.minimum)

        def rsum(v):
            return _butterfly(v, jnp.add)

        def rany(v):
            return _butterfly(v.astype(i32), jnp.bitwise_or) != 0
    else:
        def slots():
            return jax.lax.broadcasted_iota(i32, (1, W), 1)

        def b2(x):
            return x[:, None]        # (G,) -> (G,1)

        def b2w(x):
            return x[:, None]

        def rollW(arr, s):
            return jnp.roll(arr, s, axis=1)

        def rmax(v):
            return jnp.max(v, axis=1)

        def rmin(v):
            return jnp.min(v, axis=1)

        def rsum(v):
            return jnp.sum(v, axis=1)

        def rany(v):
            return v.any(axis=1)

    L.WR, L.slots, L.b2, L.b2w, L.rollW = WR, slots, b2, b2w, rollW
    L.rmax, L.rmin, L.rsum, L.rany = rmax, rmin, rsum, rany
    return L


def make_segment(W, BW, P, DBUF, reverse, planes3d=False, lanepack=False):
    Wm = W - 1
    assert (2 * W if lanepack else W) <= 1023, \
        "packed liveness fields hold counts up to 1023"
    sgn = -1 if reverse else 1
    BIGC = np.int32(1 << 30)
    # DEBUG ONLY (tools/wave_kit.py cost attribution): comma-separated
    # body parts to skip — breaks parity, never set in production.  Read
    # at trace time; _cached_driver keys don't include it, so use one
    # setting per process.
    _ablate = set(filter(None, os.environ.get(
        "DAMAPPER_WAVE_ABLATE", "").split(",")))
    # every lax.cond branch body is per-lane masked, so the conds are pure
    # skip-work optimizations; DAMAPPER_WAVE_NOCOND=1 executes the bodies
    # unconditionally instead (semantics identical) to measure whether the
    # cond nodes themselves carry a fixed Mosaic cost
    _nocond = os.environ.get("DAMAPPER_WAVE_NOCOND", "0") == "1"

    def _maybe_cond(pred, true_fn, false_fn):
        if _nocond:
            return true_fn(0)
        return jax.lax.cond(pred, true_fn, false_fn, 0)
    plane_keys = PLANES3D if planes3d else PLANES
    lo = _mk_lane_ops(W, lanepack)
    WR = lo.WR
    b2, b2w, rollW = lo.b2, lo.b2w, lo.rollW
    rmax, rmin, rsum, rany = lo.rmax, lo.rmin, lo.rsum, lo.rany

    def seg(st, ts, pave, msc, dsc):
        TS = ts
        # the match planes are READ-ONLY within a segment: keep them out of
        # the while carry (a carried (G, W, BW) buffer pair is ~0.5MB that
        # Mosaic would shuffle every iteration) and close over them instead
        st = dict(st)
        _planes = {nm: st.pop(nm) for nm in plane_keys}
        # index vectors built in-trace (a pallas kernel cannot capture
        # closure arrays)
        slots1 = lo.slots()
        jidx = jax.lax.broadcasted_iota(i32, (1, 1, BW), 2)
        if not reverse:
            offN_vec = slots1
        else:
            offN_vec = jnp.where(slots1 == 0, W, W - slots1)

        def seg_cond(st):
            run = (st["live"] == 1) & (st["stall_reload"] == 0) & \
                  (st["stall_rest"] == 0) & (st["stall_dbuf"] == 0)
            return run.any()

        def seg_body(st):
            st = dict(st, kit=st["kit"] + 1)
            G = st["V"].shape[0]
            lane_run = (st["live"] == 1) & (st["stall_reload"] == 0) & \
                       (st["stall_rest"] == 0) & (st["stall_dbuf"] == 0)

            # ---------------- phase A: start a wave --------------------
            # reserve drop-buffer room for a full wave (a wave's drops are
            # bounded by the window span / trace spacing, << 64)
            want_start = lane_run & (st["phase"] == 0)
            room = st["dcnt"] <= DBUF - 64
            stall_dbuf = jnp.where(want_start & ~room, 1, st["stall_dbuf"])
            sA = want_start & room
            low = jnp.where(sA, st["low"] - 1, st["low"])
            hgh = jnp.where(sA, st["hgh"] + 1, st["hgh"])
            dif = jnp.where(sA, st["dif"] + 1, st["dif"])
            ovf = jnp.where(sA & ((hgh - low + 4 >= W) |
                                  (st["avail"] + W >= P)),
                            1, st["overflow"])

            k = b2(low) + jnp.remainder(slots1 - b2(low), W)
            in_band = k <= b2(hgh)
            fill = i32(INT32_MAX) if reverse else i32(NEG_BIG)
            sAb = b2(sA)

            def _phaseA(_):
                V, NA, NB = st["V"], st["NA"], st["NB"]
                sl = b2(low & Wm)
                sh = b2(hgh & Wm)
                is_sl = slots1 == sl
                is_sh = slots1 == sh

                V = jnp.where(sAb & (is_sl | is_sh), fill, V)
                # border inheritance from the ring-adjacent slot: the value
                # at (low+1)&Wm IS slot sl's ring successor (and (hgh-1)&Wm
                # slot sh's predecessor), so ring rolls replace the four
                # one-hot reductions (a reduction costs ~10x a roll here)
                NA = jnp.where(sAb & is_sl, rollW(NA, -1),
                               jnp.where(sAb & is_sh, rollW(NA, 1), NA))
                NB = jnp.where(sAb & is_sl, rollW(NB, -1),
                               jnp.where(sAb & is_sh, rollW(NB, 1), NB))

                Vm = jnp.where(in_band, V, fill)
                ap = rollW(Vm, -1)
                am = rollW(Vm, 1)
                ac = Vm
                if not reverse:
                    lt = ac < am
                    pickP = (lt & (am < ap)) | (~lt & (ac < ap))
                    pickM = lt & ~pickP
                    c0 = jnp.where(pickP, ap + 1,
                                   jnp.where(pickM, am + 1, ac + 2))
                else:
                    gt = ac > ap
                    pickM = (gt & (ap > am)) | (~gt & (ac > am))
                    pickP = gt & ~pickM
                    c0 = jnp.where(pickM, am - 1,
                                   jnp.where(pickP, ap - 1, ac - 2))

                def pick3(arr):
                    return jnp.where(
                        pickP, rollW(arr, -1),
                        jnp.where(pickM, rollW(arr, 1), arr))

                m0 = pick3(st["M"])
                thi0 = pick3(st["Thi"])
                tlo0 = pick3(st["Tlo"])
                ha0 = pick3(st["HA"])
                hb0 = pick3(st["HB"])
                ma0 = pick3(st["MA"])
                mb0 = pick3(st["MB"])

                top = (thi0 >> PATH_TOP_HI_BIT) & 1
                m0 = m0 - top.astype(i32)
                thi0 = ((thi0 << 1) | (tlo0 >> 31)) & THI_MASK
                tlo0 = tlo0 << 1
                y0 = jnp.right_shift(c0 - k, 1)

                return (jnp.where(sAb, y0, st["sy"]),
                        jnp.where(sAb, m0, st["sm"]),
                        jnp.where(sAb, thi0, st["sthi"]),
                        jnp.where(sAb, tlo0, st["stlo"]),
                        jnp.where(sAb, ha0, st["wha"]),
                        jnp.where(sAb, hb0, st["whb"]),
                        jnp.where(sAb, ma0, st["wma"]),
                        jnp.where(sAb, mb0, st["wmb"]),
                        jnp.where(sAb, in_band.astype(i32), st["sact"]),
                        jnp.where(sAb, 0, st["sca"]),
                        jnp.where(sAb, 0, st["scb"]),
                        V, NA, NB)

            def _phaseA_skip(_):
                return (st["sy"], st["sm"], st["sthi"], st["stlo"],
                        st["wha"], st["whb"], st["wma"], st["wmb"],
                        st["sact"], st["sca"], st["scb"],
                        st["V"], st["NA"], st["NB"])

            _pA = (jnp.bool_(False) if "phaseA" in _ablate else sA.any())
            (sy, sm, sthi, stlo, wha, whb, wma, wmb, sact, sca, scb,
             V, NA, NB) = _maybe_cond(_pA, _phaseA, _phaseA_skip)
            phase = jnp.where(sA, 1, st["phase"])

            # ---------------- phase S: one snake step ------------------
            sS = lane_run & (phase == 1)
            act = (sact == 1) & b2(sS)

            if not reverse:
                o = b2(st["bbase"]) + sy - b2(st["banchor"])
                off = k - b2(st["kanchor"])
            else:
                o = b2(st["banchor"]) - (b2(st["bbase"]) + sy - 1)
                off = b2(st["kanchor"]) - k
            wrap = off == offN_vec + W
            valid_off = (off == offN_vec) | wrap
            inv = act & (~valid_off | (o < 0) | (o > BW - SS))
            # slots outside the window wait; the lane stalls for a reload
            # only when NO active slot can advance (valid slots keep the
            # wave moving, raising the anchor for the next reload - gating
            # the whole lane on any invalid slot can deadlock when the
            # active span exceeds one window)
            usable = act & ~inv

            oc = jnp.clip(o, 0, BW - 1)
            if planes3d:
                # 3D code-plane lookup (persistent kernel: the planes are
                # built in-kernel and carried, so the dense (G, W, BW) form
                # is free of operand traffic; measured perf-equal to the
                # bitmask form at G=8)
                jm = jidx >= oc[:, :, None]
                wrap3 = wrap.astype(i32)[:, :, None] != 0
                csel = jnp.where(wrap3, _planes["codeW"], _planes["codeN"])
                r = jnp.min(jnp.where(jm, csel, BIGC), axis=2)
                found = r < BIGC
                jstar = jnp.where(found, r >> 2, BW)
                run = jstar - oc
                nst = jnp.where(usable, jnp.minimum(run, SS), 0)
                adv_done = usable & (run <= SS) & found
                sbv = ((r >> 1) & 1) == 1
                a4s = (r & 1) == 1
                sb = adv_done & sbv
                sa = adv_done & ~sbv & a4s
            else:
                # bitmask lookup: first stop column >= oc via word select +
                # per-element shift + lowest-set-bit (all (G, W)
                # elementwise; no (G, W, BW) tensors touch the kernel)
                q0 = oc >> 5
                b0 = (oc & 31).astype(u32)
                wrapm = wrap
                BWW = BW // 32

                def word(nm_n, nm_w, q):
                    wn = _planes[nm_n][:, q * WR:(q + 1) * WR]
                    ww = _planes[nm_w][:, q * WR:(q + 1) * WR]
                    return jnp.where(wrapm, ww, wn)

                BIGJ = i32(BW + 64)
                jstar = jnp.full_like(oc, BIGJ)
                for q in range(BWW):
                    wq = word("mstopN", "mstopW", q)
                    # keep only bits >= b0 in the word containing oc; whole
                    # word beyond it; nothing before it
                    keep = jnp.where(q0 == q, wq >> b0 << b0,
                                     jnp.where(q0 < q, wq, u32(0)))
                    lowbit = keep & (~keep + u32(1))
                    ctz = jax.lax.population_count(
                        lowbit - u32(1)).astype(i32)
                    cand = jnp.where(keep != 0, q * 32 + ctz, BIGJ)
                    jstar = jnp.minimum(jstar, cand)
                found = jstar < BIGJ
                jstar = jnp.where(found, jstar, BW)
                run = jstar - oc
                nst = jnp.where(usable, jnp.minimum(run, SS), 0)
                adv_done = usable & (run <= SS) & found
                # stop-cause flags read from the flag masks at column jstar
                jq = jnp.clip(jstar >> 5, 0, BWW - 1)
                jb = (jstar & 31).astype(u32)
                b4w = word("mb4N", "mb4W", 0)
                a4w = word("ma4N", "ma4W", 0)
                for q in range(1, BWW):
                    b4w = jnp.where(jq == q, word("mb4N", "mb4W", q), b4w)
                    a4w = jnp.where(jq == q, word("ma4N", "ma4W", q), a4w)
                sbv = ((b4w >> jb) & u32(1)) == 1
                a4s = ((a4w >> jb) & u32(1)) == 1
                sb = adv_done & sbv
                sa = adv_done & ~sbv & a4s

            nu = nst.astype(u32)
            ext = (sthi >> (29 - nu)) & ((u32(1) << nu) - 1)
            pops = jax.lax.population_count(ext).astype(i32)
            nthi = ((sthi << nu) |
                    jnp.where(nst == 0, u32(0),
                              stlo >> (32 - nu))) & THI_MASK
            ntlo = (stlo << nu) | ((u32(1) << nu) - 1)
            sm = jnp.where(usable, sm + nst - pops, sm)
            sthi = jnp.where(usable, nthi, sthi)
            stlo = jnp.where(usable, ntlo, stlo)
            sy = jnp.where(usable, sy + sgn * nst, sy)
            sca = jnp.where(sa, 1, sca)
            scb = jnp.where(sb, 1, scb)
            sact = jnp.where(adv_done, 0, sact)

            # one packed rsum answers all three liveness questions (inv /
            # usable / still-active) that previously took three ranys:
            # disjoint 10-bit count fields (WR <= 1023 guards overflow)
            scode = (sact == 1).astype(i32) * (1 << 20) \
                + usable.astype(i32) * (1 << 10) + inv.astype(i32)
            ssum = rsum(scode)
            any_usable = ((ssum >> 10) & 1023) > 0
            need_rl = ((ssum & 1023) > 0) & ~any_usable
            any_sact = ssum >= (1 << 20)
            stall_reload = jnp.where(sS & need_rl, 1, st["stall_reload"])

            # ---------------- phase B: complete the wave ---------------
            snake_done = sS & ~need_rl & ~any_sact
            sBb = b2(snake_done)
            sBw = b2w(snake_done)
            y = sy
            c = (y << 1) + k
            clipA = (sca == 1) & in_band
            clipB = (scb == 1) & in_band
            clip_any = rany(clipA | clipB)
            more = jnp.where(snake_done & clip_any, 0, st["more"])

            # pebble drops into the segment buffer (pool indices stay
            # globally consistent via the carried avail counter)
            X2 = jnp.concatenate([y + k, y], axis=1)          # (G, 2W)
            N2 = jnp.concatenate([NA, NB], axis=1)
            H2 = jnp.concatenate([wha, whb], axis=1)
            MK2 = jnp.concatenate([wma, wmb], axis=1)
            k2w = jnp.concatenate([k, k], axis=1)
            ib32 = in_band.astype(i32)
            inb2w = jnp.concatenate([ib32, ib32], axis=1) != 0
            avail = st["avail"]
            dcnt = st["dcnt"]
            dbuf = st["dbuf"]
            ovfB = ovf

            def d_cond(dst):
                N2, H2, MK2, avail, dcnt, dbuf, ovfB = dst
                if "drops" in _ablate:
                    return jnp.bool_(False)
                if reverse:
                    need_any = inb2w & (X2 <= N2)
                else:
                    need_any = inb2w & (X2 >= N2)
                return (need_any & sBw & (b2w(dcnt) < DBUF)).any()

            def d_body(dst):
                N2, H2, MK2, avail, dcnt, dbuf, ovfB = dst
                lact = sBw & (b2w(dcnt) < DBUF)
                if reverse:
                    dact = lact & inb2w & (X2 <= N2)
                    need = dact & (MK2 > N2)
                else:
                    dact = lact & inb2w & (X2 >= N2)
                    need = dact & (MK2 < N2)
                if lanepack:
                    # the drop row is [A-lane0 | A-lane1 | B-lane0 |
                    # B-lane1] W-blocks; a lane's ranks run over its A
                    # block then its B block, matching the unpacked
                    # [A | B] column order exactly (pool indices must be
                    # bit-identical).  All scans are within W blocks.
                    diot = jax.lax.broadcasted_iota(i32, need.shape, 1)
                    dslots = diot & Wm
                    ni = need.astype(i32)
                    # inclusive prefix within each W block
                    cs = ni
                    sft = 1
                    while sft < W:
                        cs = cs + jnp.where(dslots >= sft,
                                            jnp.roll(cs, sft, axis=1), 0)
                        sft *= 2
                    # block totals, block-broadcast (within-block butterfly)
                    T = ni
                    sft = 1
                    while sft < W:
                        T = T + jnp.where(dslots >= sft,
                                          jnp.roll(T, sft, axis=1),
                                          jnp.roll(T, sft - W, axis=1))
                        sft *= 2
                    TA2B = jnp.roll(T, WR, axis=1)  # A-blk h <-> B-blk h
                    cs = cs + jnp.where(diot >= WR, TA2B, 0)
                    cnt = (T + TA2B)[:, :WR]        # per-lane total, rows
                else:
                    # inclusive prefix sum via log-doubling (no cumsum in
                    # Mosaic)
                    cs = need.astype(i32)
                    sft = 1
                    while sft < 2 * W:
                        rolled = jnp.roll(cs, sft, axis=1)
                        okm = jax.lax.broadcasted_iota(
                            i32, cs.shape, 1) >= sft
                        cs = cs + jnp.where(okm, rolled, 0)
                        sft *= 2
                    cnt = jnp.max(cs, axis=1)   # == cs[:, -1]; int indexing
                ridx = cs - 1               # lowers to dynamic_slice in
                #                             Mosaic, reductions do not
                pidx = b2w(avail) + ridx            # global pool index
                H2n = jnp.where(need, pidx, H2)
                MK2n = jnp.where(need, N2, MK2)
                # append the needed rows at dbuf[dcnt + rank]: dbuf is a
                # 2D SoA plane [h | k | d | n] of DBUF columns each (per
                # lane half when lanepacked) — 3D small-minor buffers both
                # scale badly with G and can SIGABRT this Mosaic toolchain.
                # Ranks are consecutive, so a small static cap (DRANK)
                # serves a whole wave's drops almost always; rank overflow
                # just takes another d_body trip.
                newbuf = dbuf
                if lanepack:
                    dio8 = jax.lax.broadcasted_iota(i32, (1, 8 * DBUF), 1)
                    half8 = dio8 // (4 * DBUF)
                    rem8 = dio8 - half8 * (4 * DBUF)
                    fid = rem8 // DBUF
                    col = rem8 - fid * DBUF

                    def lane_col(row2w):
                        # (G, 2W) half-broadcast row -> per-column value of
                        # the column's lane half in dbuf space
                        return jnp.where(half8 == 0, row2w[:, 0:1],
                                         row2w[:, W:W + 1])

                    for rr in range(DRANK):
                        sel = (need & (ridx == rr)).astype(i32)
                        # fold the A/B blocks to one (G, WR) row with the
                        # selected value at its slot, then a within-half
                        # butterfly broadcasts it to the whole half
                        hrow = rsum(sel[:, :WR] * H2[:, :WR]
                                    + sel[:, WR:] * H2[:, WR:])
                        krow = rsum(sel[:, :WR] * k2w[:, :WR]
                                    + sel[:, WR:] * k2w[:, WR:])
                        nrow = rsum(sel[:, :WR] * N2[:, :WR]
                                    + sel[:, WR:] * N2[:, WR:])
                        val = jnp.where(
                            fid == 0, lane_col(hrow),
                            jnp.where(fid == 1, lane_col(krow),
                                      jnp.where(fid == 2, lane_col(dif),
                                                lane_col(nrow))))
                        at = lane_col(dcnt) + rr
                        hs = lane_col(cnt) > rr
                        newbuf = jnp.where((col == at) & hs, val, newbuf)
                else:
                    dio4 = jax.lax.broadcasted_iota(i32, (1, 4 * DBUF), 1)
                    fid = dio4 // DBUF
                    col = dio4 - fid * DBUF
                    for rr in range(DRANK):
                        sel = need & (ridx == rr)      # one slot per lane
                        hval = rsum(jnp.where(sel, H2, 0))
                        kval = rsum(jnp.where(sel, k2w, 0))
                        nval = rsum(jnp.where(sel, N2, 0))
                        val = jnp.where(
                            fid == 0, b2(hval),
                            jnp.where(fid == 1, b2(kval),
                                      jnp.where(fid == 2, b2(dif),
                                                b2(nval))))
                        at = b2(dcnt) + rr
                        hs = b2(cnt) > rr
                        newbuf = jnp.where((col == at) & hs, val, newbuf)
                done8 = jnp.minimum(cnt, DRANK)
                # slots with rank >= DRANK wait for the next trip
                processed = need & (ridx < DRANK)
                H2 = jnp.where(processed, H2n, H2)
                MK2 = jnp.where(processed, MK2n, MK2)
                adv = dact & (~need | processed)
                N2 = jnp.where(adv, N2 - TS if reverse else N2 + TS, N2)
                avail = avail + done8
                dcnt = dcnt + done8
                ovfB = jnp.where(avail + W >= P, 1, ovfB)
                return (N2, H2, MK2, avail, dcnt, newbuf, ovfB)

            (N2, H2, MK2, avail, dcnt, dbuf, ovfB) = \
                jax.lax.while_loop(d_cond, d_body,
                                   (N2, H2, MK2, avail, dcnt, dbuf, ovfB))
            NA = jnp.where(sBb, N2[:, :WR], NA)
            NB = jnp.where(sBb, N2[:, WR:], NB)
            wha = jnp.where(sBb, H2[:, :WR], wha)
            whb = jnp.where(sBb, H2[:, WR:], whb)
            wma = jnp.where(sBb, MK2[:, :WR], wma)
            wmb = jnp.where(sBb, MK2[:, WR:], wmb)

            # best/trim triggers in slot space (two-segment scans),
            # gated on any lane completing a wave this iteration: the
            # scans + score-table loops are the most expensive part of
            # the body and are pure per-lane outputs
            rel = jnp.remainder(slots1 - b2(low), W)
            low0 = b2(jnp.remainder(low, W))
            maskU = slots1 >= low0

            def _trim_block(_):

                def revcummax(v):
                    idx = slots1
                    s = 1
                    out = v
                    while s < W:
                        sh = jnp.roll(out, -s, axis=1)
                        ok = idx + s < W
                        out = jnp.maximum(out, jnp.where(ok, sh, NEG_BIG))
                        s *= 2
                    return out

                def cummin(v):
                    idx = slots1
                    s = 1
                    out = v
                    while s < W:
                        sh = jnp.roll(out, s, axis=1)
                        ok = idx - s >= 0
                        out = jnp.minimum(out, jnp.where(ok, sh, INT32_MAX))
                        s *= 2
                    return out

                besta = st["besta"]
                if not reverse:
                    cU = jnp.where(in_band & maskU, c, NEG_BIG)
                    cL = jnp.where(in_band & ~maskU, c, NEG_BIG)
                    sufU = revcummax(cU)
                    sufL = revcummax(cL)
                    maxL = b2(rmax(cL))
                    sufU_x = jnp.where(slots1 < W - 1,
                                       jnp.roll(sufU, -1, axis=1), NEG_BIG)
                    sufL_x = jnp.where(slots1 < W - 1,
                                       jnp.roll(sufL, -1, axis=1), NEG_BIG)
                    suf_excl = jnp.where(maskU, jnp.maximum(sufU_x, maxL),
                                         sufL_x)
                    runbase = jnp.maximum(b2(besta), suf_excl)
                    trigger = in_band & (c > runbase)
                else:
                    cU = jnp.where(in_band & maskU, c, INT32_MAX)
                    cL = jnp.where(in_band & ~maskU, c, INT32_MAX)
                    preU = cummin(cU)
                    preL = cummin(cL)
                    minU = b2(rmin(cU))
                    preU_x = jnp.where(slots1 > 0,
                                       jnp.roll(preU, 1, axis=1), INT32_MAX)
                    preL_x = jnp.where(slots1 > 0,
                                       jnp.roll(preL, 1, axis=1), INT32_MAX)
                    pre_excl = jnp.where(maskU, preU_x,
                                         jnp.minimum(preL_x, minU))
                    runbase = jnp.minimum(b2(besta), pre_excl)
                    trigger = in_band & (c < runbase)

                i1 = (stlo & 0x7FFF).astype(i32)
                i2 = ((stlo >> 15) & 0x7FFF).astype(i32)

                def tbl(x):
                    cum = jnp.zeros_like(x)
                    maxp = jnp.zeros_like(x)
                    for ii in range(TRIM_LEN - 1, -1, -1):
                        bit = (x >> ii) & 1
                        cum = cum + jnp.where(bit == 1, msc, -dsc)
                        maxp = jnp.maximum(maxp, cum)
                    return cum - maxp, cum

                t1, s1 = tbl(i1)
                t2, _ = tbl(i2)
                tbl_ok = (t1 >= 0) & (t2 + s1 >= 0)
                m_ok = sm >= pave

                # leftmost-trigger picks WITHOUT one-hot scans: triggers
                # are right-to-left record holders of c, so their c values
                # strictly improve toward the chosen (fwd: leftmost) slot —
                # the chosen slot's c IS the extreme over the mask, and its
                # other fields come from one one-hot sum at (c == extreme)
                if not reverse:
                    bandc = rmax(jnp.where(in_band, c, NEG_BIG))
                    any0 = bandc > besta
                    new_besta = jnp.maximum(besta, bandc)
                    lastc = rmax(jnp.where(trigger & m_ok, c, NEG_BIG))
                    any1 = lastc != NEG_BIG
                else:
                    bandc = rmin(jnp.where(in_band, c, INT32_MAX))
                    any0 = bandc < besta
                    new_besta = jnp.minimum(besta, bandc)
                    lastc = rmin(jnp.where(trigger & m_ok, c, INT32_MAX))
                    any1 = lastc != INT32_MAX
                selb = trigger & (c == b2(bandc))
                kstar = rsum(jnp.where(selb, k, 0))
                besty = jnp.where(snake_done & any0,
                                  (bandc - kstar) >> 1, st["besty"])
                besta = jnp.where(snake_done, new_besta, besta)
                lasta = jnp.where(snake_done & any1, lastc, st["lasta"])

                # trima/trimy/trimd/trimha/trimhb are OUTPUT-only: record
                # the candidate per slot (elementwise planes) and let the
                # driver epilogue pick the last wave's leftmost slot via
                # the (dif, rel) key — five one-hot reductions per wave
                # become zero
                trig_t = trigger & m_ok & tbl_ok
                upd_s = trig_t & sBb
                relenc = (Wm - rel) if not reverse else rel
                ldkey = (b2(dif) << TRIM_RB) | relenc
                ltk = jnp.where(upd_s, ldkey, st["ltk"])
                ltc = jnp.where(upd_s, c, st["ltc"])
                lty = jnp.where(upd_s, y, st["lty"])
                ltha = jnp.where(upd_s, wha, st["ltha"])
                lthb = jnp.where(upd_s, whb, st["lthb"])

                return (besta, besty, lasta, ltk, ltc, lty, ltha, lthb)

            def _trim_skip(_):
                return (st["besta"], st["besty"], st["lasta"],
                        st["ltk"], st["ltc"], st["lty"],
                        st["ltha"], st["lthb"])

            _tA = (jnp.bool_(False) if "trim" in _ablate
                   else snake_done.any())
            (besta, besty, lasta, ltk, ltc, lty, ltha, lthb) = \
                _maybe_cond(_tA, _trim_block, _trim_skip)

            # store band state
            V = jnp.where(sBb & in_band, c, V)
            Thi = jnp.where(sBb & in_band, sthi, st["Thi"])
            Tlo = jnp.where(sBb & in_band, stlo, st["Tlo"])
            M = jnp.where(sBb & in_band, sm, st["M"])
            HA = jnp.where(sBb & in_band, wha, st["HA"])
            HB = jnp.where(sBb & in_band, whb, st["HB"])
            MA = jnp.where(sBb & in_band, wma, st["MA"])
            MB = jnp.where(sBb & in_band, wmb, st["MB"])

            # clip block (value grabs in one-hot form; the REACH `rest`
            # byte test is deferred to the driver via stall_rest).  A lane
            # clips at most twice in its whole run, so the entire block —
            # clip-diagonal reductions, grabs, border updates — rides one
            # scalar lax.cond that is almost always false.
            clipped = snake_done & clip_any & (st["more"] == 1)

            def _clip_block(_):
                if not reverse:
                    aclip = rmin(jnp.where(clipA, k, INT32_MAX))
                    bclip = rmax(jnp.where(clipB, k, -INT32_MAX))
                    hit_a = clipped & (hgh >= aclip)
                    hit_b = clipped & (low <= bclip)
                else:
                    aclip = rmax(jnp.where(clipA, k, -INT32_MAX))
                    bclip = rmin(jnp.where(clipB, k, INT32_MAX))
                    hit_a = clipped & (low <= aclip)
                    hit_b = clipped & (hgh >= bclip)

                def grab(kc, hit, morem, morea, morey, mored,
                         moreha, morehb):
                    sel = k == b2(kc)
                    Mv = rsum(jnp.where(sel, M, 0))
                    Vv = rsum(jnp.where(sel, V, 0))
                    HAv = rsum(jnp.where(sel, HA, 0))
                    HBv = rsum(jnp.where(sel, HB, 0))
                    upd = hit & (morem <= Mv)
                    morem = jnp.where(upd, Mv, morem)
                    morea = jnp.where(upd, Vv, morea)
                    morey = jnp.where(upd, (Vv - kc) // 2, morey)
                    mored = jnp.where(upd, dif, mored)
                    moreha = jnp.where(upd, HAv, moreha)
                    morehb = jnp.where(upd, HBv, morehb)
                    return morem, morea, morey, mored, moreha, morehb

                mm = grab(aclip, hit_a, st["morem"], st["morea"],
                          st["morey"], st["mored"], st["moreha"],
                          st["morehb"])
                mm = grab(bclip, hit_b, *mm)
                if not reverse:
                    hgh2 = jnp.where(hit_a, aclip - 1, hgh)
                    low2 = jnp.where(hit_b, bclip + 1, low)
                else:
                    low2 = jnp.where(hit_a, aclip + 1, low)
                    hgh2 = jnp.where(hit_b, bclip - 1, hgh)
                srest = jnp.where(clipped, 1, st["stall_rest"])
                return mm + (low2, hgh2, srest)

            def _clip_skip(_):
                return (st["morem"], st["morea"], st["morey"], st["mored"],
                        st["moreha"], st["morehb"], low, hgh,
                        st["stall_rest"])

            _cA = (jnp.bool_(False) if "grab" in _ablate
                   else clipped.any())
            (morem, morea, morey, mored, moreha, morehb, low, hgh,
             stall_rest) = _maybe_cond(_cA, _clip_block, _clip_skip)

            # band prune — positions relative to the POST-clip low (the
            # clip block may have just raised it; the pre-clip `rel` is
            # only valid for the trim keys above).  See wave_jax.py and
            # tools/clip_fuzz.py: re-using `rel` here lost the diagonals
            # just above aclip after a boundary clip.
            rel2 = jnp.remainder(slots1 - b2(low), W)
            k2 = b2(low) + rel2
            inb2 = k2 <= b2(hgh)
            if not reverse:
                ok = inb2 & (V >= b2(besta) - WAVE_LAG)
            else:
                ok = inb2 & (V <= b2(besta) + WAVE_LAG)
            if "prune" not in _ablate:
                okpos = jnp.where(ok, rel2, -1)
                hi_rel = rmax(okpos)
                lo_rel = rmin(jnp.where(okpos >= 0, okpos, W))
                have = hi_rel >= 0
                hgh = jnp.where(snake_done & have, low + hi_rel, hgh)
                low = jnp.where(snake_done & have,
                                low + jnp.minimum(lo_rel, hi_rel), low)

            # next-wave condition (evaluated after the wave, as the while
            # cond would be before the next)
            if reverse:
                go = lasta <= besta + TRIM_MLAG
            else:
                go = lasta >= besta - TRIM_MLAG
            live = jnp.where(snake_done,
                             ((more == 1) & go & (ovfB == 0)).astype(i32),
                             st["live"])
            phase = jnp.where(snake_done, 0, phase)


            st.update(V=V, M=M, NA=NA, NB=NB, HA=HA, HB=HB, MA=MA, MB=MB,
                      Thi=Thi, Tlo=Tlo, sy=sy, sm=sm, sthi=sthi, stlo=stlo,
                      wha=wha, whb=whb, wma=wma, wmb=wmb, sact=sact,
                      sca=sca, scb=scb, low=low, hgh=hgh, dif=dif,
                      more=more, besta=besta, besty=besty, lasta=lasta,
                      ltk=ltk, ltc=ltc, lty=lty, ltha=ltha, lthb=lthb,
                      morem=morem, morea=morea, morey=morey,
                      mored=mored, moreha=moreha, morehb=morehb,
                      overflow=ovfB, avail=avail, dcnt=dcnt, dbuf=dbuf,
                      phase=phase, live=live, stall_reload=stall_reload,
                      stall_rest=stall_rest, stall_dbuf=stall_dbuf)
            return st

        if os.environ.get("DAMAPPER_PALLAS_STEP"):
            # eager CPU debugging: python loop so state is inspectable
            # between segment iterations (jax.debug.print is unavailable
            # under the axon plugin, even on the CPU backend)
            hook = globals().get("_SEG_HOOK")
            while bool(seg_cond(st)):
                st = seg_body(st)
                if hook is not None:
                    hook(st)
            out = st
        else:
            out = jax.lax.while_loop(seg_cond, seg_body, st)
        return dict(out, **_planes)

    return seg


# ---------------------------------------------------------------------------
# XLA-side pieces: wave-0 prologue, plane reload, REACH rest, dbuf flush
# ---------------------------------------------------------------------------


def make_prologue(W, P, BW, DBUF, reverse):
    """Per-lane wave-0 (ported from wave_jax's kernel prologue; reference
    align.c:432-583/1090-1241): seed snake, initial pebbles, initial
    best/trim and boundary clip.  Returns the lane's driver state."""
    Wm = W - 1
    sgn = -1 if reverse else 1
    soff = -1 if reverse else 0
    stepv = jnp.arange(SS, dtype=i32) * sgn

    def prologue(abase, bbase, mida, k0, aoffp, boffp, Aflat, Bflat, ts):
        TS = ts

        def bchar(y):
            return Bflat[bbase + y + soff]

        def achar(x):
            return Aflat[abase + x + soff]

        y0 = jnp.right_shift(mida - k0, 1)
        if not reverse:
            na0 = ((y0 + k0 + (TS - aoffp)) // TS - 1) * TS + aoffp
            nb0 = ((y0 + (TS - boffp)) // TS - 1) * TS + boffp
            amark0, bmark0 = na0, nb0
            na0 = na0 + TS
            nb0 = nb0 + TS
        else:
            na0 = ((y0 + k0 + (TS - aoffp) - 1) // TS - 1) * TS + aoffp
            nb0 = ((y0 + (TS - boffp) - 1) // TS - 1) * TS + boffp
            amark0, bmark0 = y0 + k0, y0

        pool = jnp.zeros((P, 4), i32)
        pool = pool.at[0].set(jnp.stack([i32(-1), k0, i32(0), amark0]))
        pool = pool.at[1].set(jnp.stack([i32(-1), k0, i32(0), bmark0]))
        avail = i32(2)
        ha0, hb0 = i32(0), i32(1)

        def s0_cond(st):
            y, stop, ca, cb = st
            return ~stop

        def s0_body(st):
            y, stop, ca, cb = st
            bwin = Bflat[jnp.clip(bbase + y + soff + stepv, 0,
                                  Bflat.shape[0] - 1)]
            awin = Aflat[jnp.clip(abase + y + k0 + soff + stepv, 0,
                                  Aflat.shape[0] - 1)]
            sbv = bwin == 4
            misv = bwin != awin
            advv = ((~sbv) & (~misv)).astype(i32)
            pref = jnp.cumprod(advv)
            nst = pref.sum()
            prefx = jnp.concatenate([jnp.ones((1,), i32), pref[:-1]])
            fs = (prefx * (1 - advv)).astype(bool)
            sb = (fs & sbv).any()
            sa = (fs & (~sbv) & misv & (awin == 4)).any()
            return (y + sgn * nst, nst < SS, ca | sa, cb | sb)

        y0f, _, clipA0, clipB0 = jax.lax.while_loop(
            s0_cond, s0_body, (y0, jnp.bool_(False), jnp.bool_(False),
                               jnp.bool_(False)))
        c0 = (y0f << 1) + k0
        more = ~(clipA0 | clipB0)
        aclip = jnp.where(clipA0, k0, (-INT32_MAX if reverse else INT32_MAX))
        bclip = jnp.where(clipB0, k0, (INT32_MAX if reverse else -INT32_MAX))

        def d0_cond(st):
            x, n, h, av, pl, mk = st
            return (x <= n) if reverse else (x >= n)

        def d0_body(st):
            x, n, h, av, pl, mk = st
            pl = pl.at[av].set(jnp.stack([h, k0, i32(0), n]), mode="drop")
            return (x, n - TS if reverse else n + TS,
                    jnp.where(av < P, av, h), av + 1, pl, n)

        xA = y0f + k0
        xA, na0, ha0, avail, pool, amk0 = jax.lax.while_loop(
            d0_cond, d0_body, (xA, na0, ha0, avail, pool, amark0))
        xB = y0f
        xB, nb0, hb0, avail, pool, bmk0 = jax.lax.while_loop(
            d0_cond, d0_body, (xB, nb0, hb0, avail, pool, bmark0))

        better0 = (c0 < mida) if reverse else (c0 > mida)
        besta = jnp.where(better0, c0, mida)
        besty = jnp.where(better0, y0f, y0)
        lasta = besta
        trima, trimy = besta, besty
        trimd = i32(0)
        trimha = jnp.where(better0, ha0, i32(0))
        trimhb = jnp.where(better0, hb0, i32(1))

        fill = NEG_BIG if not reverse else INT32_MAX
        V = jnp.full(W, fill, i32).at[k0 & Wm].set(c0)
        Thi = jnp.full(W, np.uint32((1 << 28) - 1), u32)
        Tlo = jnp.full(W, np.uint32(0xFFFFFFFF), u32)
        M = jnp.full(W, PATH_LEN, i32)
        NA = jnp.zeros(W, i32).at[k0 & Wm].set(na0)
        NB = jnp.zeros(W, i32).at[k0 & Wm].set(nb0)
        HA = jnp.zeros(W, i32).at[k0 & Wm].set(ha0)
        HB = jnp.zeros(W, i32).at[k0 & Wm].set(hb0)
        MA = jnp.zeros(W, i32).at[k0 & Wm].set(amk0)
        MB = jnp.zeros(W, i32).at[k0 & Wm].set(bmk0)

        low = k0
        hgh = k0
        morem = i32(-1)
        morea = morey = mored = moreha = morehb = i32(0)

        # wave-0 clip handling with direct REST evaluation (XLA gathers)
        clipped = ~more
        rest = (bchar(besty) != 4) & (achar(besta - besty) != 4)
        if not reverse:
            hit_a = clipped & (hgh >= aclip)
            hit_b = clipped & (low <= bclip)
        else:
            hit_a = clipped & (low <= aclip)
            hit_b = clipped & (hgh >= bclip)

        def grab(kc, morem, morea, morey, moreha, morehb, hit):
            s = kc & Wm
            upd = hit & (morem <= M[s])
            morem = jnp.where(upd, M[s], morem)
            morea = jnp.where(upd, V[s], morea)
            morey = jnp.where(upd, (V[s] - kc) // 2, morey)
            moreha = jnp.where(upd, HA[s], moreha)
            morehb = jnp.where(upd, HB[s], morehb)
            return morem, morea, morey, moreha, morehb

        morem, morea, morey, moreha, morehb = grab(
            aclip, morem, morea, morey, moreha, morehb, hit_a)
        morem, morea, morey, moreha, morehb = grab(
            bclip, morem, morea, morey, moreha, morehb, hit_b)
        if not reverse:
            hgh = jnp.where(hit_a, aclip - 1, hgh)
            low = jnp.where(hit_b, bclip + 1, low)
        else:
            low = jnp.where(hit_a, aclip + 1, low)
            hgh = jnp.where(hit_b, bclip - 1, hgh)
        more = jnp.where(clipped, rest, more)

        overflow = i32(0)
        live = (more & jnp.bool_(True)).astype(i32)   # TRIM lag trivially ok

        out = dict(V=V, M=M, NA=NA, NB=NB, HA=HA, HB=HB, MA=MA, MB=MB,
                   Thi=Thi, Tlo=Tlo,
                   ltk=jnp.zeros(W, i32), ltc=jnp.zeros(W, i32),
                   lty=jnp.zeros(W, i32), ltha=jnp.zeros(W, i32),
                   lthb=jnp.zeros(W, i32),
                   sy=jnp.zeros(W, i32), sm=jnp.zeros(W, i32),
                   sthi=jnp.zeros(W, u32), stlo=jnp.zeros(W, u32),
                   wha=jnp.zeros(W, i32), whb=jnp.zeros(W, i32),
                   wma=jnp.zeros(W, i32), wmb=jnp.zeros(W, i32),
                   sact=jnp.zeros(W, i32), sca=jnp.zeros(W, i32),
                   scb=jnp.zeros(W, i32),
                   low=low, hgh=hgh, dif=i32(0), more=more.astype(i32),
                   besta=besta, besty=besty, lasta=lasta, trima=trima,
                   trimy=trimy, trimd=trimd, trimha=trimha, trimhb=trimhb,
                   morem=morem, morea=morea, morey=morey, mored=mored,
                   moreha=moreha, morehb=morehb, overflow=overflow,
                   avail=avail, banchor=i32(-(1 << 30)),
                   kanchor=i32(-(1 << 30)), phase=i32(0), live=live,
                   stall_reload=live, stall_rest=i32(0),
                   stall_dbuf=i32(0), dcnt=i32(0), kit=i32(0),
                   abase=abase, bbase=bbase, aoffp=aoffp, boffp=boffp,
                   **{nm: jnp.zeros(((BW // 32) * W,), u32)
                      for nm in PLANES},
                   dbuf=jnp.zeros((4 * DBUF,), i32))
        return out, pool

    return prologue


def _trim_extract(st, reverse):
    """Final trima/trimy/trimd/trimha/trimhb from the lazy per-slot trim
    planes: the slot with the max (dif, rel-preference) key is the last
    wave's leftmost (reverse: rightmost) trig_t slot — exactly the slot
    the reference updates trim state from.  Runs ONCE per batch in the
    XLA driver epilogue; lanes that never triggered keep their prologue
    values (ltk stays 0; in-kernel keys are >= 1 << TRIM_RB)."""
    ltk = st["ltk"]
    sl = jnp.argmax(ltk, axis=1)
    kmax = jnp.take_along_axis(ltk, sl[:, None], 1)[:, 0]
    have = kmax > 0

    def pick(nm):
        return jnp.take_along_axis(st[nm], sl[:, None], 1)[:, 0]

    return dict(
        trima=jnp.where(have, pick("ltc"), st["trima"]),
        trimy=jnp.where(have, pick("lty"), st["trimy"]),
        trimd=jnp.where(have, kmax >> TRIM_RB, st["trimd"]),
        trimha=jnp.where(have, pick("ltha"), st["trimha"]),
        trimhb=jnp.where(have, pick("lthb"), st["trimhb"]))


def _yref_of(st, W, reverse, lanepack=False):
    """Reload anchor y: the extreme reachable y over ACTIVE snake positions
    for mid-wave lanes (anchoring on the committed band's older y values
    anchors the window too low and livelocks the stall), else over the
    committed band.  SHARED between the XLA driver body and the persistent
    kernel — the two must anchor identically or their reloads diverge."""
    lo = _mk_lane_ops(W, lanepack)
    act = st["sact"] == 1
    inph = lo.b2(st["phase"] == 1)
    fillv = INT32_MAX if not reverse else -INT32_MAX
    slots = lo.slots()
    kk = lo.b2(st["low"]) + jnp.remainder(slots - lo.b2(st["low"]), W)
    inb = kk <= lo.b2(st["hgh"])
    vvalid = inb & (st["V"] != (INT32_MAX if reverse else NEG_BIG))
    yact = jnp.where(inph & act, st["sy"], fillv)
    yv = jnp.where(vvalid, (st["V"] - kk) >> 1, fillv)
    have_act = lo.rany(inph & act)
    if not reverse:
        return jnp.where(have_act, lo.rmin(yact), lo.rmin(yv))
    return jnp.where(have_act, lo.rmax(yact), lo.rmax(yv))


def _anchor_math(abase, bbase, yref, low, hgh, LA, LB, W, BW, reverse):
    """Window anchors + global boundary clip for a plane reload
    (elementwise: serves make_reload's per-lane scalars and the persistent
    kernel's (G,) vectors identically).  Returns (bs, as_, gbad, banchor,
    kanchor)."""
    AW = BW + 2 * W
    soff = -1 if reverse else 0
    if not reverse:
        banchor0 = bbase + (yref - 4) + soff
        kanchor = W * (low // W)
        astart = banchor0 + (abase - bbase) + kanchor
        bs = jnp.clip(banchor0, 0, LB - BW)
        as_ = jnp.clip(astart, 0, LA - AW)
        gbad = (bs != banchor0) | (as_ != astart)
        banchor = bs
    else:
        banchor0 = bbase + (yref + 4) + soff
        kanchor = W * ((hgh + W) // W)
        atop = banchor0 + (abase - bbase) + kanchor
        bs = jnp.clip(banchor0 - (BW - 1), 0, LB - BW)
        as_ = jnp.clip(atop - (AW - 1), 0, LA - AW)
        gbad = (bs != banchor0 - (BW - 1)) | (as_ != atop - (AW - 1))
        banchor = bs + (BW - 1)
    return bs, as_, gbad, banchor, kanchor


def _rest_live_update(st, ach, bch, sr, reverse):
    """REACH rest resolution from the two fetched boundary bytes (shared
    post-fetch logic of the XLA driver body and the persistent kernel)."""
    rest = (bch != 4) & (ach != 4)
    if reverse:
        go = st["lasta"] <= st["besta"] + TRIM_MLAG
    else:
        go = st["lasta"] >= st["besta"] - TRIM_MLAG
    more = jnp.where(sr, rest.astype(i32), st["more"])
    live = jnp.where(sr, (rest & go & (st["overflow"] == 0)).astype(i32),
                     st["live"])
    return more, live


def make_reload(W, BW, reverse):
    """Per-lane plane (re)build from the big sequence arrays (XLA; ported
    from wave_jax._reload)."""
    AW = BW + 2 * W
    jidxr = jnp.arange(BW, dtype=i32)
    BIGC = i32(1 << 30)

    def reload(abase, bbase, yref, low, hgh, anyact, Aflat, Bflat):
        LB = Bflat.shape[0]
        LA = Aflat.shape[0]
        bs, as_, gbad, banchor, kanchor = _anchor_math(
            abase, bbase, yref, low, hgh, LA, LB, W, BW, reverse)
        bad = anyact & gbad
        if not reverse:
            bwin = jax.lax.dynamic_slice(Bflat, (bs,), (BW,))
            awin = jax.lax.dynamic_slice(Aflat, (as_,), (AW,))
            offs = list(range(W))
        else:
            bwin = jnp.flip(jax.lax.dynamic_slice(Bflat, (bs,), (BW,)))
            awin = jnp.flip(jax.lax.dynamic_slice(Aflat, (as_,), (AW,)))
            offs = [W if s == 0 else W - s for s in range(W)]
        # one gather instead of W separate slice ops: the driver loop's
        # XLA op count is a real cost on this backend
        offs_arr = jnp.asarray(np.array(offs, np.int32))
        idx = offs_arr[:, None] + jnp.arange(BW + W, dtype=jnp.int32)[None]
        aw2 = awin[idx]
        awN = aw2[:, :BW]
        awW = aw2[:, W:W + BW]
        b4 = (bwin == 4)[None, :]
        shifts = jnp.arange(32, dtype=u32)[None, None, :]

        def masks(aw):
            stop = b4 | (bwin[None, :] != aw)
            b4m = jnp.broadcast_to(b4, stop.shape)
            a4m = aw == 4

            def pack(bits):
                v = bits.reshape(W, BW // 32, 32).astype(u32)
                w = jnp.sum(v << shifts, axis=-1).astype(u32)
                return w.T.reshape(-1)        # q-major flat layout

            return pack(stop), pack(b4m), pack(a4m)

        sN, bN, aN = masks(awN)
        sW_, bW_, aW_ = masks(awW)
        return sN, bN, aN, sW_, bW_, aW_, banchor, kanchor, bad

    return reload


# ---------------------------------------------------------------------------
# driver: prologue -> [reload planes; segment; flush drops]* -> outputs
# ---------------------------------------------------------------------------


def make_driver(W, P, BW, DBUF, G, reverse, use_pallas=True,
                interpret=False, packops=False, lanepack=False):
    seg = make_segment(W, BW, P, DBUF, reverse)
    seg_lp = (make_segment(W, BW, P, DBUF, reverse, lanepack=True)
              if lanepack else None)
    prologue = make_prologue(W, P, BW, DBUF, reverse)
    reload_ = make_reload(W, BW, reverse)

    def segment_xla(st, ts, pave, msc, dsc):
        return seg(st, ts, pave, msc, dsc)

    def segment_xla_lp(st, ts, pave, msc, dsc):
        # lane-packed XLA twin: exercises the packed kernel code on CPU
        return _lp_unpack_state(
            seg_lp(_lp_pack_state(st, W), ts, pave, msc, dsc), W)

    def segment_pallas_lp(st, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        stp = _lp_pack_state(st, W)
        B2 = B // 2
        Gm = min(G, B2)
        WR = 2 * W
        pack, unpack, store = _mk_packer_lp(WR, BW // 32)
        consts = jnp.stack([ts, pave, msc, dsc]).astype(i32)
        bi, bu = pack(stp)
        dbuf = stp["dbuf"]

        def kernel(bi_r, bu_r, db_r, cn_r, obi, obu, odb):
            stk = unpack(bi_r[...], bu_r[...])
            stk["dbuf"] = db_r[...]
            cns = cn_r[...]
            res = seg_lp(stk, cns[0, 0], cns[0, 1], cns[0, 2], cns[0, 3])
            store(obi, obu, res)
            odb[...] = res["dbuf"]

        def rowspec(arr):
            w = arr.shape[1]
            return pl.BlockSpec((Gm, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        dspec = pl.BlockSpec((Gm, 8 * DBUF), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        obi, obu, odb = pl.pallas_call(
            kernel,
            grid=(B2 // Gm,),
            in_specs=[rowspec(bi), rowspec(bu), dspec,
                      pl.BlockSpec((1, 4), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowspec(bi), rowspec(bu), dspec),
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in (bi, bu, dbuf)),
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bi, bu, dbuf, consts[None, :])
        res = unpack(obi, obu)
        res["dbuf"] = odb
        return _lp_unpack_state(res, W)

    def segment_pallas_packed(st, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        Gm = min(G, B)
        pack, unpack, store = _mk_packer(W, BW // 32, SCALARS, True)
        consts = jnp.stack([ts, pave, msc, dsc]).astype(i32)
        bi, bu, sc = pack(st)
        dbuf = st["dbuf"]

        def kernel(bi_r, bu_r, sc_r, db_r, cn_r, obi, obu, osc, odb):
            stk = unpack(bi_r[...], bu_r[...], sc_r[...])
            stk["dbuf"] = db_r[...]
            cns = cn_r[...]
            res = seg(stk, cns[0, 0], cns[0, 1], cns[0, 2], cns[0, 3])
            store(obi, obu, osc, res)
            odb[...] = res["dbuf"]

        def rowspec(arr):
            w = arr.shape[1]
            return pl.BlockSpec((Gm, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        dspec = pl.BlockSpec((Gm, 4 * DBUF), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        obi, obu, osc, odb = pl.pallas_call(
            kernel,
            grid=(B // Gm,),
            in_specs=[rowspec(bi), rowspec(bu), rowspec(sc), dspec,
                      pl.BlockSpec((1, 4), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowspec(bi), rowspec(bu), rowspec(sc), dspec),
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in (bi, bu, sc, dbuf)),
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bi, bu, sc, dbuf, consts[None, :])
        res = unpack(obi, obu, osc)
        res["dbuf"] = odb
        return res

    def segment_pallas(st, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        Gm = min(G, B)          # small batches: one group spans the batch
        names = list(ORDER)
        consts = jnp.stack([ts, pave, msc, dsc]).astype(i32)

        # rank-1 blocks must tile to 128 on TPU: carry per-lane scalars as
        # (B, 1) and squeeze inside the kernel
        def arg(nm):
            return st[nm][:, None] if nm in SCALARS else st[nm]

        def kernel(*refs):
            ins = refs[:len(names) + 1]
            outs = refs[len(names) + 1:]
            stk = {}
            for ix, nm in enumerate(names):
                v = ins[ix][...]
                stk[nm] = v[:, 0] if nm in SCALARS else v
            cns = ins[len(names)][...]
            res = seg(stk, cns[0, 0], cns[0, 1], cns[0, 2], cns[0, 3])
            for ix, nm in enumerate(names):
                outs[ix][...] = (res[nm][:, None] if nm in SCALARS
                                 else res[nm])

        def bspec(nm):
            shp = st[nm].shape[1:]
            if nm in SCALARS:
                return pl.BlockSpec((Gm, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            if len(shp) == 1:
                return pl.BlockSpec((Gm, shp[0]), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((Gm,) + shp, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [bspec(nm) for nm in names]
        in_specs.append(pl.BlockSpec((1, 4), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs = tuple(bspec(nm) for nm in names)

        def oshape(nm):
            if nm in SCALARS:
                return jax.ShapeDtypeStruct((B, 1), st[nm].dtype)
            return jax.ShapeDtypeStruct(st[nm].shape, st[nm].dtype)

        out_shape = tuple(oshape(nm) for nm in names)
        outs = pl.pallas_call(
            kernel,
            grid=(B // Gm,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={ix: ix for ix in range(len(names))},
            # the phase machine's (G, W, BW) temporaries exceed the default
            # 16M scoped-vmem budget for BW > 128 (v5e has 128M physical)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*[arg(nm) for nm in names], consts[None, :])
        res = {}
        for nm, v in zip(names, outs):
            res[nm] = v[:, 0] if nm in SCALARS else v
        return res

    if lanepack:
        segment = segment_pallas_lp if use_pallas else segment_xla_lp
    else:
        segment = (segment_pallas_packed if packops else
                   segment_pallas) if use_pallas else segment_xla
    soff = -1 if reverse else 0
    # safety bound (cf. the persistent driver's MAX_LAUNCH): body clears
    # stall_rest unconditionally every iteration and any live lane advances
    # >=1 wave per non-stall iteration (waves are bounded by the lane's
    # a-extent), so legitimate batches finish orders of magnitude below
    # this — the cap only converts a would-be device hang into termination
    _maxit = int(os.environ.get("DAMAPPER_PALLAS_MAXIT", 4_000_000))

    def driver(abase, bbase, mida, k0, aoffp, boffp, Aflat, Bflat,
               ts, pave, msc, dsc):
        st1, pool = jax.vmap(
            prologue, in_axes=(0, 0, 0, 0, 0, 0, None, None, None)
        )(abase, bbase, mida, k0, aoffp, boffp, Aflat, Bflat, ts)
        st1 = dict(st1, _it=jnp.zeros((), i32))
        # DBUF scratch rows beyond P: the per-segment drop-buffer flush is a
        # contiguous append, written as ONE dynamic_update_slice of the full
        # buffer (a row scatter would serialize on TPU); rows past dcnt are
        # garbage that lands in not-yet-allocated pool space and is
        # overwritten by later appends before ever becoming visible
        pool = jnp.pad(pool, ((0, 0), (0, DBUF), (0, 0)))

        def cond(c):
            st, pool = c
            # a lane stalled on the deferred REACH rest test has live == 0
            # until the next body resolves it: the loop must keep going for
            # stall_rest lanes or the LAST live lane of a batch loses its
            # post-clip waves when it clips (tools/clip_fuzz.py)
            go = ((st["live"] == 1) | (st["stall_rest"] == 1)).any()
            if _maxit:
                go = go & (st["_it"] < _maxit)
            return go

        def body(c):
            st, pool = c
            st = dict(st, _it=st["_it"] + 1)
            # resolve deferred REACH rest tests (needs 2 sequence bytes)
            sr = st["stall_rest"] == 1
            yb = st["besty"]
            xb = st["besta"] - yb
            bch = Bflat[jnp.clip(st["bbase"] + yb + soff, 0,
                                 Bflat.shape[0] - 1)]
            ach = Aflat[jnp.clip(st["abase"] + xb + soff, 0,
                                 Aflat.shape[0] - 1)]
            more, live = _rest_live_update(st, ach, bch, sr, reverse)

            # rebuild planes for every live lane (cheap; planes are caches)
            yref = _yref_of(st, W, reverse)
            (msN, mbN, maN, msW, mbW, maW, banchor, kanchor,
             bad) = jax.vmap(
                reload_, in_axes=(0, 0, 0, 0, 0, 0, None, None)
            )(st["abase"], st["bbase"], yref, st["low"], st["hgh"],
              live == 1, Aflat, Bflat)
            overflow = jnp.where(bad, 1, st["overflow"])
            live = jnp.where(bad, 0, live)

            st = dict(st, more=more, live=live, overflow=overflow,
                      mstopN=msN, mb4N=mbN, ma4N=maN,
                      mstopW=msW, mb4W=mbW, ma4W=maW, banchor=banchor,
                      kanchor=kanchor,
                      stall_reload=jnp.zeros_like(live),
                      stall_rest=jnp.zeros_like(live),
                      stall_dbuf=jnp.zeros_like(live))

            _it = st.pop("_it")
            st = dict(segment(st, ts, pave, msc, dsc), _it=_it)

            # flush the drop buffers into the pool (contiguous append);
            # the SoA plane restacks to (DBUF, 4) rows here in XLA
            base = jnp.clip(st["avail"] - st["dcnt"], 0, P)
            drows = jnp.stack(
                [st["dbuf"][:, f * DBUF:(f + 1) * DBUF] for f in range(4)],
                axis=2)
            pool = jax.vmap(
                lambda pl_, b, rows: jax.lax.dynamic_update_slice(
                    pl_, rows, (b, 0))
            )(pool, base, drows)
            st = dict(st, dcnt=jnp.zeros_like(st["dcnt"]))
            return (st, pool)

        if os.environ.get("DAMAPPER_PALLAS_STEP"):
            c = (st1, pool)
            while bool(cond(c)):
                c = body(c)
            st, pool = c
        else:
            st, pool = jax.lax.while_loop(cond, body, (st1, pool))
        pool = pool[:, :P]
        return dict(_trim_extract(st, reverse),
                    morem=st["morem"], morea=st["morea"],
                    morey=st["morey"], mored=st["mored"],
                    moreha=st["moreha"], morehb=st["morehb"], pool=pool,
                    avail=st["avail"],
                    overflow=st["overflow"].astype(bool),
                    waves=st["dif"], iters=st["_it"], kit=st["kit"])

    return driver


# ---------------------------------------------------------------------------
# persistent driver: the reload loop lives INSIDE the kernel.
#
# The classic driver above pays a fixed per-iteration cost (Mosaic custom
# call dispatch + the XLA-side window gather/plane build) ~50 times per
# batch.  The persistent variant passes each lane's whole sequence
# neighbourhood into VMEM once ((B, L/128, 128) i32 operands, pre-flipped
# for the reverse wave so the kernel only ever slices forward) and performs
# the plane reload, the REACH rest byte test, and the drop-buffer guard
# inside the kernel.  The kernel then exits only when every lane is dead or
# its drop buffer is full, so the XLA loop typically runs 1-3 iterations.
#
# Every Mosaic-hostile op is avoided by construction: window slices are a
# sublane-dynamic `dynamic_slice` + static lane rolls (no lane-dim dynamic
# ops), the shifted a-window matrix is built with log-doubling static rolls
# over a 3D broadcast, and the match planes use the dense 3D code-plane
# form (carried in the in-kernel loop, never operands).  Window misses and
# global boundary clips set `bad` exactly like make_reload, so any lane the
# window cannot serve overflows into the bit-exact host-oracle fallback.
# ---------------------------------------------------------------------------

MARGIN = 512          # window slack each side of the seed span


def _pow2ceil(x):
    return 1 << (int(x) - 1).bit_length()


def _win_slice(seq3, off, nwords):
    """(1, nwords*128) window of a lane's (R, 128) sequence at element
    offset `off` (pre-clamped by the caller to [0, R*128 - nwords*128]).
    A sublane-dynamic `dynamic_slice` is an unimplemented Mosaic
    primitive on this toolchain (round-2 compile failure), so the row
    selection is log-doubling masked STATIC sublane rolls instead."""
    R = seq3.shape[0]
    c0 = jnp.clip(off // 128, 0, R - (nwords + 2))
    r = off - c0 * 128                       # 0..256
    rows = seq3
    for j in range(max(1, (R - 1).bit_length())):
        rows = jnp.where((c0 >> j) & 1 == 1,
                         jnp.roll(rows, -(1 << j), axis=0), rows)
    # every concat operand must sit at the SAME sublane offset (Mosaic:
    # "offset mismatch on non-concat dimension"), so roll row s to
    # sublane 0 instead of slicing at offset s
    row = jnp.concatenate(
        [(rows if s == 0 else jnp.roll(rows, -s, axis=0))[:1]
         for s in range(nwords + 2)], axis=1)   # (1, (nwords+2)*128)
    for j in range(9):                       # lane roll left by r (<= 256)
        row = jnp.where((r >> j) & 1 == 1,
                        jnp.roll(row, -(1 << j), axis=1), row)
    return row[:, :nwords * 128]


def _byte_at(seq3, loc):
    """Scalar element of a lane's (R, 128) sequence at element index `loc`
    (pre-clamped to [0, R*128-1]).  One full one-hot select — no
    sublane-dynamic slicing (unimplemented in this Mosaic toolchain)."""
    c0 = jnp.clip(loc // 128, 0, seq3.shape[0] - 1)
    l = loc - c0 * 128
    rowio = jax.lax.broadcasted_iota(i32, seq3.shape, 0)
    laneio = jax.lax.broadcasted_iota(i32, seq3.shape, 1)
    return jnp.sum(jnp.where((rowio == c0) & (laneio == l), seq3, 0))


def make_persistent_kernel(W, P, BW, DBUF, G, reverse, maxit=0,
                           lanepack=False):
    """In-kernel driver loop: rest-resolve -> plane reload -> segment,
    until every lane is dead or dbuf-stalled.  Pure jnp over (G, ...)
    arrays; runs identically under plain XLA (vmap lane loop) and inside
    the pallas kernel (unrolled lane loop).  With lanepack the state rides
    two lanes per row (see _mk_lane_ops); the code planes become
    (G, 2W, BW) with slot-halves sourced from each row's two lanes."""
    assert BW % 128 == 0 and (2 * W) % 128 == 0
    seg = make_segment(W, BW, P, DBUF, reverse, planes3d=True,
                       lanepack=lanepack)
    soff = -1 if reverse else 0
    AW = BW + 2 * W
    WRk = 2 * W if lanepack else W       # physical slot-row width
    BIGC = np.int32(1 << 30)    # np scalar: a jnp 0-d would be a captured
    #                             constant, which pallas kernels reject

    def kernel_fn(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc,
                  unroll_lanes):
        G_ = st["V"].shape[0]            # rows (lane pairs when packed)
        nlanes = 2 * G_ if lanepack else G_
        Lwa = aseq3.shape[-2] * 128
        Lwb = bseq3.shape[-2] * 128
        jidxr = jax.lax.broadcasted_iota(i32, (1, 1, BW), 2)
        # per-slot left-shift amounts of the a-window matrix (make_reload
        # offs), built as iotas: a pallas kernel cannot capture closures
        siota3 = jax.lax.broadcasted_iota(i32, (1, WRk, 1), 1)
        if lanepack:
            siota3 = siota3 & (W - 1)
        rowbits = (siota3 if not reverse
                   else jnp.where(siota3 == 0, W, W - siota3))

        def lane_windows(aseq3_g, bseq3_g, las, lbs, ga_loc, gb_loc):
            """Per-lane: a/b reload windows + the two REST bytes."""
            awin = _win_slice(aseq3_g, las, AW // 128)
            bwin = _win_slice(bseq3_g, lbs, BW // 128)
            ach = _byte_at(aseq3_g, ga_loc)
            bch = _byte_at(bseq3_g, gb_loc)
            return awin[0], bwin[0], ach, bch

        def ocond(c):
            st = c
            # stall_rest lanes have live == 0 until obody resolves the rest
            # bytes — keep iterating for them (see the XLA driver cond)
            runnable = ((st["live"] == 1) | (st["stall_rest"] == 1)) \
                & (st["stall_dbuf"] == 0)
            go = runnable.any()
            # per-launch safety bound: the state is consistent at every
            # obody boundary, so capping the in-kernel loop just costs an
            # extra relaunch — it can never corrupt a lane.  Normal batches
            # run ~50 iterations; the cap only matters if a lowering bug
            # livelocks a lane (the driver then falls back after MAX_LAUNCH
            # relaunches instead of wedging the TPU worker).  oit carries
            # across launches, so bound the in-launch delta via _oit0.
            cap = maxit if maxit else 4096
            go = go & (jnp.max(st["oit"] - st["_oit0"]) < cap)
            return go

        def obody(c):
            st = c
            st = dict(st, oit=st["oit"] + 1)

            # ---- REACH rest resolution (driver transplant) ----
            sr = st["stall_rest"] == 1
            yb = st["besty"]
            xb = st["besta"] - yb
            gb = jnp.clip(st["bbase"] + yb + soff, 0, LB - 1)
            ga = jnp.clip(st["abase"] + xb + soff, 0, LA - 1)
            if not reverse:
                ga_loc = ga - st["awst"]
                gb_loc = gb - st["bwst"]
            else:
                ga_loc = st["awst"] + Lwa - 1 - ga
                gb_loc = st["bwst"] + Lwb - 1 - gb
            rest_miss = sr & ((ga_loc < 0) | (ga_loc >= Lwa) |
                              (gb_loc < 0) | (gb_loc >= Lwb))
            ga_loc = jnp.clip(ga_loc, 0, Lwa - 1)
            gb_loc = jnp.clip(gb_loc, 0, Lwb - 1)

            # ---- plane reload anchors (shared with the XLA driver) ----
            yref = _yref_of(st, W, reverse, lanepack)
            bs, as_, gbad, banchor, kanchor = _anchor_math(
                st["abase"], st["bbase"], yref, st["low"], st["hgh"],
                LA, LB, W, BW, reverse)
            # map the global anchors into the lane's VMEM window
            if not reverse:
                lbs = bs - st["bwst"]
                las = as_ - st["awst"]
            else:
                lbs = st["bwst"] + Lwb - BW - bs
                las = st["awst"] + Lwa - AW - as_
            wmiss = (lbs < 0) | (lbs > Lwb - BW) | \
                    (las < 0) | (las > Lwa - AW)
            lbs = jnp.clip(lbs, 0, Lwb - BW)
            las = jnp.clip(las, 0, Lwa - AW)

            def lane_scalar(v, ll):
                # logical lane ll's scalar from driver state (static index)
                return v[ll // 2, (ll % 2) * W] if lanepack else v[ll]

            if unroll_lanes:
                parts = [lane_windows(aseq3[ll], bseq3[ll],
                                      lane_scalar(las, ll),
                                      lane_scalar(lbs, ll),
                                      lane_scalar(ga_loc, ll),
                                      lane_scalar(gb_loc, ll))
                         for ll in range(nlanes)]
                if lanepack:
                    # half-broadcast byte rows + per-half windows, built
                    # without reshapes (Mosaic-hostile on non-minor dims)
                    rowio = jax.lax.broadcasted_iota(i32, (G_, WRk), 0)
                    halfio = jax.lax.broadcasted_iota(
                        i32, (G_, WRk), 1) // W
                    ach = jnp.zeros((G_, WRk), i32)
                    bch = jnp.zeros((G_, WRk), i32)
                    for ll in range(nlanes):
                        lm = (rowio == ll // 2) & (halfio == ll % 2)
                        ach = jnp.where(lm, parts[ll][2], ach)
                        bch = jnp.where(lm, parts[ll][3], bch)
                    awinA = jnp.concatenate(
                        [parts[2 * g][0][None] for g in range(G_)], axis=0)
                    awinB = jnp.concatenate(
                        [parts[2 * g + 1][0][None] for g in range(G_)],
                        axis=0)
                    bwinA = jnp.concatenate(
                        [parts[2 * g][1][None] for g in range(G_)], axis=0)
                    bwinB = jnp.concatenate(
                        [parts[2 * g + 1][1][None] for g in range(G_)],
                        axis=0)
                else:
                    awin = jnp.concatenate(
                        [p[0][None] for p in parts], axis=0)
                    bwin = jnp.concatenate(
                        [p[1][None] for p in parts], axis=0)
                    ach = jnp.stack([p[2] for p in parts])
                    bch = jnp.stack([p[3] for p in parts])
            else:
                if lanepack:
                    def flat(v):
                        return v.reshape(G_, 2, W)[:, :, 0].reshape(nlanes)

                    awin, bwin, achf, bchf = jax.vmap(lane_windows)(
                        aseq3, bseq3, flat(las), flat(lbs),
                        flat(ga_loc), flat(gb_loc))
                    ach = jnp.broadcast_to(achf.reshape(G_, 2, 1),
                                           (G_, 2, W)).reshape(G_, WRk)
                    bch = jnp.broadcast_to(bchf.reshape(G_, 2, 1),
                                           (G_, 2, W)).reshape(G_, WRk)
                    awinA = awin.reshape(G_, 2, AW)[:, 0]
                    awinB = awin.reshape(G_, 2, AW)[:, 1]
                    bwinA = bwin.reshape(G_, 2, BW)[:, 0]
                    bwinB = bwin.reshape(G_, 2, BW)[:, 1]
                else:
                    awin, bwin, ach, bch = jax.vmap(lane_windows)(
                        aseq3, bseq3, las, lbs, ga_loc, gb_loc)

            # ---- finish the rest resolution with the fetched bytes ----
            more, live = _rest_live_update(st, ach, bch, sr, reverse)
            overflow = jnp.where(rest_miss, 1, st["overflow"])
            live = jnp.where(rest_miss, 0, live)

            anyact = live == 1
            bad = anyact & (gbad | wmiss)
            overflow = jnp.where(bad, 1, overflow)
            live = jnp.where(bad, 0, live)

            # ---- build the 3D code planes from the fetched windows ----
            if lanepack:
                aw2 = jnp.concatenate(
                    [jnp.broadcast_to(awinA[:, None, :], (G_, W, AW)),
                     jnp.broadcast_to(awinB[:, None, :], (G_, W, AW))],
                    axis=1)                            # (G_, 2W, AW)
                bw3 = jnp.concatenate(
                    [jnp.broadcast_to(bwinA[:, None, :], (G_, W, BW)),
                     jnp.broadcast_to(bwinB[:, None, :], (G_, W, BW))],
                    axis=1)                            # (G_, 2W, BW)
            else:
                aw2 = jnp.broadcast_to(awin[:, None, :], (G_, W, AW))
                bw3 = bwin[:, None, :]
            # stage count covers the largest rowbits entry (== W for the
            # reverse wave's slot 0), not a hardcoded band width
            for j in range(int(W).bit_length()):
                stepm = (rowbits >> j) & 1 == 1
                aw2 = jnp.where(stepm, jnp.roll(aw2, -(1 << j), axis=2),
                                aw2)
            awN = aw2[:, :, :BW]
            awW = aw2[:, :, W:W + BW]
            b4 = bw3 == 4
            b4i = b4.astype(i32)

            def code(aw):
                stop = b4 | (bw3 != aw)
                val = ((jidxr << 2) | (b4i << 1) | (aw == 4).astype(i32))
                return jnp.where(stop, val, BIGC)

            st = dict(st, more=more, live=live, overflow=overflow,
                      codeN=code(awN), codeW=code(awW),
                      banchor=banchor, kanchor=kanchor,
                      stall_reload=jnp.zeros_like(live),
                      stall_rest=jnp.zeros_like(live))

            st = seg(st, ts, pave, msc, dsc)
            return st

        st = dict(st,
                  codeN=jnp.zeros((G_, WRk, BW), i32),
                  codeW=jnp.zeros((G_, WRk, BW), i32),
                  _oit0=st["oit"])
        st = jax.lax.while_loop(ocond, obody, st)
        st.pop("codeN")
        st.pop("codeW")
        st.pop("_oit0")
        return st

    return kernel_fn


def make_persistent_driver(W, P, BW, DBUF, G, reverse, use_pallas=True,
                           interpret=False, packops=False, lanepack=False):
    """prologue -> [persistent kernel; flush drop buffers]* -> outputs.
    The XLA loop body runs only when a lane's drop buffer filled (DBUF is
    sized so that is rare): typically ONE kernel launch per batch."""
    prologue = make_prologue(W, P, BW, DBUF, reverse)
    _maxit = int(os.environ.get("DAMAPPER_PALLAS_MAXIT", 0))
    kfn = make_persistent_kernel(W, P, BW, DBUF, G, reverse, maxit=_maxit,
                                 lanepack=lanepack)

    def kernel_xla(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc):
        if lanepack:
            return _lp_unpack_state(
                kfn(_lp_pack_state(st, W), aseq3, bseq3, LA, LB,
                    ts, pave, msc, dsc, unroll_lanes=False), W)
        return kfn(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc,
                   unroll_lanes=False)

    def kernel_pallas_lp(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        stp = _lp_pack_state(st, W)
        B2 = B // 2
        Gm = min(G, B2)
        WR = 2 * W
        pack, unpack, store = _mk_packer_lp(WR, BW // 32, PSCALARS, False)
        consts = jnp.stack([ts, pave, msc, dsc, LA, LB]).astype(i32)
        bi, bu = pack(stp)
        dbuf = stp["dbuf"]

        def kernel(bi_r, bu_r, db_r, a_r, b_r, cn_r, obi, obu, odb):
            stk = unpack(bi_r[...], bu_r[...])
            stk["dbuf"] = db_r[...]
            cns = cn_r[...]
            res = kfn(stk, a_r[...], b_r[...], cns[0, 4], cns[0, 5],
                      cns[0, 0], cns[0, 1], cns[0, 2], cns[0, 3],
                      unroll_lanes=True)
            store(obi, obu, res)
            odb[...] = res["dbuf"]

        def rowspec(arr):
            w = arr.shape[1]
            return pl.BlockSpec((Gm, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        dspec = pl.BlockSpec((Gm, 8 * DBUF), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        # the window operands stay per-lane: each kernel block covers the
        # 2*Gm logical lanes of its Gm rows
        sspec = [pl.BlockSpec((2 * Gm,) + s.shape[1:],
                              lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 for s in (aseq3, bseq3)]
        obi, obu, odb = pl.pallas_call(
            kernel,
            grid=(B2 // Gm,),
            in_specs=[rowspec(bi), rowspec(bu), dspec, *sspec,
                      pl.BlockSpec((1, 6), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowspec(bi), rowspec(bu), dspec),
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in (bi, bu, dbuf)),
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bi, bu, dbuf, aseq3, bseq3, consts[None, :])
        res = unpack(obi, obu)
        res["dbuf"] = odb
        return _lp_unpack_state(res, W)

    def kernel_pallas_packed(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        Gm = min(G, B)
        pack, unpack, store = _mk_packer(W, BW // 32, PSCALARS, False)
        consts = jnp.stack([ts, pave, msc, dsc, LA, LB]).astype(i32)
        bi, bu, sc = pack(st)
        dbuf = st["dbuf"]

        def kernel(bi_r, bu_r, sc_r, db_r, a_r, b_r, cn_r,
                   obi, obu, osc, odb):
            stk = unpack(bi_r[...], bu_r[...], sc_r[...])
            stk["dbuf"] = db_r[...]
            cns = cn_r[...]
            res = kfn(stk, a_r[...], b_r[...], cns[0, 4], cns[0, 5],
                      cns[0, 0], cns[0, 1], cns[0, 2], cns[0, 3],
                      unroll_lanes=True)
            store(obi, obu, osc, res)
            odb[...] = res["dbuf"]

        def rowspec(arr):
            w = arr.shape[1]
            return pl.BlockSpec((Gm, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        dspec = pl.BlockSpec((Gm, 4 * DBUF), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        sspec = [pl.BlockSpec((Gm,) + s.shape[1:], lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 for s in (aseq3, bseq3)]
        obi, obu, osc, odb = pl.pallas_call(
            kernel,
            grid=(B // Gm,),
            in_specs=[rowspec(bi), rowspec(bu), rowspec(sc), dspec,
                      *sspec,
                      pl.BlockSpec((1, 6), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowspec(bi), rowspec(bu), rowspec(sc), dspec),
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in (bi, bu, sc, dbuf)),
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(bi, bu, sc, dbuf, aseq3, bseq3, consts[None, :])
        res = unpack(obi, obu, osc)
        res["dbuf"] = odb
        return res

    def kernel_pallas(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = st["V"].shape[0]
        Gm = min(G, B)
        names = list(PORDER)
        consts = jnp.stack([ts, pave, msc, dsc, LA, LB]).astype(i32)

        def arg(nm):
            return st[nm][:, None] if nm in PSCALARS else st[nm]

        def kernel(*refs):
            ins = refs[:len(names) + 3]
            outs = refs[len(names) + 3:]
            stk = {}
            for ix, nm in enumerate(names):
                v = ins[ix][...]
                stk[nm] = v[:, 0] if nm in PSCALARS else v
            a3 = ins[len(names)][...]
            b3 = ins[len(names) + 1][...]
            cns = ins[len(names) + 2][...]
            res = kfn(stk, a3, b3, cns[0, 4], cns[0, 5], cns[0, 0],
                      cns[0, 1], cns[0, 2], cns[0, 3], unroll_lanes=True)
            for ix, nm in enumerate(names):
                outs[ix][...] = (res[nm][:, None] if nm in PSCALARS
                                 else res[nm])

        def bspec(nm):
            shp = st[nm].shape[1:]
            if nm in PSCALARS:
                return pl.BlockSpec((Gm, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            if len(shp) == 1:
                return pl.BlockSpec((Gm, shp[0]), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((Gm,) + shp, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [bspec(nm) for nm in names]
        in_specs.append(pl.BlockSpec((Gm,) + aseq3.shape[1:],
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((Gm,) + bseq3.shape[1:],
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 6), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

        def oshape(nm):
            if nm in PSCALARS:
                return jax.ShapeDtypeStruct((B, 1), st[nm].dtype)
            return jax.ShapeDtypeStruct(st[nm].shape, st[nm].dtype)

        outs = pl.pallas_call(
            kernel,
            grid=(B // Gm,),
            in_specs=in_specs,
            out_specs=tuple(bspec(nm) for nm in names),
            out_shape=tuple(oshape(nm) for nm in names),
            input_output_aliases={ix: ix for ix in range(len(names))},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*([arg(nm) for nm in names] + [aseq3, bseq3, consts[None, :]]))
        res = {}
        for nm, v in zip(names, outs):
            res[nm] = v[:, 0] if nm in PSCALARS else v
        return res

    if lanepack:
        kernel = kernel_pallas_lp if use_pallas else kernel_xla
    else:
        kernel = (kernel_pallas_packed if packops else
                  kernel_pallas) if use_pallas else kernel_xla

    def make(L):
        """Driver specialised to a window-length bucket L (static)."""

        def driver(abase, bbase, mida, k0, aoffp, boffp, awst, bwst,
                   Aflat, Bflat, ts, pave, msc, dsc):
            LA = i32(Aflat.shape[0])
            LB = i32(Bflat.shape[0])

            # window fetch as an ALIGNED 128-lane row gather: per-element
            # gathers are latency-bound (~40ns/elem) on this backend, row
            # gathers of (128,)-aligned slices are layout-native.  awst /
            # bwst are pre-aligned to 128 by the wrapper.
            def fetch(flat, wst):
                Lp = -(-max(int(flat.shape[0]), L) // 128) * 128
                pad = (flat if int(flat.shape[0]) == Lp
                       else jnp.pad(flat, (0, Lp - int(flat.shape[0])),
                                    constant_values=4))
                rows2 = pad.reshape(-1, 128)
                idx = (wst // 128)[:, None] + \
                    jnp.arange(L // 128, dtype=i32)[None]
                v3 = rows2[idx]                 # (B, L/128, 128)
                if reverse:
                    v3 = jnp.flip(jnp.flip(v3, axis=1), axis=2)
                return v3.astype(i32)

            aseq3 = fetch(Aflat, awst)
            bseq3 = fetch(Bflat, bwst)

            st1, pool = jax.vmap(
                prologue, in_axes=(0, 0, 0, 0, 0, 0, None, None, None)
            )(abase, bbase, mida, k0, aoffp, boffp, Aflat, Bflat, ts)
            for nm in PLANES:
                st1.pop(nm)
            st1 = dict(st1, awst=awst, bwst=bwst,
                       oit=jnp.zeros_like(awst))
            pool = jnp.pad(pool, ((0, 0), (0, DBUF), (0, 0)))
            # relaunch bound: normal batches need 1 launch + one per
            # drop-buffer fill (<= P/DBUF more).  Lanes still live past the
            # bound overflow into the bit-exact host-oracle fallback — a
            # kernel-lowering livelock costs throughput, never correctness
            # or a wedged TPU worker.
            MAX_LAUNCH = i32(8 + 2 * (P // DBUF))

            def cond(c):
                st, pool, lcnt = c
                # stall_rest lanes carry live == 0 until the next launch
                # resolves the REACH rest bytes (see the XLA driver cond)
                return (((st["live"] == 1) |
                         (st["stall_rest"] == 1)).any()
                        & (lcnt < MAX_LAUNCH))

            def body(c):
                st, pool, lcnt = c
                st = kernel(st, aseq3, bseq3, LA, LB, ts, pave, msc, dsc)
                # flush the drop buffers into the pool (contiguous
                # append); the SoA plane restacks to (DBUF, 4) rows here
                base = jnp.clip(st["avail"] - st["dcnt"], 0, P)
                drows = jnp.stack(
                    [st["dbuf"][:, f * DBUF:(f + 1) * DBUF]
                     for f in range(4)], axis=2)
                pool = jax.vmap(
                    lambda pl_, b, rows: jax.lax.dynamic_update_slice(
                        pl_, rows, (b, 0))
                )(pool, base, drows)
                st = dict(st, dcnt=jnp.zeros_like(st["dcnt"]),
                          stall_dbuf=jnp.zeros_like(st["stall_dbuf"]))
                return (st, pool, lcnt + 1)

            st, pool, lcnt = jax.lax.while_loop(
                cond, body, (st1, pool, i32(0)))
            pool = pool[:, :P]
            overflow_f = jnp.where(st["live"] == 1, 1, st["overflow"])
            st = dict(st, overflow=overflow_f)
            return dict(_trim_extract(st, reverse),
                        morem=st["morem"], morea=st["morea"],
                        morey=st["morey"], mored=st["mored"],
                        moreha=st["moreha"], morehb=st["morehb"],
                        pool=pool, avail=st["avail"],
                        overflow=st["overflow"].astype(bool),
                        waves=st["dif"], iters=jnp.max(st["oit"]),
                        launches=lcnt, kit=st["kit"])

        return driver

    return make


def make_persistent_wrapped(W, P, BW, DBUF, G, L, reverse,
                            use_pallas=True, interpret=False,
                            packops=False, lanepack=False):
    """Persistent driver with the classic driver's signature: per-lane
    window starts are derived from the seed anchor inside the jit.  The
    window [x0 - MARGIN, x0 - MARGIN + L) (mirrored for the reverse wave)
    covers every extension whenever L >= max read length + 2*MARGIN — the
    engine picks L that way, so window-miss fallbacks are boundary-only."""
    drv = make_persistent_driver(W, P, BW, DBUF, G, reverse,
                                 use_pallas=use_pallas,
                                 interpret=interpret,
                                 packops=packops, lanepack=lanepack)(L)

    def fn(abase, bbase, mida, k0, aoffp, boffp, Aflat, Bflat,
           ts, pave, msc, dsc):
        x0 = (mida + k0) >> 1
        y0 = (mida - k0) >> 1
        # 128-pad the bound and align the starts down to 128 so the window
        # fetch is a row gather; MARGIN leaves ample slack for the shift
        LAp = -(-max(int(Aflat.shape[0]), L) // 128) * 128
        LBp = -(-max(int(Bflat.shape[0]), L) // 128) * 128
        if not reverse:
            awst = jnp.clip(abase + x0 - MARGIN, 0, LAp - L)
            bwst = jnp.clip(bbase + y0 - MARGIN, 0, LBp - L)
        else:
            awst = jnp.clip(abase + x0 + MARGIN - L, 0, LAp - L)
            bwst = jnp.clip(bbase + y0 + MARGIN - L, 0, LBp - L)
        awst = (awst // 128) * 128
        bwst = (bwst // 128) * 128
        return drv(abase, bbase, mida, k0, aoffp, boffp, awst, bwst,
                   Aflat, Bflat, ts, pave, msc, dsc)

    return fn


_DRIVER_CACHE = {}


def _cached_driver(key, builder):
    if os.environ.get("DAMAPPER_PALLAS_STEP"):
        return builder()    # eager step-debug mode: no jit, no cache
    # the ablation knobs are read at build time (make_segment), so they
    # must key the cache: an in-process A/B loop flipping them would
    # otherwise silently reuse the previous setting's compiled kernel
    key = key + (os.environ.get("DAMAPPER_WAVE_ABLATE", ""),
                 os.environ.get("DAMAPPER_WAVE_NOCOND", "0"))
    if key not in _DRIVER_CACHE:
        _DRIVER_CACHE[key] = jax.jit(builder())
    return _DRIVER_CACHE[key]


class PallasWaveEngine:
    """Drop-in WaveEngine whose _run uses the segment driver (pallas on
    accelerators, the identical XLA path on CPU).  All host-side logic
    (bucketing, trace extraction, fshort/rshort refinement, fallback) is
    inherited from WaveEngine."""

    def __new__(cls, spec, band_cap=None, pool_cap=2048, mesh=None,
                use_pallas=None, interpret=False, group=None,
                persistent=None, lanepack=None):
        from . import wave_jax

        if use_pallas is None:
            use_pallas = jax.devices()[0].platform != "cpu"
        defaulted_cap = band_cap is None
        _env_group = os.environ.get("DAMAPPER_WAVE_GROUP")
        # measured default: tools/pick_wave_mode.py writes the fastest
        # hardware-measured (persistent, packops, lanepack) triple here.
        # Explicit constructor args and env vars both override it; CPU runs
        # (tests, fallback benches) ignore it — the measurement is TPU-only.
        mode_file = {}
        if use_pallas and not interpret:
            try:
                import json as _json
                mode_file = _json.loads(
                    (pathlib.Path(__file__).parent.parent
                     / "wave_mode.json").read_text())
            except (OSError, ValueError):
                mode_file = {}
            # measurements only transfer to the platform they ran on
            if mode_file.get("platform") != jax.devices()[0].platform:
                mode_file = {}

        def _opt(arg, env, key):
            if arg is not None:
                return arg
            if env in os.environ:
                return os.environ[env] == "1"
            return bool(mode_file.get(key, False))

        persistent = _opt(persistent, "DAMAPPER_WAVE_PERSISTENT",
                          "persistent")
        packops = _opt(None, "DAMAPPER_WAVE_PACKOPS", "packops")
        lanepack = _opt(lanepack, "DAMAPPER_WAVE_LANEPACK", "lanepack")
        if defaulted_cap:
            # measured (round 3, tools/wave_kit.py): W=128 rows fill the
            # 128-lane vreg minor dim and halve reload stalls; the doubled
            # band capacity also cuts band-overflow host fallbacks.  CPU
            # (tests) keeps the smaller, faster-compiling shape; the
            # persistent kernel's dense in-VMEM code planes scale with
            # W*BW, so it stays at W=64 too.
            # lanepack pairs two 64-slot lanes per row (128-lane minor
            # fill), so it keeps W=64 — its measured win is at that shape
            band_cap = int(os.environ.get(
                "DAMAPPER_WAVE_BANDCAP",
                128 if (use_pallas and not persistent and not lanepack)
                else 64))
        if group is None:
            if _env_group is not None:
                group = int(_env_group)
            else:
                # measured at W=128 (classic): per-iteration cost is a
                # fixed ~30us plus ~2.2us/lane, so G=32 amortizes the
                # fixed part ~1.7x over G=8; G=64 regresses (VMEM
                # pressure).  The persistent kernel carries dense
                # (G, W, BW) code planes in VMEM, bounding it to small
                # groups.
                group = 8 if persistent else 32

        class _Engine(wave_jax.WaveEngine):
            def _get_fns(self, P):
                key = (P, self._L) if persistent else P
                if key not in self._fns:
                    common = (self.W, P, self._BW, self._DBUF, group,
                              use_pallas, interpret, persistent, self._L,
                              packops, lanepack)

                    def mk(reverse):
                        if persistent:
                            return make_persistent_wrapped(
                                self.W, P, self._BW, self._DBUF, group,
                                self._L, reverse=reverse,
                                use_pallas=use_pallas, interpret=interpret,
                                packops=packops, lanepack=lanepack)
                        return make_driver(
                            self.W, P, self._BW, self._DBUF, group,
                            reverse=reverse, use_pallas=use_pallas,
                            interpret=interpret, packops=packops,
                            lanepack=lanepack)

                    fwd = _cached_driver(common + (False,),
                                         lambda: mk(False))
                    rev = _cached_driver(common + (True,),
                                         lambda: mk(True))
                    self._fns[key] = (fwd, rev)
                return self._fns[key]

            def local_alignment_batch(self, Aflat, Bflat, Anp, Bnp, seeds):
                if persistent and seeds:
                    # window bucket: covers any extension of the longest
                    # read in the batch, pow2 to bound Mosaic compiles
                    span = max(s["alen"] for s in seeds)
                    self._L = max(2048, _pow2ceil(span + 2 * MARGIN))
                return super().local_alignment_batch(
                    Aflat, Bflat, Anp, Bnp, seeds)

            def _classic_twin(self):
                # retry tier for persistent-mode overflow lanes: the
                # persistent kernel marks a lane bad whenever its
                # pre-gathered VMEM window cannot serve a reload (window
                # miss), but the classic driver reloads from full sequence
                # memory and has no such limit.  Routing window misses
                # through it keeps them on the device; only true band/pool
                # overflows reach the (slow, bit-identical) host oracle.
                if getattr(self, "_twin", None) is None:
                    self._twin = PallasWaveEngine(
                        self.spec, band_cap=self.W, pool_cap=self.P,
                        mesh=self.mesh, use_pallas=use_pallas,
                        interpret=interpret, group=group,
                        persistent=False, lanepack=lanepack)
                return self._twin

            def _run(self, which, abase, bbase, mida, k0, aoffp, boffp,
                     Aflat, Bflat, sortkey=None):
                res = super()._run(which, abase, bbase, mida, k0,
                                   aoffp, boffp, Aflat, Bflat,
                                   sortkey=sortkey)
                if not persistent or os.environ.get(
                        "DAMAPPER_WAVE_RETRY", "1") != "1":
                    return res
                bad = np.flatnonzero(np.asarray(res.overflow))
                if len(bad) == 0:
                    return res
                tw = self._classic_twin()
                tw._activeP = self._activeP
                sub = tw._run(
                    which, *(np.asarray(v)[bad] for v in
                             (abase, bbase, mida, k0, aoffp, boffp)),
                    Aflat, Bflat,
                    sortkey=(None if sortkey is None
                             else np.asarray(sortkey)[bad]))
                self.n_winmiss += len(bad)
                # cell-updates telemetry: replace the bad lanes' aborted
                # wave counts with the classic run's real ones
                self.total_waves += int(sub.waves.sum())
                self.total_waves -= int(res.waves[bad].sum())
                for fld in res.__dataclass_fields__:
                    arr = getattr(res, fld)
                    if not arr.flags.writeable:
                        # unpacked results are views of the pulled buffer
                        arr = arr.copy()
                        setattr(res, fld, arr)
                    arr[bad] = getattr(sub, fld)
                return res

        eng = _Engine(spec, band_cap=band_cap, pool_cap=pool_cap, mesh=mesh)
        # measured: at W=128 a 256-wide window (128 slack) cuts driver
        # reload iterations ~25% at no per-iteration cost; explicit
        # band_cap callers keep the historical +64 window
        eng._BW = int(os.environ.get(
            "DAMAPPER_WAVE_BW",
            256 if (defaulted_cap and use_pallas and not persistent
                    and not lanepack)
            else max(128, band_cap + 64)))
        # persistent: a bigger drop buffer means the kernel usually runs a
        # whole lane to completion in ONE launch (drops per lane ~4*alen/TS)
        eng._DBUF = int(os.environ.get("DAMAPPER_WAVE_DBUF",
                                       "512" if persistent else "192"))
        eng._L = 0
        return eng
