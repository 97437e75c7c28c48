"""Pallas fused brute-force 1-NN with spatial tile pruning: the GMFA hot kernel.

Replaces the reference's per-point Python KDTree loops (``GMFA/GMFA.py:84-91``,
:109-119) at reference load (~10^5 x 10^5 points after x10 densification).
The whole padded target cloud sits in VMEM as (m_tiles, 8, _TGT_TILE) f32;
each _SRC_BLOCK-row source block runs matmul sweeps on the MXU with a running
(min, argmin) reduction, writing only (N,) results.

Two structural ideas make it fast AND precise:

* **Spatial pruning** (the KD-tree's job, reformulated fixed-shape): sources
  AND targets are Morton-sorted, so source blocks and target tiles are both
  spatially compact.  A precomputed (n_blocks, m_tiles) bounding-ball bound
  ``lb2[b, j] <= min dist^2 between any point of block b and tile j`` lets the
  kernel skip every tile that provably cannot beat the block's current worst
  row (tiles are visited nearest-first, so the skip threshold tightens after
  the first few tiles).  Tie-breaking stays EXACT: candidates carry their
  original indices, and d2 values are independent of tile membership, so
  "lowest original index among minima" is preserved bit-for-bit.

* **Block recentering**: the expansion ``|s|^2+|t|^2-2s.t`` at ROI-scale
  coordinates (|p| ~ 30 m) carries ~1e-4 absolute d2 noise — as large as
  GMFA's 0.02^2 ICP gate.  Every block recenters sources and targets on a
  block-representative point ``c`` with ``|t-c|^2`` by direct subtraction, so
  near-candidate d2 error drops to ~alpha*(d+r)^2, alpha ~ 1e-5.  The kernel
  also emits a SOUND per-row lower bound on the true min d2 (min of
  ``d2_cand - alpha*tn_cand`` over candidates seen; skipped tiles lie above
  ``lb2`` >= the row's running best, so the bound covers them) — the
  incremental-ICP exclusion shell (ops/icp.py) is built on it.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SRC_BLOCK = 256
_TGT_TILE = 256
# beyond this many padded target points the (M, 8) cloud no longer fits VMEM
# comfortably; callers fall back to the tiled-scan XLA path
MAX_TARGET = 1 << 18

# Per-candidate relative error envelope of the recentered expansion: the
# 8-term dot + norm sums + final combine accumulate <= ~10 ulps on operands
# bounded by (sn' + tn'_cand); 2^-23 * 10 * safety 4 ~ 5e-6 -> use 1e-5.
ALPHA = np.float32(1e-5)
# A bf16 hi/lo-split cross term (three bf16 passes: hi*hi + hi*lo + lo*hi
# with f32 accumulation, USE_HILO) was A/B'd on chip in r4 and REMOVED:
# 18.08 ms vs 17.16 ms for the unannotated f32 dot at the 102400^2
# reference sweep.  CAUTION (r4 precision audit): that unannotated dot's
# default MXU lowering rounds inputs far below f32 — it produced wrong
# winners on ~31% of rows at reference load (benchmarks/diag_icp_sound.py
# vs f64 KDTree truth).  The kernel therefore pins precision=HIGHEST
# (exact-f32 multi-pass; full sweep 12.25 -> 17.83 ms), which the ALPHA
# envelope below is budgeted for.  See PARITY.md "Round-4 precision audit".
# absolute slack (meters) subtracted from the geometric tile bound to cover
# its own f32 rounding
_LB_PAD = np.float32(1e-3)
# Cross-term matmul precision (r4 soundness audit, DATMO_NN_DOT_PRECISION to
# A/B): the f64-KDTree probe (benchmarks/diag_icp_sound.py) found wrong
# winners on ~31% of rows at reference load with d2 errors ~1e-4..1e-3 — the
# scale of the MXU's reduced-precision f32 lowering, not of true-f32 ulps.
# HIGHEST forces the exact-f32 multi-pass lowering.
import os as _os
_DOT_PRECISION = {
    "default": None, "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("DATMO_NN_DOT_PRECISION", "highest")]
_BIG_I = np.int32(2 ** 30)


class TargetIndex(NamedTuple):
    """Morton-sorted, VMEM-layout target structure (build once, query often —
    ICP re-queries the same target every iteration)."""
    packed: jnp.ndarray      # (m_tiles, 8, T) sorted recenterable coords
    tn: jnp.ndarray          # (m_tiles, 1, T) |t|^2, +inf where invalid
    tidx: jnp.ndarray        # (m_tiles, 1, T) int32 ORIGINAL indices
    tile_cent: jnp.ndarray   # (m_tiles, 3) tile bounding-box centers
    tile_rad: jnp.ndarray    # (m_tiles,) tile bounding radii (inf if empty)
    tile_lo: jnp.ndarray     # (m_tiles, 3) tile AABB mins (+inf if empty)
    tile_hi: jnp.ndarray     # (m_tiles, 3) tile AABB maxs (-inf if empty)


def _morton_keys(p: jnp.ndarray) -> jnp.ndarray:
    """int32 Morton (Z-order) codes of (N, 3) points, 10 bits/dim over the
    data's bounding box.  Only a spatial sort key — rounding is harmless."""
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    # one shared scale (cubic cells): per-dim normalization would stretch the
    # thin z extent of ground-plane clouds across the full key range and
    # destroy physical locality
    scale = 1023.0 / jnp.maximum(jnp.max(hi - lo), 1e-12)
    q = jnp.clip((p - lo) * scale, 0.0, 1023.0).astype(jnp.int32)  # (N, 3)
    key = jnp.zeros(p.shape[:1], jnp.int32)
    for bit in range(10):
        for d in range(3):
            key = key | (((q[:, d] >> bit) & 1) << (3 * bit + d))
    return key


def sort_order(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Morton order of a masked cloud (invalid rows last) — the spatial
    permutation :func:`build_target_index` applies.  Exposed so callers can
    compute it once and reuse it: a rigid transform preserves spatial
    coherence, so the order of a cloud indexed last frame (or registered this
    frame) is a valid — and equally tight — order for its transformed self
    (models/gmfa.py carries it across ICP, classification, and frames)."""
    ptsf = jnp.where(mask[:, None], pts.astype(jnp.float32), 0.0)
    key = jnp.where(mask, _morton_keys(ptsf), _BIG_I)
    return jnp.argsort(key, stable=True)


def build_target_index(tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                       order: jnp.ndarray | None = None) -> TargetIndex:
    """Morton-sort targets (invalid rows last) and precompute the VMEM layout
    plus per-tile bounding balls.

    ``order``: optional precomputed permutation (from :func:`sort_order`, or
    a carried order of a rigidly-moved copy of this cloud).  Correctness does
    not depend on it — tie-breaking uses original indices and invalid rows
    are masked per column — only pruning tightness does."""
    m = tgt.shape[0]
    mp = -(-m // _TGT_TILE) * _TGT_TILE
    tgtf = jnp.where(tgt_mask[:, None], tgt.astype(jnp.float32), 0.0)
    if order is None:
        key = _morton_keys(jnp.where(tgt_mask[:, None], tgtf, 0.0))
        key = jnp.where(tgt_mask, key, _BIG_I)  # invalid rows sort last
        order = jnp.argsort(key, stable=True)
    tgt_s = tgtf[order]
    mask_s = tgt_mask[order]
    tidx = order.astype(jnp.int32)

    tgt_p = jnp.pad(tgt_s, ((0, mp - m), (0, 5)))
    mask_p = jnp.pad(mask_s, ((0, mp - m),))
    tidx_p = jnp.pad(tidx, ((0, mp - m),))
    tn = jnp.sum(tgt_p * tgt_p, axis=1)
    tn = jnp.where(mask_p, tn, jnp.inf)

    m_tiles = mp // _TGT_TILE
    pts = tgt_p[:, :3].reshape(m_tiles, _TGT_TILE, 3)
    mtile = mask_p.reshape(m_tiles, _TGT_TILE)
    lo = jnp.min(jnp.where(mtile[:, :, None], pts, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(mtile[:, :, None], pts, -jnp.inf), axis=1)
    has = jnp.any(mtile, axis=1)
    cent = jnp.where(has[:, None], (lo + hi) * 0.5, 0.0)
    rad = jnp.where(
        has,
        jnp.max(jnp.linalg.norm(
            jnp.where(mtile[:, :, None], pts - cent[:, None, :], 0.0),
            axis=2), axis=1),
        -jnp.inf)  # empty tile: lb = +inf below -> always skipped

    return TargetIndex(
        packed=tgt_p.reshape(m_tiles, _TGT_TILE, 8).transpose(0, 2, 1),
        tn=tn.reshape(m_tiles, 1, _TGT_TILE),
        tidx=tidx_p.reshape(m_tiles, 1, _TGT_TILE),
        tile_cent=cent, tile_rad=rad, tile_lo=lo, tile_hi=hi)


def _kernel(na_ref, cap_ref, lb_hbm, to_hbm, tgt_ref, tn_ref, tidx_ref, src_ref,
            cent_row_ref, cent_col_ref, di_ref, dd_ref, dl_ref, d2nd_ref,
            wx, wy, wz, bd, bi, bl, bmax, s1, s2, sm2, s1t, bti,
            lb_s, to_s, sems, *, m_tiles: int):
    t = pl.program_id(0)

    # blocks with no active source row (na_ref[t] == 0) skip the target sweep
    # entirely: the per-iteration cost of the incremental-ICP path (ops/icp.py)
    # scales with the number of re-queried points, not N.  The count is
    # per-block so callers can skip blocks either by compaction (active rows
    # partitioned to the front) or in place (exclusion is spatially coherent
    # in Morton order, so inactive rows cluster into whole blocks).
    @pl.when(na_ref[t] > 0)
    def _():
        # the (n_blocks, m_tiles) pruning tables live in HBM (too large for
        # SMEM whole); each block DMAs its own row into scalar memory
        c1 = pltpu.make_async_copy(lb_hbm.at[t], lb_s, sems.at[0])
        c2 = pltpu.make_async_copy(to_hbm.at[t], to_s, sems.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()
        _kernel_body(t, cap_ref, lb_s, to_s, tgt_ref, tn_ref, tidx_ref, src_ref,
                     cent_row_ref, cent_col_ref, di_ref, dd_ref, dl_ref,
                     d2nd_ref, wx, wy, wz, bd, bi, bl, bmax, s1, s2, sm2,
                     s1t, bti, m_tiles=m_tiles)

    @pl.when(na_ref[t] == 0)
    def _():
        di_ref[...] = jnp.zeros_like(di_ref)
        dd_ref[...] = jnp.full_like(dd_ref, jnp.inf)
        dl_ref[...] = jnp.full_like(dl_ref, jnp.inf)
        d2nd_ref[...] = jnp.full_like(d2nd_ref, jnp.inf)
        wx[...] = jnp.zeros_like(wx)
        wy[...] = jnp.zeros_like(wy)
        wz[...] = jnp.zeros_like(wz)


def _kernel_body(t, cap_ref, lb_ref, j0_ref, tgt_ref, tn_ref, tidx_ref, src_ref,
                 cent_row_ref, cent_col_ref, di_ref, dd_ref, dl_ref, d2nd_ref,
                 wx, wy, wz, bd, bi, bl, bmax, s1, s2, sm2, s1t, bti,
                 *, m_tiles: int):
    alpha = ALPHA
    # everything stays 2-D with keepdims: Mosaic cannot shape-cast between
    # (B,) / (B, 1) / (rows, 128) vector layouts
    cent_row = cent_row_ref[0][0:1, :]      # (1, 8) block representative
    cent_col = cent_col_ref[0][:, 0:1]      # (8, 1) same, coords on sublanes
    sp = src_ref[...] - cent_row            # (B, 8) recentered sources
    sn = jnp.sum(sp * sp, axis=1, keepdims=True)            # (B, 1)
    cap2 = cap_ref[0]

    bd[...] = jnp.full_like(bd, jnp.inf)    # running min of (d2 - sn)
    bi[...] = jnp.full_like(bi, _BIG_I)
    bl[...] = jnp.full_like(bl, jnp.inf)
    # Second-nearest lower bound (ops/icp.py winner certificates).  Any
    # non-winner point's true d2 is >= its own tile's slacked minimum m1
    # (points sharing the winner's tile: >= that tile's slacked SECOND
    # minimum, covered by sm2 = min over tiles of slacked t2 — global, so
    # looser but sound).  The bound is therefore
    #     min( smallest m1 over tiles OTHER than the winner's , sm2 )
    # realized by tracking the two smallest m1 WITH the s1 achiever's tile id
    # (s1t) and the winner's tile id (bti): if the winner's tile achieved s1,
    # the min-over-others is s2, else s1.  Skipped tiles are covered by the
    # ascending-order break floor at the end.
    s1[...] = jnp.full_like(s1, jnp.inf)
    s2[...] = jnp.full_like(s2, jnp.inf)
    sm2[...] = jnp.full_like(sm2, jnp.inf)
    s1t[...] = jnp.full_like(s1t, -1)
    bti[...] = jnp.full_like(bti, -2)       # != s1t init: no spurious match
    wx[...] = jnp.zeros_like(wx)
    wy[...] = jnp.zeros_like(wy)
    wz[...] = jnp.zeros_like(wz)
    # capped search (ops/icp.py): rows are only owed an exact NN when their
    # true d2 < cap2; a tile provably farther than cap2 from every row is
    # skipped even while some row still has no candidate (bd=inf).  cap2=inf
    # recovers the exact-NN sweep bit-for-bit.
    bmax[0, 0] = cap2                       # max over rows of absolute best d2

    def tile_cond(j):
        # bounding-ball skip: no point of a tile with lb > bmax can beat the
        # block's current worst row (or the search cap).  lb_ref is sorted
        # ascending and bmax only decreases, so the FIRST failing tile ends
        # the block exactly — a while-break instead of m_tiles scalar loop
        # iterations (the dominant per-block cost once the cap prunes the
        # sweep to a handful of tiles).
        return (j < m_tiles) & (lb_ref[0, j] <= bmax[0, 0])

    def tile_step(j):
        jt = j0_ref[0, j]                   # tiles in ascending-lb order
        tile = tgt_ref[jt]                  # (8, T): lane dim = points
        tn_raw = tn_ref[jt]                 # (1, T) +inf where invalid
        tidx = tidx_ref[jt]                 # (1, T) original indices
        tp = tile - cent_col                # (8, T) recentered targets
        tpn = jnp.sum(tp * tp, axis=0, keepdims=True)   # (1, T) exact-ish
        tn = jnp.where(tn_raw < jnp.float32(3e38), tpn, jnp.inf)
        cross = jax.lax.dot_general(
            sp, tp, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION)
        # sn is constant per row: left out of the (B, T) pass (it shifts
        # every candidate equally, so the argmin is unchanged), added back
        # after the reductions
        d2 = tn - 2.0 * cross               # (B, T)
        td = jnp.min(d2, axis=1, keepdims=True)
        # lowest ORIGINAL index among the minima (== first-min over the
        # unsorted target order: d2 values do not depend on tile
        # membership, so sorting cannot change which candidates tie)
        ti = jnp.min(jnp.where(d2 == td, tidx, _BIG_I), axis=1,
                     keepdims=True)
        finite = td < jnp.float32(3e38)
        take = (td < bd[...]) | ((td == bd[...]) & finite & (ti < bi[...]))
        # sound per-TILE lower bound: true min d2 over the tile's valid
        # points >= td - alpha*max(tpn) (each candidate's computed d2 is
        # within alpha*its tpn of truth; the max costs (1,T) + (B,1) ops
        # instead of the old per-candidate (B,T) subtract + min — two
        # full-size VPU passes saved per surviving tile).  alpha*sn is
        # folded in after the loop.
        maxtpn = jnp.max(jnp.where(tn_raw < jnp.float32(3e38), tpn, 0.0))
        tl = td - alpha * maxtpn
        # second-nearest tracking: the tile's second-smallest computed d2
        # (an equal-valued tie means the second IS td), slacked like tl
        n_min = jnp.sum(jnp.where(d2 == td, 1.0, 0.0), axis=1, keepdims=True)
        t2raw = jnp.min(jnp.where(d2 == td, jnp.inf, d2), axis=1, keepdims=True)
        t2 = jnp.where(n_min > 1.0, td, t2raw)
        sm2[...] = jnp.minimum(sm2[...], t2 - alpha * maxtpn)
        is_new_min = tl < s1[...]
        s2[...] = jnp.where(is_new_min, s1[...], jnp.minimum(s2[...], tl))
        s1t[...] = jnp.where(is_new_min, jt, s1t[...])
        s1[...] = jnp.where(is_new_min, tl, s1[...])
        # winner COORDINATES via the (d2, index)-unique one-hot — callers get
        # them without any post-hoc full-cloud gather (ops/icp.py carries
        # them across iterations; exact d2 becomes an elementwise subtract)
        msel = jnp.where((d2 == td) & (tidx == ti), 1.0, 0.0)
        bti[...] = jnp.where(take, jt, bti[...])
        bi[...] = jnp.where(take, ti, bi[...])
        bd[...] = jnp.where(take, td, bd[...])
        for c, ref in enumerate((wx, wy, wz)):
            sel = jnp.sum(msel * tile[c:c + 1, :], axis=1, keepdims=True)
            ref[...] = jnp.where(take, sel, ref[...])
        bl[...] = jnp.minimum(bl[...], tl)
        bmax[0, 0] = jnp.minimum(jnp.max(bd[...] + sn), cap2)
        return j + 1

    j_fin = jax.lax.while_loop(tile_cond, tile_step, jnp.int32(0))
    best_i = bi[...]
    di_ref[...] = jnp.where(best_i == _BIG_I, 0, best_i)
    dd_ref[...] = jnp.maximum(bd[...] + sn, 0.0)
    # capped rows (no candidate, or candidates above cap2): every skipped tile
    # lies above min(bmax, cap2), so cap2 itself is a sound bound there
    dl_ref[...] = jnp.maximum(
        jnp.minimum(bl[...] + (1.0 - alpha) * sn - alpha, cap2), 0.0)
    # skipped tiles all lie at/above the break tile's (ascending) bound — the
    # per-block floor of the second-nearest bound
    floor_abs = jnp.where(j_fin < m_tiles,
                          lb_ref[0, jnp.minimum(j_fin, m_tiles - 1)], jnp.inf)
    other_min = jnp.where(bti[...] == s1t[...], s2[...], s1[...])
    second = jnp.minimum(other_min, sm2[...])
    d2nd_ref[...] = jnp.maximum(
        jnp.minimum(second + (1.0 - alpha) * sn - alpha, floor_abs), 0.0)


def block_first_fill(src: jnp.ndarray, keep: jnp.ndarray,
                     n: int | None = None) -> jnp.ndarray:
    """Rewrite rows where ``keep`` is False to their _SRC_BLOCK-block's first
    ACTIVE row's coordinates (array tail padded with edge rows).  Returns the
    padded (npad, 3) cloud.  The representative must be a kept row: the kernel
    recenters on row 0 (``cent = blocks[:, 0]``), and recentering on a
    sentinel/garbage row would cost f32 precision on every active row of a
    mixed block (near-tie winner flips at GMFA's 0.02^2 gate).  Blocks with no
    kept row keep row 0 — their sweep is skipped and results discarded.

    Pruning soundness does NOT require the block-table build (ops/icp.py) and
    the in-place subset query (ops/nn.py) to pick the SAME representative —
    only that every filled row lands inside the build-time ball (+drift),
    which any kept row satisfies (query keep-sets are subsets of build
    keep-sets)."""
    n = src.shape[0] if n is None else n
    b = _SRC_BLOCK
    npad = -(-n // b) * b
    srcp = jnp.pad(src.astype(jnp.float32)[:n], ((0, npad - n), (0, 0)),
                   mode="edge")
    keepp = jnp.pad(keep[:n], (0, npad - n))
    rows = srcp.reshape(-1, b, 3)
    first_active = jnp.argmax(keepp.reshape(-1, b), axis=1)  # 0 if none kept
    rep = jnp.take_along_axis(rows, first_active[:, None, None], axis=1)
    rep = jnp.broadcast_to(rep, (npad // b, b, 3)).reshape(npad, 3)
    return jnp.where(keepp[:, None], srcp, rep)


def build_block_table(src: jnp.ndarray, index: TargetIndex,
                      n: int | None = None
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(source block, target tile) pruning table: LINEAR bounding-ball
    lower bounds sorted ascending per block, plus the tile visit order.
    Lane-aligned/padded with +inf, ready for the kernel's HBM->SMEM row DMA.

    Reusable across rigid drift (ops/icp.py): if every source point has moved
    at most ``drift`` since the table was built, ``max(lb - drift, 0)`` is a
    sound bound for the moved cloud, and a uniform scalar subtraction
    preserves the ascending order exactly — so the per-sweep block-ball
    norms + row argsort happen ONCE per ICP instead of once per iteration."""
    n = src.shape[0] if n is None else n
    np_ = -(-n // _SRC_BLOCK) * _SRC_BLOCK
    n_blocks = np_ // _SRC_BLOCK
    srcf = jnp.pad(src.astype(jnp.float32)[:n], ((0, np_ - n), (0, 0)),
                   mode="edge")
    blocks = srcf.reshape(n_blocks, _SRC_BLOCK, 3)
    blo = jnp.min(blocks, axis=1)
    bhi = jnp.max(blocks, axis=1)
    bc = (blo + bhi) * 0.5
    br = jnp.max(jnp.linalg.norm(blocks - bc[:, None, :], axis=2), axis=1)
    d_ct = jnp.linalg.norm(bc[:, None, :] - index.tile_cent[None, :, :], axis=2)
    ball = d_ct - br[:, None] - index.tile_rad[None, :]
    # AABB gap bound: Morton blocks/tiles are box-shaped, and the
    # per-dimension gap norm is far tighter than center-distance minus ball
    # radii (a ~2.3 m cube's half-diagonal is ~2 m of pure slack — the r2
    # "pruning ceiling"; for tiles two cells away the gap bound is ~4x
    # tighter).  Sound: for any p in the block box and q in the tile box,
    # |p_d - q_d| >= gap_d per dimension.  Both bounds are valid — take the
    # larger.  Drift reuse is unaffected (any lower bound minus the max
    # displacement stays a lower bound).
    gap = jnp.maximum(
        jnp.maximum(index.tile_lo[None, :, :] - bhi[:, None, :],
                    blo[:, None, :] - index.tile_hi[None, :, :]), 0.0)
    aabb = jnp.linalg.norm(gap, axis=2)
    lb = jnp.maximum(jnp.maximum(ball, aabb) - _LB_PAD, 0.0)
    lb = jnp.where(jnp.isfinite(index.tile_rad)[None, :], lb, jnp.inf)
    m_tiles = index.packed.shape[0]
    torder = jnp.argsort(lb, axis=1).astype(jnp.int32)
    lb = jnp.take_along_axis(lb, torder, axis=1)
    mt_pad = (-m_tiles) % 128
    lb = jnp.pad(lb, ((0, 0), (0, mt_pad)), constant_values=jnp.inf)
    torder = jnp.pad(torder, ((0, 0), (0, mt_pad)))
    return lb, torder


def nearest_neighbors_pallas(src: jnp.ndarray, index: TargetIndex,
                             n_active: jnp.ndarray | None = None,
                             cap2: jnp.ndarray | None = None,
                             block_counts: jnp.ndarray | None = None,
                             block_table=None, drift=None,
                             dyn_grid: bool = False
                             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray, jnp.ndarray]:
    """1-NN of each ``src`` row among the index's valid targets.

    Returns ``(idx, sqdist, sqdist_lower_bound, second_lower_bound, coords)``:
    idx in ORIGINAL target numbering with first-min tie-breaking (0 when no
    valid target, sqdist +inf); both bounds are SOUND (true value >= bound),
    tight when sources arrive spatially sorted
    (:func:`ops.nn.nearest_neighbors_with_bound`).  ``second_lower_bound``
    bounds the distance to the closest target EXCLUDING the winner (+inf on
    skipped blocks) — the ICP winner-certificate input.  ``coords`` are the
    winner's exact (x, y, z) selected in-kernel (zeros when no candidate) so
    callers need no post-hoc target gather.

    ``n_active`` (scalar int32): only the first ``n_active`` source rows are
    queried; whole source blocks past it skip the sweep (idx=0 / +inf out).

    ``block_counts`` ((n_blocks,) int32, overrides ``n_active``): per-block
    active-row counts for IN-PLACE subset queries — rows stay where they are
    and whole blocks with count 0 skip the sweep (garbage idx=0 / +inf out for
    their rows).  Exclusion in the incremental-ICP shell is spatially
    coherent, so in Morton order inactive rows cluster into whole blocks and
    the compaction permutation (cumsum + 4 full-cloud gathers per iteration)
    can be dropped entirely (:func:`ops.nn.nearest_neighbors_active_inplace`).

    ``cap2`` (scalar float32, default +inf = exact sweep): search cap on
    squared distance.  Rows whose true NN d2 is below ``cap2`` get exactly the
    uncapped result (same winner, same tie-breaking); other rows may return
    any candidate (or idx=0 / +inf) with d2 >= cap2, and the returned lower
    bound stays sound (true d2 >= bound, with bound <= cap2).  Tiles provably
    farther than ``cap2`` from the whole block are skipped even before every
    row has a candidate — the incremental-ICP sweep (ops/icp.py) only needs
    exact NNs inside the correspondence gate, so it caps the search a safety
    margin above it.

    ``dyn_grid`` (compact-prefix callers only): launch a DYNAMIC grid of
    ``ceil(n_active / _SRC_BLOCK)`` blocks instead of the static full grid.
    Mosaic supports traced grid bounds; blocks past the active prefix are
    never visited, so their output rows are UNINITIALIZED GARBAGE — callers
    must mask everything at or beyond ``n_active`` (``nearest_neighbors_active``
    does).  At ICP's steady state (~13% active) this removes the ~2-3 ms of
    skipped-block grid overhead the static launch pays per call (r4
    ``benchmarks/diag_nn_active.py``).  Ignored in interpret mode (the
    interpreter needs a concrete grid); active rows' results are bit-identical
    either way, so the CPU test path still pins the TPU path's values.
    """
    n = src.shape[0]
    np_ = -(-n // _SRC_BLOCK) * _SRC_BLOCK
    n_blocks = np_ // _SRC_BLOCK
    m_tiles = index.packed.shape[0]
    if n_active is None:
        n_active = jnp.int32(n)
    if cap2 is None:
        cap2 = jnp.float32(jnp.inf)
    if block_counts is None:
        block_counts = jnp.clip(
            jnp.asarray(n_active, jnp.int32)
            - jnp.arange(n_blocks, dtype=jnp.int32) * _SRC_BLOCK,
            0, _SRC_BLOCK)

    srcf = src.astype(jnp.float32)
    # pad rows with the last row's coords (zeros would drag block bounding
    # balls toward the origin), feature columns with zeros
    srcf = jnp.pad(srcf, ((0, np_ - n), (0, 0)), mode="edge")
    srcf = jnp.pad(srcf, ((0, 0), (0, 5)))

    blocks = srcf.reshape(n_blocks, _SRC_BLOCK, 8)[:, :, :3]
    cent = blocks[:, 0, :]                                   # representative

    if block_table is None:
        lb_lin, torder = build_block_table(src, index, n)
    else:
        lb_lin, torder = block_table
    if drift is not None:
        # the table was built from positions now displaced by <= drift: each
        # linear bound shrinks by at most drift, and a uniform scalar
        # subtraction preserves the ascending visit order exactly
        lb_lin = jnp.maximum(lb_lin - jnp.asarray(drift, jnp.float32), 0.0)
    lb2 = jnp.where(jnp.isfinite(lb_lin), lb_lin * lb_lin, jnp.inf)

    centp = jnp.pad(cent, ((0, 0), (0, 5)))
    kernel = partial(_kernel, m_tiles=m_tiles)
    interpret = jax.default_backend() == "cpu"
    grid_b = n_blocks
    if dyn_grid and not interpret:
        # visit only the active prefix's blocks; unvisited rows are garbage
        # the caller masks (docstring above)
        grid_b = jnp.clip(
            (jnp.asarray(n_active, jnp.int32) + _SRC_BLOCK - 1) // _SRC_BLOCK,
            1, n_blocks)
    idx, d2, lo, d2nd, wxo, wyo, wzo = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(grid_b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),   # (1,) n_active
                  pl.BlockSpec(memory_space=pltpu.SMEM),   # (1,) cap2
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # lb2 rows
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # tile order
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # (m_tiles, 8, T)
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # (m_tiles, 1, T)
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # (m_tiles, 1, T)
                  pl.BlockSpec((_SRC_BLOCK, 8), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),   # coords on lanes
                  pl.BlockSpec((1, 8, 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],  # coords on sublanes
        out_specs=tuple(pl.BlockSpec((_SRC_BLOCK, 1), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(7)),
        out_shape=(jax.ShapeDtypeStruct((np_, 1), jnp.int32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.float32),  # bd
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.int32),    # bi
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.float32),  # bl
            pltpu.SMEM((1, 1), jnp.float32),           # bmax
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.float32),  # s1
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.float32),  # s2
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.float32),  # sm2
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.int32),    # s1t
            pltpu.VMEM((_SRC_BLOCK, 1), jnp.int32),    # bti
            pltpu.SMEM((1, m_tiles + (-m_tiles) % 128), jnp.float32),  # lb row
            pltpu.SMEM((1, m_tiles + (-m_tiles) % 128), jnp.int32),    # order row
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(jnp.asarray(block_counts, jnp.int32).reshape(n_blocks),
      jnp.asarray(cap2, jnp.float32).reshape(1), lb2[:, None, :],
      torder[:, None, :],
      index.packed, index.tn, index.tidx, srcf,
      jnp.broadcast_to(centp[:, None, :], (n_blocks, 8, 8)),
      jnp.broadcast_to(centp[:, :, None], (n_blocks, 8, 8)))
    coords = jnp.concatenate([wxo, wyo, wzo], axis=1)[:n]
    return idx[:n, 0], d2[:n, 0], lo[:n, 0], d2nd[:n, 0], coords


def eligible(m: int) -> bool:
    return m <= MAX_TARGET
