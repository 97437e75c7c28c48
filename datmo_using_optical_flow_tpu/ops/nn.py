"""Batched brute-force 1-nearest-neighbor over padded point sets.

TPU-native replacement for the reference's per-point Python KDTree loops
(``GMFA/GMFA.py:84-91`` and :109-119 — its worst hot loop: one Python->C++ FLANN
call per point).  Here the whole N x M problem is tiled squared-distance matmuls
on the MXU with a running (min-dist, argmin) reduction — no tree, no host loop.

Sources are Morton-sorted before the Pallas kernel so each source block is
spatially compact; the kernel recenters every block on a representative point,
which drops the near-candidate d2 error from ~|p|^2*eps (~1e-4 at ROI scale —
as large as GMFA's 0.02^2 ICP gate) to ~alpha*(d+r)^2, and makes the kernel's
sound lower bound on the true min d2 tight enough to drive the
incremental-ICP exclusion shell (ops/icp.py).  Targets are NEVER reordered, so
first-minimum tie-breaking (KDTree/cKDTree parity) is preserved exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TILE = 512


@partial(jax.jit, static_argnames=())
def nearest_neighbors(src: jnp.ndarray, tgt: jnp.ndarray, tgt_mask: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point, the index + squared distance of its nearest valid tgt.

    ``src``: (N, 3); ``tgt``: (M, 3) padded; ``tgt_mask``: (M,) validity.
    Returns ``(idx (N,), sqdist (N,))``; if no valid target exists, idx = 0 and
    sqdist = +inf.  M is padded internally to the tile size.
    """
    idx, d2, _ = nearest_neighbors_with_bound(src, tgt, tgt_mask)
    return idx, d2


@partial(jax.jit, static_argnames=())
def nearest_neighbors_with_bound(src: jnp.ndarray, tgt: jnp.ndarray,
                                 tgt_mask: jnp.ndarray, cap2=None,
                                 tgt_order=None, src_order=None
                                 ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`nearest_neighbors` plus a SOUND lower bound on the true min d2
    per row (true NN d2 >= bound; equality-tight up to the kernel's per-tile
    error envelope).  The incremental-ICP shell (ops/icp.py) builds on it.

    ``cap2``: optional squared search cap (Pallas path only — the scan
    fallback stays exact, a valid instance of the capped contract): rows whose
    true NN d2 < cap2 are exact; other rows return a candidate (or idx 0 /
    d2 +inf) with d2 >= cap2.  Callers that only threshold the distance below
    ``sqrt(cap2)`` (GMFA's residual classifier) get identical decisions for a
    fraction of the sweep cost.

    ``tgt_order`` / ``src_order``: optional precomputed spatial permutations
    (see :func:`ops.nn_pallas.sort_order`) — one Morton argsort per cloud per
    frame instead of one per query; results are identical for any
    permutation, only pruning tightness varies."""
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    if nn_pallas.eligible(tgt.shape[0]):
        n = src.shape[0]
        index = nn_pallas.build_target_index(tgt, tgt_mask, order=tgt_order)
        order = (jnp.argsort(nn_pallas._morton_keys(src), stable=True)
                 if src_order is None else src_order)
        idx_s, d2_s, lo_s, _, crd_s = nn_pallas.nearest_neighbors_pallas(
            src[order], index, cap2=cap2)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        # un-permute with TWO gathers instead of five: XLA row gathers cost
        # ~constant per index for rows up to 32 bytes, so the f32 results ride
        # in one (n, 5) packed gather (idx keeps its own int gather — bitcasting
        # indices into the float row would risk denormal-flush on the way)
        packed = jnp.concatenate(
            [d2_s[:, None], lo_s[:, None], crd_s], axis=1)[inv]
        idx = idx_s[inv]
        d2, lo, crd = packed[:, 0], packed[:, 1], packed[:, 2:5]
        # exact d2 at the winner by direct subtraction of the kernel-returned
        # winner COORDS (no target gather): the sweep value carries the
        # recentered expansion's rounding; the returned distance should be
        # faithful to the returned neighbor
        diff = src.astype(jnp.float32) - crd
        exact = jnp.sum(diff * diff, axis=1)
        d2 = jnp.where(jnp.isfinite(d2), exact, d2)
        return idx, d2, jnp.minimum(lo, d2)
    idx, d2 = nearest_neighbors_scan(src, tgt, tgt_mask)
    return idx, d2, _scan_lower_bound(src, tgt, tgt_mask, d2)


def _scan_lower_bound(src, tgt, tgt_mask, d2):
    """Conservative error envelope for the un-recentered scan path: the
    expansion's absolute d2 error is bounded by ~10 ulp of (|s|^2 + max|t|^2)."""
    sn = jnp.sum(src.astype(jnp.float32) ** 2, axis=1)
    tn = jnp.where(tgt_mask, jnp.sum(tgt.astype(jnp.float32) ** 2, axis=1), 0.0)
    env = jnp.float32(2e-6) * (sn + jnp.max(tn)) + jnp.float32(1e-6)
    return jnp.maximum(d2 - env, 0.0)


@partial(jax.jit, static_argnames=())
def nearest_neighbors_scan(src: jnp.ndarray, tgt: jnp.ndarray,
                           tgt_mask: jnp.ndarray
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled-scan XLA fallback for target clouds too large for the Pallas
    kernel's VMEM-resident layout (> ops.nn_pallas.MAX_TARGET points)."""
    n = src.shape[0]
    m = tgt.shape[0]
    pad = (-m) % _TILE
    tgt_p = jnp.pad(tgt.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=3e18)
    mask_p = jnp.pad(tgt_mask, ((0, pad),))
    src = src.astype(jnp.float32)
    sn = jnp.sum(src * src, axis=1)

    def tile_step(carry, j):
        best_d, best_i = carry
        tile = jax.lax.dynamic_slice_in_dim(tgt_p, j * _TILE, _TILE, 0)
        tm = jax.lax.dynamic_slice_in_dim(mask_p, j * _TILE, _TILE, 0)
        tn = jnp.sum(tile * tile, axis=1)
        d2 = sn[:, None] + tn[None, :] - 2.0 * (src @ tile.T)
        d2 = jnp.where(tm[None, :], jnp.maximum(d2, 0.0), jnp.inf)
        ti = jnp.argmin(d2, axis=1)
        td = jnp.min(d2, axis=1)  # NOT take_along_axis: that would be a gather
        take = td < best_d
        return (jnp.where(take, td, best_d),
                jnp.where(take, ti + j * _TILE, best_i)), None

    init = (jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(tile_step, init,
                                       jnp.arange(tgt_p.shape[0] // _TILE))
    return best_i, best_d


def nearest_neighbors_active(src: jnp.ndarray, tgt: jnp.ndarray,
                             tgt_mask: jnp.ndarray, active: jnp.ndarray,
                             index=None, cap2=None, active_cap=None
                             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray, jnp.ndarray]:
    """1-NN for only the ``active`` subset of source rows; cost scales with
    the subset size (the cached-ICP hot path, :func:`ops.icp.registration_icp`).

    Returns ``(idx, d2, lower_bound, second_lower_bound, coords)`` — the same
    contract as :func:`nearest_neighbors_active_inplace`: active rows get
    exactly what the full query would return (bit-identical: each row's
    reduction is row-independent); inactive rows return idx=0 / +inf / +inf /
    0 / zeros.  ``second_lower_bound`` soundly bounds the distance to the
    closest target EXCLUDING the winner (the ICP winner-certificate input);
    ``coords`` are the winner's exact coordinates, selected in-kernel, so
    callers need no target gather.

    Active rows are compacted to the front by a STABLE PARTITION computed
    with one cumsum: callers keep ``src`` spatially sorted (ICP Morton-permutes
    its cloud once, outside the while_loop), and a stable partition preserves
    that order within the active prefix, so partitioned actives stay mutually
    Morton-coherent.  The partition's destination array is its own inverse
    permutation, so the per-iteration cost is one cumsum + one row scatter +
    two result gathers — replacing the previous stable argsort +
    scatter-invert + five separate gathers.  (With an unsorted ``src`` the
    results are still exact; only pruning tightness suffers.)

    ``cap2``: optional squared-distance search cap (see
    :func:`ops.nn_pallas.nearest_neighbors_pallas`): rows with true NN d2
    below the cap stay exact; rows above it return d2 >= cap2 with a sound
    lower bound.  The XLA fallback ignores it (always exact — a valid
    instance of the capped contract) and never certifies (second bound 0).

    ``active_cap`` (static, multiple of the kernel block size): when set and
    smaller than the cloud, iterations whose active count fits the cap run
    the kernel — and rebuild the per-iteration pruning table — over only the
    first ``active_cap`` partitioned rows (a ``lax.cond`` falls back to the
    full-width call otherwise, so every active row is always swept).  With
    the dynamic grid this cuts the two active-count-independent per-call
    costs at ICP's ~13% steady state: the 400-block table build (1.7 ms ->
    cap/cloud of it) and the skipped-block grid overhead (~2.4 ms -> 0)
    (r4 ``benchmarks/diag_nn_active.py``).  Bit-identical for active rows:
    the prefix blocks' contents, counts, and pruning bounds are unchanged.
    """
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    n = src.shape[0]
    srcf = src.astype(jnp.float32)
    if not nn_pallas.eligible(tgt.shape[0]):
        # fallback: full sweep, masked outputs (no savings, used by CPU tests
        # and oversized targets)
        idx, d2, lo = nearest_neighbors_with_bound(src, tgt, tgt_mask)
        crd = jnp.where(jnp.isfinite(d2)[:, None],
                        tgt.astype(jnp.float32)[idx], 0.0)
        act = active[:, None]
        return (jnp.where(active, idx, 0),
                jnp.where(active, d2, jnp.inf),
                jnp.where(active, lo, jnp.inf),
                jnp.zeros((n,), jnp.float32),
                jnp.where(act, crd, 0.0))

    if index is None:
        index = nn_pallas.build_target_index(tgt, tgt_mask)
    act32 = active.astype(jnp.int32)
    n_active = jnp.sum(act32)
    caps = (active_cap,) if isinstance(active_cap, int) else active_cap
    caps = tuple(c for c in (caps or ())
                 if c < n and c % nn_pallas._SRC_BLOCK == 0)
    if caps:
        def _make_small(capb):
            # Gather/scatter form of the partition (r5): instead of
            # stable-partitioning the FULL cloud (cumsum + n-row scatter) and
            # un-permuting with an n-row gather, find the active rows' indices
            # with one top_k over sign-flipped iota keys (ascending == stable,
            # so the gathered prefix keeps the caller's Morton coherence),
            # gather only the ``capb`` prefix, sweep it, and scatter the
            # results back to exactly the active rows.  Every per-iteration
            # O(n) memory op this removes was partition cost (r4
            # diag_icp_body: 1.29 ms/iteration at reference load); what
            # remains is O(capb).
            def _small(_):
                iota = jnp.arange(n, dtype=jnp.int32)
                sentinel = jnp.int32(-(2 ** 31) + 1)
                keys = jnp.where(active, -iota, sentinel)
                vals, _ = jax.lax.top_k(keys, capb)  # desc -idx == asc idx
                okay = vals > sentinel               # j < n_active
                rows = jnp.where(okay, -vals, 0)
                pre = srcf[rows]                     # (capb, 3) active prefix
                tbl = nn_pallas.build_block_table(pre, index, capb)
                i_, d_, l_, b_, c_ = nn_pallas.nearest_neighbors_pallas(
                    pre, index, n_active, cap2, block_table=tbl, dyn_grid=True)
                # one packed 28-byte-row scatter back to the active rows: f32
                # results bitcast to int32 ride with the winner index;
                # non-active garbage rows (okay False) are dropped via an
                # out-of-bounds destination.  The output starts as the
                # inactive constants (idx 0 / +inf / +inf / 0 / zero coords),
                # so no O(n) masking wheres are needed afterwards.  The
                # exact-d2 recompute happens AFTER the scatter, at full width
                # — the bit-identical expression shape of the uncapped path
                # (a (capb, 3) recompute lowers with different FMA
                # contraction and drifts 1 ulp).
                fpack = jnp.concatenate(
                    [d_[:, None], l_[:, None], b_[:, None], c_], axis=1)
                packed = jnp.concatenate(
                    [jax.lax.bitcast_convert_type(fpack, jnp.int32),
                     i_[:, None]], axis=1)
                inact = jnp.concatenate([
                    jax.lax.bitcast_convert_type(
                        jnp.array([jnp.inf, jnp.inf, 0.0, 0.0, 0.0, 0.0],
                                  jnp.float32), jnp.int32),
                    jnp.zeros((1,), jnp.int32)])
                # NOTE: dest is NOT unique (every dropped row maps to n), so
                # no unique_indices hint — "drop" handles the OOB rows
                dest = jnp.where(okay, rows, n)
                return jnp.broadcast_to(inact, (n, 7)).at[dest].set(
                    packed, mode="drop")

            return _small

        def _full(_):
            return _active_partition_full(srcf, active, act32, n_active, index,
                                          cap2, n)

        # tiered caps (ascending): the smallest tier that fits the active
        # count runs — ICP's steady state (~13-14k actives at reference load)
        # lands in the 16384 tier, halving the per-iteration table build and
        # gather/scatter sizes vs a single 32768 cap; prefix blocks, counts,
        # and pruning bounds are unchanged, so results stay bit-identical
        branch = _full
        for capb in sorted(caps, reverse=True):
            branch = (lambda nxt, small, cb: lambda op: jax.lax.cond(
                n_active <= cb, small, nxt, op))(branch, _make_small(capb), capb)
        out = branch(0)
    else:
        out = _active_partition_full(srcf, active, act32, n_active, index,
                                     cap2, n)
    fpart = jax.lax.bitcast_convert_type(out[:, :6], jnp.float32)
    idx = out[:, 6]
    d2, lo, b2, crd = fpart[:, 0], fpart[:, 1], fpart[:, 2], fpart[:, 3:6]
    # exact d2 at the winner by direct subtraction of the kernel-returned
    # winner coords, at FULL width on both branches (bit-identical lowering):
    # inactive rows carry d2 = +inf so the where keeps their constants
    diff = srcf - crd
    exact = jnp.sum(diff * diff, axis=1)
    d2 = jnp.where(jnp.isfinite(d2), exact, d2)
    lo = jnp.minimum(lo, d2)
    return idx, d2, lo, b2, crd


def _active_partition_full(srcf, active, act32, n_active, index, cap2, n):
    """Full-width active sweep via a cumsum stable partition (the pre-r5 form;
    the fallback when the active count exceeds ``active_cap``).  Returns the
    packed (n, 7) int32 result rows (6 bitcast f32 values + winner index),
    with inactive rows already holding the inactive constants."""
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    csum = jnp.cumsum(act32)
    ar = jnp.arange(n, dtype=jnp.int32)
    # stable-partition destination: actives keep their relative (Morton)
    # order at the front, inactives theirs at the back
    pos = jnp.where(active, csum - 1, n_active + (ar - csum))
    src_c = jnp.zeros((n, 3), jnp.float32).at[pos].set(srcf,
                                                       unique_indices=True)
    idx_s, d2_s, lo_s, b2_s, crd_s = nn_pallas.nearest_neighbors_pallas(
        src_c, index, n_active, cap2, dyn_grid=True)
    # un-permute with ONE gather (pos IS the inverse permutation): the six f32
    # results are bitcast to int32 and packed with the winner index into one
    # (n, 7) int32 row — 28 bytes, inside the ~constant-cost-per-index row
    # width; a gather is a pure memory op, so the float bit patterns (incl.
    # inf/NaN garbage rows) pass through the int path untouched and bitcast
    # back exactly.  The second (idx) gather this replaces cost ~0.4 ms per
    # ICP iteration at reference load (r4 diag_icp_body: each 102400-index
    # gather/scatter is per-index bound at ~4-5 ns/index).
    fpack = jnp.concatenate(
        [d2_s[:, None], lo_s[:, None], b2_s[:, None], crd_s], axis=1)
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(fpack, jnp.int32), idx_s[:, None]],
        axis=1)[pos]
    fpart = jax.lax.bitcast_convert_type(packed[:, :6], jnp.float32)
    idx = packed[:, 6]
    d2, lo, b2, crd = fpart[:, 0], fpart[:, 1], fpart[:, 2], fpart[:, 3:6]
    # the exact-d2-at-winner recompute happens in the CALLER (full width on
    # both branches, identical lowering); here only mask the inactive rows to
    # their constants
    idx = jnp.where(active, idx, 0)
    d2 = jnp.where(active, d2, jnp.inf)
    lo = jnp.where(active, lo, jnp.inf)
    b2 = jnp.where(active, b2, 0.0)
    crd = jnp.where(active[:, None], crd, 0.0)
    fout = jnp.concatenate([d2[:, None], lo[:, None], b2[:, None], crd], axis=1)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(fout, jnp.int32), idx[:, None]], axis=1)


def nearest_neighbors_active_inplace(src: jnp.ndarray, tgt: jnp.ndarray,
                                     tgt_mask: jnp.ndarray,
                                     active: jnp.ndarray, index, cap2=None,
                                     block_table=None, drift=None
                                     ) -> tuple[jnp.ndarray, jnp.ndarray,
                                                jnp.ndarray, jnp.ndarray,
                                                jnp.ndarray]:
    """Subset 1-NN with NO row movement: ``src`` must already be spatially
    coherent (Morton order — incremental ICP permutes its cloud once, outside
    the while_loop), and rows stay in place.  The kernel skips whole blocks
    whose per-block active count is zero; because the incremental shell's
    exclusion is spatially coherent, inactive rows cluster into whole blocks
    in Morton order and per-block skipping captures most of the compaction
    win without a per-iteration cumsum partition + four full-cloud
    gathers.  Active rows inside
    mixed blocks are computed exactly; inactive rows return idx=0 / +inf
    (their in-block sweep results are discarded)."""
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    n = src.shape[0]
    b = nn_pallas._SRC_BLOCK
    npad = -(-n // b) * b
    actp = jnp.pad(active, (0, npad - n))
    counts = jnp.sum(actp.astype(jnp.int32).reshape(-1, b), axis=1)
    # rewrite inactive rows to their block's FIRST row's coordinates: their
    # results are discarded anyway, and this keeps mixed blocks' bounding
    # balls tight — excluded or invalid (padded 1e9-coord) rows would
    # otherwise inflate the ball and defeat the tile pruning.  Sound: the
    # rows whose results are kept are unmodified and inside the ball.
    src_clean = nn_pallas.block_first_fill(src, active, n)
    idx, d2, lo, d2nd, crd = nn_pallas.nearest_neighbors_pallas(
        src_clean[:n], index, cap2=cap2, block_counts=counts,
        block_table=block_table, drift=drift)
    # exact d2 at the winner by direct subtraction of the kernel-returned
    # winner coordinates — rows stay in place, so this path has NO gather at
    # all (the ICP iteration's former hot glue)
    diff = src.astype(jnp.float32) - crd
    exact = jnp.sum(diff * diff, axis=1)
    d2 = jnp.where(jnp.isfinite(d2), exact, d2)
    lo = jnp.minimum(lo, d2)
    # d2nd: sound lower bound on the SECOND-nearest distance (winner
    # certificates, ops/icp.py) — 0.0 (never certifies) on inactive rows;
    # crd: winner coordinates (valid where d2 is finite)
    return (jnp.where(active, idx, 0), jnp.where(active, d2, jnp.inf),
            jnp.where(active, lo, jnp.inf), jnp.where(active, d2nd, 0.0),
            jnp.where(active[:, None], crd, 0.0))


def align_by_nearest(points: jnp.ndarray, reference: jnp.ndarray,
                     ref_mask: jnp.ndarray) -> jnp.ndarray:
    """Replace each point by its nearest valid reference point
    (the reference's NN 'alignment' for mismatched cloud sizes, GMFA.py:84-91)."""
    idx, _ = nearest_neighbors(points, reference, ref_mask)
    return reference[idx]
