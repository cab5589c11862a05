"""Block-local Pallas projection gather for campaign-scale node counts.

The combined projection gather — ``sol[n] = stacked_images[idx[n]] * w[n]``
with 1M+ static indices — is the single hottest op of the full production
config: XLA lowers it to per-element dynamic loads at ~3 ns/element
(~3 ms/frame at 1M nodes, 33% of the whole per-frame program; round-5
profile).  The reference pays the same cost shape as a per-frame SpMV
(cpp/lib/projection.ipp:884-905).

The indices are PHASE-0 CONSTANTS, so the expensive part — locality — can
be precomputed.  This module reorders nodes by the 8-image-row *slab* their
source pixel lives in and emits a Pallas kernel that, per output tile of
8x128 node slots, holds one (8, W) image slab VMEM-resident and picks each
node's pixel with lane-local ``take_along_axis`` selects (the only gather
form Mosaic supports: operand (8, 128), indices (8, 128), axis=1 — wider
shapes measured unsupported on this backend).  One pass reads each image
byte once instead of issuing 1M scattered HBM loads: ~45 MB of streamed
traffic vs ~3 ms of pointer chasing.

The kernel returns the gathered intensities in SLOT order (nodes grouped
by slab; padding fills each (slab-row, lane-tile) — measured 1.55x slots
at the 4-cam 2 MP 1M-node config, paid only in the cheap slot-space tail,
not in kernel work: empty lanes are weight-0 selects).  Callers keep the
node axis in slot order on device and un-permute ON THE HOST
(``SlabGather.node_slot``) after fetching — a np.take that overlaps
device compute; putting the inverse permutation on device would re-pay the
exact scattered-gather cost this kernel removes.  Overlap supersession
(``superseded_by``) is composed INTO the source indices at build time, and
per-node constants (skip mask, patch-overlay slots) are pre-permuted, so
no device-side consumer needs model order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8  # f32 sublane tile: a slab is 8 consecutive stacked-image rows
LANES = 128
TILES_PER_STEP = 8  # output tiles processed per grid step (TB)
SLAB_WINDOW = 8  # consecutive slabs resident per step (SB) — a step's
#                  tiles must fit this window; phase 0 inserts group breaks
#                  where the slab sequence jumps.  Per-grid-step overhead
#                  measured ~5.6 us on this backend, so the tile count per
#                  step — not the per-tile compute — sets the kernel's floor.


class SlabGather(NamedTuple):
    """Phase-0 product: the blocked gather plan (all arrays static)."""

    slab_of_tile: jax.Array  # (G,) int32 slab id per output tile
    col_idx: jax.Array  # (G, 8, 128) int32 source column, -1 at padding
    weight: jax.Array  # (G, 8, 128) f32 combined weight, 0 at padding
    # (G,) int32 first/last active 128-column tile per output tile — nodes
    # are column-sorted within each (slab, row), so a tile's sources span a
    # narrow window; the kernel predicates the column scan on this range
    coltile_lo: jax.Array
    coltile_hi: jax.Array
    # step grouping (G is a multiple of TILES_PER_STEP): each grid step
    # holds the x slabs [group_base[step], group_base[step]+SLAB_WINDOW)
    # and processes its TILES_PER_STEP tiles at relative slab rel_slab[g]
    group_base: jax.Array  # (G // TILES_PER_STEP,) int32
    rel_slab: jax.Array  # (G,) int32 in [0, SLAB_WINDOW)
    # (N,) int64 slot of each model node; zero-weight (invisible) nodes
    # point at the virtual slot ``n_slots`` whose value is defined 0 —
    # finalize_host extends the fetched array by one trailing zero
    node_slot: np.ndarray
    n_slots: int  # G * 8 * 128
    n_nodes: int
    width: int  # stacked-image width W
    n_rows: int  # stacked-image rows R = C * H

    @property
    def n_tiles(self) -> int:
        return int(self.slab_of_tile.shape[0])


def build_slab_gather(
    combined_index: np.ndarray,  # (N,) flat index into (C*H*W,)
    combined_weight: np.ndarray,  # (N,)
    superseded_by: np.ndarray,  # (N,) model overlap supersession map
    image_hw,  # (H, W) per camera
    n_cameras: int,
) -> SlabGather:
    """Blocked gather plan from the phase-0 combined projection.

    Supersession is composed here (slot s sources the pixel of
    ``primary(node(s))``), so the kernel output needs no follow-up
    per-frame gather at all.
    """
    H, W = image_hw
    R = n_cameras * H
    idx_all = np.asarray(combined_index, np.int64)[np.asarray(superseded_by)]
    w_all = np.asarray(combined_weight, np.float32)[np.asarray(superseded_by)]
    N_model = idx_all.shape[0]
    # zero-weight (invisible) nodes contribute nothing: excluding them from
    # the tiling keeps real fixtures (~50% invisible, all indexed pixel 0)
    # from piling thousands of tiles onto slab 0; they map to the virtual
    # zero slot instead
    visible = w_all > 0
    vis_nodes = np.nonzero(visible)[0]
    idx = idx_all[visible]
    w = w_all[visible]
    N = idx.shape[0]
    rows = idx // W
    cols = (idx % W).astype(np.int32)
    slab = (rows // SUBLANES).astype(np.int64)
    r_local = (rows % SUBLANES).astype(np.int64)

    # nodes per (slab, local-row); tiles per slab sized by the fullest row
    # sort by (slab, row, COLUMN): column order narrows each output tile's
    # source window so the kernel's column scan can be predicated
    order = np.lexsort((cols, r_local, slab))
    s_sorted = slab[order]
    r_sorted = r_local[order]
    # per (slab, r) counts
    key = s_sorted * SUBLANES + r_sorted  # aligned with sorted positions
    uniq, counts = np.unique(key, return_counts=True)
    count_sr = np.zeros((int(slab.max()) + 1, SUBLANES), np.int64)
    count_sr[uniq // SUBLANES, uniq % SUBLANES] = counts
    tiles_per_slab = np.ceil(count_sr.max(axis=1) / LANES).astype(np.int64)
    used = np.nonzero(tiles_per_slab)[0]
    tile_base = np.zeros_like(tiles_per_slab)
    tile_base[used] = np.cumsum(tiles_per_slab[used]) - tiles_per_slab[used]
    G = int(tiles_per_slab.sum())

    # slot of each node: tile = tile_base[slab] + rank_in_row // 128,
    # sublane = r_local, lane = rank_in_row % 128
    # rank within (slab, r): position in the stable sort minus group start
    # (``key`` is already in sorted-position alignment)
    rank = np.zeros(N, np.int64)
    flat_counts = count_sr.reshape(-1)
    starts = np.cumsum(flat_counts) - flat_counts
    pos = np.arange(N)
    rank[order] = pos - starts[key]

    tile = tile_base[slab] + rank // LANES
    lane = rank % LANES
    col_idx = np.full((G, SUBLANES, LANES), -1, np.int32)
    weight = np.zeros((G, SUBLANES, LANES), np.float32)
    col_idx[tile, r_local, lane] = cols
    weight[tile, r_local, lane] = w

    slab_of_tile = np.zeros(G, np.int32)
    for s in used:
        slab_of_tile[tile_base[s] : tile_base[s] + tiles_per_slab[s]] = s

    # --- step grouping: TILES_PER_STEP tiles per grid step, breaking when
    # the slab sequence leaves the SLAB_WINDOW x residency ----------------
    TB, SB = TILES_PER_STEP, SLAB_WINDOW
    # group bases are SB-ALIGNED because BlockSpec indices are block-
    # granular (an index_map value is multiplied by the block size); a
    # group breaks at TB tiles or when the next tile's slab leaves the
    # aligned window
    groups = []
    cur: list = []
    base_q = -1
    for t in range(G):
        s = int(slab_of_tile[t])
        if cur and (len(cur) == TB or s - base_q >= SB):
            groups.append(cur + [-1] * (TB - len(cur)))
            cur, base_q = [], -1
        if base_q < 0:
            base_q = (s // SB) * SB
        cur.append(t)
    if cur:
        groups.append(cur + [-1] * (TB - len(cur)))
    order2 = np.asarray(groups, np.int64).reshape(-1)  # (G2,), -1 = pad
    G2 = order2.shape[0]
    real = order2 >= 0
    safe = np.where(real, order2, 0)
    first = np.asarray([g[0] for g in groups])
    base_arr = (slab_of_tile[first] // SB) * SB
    group_base = (base_arr // SB).astype(np.int32)  # BLOCK index for x
    rel = np.where(
        real,
        slab_of_tile[safe] - np.repeat(base_arr, TB),
        0,
    ).astype(np.int32)

    col2 = np.where(real[:, None, None], col_idx[safe], -1)
    w2 = np.where(real[:, None, None], weight[safe], 0.0).astype(np.float32)
    slab2 = np.where(real, slab_of_tile[safe], np.repeat(group_base, TB))

    new_of_old = np.empty(G, np.int64)
    new_of_old[safe[real]] = np.nonzero(real)[0]
    tile_new = new_of_old[tile]
    slot = tile_new * (SUBLANES * LANES) + r_local * LANES + lane

    n_slots = G2 * SUBLANES * LANES
    node_slot = np.full(N_model, n_slots, np.int64)  # virtual zero slot
    node_slot[vis_nodes] = slot

    valid = col2 >= 0
    ct = np.where(valid, col2 // LANES, np.iinfo(np.int32).max)
    coltile_lo = ct.min(axis=(1, 2)).astype(np.int32)
    ct_hi = np.where(valid, col2 // LANES, -1)
    coltile_hi = ct_hi.max(axis=(1, 2)).astype(np.int32)
    coltile_lo[coltile_hi < 0] = 1  # empty tile: lo>hi skips the scan

    return SlabGather(
        slab_of_tile=jnp.asarray(slab2.astype(np.int32)),
        col_idx=jnp.asarray(col2),
        weight=jnp.asarray(w2),
        coltile_lo=jnp.asarray(coltile_lo),
        coltile_hi=jnp.asarray(coltile_hi),
        group_base=jnp.asarray(group_base),
        rel_slab=jnp.asarray(rel),
        node_slot=node_slot,
        n_slots=n_slots,
        n_nodes=N_model,
        width=W,
        n_rows=R,
    )


def finalize_host(plan: SlabGather, values, skipped=None) -> "np.ndarray":
    """Fetched (..., n_slots) slot-order values -> (..., N) model order.

    The inverse permutation runs on the HOST (np.take — overlaps device
    compute); doing it on device would re-pay the scattered-gather cost the
    kernel exists to remove.  ``skipped`` (model-order bool) applies the
    NaN mask the device path normally folds in.  (No concatenate: a
    trailing-zero extension would copy the whole fetched array; invisible
    nodes are masked after a clipped take instead.)
    """
    v = np.asarray(values)
    slot = np.minimum(plan.node_slot, plan.n_slots - 1).astype(np.intp)
    out = v[..., slot]
    invisible = plan.node_slot == plan.n_slots
    if invisible.any():
        out[..., invisible] = 0.0
    if skipped is not None:
        out[..., np.asarray(skipped)] = np.nan
    return out


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("n_rows", "width", "interpret")
)
def _slab_gather_apply(images, plan_gb, plan_rel, plan_col, plan_w, plan_lo,
                       plan_hi, n_rows, width, interpret):
    """(B, R*W) stacked flat images -> (B, n_slots) slot-order values.

    Grid = one step per TILES_PER_STEP output tiles; the x residency is a
    SLAB_WINDOW slab window in slab-major layout (one contiguous DMA), all
    frames of the batch ride inside the step, and each tile indexes its
    slab by a prefetched relative offset.  Per-grid-step overhead measured
    ~5.6 us on this backend, so the step count — not per-tile compute —
    sets the kernel floor; the column scan is additionally predicated on
    each tile's active column window (column-sorted tiles touch ~2 of ~15
    column tiles).
    """
    B = images.shape[0]
    G = plan_rel.shape[0]
    TB = TILES_PER_STEP
    n_steps = G // TB
    wpad = -(-width // LANES) * LANES
    x = images.reshape(B, n_rows, width)
    if wpad != width:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpad - width)))
    # frame-major slab view: (B, S, 8, wpad) is a pure RESHAPE of the
    # padded image stack (no copy) — earlier slab-major variants spent
    # 5-8x the kernel's own time in the transpose/relayout ops.  A step's
    # x window is then B strided runs of SLAB_WINDOW*8 contiguous rows.
    rpad = -(-n_rows // SUBLANES) * SUBLANES
    if rpad != n_rows:
        x = jnp.pad(x, ((0, 0), (0, rpad - n_rows), (0, 0)))
    S = rpad // SUBLANES
    spad = (-S) % SLAB_WINDOW
    if spad:
        x = jnp.pad(x, ((0, 0), (0, spad * SUBLANES), (0, 0)))
        S += spad
    x = x.reshape(B, S, SUBLANES, wpad)
    n_col_tiles = wpad // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (TB, SUBLANES, LANES),
                lambda g, gb, rel, lo, hi: (g, 0, 0),
            ),
            pl.BlockSpec(
                (TB, SUBLANES, LANES),
                lambda g, gb, rel, lo, hi: (g, 0, 0),
            ),
            pl.BlockSpec(
                (B, SLAB_WINDOW, SUBLANES, wpad),
                lambda g, gb, rel, lo, hi: (0, gb[g], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, TB, SUBLANES, LANES),
            lambda g, gb, rel, lo, hi: (0, g, 0, 0),
        ),
    )

    def kern(gb_ref, rel_ref, lo_ref, hi_ref, col_ref, w_ref, x_ref, o_ref):
        g = pl.program_id(0)
        o_ref[...] = jnp.zeros((B, TB, SUBLANES, LANES), jnp.float32)
        for ti in range(TB):
            lo = lo_ref[g * TB + ti]
            hi = hi_ref[g * TB + ti]
            rel = rel_ref[g * TB + ti]
            cols = col_ref[ti]
            w = w_ref[ti]
            for t in range(n_col_tiles):
                @pl.when((t >= lo) & (t <= hi))
                def _scan(t=t, ti=ti, rel=rel, cols=cols, w=w):
                    il = cols - t * LANES
                    hit = (il >= 0) & (il < LANES)
                    ilc = jnp.clip(il, 0, LANES - 1)
                    for b in range(B):
                        src = x_ref[
                            b, rel, :, t * LANES : (t + 1) * LANES
                        ].astype(jnp.float32)
                        sel = jnp.take_along_axis(src, ilc, axis=1)
                        o_ref[b, ti] = jnp.where(hit, sel * w, o_ref[b, ti])

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, G, SUBLANES, LANES), jnp.float32),
        interpret=interpret,
    )(plan_gb, plan_rel, plan_lo, plan_hi, plan_col, plan_w, x)
    return out.reshape(B, G * SUBLANES * LANES)


def slab_gather_apply(plan: SlabGather, images: jax.Array) -> jax.Array:
    """Apply the blocked gather.

    ``images``: (B, C*H*W) or (C*H*W,) stacked processed frames.
    Returns (B, n_slots) / (n_slots,) in SLOT order (see module docstring);
    padding slots carry 0.
    """
    squeeze = images.ndim == 1
    if squeeze:
        images = images[None]
    out = _slab_gather_apply(
        images, plan.group_base, plan.rel_slab, plan.col_idx, plan.weight,
        plan.coltile_lo, plan.coltile_hi,
        plan.n_rows, plan.width, _use_interpret(),
    )
    return out[0] if squeeze else out


def slab_gather_reference(plan: SlabGather, images: jax.Array) -> jax.Array:
    """Slow XLA oracle of the kernel (slot order), for tests."""
    squeeze = images.ndim == 1
    if squeeze:
        images = images[None]
    B = images.shape[0]
    G = plan.n_tiles
    wpad = -(-plan.width // LANES) * LANES
    x = images.reshape(B, plan.n_rows, plan.width)
    rows = plan.slab_of_tile[:, None, None] * SUBLANES + jnp.arange(
        SUBLANES, dtype=jnp.int32
    )[None, :, None]
    cols = jnp.clip(plan.col_idx, 0, plan.width - 1)
    vals = x[:, rows, cols]  # (B, G, 8, 128)
    vals = jnp.where(plan.col_idx[None] >= 0, vals, 0.0)
    out = (vals * plan.weight[None]).reshape(B, plan.n_slots)
    return out[0] if squeeze else out


def make_slab_gather_fn(plan: SlabGather):
    """Bind a plan into a per-frame callable that vmaps into the kernel's
    in-step frame batch (custom_vmap — the pallas batching rule would add a
    batch grid dimension and re-pay the per-step overhead per frame)."""

    @jax.custom_batching.custom_vmap
    def apply1(images: jax.Array) -> jax.Array:  # (C*H*W,) -> (n_slots,)
        return slab_gather_apply(plan, images)

    @apply1.def_vmap
    def _vmap(axis_size, in_batched, images):
        (b,) = in_batched
        if not b:
            images = jnp.broadcast_to(images, (axis_size,) + images.shape)
        return slab_gather_apply(plan, images), True

    return apply1


def expand_overlay_slots(plan: SlabGather, node_idx, superseded_by):
    """Map patch-overlay node ids to every SLOT that displays them.

    In model order the overlap adjustment (``sol[superseded_by]``) runs
    AFTER the overlay set, so superseded copies of an overlay node display
    the corrected value; the slab plan composes supersession into the
    gather instead, so the correction must be written to the slots of ALL
    nodes whose primary is the overlay node.  Returns (slots, sel) where
    ``sel`` indexes back into the input overlay entries.
    """
    node_idx = np.asarray(node_idx)
    sup = np.asarray(superseded_by)
    targets = np.isin(sup, node_idx)
    t_nodes = np.nonzero(targets)[0]
    # map each target's primary back to its overlay entry
    order = np.argsort(node_idx, kind="stable")
    pos = np.searchsorted(node_idx[order], sup[t_nodes])
    sel = order[pos]
    slots = plan.node_slot[t_nodes]
    real = slots < plan.n_slots  # drop virtual-slot (invisible) targets
    return slots[real].astype(np.int32), sel[real].astype(np.int32)
