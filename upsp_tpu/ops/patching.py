"""Fiducial patching: cover marker dots with a smooth local polynomial fill.

The reference fits a 3rd-order 2D polynomial to each cluster's boundary-ring
pixels and overwrites the interior, every frame (cpp/lib/patches.ipp — studied,
not copied).  The fit+eval is *linear* in the boundary values, so Phase 0
precomputes, per cluster, the composed operator

    M = A_internal @ pinv(A_boundary)        (I x B)

and the per-frame patch application becomes: gather boundary pixels -> one
batched (clusters, I, B) matmul on the MXU -> scatter interiors.  Bit-identical
math to fit-then-eval, at a fraction of the cost, and fully fused into the
per-frame XLA program.

Cluster construction (host, Phase 0 only — data-dependent):
- per-target bounding boxes from image-plane diameter,
- BFS clustering of overlapping boxes (patches.ipp:cluster_points semantics),
- row/column convex fill of the cluster mask, boundary ring of thickness
  ``bound_pts`` offset by ``buffer`` (patches.ipp:get_cluster_boundary),
- boundary pixels darker than a histogram threshold are dropped
  (PatchClusters::threshold_bounds).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side cluster construction


@dataclasses.dataclass
class PatchCluster:
    bounds_xy: np.ndarray  # (B, 2) int boundary pixel coords (x, y)
    internal_xy: np.ndarray  # (I, 2) int interior pixel coords


def _target_box(uv: np.ndarray, diameter: float) -> Tuple[np.ndarray, np.ndarray]:
    t_min = np.floor(uv - 0.5 * diameter).astype(np.int64)
    t_max = np.ceil(uv + 0.5 * diameter).astype(np.int64)
    return t_min, t_max


def cluster_targets(
    uv: np.ndarray, diameters: np.ndarray, bound_pts: int = 4
) -> List[np.ndarray]:
    """Group targets whose patch regions would touch (BFS, brute force)."""
    n = uv.shape[0]
    unvisited = set(range(n))
    clusters = []
    while unvisited:
        seed = min(unvisited)
        unvisited.discard(seed)
        members = [seed]
        queue = [seed]
        while queue:
            ref = queue.pop()
            close = []
            for j in list(unvisited):
                lim = bound_pts + 0.5 * (diameters[ref] + diameters[j])
                if np.linalg.norm(uv[ref] - uv[j]) <= lim:
                    close.append(j)
            for j in close:
                unvisited.discard(j)
                members.append(j)
                queue.append(j)
        clusters.append(np.array(members, np.int64))
    return clusters


def _single_target_boundary(
    uv: np.ndarray, diameter: float, bound_pts: int, buffer: int
) -> PatchCluster:
    t_min, t_max = _target_box(uv, diameter)
    xs = np.arange(t_min[0], t_max[0] + 1)
    ys = np.arange(t_min[1], t_max[1] + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    internal = np.stack([gx.ravel(), gy.ravel()], axis=1)

    pad = bound_pts + buffer
    bxs = np.arange(t_min[0] - pad, t_max[0] + pad + 1)
    bys = np.arange(t_min[1] - pad, t_max[1] + pad + 1)
    gx, gy = np.meshgrid(bxs, bys, indexing="ij")
    outside = (
        (gx < t_min[0] - buffer)
        | (gx > t_max[0] + buffer)
        | (gy < t_min[1] - buffer)
        | (gy > t_max[1] + buffer)
    )
    bounds = np.stack([gx[outside], gy[outside]], axis=1)
    return PatchCluster(bounds_xy=bounds, internal_xy=internal)


def _multi_target_boundary(
    uvs: np.ndarray, diameters: np.ndarray, bound_pts: int, buffer: int
) -> PatchCluster:
    mins, maxs = [], []
    for k in range(uvs.shape[0]):
        lo, hi = _target_box(uvs[k], diameters[k])
        mins.append(lo)
        maxs.append(hi)
    mins = np.stack(mins)
    maxs = np.stack(maxs)
    t_min = mins.min(axis=0) - (bound_pts + buffer)
    t_max = maxs.max(axis=0) + (bound_pts + buffer)
    dx = int(t_max[0] - t_min[0] + 1)
    dy = int(t_max[1] - t_min[1] + 1)
    mask = np.zeros((dx, dy), np.int8)
    for k in range(uvs.shape[0]):
        lo = mins[k] - t_min
        hi = maxs[k] - t_min
        mask[lo[0] : hi[0] + 1, lo[1] : hi[1] + 1] = 2

    # row/column fill between extreme marked cells (convex-ish hull fill)
    for x in range(dx):
        idx = np.nonzero(mask[x] == 2)[0]
        if idx.size:
            mask[x, idx[0] : idx[-1] + 1] = 2
    for y in range(dy):
        idx = np.nonzero(mask[:, y] == 2)[0]
        if idx.size:
            mask[idx[0] : idx[-1] + 1, y] = 2

    filled = mask == 2
    internal_idx = np.argwhere(filled)

    # boundary: cells not in the region, with a region cell within
    # bound_pts+buffer, but none within buffer (the buffer gap stays empty)
    from scipy.ndimage import maximum_filter

    reach = maximum_filter(filled, size=2 * (bound_pts + buffer) + 1)
    if buffer > 0:
        near = maximum_filter(filled, size=2 * buffer + 1)
    else:
        near = filled
    bound_mask = reach & (~near) & (~filled)
    bounds_idx = np.argwhere(bound_mask)

    return PatchCluster(
        bounds_xy=bounds_idx + t_min[None, :],
        internal_xy=internal_idx + t_min[None, :],
    )


def build_patch_clusters(
    uv: np.ndarray,
    diameters: np.ndarray,
    image_hw: Tuple[int, int],
    bound_pts: int = 3,
    buffer: int = 2,
) -> List[PatchCluster]:
    """Cluster targets and compute in-frame boundary/interior pixel sets."""
    H, W = image_hw
    groups = cluster_targets(uv, diameters, bound_pts + buffer)
    out = []
    for g in groups:
        if len(g) == 1:
            pc = _single_target_boundary(uv[g[0]], diameters[g[0]], bound_pts, buffer)
        else:
            pc = _multi_target_boundary(uv[g], diameters[g], bound_pts, buffer)
        keep_b = (
            (pc.bounds_xy[:, 0] >= 0)
            & (pc.bounds_xy[:, 0] < W)
            & (pc.bounds_xy[:, 1] >= 0)
            & (pc.bounds_xy[:, 1] < H)
        )
        keep_i = (
            (pc.internal_xy[:, 0] >= 0)
            & (pc.internal_xy[:, 0] < W)
            & (pc.internal_xy[:, 1] >= 0)
            & (pc.internal_xy[:, 1] < H)
        )
        out.append(
            PatchCluster(bounds_xy=pc.bounds_xy[keep_b], internal_xy=pc.internal_xy[keep_i])
        )
    return out


def threshold_bounds(
    clusters: Sequence[PatchCluster],
    ref_frame: np.ndarray,
    thresh: float,
    offset: int = 2,
) -> List[PatchCluster]:
    """Drop boundary pixels whose (offset-box) neighborhood dips below thresh."""
    from scipy.ndimage import minimum_filter

    local_min = minimum_filter(
        np.asarray(ref_frame, np.float64), size=2 * offset + 1, mode="nearest"
    )
    out = []
    for c in clusters:
        vals = local_min[c.bounds_xy[:, 1], c.bounds_xy[:, 0]]
        keep = vals >= thresh
        out.append(PatchCluster(bounds_xy=c.bounds_xy[keep], internal_xy=c.internal_xy))
    return out


# ---------------------------------------------------------------------------
# polynomial basis + composed patch operator


def poly2d_basis(x: np.ndarray, y: np.ndarray, degree: int = 3) -> np.ndarray:
    """Columns y^i * x^j for i+j <= degree, (i outer, j inner) ordering."""
    cols = []
    for i in range(degree + 1):
        for j in range(degree + 1):
            if i + j <= degree:
                cols.append((y.astype(np.float64) ** i) * (x.astype(np.float64) ** j))
    return np.stack(cols, axis=1)


def polyfit2d(x, y, z, degree: int = 3) -> np.ndarray:
    """Least-squares 2D polynomial fit (reference polyfit2D semantics)."""
    A = poly2d_basis(np.asarray(x), np.asarray(y), degree)
    coeffs, *_ = np.linalg.lstsq(A, np.asarray(z, np.float64), rcond=None)
    return coeffs


def polyval2d(x, y, coeffs, degree: int = 3) -> np.ndarray:
    return poly2d_basis(np.asarray(x), np.asarray(y), degree) @ np.asarray(coeffs)


class PatchOperator(NamedTuple):
    """Padded, batched patch operator for the fused per-frame path."""

    M: jax.Array  # (K, I_max, B_max) float32 — composed fill operator
    boundary_idx: jax.Array  # (K, B_max) int32 flat pixel indices (0 where pad)
    internal_idx: jax.Array  # (K, I_max) int32 flat indices (H*W where pad -> drop)
    n_clusters: int

    @property
    def empty(self) -> bool:
        return self.n_clusters == 0


def build_patch_operator(
    clusters: Sequence[PatchCluster],
    image_hw: Tuple[int, int],
    degree: int = 3,
) -> Optional[PatchOperator]:
    """Compose fit+eval into one matrix per cluster; pad and batch."""
    H, W = image_hw
    n_coef = (degree + 2) * (degree + 1) // 2
    keep = [
        c
        for c in clusters
        if c.bounds_xy.shape[0] >= n_coef and c.internal_xy.shape[0] > 0
    ]
    if not keep:
        return None
    B_max = max(c.bounds_xy.shape[0] for c in keep)
    I_max = max(c.internal_xy.shape[0] for c in keep)
    K = len(keep)
    M = np.zeros((K, I_max, B_max), np.float32)
    b_idx = np.zeros((K, B_max), np.int64)
    i_idx = np.full((K, I_max), H * W, np.int64)  # out-of-range -> dropped scatter
    for k, c in enumerate(keep):
        bx, by = c.bounds_xy[:, 0], c.bounds_xy[:, 1]
        ix, iy = c.internal_xy[:, 0], c.internal_xy[:, 1]
        A_b = poly2d_basis(bx, by, degree)
        A_i = poly2d_basis(ix, iy, degree)
        Mk = A_i @ np.linalg.pinv(A_b)
        M[k, : Mk.shape[0], : Mk.shape[1]] = Mk
        b_idx[k, : bx.shape[0]] = by * W + bx
        i_idx[k, : ix.shape[0]] = iy * W + ix
    return PatchOperator(
        M=jnp.asarray(M),
        boundary_idx=jnp.asarray(b_idx, jnp.int32),
        internal_idx=jnp.asarray(i_idx, jnp.int32),
        n_clusters=K,
    )


class PatchNodeCorrection(NamedTuple):
    """Patch+filter effect precomposed to the grid-NODE level.

    The sequential tail (warp -> ``apply_patches`` full-image scatter ->
    full-image filter) only changes node values whose gather pixel lies
    within ``filter radius`` of a patch interior.  Since the polynomial fill
    is LINEAR in warped pixel values and the filter is linear, the
    filtered-patched value at each affected pixel is one precomposed linear
    functional of warped values at a small static source-pixel set — so the
    fused warp+filter kernel (ops/pallas_ecc.py) can skip patching entirely
    and the per-frame patch cost becomes: sample |S| warped pixels ->
    cluster-batched matmul -> overlay a handful of nodes.  (The reference
    applies patches as a full-image pass every frame, patches.ipp role.)
    """

    src_flat: jax.Array  # (S,) int32 flat source pixel indices, aligned frame
    C: jax.Array  # (K, A_max, S_max) float32 affected-value operator
    src_slot: jax.Array  # (K, S_max) int32 into the (S,) sampled vector
    pix_idx: jax.Array  # (K, A_max) int32 flat affected pixel (H*W = pad)
    n_clusters: int


def build_patch_node_correction(
    op: Optional[PatchOperator],
    image_hw: Tuple[int, int],
    filter_type: str,
    ksize: int,
) -> Optional[PatchNodeCorrection]:
    """Precompose filter(patch(warped)) at every affected pixel.

    Derived entirely from the composed :class:`PatchOperator`: valid interior
    slots are ``internal_idx != H*W``; valid boundary slots are nonzero
    ``M`` columns.  Returns None (caller falls back to the sequential tail)
    when the filter is unsupported or two clusters' windows interact.
    """
    if op is None:
        return None
    if filter_type == "gaussian":
        from upsp_tpu.ops.image import gaussian_kernel_1d

        if ksize > 7:
            return None
        taps = np.asarray(gaussian_kernel_1d(ksize), np.float64)
    elif filter_type == "box":
        if ksize > 7:
            return None
        taps = np.full(ksize, 1.0 / ksize)
    elif filter_type == "none":
        taps = np.ones(1)
    else:
        return None
    r = len(taps) // 2
    H, W = image_hw
    M = np.asarray(op.M, np.float64)
    b_idx = np.asarray(op.boundary_idx)
    i_idx = np.asarray(op.internal_idx)
    K = op.n_clusters
    col_valid = (np.abs(M) > 0).any(axis=1)  # (K, B_max)

    int_map = {}  # flat pixel -> (cluster, M row)
    for k in range(K):
        for i, q in enumerate(i_idx[k]):
            if q != H * W:
                int_map[int(q)] = (k, i)

    def refl(v, n):  # reflect-101
        if v < 0:
            return -v
        if v >= n:
            return 2 * (n - 1) - v
        return v

    src_of = {}  # flat pixel -> global source slot
    src_list = []

    def slot(q):
        s = src_of.get(q)
        if s is None:
            s = src_of[q] = len(src_list)
            src_list.append(q)
        return s

    rows_per_cluster = []  # [(pix_flat, {global_slot: coeff})]
    for k in range(K):
        interiors = [int(q) for q in i_idx[k] if q != H * W]
        aff = set()
        for q in interiors:
            y, x = q // W, q % W
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        aff.add(yy * W + xx)
        bcols = np.nonzero(col_valid[k])[0]
        bflat = [int(b_idx[k, c]) for c in bcols]
        rows = []
        for p in sorted(aff):
            py, px = p // W, p % W
            row: dict = {}
            for dy in range(-r, r + 1):
                wy = taps[dy + r]
                qy = refl(py + dy, H)
                for dx in range(-r, r + 1):
                    wgt = wy * taps[dx + r]
                    qx = refl(px + dx, W)
                    q = qy * W + qx
                    hit = int_map.get(q)
                    if hit is None:
                        row[slot(q)] = row.get(slot(q), 0.0) + wgt
                    else:
                        kq, iq = hit
                        if kq != k:
                            return None  # interacting clusters: fall back
                        for c, bf in zip(bcols, bflat):
                            coef = M[k, iq, c]
                            if coef != 0.0:
                                s = slot(bf)
                                row[s] = row.get(s, 0.0) + wgt * coef
            rows.append((p, row))
        rows_per_cluster.append(rows)

    A_max = max((len(rs) for rs in rows_per_cluster), default=0)
    if A_max == 0:
        return None
    # per-cluster local source slots -> padded (K, S_max) global-slot table
    local_slots = []
    for rs in rows_per_cluster:
        used = sorted({s for _, row in rs for s in row})
        local_slots.append(used)
    S_max = max(len(u) for u in local_slots)
    C = np.zeros((K, A_max, S_max), np.float32)
    src_slot = np.zeros((K, S_max), np.int64)
    pix = np.full((K, A_max), H * W, np.int64)
    for k, rs in enumerate(rows_per_cluster):
        pos = {s: j for j, s in enumerate(local_slots[k])}
        src_slot[k, : len(local_slots[k])] = local_slots[k]
        for a, (p, row) in enumerate(rs):
            pix[k, a] = p
            for s, coef in row.items():
                C[k, a, pos[s]] = coef
    return PatchNodeCorrection(
        src_flat=jnp.asarray(np.asarray(src_list), jnp.int32),
        C=jnp.asarray(C),
        src_slot=jnp.asarray(src_slot, jnp.int32),
        pix_idx=jnp.asarray(pix, jnp.int32),
        n_clusters=K,
    )


def patch_correction_values(
    warped: jax.Array, corr: PatchNodeCorrection
) -> jax.Array:
    """(K, A_max) filtered-patched values from the WARPED (pre-filter) image.

    One flat gather at STATIC source indices (the same boundary-pixel reads
    ``apply_patches`` performs) + the precomposed cluster matmul.  The fused
    tail kernel emits the pre-filter warped image as its second output, so
    these are exactly the sequential path's sample values.  Dynamic-position
    bilinear sampling of the unwarped image was measured at ~109 us/frame of
    scalar gathers at 1 MP; this form rides the fast constant-index gather
    path (<2 us).
    """
    srcv = warped.reshape(-1)[corr.src_flat].astype(jnp.float32)
    return jnp.einsum("kas,ks->ka", corr.C, srcv[corr.src_slot])


def apply_patches(frame: jax.Array, op: Optional[PatchOperator]) -> jax.Array:
    """Patch all clusters in one batched matmul + scatter (jit/vmap-safe).

    bfloat16 frames stay bfloat16 (the scatter rewrites the full image, so
    the dtype sets the pass cost); the cluster matmul itself always runs on
    gathered values promoted through the f32 operator.
    """
    dtype = frame.dtype if frame.dtype == jnp.bfloat16 else jnp.float32
    if op is None:
        return frame.astype(dtype)
    flat = frame.reshape(-1).astype(dtype)
    z = flat[op.boundary_idx]  # (K, B_max); padded slots gather pixel 0 but
    # their M columns are zero, so they contribute nothing
    fill = jnp.einsum("kib,kb->ki", op.M, z)  # MXU batched matmul
    out = flat.at[op.internal_idx.reshape(-1)].set(
        fill.reshape(-1).astype(dtype), mode="drop"
    )
    return out.reshape(frame.shape)
