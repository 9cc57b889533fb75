"""Multiresolution hash-grid encoding (TPU-native tiny-cuda-nn replacement).

Replaces the external fully-fused CUDA encoder the reference depends on
(``tcnn.Encoding(otype=HashGrid)`` at projects/neuralangelo/utils/modules.py:50)
with a JAX implementation designed for XLA/TPU:

  * all L levels are packed into ONE flat parameter table with static
    per-level offsets, so the forward is a single batched gather and the
    backward a single scatter-add (emitted automatically by JAX's gather VJP);
  * levels whose dense grid fits under the hash-table budget are indexed
    densely (ix + R*(iy + R*iz)), larger levels use the spatial hash
    ``x ^ y*2654435761 ^ z*805459861  (mod T)`` — same scheme as tcnn/
    Instant-NGP so quality characteristics carry over;
  * coarse-to-fine level annealing is a multiply by a [L] mask supplied as a
    traced input (projects/neuralangelo/utils/modules.py:97-113 equivalent)
    — changing the number of active levels never recompiles;
  * gathers/scatters are laid out as [P, L*8] index matrices so XLA can batch
    them; the feature contraction (trilinear weights x 8 corners) maps to VPU
    ops.

This module is the XLA reference implementation; see ``PERF.md`` for the
measured behavior of gathers/scatters on TPU v5e.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Primes of the Instant-NGP spatial hash (first coordinate unhashed).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multiresolution hash encoding."""

    num_levels: int = 16
    features_per_level: int = 8
    log2_hashmap_size: int = 22
    min_logres: int = 5
    max_logres: int = 11
    range_min: float = -2.0
    range_max: float = 2.0
    dtype: str = "float32"

    @property
    def growth_rate(self) -> float:
        r_min, r_max = 2**self.min_logres, 2**self.max_logres
        if self.num_levels == 1:
            return 1.0
        return float(np.exp((np.log(r_max) - np.log(r_min)) / (self.num_levels - 1)))

    @property
    def resolutions(self) -> Tuple[int, ...]:
        """Per-level grid resolutions: floor(r_min * g^lv) + 1.

        Matches the reference's python-side resolution table
        (projects/neuralangelo/utils/modules.py:51-54), which also drives the
        numerical-gradient epsilon schedule.
        """
        r_min = 2**self.min_logres
        g = self.growth_rate
        return tuple(int(np.floor(r_min * g**lv)) + 1 for lv in range(self.num_levels))

    @property
    def table_sizes(self) -> Tuple[int, ...]:
        """Entries per level: dense when it fits, else the hash-table size."""
        T = 2**self.log2_hashmap_size
        sizes = []
        for res in self.resolutions:
            dense = res**3
            sizes.append(dense if dense <= T else T)
        return tuple(sizes)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.table_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def total_entries(self) -> int:
        return self.level_offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level


def init_params(key, spec: HashGridSpec, scale: float = 1e-4):
    """Per-level tables, Uniform(-scale, scale) init (Instant-NGP default).

    The levels are SEPARATE pytree leaves rather than one flat array: each
    level's gather then back-propagates into a gradient buffer of that
    level's size only. With a single flat table every level's scatter-add VJP
    materializes a full-table-sized buffer (16 x 1.5 GB at production size —
    observed to kill the TPU worker).
    """
    keys = jax.random.split(key, spec.num_levels)
    return tuple(
        jax.random.uniform(
            keys[lv], (size, spec.features_per_level), jnp.dtype(spec.dtype),
            minval=-scale, maxval=scale,
        )
        for lv, size in enumerate(spec.table_sizes)
    )


def _corner_indices(spec: HashGridSpec):
    """Static [8,3] corner offset matrix."""
    corners = np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
    )
    return corners


def _corner_sampled_combine_fn(floor: float, k_samples: int = 1,
                               mode: str = "center"):
    """Trilinear combine with a corner-SAMPLED backward table scatter.

    Forward is the exact weighted corner gather
    ``out[e] = sum_c weights[e,c] * table[idx[c]]`` (same math as the plain
    take+einsum path). Backward replaces the per-corner scatter-add — 8 rows
    per (point, level), the dominant cost of the TPU train step (PERF.md:
    scatter-add is per-ROW latency-bound on v5e) — with ONE row per point:
    an unbiased single-sample estimator over the corner axis. The true
    per-corner cotangent row is ``v[c] = sum_e weights[e,c] * ct[e]``; a
    corner ``c*`` is drawn from a distribution ``q`` (summing to 1) and the
    scattered row is ``v[c*] / q[c*]`` — ``E[v[c*]/q[c*]] = sum_c v[c]``,
    unbiased for any strictly-positive ``q``.

    Three sampling distributions (``mode``):

      * ``"cotangent"``: ``q ~ |v[c]|_1`` mixed with a uniform
        floor — the variance-OPTIMAL importance distribution. Computing all
        8 rows of ``v`` is one extra VPU einsum (no scatter); with floor=0
        the scattered row's L1 norm is a per-point CONSTANT
        (``sum_c |v[c]|``), so only the direction is stochastic. This is
        what makes the estimator survive the stencil path, where tap
        extrapolation weights can be large on corners whose CENTER weight
        vanishes.
      * ``"top1cot"``: Rao-Blackwellized cotangent — the corner
        with the LARGEST cotangent norm is scattered EXACTLY (its row
        carries most of the gradient mass: the trilinear max weight is
        >= 1/8 and typically 0.3-0.7), and ONE residual corner is
        importance-sampled from the remaining seven by their norms.
        ``E = v[max] + sum_{c != max} v[c]`` — unbiased, and only the
        residual (minority) mass is stochastic, so variance falls several-
        fold below ``"cotangent"`` at 2 scatter rows per point (still a 4x
        row cut vs the exact 8-corner scatter). ``k_samples`` counts
        residual draws (rows per point = 1 + k).
      * ``"center"``: ``q = (1-floor) * w_center/sum(w_center) + floor/8``
        (trilinear center weights, non-negative, sum to 1). Cheaper to
        compute but mismatched to the stencil's signed tap weights: the
        ratio ``v[c*]/q[c*]`` amplifies up to ``8/floor`` where a tap weight
        is large and the center weight ~0. MEASURED REJECTED as a default:
        the 2000-iter sphere gate collapsed -3.73 dB at seed 0 (PERF.md
        round-3 csamp ledger); kept for the ablation record.

    The estimator's variance acts as extra SGD gradient noise on the tables;
    quality is gated per-config by scripts/quality_ab.py AB_STUDY=csamp.

    The weights cotangent is computed exactly (re-gather + einsum, ~10x
    cheaper per row than scatters); when nothing differentiates through the
    weights (the production train step — points are stop_gradient'd), XLA
    DCEs it away entirely.

    Reference counterpart: the tcnn hash-encoder backward
    (projects/neuralangelo/utils/modules.py:50) — a CUDA atomic-add over all
    8 corners; on TPU the unbiased subsample is the hardware-shaped answer.
    """

    @jax.custom_vjp
    def combine(table_lv, idx, weights_all, key):
        # table_lv [S,F], idx [8,P] int32, weights_all [E,8,P], key uint32[2]
        feats = jnp.take(table_lv, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], idx.shape[1], table_lv.shape[-1])  # [8,P,F]
        return jnp.einsum("cpf,ecp->efp", feats, weights_all.astype(feats.dtype))

    def fwd(table_lv, idx, weights_all, key):
        return combine(table_lv, idx, weights_all, key), (table_lv, idx, weights_all, key)

    def bwd(res, ct):  # ct [E,F,P]
        table_lv, idx, weights_all, key = res
        P = idx.shape[1]
        # Exact weights cotangent (DCE'd when weights are not differentiated).
        feats = jnp.take(table_lv, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], P, table_lv.shape[-1])
        gw = jnp.einsum("efp,cpf->ecp", ct, feats).astype(weights_all.dtype)
        if mode in ("cotangent", "top1cot"):
            # Exact per-corner cotangent rows for ALL 8 corners (VPU einsum,
            # no scatter), then importance-sample by their L1 norm — the
            # variance-optimal q for this estimator.
            v = jnp.einsum("efp,ecp->cfp", ct.astype(jnp.float32),
                           weights_all.astype(jnp.float32))  # [8,F,P]
            n = jnp.sum(jnp.abs(v), axis=1)  # [8,P]
            if mode == "top1cot":
                # Rao-Blackwellize: the argmax-norm corner is scattered
                # exactly; q covers only the 7 residual corners.
                m = jnp.argmax(n, axis=0)  # [P]
                is_max = jnp.arange(8, dtype=m.dtype)[:, None] == m[None, :]
                n_r = jnp.where(is_max, 0.0, n)  # [8,P]
                s_r = jnp.sum(n_r, axis=0, keepdims=True)  # [1,P]
                q = jnp.where(
                    s_r > 0.0,
                    (1.0 - floor) * n_r / jnp.maximum(s_r, 1e-30)
                    + jnp.where(is_max, 0.0, floor / 7.0),
                    jnp.where(is_max, 0.0, 1.0 / 7.0),
                )  # [8,P], sums to 1, zero on the max corner
            else:
                s = jnp.sum(n, axis=0, keepdims=True)  # [1,P]
                q = jnp.where(
                    s > 0.0,
                    (1.0 - floor) * n / jnp.maximum(s, 1e-30) + floor / 8.0,
                    jnp.full_like(n, 1.0 / 8.0),
                )  # [8,P], sums to 1
        else:
            # Corner sampling distribution from the center-eval weights.
            w0 = jnp.maximum(weights_all[0].astype(jnp.float32), 0.0)  # [8,P]
            s0 = jnp.maximum(jnp.sum(w0, axis=0, keepdims=True), 1e-9)
            q = (1.0 - floor) * (w0 / s0) + floor / 8.0  # [8,P]
        cdf = jnp.cumsum(q, axis=0)
        # k_samples independent draws (with replacement), each contributing
        # val/k — unbiased for any k; variance ~1/k at 1 extra scatter row
        # per point per extra sample.
        u = jax.random.uniform(key, (k_samples, P), jnp.float32) * cdf[-1:]
        # ``>=`` (corner intervals [cdf[i-1], cdf[i])) makes ZERO-width
        # intervals unreachable for every u incl. u=0 — with top1cot's
        # q[max]=0, a ``>`` rule would route the measure-zero u=0 draw to a
        # zero-probability corner and divide by the clamp (a gradient bomb
        # at ~2^-24 per draw x billions of draws per run).
        c = jnp.sum((u[:, None, :] >= cdf[None, :-1, :]).astype(jnp.int32),
                    axis=1)  # [K,P]
        # All corner selections below go through ONE-HOT multiply-adds, not
        # take_along_axis: TAA over the 8-corner axis lowers to per-element
        # gathers (static attribution measured +21M gather rows/step at the
        # bench shape — comparable to the scatter rows the estimator saves),
        # while the one-hot contraction is plain VPU work that XLA fuses.
        onehot = (jnp.arange(8, dtype=c.dtype)[None, :, None]
                  == c[:, None, :])  # [K,8,P] bool
        oh_f = onehot.astype(jnp.float32)
        idx_sel = jnp.sum(idx[None] * onehot.astype(idx.dtype), axis=1)  # [K,P]
        q_sel = jnp.maximum(jnp.sum(q[None] * oh_f, axis=1), 1e-9)  # [K,P]
        if mode in ("cotangent", "top1cot"):
            v_sel = jnp.einsum("kcp,cfp->fkp", oh_f, v)  # [F,K,P]
            val = v_sel / (q_sel * k_samples)  # [F,K,P]
            if mode == "top1cot":
                # Prepend the exact argmax-corner row (weight 1, no /q).
                max_f = is_max.astype(jnp.float32)  # [8,P]
                idx_max = jnp.sum(idx * is_max.astype(idx.dtype), axis=0)  # [P]
                v_m = jnp.einsum("cp,cfp->fp", max_f, v)  # [F,P]
                idx_sel = jnp.concatenate([idx_max[None], idx_sel], axis=0)
                val = jnp.concatenate([v_m[:, None], val], axis=1)  # [F,1+K,P]
        else:
            w_sel = jnp.einsum("kcp,ecp->ekp", oh_f,
                               weights_all.astype(jnp.float32))  # [E,K,P]
            val = jnp.einsum("efp,ekp->fkp", ct.astype(jnp.float32), w_sel)  # [F,K,P]
            val = val / (q_sel * k_samples)
        val = val.astype(table_lv.dtype)
        gt = jnp.zeros_like(table_lv).at[idx_sel.reshape(-1)].add(
            jnp.moveaxis(val, 0, -1).reshape(-1, val.shape[0]))
        f0 = jax.dtypes.float0
        return gt, np.zeros(idx.shape, f0), gw, np.zeros(key.shape, f0)

    combine.defvjp(fwd, bwd)
    return combine


# One instance per (floor, k, mode) value (all trace-static).
_CSAMP_CACHE = {}


def corner_sampled_combine(table_lv, idx, weights_all, key, floor: float = 0.125,
                           k_samples: int = 1, mode: str = "center"):
    spec = (float(floor), int(k_samples), str(mode))
    fn = _CSAMP_CACHE.get(spec)
    if fn is None:
        fn = _CSAMP_CACHE[spec] = _corner_sampled_combine_fn(*spec)
    return fn(table_lv, idx, weights_all, key)


def _blocked_dense_table(table_lv, res: int, corners):
    """Per-CELL corner-block view of a DENSE level table.

    Returns [(res-1)^3, 8*F]: row ``cid`` holds the 8 corner feature rows of
    cell ``(cx, cy, cz)`` with ``cid = cx + (res-1)*(cy + (res-1)*cz)``, the
    corner axis ordered like :func:`_corner_indices` (dx*4 + dy*2 + dz).
    Built from 8 SHIFTED SLICES of the dense grid — a pure dense memory op
    (no gather), whose VJP is 8 dense pad-adds (no scatter). One encoder
    lookup then needs ONE gathered row per point instead of 8, and its
    backward ONE scattered row — the 8x row cut on dense levels (PERF.md
    "Blocked-corner storage"). Exact math both directions; costs ~7.3x the
    level's table bytes as an in-graph temporary.
    """
    F = table_lv.shape[-1]
    r = int(res)
    # Flat vertex index is ix + r*(iy + r*iz) -> grid axes are (z, y, x).
    grid = table_lv[: r * r * r].reshape(r, r, r, F)
    m = r - 1
    blocks = [
        grid[dz:dz + m, dy:dy + m, dx:dx + m, :].reshape(m * m * m, F)
        for dx, dy, dz in corners
    ]
    return jnp.stack(blocks, axis=1).reshape(m * m * m, 8 * F)


def _blocked_take(table_lv, res: int, corners, cx, cy, cz, take):
    """Gather the 8 corner rows of each point's cell in ONE row per point.

    ``cx/cy/cz`` are the [1,P] base-cell coordinates (uint32, already
    clamped to res-2). Returns feats [8, P, F] — identical (bitwise) to the
    8-row take of the plain path, modulo float-free reindexing.
    """
    F = table_lv.shape[-1]
    m = int(res) - 1
    blocked = _blocked_dense_table(table_lv, res, corners)
    cid = (cx + np.uint32(m) * (cy + np.uint32(m) * cz)).astype(jnp.int32)  # [1,P]
    rows = take(blocked, cid.reshape(-1))  # [P, 8F]
    return jnp.transpose(rows.reshape(-1, 8, F), (1, 0, 2))  # [8,P,F]


def _row_take_fn(pallas_backward: bool):
    """Row-gather whose VJP routes through the Pallas VMEM scatter-accumulate
    kernel when enabled and applicable (ops/hashgrid_pallas.py; falls back to
    XLA's scatter-add per level). Disabled for double-differentiation users
    (the analytical-gradient mode) — custom_vjp is reverse-mode-only.

    When the kernel is globally off (MLINERF_PALLAS_SCATTER unset — the
    measured-and-rejected default, see hashgrid_pallas.py), return PLAIN
    ``jnp.take``: the custom_vjp wrapper must not sit in the hot path at all,
    so the XLA lowering is bit-identical to the pre-kernel round."""
    import os

    if pallas_backward and os.environ.get("MLINERF_PALLAS_SCATTER", "0") in ("1", "on"):
        from mlinerf_tpu.ops.hashgrid_pallas import take_rows

        return take_rows
    return lambda t, i: jnp.take(t, i, axis=0)


def encode(table, points, spec: HashGridSpec, level_mask=None, max_levels=None,
           pallas_backward: bool = False, corner_key=None, corner_floor: float = 0.125,
           corner_k: int = 1, corner_mode: str = "cotangent",
           corner_exact_finest: int = 0, dense_blocked: bool = False):
    """Encode 3D points into concatenated per-level features.

    ``corner_key`` (optional uint32 PRNG key): route the backward through the
    corner-SAMPLED table scatter (one row per point/level instead of 8 — see
    :func:`corner_sampled_combine`). Forward values are identical.
    ``corner_exact_finest``: keep the EXACT 8-corner scatter on the globally
    finest N levels (where estimator noise hurts detail most) and sample only
    the coarser ones — a static quality/speed dial between full csamp and
    exact (rows: (L-N)*k + N*8 per point).

    TPU layout note: a single batched gather over all (level, corner) pairs
    materializes a [P, L, 8, F] tensor whose trailing (8, F=8) dims tile-pad
    to (8, 128) on TPU — a 16x HBM blowup that OOMs at production sizes
    (observed: 68 GB for 1M points). Instead we loop over the L levels in
    Python (unrolled at trace time): each level does one corner-major gather
    [8*P, F] that XLA fuses into an einsum reducing straight to [F, P] —
    every materialized tensor has a >= 128 or == 8 trailing/sublane dim, so
    nothing pads. Levels concat to [L*F=128, P] and one clean 2-D transpose
    yields the [P, 128] MLP input.

    Args:
        table: tuple of per-level [size_l, F] parameter tables.
        points: [..., 3] points in world units (normalized internally with
            ``spec.range_min/max``, as the reference does at modules.py:82-84).
        level_mask: optional [L] float mask for coarse-to-fine annealing
            (traced; zeroes features without skipping work).
        max_levels: optional STATIC level cap — levels beyond it are not
            gathered at all and their features are zero (used for cheap
            importance-sampling SDF evaluations).
    Returns:
        features [..., L*F].
    """
    lead_shape = points.shape[:-1]
    x = points.reshape(-1, 3).astype(jnp.float32)
    P = x.shape[0]
    x01 = (x - spec.range_min) / (spec.range_max - spec.range_min)  # [P,3]
    # Split coordinates into [1,P] components IMMEDIATELY: every tensor from
    # here on is [8,P] (corners in sublanes) or [F,P] — tile-perfect. Any
    # [..., 3]-trailing intermediate would pad its 3-lane up to 128 (42x HBM
    # amplification), which measurement showed dominating the encode cost.
    xs = x01[:, 0][None]  # [1,P]
    ys = x01[:, 1][None]
    zs = x01[:, 2][None]

    resolutions = np.asarray(spec.resolutions, np.int64)
    table_sizes = np.asarray(spec.table_sizes, np.int64)
    dense = resolutions**3 <= table_sizes
    F = spec.features_per_level
    corners = _corner_indices(spec)  # numpy [8,3]
    dxs = jnp.asarray(corners[:, 0:1])  # [8,1]
    dys = jnp.asarray(corners[:, 1:2])
    dzs = jnp.asarray(corners[:, 2:3])

    take = _row_take_fn(pallas_backward)
    active_levels = spec.num_levels if max_levels is None else min(int(max_levels), spec.num_levels)
    outs = []
    for lv in range(active_levels):
        res = float(resolutions[lv])

        def cell_frac(c01):
            p = c01 * (res - 1.0)
            cell = jnp.clip(jnp.floor(p), 0.0, res - 2.0)
            return cell.astype(jnp.uint32), jnp.clip(p - cell, 0.0, 1.0)

        cx, fx = cell_frac(xs)  # [1,P] each
        cy, fy = cell_frac(ys)
        cz, fz = cell_frac(zs)
        ix = cx + dxs.astype(jnp.uint32)  # [8,P]
        iy = cy + dys.astype(jnp.uint32)
        iz = cz + dzs.astype(jnp.uint32)
        wx = jnp.where(dxs == 1, fx, 1.0 - fx)  # [8,P]
        wy = jnp.where(dys == 1, fy, 1.0 - fy)
        wz = jnp.where(dzs == 1, fz, 1.0 - fz)
        weights = wx * wy * wz  # [8,P]
        if dense[lv]:
            r = np.uint32(resolutions[lv])
            idx = ix + r * (iy + r * iz)
        else:
            idx = (
                ix * np.uint32(_PRIMES[0])
                ^ iy * np.uint32(_PRIMES[1])
                ^ iz * np.uint32(_PRIMES[2])
            ) % np.uint32(table_sizes[lv])
        idx = idx.astype(jnp.int32)  # [8,P]
        if dense_blocked and dense[lv]:
            # Blocked-corner dense path: 1 gather row and 1 backward scatter
            # row per point — exact, so it supersedes the corner-SAMPLED
            # estimator on dense levels (fewer rows AND no noise).
            feats = _blocked_take(table[lv], resolutions[lv], corners, cx, cy, cz, take)
            out_l = jnp.einsum("cpf,cp->fp", feats, weights.astype(feats.dtype))
        elif corner_key is not None and lv < spec.num_levels - corner_exact_finest:
            out_l = corner_sampled_combine(
                table[lv], idx, weights[None], jax.random.fold_in(corner_key, lv),
                floor=corner_floor, k_samples=corner_k, mode=corner_mode,
            )[0]  # [F,P]
        else:
            feats = take(table[lv], idx.reshape(-1)).reshape(8, P, F)
            out_l = jnp.einsum("cpf,cp->fp", feats, weights.astype(feats.dtype))  # [F,P]
        if level_mask is not None:
            out_l = out_l * level_mask[lv].astype(out_l.dtype)
        outs.append(out_l)
    if active_levels < spec.num_levels:
        outs.append(jnp.zeros(((spec.num_levels - active_levels) * F, P), outs[0].dtype))
    out = jnp.concatenate(outs, axis=0)  # [L*F, P]
    out = out.T  # [P, L*F]
    return out.reshape(*lead_shape, spec.num_levels * F)


def encode_stencil(table, points, offsets, spec: HashGridSpec, level_mask=None,
                   shared_levels: int = 0, max_levels=None,
                   pallas_backward: bool = False, corner_key=None,
                   corner_floor: float = 0.125, corner_k: int = 1,
                   corner_mode: str = "cotangent", corner_exact_finest: int = 0,
                   dense_blocked: bool = False):
    """Encode a stencil of points (center + taps) with shared corner gathers.

    The numerical-gradient path (reference
    projects/neuralangelo/utils/modules.py:115-178) evaluates the SDF field at
    the center point and ``T`` tap points offset by ``eps`` (~ one cell of the
    finest ACTIVE level). At every level coarser than the tap spacing the taps
    land in the SAME grid cell as the center, so the 8 corner rows the encoder
    needs are identical for all ``1+T`` evaluations. This function gathers
    those 8 rows ONCE per shared level and combines them with each
    evaluation's own trilinear weights:

      * forward: (1+T)x fewer gather rows at shared levels;
      * backward: JAX's gather VJP emits ONE scatter-add per shared level with
        the summed cotangents instead of 1+T — the dominant cost of the TPU
        training step (scatter-add has no fast path on v5e; see PERF.md).

    Semantics at shared levels: each evaluation's features are the trilinear
    combination of the CENTER's cell corners with weights from that
    evaluation's (unclamped) cell-relative position. For taps inside the cell
    this is bit-exact with `encode`. A tap that crosses a cell face gets the
    linear extrapolation of the center cell's patch — i.e. the finite
    difference recovers the exact in-cell analytic derivative of the
    interpolant rather than a cross-cell secant. Levels >= ``shared_levels``
    use the exact per-evaluation path (identical to `encode`).

    Args:
        table: tuple of per-level [size_l, F] tables.
        points: [..., 3] center points (world units).
        offsets: [T, 3] tap offsets in world units (traced values fine).
        shared_levels: STATIC number of coarse levels using the shared-cell
            fast path. 0 = everything exact (still one fused program).
    Returns:
        features [..., 1+T, L*F]; index 0 along the stencil axis is the
        center, 1..T are the taps (matching ``points[..., None, :] + offsets``).
    """
    lead_shape = points.shape[:-1]
    x = points.reshape(-1, 3).astype(jnp.float32)
    P = x.shape[0]
    T = offsets.shape[0]
    E = T + 1
    extent = spec.range_max - spec.range_min
    x01 = (x - spec.range_min) / extent  # [P,3]
    off01 = offsets.astype(jnp.float32) / extent  # [T,3]
    # Stencil-axis offset table with the center prepended. Kept as [E] scalars
    # per axis inside the level loop — every big tensor stays [8,P]/[F,P].
    offs = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), off01], axis=0)  # [E,3]

    xs = x01[:, 0][None]  # [1,P]
    ys = x01[:, 1][None]
    zs = x01[:, 2][None]

    resolutions = np.asarray(spec.resolutions, np.int64)
    table_sizes = np.asarray(spec.table_sizes, np.int64)
    dense = resolutions**3 <= table_sizes
    F = spec.features_per_level
    corners = _corner_indices(spec)
    dxs = jnp.asarray(corners[:, 0:1])  # [8,1]
    dys = jnp.asarray(corners[:, 1:2])
    dzs = jnp.asarray(corners[:, 2:3])

    take = _row_take_fn(pallas_backward)
    active_levels = spec.num_levels if max_levels is None else min(int(max_levels), spec.num_levels)
    shared = min(int(shared_levels), active_levels)
    outs = [[] for _ in range(E)]  # per-eval list of [F,P] level features

    def level_index(ix, iy, iz, lv):
        if dense[lv]:
            r = np.uint32(resolutions[lv])
            idx = ix + r * (iy + r * iz)
        else:
            idx = (
                ix * np.uint32(_PRIMES[0])
                ^ iy * np.uint32(_PRIMES[1])
                ^ iz * np.uint32(_PRIMES[2])
            ) % np.uint32(table_sizes[lv])
        return idx.astype(jnp.int32)

    for lv in range(active_levels):
        res = float(resolutions[lv])
        mask_l = None if level_mask is None else level_mask[lv]

        if lv < shared:
            # --- shared-cell path: one gather serves all E evaluations ---
            def cell_frac(c01):
                p = c01 * (res - 1.0)
                cell = jnp.clip(jnp.floor(p), 0.0, res - 2.0)
                # Center frac clamped exactly like `encode`; taps offset from
                # the clamped value (keeps the center evaluation bit-exact).
                return cell.astype(jnp.uint32), jnp.clip(p - cell, 0.0, 1.0)

            cx, fx = cell_frac(xs)  # [1,P] each (center)
            cy, fy = cell_frac(ys)
            cz, fz = cell_frac(zs)
            ix = cx + dxs.astype(jnp.uint32)  # [8,P]
            iy = cy + dys.astype(jnp.uint32)
            iz = cz + dzs.astype(jnp.uint32)
            idx = level_index(ix, iy, iz, lv)
            w_evals = []
            for e in range(E):
                # Per-eval cell-relative position; NOT clamped to [0,1] —
                # out-of-cell taps linearly extrapolate the center patch.
                fex = fx + offs[e, 0] * (res - 1.0)  # [1,P]
                fey = fy + offs[e, 1] * (res - 1.0)
                fez = fz + offs[e, 2] * (res - 1.0)
                wx = jnp.where(dxs == 1, fex, 1.0 - fex)  # [8,P]
                wy = jnp.where(dys == 1, fey, 1.0 - fey)
                wz = jnp.where(dzs == 1, fez, 1.0 - fez)
                w_evals.append(wx * wy * wz)
            if dense_blocked and dense[lv]:
                # Blocked-corner dense path (see `encode`): exact, 1 row per
                # point each way — supersedes the sampled estimator here.
                feats = _blocked_take(
                    table[lv], resolutions[lv], corners, cx, cy, cz, take)
                for e in range(E):
                    out_l = jnp.einsum(
                        "cpf,cp->fp", feats, w_evals[e].astype(feats.dtype))
                    if mask_l is not None:
                        out_l = out_l * mask_l.astype(out_l.dtype)
                    outs[e].append(out_l)
            elif corner_key is not None and lv < spec.num_levels - corner_exact_finest:
                out_le = corner_sampled_combine(
                    table[lv], idx, jnp.stack(w_evals, axis=0),
                    jax.random.fold_in(corner_key, lv), floor=corner_floor,
                    k_samples=corner_k, mode=corner_mode,
                )  # [E,F,P]
                for e in range(E):
                    out_l = out_le[e]
                    if mask_l is not None:
                        out_l = out_l * mask_l.astype(out_l.dtype)
                    outs[e].append(out_l)
            else:
                feats = take(table[lv], idx.reshape(-1)).reshape(8, P, F)
                for e in range(E):
                    out_l = jnp.einsum(
                        "cpf,cp->fp", feats, w_evals[e].astype(feats.dtype))
                    if mask_l is not None:
                        out_l = out_l * mask_l.astype(out_l.dtype)
                    outs[e].append(out_l)
        else:
            # --- exact path: per-eval cell + gather (same math as `encode`) ---
            for e in range(E):
                def cell_frac_e(c01, axis):
                    p = (c01 + offs[e, axis]) * (res - 1.0)
                    cell = jnp.clip(jnp.floor(p), 0.0, res - 2.0)
                    return cell.astype(jnp.uint32), jnp.clip(p - cell, 0.0, 1.0)

                cx, fex = cell_frac_e(xs, 0)
                cy, fey = cell_frac_e(ys, 1)
                cz, fez = cell_frac_e(zs, 2)
                ix = cx + dxs.astype(jnp.uint32)
                iy = cy + dys.astype(jnp.uint32)
                iz = cz + dzs.astype(jnp.uint32)
                idx = level_index(ix, iy, iz, lv)
                wx = jnp.where(dxs == 1, fex, 1.0 - fex)
                wy = jnp.where(dys == 1, fey, 1.0 - fey)
                wz = jnp.where(dzs == 1, fez, 1.0 - fez)
                weights = wx * wy * wz
                if dense_blocked and dense[lv]:
                    feats = _blocked_take(
                        table[lv], resolutions[lv], corners, cx, cy, cz, take)
                    out_l = jnp.einsum(
                        "cpf,cp->fp", feats, weights.astype(feats.dtype))
                elif corner_key is not None and lv < spec.num_levels - corner_exact_finest:
                    out_l = corner_sampled_combine(
                        table[lv], idx, weights[None],
                        jax.random.fold_in(corner_key, lv * (E + 1) + e + 1),
                        floor=corner_floor, k_samples=corner_k, mode=corner_mode,
                    )[0]
                else:
                    feats = take(table[lv], idx.reshape(-1)).reshape(8, P, F)
                    out_l = jnp.einsum(
                        "cpf,cp->fp", feats, weights.astype(feats.dtype))
                if mask_l is not None:
                    out_l = out_l * mask_l.astype(out_l.dtype)
                outs[e].append(out_l)

    pad_levels = spec.num_levels - active_levels
    per_eval = []
    for e in range(E):
        cols = outs[e]
        if pad_levels:
            cols = cols + [jnp.zeros((pad_levels * F, P), cols[0].dtype)]
        per_eval.append(jnp.concatenate(cols, axis=0))  # [L*F, P]
    out = jnp.stack(per_eval, axis=0)  # [E, L*F, P]
    out = jnp.transpose(out, (2, 0, 1))  # [P, E, L*F]
    return out.reshape(*lead_shape, E, spec.num_levels * F)


def active_levels_to_mask(active_levels, num_levels: int):
    """[L] float mask with ones on the first `active_levels` levels.

    ``active_levels`` may be a traced scalar — the mask is computed with a
    comparison against iota, so level annealing never triggers recompiles.
    """
    return (jnp.arange(num_levels) < active_levels).astype(jnp.float32)
