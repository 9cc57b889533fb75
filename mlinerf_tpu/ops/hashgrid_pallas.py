"""Pallas TPU kernel: hash-table gradient accumulation (scatter-add).

The stage-a train step is scatter-bound: XLA's scatter-add into HBM-resident
tables runs at ~12M rows/s on v5e (latency-bound random 16-32B writes — the
CUDA reference leans on L2-cached atomics here, tcnn's fused backward at
projects/neuralangelo/utils/modules.py:50). For tables that fit in VMEM,
this kernel accumulates gradient rows on-chip instead:

  * the gradient table lives FLAT-PACKED as ``[S*F/128, 128]`` — 128/F
    table rows per 128-lane VMEM row — so the layout wastes nothing (a
    ``[S, F=8]`` VMEM buffer would tile-pad each row's 8 lanes to 128, a
    16x blowup) and every lane offset is static or a cyclic lane ROTATE by
    a dynamic multiple of F (Mosaic compiles rotates; dynamic lane slices
    it does not);
  * the grid walks row-chunks sequentially (TPU grid steps execute in order
    on a core), with the accumulator block persisting in VMEM across steps
    (constant index_map); each step's indices sit in SMEM for cheap scalar
    reads; the accumulate is a dynamic-SUBLANE [1, 128] read-modify-write;
  * out-of-range indices are dropped (used for padding), matching
    ``.at[].add(mode='drop')``.

``take_rows`` wraps ``jnp.take`` with a custom VJP that routes the table
gradient through this kernel when the table fits the VMEM budget, and falls
back to XLA's scatter otherwise. Used by ops/hashgrid.encode — the measured
rates are in PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 accumulator bytes that may live in VMEM (v5e has ~16 MB/core; leave
# room for the value chunks and double buffering).
VMEM_ACC_BUDGET = 9 * 2**20
# Rows per grid step.
CHUNK = 8192


def _scatter_kernel_flat(idx_ref, vals_ref, out_ref, *, table_size: int,
                         chunk: int, feat: int):
    """Flat-packed accumulate: no dynamic LANE addressing anywhere.

    Layouts (P = 128 // feat table-rows per 128-lane VMEM row):
      vals_ref: [chunk // P, 128]  — input row i lives at VMEM row i // P,
                                     lanes (i % P) * feat ... + feat
      out_ref:  [table_size // P, 128] — table row r at VMEM row r // P,
                                     lanes (r % P) * feat ... + feat

    The inner loop over a packed VMEM row is UNROLLED so each input's lane
    block is a STATIC mask; the move to its target lane block is a cyclic
    lane rotate by a dynamic multiple of ``feat`` (both blocks are
    feat-aligned and 128 % feat == 0, so the rotate never splits a block).
    The store is a dynamic-SUBLANE read-modify-write of one [1, 128] row —
    Mosaic supports dynamic offsets on the sublane dim; dynamic lane slices
    (the previous formulation) fail to compile.
    """
    P = 128 // feat

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(v, carry):
        vrow = vals_ref[pl.ds(v, 1), :]  # [1, 128]
        for j in range(P):  # static unroll: static lane masks
            src = jnp.where((lane >= j * feat) & (lane < (j + 1) * feat),
                            vrow, 0.0)
            r = idx_ref[v * P + j]

            @pl.when(r < table_size)
            def _():
                shift = ((r % P) - j) * feat  # multiple of feat; may be <0
                rolled = pltpu.roll(src, shift % 128, 1)
                out_ref[pl.ds(r // P, 1), :] += rolled

        return carry

    jax.lax.fori_loop(0, chunk // P, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def scatter_add_rows(idx, vals, table_size: int):
    """Accumulate ``vals[i]`` into row ``idx[i]`` of a fresh [S, F] table.

    idx: [N] int32 (entries >= table_size are dropped — use for padding).
    vals: [N, F] float32 (F must divide 128).
    Returns [table_size, F] float32.
    """
    N, F = vals.shape
    P = 128 // F
    nb = pl.cdiv(N, CHUNK)
    pad = nb * CHUNK - N
    if pad:
        idx = jnp.pad(idx, (0, pad), constant_values=table_size)
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
    # Flat-pack: P consecutive rows per 128-lane VMEM row (see kernel doc).
    vals_p = vals.astype(jnp.float32).reshape(nb * CHUNK // P, 128)
    S_pad = ((table_size + P - 1) // P) * P

    out = pl.pallas_call(
        functools.partial(_scatter_kernel_flat, table_size=table_size,
                          chunk=CHUNK, feat=F),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK // P, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad // P, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad // P, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # CPU tests
    )(idx.astype(jnp.int32), vals_p)
    return out.reshape(S_pad, F)[:table_size]  # [S, F]


def pallas_scatter_available(table_size: int, features: int) -> bool:
    """True when the VMEM-accumulator kernel applies to this table.

    OPT-IN (MLINERF_PALLAS_SCATTER=1): measured on v5e the kernel runs at
    11.8 Mrows/s — the serial row loop's VMEM read-modify-write dependency
    chain costs ~80 cycles/row, losing to XLA's native scatter at every
    VMEM-scale table size (52-119 Mrows/s; PERF.md round-2 table). Kept as
    the measured-and-rejected record + a base for future striped-accumulator
    variants; the production path is XLA scatter onto capacity-split tables.
    """
    import os

    if os.environ.get("MLINERF_PALLAS_SCATTER", "0") not in ("1", "on"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if 128 % features != 0:
        return False
    return table_size * 4 * features <= VMEM_ACC_BUDGET


# ---------------------------------------------------------------------------
# take_rows: jnp.take with the kernel-backed backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _take_rows(table, idx, shape, dtype_name):
    return jnp.take(table, idx, axis=0)


def _take_fwd(table, idx, shape, dtype_name):
    return jnp.take(table, idx, axis=0), idx


def _take_bwd(shape, dtype_name, idx, g):
    S, F = shape
    dtype = jnp.dtype(dtype_name)
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, F)
    if pallas_scatter_available(S, F):
        grad = scatter_add_rows(flat_idx, flat_g.astype(jnp.float32), S)
        return grad.astype(dtype), None
    grad = jnp.zeros(shape, dtype).at[flat_idx].add(flat_g.astype(dtype))
    return grad, None


_take_rows.defvjp(_take_fwd, _take_bwd)


def take_rows(table, idx):
    """``jnp.take(table, idx, axis=0)`` whose table-gradient scatter runs in
    the Pallas VMEM accumulator when the table qualifies (see PERF.md)."""
    return _take_rows(table, idx, tuple(table.shape), str(table.dtype))
