"""Pallas TPU kernels: fused kernel-matrix tile construction.

The hot op of every GP step is building K (batch, n, m) from inputs. The
XLA path materializes the scaled inputs, the cross matmul, the two norm
vectors, and the elementwise tail as separate HBM tensors; this Pallas kernel
computes each 128×128 tile in VMEM in one pass — inputs are scaled, the cross
term hits the MXU, and the stationary profile (RBF / Matern) is applied on the
VPU before the tile ever leaves the chip. One grid step per (batch, row-tile,
col-tile).

Use via ``fused_kernel_matrix`` (drop-in equal to kernels.RBFKernel /
MaternKernel forward, tested to 1e-6 in interpret mode on CPU) or by
constructing kernels with ``use_pallas=True`` through kernels.handle_covar.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128        # small-problem tile
TILE_BIG = 512    # large-problem tile: a (128, 128) grid at n=10⁴ is ~25k
                  # programs whose per-program overhead dominates (measured
                  # 85 ms vs 10.3 ms at 512×512 on the tunneled v5e)


def _pick_tile(n, m):
    return TILE_BIG if min(n, m) >= 4 * TILE_BIG else TILE


_LOG2E = 1.4426950408889634
# Taylor of 2^f = e^{f ln2} on [0,1): degree-5, rel err ~2e-5 — two decades
# below the bf16 stack's own 2⁻⁸ rounding class
_EXP2_C = (1.0, 0.6931471805599453, 0.2402265069591007,
           0.05550410866482158, 0.009618129107628477, 0.0013333558146428443)


def _fast_exp_neg(c):
    """e^{-c} for c >= 0 via exp2 bit assembly — a short fixed VPU sequence
    (floor, fma chain, int shift, bitcast) instead of the libm-grade exp.
    Used only for bf16-output tiles: max rel err ~2e-5 ≪ bf16's 4e-3."""
    x = jnp.maximum(-c * _LOG2E, -126.0)
    n = jnp.floor(x)
    f = x - n
    p = _EXP2_C[5]
    for coef in _EXP2_C[4::-1]:
        p = p * f + coef
    scale = pltpu.bitcast(((n.astype(jnp.int32) + 127) << 23), jnp.float32)
    return p * scale


def _profile(kind: str, d2, fast: bool = False):
    """Stationary profile g(r²) on the VPU."""
    exp_neg = _fast_exp_neg if fast else (lambda c: jnp.exp(-c))
    if kind == "rbf":
        return exp_neg(0.5 * d2)
    r = jnp.sqrt(jnp.maximum(d2, 1e-30))
    if kind == "matern05":
        return exp_neg(r)
    if kind == "matern15":
        c = math.sqrt(3.0) * r
        return (1.0 + c) * exp_neg(c)
    if kind == "matern25":
        c = math.sqrt(5.0) * r
        return (1.0 + c + (5.0 / 3.0) * d2) * exp_neg(c)
    raise ValueError(f"unknown kernel kind {kind!r}")


def _tile_kernel(kind, fast, x1_ref, x2_ref, ls_ref, out_ref):
    # x1_ref: (TILE, d), x2_ref: (TILE, d), ls_ref: (1, 1, d) for this batch el.
    inv_l = 1.0 / ls_ref[0]                      # (1, d)
    a = x1_ref[:] * inv_l                        # (TILE, d) VPU
    b = x2_ref[:] * inv_l
    cross = jax.lax.dot_general(                 # MXU
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # fp32 passes on the MXU: without this the cross term runs in bf16
        # and the n1+n2-2·cross cancellation amplifies the error to ~1e-1
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)   # (TILE, 1)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)   # (TILE, 1)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    out_ref[0] = _profile(kind, d2, fast).astype(out_ref.dtype)


def _dprofile(kind: str, d2, fast: bool = False):
    """dk/d(d²) on the VPU (mirrors kernels._dprofile). ``fast`` swaps libm
    exp for the short exp2 sequence (rel err ~2e-5) — used in the Pallas
    backward tile recompute, where the Hutchinson estimator's own O(25%)
    probe noise dwarfs it and the exp is most of the pass's VPU time."""
    exp_neg = _fast_exp_neg if fast else (lambda c: jnp.exp(-c))
    if kind == "rbf":
        return -0.5 * exp_neg(0.5 * d2)
    r = jnp.sqrt(jnp.maximum(d2, 1e-30))
    if kind == "matern05":
        return jnp.where(d2 <= 1e-12, jnp.zeros_like(d2),
                         -exp_neg(r) / (2.0 * r))
    if kind == "matern15":
        return -1.5 * exp_neg(math.sqrt(3.0) * r)
    return (-5.0 / 6.0) * (1.0 + math.sqrt(5.0) * r) * exp_neg(math.sqrt(5.0) * r)


def _scaled_tile_kernel(kind, fast, x1_ref, x2_ref, ls_ref, os_ref, out_ref):
    """Like _tile_kernel with a per-batch outputscale applied in VMEM.
    os_ref holds the FULL (B, 1) array (a (1, 1) block would violate
    Mosaic's block-shape rule: the sublane dim must divide 8 or equal the
    array dim); the per-batch element is picked by program id."""
    os_b = os_ref[pl.program_id(0), 0]
    inv_l = 1.0 / ls_ref[0]
    a = x1_ref[:] * inv_l
    b = x2_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    out_ref[0] = (_profile(kind, d2, fast) * os_b).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kind", "interpret", "out_dtype"))
def scaled_kernel_stack(x1, x2, lengthscale, outputscale, kind: str,
                        interpret: bool = False, out_dtype=None):
    """os_b · K_b tiles written straight from VMEM: the ScaleKernel epilogue
    fused into the builder, so the fused-MLL forward (ops/fused_mll.py) never
    streams the (B, n, m) stack a second time to apply the outputscale.
    NOT differentiable (no VJP rule): callers own the gradient (the fused MLL
    computes it analytically from its low-rank cotangent factors)."""
    n, d = x1.shape
    m = x2.shape[0]
    B = lengthscale.shape[0]
    tile = _pick_tile(n, m)
    n_pad = (-n) % tile
    m_pad = (-m) % tile
    x1p = jnp.pad(x1, ((0, n_pad), (0, 0)))
    x2p = jnp.pad(x2, ((0, m_pad), (0, 0)))
    np_, mp_ = n + n_pad, m + m_pad
    fast = out_dtype == jnp.bfloat16
    grid = (B, np_ // tile, mp_ // tile)
    out = pl.pallas_call(
        functools.partial(_scaled_tile_kernel, kind, fast),
        out_shape=jax.ShapeDtypeStruct((B, np_, mp_), out_dtype or x1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x1p, x2p, lengthscale, outputscale.reshape(B, 1))
    return out[:, :n, :m]


def _quant_tile_kernel(kind, x1_ref, x2_ref, ls_ref, out_ref):
    """Stationary profile quantized to int8 in VMEM: round(g(d²)·127).
    g ∈ [0, 1] exactly, so the symmetric scale 1/127 is range-exact; the
    per-latent outputscale stays OUT of the tile and folds into the
    dequantization scale (os_b/127) at the consumer."""
    inv_l = 1.0 / ls_ref[0]
    a = x1_ref[:] * inv_l
    b = x2_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    # int8's own 1/254 rounding dwarfs the fast-exp error — always fast
    p = _profile(kind, d2, fast=True)
    out_ref[0] = jnp.round(p * 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def quantized_kernel_stack(x1, x2, lengthscale, kind: str,
                           interpret: bool = False):
    """int8 kernel-stack tiles written straight from VMEM (no fp32/bf16
    (B, n, m) object ever reaches HBM). Consumers dequantize with
    os_b/127 — see ops/iterative.lmc_matvec_int8. NOT differentiable;
    the fused MLL owns the gradient analytically."""
    n, d = x1.shape
    m = x2.shape[0]
    B = lengthscale.shape[0]
    tile = _pick_tile(n, m)
    n_pad = (-n) % tile
    m_pad = (-m) % tile
    x1p = jnp.pad(x1, ((0, n_pad), (0, 0)))
    x2p = jnp.pad(x2, ((0, m_pad), (0, 0)))
    np_, mp_ = n + n_pad, m + m_pad
    grid = (B, np_ // tile, mp_ // tile)
    out = pl.pallas_call(
        functools.partial(_quant_tile_kernel, kind),
        out_shape=jax.ShapeDtypeStruct((B, np_, mp_), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x1p, x2p, lengthscale)
    return out[:, :n, :m]


def _scaled_tile_kernel_tri(kind, fast, idx_ref, x1_ref, x2_ref, ls_ref,
                            os_ref, out_ref):
    """Triangular-grid body of the symmetric builder: same math as
    _scaled_tile_kernel, block indices via scalar prefetch."""
    os_b = os_ref[pl.program_id(0), 0]
    inv_l = 1.0 / ls_ref[0]
    a = x1_ref[:] * inv_l
    b = x2_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    out_ref[0] = (_profile(kind, d2, fast) * os_b).astype(out_ref.dtype)


def _mirror_tile(idx_ref, in_ref, out_ref):
    out_ref[0] = in_ref[0].T


def _symmetrize_lower(K, tile, interpret: bool = False):
    """Fill the strict-upper tiles of ``K`` (B, n, n) with the transposes of
    the already-computed strict-lower tiles, in place (aliased pallas_call —
    unvisited blocks keep their input values). HBM cost: read + write of
    half the stack; saves the full transcendental evaluation of that half."""
    B, np_, _ = K.shape
    nt = np_ // tile
    up = [(i, j) for i in range(nt) for j in range(i + 1, nt)]
    if not up:
        return K
    idx = jnp.asarray(np.array(up, dtype=np.int32).T)      # (2, T_up)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, len(up)),
        in_specs=[pl.BlockSpec((1, tile, tile),
                               lambda b, t, idx: (b, idx[1, t], idx[0, t]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, tile),
                               lambda b, t, idx: (b, idx[0, t], idx[1, t]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mirror_tile,
        out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},   # K (operand 1 after the prefetch) -> out
        interpret=interpret,
    )(idx, K)


@functools.partial(jax.jit, static_argnames=("kind", "out_dtype", "interpret"))
def scaled_kernel_stack_sym(x, lengthscale, outputscale, kind: str,
                            out_dtype=None, interpret: bool = False):
    """Symmetric-case :func:`scaled_kernel_stack` (x1 ≡ x2): evaluates only
    the lower-triangular tiles (half the transcendental VPU work — the
    dominant cost of the build at large n) and mirrors them into the upper
    half with an in-place aliased transpose pass. TPU only."""
    n, d = x.shape
    B = lengthscale.shape[0]
    tile = _pick_tile(n, n)
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    np_ = n + pad
    nt = np_ // tile
    fast = out_dtype == jnp.bfloat16
    tri = [(i, j) for i in range(nt) for j in range(i + 1)]
    idx = jnp.asarray(np.array(tri, dtype=np.int32).T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, len(tri)),
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[1, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, t, idx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile),
                               lambda b, t, idx: (b, idx[0, t], idx[1, t]),
                               memory_space=pltpu.VMEM),
    )
    Klow = pl.pallas_call(
        functools.partial(_scaled_tile_kernel_tri, kind, fast),
        out_shape=jax.ShapeDtypeStruct((B, np_, np_),
                                       out_dtype or x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, xp, xp, lengthscale, outputscale.reshape(B, 1))
    K = _symmetrize_lower(Klow, tile, interpret=interpret)
    return K[:, :n, :n]


def _lowrank_vjp_tile(kind, x_row_ref, x_col_ref, ls_ref, a_ref, b_ref,
                      rows_ref, wx_ref):
    """One (tile × tile) block of the SYMMETRIC low-rank kernel-cotangent
    reduction: W = (A_i B_jᵀ) ⊙ dprofile(d²_ij), accumulating row sums and
    W @ x_j over the (innermost) column-tile sweep. The (B, n, n) cotangent
    and the W intermediate never exist in HBM — only their row-reductions."""
    j = pl.program_id(2)
    inv_l = 1.0 / ls_ref[0]
    a = x_row_ref[:] * inv_l
    b = x_col_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    T = jax.lax.dot_general(                       # (tile, tile) rank-r tile
        a_ref[0], b_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    W = T * _dprofile(kind, d2, fast=True)
    # rows carried as (1, tile, 1): a (1, tile) block over a (B, n) array
    # would put a unit block in the sublane dim (Mosaic rejects it)
    rows_t = jnp.sum(W, axis=1)[None, :, None]     # (1, tile, 1)
    wx_t = jax.lax.dot_general(                    # (tile, d)
        W, x_col_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[None]

    @pl.when(j == 0)
    def _init():
        rows_ref[...] = rows_t
        wx_ref[...] = wx_t

    @pl.when(j != 0)
    def _acc():
        rows_ref[...] += rows_t
        wx_ref[...] += wx_t


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def lowrank_stationary_reduce(x, lengthscale, A, Bf, kind: str,
                              interpret: bool = False):
    """(rows, wx) reductions of the symmetric low-rank kernel cotangent
    dK_b = A_b B_bᵀ (A, Bf: (B, n, r)) against the stationary profile
    derivative: rows[b,i] = Σ_j W_bij, wx[b,i,:] = Σ_j W_bij x_j with
    W_b = (A_b B_bᵀ) ⊙ dprofile(d²_b). Everything a symmetric stationary
    kernel's lengthscale VJP needs, without materializing dK or W."""
    n, d = x.shape
    B, _, r = A.shape
    tile = _pick_tile(n, n)
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    Ap = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
    Bp = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad
    grid = (B, np_ // tile, np_ // tile)
    rows, wx = pl.pallas_call(
        functools.partial(_lowrank_vjp_tile, kind),
        out_shape=(jax.ShapeDtypeStruct((B, np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, np_, d), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, tile, 1), lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile, d), lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xp, xp, lengthscale, Ap, Bp)
    return rows[:, :n, 0], wx[:, :n]


def _lowrank_vjp_tile_sym(kind, tile, idx_ref, x_row_ref, x_col_ref, ls_ref,
                          a_ref, b_ref, rows_ref, wx_ref):
    """Triangular-grid variant of :func:`_lowrank_vjp_tile` for SYMMETRIC
    cotangents W = Wᵀ (the fused MLL's dK is symmetric by construction):
    only tiles with i ≥ j are evaluated — the dprofile/transcendental pass,
    the dominant VPU cost of the backward, runs on half the entries.

    Accumulator layout (the part Mosaic is picky about): each batch element
    keeps ONE full-height (n, 1)/(n, d) output block resident in VMEM for the
    whole triangular sweep, and each tile adds its row reduction at dynamic
    row offset i·tile and (for strict-lower tiles) its mirrored column
    reduction at offset j·tile. An earlier variant used four per-row-block
    accumulators with the mirrored pair's out-blocks indexed by j — those
    blocks are revisited NON-consecutively across a row-major triangular
    grid, and Mosaic's write-back/refetch of a revisited output window races:
    measured nondeterministic wx errors up to ~1e0 at n=10240 on a v5e while
    interpret mode (and small grids, sometimes) pass. Resident blocks are
    visited consecutively by construction."""
    t = pl.program_id(1)
    i = idx_ref[0, t]
    j = idx_ref[1, t]

    @pl.when(t == 0)
    def _zero():
        rows_ref[...] = jnp.zeros_like(rows_ref)
        wx_ref[...] = jnp.zeros_like(wx_ref)

    inv_l = 1.0 / ls_ref[0]
    a = x_row_ref[:] * inv_l
    b = x_col_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    T = jax.lax.dot_general(
        a_ref[0], b_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    W = T * _dprofile(kind, d2, fast=True)
    rows_t = jnp.sum(W, axis=1)[:, None]           # (tile, 1)
    wx_t = jax.lax.dot_general(
        W, x_col_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # (tile, d)
    ri = pl.dslice(i * tile, tile)
    rows_ref[0, ri, :] += rows_t
    wx_ref[0, ri, :] += wx_t

    @pl.when(i != j)
    def _mirror():
        cols_t = jnp.sum(W, axis=0)[:, None]
        wxc_t = jax.lax.dot_general(                # Wᵀ @ x_i, (tile, d)
            W, x_row_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        rj = pl.dslice(j * tile, tile)
        rows_ref[0, rj, :] += cols_t
        wx_ref[0, rj, :] += wxc_t


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def lowrank_stationary_reduce_sym(x, lengthscale, A, Bf, kind: str,
                                  interpret: bool = False):
    """:func:`lowrank_stationary_reduce` for SYMMETRIC cotangents
    (A Bᵀ = B Aᵀ — true for the fused MLL's factor construction): evaluates
    only the lower-triangular tiles, ~2× less transcendental VPU work. The
    accumulators live as one full-height resident VMEM block per batch
    element (n·(1+d)·4 bytes — ~400 KB at n=20k) so no output window is ever
    revisited non-consecutively; see the kernel docstring for the Mosaic
    race this avoids."""
    n, d = x.shape
    B, _, r = A.shape
    tile = _pick_tile(n, n)
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    Ap = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
    Bp = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad
    nt = np_ // tile
    tri = [(i, j) for i in range(nt) for j in range(i + 1)]
    idx = jnp.asarray(np.array(tri, dtype=np.int32).T)     # (2, T_tri)
    grid = (B, len(tri))
    out_shapes = (jax.ShapeDtypeStruct((B, np_, 1), jnp.float32),
                  jax.ShapeDtypeStruct((B, np_, d), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[1, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[1, t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, np_, 1), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    rows, wx = pl.pallas_call(
        functools.partial(_lowrank_vjp_tile_sym, kind, tile),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, xp, xp, lengthscale, Ap, Bp)
    return rows[:, :n, 0], wx[:, :n]


def _lowrank_vjp_tile_sym_kr(kind, tile, idx_ref, x_row_ref, x_col_ref,
                             ls_ref, os_ref, a_ref, b_ref, a2_ref,
                             out_i_ref, colred_ref):
    """Fully-fused backward tile (perf lever 2, results/PERF_NOTES.md): one
    triangular-grid pass computes BOTH the kernel-cotangent reductions
    (rows, wx — as :func:`_lowrank_vjp_tile_sym`) AND the kernel-stack
    contraction KA_b = (os_b·K_b) @ A_b that the fused MLL's dH/dΣt/dos
    cotangents need. The profile and dprofile share the transcendental
    (exp) evaluation, so the marginal VPU cost is a few fmas — and the
    separate bf16 stack stream (``it._stack_matmul(Ks, R3)``, ~0.8 GB read
    at n=10⁴) disappears from the backward entirely.

    Race-free WITHOUT full-height resident accumulators (the n≈13k VMEM
    ceiling of :func:`_lowrank_vjp_tile_sym`): the row-indexed output block
    is revisited consecutively (the triangular grid is row-major in i), and
    every mirrored (column-side) contribution goes to a per-TILE slot of
    ``colred`` — visited exactly once — that the wrapper scatter-adds by
    column index afterwards. VMEM per grid step is O(tile·(1+d+r)),
    independent of n."""
    t = pl.program_id(1)
    i = idx_ref[0, t]
    j = idx_ref[1, t]
    os_b = os_ref[pl.program_id(0), 0]
    d = x_row_ref.shape[1]

    inv_l = 1.0 / ls_ref[0]
    a = x_row_ref[:] * inv_l
    b = x_col_ref[:] * inv_l
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    # shared transcendental: profile AND dprofile from one exp evaluation
    r_ = jnp.sqrt(jnp.maximum(d2, 1e-30))
    if kind == "rbf":
        e = _fast_exp_neg(0.5 * d2)
        prof = e
        dprof = -0.5 * e
    elif kind == "matern05":
        e = _fast_exp_neg(r_)
        prof = e
        dprof = jnp.where(d2 <= 1e-12, jnp.zeros_like(d2),
                          -e / (2.0 * r_))
    elif kind == "matern15":
        c = math.sqrt(3.0) * r_
        e = _fast_exp_neg(c)
        prof = (1.0 + c) * e
        dprof = -1.5 * e
    else:                                   # matern25
        c = math.sqrt(5.0) * r_
        e = _fast_exp_neg(c)
        prof = (1.0 + c + (5.0 / 3.0) * d2) * e
        dprof = (-5.0 / 6.0) * (1.0 + c) * e
    K_tile = prof * os_b                                     # (tile, tile)
    T_ = jax.lax.dot_general(
        a_ref[0], b_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    W = T_ * dprof
    rows_t = jnp.sum(W, axis=1)[:, None]                     # (tile, 1)
    wx_t = jax.lax.dot_general(
        W, x_col_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                 # (tile, d)
    # default (bf16-pass) MXU precision: the contraction this replaces read
    # a bf16 stack from HBM, so bf16-class error here is the status quo —
    # and HIGHEST fp32 passes made the fused kernel slower than the pair it
    # replaces (measured 15.7 vs 11.7 ms at n=10240)
    ka_t = jax.lax.dot_general(                              # K_ij @ A_j
        K_tile, a2_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (tile, r)
    out_t = jnp.concatenate([rows_t, wx_t, ka_t], axis=1)[None]

    is_first_for_row = j == 0           # row-major tri: first visit of row i

    @pl.when(is_first_for_row)
    def _init():
        out_i_ref[...] = out_t

    @pl.when(jnp.logical_not(is_first_for_row))
    def _acc():
        out_i_ref[...] += out_t

    # mirrored (column-side) contributions — per-tile slot, visited once
    @pl.when(i != j)
    def _mirror():
        cols_t = jnp.sum(W, axis=0)[:, None]
        wxc_t = jax.lax.dot_general(                         # Wᵀ @ x_i
            W, x_row_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        kac_t = jax.lax.dot_general(                         # K_ijᵀ @ A_i
            K_tile, a_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        colred_ref[...] = jnp.concatenate([cols_t, wxc_t, kac_t],
                                          axis=1)[None, None]

    @pl.when(i == j)
    def _diag():
        colred_ref[...] = jnp.zeros_like(colred_ref)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def lowrank_stationary_reduce_sym_kr(x, lengthscale, outputscale, A, Bf,
                                     kind: str, interpret: bool = False):
    """(rows, wx, KA) in ONE triangular-grid pass (perf lever 2):

      rows[b,i] = Σ_j W_bij,   wx[b,i,:] = Σ_j W_bij x_j,
      KA_b      = (os_b · K_b) @ A_b                          (n, r)

    with W_b = (A_b Bfᵀ_b) ⊙ dprofile(d²_b) SYMMETRIC (the fused MLL's
    factor construction guarantees A Bfᵀ = Bf Aᵀ). Replaces the pair
    {lowrank_stationary_reduce_sym, separate bf16-stack matmul} in the
    fused MLL backward: the kernel profile is recomputed per tile sharing
    the dprofile transcendental, so the stack is never re-read.

    Unlike :func:`lowrank_stationary_reduce_sym`, VMEM use is independent
    of n (no full-height resident accumulators): mirrored contributions go
    to per-tile slots scatter-added here by column block. No VMEM gate
    needed at any n."""
    n, d = x.shape
    B, _, r = A.shape
    tile = _pick_tile(n, n)
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    Ap = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
    Bp = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad
    nt = np_ // tile
    tri = [(i, j) for i in range(nt) for j in range(i + 1)]
    idx = jnp.asarray(np.array(tri, dtype=np.int32).T)       # (2, T_tri)
    C = 1 + d + r
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, len(tri)),
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[1, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, t, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[0, t], 0),
                         memory_space=pltpu.VMEM),        # A at row block i
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[1, t], 0),
                         memory_space=pltpu.VMEM),        # Bf at col block j
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[1, t], 0),
                         memory_space=pltpu.VMEM),        # A at col block j
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, t, idx: (b, idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, C), lambda b, t, idx: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_i, colred = pl.pallas_call(
        functools.partial(_lowrank_vjp_tile_sym_kr, kind, tile),
        out_shape=(jax.ShapeDtypeStruct((B, np_, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, len(tri), tile, C), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, xp, xp, lengthscale, outputscale.reshape(B, 1), Ap, Bp, Ap)
    # scatter the per-tile mirrored contributions onto their column blocks
    j_ids = jnp.asarray(np.array([j for _, j in tri], dtype=np.int32))
    contrib = jax.ops.segment_sum(jnp.swapaxes(colred, 0, 1), j_ids,
                                  num_segments=nt)           # (nt, B, tile, C)
    total = out_i.reshape(B, nt, tile, C) \
        + jnp.transpose(contrib, (1, 0, 2, 3))
    total = total.reshape(B, np_, C)
    return (total[:, :n, 0], total[:, :n, 1:1 + d],
            total[:, :n, 1 + d:])


def _lowrank_vjp_tile_sym_krs(kind, tile, idx_ref, x_row_ref, x_col_ref,
                              ls_ref, os_ref, a_ref, b_ref, a2_ref, k_ref,
                              out_i_ref, colred_ref):
    """Streamed-K variant of :func:`_lowrank_vjp_tile_sym_kr` (VERDICT r3
    item 4): the kernel STACK TILE is read from HBM (it is already
    materialized for CG) and dprofile is recovered from it by the rational
    identity — for Matern-2.5, e^{-c} = prof/(1+c+c²/3), so
    dprof = −(5/6)(1+c)/(1+c+(5/3)d²) · prof — eliminating the exp2
    sequence (the dominant VPU cost of the backward pass) entirely. d² is
    recomputed on the MXU as before (sqrt ≪ exp on the VPU); for RBF not
    even that is needed (dprof = −K/2os).

    The streamed tile is os-scaled at the producer, so the recovered dprof
    carries an extra os_b that the caller's Bfac folding would double-count
    — divided out in-tile. Non-divisible n: the K stack is NOT padded (a
    pad would copy the multi-GB stack); boundary blocks may contain
    arbitrary memory, masked to 0 via isfinite (the A/B factors are
    zero-padded, so finite garbage already cancels exactly)."""
    t = pl.program_id(1)
    i = idx_ref[0, t]
    j = idx_ref[1, t]
    os_b = os_ref[pl.program_id(0), 0]

    Kt = k_ref[0].astype(jnp.float32)                        # (tile, tile)
    Kt = jnp.where(jnp.isfinite(Kt), Kt, 0.0)
    if kind == "rbf":
        dprofK = (-0.5 / os_b) * Kt
    else:
        inv_l = 1.0 / ls_ref[0]
        a = x_row_ref[:] * inv_l
        b = x_col_ref[:] * inv_l
        cross = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        n1 = jnp.sum(a * a, axis=1, keepdims=True)
        n2 = jnp.sum(b * b, axis=1, keepdims=True)
        d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
        r_ = jnp.sqrt(jnp.maximum(d2, 1e-30))
        if kind == "matern05":
            dprofK = jnp.where(d2 <= 1e-12, jnp.zeros_like(d2),
                               (-0.5 / os_b) * Kt / r_)
        elif kind == "matern15":
            c = math.sqrt(3.0) * r_
            dprofK = (-1.5 / os_b) * Kt / (1.0 + c)
        else:                               # matern25
            c = math.sqrt(5.0) * r_
            dprofK = ((-5.0 / 6.0) / os_b) * Kt * (1.0 + c) \
                / (1.0 + c + (5.0 / 3.0) * d2)
    T_ = jax.lax.dot_general(
        a_ref[0], b_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    W = T_ * dprofK
    rows_t = jnp.sum(W, axis=1)[:, None]                     # (tile, 1)
    wx_t = jax.lax.dot_general(
        W, x_col_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                 # (tile, d)
    # same MXU precision rationale as the kr kernel: the tile replaces a
    # bf16 HBM stream, bf16-pass error is the status quo
    ka_t = jax.lax.dot_general(                              # K_ij @ A_j
        Kt, a2_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (tile, r)
    out_t = jnp.concatenate([rows_t, wx_t, ka_t], axis=1)[None]

    is_first_for_row = j == 0

    @pl.when(is_first_for_row)
    def _init():
        out_i_ref[...] = out_t

    @pl.when(jnp.logical_not(is_first_for_row))
    def _acc():
        out_i_ref[...] += out_t

    @pl.when(i != j)
    def _mirror():
        cols_t = jnp.sum(W, axis=0)[:, None]
        wxc_t = jax.lax.dot_general(                         # Wᵀ @ x_i
            W, x_row_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        kac_t = jax.lax.dot_general(                         # K_ijᵀ @ A_i
            Kt, a_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        colred_ref[...] = jnp.concatenate([cols_t, wxc_t, kac_t],
                                          axis=1)[None, None]

    @pl.when(i == j)
    def _diag():
        colred_ref[...] = jnp.zeros_like(colred_ref)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def lowrank_stationary_reduce_sym_krs(x, lengthscale, outputscale, A, Bf,
                                      Ks, kind: str, interpret: bool = False):
    """(rows, wx, KA) like :func:`lowrank_stationary_reduce_sym_kr`, but the
    kernel stack ``Ks`` (B, n, n) — os-scaled, FULL/mirrored, bf16 or fp32,
    already in HBM for the CG forward — is STREAMED tile-by-tile instead of
    recomputed: the backward's transcendental pass (exp2 sequence per
    entry, the measured n=20k bottleneck) is replaced by an HBM read plus a
    rational correction (sqrt + divide). Lower-triangular tiles only
    (~half the stack bytes). Accuracy: the stack's own dtype rounding
    (bf16 ~0.4% rel) enters dprofile and hence the lengthscale gradient —
    same class as the CG matvecs that use the very same stack."""
    n, d = x.shape
    B, _, r = A.shape
    tile = _pick_tile(n, n)
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    Ap = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
    Bp = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad
    nt = np_ // tile
    tri = [(i, j) for i in range(nt) for j in range(i + 1)]
    idx = jnp.asarray(np.array(tri, dtype=np.int32).T)       # (2, T_tri)
    C = 1 + d + r
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, len(tri)),
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, t, idx: (idx[1, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, t, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, t, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[0, t], 0),
                         memory_space=pltpu.VMEM),        # A at row block i
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[1, t], 0),
                         memory_space=pltpu.VMEM),        # Bf at col block j
            pl.BlockSpec((1, tile, r), lambda b, t, idx: (b, idx[1, t], 0),
                         memory_space=pltpu.VMEM),        # A at col block j
            pl.BlockSpec((1, tile, tile),
                         lambda b, t, idx: (b, idx[0, t], idx[1, t]),
                         memory_space=pltpu.VMEM),        # K stack, unpadded
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, t, idx: (b, idx[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, C), lambda b, t, idx: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_i, colred = pl.pallas_call(
        functools.partial(_lowrank_vjp_tile_sym_krs, kind, tile),
        out_shape=(jax.ShapeDtypeStruct((B, np_, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, len(tri), tile, C), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, xp, xp, lengthscale, outputscale.reshape(B, 1), Ap, Bp, Ap, Ks)
    j_ids = jnp.asarray(np.array([j for _, j in tri], dtype=np.int32))
    contrib = jax.ops.segment_sum(jnp.swapaxes(colred, 0, 1), j_ids,
                                  num_segments=nt)           # (nt, B, tile, C)
    total = out_i.reshape(B, nt, tile, C) \
        + jnp.transpose(contrib, (1, 0, 2, 3))
    total = total.reshape(B, np_, C)
    return (total[:, :n, 0], total[:, :n, 1:1 + d],
            total[:, :n, 1 + d:])


def xla_kernel_matrix(x1, x2, lengthscale, kind: str = "matern25"):
    """Reference XLA implementation of the same op (used as the VJP rule of
    the fused Pallas forward — kernels.py's non-pallas path, de-duplicated)."""
    a = x1[None] / lengthscale                               # (B, n, d)
    b = x2[None] / lengthscale
    n1 = jnp.sum(a * a, axis=-1)
    n2 = jnp.sum(b * b, axis=-1)
    cross = jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(n1[..., :, None] + n2[..., None, :] - 2.0 * cross, 1e-30)
    return _profile(kind, d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_kernel_matrix(x1, x2, lengthscale, kind: str = "matern25",
                        interpret: bool = False, out_dtype=None):
    """K[b, i, j] = g(||(x1_i − x2_j) / l_b||²), shapes:
    x1 (n, d), x2 (m, d), lengthscale (B, 1, d) -> (B, n, m).

    ``out_dtype`` (e.g. bfloat16) makes each tile leave VMEM already
    downcast — the bf16 kernel-stack path never writes an fp32 (B, n, m)
    object to HBM (compute stays fp32 inside the tile).

    Differentiable: pallas_call has no autodiff rule, so the backward pass is
    the VJP of the mathematically identical XLA formulation (one fused
    recompute — XLA fuses the elementwise tail into the backward matmuls)."""
    return _pallas_forward(x1, x2, lengthscale, kind, interpret, out_dtype)


def _fused_fwd(x1, x2, lengthscale, kind, interpret, out_dtype):
    out = _pallas_forward(x1, x2, lengthscale, kind, interpret, out_dtype)
    return out, (x1, x2, lengthscale)


def _fused_bwd(kind, interpret, out_dtype, res, g):
    x1, x2, lengthscale = res
    _, vjp = jax.vjp(lambda a, b, l: xla_kernel_matrix(a, b, l, kind),
                     x1, x2, lengthscale)
    return vjp(g.astype(x1.dtype))


fused_kernel_matrix.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("kind", "interpret", "out_dtype"))
def _pallas_forward(x1, x2, lengthscale, kind: str = "matern25",
                    interpret: bool = False, out_dtype=None):
    n, d = x1.shape
    m = x2.shape[0]
    B = lengthscale.shape[0]
    tile = _pick_tile(n, m)
    n_pad = (-n) % tile
    m_pad = (-m) % tile
    x1p = jnp.pad(x1, ((0, n_pad), (0, 0)))
    x2p = jnp.pad(x2, ((0, m_pad), (0, 0)))
    np_, mp_ = n + n_pad, m + m_pad

    # the short exp2 sequence replaces libm exp whenever the result is
    # downcast to bf16 anyway (its ~2e-5 rel err is noise next to 2⁻⁸)
    fast = out_dtype == jnp.bfloat16
    grid = (B, np_ // tile, mp_ // tile)
    out = pl.pallas_call(
        functools.partial(_tile_kernel, kind, fast),
        out_shape=jax.ShapeDtypeStruct((B, np_, mp_), out_dtype or x1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda b, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x1p, x2p, lengthscale)
    return out[:, :n, :m]
