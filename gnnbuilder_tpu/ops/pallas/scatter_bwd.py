"""Transpose-scatter backward kernel — the forward-table Pallas backward.

The reverse-ELL gather backward (ops/pallas/ell_bwd.py) walks REVERSE
tables and pays per-slot gathers for every compare term: for PNA
(max+min+std) that is a 4F-wide split2 gather plus an exact count-SpMM —
measured ~0.89 ms/layer at b1024, ~3x the forward.  This kernel runs the
same math over the FORWARD table instead:

* every coefficient the backward needs (c_lin, c_a, mean, mx, mn, c_mx,
  c_mn) is a RECEIVER-row quantity — over the forward table the receiver
  rows are the blocked tile rows, so the coefficients arrive as plain
  blocked VMEM reads: no coefficient gathers, no HIGHEST SpMM, and no
  reverse tables at all;
* the only gather left is re-reading the forward's message values
  g = s(v[nbr]) (bit-exact: the split2 hi/lo reconstruction is idempotent
  on values, ops/pallas/ell_bwd.py docstring), one F-wide pass;
* the per-slot contribution
      C = (c_lin - c_a*mean) + c_a*g + [g==mx]*c_mx + [g==mn]*c_mn
  is formed in-register on the VPU, then one TRANSPOSED one-hot matmul
  scatters it to the senders:  S = OH^T @ C.

Scatter geometry (the part gathers never needed): contributions from
receiver tile i land on sender rows [i*TN - 2*slack, i*TN + TN + 2*slack)
— the union of the tile's (clamped) forward sub-windows.  The kernel
accumulates the whole window in a VMEM accumulator, emits the own TN rows
as a blocked output, and the +-2*slack margins as a per-tile side output;
the caller overlap-adds the margins with two STATIC shift-adds in XLA
(margins of adjacent tiles never overlap each other because the dispatch
guarantee TNS >= 2*slack bounds the window reach).  Edge tiles need no
special casing: ``v`` is zero-padded by 2*slack rows on both sides so
every tile's window is uniform, and clamped forward windows keep all slot
ids inside [0, N) — out-of-range margin rows are simply never scattered
to, so they stay at the accumulator's zero.

Numerics contracts (identical to ell_bwd):

* g is re-gathered in the forward's gather_mode domain, so compares
  against the forward-saved mx/mn reproduce the forward's argmax
  decisions and the std deviation term sees the forward's message values.
  The degree-1 std cancellation is *stronger* here than in the reverse
  kernel: mean == g bitwise for a degree-1 receiver, so c_a*(g - mean)
  is exactly zero BEFORE the scatter.
* the scatter matmul always runs hi/lo split2 bf16 passes (exact one-hot
  products, ~f32-ulp reconstruction) — six-pass exact f32 under
  "highest".  Gradient SUMS keep split-f32 accuracy even under the bf16
  policy; only compares/deviations live in the bf16 message domain,
  matching the gather backward's contract.
* pad slots (id -1) produce all-zero one-hot COLUMNS, so their (possibly
  nonzero) C rows contribute nothing — validity costs nothing.

Reference counterpart: the reference has no training path (SURVEY.md §1);
this kernel is the performance successor to ell_bwd.fused_gather_backward
for compare-heavy aggregators (PNA), selected per-shape by the callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _HI,
    _schedule,
    _stack_ids,
    _sub_rows,
    supports,
)

__all__ = ["fused_scatter_backward", "supports_scatter"]

# VMEM working-set budget (16 MB hardware, headroom for Mosaic spills)
_VMEM_BUDGET = 10 * 1024 * 1024


def supports_scatter(
    num_nodes: int,
    tile_rows: int,
    window_slack: int,
    feature_dim: int = 128,
    n_terms: int = 7,
) -> bool:
    """Static preconditions for the scatter backward.  Beyond the shared
    window preconditions: real sub-tiling (slack > 0, 128-divisible
    tiles), at least two tiles (a single tile has no margins and the
    gather backward is equivalent there), margin disjointness
    (TNS >= 2*slack, the dispatch guarantee), and a VMEM estimate."""
    tn, sl = tile_rows, window_slack
    # feature lanes must be 128-aligned (Mosaic DMA lane alignment — the
    # same gate dispatch.py applies to every fused layer)
    if feature_dim % 128:
        return False
    if sl <= 0 or tn % 128 or not supports(num_nodes, tn, sl):
        return False
    tns = _sub_rows(tn, sl)
    if num_nodes // tn < 2 or tns < 2 * sl or tn < 2 * sl:
        return False
    twb = tn + 4 * sl
    tws = tns + 2 * sl
    f, k = feature_dim, n_terms
    est = 4 * (
        2 * twb * f            # double-buffered v window
        + twb * f              # accumulator
        + 2 * tn * k * f       # pipelined cstk block
        + 2 * tws * f          # S accumulator + gather temporaries
        + tns * tws * 2        # one-hot pair
    )
    return est <= _VMEM_BUDGET


def _kernel(
    offs_ref,    # scalar prefetch: [N/TNS] sub-window offset in tile window
    v_hbm,       # [N + 4*slack, F] ANY — zero-padded sender rows
    cstk_ref,    # [TN, K*F] VMEM — receiver-row coefficient blocks
    idc_ref,     # [W*TN, 1] int32 sub-window-localized slot ids (-1 = pad)
    idr_ref,     # [1, W*TN] the same ids in row layout (scatter one-hots)
    own_ref,     # [TN, F] out — window rows [2*slack, 2*slack + TN)
    marg_ref,    # [1, 4*slack, F] out — left | right margin rows
    v_win,       # scratch [2*TWB, F] double-buffered window
    acc,         # scratch [TWB, F] f32 window accumulator
    dma_sem,     # DMA semaphores (2,)
    *,
    W: int,
    TNS: int,
    TWS: int,
    TWB: int,
    F: int,
    S2: int,     # 2 * slack
    has_lin: bool,
    has_dev: bool,
    n_cmp: int,
    fwd_gather_mode: str,
):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = own_ref.shape[0]
    KT = TN // TNS
    LF = F if has_lin else 0
    DF = 2 * F if has_dev else 0

    def win_copy(t, buf):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(t * TN, TWB), :],
            v_win.at[pl.ds(buf * TWB, TWB), :],
            dma_sem.at[buf],
        )

    @pl.when(i == 0)
    def _():
        win_copy(0, 0).start()

    buf = jax.lax.rem(i, 2)
    win_copy(i, buf).wait()

    @pl.when(i + 1 < nt)
    def _():
        win_copy(i + 1, jax.lax.rem(i + 1, 2)).start()

    acc[:] = jnp.zeros((TWB, F), jnp.float32)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TNS, TWS), 1)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (TWS, TNS), 0)
    bdot = lambda m, x: jnp.dot(m, x, preferred_element_type=jnp.float32)

    def sub_tile(k, carry):
        j = i * KT + k
        off = pl.multiple_of(offs_ref[j], 8)
        rows = pl.multiple_of(k * TNS, 8)
        slot0 = pl.multiple_of(k * W * TNS, 8)

        sub = v_win[pl.ds(buf * TWB + off, TWS), :]          # [TWS, F]
        cs = cstk_ref[pl.ds(rows, TNS), :]                   # [TNS, K*F]
        idc = idc_ref[pl.ds(slot0, W * TNS), :]              # [W*TNS, 1]
        idr = idr_ref[:, pl.ds(slot0, W * TNS)]              # [1, W*TNS]

        # per-receiver constant term (pad slots are killed by the zero
        # one-hot scatter column, so no validity mask is needed on C)
        c0 = None
        if has_lin:
            c0 = cs[:, :LF]
        if has_dev:
            ca = cs[:, LF : LF + F]
            ca_mean = cs[:, LF + F : LF + DF]
            c0 = ca_mean * -1.0 if c0 is None else c0 - ca_mean

        if fwd_gather_mode in ("split2", "bf16"):
            sub_h = sub.astype(jnp.bfloat16)
            sub_l = (
                (sub - sub_h.astype(jnp.float32)).astype(jnp.bfloat16)
                if fwd_gather_mode == "split2" else None
            )

        s_acc = jnp.zeros((TWS, F), jnp.float32)
        for w in range(W):
            ids_w = idc[w * TNS : (w + 1) * TNS, :]          # [TNS, 1]
            oh = ids_w == lane_g                             # [TNS, TWS]
            # re-gather the forward's message values bit-exactly
            # (idempotent split2 reconstruction, module docstring)
            if fwd_gather_mode == "highest":
                g = jnp.dot(
                    oh.astype(jnp.float32), sub,
                    preferred_element_type=jnp.float32, precision=_HI,
                )
            else:
                ohb = oh.astype(jnp.bfloat16)
                g = bdot(ohb, sub_h)
                if sub_l is not None:
                    g = g + bdot(ohb, sub_l)

            C = c0 if c0 is not None else jnp.zeros((TNS, F), jnp.float32)
            if has_dev:
                C = C + ca * g
            for c in range(n_cmp):
                ref = cs[:, LF + DF + 2 * c * F : LF + DF + (2 * c + 1) * F]
                coef = cs[
                    :, LF + DF + (2 * c + 1) * F : LF + DF + (2 * c + 2) * F
                ]
                C = C + jnp.where(g == ref, coef, 0.0)

            # scatter precision is independent of the gather domain: like
            # the gather backward, gradient SUMS stay at split-f32 accuracy
            # even under the bf16 policy (only compares/deviations live in
            # the bf16 message domain)
            oht = lane_s == idr[:, w * TNS : (w + 1) * TNS]  # [TWS, TNS]
            if fwd_gather_mode == "highest":
                s_acc = s_acc + jnp.dot(
                    oht.astype(jnp.float32), C,
                    preferred_element_type=jnp.float32, precision=_HI,
                )
            else:
                ohtb = oht.astype(jnp.bfloat16)
                ch = C.astype(jnp.bfloat16)
                cl = (C - ch.astype(jnp.float32)).astype(jnp.bfloat16)
                s_acc = s_acc + bdot(ohtb, ch) + bdot(ohtb, cl)

        acc[pl.ds(off, TWS), :] = acc[pl.ds(off, TWS), :] + s_acc
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)

    own_ref[:] = acc[S2 : S2 + TN, :]
    marg_ref[0, :S2, :] = acc[:S2, :]
    marg_ref[0, S2:, :] = acc[S2 + TN :, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "has_lin", "has_dev", "n_cmp", "fwd_gather_mode",
        "tile_rows", "window_slack", "interpret",
    ),
)
def fused_scatter_backward(
    cstk: jax.Array,        # [N, K*F] stacked receiver coefficients
    nbr_nodes: jax.Array,   # [N, W] FORWARD neighbor table
    in_degree: jax.Array,   # [N]
    v: jax.Array,           # [N, F] saved sender rows (gather source)
    has_lin: bool = True,
    has_dev: bool = False,
    n_cmp: int = 0,
    fwd_gather_mode: str = "split2",
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
):
    """Scatter each receiver slot's contribution to its sender.

    Same cstk column layout as ell_bwd.fused_gather_backward
    (``[c_lin? | c_a, c_a*mean? | (ref_1, coef_1) .. (ref_C, coef_C)]``)
    but over the FORWARD table — callers hand the forward nbr table and
    never build reverse tables.  Returns dv [N, F] f32.
    """
    N = cstk.shape[0]
    K = (1 if has_lin else 0) + 2 * int(has_dev) + 2 * n_cmp
    if K == 0:
        raise ValueError("no terms requested")
    F = cstk.shape[1] // K
    if cstk.shape[1] != K * F:
        raise ValueError(
            f"cstk width {cstk.shape[1]} not divisible into {K} blocks"
        )
    W = nbr_nodes.shape[1]
    TN, SL = tile_rows, window_slack
    if not supports_scatter(N, TN, SL, F, K) and not interpret:
        raise ValueError(
            f"fused_scatter_backward preconditions failed: N={N} TN={TN}"
        )

    TNS, TWS, sws = _schedule(N, TN, SL)
    S2 = 2 * SL
    TWB = TN + 4 * SL
    nt = max(N // TN, 1)
    KT = TN // TNS
    # sub-window offset inside the tile window [i*TN - 2*slack, ... + TWB)
    offs = (
        sws - ((np.arange(len(sws), dtype=np.int32) // KT) * TN - S2)
    ).astype(np.int32)
    assert (offs >= 0).all() and (offs + TWS <= TWB).all()

    ids_col = _stack_ids(nbr_nodes, in_degree, sws, TNS)     # [N*W, 1]
    ids_row = ids_col.reshape(nt, W * TN)
    v_pad = jnp.pad(v.astype(jnp.float32), ((S2, S2), (0, 0)))

    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWB=TWB, F=F, S2=S2,
        has_lin=has_lin, has_dev=has_dev, n_cmp=n_cmp,
        fwd_gather_mode=fwd_gather_mode,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # v_pad
            pl.BlockSpec((TN, K * F), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W * TN, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * TN), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, F), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * S2, F), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * TWB, F), jnp.float32),
            pltpu.VMEM((TWB, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    own, marg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, F), jnp.float32),
            jax.ShapeDtypeStruct((nt, 2 * S2, F), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * W * TWS * F * 2,    # one gather + one scatter
            bytes_accessed=N * (K + 3) * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(offs), v_pad, cstk, ids_col, ids_row)

    # overlap-add the margins: tile i's left margin covers rows
    # [i*TN - 2*slack, i*TN), its right margin [(i+1)*TN, (i+1)*TN + 2s);
    # adjacent tiles' margins are disjoint (TNS >= 2*slack), so both adds
    # are STATIC pad/slice shifts — no scatter.
    zf = jnp.zeros((nt, TN - S2, F), jnp.float32)
    lpad = jnp.concatenate([marg[:, :S2], zf], axis=1).reshape(N, F)
    rpad = jnp.concatenate([zf, marg[:, S2:]], axis=1).reshape(N, F)
    z2 = jnp.zeros((S2, F), jnp.float32)
    return (
        own
        + jnp.concatenate([lpad[S2:], z2], axis=0)
        + jnp.concatenate([z2, rpad[: N - S2]], axis=0)
    )
