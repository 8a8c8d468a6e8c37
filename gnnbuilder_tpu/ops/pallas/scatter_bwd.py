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
import os

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

__all__ = [
    "fused_scatter_backward",
    "fused_pna_scatter_backward",
    "supports_scatter",
]

# VMEM working-set budget (16 MB hardware, headroom for Mosaic spills)
_VMEM_BUDGET = 10 * 1024 * 1024

# Measured on v5e (full PNA train step b1024, median-of-5): unrolling the
# sub-tile loop beats lax.fori_loop 6.62 vs 6.82 ms (Mosaic pipelines the
# static schedule better); an explicitly-built row-layout scatter one-hot
# (regular dots after a vector relayout of the ids) was no better than
# dot_general with a transposed lhs, so the tdot form stays.
_UNROLL = os.environ.get("GNNB_SCAT_UNROLL", "1") == "1"


def supports_scatter(
    num_nodes: int,
    tile_rows: int,
    window_slack: int,
    feature_dim: int = 128,
    n_terms: int = 7,
    max_width: int = 8,
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
    f, k, w = feature_dim, n_terms, max_width
    est = 4 * (
        2 * twb * f            # double-buffered v window
        + twb * f              # accumulator
        + 2 * tn * k * f       # pipelined cstk block
        + 2 * tws * f          # S accumulator + scatter temporaries
        + w * tns * tws        # slot-major one-hot (all W slots at once)
        + 3 * w * tns * f      # g + C + one replicated coefficient block
    )
    return est <= _VMEM_BUDGET


def _kernel(
    offs_ref,    # scalar prefetch: [N/TNS] sub-window offset in tile window
    v_hbm,       # [N + 4*slack, F] ANY — zero-padded sender rows
    *rest,       # coefficient inputs, ids input, outputs, scratch (below)
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
    raw_pna: bool,
    delta: float = 1.0,
):
    if raw_pna:
        # PNA raw mode: the epilogue's d_agg production (dy @ ks^T) AND
        # the coefficient prep both run IN VMEM from the saved residuals —
        # no XLA prep pass, and neither the 4F d_agg nor the 7F cstk ever
        # round-trips through HBM
        (dmid_ref,   # [TN, F] cotangent of mid (post-scaler pre-w_lin)
         aux_ref,    # [TN, 5F] fwd-saved mx | mn | mean | ties_mx | ties_mn
         std_ref,    # [TN, F] fwd std output (column block 3 of agg_cat)
         degf_ref,   # [TN, 1] f32 in-degree
         kst_ref,    # [3F, 4F] ks^T (post_nn scaler blocks, whole-array)
         idc_ref, own_ref, marg_ref, v_win, acc, dma_sem) = rest
    else:
        (cstk_ref,   # [TN, K*F] precomputed receiver-row coefficient blocks
         idc_ref,    # [W*TN, 1] int32 sub-window-localized ids (-1 = pad)
         own_ref,    # [TN, F] out — window rows [2*slack, 2*slack + TN)
         marg_ref,   # [1, 4*slack, F] out — left | right margin rows
         v_win,      # scratch [2*TWB, F] double-buffered window
         acc,        # scratch [TWB, F] f32 window accumulator
         dma_sem,    # DMA semaphores (2,)
         ) = rest
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

    # ALL W slots ride one tall one-hot [W*TNS, TWS] (slot-major rows, the
    # _stack_ids layout): one gather matmul and one transposed scatter
    # matmul per sub-tile instead of W small ones — 4x taller MXU operands
    # and 1/W the matmul count.
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)
    bdot = lambda m, x: jnp.dot(m, x, preferred_element_type=jnp.float32)
    # scatter = the TRANSPOSE of the gather one-hot: contract over the
    # slot dim (lhs dim 0) so no [TWS, W*TNS] row-layout one-hot (or a
    # second ids input) is ever materialized
    tdot = lambda m, x, **kw: jax.lax.dot_general(
        m, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **kw,
    )
    need_g = has_dev or n_cmp > 0

    if raw_pna:
        # hi/lo split of ks^T, hoisted out of the sub-tile loop: the
        # 3-pass (hh + hl + lh) split matmul reconstructs the f32 product
        # to ~1e-7 rel — tighter than XLA's default one-pass-bf16 f32
        # matmuls on TPU
        kst = kst_ref[:]
        kth = kst.astype(jnp.bfloat16)
        ktl = (kst - kth.astype(jnp.float32)).astype(jnp.bfloat16)

    def sub_tile(k, carry):
        j = i * KT + k
        off = pl.multiple_of(offs_ref[j], 8)
        rows = pl.multiple_of(k * TNS, 8)
        slot0 = pl.multiple_of(k * W * TNS, 8)

        sub = v_win[pl.ds(buf * TWB + off, TWS), :]          # [TWS, F]
        idc = idc_ref[pl.ds(slot0, W * TNS), :]              # [W*TNS, 1]
        # receiver-row coefficient blocks replicated to slot-major rows
        rep = lambda a: jnp.concatenate([a] * W, axis=0)     # [W*TNS, F]

        # per-receiver constant term (pad slots are killed by the zero
        # one-hot scatter column, so no validity mask is needed on C)
        ca = None
        cmp_terms = []
        if raw_pna:
            # d_agg = dy @ ks^T formed on the MXU from the F-wide d_mid
            # block (the 4F d_agg never exists in HBM), then the same
            # coefficient op order as the XLA prep in pna_layer.bwd
            dm = dmid_ref[pl.ds(rows, TNS), :]
            au = aux_ref[pl.ds(rows, TNS), :]
            so = std_ref[pl.ds(rows, TNS), :]
            dg = degf_ref[pl.ds(rows, TNS), :]
            denom = jnp.maximum(dg, 1.0)
            ne = dg > 0.0
            log_deg = jnp.log(denom + 1.0)
            dy = jnp.concatenate(
                [dm, (log_deg / delta) * dm, (delta / log_deg) * dm],
                axis=1,
            )                                                # [TNS, 3F]
            dyh = dy.astype(jnp.bfloat16)
            dyl = (dy - dyh.astype(jnp.float32)).astype(jnp.bfloat16)
            da = bdot(dyh, kth) + bdot(dyh, ktl) + bdot(dyl, kth)
            ct_mx = jnp.where(ne, da[:, 0:F], 0.0)
            ct_mn = jnp.where(ne, da[:, F : 2 * F], 0.0)
            ct_mean = jnp.where(ne, da[:, 2 * F : 3 * F], 0.0)
            c_lin = ct_mean / denom
            ca = da[:, 3 * F : 4 * F] / (denom * so)
            c0 = c_lin - ca * au[:, 2 * F : 3 * F]           # mean_raw
            cmp_terms = [
                (au[:, 0:F],
                 ct_mx / jnp.maximum(au[:, 3 * F : 4 * F], 1.0)),
                (au[:, F : 2 * F],
                 ct_mn / jnp.maximum(au[:, 4 * F : 5 * F], 1.0)),
            ]
        else:
            cs = cstk_ref[pl.ds(rows, TNS), :]               # [TNS, K*F]
            c0 = None
            if has_lin:
                c0 = cs[:, :LF]
            if has_dev:
                ca = cs[:, LF : LF + F]
                ca_mean = cs[:, LF + F : LF + DF]
                c0 = ca_mean * -1.0 if c0 is None else c0 - ca_mean
            for c in range(n_cmp):
                cmp_terms.append((
                    cs[:, LF + DF + 2 * c * F : LF + DF + (2 * c + 1) * F],
                    cs[:, LF + DF + (2 * c + 1) * F
                        : LF + DF + (2 * c + 2) * F],
                ))

        oh = idc == lane_g                                   # [W*TNS, TWS]
        # re-gather the forward's message values bit-exactly
        # (idempotent split2 reconstruction, module docstring)
        g = None
        if fwd_gather_mode == "highest":
            ohf = oh.astype(jnp.float32)
            if need_g:
                g = jnp.dot(
                    ohf, sub,
                    preferred_element_type=jnp.float32, precision=_HI,
                )
        else:
            ohb = oh.astype(jnp.bfloat16)
            if need_g:
                sub_h = sub.astype(jnp.bfloat16)
                g = bdot(ohb, sub_h)
                if fwd_gather_mode == "split2":
                    sub_l = (sub - sub_h.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    g = g + bdot(ohb, sub_l)

        C = (
            rep(c0) if c0 is not None
            else jnp.zeros((W * TNS, F), jnp.float32)
        )
        if has_dev:
            C = C + rep(ca) * g
        for ref, coef in cmp_terms:
            C = C + jnp.where(g == rep(ref), rep(coef), 0.0)

        # scatter precision is independent of the gather domain: like
        # the gather backward, gradient SUMS stay at split-f32 accuracy
        # even under the bf16 policy (only compares/deviations live in
        # the bf16 message domain)
        if fwd_gather_mode == "highest":
            s_acc = tdot(ohf, C, precision=_HI)
        else:
            ch = C.astype(jnp.bfloat16)
            cl = (C - ch.astype(jnp.float32)).astype(jnp.bfloat16)
            s_acc = tdot(ohb, ch) + tdot(ohb, cl)

        acc[pl.ds(off, TWS), :] = acc[pl.ds(off, TWS), :] + s_acc
        return carry

    if _UNROLL:
        for _k in range(KT):
            sub_tile(_k, 0)
    else:
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
    if not supports_scatter(N, TN, SL, F, K, W) and not interpret:
        raise ValueError(
            f"fused_scatter_backward preconditions failed: N={N} TN={TN}"
        )
    data_specs = [
        pl.BlockSpec((TN, K * F), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    return _launch(
        [cstk], data_specs, nbr_nodes, in_degree, v,
        has_lin=has_lin, has_dev=has_dev, n_cmp=n_cmp,
        fwd_gather_mode=fwd_gather_mode, raw_pna=False,
        N=N, F=F, W=W, TN=TN, SL=SL, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "delta", "fwd_gather_mode", "tile_rows", "window_slack",
        "interpret",
    ),
)
def fused_pna_scatter_backward(
    d_mid: jax.Array,       # [N, F] cotangent of mid (pre-w_lin rows)
    aux: jax.Array,         # [N, 5F] fwd-saved mx | mn | mean | ties
    agg_cat: jax.Array,     # [N, 4F] fwd aggregator concat (std = block 3)
    in_degree: jax.Array,   # [N]
    nbr_nodes: jax.Array,   # [N, W] FORWARD neighbor table
    v: jax.Array,           # [N, F] saved sender rows (gather source)
    ks_t: jax.Array,        # [3F, 4F] post_nn scaler blocks, transposed
    delta: float,
    fwd_gather_mode: str = "split2",
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
):
    """PNA backward with the epilogue d_agg production AND the coefficient
    prep fused into the kernel.

    Functionally identical to computing d_agg = dy @ ks_t in XLA, building
    cstk, and calling fused_scatter_backward(has_lin=True, has_dev=True,
    n_cmp=2) — same op order, so coefficients agree to split-matmul ulps —
    but neither the 4F d_agg nor the 7F cstk is ever materialized: the
    kernel reads the F-wide d_mid block plus the saved residuals (aux, std
    column of agg_cat, degree), forms d_agg on the MXU via a 3-pass hi/lo
    split against ks_t, and the coefficients on the VPU.  Returns dv
    [N, F] f32."""
    N, F = v.shape
    W = nbr_nodes.shape[1]
    TN, SL = tile_rows, window_slack
    if not supports_scatter(N, TN, SL, F, 10, W) and not interpret:
        raise ValueError(
            f"fused_pna_scatter_backward preconditions failed: N={N} TN={TN}"
        )
    degf = in_degree.astype(jnp.float32)[:, None]            # [N, 1]
    data_specs = [
        pl.BlockSpec((TN, F), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),               # d_mid
        pl.BlockSpec((TN, 5 * F), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),               # aux
        pl.BlockSpec((TN, F), lambda i, *_: (i, 3),
                     memory_space=pltpu.VMEM),               # std column
        pl.BlockSpec((TN, 1), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),               # degf
        pl.BlockSpec(memory_space=pltpu.VMEM),               # ks_t (whole)
    ]
    return _launch(
        [d_mid, aux, agg_cat, degf, ks_t.astype(jnp.float32)],
        data_specs, nbr_nodes, in_degree, v,
        has_lin=True, has_dev=True, n_cmp=2,
        fwd_gather_mode=fwd_gather_mode, raw_pna=True, delta=float(delta),
        N=N, F=F, W=W, TN=TN, SL=SL, interpret=interpret,
    )


def _launch(data, data_specs, nbr_nodes, in_degree, v, *,
            has_lin, has_dev, n_cmp, fwd_gather_mode, raw_pna,
            N, F, W, TN, SL, interpret, delta=1.0):
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
    v_pad = jnp.pad(v.astype(jnp.float32), ((S2, S2), (0, 0)))

    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWB=TWB, F=F, S2=S2,
        has_lin=has_lin, has_dev=has_dev, n_cmp=n_cmp,
        fwd_gather_mode=fwd_gather_mode, raw_pna=raw_pna, delta=delta,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # v_pad
            *data_specs,
            pl.BlockSpec((W * TN, 1), lambda i, *_: (i, 0),
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
            bytes_accessed=N * (11 if raw_pna else 14) * F * 4,
            transcendentals=N if raw_pna else 0,
        ),
        interpret=interpret,
    )(jnp.asarray(offs), v_pad, *data, ids_col)

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
