"""Fully-fused PNA layer kernel — "SpMM + MLP in one pass" (the flagship).

One Pallas kernel computes an entire PNA convolution per node tile:

    u = x @ W_i + b_pre                  (pre_nn, receiver half)
    v = x_window @ W_j                   (pre_nn, neighbor half — computed
                                          on the DMA'd window, so v never
                                          exists in HBM)
    G = onehot_stack @ v                 (all ELL slots gathered in ONE MXU
                                          matmul pair; exact hi/lo split)
    sum/sq/max/min over slot blocks of G (VPU, validity via -inf bias;
                                          at molecular widths W<=8 this
                                          beats count-matrix matmuls)
    y  = agg_cat @ Ks                    (all 3 scaler blocks, one matmul)
    out = act((x@K0 + b + y_id + amp*y_amp + att*y_att) @ W_lin + b_lin
              [+ skip])                  (skip-add + activation fused)

HBM traffic per layer = read x (blocks + windows) + weights once + write
out.  The XLA pipeline for the same math moves ~800 MB per batch-1024 QM9
layer (see ops/pallas/ell_agg.py); this kernel moves ~30 MB.

v2 design notes (round 2), from on-chip measurements:
* per-call relay dispatch is ~110 us — all kernel timing below is marginal
  chained time minus that;
* the v1 per-slot one-hot loop (W small matmuls + 4 masked selects per
  slot) was VPU- and scheduling-bound, not FLOP-bound: time was nearly
  independent of window width.  v2 stacks all W one-hots into one
  [W*TNS, TWS] operand (built host/XLA-side as localized ids with invalid
  slots = -1, so the kernel does a single compare against a lane iota) and
  gathers every slot in one matmul pair;
* grid tiles are large (amortize per-tile overhead) while gather windows
  stay narrow via SUB-TILING: each TNS-row sub-tile gathers from its own
  TWS = TNS + 2*slack window slice of the tile's DMA'd window;
* the window DMA is double-buffered across grid steps (tile t+1's window
  streams in during tile t's compute);
* weights ride whole-array VMEM specs (same speed, ~20x faster Mosaic
  compile than per-step blocks);
* epilogue matmuls run one-pass bf16 by default on TPU (mm="bf16" — the
  same contract as XLA's default f32 matmul lowering on TPU); parity tests
  use mm="f32".  The GATHER is always exact (split2 hi/lo or better).

Semantics match PNAConv's XLA path exactly (same empty-row fills, same
std epsilon, scalers identity/amplification/attenuation with delta, PyG
conventions).  Reference equivalent: the whole pna_conv HLS dataflow region
(gnn_builder_lib.h:1750-2157) which likewise never spills messages off-chip.

Constraints (dispatcher falls back to the unfused path otherwise):
in/out feature dims multiples of 128 (MXU lanes), N divisible by tile_rows,
aggregators == (max,min,mean,std), scalers == (identity, amplification,
attenuation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.ell import _STD_EPS  # single source of truth

__all__ = [
    "fused_pna_layer",
    "fused_pna_layer_vjp",
    "fused_pna_layer_auto",
    "pna_layer_supported",
    "pna_layer_reference",
]

_HI = jax.lax.Precision.HIGHEST
_BIG = 3e38  # finite -inf stand-in (-inf arithmetic is UB-adjacent on VPU)

# fusable epilogue activations — the exact functions the model container
# applies (ops/activations.py), so fusing is numerics-neutral
from gnnbuilder_tpu.ops.activations import ACTIVATIONS as _ACT_FNS

_ACTS = {
    None: lambda x: x,
    "relu": _ACT_FNS["relu"],
    "gelu": _ACT_FNS["gelu"],
    "sigmoid": _ACT_FNS["sigmoid"],
    "tanh": _ACT_FNS["tanh"],
}


def _sub_rows(
    tile_rows: int, window_slack: int, sub_rows: Optional[int] = None
) -> int:
    """Gather sub-tile height.  The one-hot gather costs W*(TNS+2*slack)*F
    MACs per node, so narrow sub-tiles cut the realization cost directly;
    128 keeps the stacked one-hot operand [W*128, 128+2*slack] MXU-shaped.
    But each sub-tile issues one window DMA, and on-chip probes show a
    per-DMA latency floor — ``sub_rows`` widens the sub-tile (fewer, larger
    DMAs; slack amortized over more rows) at the cost of a wider gather
    window.  Must be a multiple of 128 dividing tile_rows; invalid values
    fall back to the 128 default.  slack == 0 means "the window is the
    whole tile" (no graph-contiguity assumption), so sub-tiling MUST be
    off; likewise for tiles not divisible by 128."""
    if window_slack == 0 or tile_rows % 128:
        return tile_rows
    if (
        sub_rows is not None
        and sub_rows % 128 == 0
        and tile_rows % sub_rows == 0
    ):
        return sub_rows
    return 128


def supports(
    num_nodes: int,
    tile_rows: int,
    window_slack: int,
    sub_rows: Optional[int] = None,
) -> bool:
    """Static preconditions shared by the fused kernels (also re-exported
    by ell_agg for the multi-aggregate kernel)."""
    tns = _sub_rows(tile_rows, window_slack, sub_rows)
    tws = tns + 2 * window_slack
    return (
        num_nodes % tile_rows == 0
        and num_nodes >= tws
        and tws % 8 == 0
        and tile_rows % 8 == 0
        and window_slack % 8 == 0
    )


def pna_layer_supported(
    num_nodes, f_in, f_out, tile_rows, window_slack, sub_rows=None
):
    return (
        f_in % 128 == 0
        and f_out % 128 == 0
        and supports(num_nodes, tile_rows, window_slack, sub_rows)
    )


def _window_starts(n: int, tile_rows: int, window: int, slack: int) -> np.ndarray:
    t = np.arange(max(n // tile_rows, 1), dtype=np.int32)
    ws = np.clip(t * tile_rows - slack, 0, max(n - window, 0))
    return ws.astype(np.int32)


def _schedule(n: int, tn: int, slack: int, sub_rows: Optional[int] = None):
    """Host-side constants: gather sub-tile height, sub-window width, and
    each sub-tile's (clamped, 8-aligned) window start."""
    tns = _sub_rows(tn, slack, sub_rows)
    tws = tns + 2 * slack
    sws = _window_starts(n, tns, tws, slack)       # [n/tns]
    return tns, tws, sws


def _tile_schedule(n: int, tn: int, slack: int):
    """Tile-level window constants for window_mode='tile': one [TWL, F]
    DMA per grid step covers every sub-tile's gather window inside that
    tile (windows overlap with stride TNS, so the union is just the tile
    rows +- slack).  Each sub-tile's window is then a VMEM slice at offset
    sws[j] - tsws[t] — in [0, TWL - TWS] and 8-aligned by construction."""
    twl = min(tn + 2 * slack, n)
    tsws = _window_starts(n, tn, twl, slack)       # [n/tn]
    return twl, tsws


def _norm_window_mode(window_mode: str, tn: int, tns: int,
                      slack: int) -> str:
    """'tile' only means something when sub-tiling is active (TNS < TN and
    slack > 0); otherwise the per-sub-tile stream IS one DMA per tile."""
    if window_mode not in ("sub", "tile"):
        raise ValueError(f"unknown window_mode {window_mode!r}")
    if tns == tn or slack == 0:
        return "sub"
    return window_mode


def _stack_ids(nbr_nodes, in_degree, sws: np.ndarray, tns: int):
    """[N*W, 1] localized slot ids: row j*(W*TNS) + w*TNS + r holds
    nbr[j*TNS+r, w] - sws[j], or -1 for padding slots (w >= degree).
    Invalid ids never match the kernel's lane iota, so validity costs
    nothing in-kernel.  Pure XLA; CSE dedupes it across layers."""
    n, w = nbr_nodes.shape
    num_sub = n // tns
    sws_col = jnp.asarray(np.repeat(sws, tns), jnp.int32)[:, None]  # [N,1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    valid = slot < in_degree.astype(jnp.int32)[:, None]
    loc = jnp.where(valid, nbr_nodes.astype(jnp.int32) - sws_col, -1)
    stack = loc.reshape(num_sub, tns, w).transpose(0, 2, 1)
    return stack.reshape(n * w, 1)


def _dot_mm(mm: str):
    if mm == "bf16":
        return lambda a, b: jnp.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if mm == "f32":
        return lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=_HI
        )
    raise ValueError(f"unknown mm precision {mm!r}")


def _kernel(
    sws_ref,     # scalar prefetch: [N/TNS] window start per sub-tile
    tsw_ref,     # scalar prefetch: [N/TN] tile window start (tile mode)
    x_hbm,       # [N, Fin] ANY — windowed neighbor reads
    x_ref,       # [TN, Fin] VMEM — receiver rows
    ids_ref,     # [W*TN, 1] int32 localized stacked slot ids (-1 = pad)
    deg_ref,     # [TN, 1] int32
    w_i_ref,     # [Fin, F] pre_nn receiver half (whole-array VMEM)
    w_j_ref,     # [Fin, F] pre_nn neighbor half
    b_pre_ref,   # [1, F]
    k0_ref,      # [Fin, Fout] post_nn self block
    ks_ref,      # [4F, 3*Fout] post_nn scaler blocks (id | amp | att)
    b_post_ref,  # [1, Fout]
    w_lin_ref,   # [Fout, Fout]
    b_lin_ref,   # [1, Fout]
    *rest,       # ([sw_lin] if quant, [skip_ref], out_ref,
                 #  [v_out, agg, aux], x_win[2,TWS,Fin], [agg], dma_sem[2])
    W: int,
    TNS: int,
    TWS: int,
    TWL: int,
    window_mode: str,
    delta: float,
    gather_mode: str,
    mm: str,
    act: Optional[str],
    has_skip: bool,
    save_res: bool,
    quant: bool = False,
):
    # save_res promotes the backward residuals to kernel outputs: the
    # neighbor-half pre_nn rows v (so the backward never re-derives the
    # gather operand — bit-identical compares), the aggregator concat
    # (epilogue recompute), and aux = [mx_raw, mn_raw, mean_raw, ties_mx,
    # ties_mn] (extrema routing with XLA's even tie-splitting).
    if quant:
        sw_lin_ref, *rest = rest
    else:
        sw_lin_ref = None
    if has_skip:
        skip_ref, *rest = rest
    else:
        skip_ref = None
    tile_win = window_mode == "tile"
    if save_res:
        (out_ref, v_out_ref, agg_ref, aux_ref, mid_ref, x_win, v_scr,
         dma_sem) = rest
        vwin_all = v_scr if tile_win else None  # [TWL, F] in tile mode
    else:
        if tile_win:
            out_ref, x_win, agg_ref, vwin_all, dma_sem = rest
        else:
            out_ref, x_win, agg_ref, dma_sem = rest
            vwin_all = None
        v_out_ref = aux_ref = mid_ref = v_scr = None

    i = pl.program_id(0)
    nt = pl.num_programs(0)

    TN = x_ref.shape[0]
    F = w_i_ref.shape[1]
    Fout = k0_ref.shape[1]
    KT = TN // TNS
    dot = _dot_mm(mm)

    def win_copy(j, buf, rows_n, starts_ref):
        start = pl.multiple_of(starts_ref[j], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, rows_n), :], x_win.at[buf],
            dma_sem.at[buf],
        )

    if tile_win:
        # ONE [TWL, Fin] window DMA per grid step (vs KT per-sub-tile DMAs
        # below — the measured per-DMA latency floor is the 34%-roofline
        # culprit), double-buffered across tiles; the neighbor-half pre_nn
        # matmul runs once over the whole tile window and each sub-tile
        # slices its narrow TWS gather window out of VMEM
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWL, tsw_ref).start()

        buf_t = jax.lax.rem(i, 2)
        win_copy(i, buf_t, TWL, tsw_ref).wait()

        @pl.when(i + 1 < nt)
        def _():
            win_copy(i + 1, jax.lax.rem(i + 1, 2), TWL, tsw_ref).start()

        vwin_all[:] = dot(x_win[buf_t], w_j_ref[:])  # [TWL, F] f32
    else:
        # double-buffered sub-window stream over the FLAT sub-tile sequence
        # j = i*KT + k: each sub-tile's compute overlaps the next one's DMA,
        # including across grid-step boundaries (scratch persists)
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWS, sws_ref).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)

    # fori_loop (not Python unroll) over sub-tiles: all effects go through
    # refs with dynamic row offsets, keeping the Mosaic module size — and
    # therefore compile time — independent of KT
    def sub_tile(k, carry):
        j = i * KT + k
        rows = pl.multiple_of(k * TNS, 8)
        if tile_win:
            woff = pl.multiple_of(sws_ref[j] - tsw_ref[i], 8)
            vwin = vwin_all[pl.ds(woff, TWS), :]            # [TWS, F] f32
            if save_res:
                voff = pl.multiple_of(j * TNS - tsw_ref[i], 8)
                v_out_ref[pl.ds(rows, TNS), :] = vwin_all[
                    pl.ds(voff, TNS), :
                ]
        else:
            buf = jax.lax.rem(j, 2)
            win_copy(j, buf, TWS, sws_ref).wait()

            @pl.when(j + 1 < nt * KT)
            def _():
                win_copy(j + 1, jax.lax.rem(j + 1, 2), TWS, sws_ref).start()

            vwin = dot(x_win[buf], w_j_ref[:])  # [TWS, F] f32
            if save_res:
                # this sub-tile's own rows of v (window rows [off,
                # off+TNS)); both j*TNS and the window start are 8-aligned.
                # Mosaic has no dynamic_slice on values, so bounce through
                # a VMEM scratch ref (refs support dynamic pl.ds starts).
                off = pl.multiple_of(
                    j * TNS - pl.multiple_of(sws_ref[j], 8), 8
                )
                v_scr[:] = vwin
                v_out_ref[pl.ds(rows, TNS), :] = v_scr[pl.ds(off, TNS), :]
        x_sub = x_ref[pl.ds(rows, TNS), :]
        u_sub = dot(x_sub, w_i_ref[:]) + b_pre_ref[:]

        # gather operand precision (module docstring): split2 = exact
        # hi+lo reconstruction; bf16 = one pass (the bf16 policy);
        # highest = six-pass exact f32 dots
        ids = ids_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        deg = deg_ref[pl.ds(rows, TNS), :]                      # [TNS, 1]
        ohb = ids == lane                                       # [W*TNS, TWS]
        if gather_mode == "highest":
            G = jnp.dot(
                ohb.astype(jnp.float32), vwin,
                preferred_element_type=jnp.float32, precision=_HI,
            )
        elif gather_mode in ("split2", "bf16"):
            oh = ohb.astype(jnp.bfloat16)
            vh = vwin.astype(jnp.bfloat16)                      # [TWS, F]
            bdot = lambda m, v: jnp.dot(
                m, v, preferred_element_type=jnp.float32
            )
            if gather_mode == "split2":
                # one-hot x bf16 products are exact; hi+lo reconstructs
                # the f32 row, so G is an EXACT gather in 2 passes
                vl = (vwin - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                G = bdot(oh, vh) + bdot(oh, vl)                 # [W*TNS, F]
            else:  # bf16
                G = bdot(oh, vh)
        else:
            raise ValueError(f"unknown gather_mode {gather_mode}")

        # all four aggregations accumulate over the W slot blocks of the
        # exact gathered table G on the VPU (at molecular widths W<=8 this
        # beats count-matrix matmuls); invalid slots (G rows == 0, ids
        # were -1) are pushed out of the extrema with a degree-column bias
        zero = jnp.zeros((TNS, F), jnp.float32)
        s_acc, sq_acc = zero, zero
        mx = jnp.full((TNS, F), -_BIG, jnp.float32)
        mn = jnp.full((TNS, F), _BIG, jnp.float32)
        for w in range(W):
            g = G[w * TNS : (w + 1) * TNS, :]
            s_acc = s_acc + g
            sq_acc = sq_acc + g * g
            bias = jnp.where(w < deg, 0.0, -_BIG)               # [TNS, 1]
            mx = jnp.maximum(mx, g + bias)
            mn = jnp.minimum(mn, g - bias)

        degf = deg.astype(jnp.float32)
        denom = jnp.maximum(degf, 1.0)
        nonempty = deg > 0
        mean_g = s_acc / denom
        var = jnp.maximum(sq_acc / denom - mean_g * mean_g, 0.0)
        # aggregator order fixed: (max, min, mean, std) == PNA_AGGREGATORS
        agg_ref[pl.ds(rows, TNS), 0:F] = jnp.where(
            nonempty, u_sub + mx, 0.0
        )
        agg_ref[pl.ds(rows, TNS), F : 2 * F] = jnp.where(
            nonempty, u_sub + mn, 0.0
        )
        agg_ref[pl.ds(rows, TNS), 2 * F : 3 * F] = jnp.where(
            nonempty, u_sub + mean_g, 0.0
        )
        agg_ref[pl.ds(rows, TNS), 3 * F : 4 * F] = jnp.sqrt(var + _STD_EPS)
        if save_res:
            ties_mx = jnp.zeros((TNS, F), jnp.float32)
            ties_mn = jnp.zeros((TNS, F), jnp.float32)
            for w in range(W):
                g = G[w * TNS : (w + 1) * TNS, :]
                valid = w < deg
                ties_mx = ties_mx + jnp.where(valid & (g == mx), 1.0, 0.0)
                ties_mn = ties_mn + jnp.where(valid & (g == mn), 1.0, 0.0)
            aux_ref[pl.ds(rows, TNS), 0:F] = mx
            aux_ref[pl.ds(rows, TNS), F : 2 * F] = mn
            aux_ref[pl.ds(rows, TNS), 2 * F : 3 * F] = mean_g
            aux_ref[pl.ds(rows, TNS), 3 * F : 4 * F] = ties_mx
            aux_ref[pl.ds(rows, TNS), 4 * F : 5 * F] = ties_mn
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)

    xt = x_ref[:]
    y = dot(agg_ref[:], ks_ref[:])  # [TN, 3*Fout]
    degt = jnp.maximum(deg_ref[:].astype(jnp.float32), 1.0)
    log_deg = jnp.log(degt + 1.0)
    amp = log_deg / delta
    att = delta / log_deg
    mid = (
        dot(xt, k0_ref[:])
        + b_post_ref[:]
        + y[:, :Fout]
        + amp * y[:, Fout : 2 * Fout]
        + att * y[:, 2 * Fout :]
    )
    if save_res:
        # mid (post-scaler pre-w_lin rows) is the backward's linearization
        # point: saving it kills the epilogue y-recompute (agg_cat @ ks,
        # the widest matmul of the backward) entirely
        mid_ref[:] = mid
    if quant:
        # int8 policy: only the final Linear quantizes (PairLinear /
        # BlockScaledLinear are f32 by design, nn/linear.py)
        from gnnbuilder_tpu.ops.pallas.mp_layer import _qdot

        o = _qdot(mid, w_lin_ref, sw_lin_ref) + b_lin_ref[:]
    else:
        o = dot(mid, w_lin_ref[:]) + b_lin_ref[:]
    if has_skip:
        o = o + skip_ref[:]
    out_ref[:] = _ACTS[act](o)


@functools.partial(
    jax.jit,
    static_argnames=(
        "delta", "tile_rows", "window_slack", "interpret", "gather_mode",
        "mm", "act", "save_res", "sub_rows", "window_mode", "quant",
    ),
)
def fused_pna_layer(
    x,            # [N, Fin]
    nbr_nodes,    # [N, W] int32
    in_degree,    # [N] int32
    w_pre,        # [2*Fin, F] PairLinear kernel (receiver rows first)
    b_pre,        # [F]
    k_post,       # [Fin + 12F, Fout] BlockScaledLinear kernel
    b_post,       # [Fout]
    w_lin,        # [Fout, Fout]
    b_lin,        # [Fout]
    delta: float,
    skip=None,    # optional [N, Fout] added before the activation
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    act: Optional[str] = None,
    save_res: bool = False,  # also return (v, agg_cat, aux) bwd residuals
    sub_rows: Optional[int] = None,  # gather sub-tile height (None = 128)
    window_mode: str = "sub",  # "sub" = DMA per sub-tile, "tile" = per tile
    quant: bool = False,       # int8 final Linear (serving precision)
):
    N, Fin = x.shape
    F = w_pre.shape[1]
    Fout = w_lin.shape[1]
    W = nbr_nodes.shape[1]
    TN = tile_rows
    SL = window_slack
    if (
        not pna_layer_supported(N, Fin, Fout, TN, SL, sub_rows)
        and not interpret
    ):
        raise ValueError(f"fused_pna_layer preconditions failed: N={N}")
    if act not in _ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")

    TNS, TWS, sws = _schedule(N, TN, SL, sub_rows)
    window_mode = _norm_window_mode(window_mode, TN, TNS, SL)
    if window_mode == "tile":
        TWL, tsws = _tile_schedule(N, TN, SL)
    else:
        TWL, tsws = TWS, np.zeros(1, np.int32)
    ids_stack = _stack_ids(nbr_nodes, in_degree, sws, TNS)
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)
    scales = []
    if quant:
        from gnnbuilder_tpu.ops.quant import quantize_weight

        w_lin, sw_lin = quantize_weight(w_lin)
        scales = [sw_lin.reshape(1, -1)]
    w_i, w_j = w_pre[:Fin], w_pre[Fin:]
    k0 = k_post[:Fin]
    ks = jnp.concatenate(
        [k_post[Fin + i * 4 * F : Fin + (i + 1) * 4 * F] for i in range(3)],
        axis=1,
    )  # [4F, 3*Fout]

    has_skip = skip is not None
    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWL=TWL, window_mode=window_mode,
        delta=float(delta),
        gather_mode=gather_mode, mm=mm, act=act, has_skip=has_skip,
        save_res=save_res, quant=quant,
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x (windowed, manual DMA)
        blk((TN, Fin)),                      # x (receiver tile)
        blk((W * TN, 1)),                    # stacked localized ids
        blk((TN, 1)),                        # degree
        vmem(), vmem(), vmem(),              # w_i, w_j, b_pre
        vmem(), vmem(), vmem(),              # k0, ks, b_post
        vmem(), vmem(),                      # w_lin, b_lin
    ]
    inputs = [
        jnp.asarray(sws), jnp.asarray(tsws),
        x, x, ids_stack, deg2d,
        w_i, w_j, b_pre.reshape(1, -1),
        k0, ks, b_post.reshape(1, -1),
        w_lin, b_lin.reshape(1, -1),
    ] + scales
    in_specs = in_specs + [vmem()] * len(scales)
    if has_skip:
        in_specs.append(blk((TN, Fout)))
        inputs.append(skip)

    out_specs = blk((TN, Fout))
    out_shape = jax.ShapeDtypeStruct((N, Fout), jnp.float32)
    tile_win = window_mode == "tile"
    scratch = [pltpu.VMEM((2, TWL, Fin), x.dtype)]  # double-buffered window
    if save_res:
        out_specs = [
            out_specs, blk((TN, F)), blk((TN, 4 * F)), blk((TN, 5 * F)),
            blk((TN, Fout)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((N, F), jnp.float32),      # v
            jax.ShapeDtypeStruct((N, 4 * F), jnp.float32),  # agg concat
            jax.ShapeDtypeStruct((N, 5 * F), jnp.float32),  # aux
            jax.ShapeDtypeStruct((N, Fout), jnp.float32),   # mid
        ]
        # tile mode: whole-tile-window v; sub mode: v slice bounce
        scratch.append(pltpu.VMEM((TWL if tile_win else TWS, F),
                                  jnp.float32))
    else:
        scratch.append(pltpu.VMEM((TN, 4 * F), jnp.float32))  # agg concat
        if tile_win:
            scratch.append(pltpu.VMEM((TWL, F), jnp.float32))  # tile-win v
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // TN,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    # useful-work accounting: gather ~ E*F MACs; the one-hot realization
    # costs W*TWS*F per node — report the realization (what the MXU does)
    flops = N * (2 * Fin * F + 3 * W * TWS * F // W + W * TWS * F
                 + 4 * F * 3 * Fout + Fin * Fout + Fout * Fout) * 2
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (2 * Fin + Fout)) * 4,
            transcendentals=N,
        ),
        interpret=interpret,
    )(*inputs)
    return out


# --------------------------------------------------------------------------
# XLA reference (for the custom VJP backward and for tests)
# --------------------------------------------------------------------------


def pna_layer_reference(
    x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    delta, skip=None, act=None,
):
    from gnnbuilder_tpu.ops import ell

    N, Fin = x.shape
    F = w_pre.shape[1]
    Fout = w_lin.shape[1]
    u = x @ w_pre[:Fin] + b_pre
    v = x @ w_pre[Fin:]
    table = u[:, None, :] + ell.ell_gather(v, nbr_nodes)
    mask = ell.ell_mask(nbr_nodes, in_degree)
    d = ell.ell_multi_table(
        table, in_degree, ("max", "min", "mean", "std"), mask
    )
    agg_cat = jnp.concatenate([d[a] for a in ("max", "min", "mean", "std")], -1)
    ks = jnp.concatenate(
        [k_post[Fin + i * 4 * F : Fin + (i + 1) * 4 * F] for i in range(3)],
        axis=1,
    )
    y = agg_cat @ ks
    degf = in_degree.astype(x.dtype)[:, None]
    log_deg = jnp.log(jnp.maximum(degf, 1.0) + 1.0)
    amp = log_deg / delta
    att = delta / log_deg
    mid = (
        x @ k_post[:Fin] + b_post
        + y[:, :Fout] + amp * y[:, Fout : 2 * Fout] + att * y[:, 2 * Fout :]
    )
    out = mid @ w_lin + b_lin
    if skip is not None:
        out = out + skip
    return _ACTS[act](out)


def _pna_epilogue(x, agg_cat, deg, k_post, b_post, w_lin, b_lin, skip,
                  delta, act, has_skip):
    """XLA mirror of the kernel's post-aggregation tail (scaler blocks +
    double matmul + skip + activation), used by the hand-written backward
    to recompute the epilogue from the saved aggregator concat."""
    Fin = x.shape[1]
    F = agg_cat.shape[1] // 4
    Fout = w_lin.shape[1]
    ks = jnp.concatenate(
        [k_post[Fin + i * 4 * F : Fin + (i + 1) * 4 * F] for i in range(3)],
        axis=1,
    )
    y = agg_cat @ ks
    degf = deg.astype(jnp.float32)[:, None]
    log_deg = jnp.log(jnp.maximum(degf, 1.0) + 1.0)
    amp = log_deg / delta
    att = delta / log_deg
    mid = (
        x @ k_post[:Fin] + b_post
        + y[:, :Fout] + amp * y[:, Fout : 2 * Fout] + att * y[:, 2 * Fout :]
    )
    out = mid @ w_lin + b_lin
    if has_skip:
        out = out + skip
    return _ACTS[act](out)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(delta, tile_rows, window_slack, interpret, gather_mode,
                 mm, act, has_skip, has_rev, sub_rows=None,
                 window_mode="sub", quant=False):
    # the backward kernels keep their own (default) sub-tile schedule; the
    # sub_rows/window_mode knobs only shape the forward gather's
    # DMA/compute trade.  quant (int8 final Linear) backward is a
    # straight-through estimator: grads flow through the f32 w_lin.
    cfg = dict(tile_rows=tile_rows, window_slack=window_slack,
               interpret=interpret)
    fcfg = dict(cfg, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant)

    def _scatter_ok(n, f, w):
        from gnnbuilder_tpu.ops.pallas.scatter_bwd import supports_scatter

        # n_terms=10: the raw-mode working set (d_agg 4F + aux 5F + std F)
        return supports_scatter(n, tile_rows, window_slack, f, 10, w)

    @jax.custom_vjp
    def f(x, nbr, deg, rev_nbr, out_deg, skip,
          w_pre, b_pre, k_post, b_post, w_lin, b_lin):
        return fused_pna_layer(
            x, nbr, deg, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
            delta, skip=skip if has_skip else None,
            gather_mode=gather_mode, mm=mm, act=act, **fcfg,
        )

    def fwd(x, nbr, deg, rev_nbr, out_deg, skip, *p):
        # hand-written backward whenever either kernel applies: the
        # forward-table scatter kernel (scatter_bwd.py, no reverse tables
        # needed) or the reverse-table gather kernel (ell_bwd.py)
        if has_rev or _scatter_ok(x.shape[0], p[0].shape[1], nbr.shape[1]):
            out, v, agg_cat, aux, mid = fused_pna_layer(
                x, nbr, deg, *p, delta, skip=skip if has_skip else None,
                gather_mode=gather_mode, mm=mm, act=act, save_res=True,
                **fcfg,
            )
            return out, (x, nbr, deg, rev_nbr, out_deg, skip, p,
                         (v, agg_cat, aux, mid, out))
        return (
            f(x, nbr, deg, rev_nbr, out_deg, skip, *p),
            (x, nbr, deg, rev_nbr, out_deg, skip, p, None),
        )

    def bwd(res, ct):
        x, nbr, deg, rev_nbr, out_deg, skip, p, saved = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if saved is not None:
            from gnnbuilder_tpu.ops.pallas.ell_bwd import (
                fused_gather_backward,
            )
            from gnnbuilder_tpu.ops.pallas.scatter_bwd import (
                fused_pna_scatter_backward,
            )

            w_pre, b_pre, k_post, b_post, w_lin, b_lin = p
            v, agg_cat, aux, mid, out = saved
            Fin = x.shape[1]
            F = w_pre.shape[1]
            Fout = w_lin.shape[1]

            # hand-written epilogue backward from the saved mid (the
            # post-scaler pre-w_lin rows): no y = agg_cat @ ks recompute,
            # and act' comes exactly from the saved post-act out for
            # relu/sigmoid/tanh (gelu recomputes z from mid)
            if act is None:
                dz = ct
            elif act == "relu":
                dz = ct * (out > 0.0).astype(ct.dtype)
            elif act == "sigmoid":
                dz = ct * out * (1.0 - out)
            elif act == "tanh":
                dz = ct * (1.0 - out * out)
            else:
                z = mid @ w_lin + b_lin
                if has_skip:
                    z = z + skip
                _, act_vjp = jax.vjp(_ACTS[act], z)
                (dz,) = act_vjp(ct)
            dskip = dz if has_skip else jnp.zeros_like(skip)
            db_lin = dz.sum(axis=0)
            dw_lin = mid.T @ dz
            d_mid = dz @ w_lin.T
            db_post = d_mid.sum(axis=0)
            k0 = k_post[:Fin]
            ks_t = jnp.concatenate(
                [k_post[Fin + i * 4 * F : Fin + (i + 1) * 4 * F]
                 for i in range(3)],
                axis=1,
            ).T  # [3*Fout, 4F]
            dx_epi = d_mid @ k0.T
            dk0 = x.T @ d_mid

            degf = deg.astype(jnp.float32)[:, None]
            denom = jnp.maximum(degf, 1.0)
            nonempty = degf > 0
            log_deg = jnp.log(denom + 1.0)
            dy = jnp.concatenate(
                [d_mid, (log_deg / delta) * d_mid,
                 (delta / log_deg) * d_mid],
                axis=1,
            )  # [N, 3*Fout] cotangent of y = agg_cat @ ks
            dks = jnp.concatenate(
                [agg_cat.T @ dy[:, :Fout],
                 agg_cat.T @ dy[:, Fout : 2 * Fout],
                 agg_cat.T @ dy[:, 2 * Fout :]],
                axis=1,
            )  # [4F, 3*Fout], ks layout
            dk_post = jnp.concatenate(
                [dk0, dks[:, :Fout], dks[:, Fout : 2 * Fout],
                 dks[:, 2 * Fout :]],
                axis=0,
            )

            # du = masked sum of the mx|mn|mean blocks of
            # d_agg = dy @ ks_t, contracted without materializing d_agg
            sel = (ks_t[:, 0:F] + ks_t[:, F : 2 * F]
                   + ks_t[:, 2 * F : 3 * F])  # [3*Fout, F]
            du = jnp.where(nonempty, dy @ sel, 0.0)

            if _scatter_ok(x.shape[0], F, nbr.shape[1]):
                # forward-table transpose scatter with BOTH the epilogue
                # d_agg production (dy @ ks_t) and the coefficient prep
                # fused into the kernel: d_agg is never materialized in
                # HBM, no coefficient gathers, no reverse tables
                dv = fused_pna_scatter_backward(
                    d_mid, aux, agg_cat, deg, nbr, v=v, ks_t=ks_t,
                    delta=delta, fwd_gather_mode=gather_mode, **cfg,
                )
            else:
                d_agg = dy @ ks_t
                ct_mx = jnp.where(nonempty, d_agg[:, 0:F], 0.0)
                ct_mn = jnp.where(nonempty, d_agg[:, F : 2 * F], 0.0)
                ct_mean = jnp.where(
                    nonempty, d_agg[:, 2 * F : 3 * F], 0.0
                )
                ct_std = d_agg[:, 3 * F : 4 * F]
                mx_raw = aux[:, 0:F]
                mn_raw = aux[:, F : 2 * F]
                mean_raw = aux[:, 2 * F : 3 * F]
                ties_mx = aux[:, 3 * F : 4 * F]
                ties_mn = aux[:, 4 * F : 5 * F]
                std_out = agg_cat[:, 3 * F : 4 * F]
                c_lin = ct_mean / denom
                c_a = ct_std / (denom * std_out)
                c_mx = ct_mx / jnp.maximum(ties_mx, 1.0)
                c_mn = ct_mn / jnp.maximum(ties_mn, 1.0)
                cstk = jnp.concatenate(
                    [c_lin, c_a, c_a * mean_raw, mx_raw, c_mx, mn_raw,
                     c_mn],
                    axis=-1,
                )
                dv = fused_gather_backward(
                    cstk, rev_nbr, out_deg, v=v,
                    has_lin=True, has_dev=True, n_cmp=2,
                    fwd_gather_mode=gather_mode,
                    window_mode=window_mode, **cfg,
                )

            # pre_nn chains: u = x @ w_i + b_pre (receiver), v = x @ w_j
            w_i, w_j = w_pre[:Fin], w_pre[Fin:]
            dx = dx_epi + du @ w_i.T + dv @ w_j.T
            dw_pre = jnp.concatenate([x.T @ du, x.T @ dv], axis=0)
            db_pre = du.sum(axis=0)
            return (dx, zero_i(nbr), zero_i(deg), zero_i(rev_nbr),
                    zero_i(out_deg), dskip,
                    dw_pre, db_pre, dk_post, db_post, dw_lin, db_lin)
        _, vjp = jax.vjp(
            lambda xx, sk, *pp: pna_layer_reference(
                xx, nbr, deg, *pp, delta,
                skip=sk if has_skip else None, act=act,
            ),
            x, skip, *p,
        )
        grads = vjp(ct)
        dskip = grads[1] if has_skip else jnp.zeros_like(skip)
        return (grads[0], zero_i(nbr), zero_i(deg), zero_i(rev_nbr),
                zero_i(out_deg), dskip) + grads[2:]

    f.defvjp(fwd, bwd)
    return f


def fused_pna_layer_vjp(
    x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    delta, skip=None, rev_nbr_nodes=None, out_degree=None,
    tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False,
):
    """Differentiable fused layer.  Pallas forward always; hand-written
    Pallas backward (reverse-table kernel, ops/pallas/ell_bwd.py) when the
    reverse tables are given, else the XLA-reference backward."""
    has_skip = skip is not None
    has_rev = rev_nbr_nodes is not None and out_degree is not None
    fn = _make_vjp_fn(
        float(delta), tile_rows, window_slack, interpret, gather_mode,
        mm, act, has_skip, has_rev, sub_rows, window_mode, quant,
    )
    skip_in = skip if has_skip else jnp.zeros((x.shape[0], w_lin.shape[1]),
                                              x.dtype)
    if not has_rev:
        rev_nbr_nodes = jnp.zeros((1, 1), jnp.int32)
        out_degree = jnp.zeros((1,), jnp.int32)
    return fn(
        x, nbr_nodes, in_degree.astype(jnp.int32),
        rev_nbr_nodes, out_degree.astype(jnp.int32), skip_in,
        w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    )


def _pad_cols(a, to):
    pad = to - a.shape[1]
    if pad <= 0:
        return a
    return jnp.pad(a, ((0, 0), (0, pad)))


def _pad_rows(a, to):
    pad = to - a.shape[0]
    if pad <= 0:
        return a
    return jnp.pad(a, ((0, pad), (0, 0)))


from gnnbuilder_tpu.core.graph import _round_up as _rup_any


def _rup(x, m=128):
    return _rup_any(x, m)


def fused_pna_layer_auto(
    x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    delta, skip=None, rev_nbr_nodes=None, out_degree=None,
    tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False,
):
    """fused_pna_layer_vjp with automatic zero-padding of unaligned feature
    dims to MXU lanes (128).

    Under an active halo scope, runs per shard on the ring-exchanged
    [halo | local | halo] window (parallel/halo.halo_wrap_layer); the
    scatter backward (forward tables only) still applies per shard.

    Zero pad lanes are inert end to end: padded x lanes produce zero v
    lanes; aggregator pad lanes feed zero rows of the (padded) post_nn
    kernel; the padded output columns are sliced off.  This lets the raw
    11-dim molecular input layer and the 64-dim output layer run fused
    instead of falling back to the slow XLA path.  Padding happens outside
    the custom VJP, so gradients slice back automatically.

    NOTE on act fusion with padding: relu/tanh/sigmoid(0) handling — pad
    columns are sliced off before any consumer, so fusing the activation
    remains safe even for sigmoid (pad cols become 0.5, then dropped).
    """
    from gnnbuilder_tpu.parallel.halo import active_halo, halo_wrap_layer

    if active_halo() is not None:
        return halo_wrap_layer(
            lambda xw, nb, dg, sk: fused_pna_layer_auto(
                xw, nb, dg, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
                delta, skip=sk, tile_rows=tile_rows,
                window_slack=window_slack, interpret=interpret,
                gather_mode=gather_mode, mm=mm, act=act,
                sub_rows=sub_rows, window_mode=window_mode, quant=quant,
            ),
            x, nbr_nodes, in_degree, skip=skip,
        )
    N, Fin = x.shape
    F = w_pre.shape[1]          # pre_nn width (== in_channels for PNA)
    Fout = w_lin.shape[1]
    Fin_p, F_p, Fout_p = _rup(Fin), _rup(F), _rup(Fout)

    if (Fin_p, F_p, Fout_p) != (Fin, F, Fout):
        xp = _pad_cols(x, Fin_p)
        # pre kernel: pad each half's rows to Fin_p and cols to F_p
        w_i = _pad_cols(_pad_rows(w_pre[:Fin], Fin_p), F_p)
        w_j = _pad_cols(_pad_rows(w_pre[Fin:], Fin_p), F_p)
        w_pre_p = jnp.concatenate([w_i, w_j], axis=0)
        b_pre_p = jnp.pad(b_pre, (0, F_p - F))
        # post kernel: self block rows Fin->Fin_p; each of the 12 aggregator
        # blocks rows F->F_p; cols Fout->Fout_p
        blocks = [_pad_rows(k_post[:Fin], Fin_p)]
        for i in range(12):
            lo = Fin + i * F
            blocks.append(_pad_rows(k_post[lo : lo + F], F_p))
        k_post_p = _pad_cols(jnp.concatenate(blocks, axis=0), Fout_p)
        b_post_p = jnp.pad(b_post, (0, Fout_p - Fout))
        w_lin_p = _pad_cols(_pad_rows(w_lin, Fout_p), Fout_p)
        b_lin_p = jnp.pad(b_lin, (0, Fout_p - Fout))
        skip_p = _pad_cols(skip, Fout_p) if skip is not None else None
        out = fused_pna_layer_vjp(
            xp, nbr_nodes, in_degree, w_pre_p, b_pre_p, k_post_p, b_post_p,
            w_lin_p, b_lin_p, delta, skip=skip_p,
            rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
            tile_rows=tile_rows,
            window_slack=window_slack, interpret=interpret,
            gather_mode=gather_mode, mm=mm, act=act, sub_rows=sub_rows,
            window_mode=window_mode, quant=quant,
        )
        return out[:, :Fout]

    return fused_pna_layer_vjp(
        x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
        delta, skip=skip,
        rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
        tile_rows=tile_rows, window_slack=window_slack,
        interpret=interpret, gather_mode=gather_mode, mm=mm, act=act,
        sub_rows=sub_rows, window_mode=window_mode, quant=quant,
    )
