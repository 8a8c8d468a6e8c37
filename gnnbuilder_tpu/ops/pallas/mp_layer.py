"""Generic fused message-passing layer for GIN / SAGE / GCN.

The round-1 grid showed non-PNA convs 2-3x behind the fused PNA path:
their aggregation could fuse (ops/pallas/ell_agg.py) but the per-layer
matmuls/epilogues ran as separate XLA ops, each round-tripping [N, F]
through HBM.  This kernel runs the ENTIRE conv layer per node tile:

    A[r, c] = #{slots w < deg[r] : nbr[r, w] == window col c}
    s       = A @ v_window            (sum / mean aggregation == SpMM;
                                       TWO matmuls total via an exact
                                       hi/lo split — W-independent!)
    out     = act(EPILOGUE(s, v_self) [+ skip])

Epilogues (static `conv`):
    gin:   h = (1 + eps) * x + s;  out = relu(h @ W0 + b0) @ W1 + b1
           (reference gin_conv, gnn_builder_lib.h:1389-1549)
    sage:  out = mean @ W_l + b_l + x @ W_r
           (reference sage_conv, gnn_builder_lib.h:2159-2341)
    gcn:   out = dis * (s + p) + bias,  where the caller passes
           p = (x @ W) * dis and dis = rsqrt(deg + 1) is recomputed
           in-kernel from the degree column
           (reference gcn_conv, gnn_builder_lib.h:1213-1387)

Unlike the PNA kernel there is no max/min, so the gathered message table
G never materializes: the count matrix A (built from one lane-iota compare
over the stacked localized ids, validity pre-folded as id = -1) reduces
the whole aggregation to MXU work.  Window streaming, sub-tiling, and
double-buffered DMA are shared with ops/pallas/pna_layer.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _ACTS,
    _dot_mm,
    _HI,
    _norm_window_mode,
    _pad_cols,
    _pad_rows,
    _rup,
    _schedule,
    _stack_ids,
    _tile_schedule,
    supports,
)

__all__ = [
    "fused_mp_layer",
    "fused_mp_layer_vjp",
    "fused_mp_layer_auto",
    "mp_layer_reference",
    "MP_CONVS",
]

MP_CONVS = ("gin", "sage", "gcn", "lg", "simple_sum", "simple_mean")


def _qdot(h, wq_ref, sw_ref):
    """In-kernel mirror of ops/quant.int8_matmul: symmetric per-row dynamic
    activation scales x per-channel weight scales, int8 MXU matmul with
    int32 accumulation — identical formulas, so the fused int8 epilogues
    reproduce the XLA int8 policy's numerics (shared with gine_layer)."""
    sx = jnp.maximum(
        jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    hq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
    y = jnp.dot(hq, wq_ref[:], preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * sw_ref[:]


def _kernel(
    sws_ref,     # scalar prefetch: [N/TNS] window start per sub-tile
    tsw_ref,     # scalar prefetch: [N/TN] tile window start (tile mode)
    x_hbm,       # [N, F] ANY — windowed neighbor reads (v array)
    x_ref,       # [TN, F] VMEM — receiver rows of v
    ids_ref,     # [W*TN, 1] int32 localized stacked slot ids (-1 = pad)
    deg_ref,     # [TN, 1] int32
    w0_ref,      # [F, H]   (gin lin0 / sage W_l)   — zeros(1,1) for gcn
    b0_ref,      # [1, H]   (gin b0  / sage b_l)    — gcn bias
    w1_ref,      # [H, Fout](gin lin1 / sage W_r)   — zeros(1,1) for gcn
    b1_ref,      # [1, Fout](gin b1)                — zeros for sage/gcn
    *rest,       # ([sw0, sw1] if quant, [skip_ref], out_ref, [s_out_ref],
                 #  x_win[2,TWS,F], [s_ref], dma_sem[2])
    conv: str,
    W: int,
    TNS: int,
    TWS: int,
    TWL: int,
    window_mode: str,
    eps: float,
    gather_mode: str,
    mm: str,
    act: Optional[str],
    has_skip: bool,
    save_s: bool,
    quant: bool = False,
):
    # with save_s the aggregated sums become a kernel OUTPUT (the backward
    # residual) instead of scratch; the compute is identical either way
    if quant:
        sw0_ref, sw1_ref, *rest = rest
    else:
        sw0_ref = sw1_ref = None
    if has_skip:
        skip_ref, *rest = rest
    else:
        skip_ref = None
    if save_s:
        out_ref, s_ref, x_win, dma_sem = rest
    else:
        out_ref, x_win, s_ref, dma_sem = rest

    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = x_ref.shape[0]
    F = x_ref.shape[1]
    KT = TN // TNS
    dot = _dot_mm(mm)

    tile_win = window_mode == "tile"

    def win_copy(j, buf, rows_n, starts_ref):
        start = pl.multiple_of(starts_ref[j], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, rows_n), :], x_win.at[buf],
            dma_sem.at[buf],
        )

    if tile_win:
        # ONE [TWL, F] window DMA per grid step (vs KT per-sub-tile DMAs);
        # sub-tiles slice their narrow TWS windows out of VMEM — attacks
        # the per-DMA latency floor without widening the gather
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWL, tsw_ref).start()

        buf_t = jax.lax.rem(i, 2)
        win_copy(i, buf_t, TWL, tsw_ref).wait()

        @pl.when(i + 1 < nt)
        def _():
            win_copy(i + 1, jax.lax.rem(i + 1, 2), TWL, tsw_ref).start()
    else:
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWS, sws_ref).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)

    # fori_loop over sub-tiles (effects through refs) keeps the Mosaic
    # module size — and compile time — independent of KT
    def sub_tile(k, carry):
        j = i * KT + k
        if tile_win:
            woff = pl.multiple_of(sws_ref[j] - tsw_ref[i], 8)
            vwin = x_win[buf_t, pl.ds(woff, TWS), :]  # [TWS, F]
        else:
            buf = jax.lax.rem(j, 2)
            win_copy(j, buf, TWS, sws_ref).wait()

            @pl.when(j + 1 < nt * KT)
            def _():
                win_copy(j + 1, jax.lax.rem(j + 1, 2), TWS, sws_ref).start()

            vwin = x_win[buf]  # [TWS, F]
        ids = ids_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        ohb = ids == lane                                    # [W*TNS, TWS]
        if gather_mode == "highest":
            oh = ohb.astype(jnp.float32)
            a_cnt = sum(
                oh[w * TNS : (w + 1) * TNS] for w in range(W)
            ) if W > 1 else oh[:TNS]                         # [TNS, TWS]
            s = jnp.dot(a_cnt, vwin[:],
                        preferred_element_type=jnp.float32, precision=_HI)
        else:
            oh = ohb.astype(jnp.bfloat16)
            a_cnt = sum(
                oh[w * TNS : (w + 1) * TNS] for w in range(W)
            ) if W > 1 else oh[:TNS]
            vf = vwin[:]
            vh = vf.astype(jnp.bfloat16)
            bdot = lambda m, v: jnp.dot(
                m, v, preferred_element_type=jnp.float32
            )
            if gather_mode == "split2":
                # counts are small ints (exact in bf16); hi+lo rebuilds the
                # exact f32 sum in two passes
                vl = (vf - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                s = bdot(a_cnt, vh) + bdot(a_cnt, vl)
            else:  # bf16
                s = bdot(a_cnt, vh)
        s_ref[pl.ds(pl.multiple_of(k * TNS, 8), TNS), :] = s
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)

    _mp_epilogue(
        conv, s_ref[:], x_ref, deg_ref, w0_ref, b0_ref, w1_ref, b1_ref,
        sw0_ref, sw1_ref, skip_ref, out_ref,
        eps=eps, act=act, has_skip=has_skip, quant=quant, dot=dot,
    )


def _mp_epilogue(
    conv, s_all, x_ref, deg_ref, w0_ref, b0_ref, w1_ref, b1_ref,
    sw0_ref, sw1_ref, skip_ref, out_ref, *, eps, act, has_skip, quant, dot,
):
    """Shared conv epilogue stage (per node tile) — used by both the
    windowed-gather kernel above and the block-matmul kernel
    (block aggregation, ``_block_kernel``)."""
    xt = x_ref[:]
    deg = deg_ref[:]
    degf = deg.astype(jnp.float32)

    qdot = _qdot

    if conv == "gin":
        h = (1.0 + eps) * xt + s_all
        if quant:
            a0 = jax.nn.relu(qdot(h, w0_ref, sw0_ref) + b0_ref[:])
            o = qdot(a0, w1_ref, sw1_ref) + b1_ref[:]
        else:
            o = dot(jax.nn.relu(dot(h, w0_ref[:]) + b0_ref[:]), w1_ref[:]) \
                + b1_ref[:]
    elif conv == "sage":
        mean = s_all / jnp.maximum(degf, 1.0)
        if quant:
            o = (qdot(mean, w0_ref, sw0_ref) + b0_ref[:]
                 + qdot(xt, w1_ref, sw1_ref))
        else:
            o = dot(mean, w0_ref[:]) + b0_ref[:] + dot(xt, w1_ref[:])
    elif conv == "gcn":
        dis = jax.lax.rsqrt(degf + 1.0)
        o = dis * (s_all + xt) + b0_ref[:]
    elif conv == "lg":
        # receiver-side 1/sqrt(d_i); the caller pre-scaled v by 1/sqrt(d_j)
        dis = jnp.where(
            deg > 0, jax.lax.rsqrt(jnp.maximum(degf, 1.0)), 0.0
        )
        o = dis * s_all
    elif conv == "simple_sum":
        o = s_all
    elif conv == "simple_mean":
        o = s_all / jnp.maximum(degf, 1.0)
    else:
        raise ValueError(f"unknown conv {conv}")

    if has_skip:
        o = o + skip_ref[:]
    out_ref[:] = _ACTS[act](o)


def _block_kernel(
    x_ref,       # [TN, F] VMEM — node values (tile == aggregation source:
                 # block packing guarantees neighbors live in-tile)
    adj_ref,     # [KB, BB, BB] VMEM bf16 — dense block adjacency counts
    deg_ref,     # [TN, 1] int32
    w0_ref, b0_ref, w1_ref, b1_ref,
    *rest,       # ([sw0, sw1] if quant), ([skip]), out_ref, s_ref
    conv: str,
    BB: int,
    gather_mode: str,
    mm: str,
    eps: float,
    act: Optional[str],
    has_skip: bool,
    save_s: bool,
    quant: bool = False,
):
    """Block-diagonal fused layer: the aggregation is KB MXU matmuls
    A[k] @ x[k] straight from the shipped adjacency — no ids, no one-hot
    construction, no window DMA, no scalar prefetch.  The epilogue stage
    is shared with the windowed kernel (``_mp_epilogue``)."""
    if quant:
        sw0_ref, sw1_ref, *rest = rest
    else:
        sw0_ref = sw1_ref = None
    if has_skip:
        skip_ref, *rest = rest
    else:
        skip_ref = None
    out_ref, s_ref = rest

    KB = adj_ref.shape[0]
    dot = _dot_mm(mm)

    for k in range(KB):  # static unroll: KB <= 8 by dispatch policy
        a = adj_ref[k]                              # [BB, BB] bf16
        vt = x_ref[pl.ds(pl.multiple_of(k * BB, 8), BB), :]
        if gather_mode == "highest":
            s = jnp.dot(a.astype(jnp.float32), vt,
                        preferred_element_type=jnp.float32, precision=_HI)
        else:
            bdot = lambda m, v: jnp.dot(
                m, v, preferred_element_type=jnp.float32
            )
            vh = vt.astype(jnp.bfloat16)
            if gather_mode == "split2":
                vl = (vt - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                s = bdot(a, vh) + bdot(a, vl)
            else:  # bf16
                s = bdot(a, vh)
        s_ref[pl.ds(pl.multiple_of(k * BB, 8), BB), :] = s

    _mp_epilogue(
        conv, s_ref[:], x_ref, deg_ref, w0_ref, b0_ref, w1_ref, b1_ref,
        sw0_ref, sw1_ref, skip_ref, out_ref,
        eps=eps, act=act, has_skip=has_skip, quant=quant, dot=dot,
    )


def block_tile_rows(N: int, BB: int, cap: int = 1024) -> Optional[int]:
    """Largest node-tile height TN = KB*BB with KB <= cap/BB dividing
    N/BB; None when the batch is not block-divisible."""
    if BB <= 0 or N % BB:
        return None
    T = N // BB
    for kb in range(min(cap // BB, T), 0, -1):
        if T % kb == 0:
            return kb * BB
    return None


@functools.partial(
    jax.jit,
    static_argnames=(
        "conv", "eps", "tile_rows", "window_slack", "interpret",
        "gather_mode", "mm", "act", "save_s", "sub_rows", "window_mode",
        "quant",
    ),
)
def fused_mp_layer(
    v,            # [N, F] node values (x for gin/sage; p = lin(x)*dis for gcn)
    nbr_nodes,    # [N, W] int32
    in_degree,    # [N] int32
    conv: str,
    w0=None, b0=None, w1=None, b1=None,
    eps: float = 0.0,
    skip=None,
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    act: Optional[str] = None,
    save_s: bool = False,   # also return the aggregated sums (bwd residual)
    sub_rows: Optional[int] = None,  # gather sub-tile height (None = 128)
    window_mode: str = "sub",  # "sub" = DMA per sub-tile, "tile" = per tile
    quant: bool = False,    # int8 epilogue matmuls (serving precision)
    block_adj=None,         # [N/BB, BB, BB] dense block adjacency: use the
                            # block-matmul aggregation (no gather at all)
):
    N, F = v.shape
    TN = tile_rows
    SL = window_slack
    if conv not in MP_CONVS:
        raise ValueError(f"conv must be one of {MP_CONVS}")
    if act not in _ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")

    if block_adj is not None:
        BB = block_adj.shape[1]
        if block_adj.shape[0] * BB != N or TN % BB or N % TN:
            raise ValueError(
                f"block preconditions failed: N={N} BB={BB} TN={TN}"
            )
    else:
        W = nbr_nodes.shape[1]
        if not supports(N, TN, SL, sub_rows) and not interpret:
            raise ValueError(f"fused_mp_layer preconditions failed: N={N}")

        TNS, TWS, sws = _schedule(N, TN, SL, sub_rows)
        window_mode = _norm_window_mode(window_mode, TN, TNS, SL)
        if window_mode == "tile":
            TWL, tsws = _tile_schedule(N, TN, SL)
        else:
            TWL, tsws = TWS, np.zeros(1, np.int32)
        ids_stack = _stack_ids(nbr_nodes, in_degree, sws, TNS)
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)

    if quant and conv not in ("gin", "sage"):
        raise ValueError(
            "quant epilogues exist only for convs with in-kernel matmuls "
            "(gin/sage); gcn/lg/simple kernels are numerics-neutral under "
            "int8 — run them unquantized"
        )
    scales = []
    if quant:
        from gnnbuilder_tpu.ops.quant import quantize_weight

        w0, sw0 = quantize_weight(w0)
        w1, sw1 = quantize_weight(w1)
        scales = [sw0.reshape(1, -1), sw1.reshape(1, -1)]

    zero11 = jnp.zeros((1, 1), jnp.float32)
    if conv == "gin":
        H = w0.shape[1]
        Fout = w1.shape[1]
        mats = [w0, b0.reshape(1, -1), w1, b1.reshape(1, -1)]
    elif conv == "sage":
        Fout = w0.shape[1]
        mats = [w0, b0.reshape(1, -1), w1, jnp.zeros((1, Fout), jnp.float32)]
    elif conv == "gcn":  # b0 is the bias; matmuls were done by the caller
        Fout = F
        mats = [zero11, b0.reshape(1, -1), zero11,
                jnp.zeros((1, Fout), jnp.float32)]
    else:  # lg / simple_*: parameter-free epilogues
        Fout = F
        z1f = jnp.zeros((1, Fout), jnp.float32)
        mats = [zero11, z1f, zero11, z1f]

    has_skip = skip is not None

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    if conv == "gin":
        epi = F * w0.shape[1] + w0.shape[1] * Fout
    elif conv == "sage":
        epi = 2 * F * Fout
    else:
        epi = 0

    if block_adj is not None:
        kern = functools.partial(
            _block_kernel, conv=conv, BB=BB, gather_mode=gather_mode,
            mm=mm, eps=float(eps), act=act, has_skip=has_skip,
            save_s=save_s, quant=quant,
        )
        in_specs = [
            blk((TN, F)),
            pl.BlockSpec((TN // BB, BB, BB), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk((TN, 1)),
            vmem(), vmem(), vmem(), vmem(),
        ]
        inputs = [v, block_adj.astype(jnp.bfloat16), deg2d] + mats + scales
        in_specs = in_specs + [vmem()] * len(scales)
        if has_skip:
            in_specs.append(blk((TN, Fout)))
            inputs.append(skip)

        out_specs = blk((TN, Fout))
        out_shape = jax.ShapeDtypeStruct((N, Fout), jnp.float32)
        scratch = []
        if save_s:
            out_specs = [out_specs, blk((TN, F))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((N, F), jnp.float32)]
        else:
            scratch.append(pltpu.VMEM((TN, F), jnp.float32))
        grid_spec = pl.GridSpec(
            grid=(max(N // TN, 1),),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        npass = 2 if gather_mode == "split2" else 1
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=N * (npass * BB * F + epi) * 2,
                bytes_accessed=(N * (F + Fout)) * 4 + N * BB * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*inputs)

    kern = functools.partial(
        _kernel, conv=conv, W=W, TNS=TNS, TWS=TWS, TWL=TWL,
        window_mode=window_mode, eps=float(eps),
        gather_mode=gather_mode, mm=mm, act=act, has_skip=has_skip,
        save_s=save_s, quant=quant,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        blk((TN, F)),
        blk((W * TN, 1)),
        blk((TN, 1)),
        vmem(), vmem(), vmem(), vmem(),
    ]
    inputs = [jnp.asarray(sws), jnp.asarray(tsws), v, v, ids_stack,
              deg2d] + mats + scales
    in_specs = in_specs + [vmem()] * len(scales)
    if has_skip:
        in_specs.append(blk((TN, Fout)))
        inputs.append(skip)

    out_specs = blk((TN, Fout))
    out_shape = jax.ShapeDtypeStruct((N, Fout), jnp.float32)
    scratch = [pltpu.VMEM((2, TWL, F), v.dtype)]
    if save_s:
        out_specs = [out_specs, blk((TN, F))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((N, F), jnp.float32)]
    else:
        scratch.append(pltpu.VMEM((TN, F), jnp.float32))  # aggregated sums
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max(N // TN, 1),),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    flops = N * (2 * TWS * F + epi) * 2
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (F + Fout)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)


# --------------------------------------------------------------------------
# XLA reference (for the custom VJP backward and for tests)
# --------------------------------------------------------------------------


def mp_layer_reference(v, nbr_nodes, in_degree, conv,
                       w0=None, b0=None, w1=None, b1=None, eps=0.0,
                       skip=None, act=None, quant=False):
    from gnnbuilder_tpu.ops import ell

    if quant:
        from gnnbuilder_tpu.ops.quant import int8_matmul as _mm8
    else:
        _mm8 = lambda a, b: a @ b

    s = ell.ell_sum(v, nbr_nodes, in_degree)
    degf = in_degree.astype(v.dtype)[:, None]
    if conv == "gin":
        h = (1.0 + eps) * v + s
        o = _mm8(jax.nn.relu(_mm8(h, w0) + b0), w1) + b1
    elif conv == "sage":
        mean = s / jnp.maximum(degf, 1.0)
        o = _mm8(mean, w0) + b0 + _mm8(v, w1)
    elif conv == "gcn":
        dis = jax.lax.rsqrt(degf + 1.0)
        o = dis * (s + v) + b0
    elif conv == "lg":
        deg2 = in_degree.astype(jnp.int32)[:, None]
        dis = jnp.where(
            deg2 > 0, jax.lax.rsqrt(jnp.maximum(degf, 1.0)), 0.0
        )
        o = dis * s
    elif conv == "simple_sum":
        o = s
    elif conv == "simple_mean":
        o = s / jnp.maximum(degf, 1.0)
    else:
        raise ValueError(conv)
    if skip is not None:
        o = o + skip
    return _ACTS[act](o)


def _epilogue_and_grads(conv, eps, act, has_skip, v, s, deg, skip, p, ct):
    """XLA recompute of the epilogue from the forward-saved aggregate ``s``
    + its VJP: returns (ds [N, F], dv_self, dskip, dparams).  Dense matmuls
    only — exactly the work XLA does well; only the aggregation transpose
    needs the Pallas reverse kernel."""
    w0, b0, w1, b1 = p
    degf = deg.astype(jnp.float32)[:, None]

    def epilogue(vv, ss, sk, w0_, b0_, w1_, b1_):
        if conv == "gin":
            h = (1.0 + eps) * vv + ss
            o = jax.nn.relu(h @ w0_ + b0_) @ w1_ + b1_
        elif conv == "sage":
            mean = ss / jnp.maximum(degf, 1.0)
            o = mean @ w0_ + b0_ + vv @ w1_
        elif conv == "gcn":
            dis = jax.lax.rsqrt(degf + 1.0)
            o = dis * (ss + vv) + b0_
        elif conv == "lg":
            dis = jnp.where(
                degf > 0, jax.lax.rsqrt(jnp.maximum(degf, 1.0)), 0.0
            )
            o = dis * ss
        elif conv == "simple_sum":
            o = ss
        else:  # simple_mean
            o = ss / jnp.maximum(degf, 1.0)
        if has_skip:
            o = o + sk
        return _ACTS[act](o)

    _, vjp = jax.vjp(epilogue, v, s, skip, w0, b0, w1, b1)
    dv_self, ds, dskip, *dp = vjp(ct)
    return ds, dv_self, dskip, tuple(dp)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(conv, eps, tile_rows, window_slack, interpret, gather_mode,
                 mm, act, has_skip, has_rev, sub_rows=None,
                 window_mode="sub", quant=False, has_block=False):
    # quant=True (int8 serving epilogues): the backward is a straight-
    # through estimator — gradients flow through the f32 epilogue (both
    # hand-written and reference backwards below recompute f32), since
    # round() has zero gradient and int8 training is not a target
    # sub_rows/window_mode shape the forward gather only; the backward
    # count-SpMM keeps its own default schedule
    cfg = dict(tile_rows=tile_rows, window_slack=window_slack,
               interpret=interpret)
    fcfg = dict(cfg, sub_rows=sub_rows, window_mode=window_mode)

    @jax.custom_vjp
    def f(v, nbr, deg, rev_nbr, out_deg, badj, skip, w0, b0, w1, b1):
        return fused_mp_layer(
            v, nbr, deg, conv, w0=w0, b0=b0, w1=w1, b1=b1, eps=eps,
            skip=skip if has_skip else None, quant=quant,
            gather_mode=gather_mode, mm=mm, act=act,
            block_adj=badj if has_block else None, **fcfg,
        )

    def fwd(v, nbr, deg, rev_nbr, out_deg, badj, skip, *p):
        if has_rev or has_block:
            # run the kernel with the aggregate as a second output — the
            # backward residual that makes the epilogue grads pure XLA
            out, s = fused_mp_layer(
                v, nbr, deg, conv,
                w0=p[0], b0=p[1], w1=p[2], b1=p[3], eps=eps,
                skip=skip if has_skip else None, quant=quant,
                gather_mode=gather_mode, mm=mm, act=act, save_s=True,
                block_adj=badj if has_block else None, **fcfg,
            )
            return out, (v, nbr, deg, rev_nbr, out_deg, badj, skip, p, s)
        return (
            f(v, nbr, deg, rev_nbr, out_deg, badj, skip, *p),
            (v, nbr, deg, rev_nbr, out_deg, badj, skip, p, None),
        )

    def bwd(res, ct):
        v, nbr, deg, rev_nbr, out_deg, badj, skip, p, s = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        zeros_b = (zero_i(nbr), zero_i(deg), zero_i(rev_nbr),
                   zero_i(out_deg))
        if has_block:
            from gnnbuilder_tpu.ops.block import block_spmm

            ds, dv_self, dskip, dp = _epilogue_and_grads(
                conv, eps, act, has_skip, v, s, deg, skip, p, ct
            )
            # transpose of the block aggregation == the same batched
            # matmul on A^T (ops/block.py) — no reverse tables needed
            bmm = "highest" if gather_mode == "highest" else gather_mode
            dv = dv_self + block_spmm(badj, ds, mm=bmm, transpose=True)
            if not has_skip:
                dskip = jnp.zeros_like(skip)
            return (dv,) + zeros_b + (jnp.zeros_like(badj), dskip) + dp
        if has_rev:
            from gnnbuilder_tpu.ops.pallas.ell_bwd import (
                fused_gather_backward,
            )

            ds, dv_self, dskip, dp = _epilogue_and_grads(
                conv, eps, act, has_skip, v, s, deg, skip, p, ct
            )
            # transpose of the sum aggregation: count-SpMM over the
            # reverse table — a pure linear pass, no compare terms.
            # window_mode follows the forward's schedule (tile default,
            # hardware-verified: fused_parity_tpu_r2 window_tile_backward)
            dv = dv_self + fused_gather_backward(
                ds, rev_nbr, out_deg, has_lin=True,
                window_mode=window_mode, **cfg
            )
            if not has_skip:
                dskip = jnp.zeros_like(skip)
            return (dv,) + zeros_b + (jnp.zeros_like(badj), dskip) + dp
        _, vjp = jax.vjp(
            lambda vv, sk, *pp: mp_layer_reference(
                vv, nbr, deg, conv,
                *pp, eps=eps, skip=sk if has_skip else None, act=act,
            ),
            v, skip, *p,
        )
        grads = vjp(ct)
        dskip = grads[1] if has_skip else jnp.zeros_like(skip)
        return (grads[0],) + zeros_b + (
            jnp.zeros_like(badj), dskip) + grads[2:]

    f.defvjp(fwd, bwd)
    return f


def fused_mp_layer_vjp(
    v, nbr_nodes, in_degree, conv, w0=None, b0=None, w1=None, b1=None,
    eps=0.0, skip=None, rev_nbr_nodes=None, out_degree=None,
    tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False, block_adj=None,
):
    """Differentiable fused layer.  Pallas forward always; backward is the
    block-transpose matmul when ``block_adj`` is given (no reverse tables
    needed), else the hand-written Pallas reverse-table count-SpMM
    (ops/pallas/ell_bwd.py) when the reverse tables are given, else the
    XLA-reference backward."""
    has_skip = skip is not None
    has_block = block_adj is not None
    has_rev = (not has_block and rev_nbr_nodes is not None
               and out_degree is not None)
    fn = _make_vjp_fn(
        conv, float(eps), tile_rows, window_slack, interpret, gather_mode,
        mm, act, has_skip, has_rev, sub_rows, window_mode, quant,
        has_block,
    )
    F = v.shape[1]
    z = jnp.zeros((1, 1), jnp.float32)
    if conv == "gcn":
        Fout = F
        w0_, b0_, w1_, b1_ = z, b0, z, jnp.zeros((Fout,), jnp.float32)
    elif conv in ("lg", "simple_sum", "simple_mean"):
        Fout = F
        zf = jnp.zeros((Fout,), jnp.float32)
        w0_, b0_, w1_, b1_ = z, zf, z, zf
    elif conv == "sage":
        Fout = w0.shape[1]
        w0_, b0_, w1_, b1_ = w0, b0, w1, jnp.zeros((Fout,), jnp.float32)
    else:
        Fout = w1.shape[1]
        w0_, b0_, w1_, b1_ = w0, b0, w1, b1
    skip_in = skip if has_skip else jnp.zeros((v.shape[0], Fout), v.dtype)
    if not has_rev:
        rev_nbr_nodes = jnp.zeros((1, 1), jnp.int32)
        out_degree = jnp.zeros((1,), jnp.int32)
    if nbr_nodes is None:  # block mode needs no neighbor tables
        nbr_nodes = jnp.zeros((1, 1), jnp.int32)
    if not has_block:
        block_adj = jnp.zeros((1, 1, 1), jnp.bfloat16)
    return fn(v, nbr_nodes, in_degree.astype(jnp.int32),
              rev_nbr_nodes, out_degree.astype(jnp.int32), block_adj,
              skip_in, w0_, b0_, w1_, b1_)


def fused_mp_layer_auto(
    v, nbr_nodes, in_degree, conv, w0=None, b0=None, w1=None, b1=None,
    eps=0.0, skip=None, rev_nbr_nodes=None, out_degree=None,
    tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False, block_adj=None,
):
    """fused_mp_layer_vjp with automatic zero-padding of unaligned feature
    dims to MXU lanes (pad lanes are inert: zero x lanes -> zero aggregate
    lanes -> zero weight rows; padded output columns are sliced off).

    Under an active halo scope (shard_map edge partitioning), runs the
    kernel per shard on the ring-exchanged [halo | local | halo] window
    via parallel/halo.halo_wrap_layer (reverse tables are whole-batch
    layouts — the backward falls to the kernel-internal default)."""
    from gnnbuilder_tpu.parallel.halo import active_halo, halo_wrap_layer

    if active_halo() is not None:
        return halo_wrap_layer(
            lambda xw, nb, dg, sk: fused_mp_layer_auto(
                xw, nb, dg, conv, w0=w0, b0=b0, w1=w1, b1=b1, eps=eps,
                skip=sk, tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, gather_mode=gather_mode, mm=mm,
                act=act, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant, block_adj=block_adj,
            ),
            v, nbr_nodes, in_degree, skip=skip,
        )
    N, F = v.shape
    F_p = _rup(F)
    if conv == "gin":
        H, Fout = w0.shape[1], w1.shape[1]
        H_p, Fout_p = _rup(H), _rup(Fout)
        if (F_p, H_p, Fout_p) != (F, H, Fout):
            out = fused_mp_layer_vjp(
                _pad_cols(v, F_p), nbr_nodes, in_degree, conv,
                w0=_pad_cols(_pad_rows(w0, F_p), H_p),
                b0=jnp.pad(b0, (0, H_p - H)),
                w1=_pad_cols(_pad_rows(w1, H_p), Fout_p),
                b1=jnp.pad(b1, (0, Fout_p - Fout)),
                eps=eps,
                skip=_pad_cols(skip, Fout_p) if skip is not None else None,
                rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
                tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, gather_mode=gather_mode, mm=mm,
                act=act, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant, block_adj=block_adj,
            )
            return out[:, :Fout]
    elif conv == "sage":
        Fout = w0.shape[1]
        Fout_p = _rup(Fout)
        if (F_p, Fout_p) != (F, Fout):
            out = fused_mp_layer_vjp(
                _pad_cols(v, F_p), nbr_nodes, in_degree, conv,
                w0=_pad_cols(_pad_rows(w0, F_p), Fout_p),
                b0=jnp.pad(b0, (0, Fout_p - Fout)),
                w1=_pad_cols(_pad_rows(w1, F_p), Fout_p),
                eps=eps,
                skip=_pad_cols(skip, Fout_p) if skip is not None else None,
                rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
                tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, gather_mode=gather_mode, mm=mm,
                act=act, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant, block_adj=block_adj,
            )
            return out[:, :Fout]
    else:  # gcn/lg/simple: v already has the OUTPUT width
        if F_p != F:
            out = fused_mp_layer_vjp(
                _pad_cols(v, F_p), nbr_nodes, in_degree, conv,
                b0=jnp.pad(b0, (0, F_p - F)) if b0 is not None else None,
                eps=eps,
                skip=_pad_cols(skip, F_p) if skip is not None else None,
                rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
                tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, gather_mode=gather_mode, mm=mm,
                act=act, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant, block_adj=block_adj,
            )
            return out[:, :F]
    return fused_mp_layer_vjp(
        v, nbr_nodes, in_degree, conv, w0=w0, b0=b0, w1=w1, b1=b1, eps=eps,
        skip=skip, rev_nbr_nodes=rev_nbr_nodes, out_degree=out_degree,
        tile_rows=tile_rows, window_slack=window_slack,
        interpret=interpret, gather_mode=gather_mode, mm=mm, act=act,
        sub_rows=sub_rows, window_mode=window_mode, quant=quant,
        block_adj=block_adj,
    )
