"""Fused readout kernel — global pooling + MLP head + output activation.

After the conv stack, the XLA tail (GlobalPooling segment reductions, the
[G, A*F] concat, and every MLP Linear) round-trips graph-level arrays
through HBM; at canonical batch sizes the tail is ~20-35% of the forward.
This kernel runs the whole readout per GRAPH tile:

    band[g, c] = (lo_g <= c < hi_g)        pooling segments are CONTIGUOUS
                                           node-row ranges (the packer lays
                                           graphs out contiguously), so the
                                           pooling matrix is a BAND built
                                           from two lane compares — no
                                           one-hot stacking, no scatter
    s          = band @ x_window           (add/mean pooling == one banded
                                           count-SpMM; exact hi/lo split)
    pooled     = [s | s/n | mx ...]        aggregator concat in VMEM
    out        = out_act(MLP(pooled))      (whole MLP on the MXU; hidden
                                           activations never hit HBM)

Exact MAX pooling stays in XLA (any MXU one-hot realization of a
per-slot max costs ~a conv layer's FLOPs; XLA's sorted segment_max on the
small [G, F] output is cheaper) and enters the kernel as a regular input,
so the concat and the entire MLP still fuse.

Window schedule: graph tile t's node rows span [goff[t*TG],
goff[(t+1)*TG]) — contiguous and <= TG * maxg wide; window starts are
8-aligned-down clips passed as dynamic scalar prefetch (data-dependent,
like gine_layer's edge windows).  The ghost graph (all pad nodes, span
possibly >> maxg) clamps into the window: its pooled row is finite
garbage, masked downstream like the XLA path's.

Reference counterpart: global_{add,mean,max}_pool + compute_mlp_head
(gnn_builder_lib.h:2705-2803, templates/model.cpp.jinja:411-530), which
likewise stream pooling into the MLP inside one DATAFLOW region.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _ACTS,
    _dot_mm,
    _pad_cols,
    _pad_rows,
    _rup,
)

__all__ = [
    "fused_readout",
    "fused_readout_vjp",
    "fused_readout_auto",
    "readout_reference",
    "readout_supported",
]

_OUT_ACTS = {
    None: lambda x: x,
    "softmax": jax.nn.softmax,
    "log_softmax": jax.nn.log_softmax,
}


def _window_rows(tile_graphs: int, maxg: int, block_size: int = 0) -> int:
    """Static bound on the node-row span of TG consecutive graphs.
    Standard packing: rows are contiguous, span <= TG * maxg.  Block
    packing (core/graph.py block_size=B): pad rows interleave, but each
    block holds >= floor(B / maxg) graphs, so TG graphs span at most
    (ceil(TG / that) + 1) blocks."""
    maxg_p = (maxg + 7) // 8 * 8
    if not block_size:
        return tile_graphs * maxg_p + 8
    gpb = max(block_size // maxg, 1)
    nblocks = -(-tile_graphs // gpb) + 1
    return nblocks * block_size + 8


def readout_supported(num_nodes: int, num_graphs: int, maxg: int,
                      tile_graphs: int, block_size: int = 0) -> bool:
    if maxg <= 0 or num_graphs < 1:
        return False
    if block_size and maxg > block_size:
        return False
    nws = _window_rows(tile_graphs, maxg, block_size)
    return num_nodes >= nws and nws % 8 == 0


def _kernel(
    ws_ref,      # scalar prefetch: [G_pad/TG] window start per graph tile
    x_hbm,       # [N, F] ANY — windowed node reads
    lo_ref,      # [TG, 1] int32 — graph node-row span start (global)
    hi_ref,      # [TG, 1] int32 — span end (global)
    cnt_ref,     # [TG, 1] f32 — node count (mean denominator)
    *rest,       # ([mx_ref], w_0, b_0, ..., w_L, b_L, [sw_0..sw_L if
                 #  quant], out_ref, x_win[2, NWS, F], dma_sem[2])
    NWS: int,
    aggrs: tuple,
    n_lin: int,
    act: Optional[str],
    out_act: Optional[str],
    mm: str,
    quant: bool = False,
):
    if "max" in aggrs:
        mx_ref, *rest = rest
    else:
        mx_ref = None
    wbs, rest = rest[: 2 * n_lin], rest[2 * n_lin :]
    if quant:
        sws, rest = rest[:n_lin], rest[n_lin:]
    out_ref, x_win, dma_sem = rest

    t = pl.program_id(0)
    nt = pl.num_programs(0)
    TG = lo_ref.shape[0]
    dot = _dot_mm(mm)

    def win_copy(j, buf):
        start = pl.multiple_of(ws_ref[j], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, NWS), :], x_win.at[buf], dma_sem.at[buf]
        )

    @pl.when(t == 0)
    def _():
        win_copy(0, 0).start()

    buf = jax.lax.rem(t, 2)
    win_copy(t, buf).wait()

    @pl.when(t + 1 < nt)
    def _():
        win_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    # the banded pooling matrix: two int compares, no ids
    lo = lo_ref[:] - ws_ref[t]                              # [TG, 1]
    hi = jnp.clip(hi_ref[:] - ws_ref[t], 0, NWS)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TG, NWS), 1)
    band = (lane >= lo) & (lane < hi)                       # [TG, NWS]

    win = x_win[buf]                                        # [NWS, F]
    bb = band.astype(jnp.bfloat16)
    wh = win.astype(jnp.bfloat16)
    wl = (win - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    bdot = lambda m, v: jnp.dot(m, v, preferred_element_type=jnp.float32)
    # band entries are exact in bf16; hi+lo rebuilds the exact f32 sums
    s = bdot(bb, wh) + bdot(bb, wl)                         # [TG, F]

    blocks = []
    for a in aggrs:
        if a == "add":
            blocks.append(s)
        elif a == "mean":
            blocks.append(s / jnp.maximum(cnt_ref[:], 1.0))
        else:  # max — computed in XLA, streamed in
            blocks.append(mx_ref[:])
    h = jnp.concatenate(blocks, axis=-1) if len(blocks) > 1 else blocks[0]

    if quant:
        from gnnbuilder_tpu.ops.pallas.mp_layer import _qdot

    for i in range(n_lin):
        if quant:
            h = _qdot(h, wbs[2 * i], sws[i]) + wbs[2 * i + 1][:]
        else:
            h = dot(h, wbs[2 * i][:]) + wbs[2 * i + 1][:]
        if i < n_lin - 1:
            h = _ACTS[act](h)
    out_ref[:] = _OUT_ACTS[out_act](h)


@functools.partial(
    jax.jit,
    static_argnames=(
        "aggrs", "act", "out_act", "tile_graphs", "maxg", "interpret",
        "mm", "quant", "block_size",
    ),
)
def fused_readout(
    x,                    # [N, F] node features (conv-stack output)
    n_node,               # [G] int per-graph node counts (ghost last)
    weights,              # tuple of (w, b) pairs, MLP order
    aggrs: tuple = ("add",),
    mx=None,              # [G, F] XLA segment_max (required iff "max")
    act: Optional[str] = "relu",
    out_act: Optional[str] = None,
    tile_graphs: int = 32,
    maxg: int = 32,
    interpret: bool = False,
    mm: str = "f32",
    quant: bool = False,
    starts=None,          # [G] int32 first row per graph (block packing)
    block_size: int = 0,
):
    N, F = x.shape
    G = n_node.shape[0]
    TG = tile_graphs
    NWS = _window_rows(maxg=maxg, tile_graphs=TG, block_size=block_size)
    if block_size and starts is None:
        raise ValueError("block_size requires starts (graph_starts)")
    if not readout_supported(N, G, maxg, TG, block_size) and not interpret:
        raise ValueError(f"fused_readout preconditions failed: N={N} G={G}")
    if ("max" in aggrs) != (mx is not None):
        raise ValueError("mx must be given exactly when 'max' in aggrs")
    if act not in _ACTS or out_act not in _OUT_ACTS:
        raise ValueError(f"unsupported activation {act!r}/{out_act!r}")
    if interpret and N < NWS:
        x = jnp.pad(x, ((0, NWS - N), (0, 0)))
        N = NWS

    G_pad = ((G + TG - 1) // TG) * TG
    cnt = n_node.astype(jnp.float32)
    if starts is not None:
        lo = starts.astype(jnp.int32)
        hi = lo + n_node.astype(jnp.int32)
    else:
        goff = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(n_node.astype(jnp.int32))]
        )
        lo, hi = goff[:-1], goff[1:]
    if G_pad != G:
        pad = G_pad - G
        lo = jnp.pad(lo, (0, pad))   # empty spans pool zeros
        hi = jnp.pad(hi, (0, pad))
        cnt = jnp.pad(cnt, (0, pad))
        if mx is not None:
            mx = jnp.pad(mx, ((0, pad), (0, 0)))
    # dynamic window starts (8-aligned down, clipped in-bounds): tile t
    # covers graphs [t*TG, (t+1)*TG) whose rows span <= TG*MAXG_P
    ws = jnp.clip((lo[::TG] // 8) * 8, 0, max(N - NWS, 0))

    n_lin = len(weights)
    Fout = weights[-1][0].shape[1]
    scales = []
    if quant:
        from gnnbuilder_tpu.ops.quant import quantize_weight

        qw = []
        for w, bb in weights:
            w, sw = quantize_weight(w)
            qw.append((w, bb))
            scales.append(sw.reshape(1, -1))
        weights = tuple(qw)
    kern = functools.partial(
        _kernel, NWS=NWS, aggrs=tuple(aggrs), n_lin=n_lin, act=act,
        out_act=out_act, mm=mm, quant=quant,
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x (windowed, manual DMA)
        blk((TG, 1)), blk((TG, 1)), blk((TG, 1)),
    ]
    inputs = [
        ws, x,
        lo.reshape(-1, 1), hi.reshape(-1, 1), cnt.reshape(-1, 1),
    ]
    if mx is not None:
        in_specs.append(blk((TG, F)))
        inputs.append(mx)
    for w, b in weights:
        in_specs += [vmem(), vmem()]
        inputs += [w, b.reshape(1, -1)]
    for sw in scales:
        in_specs.append(vmem())
        inputs.append(sw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G_pad // TG,),
        in_specs=in_specs,
        out_specs=blk((TG, Fout)),
        scratch_shapes=[
            pltpu.VMEM((2, NWS, F), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mlp_flops = sum(w.shape[0] * w.shape[1] for w, _ in weights)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G_pad, Fout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=G_pad * (2 * NWS * F + mlp_flops) * 2,
            bytes_accessed=(N * F + G_pad * Fout) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:G]


def readout_reference(x, n_node, weights, aggrs=("add",), mx=None,
                      act="relu", out_act=None, quant=False, starts=None):
    """XLA mirror (the exact math of GlobalPooling + MLP + output act).
    ``starts`` (block packing) replaces the cumsum row spans; rows outside
    every [start, start+n) span (inter-graph padding) fall to the ghost."""
    G = n_node.shape[0]
    rows = jnp.arange(x.shape[0])
    if starts is not None:
        st = starts.astype(jnp.int32)
        idx = jnp.clip(
            jnp.searchsorted(st, rows, side="right") - 1, 0, G - 1
        )
        inside = rows < st[idx] + n_node.astype(jnp.int32)[idx]
        seg = jnp.where(inside, idx, G - 1)
    else:
        goff = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(n_node.astype(jnp.int32))]
        )
        seg = jnp.clip(
            jnp.searchsorted(goff[1:], rows, side="right"), 0, G - 1
        )
    s = jax.ops.segment_sum(x, seg, num_segments=G)
    cnt = n_node.astype(x.dtype)[:, None]
    blocks = []
    for a in aggrs:
        if a == "add":
            blocks.append(s)
        elif a == "mean":
            blocks.append(s / jnp.maximum(cnt, 1.0))
        else:
            blocks.append(mx)
    h = jnp.concatenate(blocks, axis=-1)
    if quant:
        from gnnbuilder_tpu.ops.quant import int8_matmul as _mm8
    else:
        _mm8 = lambda a, w: a @ w
    for i, (w, b) in enumerate(weights):
        h = _mm8(h, w) + b
        if i < len(weights) - 1:
            h = _ACTS[act](h)
    return _OUT_ACTS[out_act](h)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(aggrs, act, out_act, tile_graphs, maxg, interpret, mm,
                 n_lin, has_mx, quant=False, block_size=0):
    # quant backward = straight-through estimator (the f32 reference bwd
    # below); int8 is a serving precision
    @jax.custom_vjp
    def f(x, n_node, starts, mx, flat_w):
        weights = tuple(
            (flat_w[2 * i], flat_w[2 * i + 1]) for i in range(n_lin)
        )
        return fused_readout(
            x, n_node, weights, aggrs=aggrs, mx=mx if has_mx else None,
            act=act, out_act=out_act, tile_graphs=tile_graphs, maxg=maxg,
            interpret=interpret, mm=mm, quant=quant,
            starts=starts if block_size else None, block_size=block_size,
        )

    def fwd(x, n_node, starts, mx, flat_w):
        return f(x, n_node, starts, mx, flat_w), (
            x, n_node, starts, mx, flat_w
        )

    def bwd(res, ct):
        # XLA-reference backward: the readout tail is tiny relative to the
        # conv stack, so recompute costs nothing material
        x, n_node, starts, mx, flat_w = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)

        def ref(xx, mm_, fw):
            weights = tuple(
                (fw[2 * i], fw[2 * i + 1]) for i in range(n_lin)
            )
            return readout_reference(
                xx, n_node, weights, aggrs=aggrs,
                mx=mm_ if has_mx else None, act=act, out_act=out_act,
                starts=starts if block_size else None,
            )

        _, vjp = jax.vjp(ref, x, mx, flat_w)
        dx, dmx, dw = vjp(ct)
        if not has_mx:
            dmx = jnp.zeros_like(mx)
        return (dx, zero_i(n_node), zero_i(starts), dmx, dw)

    f.defvjp(fwd, bwd)
    return f


def fused_readout_vjp(
    x, n_node, weights, aggrs=("add",), mx=None, act="relu",
    out_act=None, tile_graphs=32, maxg=32, interpret=False, mm="f32",
    quant=False, starts=None, block_size=0,
):
    has_mx = mx is not None
    fn = _make_vjp_fn(tuple(aggrs), act, out_act, tile_graphs, maxg,
                      interpret, mm, len(weights), has_mx, quant,
                      block_size)
    flat_w = tuple(a for wb in weights for a in wb)
    mx_in = mx if has_mx else jnp.zeros((n_node.shape[0], x.shape[1]),
                                        jnp.float32)
    starts_in = (starts if starts is not None
                 else jnp.zeros((n_node.shape[0],), jnp.int32))
    return fn(x, n_node.astype(jnp.int32), starts_in.astype(jnp.int32),
              mx_in, flat_w)


def fused_readout_auto(
    x, n_node, weights, aggrs=("add",), mx=None, act="relu",
    out_act=None, tile_graphs=32, maxg=32, interpret=False, mm="f32",
    quant=False, starts=None, block_size=0,
):
    """fused_readout_vjp with zero-padding of an unaligned node-feature dim
    to MXU lanes: zero x lanes pool to zero, so padding each pooled block's
    rows of the FIRST MLP kernel keeps the matmul identical; mx pads along
    (output columns of the MLP are untouched)."""
    N, F = x.shape
    F_p = _rup(F)
    if F_p != F:
        A = len(aggrs)
        w0, b0 = weights[0]
        blocks = [
            _pad_rows(w0[i * F : (i + 1) * F], F_p) for i in range(A)
        ]
        w0p = jnp.concatenate(blocks, axis=0)
        weights = ((w0p, b0),) + tuple(weights[1:])
        x = _pad_cols(x, F_p)
        if mx is not None:
            mx = _pad_cols(mx, F_p)
    return fused_readout_vjp(
        x, n_node, weights, aggrs=aggrs, mx=mx, act=act, out_act=out_act,
        tile_graphs=tile_graphs, maxg=maxg, interpret=interpret, mm=mm,
        quant=quant, starts=starts, block_size=block_size,
    )
