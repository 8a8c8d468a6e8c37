"""Fused GINE layer kernel — the edge-featured whole-layer path.

GINE's message is nonlinear per edge, m_ij = relu(x_j + W_e e_ij)
(reference gine_conv, gnn_builder_lib.h:1552-1742; PyG GINEConv), so the
W-independent count-SpMM of ops/pallas/mp_layer.py cannot apply: the
per-slot message table must be realized.  The XLA ELL path materializes
that [N, W, F] table (plus its masked copy) in HBM; this kernel keeps it
in VMEM like the PNA kernel does, with TWO windowed gathers per sub-tile:

    Gv = onehot(node ids)  @ x_window          (node features)
    Ge = onehot(edge ids)  @ pe_window         (pe = edge_attr @ W_e, an
                                                edge-cost matmul done once
                                                in XLA)
    s  = sum_w relu(Gv_w + Ge_w)               (invalid slots gather zero
                                                rows; relu(0) == 0, so
                                                validity costs nothing)
    out = act(MLP((1+eps) x + s) [+ skip])     (GIN epilogue on the MXU)

The NODE window rides the same host-static schedule as the other fused
layers (graphs are batch-contiguous, so rows [a, b) only reference node
ids within +-max_graph_nodes of the tile bounds).  The EDGE window
exploits that ELL edge ids are CSR-sorted by receiver: the edges of rows
[j*TNS, (j+1)*TNS) occupy the contiguous id range [row_offsets[j*TNS],
row_offsets[(j+1)*TNS]), at most W*TNS wide.  Its (data-dependent) window
starts are computed in XLA from row_offsets, 8-aligned down, and passed
as dynamic scalar prefetch — the node schedule stays static.

``window_mode='tile'`` hoists the NODE window DMA to one per grid step
(see pna_layer); the edge window always streams per sub-tile (its width
is already W*TNS — tile-level hoisting would quadruple the VMEM hold for
a second-order DMA saving).
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
    _HI,
    _dot_mm,
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
    "fused_gine_layer",
    "fused_gine_layer_vjp",
    "fused_gine_layer_auto",
    "gine_layer_reference",
    "gine_layer_supported",
]


def gine_layer_supported(
    num_nodes: int,
    num_edges: int,
    ell_width: int,
    tile_rows: int,
    window_slack: int,
    sub_rows: Optional[int] = None,
) -> bool:
    from gnnbuilder_tpu.ops.pallas.pna_layer import _sub_rows

    tns = _sub_rows(tile_rows, window_slack, sub_rows)
    ews = ell_width * tns + 8
    return supports(num_nodes, tile_rows, window_slack, sub_rows) and (
        num_edges >= ews and num_edges % 8 == 0
    )


def _stack_edge_ids(nbr_edges, in_degree, esws, tns: int):
    """[N*W, 1] localized edge-slot ids (traced window starts, unlike the
    node-side _stack_ids whose starts are host-static)."""
    n, w = nbr_edges.shape
    num_sub = n // tns
    col = jnp.repeat(esws.astype(jnp.int32), tns)[:, None]      # [N, 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    valid = slot < in_degree.astype(jnp.int32)[:, None]
    loc = jnp.where(valid, nbr_edges.astype(jnp.int32) - col, -1)
    stack = loc.reshape(num_sub, tns, w).transpose(0, 2, 1)
    return stack.reshape(n * w, 1)


def _kernel(
    sws_ref,     # scalar prefetch: [N/TNS] node window start per sub-tile
    tsw_ref,     # scalar prefetch: [N/TN] node tile window start (tile mode)
    esw_ref,     # scalar prefetch: [N/TNS] edge window start per sub-tile
    x_hbm,       # [N, F] ANY — windowed node reads
    pe_hbm,      # [E, F] ANY — windowed edge reads (pe = edge_attr @ W_e)
    x_ref,       # [TN, F] VMEM — receiver rows
    idn_ref,     # [W*TN, 1] int32 localized node slot ids (-1 = pad)
    ide_ref,     # [W*TN, 1] int32 localized edge slot ids (-1 = pad)
    w0_ref,      # [F, H]
    b0_ref,      # [1, H]
    w1_ref,      # [H, Fout]
    b1_ref,      # [1, Fout]
    *rest,       # ([sw0, sw1] if quant, [skip_ref], out_ref, x_win,
                 #  e_win, s_ref, nsem, esem)
    W: int,
    TNS: int,
    TWS: int,
    TWL: int,
    EWS: int,
    window_mode: str,
    eps: float,
    gather_mode: str,
    mm: str,
    act: Optional[str],
    has_skip: bool,
    quant: bool = False,
):
    if quant:
        sw0_ref, sw1_ref, *rest = rest
    else:
        sw0_ref = sw1_ref = None
    if has_skip:
        skip_ref, *rest = rest
    else:
        skip_ref = None
    out_ref, x_win, e_win, s_ref, nsem, esem = rest

    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = x_ref.shape[0]
    F = x_ref.shape[1]
    KT = TN // TNS
    dot = _dot_mm(mm)
    tile_win = window_mode == "tile"

    def ncopy(j, buf, rows_n, starts_ref):
        start = pl.multiple_of(starts_ref[j], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, rows_n), :], x_win.at[buf], nsem.at[buf]
        )

    def ecopy(j, buf):
        start = pl.multiple_of(esw_ref[j], 8)
        return pltpu.make_async_copy(
            pe_hbm.at[pl.ds(start, EWS), :], e_win.at[buf], esem.at[buf]
        )

    if tile_win:
        @pl.when(i == 0)
        def _():
            ncopy(0, 0, TWL, tsw_ref).start()

        nbuf_t = jax.lax.rem(i, 2)
        ncopy(i, nbuf_t, TWL, tsw_ref).wait()

        @pl.when(i + 1 < nt)
        def _():
            ncopy(i + 1, jax.lax.rem(i + 1, 2), TWL, tsw_ref).start()
    else:
        @pl.when(i == 0)
        def _():
            ncopy(0, 0, TWS, sws_ref).start()

    @pl.when(i == 0)
    def _():
        ecopy(0, 0).start()

    lane_n = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, EWS), 1)
    bdot = lambda m, v: jnp.dot(m, v, preferred_element_type=jnp.float32)

    def gathered(ohb, win):
        """Per-slot gather [W*TNS, F] under the kernel's gather_mode."""
        if gather_mode == "highest":
            return jnp.dot(ohb.astype(jnp.float32), win,
                           preferred_element_type=jnp.float32, precision=_HI)
        oh = ohb.astype(jnp.bfloat16)
        wh = win.astype(jnp.bfloat16)
        if gather_mode == "split2":
            wl = (win - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            return bdot(oh, wh) + bdot(oh, wl)
        if gather_mode == "bf16":
            return bdot(oh, wh)
        raise ValueError(f"unknown gather_mode {gather_mode}")

    def sub_tile(k, carry):
        j = i * KT + k
        ebuf = jax.lax.rem(j, 2)
        ecopy(j, ebuf).wait()

        @pl.when(j + 1 < nt * KT)
        def _():
            ecopy(j + 1, jax.lax.rem(j + 1, 2)).start()

        if tile_win:
            woff = pl.multiple_of(sws_ref[j] - tsw_ref[i], 8)
            vwin = x_win[nbuf_t, pl.ds(woff, TWS), :]
        else:
            nbuf = jax.lax.rem(j, 2)
            ncopy(j, nbuf, TWS, sws_ref).wait()

            @pl.when(j + 1 < nt * KT)
            def _():
                ncopy(j + 1, jax.lax.rem(j + 1, 2), TWS, sws_ref).start()

            vwin = x_win[nbuf]

        idn = idn_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        ide = ide_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        Gv = gathered(idn == lane_n, vwin)               # [W*TNS, F]
        Ge = gathered(ide == lane_e, e_win[ebuf])        # [W*TNS, F]

        # invalid slots: both gathers return zero rows, relu(0) == 0
        M = jax.nn.relu(Gv + Ge)
        acc = jnp.zeros((TNS, F), jnp.float32)
        for w in range(W):
            acc = acc + M[w * TNS : (w + 1) * TNS, :]
        s_ref[pl.ds(pl.multiple_of(k * TNS, 8), TNS), :] = acc
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)

    # GIN epilogue (reference gine_conv apply, gnn_builder_lib.h:1640-1742)
    h = (1.0 + eps) * x_ref[:] + s_ref[:]
    if quant:
        from gnnbuilder_tpu.ops.pallas.mp_layer import _qdot

        a0 = jax.nn.relu(_qdot(h, w0_ref, sw0_ref) + b0_ref[:])
        o = _qdot(a0, w1_ref, sw1_ref) + b1_ref[:]
    else:
        o = dot(jax.nn.relu(dot(h, w0_ref[:]) + b0_ref[:]), w1_ref[:]) \
            + b1_ref[:]
    if has_skip:
        o = o + skip_ref[:]
    out_ref[:] = _ACTS[act](o)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "tile_rows", "window_slack", "interpret", "gather_mode",
        "mm", "act", "sub_rows", "window_mode", "quant",
    ),
)
def fused_gine_layer(
    x,            # [N, F] node features
    pe,           # [E, F] projected edge features (edge_attr @ W_e + b_e)
    nbr_nodes,    # [N, W] int32
    nbr_edges,    # [N, W] int32 (CSR-sorted per receiver)
    row_offsets,  # [N+1] int32 CSR offsets (edge window schedule)
    in_degree,    # [N] int32
    w0, b0, w1, b1,
    eps: float = 0.0,
    skip=None,
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    act: Optional[str] = None,
    sub_rows: Optional[int] = None,
    window_mode: str = "sub",
    quant: bool = False,
):
    N, F = x.shape
    E = pe.shape[0]
    W = nbr_nodes.shape[1]
    TN = tile_rows
    SL = window_slack
    if act not in _ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")

    TNS, TWS, sws = _schedule(N, TN, SL, sub_rows)
    if not gine_layer_supported(N, E, W, TN, SL, sub_rows) and not interpret:
        raise ValueError(f"fused_gine_layer preconditions failed: N={N}")
    window_mode = _norm_window_mode(window_mode, TN, TNS, SL)
    if window_mode == "tile":
        TWL, tsws = _tile_schedule(N, TN, SL)
    else:
        TWL, tsws = TWS, np.zeros(1, np.int32)
    EWS = W * TNS + 8
    if interpret and E < EWS:
        # tiny CPU-test batches: widen pe instead of failing (pad edges
        # gather zeros — inert through relu)
        pe = jnp.pad(pe, ((0, EWS - E), (0, 0)))
        E = EWS

    # edge window starts: data-dependent (row_offsets), 8-aligned down,
    # clamped so [start, start+EWS) stays in bounds; coverage argument in
    # the module docstring
    idx = np.arange(0, N, TNS, dtype=np.int32)
    ro = row_offsets.astype(jnp.int32)[idx]
    esws = jnp.clip((ro // 8) * 8, 0, E - EWS)

    # validity lives entirely in the id stacks (invalid slots -> -1 ->
    # zero gather rows -> relu(0)=0); no degree input needed in-kernel
    idn_stack = _stack_ids(nbr_nodes, in_degree, sws, TNS)
    ide_stack = _stack_edge_ids(nbr_edges, in_degree, esws, TNS)
    Fout = w1.shape[1]
    scales = []
    if quant:
        from gnnbuilder_tpu.ops.quant import quantize_weight

        w0, sw0 = quantize_weight(w0)
        w1, sw1 = quantize_weight(w1)
        scales = [sw0.reshape(1, -1), sw1.reshape(1, -1)]

    has_skip = skip is not None
    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWL=TWL, EWS=EWS,
        window_mode=window_mode, eps=float(eps), gather_mode=gather_mode,
        mm=mm, act=act, has_skip=has_skip, quant=quant,
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x (windowed, manual DMA)
        pl.BlockSpec(memory_space=pl.ANY),   # pe (windowed, manual DMA)
        blk((TN, F)),
        blk((W * TN, 1)),
        blk((W * TN, 1)),
        vmem(), vmem(), vmem(), vmem(),
    ]
    inputs = [
        jnp.asarray(sws), jnp.asarray(tsws), esws,
        x, pe, x, idn_stack, ide_stack,
        w0, b0.reshape(1, -1), w1, b1.reshape(1, -1),
    ] + scales
    in_specs = in_specs + [vmem()] * len(scales)
    if has_skip:
        in_specs.append(blk((TN, Fout)))
        inputs.append(skip)

    scratch = [
        pltpu.VMEM((2, TWL, F), x.dtype),
        pltpu.VMEM((2, EWS, F), pe.dtype),
        pltpu.VMEM((TN, F), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(max(N // TN, 1),),
        in_specs=in_specs,
        out_specs=blk((TN, Fout)),
        scratch_shapes=scratch,
    )
    H = w0.shape[1]
    flops = N * (2 * W * (TWS + EWS) * F + F * H + H * Fout) * 2
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, Fout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (F + Fout) + E * F) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)


def gine_layer_reference(x, pe, nbr_nodes, nbr_edges, in_degree,
                         w0, b0, w1, b1, eps=0.0, skip=None, act=None,
                         quant=False):
    """XLA mirror (same math as nn/conv.GINEConv's ELL path)."""
    from gnnbuilder_tpu.ops import ell

    table = jax.nn.relu(
        ell.ell_gather(x, nbr_nodes)
        + ell.ell_gather(pe, nbr_edges, node_rows=False)
    )
    mask = ell.ell_mask(nbr_nodes, in_degree)
    s = jnp.sum(jnp.where(mask[..., None], table, 0.0), axis=1)
    h = (1.0 + eps) * x + s
    if quant:
        from gnnbuilder_tpu.ops.quant import int8_matmul as _mm8
        o = _mm8(jax.nn.relu(_mm8(h, w0) + b0), w1) + b1
    else:
        o = jax.nn.relu(h @ w0 + b0) @ w1 + b1
    if skip is not None:
        o = o + skip
    return _ACTS[act](o)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(eps, tile_rows, window_slack, interpret, gather_mode,
                 mm, act, has_skip, sub_rows=None, window_mode="sub",
                 quant=False):
    # quant backward = straight-through estimator: the reference bwd below
    # is the f32 epilogue (int8 is a serving precision)
    cfg = dict(tile_rows=tile_rows, window_slack=window_slack,
               interpret=interpret, sub_rows=sub_rows,
               window_mode=window_mode, quant=quant)

    @jax.custom_vjp
    def f(x, pe, nbr, nbre, ro, deg, skip, w0, b0, w1, b1):
        return fused_gine_layer(
            x, pe, nbr, nbre, ro, deg, w0, b0, w1, b1, eps=eps,
            skip=skip if has_skip else None,
            gather_mode=gather_mode, mm=mm, act=act, **cfg,
        )

    def fwd(x, pe, nbr, nbre, ro, deg, skip, *p):
        return (f(x, pe, nbr, nbre, ro, deg, skip, *p),
                (x, pe, nbr, nbre, ro, deg, skip, p))

    def bwd(res, ct):
        # XLA-reference backward (recompute); the per-slot relu mask makes
        # a hand-written reverse-table kernel a separate project — this
        # keeps training correct at fused-forward speeds
        x, pe, nbr, nbre, ro, deg, skip, p = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        _, vjp = jax.vjp(
            lambda xx, pp, sk, *ps: gine_layer_reference(
                xx, pp, nbr, nbre, deg, *ps, eps=eps,
                skip=sk if has_skip else None, act=act,
            ),
            x, pe, skip, *p,
        )
        grads = vjp(ct)
        dskip = grads[2] if has_skip else jnp.zeros_like(skip)
        return (grads[0], grads[1], zero_i(nbr), zero_i(nbre), zero_i(ro),
                zero_i(deg), dskip) + grads[3:]

    f.defvjp(fwd, bwd)
    return f


def fused_gine_layer_vjp(
    x, pe, nbr_nodes, nbr_edges, row_offsets, in_degree, w0, b0, w1, b1,
    eps=0.0, skip=None, tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False,
):
    has_skip = skip is not None
    fn = _make_vjp_fn(float(eps), tile_rows, window_slack, interpret,
                      gather_mode, mm, act, has_skip, sub_rows, window_mode,
                      quant)
    Fout = w1.shape[1]
    skip_in = skip if has_skip else jnp.zeros((x.shape[0], Fout), x.dtype)
    return fn(x, pe, nbr_nodes, nbr_edges,
              row_offsets.astype(jnp.int32),
              in_degree.astype(jnp.int32), skip_in, w0, b0, w1, b1)


def fused_gine_layer_auto(
    x, pe, nbr_nodes, nbr_edges, row_offsets, in_degree, w0, b0, w1, b1,
    eps=0.0, skip=None, tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False,
):
    """fused_gine_layer_vjp with zero-padding of unaligned feature dims to
    MXU lanes (inert: zero lanes gather zero, relu(0)=0, zero weight rows;
    padded output columns sliced off)."""
    N, F = x.shape
    H, Fout = w0.shape[1], w1.shape[1]
    F_p, H_p, Fout_p = _rup(F), _rup(H), _rup(Fout)
    if (F_p, H_p, Fout_p) != (F, H, Fout):
        out = fused_gine_layer_vjp(
            _pad_cols(x, F_p), _pad_cols(pe, F_p), nbr_nodes, nbr_edges,
            row_offsets, in_degree,
            _pad_cols(_pad_rows(w0, F_p), H_p), jnp.pad(b0, (0, H_p - H)),
            _pad_cols(_pad_rows(w1, H_p), Fout_p),
            jnp.pad(b1, (0, Fout_p - Fout)),
            eps=eps,
            skip=_pad_cols(skip, Fout_p) if skip is not None else None,
            tile_rows=tile_rows, window_slack=window_slack,
            interpret=interpret, gather_mode=gather_mode, mm=mm, act=act,
            sub_rows=sub_rows, window_mode=window_mode, quant=quant,
        )
        return out[:, :Fout]
    return fused_gine_layer_vjp(
        x, pe, nbr_nodes, nbr_edges, row_offsets, in_degree,
        w0, b0, w1, b1, eps=eps, skip=skip,
        tile_rows=tile_rows, window_slack=window_slack,
        interpret=interpret, gather_mode=gather_mode, mm=mm, act=act,
        sub_rows=sub_rows, window_mode=window_mode, quant=quant,
    )
