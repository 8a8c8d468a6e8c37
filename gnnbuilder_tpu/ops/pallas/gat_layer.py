"""Fused GAT layer kernel — attention message passing in one pass.

The reference left GAT as ``// TODO: GAT layer`` (gnn_builder_lib.h:2343);
this is not only implemented (nn/conv.py::GATConv, XLA paths) but fused:
one Pallas kernel per layer computes

    h        = x @ W                      (tile + DMA'd window, so the
                                           projected features never hit HBM)
    a_src    = h @ A_src  (block-diag)    (per-head logit halves as MXU
    a_dst    = h @ A_dst   [H*C, H])       matmuls — no 3-D reshapes)
    G        = onehot_stack @ [h || a_src]  (one split2 gather pair for all
                                             slots: values + logit halves)
    logit_w  = leaky_relu(G_as + a_dst)   masked to -BIG on pad slots
    m        = max(max_w logit_w, self_logit)        (two-pass softmax)
    num/den  = sum_w exp(logit_w - m) * [G_h | 1]  + self terms
    out      = act(num / den + bias [+ skip])

PyG GATConv semantics with add_self_loops=True handled analytically (the
self edge is an extra softmax slot, never materialized).  Multi-head
works without 3-D tensors: per-head scalar columns [TN, H] broadcast onto
the [TN, H*C] value lanes through a constant expansion matmul
(E [H, H*C], E[h, h*C:(h+1)*C] = 1) — everything stays 2-D MXU work.

Constraints (dispatcher falls back to XLA otherwise): concat mode,
Fin % 128 == 0 (auto-padding in the _auto wrapper), (H*C) % 128 == 0,
standard window preconditions.  Backward: hand-written forward-table
scatter kernel (ops/pallas/gat_bwd.py) re-deriving alpha from the
forward-saved softmax max/denominator (save_res=True); XLA-recompute
fallback when its geometry doesn't hold.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.core.graph import _round_up
from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _ACTS,
    _BIG,
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

__all__ = ["fused_gat_layer", "fused_gat_layer_vjp", "gat_layer_reference"]


def _expand_np(heads: int, C: int) -> np.ndarray:
    """Constant [H, H*C] head->lanes broadcast-expansion matrix (head-major
    lane layout).  Single source of truth for the forward and the scatter
    backward (gat_bwd.py uses its transpose as the lane->head reduction)."""
    return np.repeat(np.eye(heads, dtype=np.float32), C, axis=1)


def _head_matrices(att_src, att_dst, heads, C):
    """[1, H, C] attention vectors -> block-diagonal [H*C, H] matmul
    operands (column h holds att[h] in rows h*C:(h+1)*C), plus the constant
    [H, H*C] broadcast-expansion matrix.  Traceable (att params carry
    gradients through the block-diag construction)."""
    eye = jnp.eye(heads, dtype=jnp.float32)             # [H, H]

    def blockdiag(att):
        a = att.reshape(heads, C)                       # [H, C]
        # [H, C, H]: slice h has a[h] in column h, zero elsewhere
        return (a[:, :, None] * eye[:, None, :]).reshape(heads * C, heads)

    expand = jnp.asarray(_expand_np(heads, C))          # [H, H*C]
    return blockdiag(att_src), blockdiag(att_dst), expand


def _kernel(
    sws_ref,     # scalar prefetch: [N/TNS] window start per sub-tile
    tsw_ref,     # scalar prefetch: [N/TN] tile window start (tile mode)
    x_hbm,       # [N, Fin] ANY — windowed neighbor reads
    x_ref,       # [TN, Fin] VMEM — receiver rows
    ids_ref,     # [W*TN, 1] int32 localized stacked slot ids (-1 = pad)
    deg_ref,     # [TN, 1] int32
    w_ref,       # [Fin, H*C] projection
    as_ref,      # [H*C, H] block-diag att_src
    ad_ref,      # [H*C, H] block-diag att_dst
    ex_ref,      # [H, H*C] head -> lanes expansion
    b_ref,       # [1, H*C] bias
    *rest,       # ([sw] if quant, [skip_ref], out_ref,
                 #  x_win[2,TWS,Fin], dma_sem[2])
    W: int,
    TNS: int,
    TWS: int,
    TWL: int,
    window_mode: str,
    heads: int,
    neg_slope: float,
    self_loops: bool,
    gather_mode: str,
    mm: str,
    act: Optional[str],
    has_skip: bool,
    save_res: bool,
    quant: bool = False,
    has_edge: bool = False,
):
    # save_res promotes the softmax statistics (per-head max m and
    # denominator den) to kernel outputs — the residuals the hand-written
    # backward (ops/pallas/gat_bwd.py) re-derives alpha from
    if quant:
        sw_ref, *rest = rest
    else:
        sw_ref = None
    if has_edge:
        # per-slot edge-logit table (slot-major stacked like ids) + the
        # analytic self-edge logit term — PyG GATConv edge_dim semantics
        le_ref, ae_self_ref, *rest = rest
    else:
        le_ref = ae_self_ref = None
    if has_skip:
        skip_ref, *rest = rest
    else:
        skip_ref = None
    tile_win = window_mode == "tile"
    if save_res:
        if tile_win:
            out_ref, m_ref, den_ref, x_win, pay_scr, dma_sem = rest
        else:
            out_ref, m_ref, den_ref, x_win, dma_sem = rest
            pay_scr = None
    else:
        if tile_win:
            out_ref, x_win, pay_scr, dma_sem = rest
        else:
            out_ref, x_win, dma_sem = rest
            pay_scr = None
        m_ref = den_ref = None

    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = x_ref.shape[0]
    HC = w_ref.shape[1]
    KT = TN // TNS
    dot = _dot_mm(mm)
    H = heads
    if quant:
        # int8 policy: the projection Linear quantizes (per-row dynamic
        # scales — identical rows get identical scales on both paths)
        from gnnbuilder_tpu.ops.pallas.mp_layer import _qdot

        proj = lambda rows: _qdot(rows, w_ref, sw_ref)
    else:
        proj = lambda rows: dot(rows, w_ref[:])

    def win_copy(j, buf, rows_n, starts_ref):
        start = pl.multiple_of(starts_ref[j], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, rows_n), :], x_win.at[buf],
            dma_sem.at[buf],
        )

    if tile_win:
        # ONE [TWL, Fin] window DMA per grid step; projection and
        # source-logit halves computed once over the whole tile window
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWL, tsw_ref).start()

        buf_t = jax.lax.rem(i, 2)
        win_copy(i, buf_t, TWL, tsw_ref).wait()

        @pl.when(i + 1 < nt)
        def _():
            win_copy(i + 1, jax.lax.rem(i + 1, 2), TWL, tsw_ref).start()

        hwin_all = proj(x_win[buf_t])                    # [TWL, HC]
        aswin_all = jnp.dot(hwin_all, as_ref[:],
                            preferred_element_type=jnp.float32)  # [TWL, H]
        pay_scr[:, :HC] = hwin_all
        pay_scr[:, HC:] = aswin_all
    else:
        @pl.when(i == 0)
        def _():
            win_copy(0, 0, TWS, sws_ref).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)

    def lrelu(z):
        return jnp.where(z >= 0, z, neg_slope * z)

    def sub_tile(k, carry):
        j = i * KT + k
        rows = pl.multiple_of(k * TNS, 8)
        if tile_win:
            woff = pl.multiple_of(sws_ref[j] - tsw_ref[i], 8)
            payload = pay_scr[pl.ds(woff, TWS), :]          # [TWS, HC+H]
        else:
            buf = jax.lax.rem(j, 2)
            win_copy(j, buf, TWS, sws_ref).wait()

            @pl.when(j + 1 < nt * KT)
            def _():
                win_copy(j + 1, jax.lax.rem(j + 1, 2), TWS, sws_ref).start()

            hwin = proj(x_win[buf])                      # [TWS, HC]
            # per-head source-logit halves: exact HIGHEST (the att
            # reduction is the numerically touchy part of GAT)
            aswin = jnp.dot(hwin, as_ref[:],
                            preferred_element_type=jnp.float32)  # [TWS, H]
            # one stacked gather for values + logit halves
            payload = jnp.concatenate([hwin, aswin], axis=-1)  # [TWS,HC+H]
        x_sub = x_ref[pl.ds(rows, TNS), :]
        h_sub = proj(x_sub)                              # [TNS, HC]
        ad_sub = jnp.dot(h_sub, ad_ref[:],
                         preferred_element_type=jnp.float32)  # [TNS, H]
        ids = ids_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        ohb = ids == lane
        if gather_mode == "highest":
            G = jnp.dot(
                ohb.astype(jnp.float32), payload,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            oh = ohb.astype(jnp.bfloat16)
            ph = payload.astype(jnp.bfloat16)
            plo = (payload - ph.astype(jnp.float32)).astype(jnp.bfloat16)
            bdot = lambda m_, v_: jnp.dot(
                m_, v_, preferred_element_type=jnp.float32
            )
            G = bdot(oh, ph) + bdot(oh, plo)             # [W*TNS, HC+H]

        deg = deg_ref[pl.ds(rows, TNS), :]               # [TNS, 1]

        # pass 1: per-head max logit (softmax stability)
        def slot_logit(w):
            g_as = G[w * TNS : (w + 1) * TNS, HC:]       # [TNS, H]
            z = g_as + ad_sub
            if has_edge:
                z = z + le_ref[
                    pl.ds(pl.multiple_of(k * W * TNS + w * TNS, 8), TNS), :
                ]
            return lrelu(z)

        m = jnp.full((TNS, H), -_BIG, jnp.float32)
        for w in range(W):
            logit = jnp.where(w < deg, slot_logit(w), -_BIG)
            m = jnp.maximum(m, logit)
        if self_loops:
            z_s = jnp.dot(h_sub, as_ref[:],
                          preferred_element_type=jnp.float32) + ad_sub
            if has_edge:
                z_s = z_s + ae_self_ref[pl.ds(rows, TNS), :]
            self_logit = lrelu(z_s)                      # [TNS, H]
            m = jnp.maximum(m, self_logit)
        m = jnp.maximum(m, -_BIG * 0.5)  # empty rows: keep exp finite

        # pass 2: exp-weighted accumulation
        den = jnp.zeros((TNS, H), jnp.float32)
        num = jnp.zeros((TNS, HC), jnp.float32)
        for w in range(W):
            blk = G[w * TNS : (w + 1) * TNS, :]
            g_h = blk[:, :HC]
            logit = slot_logit(w)
            e = jnp.where(w < deg, jnp.exp(logit - m), 0.0)  # [TNS, H]
            den = den + e
            # broadcast per-head e onto the H*C value lanes (2-D matmul
            # against the constant expansion — no 3-D reshapes in Mosaic)
            e_l = jnp.dot(e, ex_ref[:],
                          preferred_element_type=jnp.float32)  # [TNS, HC]
            num = num + e_l * g_h
        if self_loops:
            e_s = jnp.exp(self_logit - m)
            den = den + e_s
            num = num + jnp.dot(
                e_s, ex_ref[:], preferred_element_type=jnp.float32
            ) * h_sub

        den_l = jnp.dot(jnp.maximum(den, 1e-16), ex_ref[:],
                        preferred_element_type=jnp.float32)
        o = num / den_l + b_ref[:]
        if has_skip:
            o = o + skip_ref[pl.ds(rows, TNS), :]
        out_ref[pl.ds(rows, TNS), :] = _ACTS[act](o)
        if save_res:
            m_ref[pl.ds(rows, TNS), :] = m       # post-clamp (what e used)
            den_ref[pl.ds(rows, TNS), :] = den   # pre-1e-16-clamp
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "neg_slope", "self_loops", "tile_rows", "window_slack",
        "interpret", "gather_mode", "mm", "act", "save_res", "sub_rows",
        "window_mode", "quant",
    ),
)
def fused_gat_layer(
    x,            # [N, Fin]
    nbr_nodes,    # [N, W] int32
    in_degree,    # [N] int32
    w,            # [Fin, H*C]
    att_src,      # [1, H, C]
    att_dst,      # [1, H, C]
    bias,         # [H*C]
    heads: int,
    neg_slope: float = 0.2,
    self_loops: bool = True,
    skip=None,
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    act: Optional[str] = None,
    save_res: bool = False,  # also return (m, den) softmax residuals
    sub_rows: Optional[int] = None,  # gather sub-tile height (None = 128)
    window_mode: str = "sub",  # "sub" = DMA per sub-tile, "tile" = per tile
    quant: bool = False,       # int8 projection (serving precision)
    edge_logits=None,          # [N, W, H] per-slot raw edge-logit terms
    self_edge_logit=None,      # [N, H] self-edge term (fill_value='mean')
):
    N, Fin = x.shape
    HC = w.shape[1]
    C = HC // heads
    W = nbr_nodes.shape[1]
    TN = tile_rows
    SL = window_slack
    if not supports(N, TN, SL, sub_rows) and not interpret:
        raise ValueError(f"fused_gat_layer preconditions failed: N={N}")
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

        w, sw = quantize_weight(w)
        scales = [sw.reshape(1, -1)]
    a_s, a_d, expand = _head_matrices(att_src, att_dst, heads, C)

    has_skip = skip is not None
    has_edge = edge_logits is not None
    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWL=TWL, window_mode=window_mode,
        heads=heads,
        neg_slope=float(neg_slope), self_loops=self_loops,
        gather_mode=gather_mode, mm=mm, act=act, has_skip=has_skip,
        save_res=save_res, quant=quant, has_edge=has_edge,
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        blk((TN, Fin)),
        blk((W * TN, 1)),
        blk((TN, 1)),
        vmem(), vmem(), vmem(), vmem(), vmem(),
    ]
    inputs = [
        jnp.asarray(sws), jnp.asarray(tsws), x, x, ids_stack, deg2d,
        w, a_s, a_d, expand, bias.reshape(1, -1),
    ] + scales
    in_specs = in_specs + [vmem()] * len(scales)
    if has_edge:
        # slot-major stacked layout (same permutation as _stack_ids):
        # row j*(W*TNS) + w*TNS + r holds edge_logits[j*TNS + r, w, :]
        num_sub = N // TNS
        le_stack = (
            edge_logits.astype(jnp.float32)
            .reshape(num_sub, TNS, W, heads)
            .transpose(0, 2, 1, 3)
            .reshape(N * W, heads)
        )
        in_specs.append(blk((W * TN, heads)))
        inputs.append(le_stack)
        in_specs.append(blk((TN, heads)))
        inputs.append(
            (self_edge_logit if self_edge_logit is not None
             else jnp.zeros((N, heads), jnp.float32)).astype(jnp.float32)
        )
    if has_skip:
        in_specs.append(blk((TN, HC)))
        inputs.append(skip)

    out_specs = blk((TN, HC))
    out_shape = jax.ShapeDtypeStruct((N, HC), jnp.float32)
    if save_res:
        out_specs = [out_specs, blk((TN, heads)), blk((TN, heads))]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((N, heads), jnp.float32),  # m
            jax.ShapeDtypeStruct((N, heads), jnp.float32),  # den
        ]
    scratch = [pltpu.VMEM((2, TWL, Fin), x.dtype)]
    if window_mode == "tile":
        # tile-window payload (projected values + source-logit halves)
        scratch.append(pltpu.VMEM((TWL, HC + heads), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max(N // TN, 1),),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    flops = N * (2 * Fin * HC + 2 * W * TWS * (HC + heads)) * 2
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (Fin + HC)) * 4,
            transcendentals=2 * N * W * heads,
        ),
        interpret=interpret,
    )(*inputs)


# --------------------------------------------------------------------------
# XLA reference (for the custom VJP backward and for tests)
# --------------------------------------------------------------------------


def gat_layer_reference(x, nbr_nodes, in_degree, w, att_src, att_dst, bias,
                        heads, neg_slope=0.2, self_loops=True, skip=None,
                        act=None, edge_logits=None, self_edge_logit=None):
    from gnnbuilder_tpu.ops import ell

    N = x.shape[0]
    C = w.shape[1] // heads
    h = (x @ w).reshape(N, heads, C)
    a_src = jnp.sum(h * att_src, axis=-1)
    a_dst = jnp.sum(h * att_dst, axis=-1)
    raw = ell.ell_gather(a_src, nbr_nodes) + a_dst[:, None, :]
    if edge_logits is not None:
        raw = raw + edge_logits
    lt = jax.nn.leaky_relu(raw, neg_slope)
    vt = ell.ell_gather(h, nbr_nodes)
    mask = ell.ell_mask(nbr_nodes, in_degree)
    if self_loops:
        raw_s = a_src + a_dst
        if self_edge_logit is not None:
            raw_s = raw_s + self_edge_logit
        self_logit = jax.nn.leaky_relu(raw_s, neg_slope)
        out = ell.ell_softmax_sum(lt, vt, mask, self_logit, h)
    else:
        out = ell.ell_softmax_sum(lt, vt, mask)
    out = out.reshape(N, heads * C) + bias
    if skip is not None:
        out = out + skip
    return _ACTS[act](out)


@functools.lru_cache(maxsize=None)
def _make_edge_vjp_fn(heads, neg_slope, self_loops, tile_rows,
                      window_slack, interpret, gather_mode, mm, act,
                      has_skip, sub_rows=None, window_mode="sub"):
    """Edge-featured attention (PyG GATConv edge_dim): fused Pallas
    forward with the per-slot edge-logit table; XLA-reference backward
    (gradients flow to the edge-logit inputs, and through them to
    lin_edge/att_edge at the conv level)."""
    fcfg = dict(tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, sub_rows=sub_rows,
                window_mode=window_mode)

    @jax.custom_vjp
    def f(x, nbr, deg, skip, le, ae_self, w, att_src, att_dst, bias):
        return fused_gat_layer(
            x, nbr, deg, w, att_src, att_dst, bias, heads,
            neg_slope=neg_slope, self_loops=self_loops,
            skip=skip if has_skip else None,
            gather_mode=gather_mode, mm=mm, act=act,
            edge_logits=le, self_edge_logit=ae_self, **fcfg,
        )

    def fwd(x, nbr, deg, skip, le, ae_self, *p):
        return f(x, nbr, deg, skip, le, ae_self, *p), (
            x, nbr, deg, skip, le, ae_self, p
        )

    def bwd(res, ct):
        x, nbr, deg, skip, le, ae_self, p = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        _, vjp = jax.vjp(
            lambda xx, sk, ll, aa, *pp: gat_layer_reference(
                xx, nbr, deg, *pp, heads, neg_slope=neg_slope,
                self_loops=self_loops, skip=sk if has_skip else None,
                act=act, edge_logits=ll, self_edge_logit=aa,
            ),
            x, skip, le, ae_self, *p,
        )
        grads = vjp(ct)
        dskip = grads[1] if has_skip else jnp.zeros_like(skip)
        return (grads[0], zero_i(nbr), zero_i(deg), dskip,
                grads[2], grads[3]) + grads[4:]

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(heads, neg_slope, self_loops, tile_rows, window_slack,
                 interpret, gather_mode, mm, act, has_skip, sub_rows=None,
                 window_mode="sub", quant=False):
    # sub_rows/window_mode shape the forward gather only; the scatter
    # backward keeps its own default schedule.  quant backward = straight-
    # through estimator (f32 projection gradients).
    cfg = dict(tile_rows=tile_rows, window_slack=window_slack,
               interpret=interpret)
    fcfg = dict(cfg, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant)

    def _scatter_ok(n, hc, w):
        # hand-written backward (ops/pallas/gat_bwd.py): self-loop mode
        # (PyG default), activations whose derivative comes from the saved
        # post-act output, and the scatter kernel's static geometry gated
        # with the batch's REAL ELL width (same as pna_layer's gate) —
        # otherwise the save_res path commits to a backward whose own
        # precondition check would raise instead of falling back
        from gnnbuilder_tpu.ops.pallas.gat_bwd import supports_gat_scatter

        return (
            self_loops
            and act in (None, "relu", "sigmoid", "tanh")
            and supports_gat_scatter(n, tile_rows, window_slack, hc, heads, w)
        )

    @jax.custom_vjp
    def f(x, nbr, deg, skip, w, att_src, att_dst, bias):
        return fused_gat_layer(
            x, nbr, deg, w, att_src, att_dst, bias, heads,
            neg_slope=neg_slope, self_loops=self_loops,
            skip=skip if has_skip else None,
            gather_mode=gather_mode, mm=mm, act=act, **fcfg,
        )

    def fwd(x, nbr, deg, skip, *p):
        # quant: the scatter backward re-derives alpha from f32-recomputed
        # projections, which would mismatch int8-forward residuals — use
        # the XLA STE fallback instead
        if not quant and _scatter_ok(x.shape[0], p[0].shape[1],
                                     nbr.shape[1]):
            # the scatter backward recomputes its own softmax stats (m,
            # den) — forward-saved stats would mix with the backward's
            # XLA-recomputed logits and break the gradient identity at
            # exp(bf16-logit-drift) scale (gat_bwd.py module docstring);
            # only the post-activation output is saved (for act')
            out = f(x, nbr, deg, skip, *p)
            return out, (x, nbr, deg, skip, p, (out,))
        return f(x, nbr, deg, skip, *p), (x, nbr, deg, skip, p, None)

    def bwd(res, ct):
        x, nbr, deg, skip, p, saved = res
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if saved is not None:
            from gnnbuilder_tpu.ops.pallas.gat_bwd import (
                fused_gat_scatter_backward,
            )

            w, att_src, att_dst, bias = p
            (out,) = saved
            HC = w.shape[1]
            C = HC // heads

            # activation derivative from the saved post-act output
            if act is None:
                dz = ct
            elif act == "relu":
                dz = ct * (out > 0.0).astype(ct.dtype)
            elif act == "sigmoid":
                dz = ct * out * (1.0 - out)
            else:  # tanh
                dz = ct * (1.0 - out * out)

            # dense recompute (smooth math — float-level agreement with
            # the forward's in-kernel h/a_src suffices; no exactness
            # contract like PNA's extrema routing)
            h = jnp.dot(x, w, preferred_element_type=jnp.float32)
            a_s, a_d, expand = _head_matrices(att_src, att_dst, heads, C)
            a_src = jnp.dot(h, a_s, preferred_element_type=jnp.float32)
            a_dst = jnp.dot(h, a_d, preferred_element_type=jnp.float32)

            dv_val, da_src_nbr, dsum, s, m, den = fused_gat_scatter_backward(
                dz, h, a_src, a_dst, nbr, deg, heads,
                neg_slope=neg_slope, self_loops=True, **cfg,
            )

            # receiver-local self-slot terms
            den_c = jnp.maximum(den, 1e-16)
            pre_s = a_src + a_dst
            lr_s = jnp.where(pre_s >= 0, pre_s, neg_slope * pre_s)
            alpha_s = jnp.exp(lr_s - m) / den_c                 # [N, H]
            dalpha_s = (dz * h) @ expand.T                      # [N, H]
            dpre_s = (
                alpha_s * (dalpha_s - s)
                * jnp.where(pre_s >= 0, 1.0, neg_slope)
            )
            da_src = da_src_nbr + dpre_s
            da_dst = dsum + dpre_s

            dh = (
                dv_val
                + (alpha_s @ expand) * dz       # self value term
                + da_src @ a_s.T                # a_src = h @ a_s
                + da_dst @ a_d.T                # a_dst = h @ a_d
            )
            dw = x.T @ dh
            dx = dh @ w.T
            datt_src = ((da_src @ expand) * h).sum(0).reshape(1, heads, C)
            datt_dst = ((da_dst @ expand) * h).sum(0).reshape(1, heads, C)
            dbias = dz.sum(axis=0)
            dskip = dz if has_skip else jnp.zeros_like(skip)
            return (dx, zero_i(nbr), zero_i(deg), dskip,
                    dw, datt_src, datt_dst, dbias)
        _, vjp = jax.vjp(
            lambda xx, sk, *pp: gat_layer_reference(
                xx, nbr, deg, *pp, heads, neg_slope=neg_slope,
                self_loops=self_loops, skip=sk if has_skip else None,
                act=act,
            ),
            x, skip, *p,
        )
        grads = vjp(ct)
        dskip = grads[1] if has_skip else jnp.zeros_like(skip)
        return (grads[0], zero_i(nbr), zero_i(deg), dskip) + grads[2:]

    f.defvjp(fwd, bwd)
    return f


def fused_gat_layer_vjp(
    x, nbr_nodes, in_degree, w, att_src, att_dst, bias, heads,
    neg_slope=0.2, self_loops=True, skip=None,
    tile_rows=512, window_slack=64, interpret=False,
    gather_mode="split2", mm="f32", act=None, sub_rows=None,
    window_mode="sub", quant=False, edge_logits=None,
    self_edge_logit=None,
):
    """Differentiable fused GAT layer (Pallas fwd, XLA-reference bwd).

    Auto-pads an unaligned INPUT dim to MXU lanes (zero x lanes feed zero
    W rows — inert); the per-head width H*C must already be 128-aligned
    (the dispatcher checks).  Under an active halo scope, runs per shard
    on the ring-exchanged window (parallel/halo.halo_wrap_layer)."""
    from gnnbuilder_tpu.parallel.halo import active_halo, halo_wrap_layer

    if active_halo() is not None:
        return halo_wrap_layer(
            lambda xw, nb, dg, sk: fused_gat_layer_vjp(
                xw, nb, dg, w, att_src, att_dst, bias, heads,
                neg_slope=neg_slope, self_loops=self_loops, skip=sk,
                tile_rows=tile_rows, window_slack=window_slack,
                interpret=interpret, gather_mode=gather_mode, mm=mm,
                act=act, sub_rows=sub_rows, window_mode=window_mode,
                quant=quant, edge_logits=edge_logits,
                self_edge_logit=self_edge_logit,
            ),
            x, nbr_nodes, in_degree, skip=skip,
        )
    N, Fin = x.shape
    Fin_p = _rup(Fin)
    if Fin_p != Fin:
        x = _pad_cols(x, Fin_p)
        w = _pad_rows(w, Fin_p)

    # per-head width padding: C -> C_p with H*C_p a lane multiple.  Zero
    # att lanes leave every logit unchanged; zero value lanes gather and
    # accumulate zeros, so the padded output columns are exactly zero
    # (+bias pad, which is zero) and slicing them off is inert — the same
    # argument as the feature padding, applied per head block.  Padding
    # sits OUTSIDE the custom VJP, so gradients slice back automatically.
    import math

    HC = w.shape[1]
    C = HC // heads
    C_p = _round_up(C, 128 // math.gcd(heads, 128))
    if C_p != C:
        def pad_heads(a, row_like=False):
            # [*, H*C] -> [*, H*C_p], zero-filling each head block
            lead = a.shape[:-1]
            a3 = a.reshape(*lead, heads, C)
            a3 = jnp.pad(
                a3, [(0, 0)] * (a3.ndim - 1) + [(0, C_p - C)]
            )
            return a3.reshape(*lead, heads * C_p)

        w = pad_heads(w)
        att_src = jnp.pad(att_src, ((0, 0), (0, 0), (0, C_p - C)))
        att_dst = jnp.pad(att_dst, ((0, 0), (0, 0), (0, C_p - C)))
        bias = pad_heads(bias)
        skip_p = pad_heads(skip) if skip is not None else None
        out = fused_gat_layer_vjp(
            x, nbr_nodes, in_degree, w, att_src, att_dst, bias, heads,
            neg_slope=neg_slope, self_loops=self_loops, skip=skip_p,
            tile_rows=tile_rows, window_slack=window_slack,
            interpret=interpret, gather_mode=gather_mode, mm=mm, act=act,
            sub_rows=sub_rows, window_mode=window_mode, quant=quant,
            edge_logits=edge_logits, self_edge_logit=self_edge_logit,
        )
        return out.reshape(N, heads, C_p)[:, :, :C].reshape(N, HC)

    has_skip = skip is not None
    skip_in = skip if has_skip else jnp.zeros((N, w.shape[1]), x.dtype)
    if edge_logits is not None:
        fn = _make_edge_vjp_fn(
            heads, float(neg_slope), self_loops, tile_rows, window_slack,
            interpret, gather_mode, mm, act, has_skip, sub_rows,
            window_mode,
        )
        ae = (self_edge_logit if self_edge_logit is not None
              else jnp.zeros((N, heads), jnp.float32))
        return fn(x, nbr_nodes, in_degree.astype(jnp.int32), skip_in,
                  edge_logits, ae, w, att_src, att_dst, bias)
    fn = _make_vjp_fn(
        heads, float(neg_slope), self_loops, tile_rows, window_slack,
        interpret, gather_mode, mm, act, has_skip, sub_rows, window_mode,
        quant,
    )
    return fn(x, nbr_nodes, in_degree.astype(jnp.int32), skip_in,
              w, att_src, att_dst, bias)
