"""Fused block-dense GAT attention kernel — softmax in VMEM.

Round-3 implemented GAT as dense masked attention per 128-row block
(ops/block.block_gat_attention) but the XLA formulation materializes the
[T, H, B, B] logit/weight tensors in HBM — it LOST its A/B against the
fused windowed kernel 0.83x (results_tpu/gat_block_ab.json; VERDICT r3
weak #5).  This kernel keeps the whole attention block resident in VMEM:

    h        = x @ W                       (projection in-kernel; h never
                                            exists in HBM)
    per 128-block k, per head hh:
      raw    = leaky_relu(adst_i + asrc_j)   [B, B] broadcast add (VPU)
      m      = max(max_j masked raw, self_logit)      (two-pass softmax)
      wgt    = A ⊙ exp(raw - m)             (A = edge counts: multiplicity
                                             contributes k identical terms)
      out_hh = (wgt @ h_blk + e_self * h_i) / (Σ wgt + e_self)
    out      = act(out + bias [+ skip])

The rank-1 logit terms ship PRECOMPUTED from XLA without touching h:
asrc = x @ (W @ Asrc) and adst = x @ (W @ Adst) are [N, H] node arrays
(two tiny [Fin, H] matmuls), and asrc additionally ships TRANSPOSED
[H, N] so the kernel's row-broadcast is a 128-aligned lane slice instead
of an in-kernel transpose.

PyG GATConv semantics exactly (concat mode, add_self_loops analytic, the
same -BIG masking and max-subtraction as ops/block.block_gat_attention —
pinned by tests/test_gat_block_kernel.py).  Reference: GAT is the conv
the reference left as ``// TODO`` (gnn_builder_lib.h:2343).

Backward: XLA recompute over block_gat_attention (this kernel serves the
inference path; training keeps the windowed fused kernel + its
hand-written scatter backward, ops/pallas/gat_bwd.py).
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
    _BIG,
    _dot_mm,
    _pad_cols,
    _pad_rows,
    _rup,
)

__all__ = [
    "fused_gat_block_layer",
    "gat_block_layer_auto",
    "gat_block_supported",
]


def gat_block_supported(num_nodes, block_size, tile_rows, f_in, hc):
    return (
        block_size % 128 == 0
        and f_in % 128 == 0
        and hc % 128 == 0
        and tile_rows % block_size == 0
        and num_nodes % tile_rows == 0
    )


def _kernel(
    x_ref,       # [TN, Fin] VMEM
    adj_ref,     # [KB, BB, BB] VMEM bf16 edge counts (j -> i at [k, i, j])
    asrcT_ref,   # [H, TN] f32 — transposed source logit terms
    adst_ref,    # [TN, H] f32
    selfl_ref,   # [TN, H] f32 — leaky(asrc + adst [+ eself]) self logits
    elog_ref,    # [KB, H, BB, BB] f32 per-pair edge logit terms (added
                 # PRE-leaky, PyG edge_dim semantics; exact for simple
                 # graphs — multigraph_static gates dispatch); dummy
                 # [1, 1, 8, BB] when has_edge=False
    w_ref,       # [Fin, H*C]
    bias_ref,    # [1, H*C] (concat) / [1, C] (mean)
    *rest,       # ([skip_ref],) out_ref, h_scr, o_scr
    H: int,
    C: int,
    BB: int,
    neg_slope: float,
    self_loops: bool,
    mm: str,
    act: Optional[str],
    has_skip: bool,
    has_edge: bool,
    concat: bool,
):
    if has_skip:
        skip_ref, out_ref, h_scr, o_scr = rest
    else:
        skip_ref = None
        out_ref, h_scr, o_scr = rest

    TN = x_ref.shape[0]
    KB = TN // BB
    dot = _dot_mm(mm)

    h_scr[:] = dot(x_ref[:], w_ref[:])                 # [TN, H*C]

    def blk(k, carry):
        rows = pl.multiple_of(k * BB, 8)
        # the LANE-dim dynamic slice below needs a 128-multiple proof
        # (Mosaic vector.load alignment); BB % 128 == 0 by the dispatch
        # gate, so k*BB genuinely is one
        rows_l = pl.multiple_of(k * BB, 128)
        a = adj_ref[k].astype(jnp.float32)             # [BB, BB]
        mask = a > 0.0
        for hh in range(H):                            # static head loop
            adst_col = adst_ref[pl.ds(rows, BB), hh : hh + 1]  # [BB, 1]
            asrc_row = asrcT_ref[hh : hh + 1, pl.ds(rows_l, BB)]  # [1, BB]
            z = adst_col + asrc_row                    # [BB, BB]
            if has_edge:
                z = z + elog_ref[k, hh]
            raw = jnp.where(z >= 0.0, z, neg_slope * z)
            masked = jnp.where(mask, raw, -_BIG)
            m = jnp.max(masked, axis=1, keepdims=True)  # [BB, 1]
            if self_loops:
                sl = selfl_ref[pl.ds(rows, BB), hh : hh + 1]    # [BB, 1]
                m = jnp.maximum(m, sl)
            wgt = jnp.where(mask, a * jnp.exp(raw - m), 0.0)
            den = jnp.sum(wgt, axis=1, keepdims=True)   # [BB, 1]
            hblk = h_scr[pl.ds(rows, BB), hh * C : (hh + 1) * C]
            num = dot(wgt, hblk)                        # [BB, C]
            if self_loops:
                es = jnp.exp(sl - m)                    # [BB, 1]
                den = den + es
                num = num + es * hblk
            res = num / jnp.maximum(den, 1e-16)
            if concat:
                o_scr[pl.ds(rows, BB), hh * C : (hh + 1) * C] = res
            elif hh == 0:
                o_scr[pl.ds(rows, BB), 0:C] = res
            else:
                o_scr[pl.ds(rows, BB), 0:C] = (
                    o_scr[pl.ds(rows, BB), 0:C] + res
                )
        return carry

    jax.lax.fori_loop(0, KB, blk, 0)

    o = o_scr[:] + bias_ref[:] if concat else (
        o_scr[:] * (1.0 / H) + bias_ref[:]
    )
    if has_skip:
        o = o + skip_ref[:]
    out_ref[:] = _ACTS[act](o)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "neg_slope", "self_loops", "act", "block_size",
        "tile_rows", "interpret", "mm", "concat",
    ),
)
def fused_gat_block_layer(
    x,            # [N, Fin]
    block_adj,    # [N/BB, BB, BB] edge counts
    w,            # [Fin, H*C] projection
    att_src,      # [1, H, C]
    att_dst,      # [1, H, C]
    bias,         # [H*C] (concat) / [C] (mean)
    heads: int,
    neg_slope: float = 0.2,
    self_loops: bool = True,
    skip=None,
    act: Optional[str] = None,
    block_size: int = 128,
    tile_rows: int = 1024,
    interpret: bool = False,
    mm: str = "f32",
    concat: bool = True,
    edge_table=None,   # [T, H, BB, BB] per-pair edge logit terms
    self_extra=None,   # [N, H] edge term of the analytic self loop
):
    N, Fin = x.shape
    H = heads
    HC = w.shape[1]
    C = HC // H
    BB = block_size
    TN = tile_rows
    if not gat_block_supported(N, BB, TN, Fin, HC) and not interpret:
        raise ValueError(
            f"gat block preconditions failed: N={N} TN={TN} BB={BB}"
        )
    if act not in _ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")
    has_edge = edge_table is not None

    # rank-1 logit terms from x directly: asrc = (x@W)@As == x@(W@As) — a
    # [Fin, H] matmul, so h never materializes outside the kernel.  The
    # blockdiag As/Ad construction matches gat_layer._head_matrices.
    eye = jnp.eye(H, dtype=jnp.float32)

    def blockdiag(att):
        aa = att.reshape(H, C)
        return (aa[:, :, None] * eye[:, None, :]).reshape(HC, H)

    dotx = _dot_mm(mm)
    asrc = dotx(x, dotx(w, blockdiag(att_src)))        # [N, H]
    adst = dotx(x, dotx(w, blockdiag(att_dst)))        # [N, H]
    sl_raw = asrc + adst
    if self_extra is not None:
        sl_raw = sl_raw + self_extra
    selfl = jnp.where(sl_raw >= 0.0, sl_raw, neg_slope * sl_raw)
    asrcT = asrc.T                                     # [H, N] (XLA-side)

    kern = functools.partial(
        _kernel, H=H, C=C, BB=BB, neg_slope=float(neg_slope),
        self_loops=bool(self_loops), mm=mm, act=act,
        has_skip=skip is not None, has_edge=has_edge, concat=bool(concat),
    )

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    if has_edge:
        elog_in = edge_table.astype(jnp.float32)
        elog_spec = blk((TN // BB, H, BB, BB), lambda i: (i, 0, 0, 0))
    else:
        elog_in = jnp.zeros((1, 1, 8, BB), jnp.float32)
        elog_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_w = HC if concat else C
    in_specs = [
        blk((TN, Fin), lambda i: (i, 0)),
        blk((TN // BB, BB, BB), lambda i: (i, 0, 0)),
        blk((H, TN), lambda i: (0, i)),
        blk((TN, H), lambda i: (i, 0)),
        blk((TN, H), lambda i: (i, 0)),
        elog_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    wdt = jnp.bfloat16 if mm == "bf16" else jnp.float32
    inputs = [x, block_adj.astype(jnp.bfloat16), asrcT, adst, selfl,
              elog_in, w.astype(wdt), bias.reshape(1, -1)]
    if skip is not None:
        in_specs.append(blk((TN, out_w), lambda i: (i, 0)))
        inputs.append(skip)

    grid_spec = pl.GridSpec(
        grid=(max(N // TN, 1),),
        in_specs=in_specs,
        out_specs=blk((TN, out_w), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((TN, HC), jnp.float32),   # h
            pltpu.VMEM((TN, out_w), jnp.float32),  # attention output
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, out_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=N * (2 * Fin * HC + 2 * BB * HC) ,
            bytes_accessed=N * (Fin + HC) * 4 + N * BB * 2,
            transcendentals=N * BB * H,
        ),
        interpret=interpret,
    )(*inputs)


# --------------------------------------------------------------------------
# padding / VJP wrapper
# --------------------------------------------------------------------------


def _reference(x, block_adj, w, att_src, att_dst, bias, heads, neg_slope,
               self_loops, skip, act, concat=True, edge_table=None,
               self_extra=None):
    from gnnbuilder_tpu.ops.block import block_gat_attention

    N = x.shape[0]
    H = heads
    C = w.shape[1] // H
    h = (x @ w).reshape(N, H, C)
    a_src = jnp.sum(h * att_src, axis=-1)
    a_dst = jnp.sum(h * att_dst, axis=-1)
    out = block_gat_attention(
        block_adj, h, a_src, a_dst, neg_slope=neg_slope,
        self_loops=self_loops, edge_table=edge_table,
        self_extra=self_extra,
    )
    out = out.reshape(N, H * C) if concat else out.mean(axis=1)
    out = out + bias
    if skip is not None:
        out = out + skip
    return _ACTS[act](out)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(heads, neg_slope, self_loops, act, block_size, tile_rows,
                 interpret, mm, has_skip, concat=True, has_edge=False):
    @jax.custom_vjp
    def f(x, badj, skip, elog, eself, w, att_src, att_dst, bias):
        return fused_gat_block_layer(
            x, badj, w, att_src, att_dst, bias, heads,
            neg_slope=neg_slope, self_loops=self_loops,
            skip=skip if has_skip else None, act=act,
            block_size=block_size, tile_rows=tile_rows,
            interpret=interpret, mm=mm, concat=concat,
            edge_table=elog if has_edge else None,
            self_extra=eself if has_edge else None,
        )

    def fwd(x, badj, skip, elog, eself, *p):
        return f(x, badj, skip, elog, eself, *p), (
            x, badj, skip, elog, eself, p
        )

    def bwd(res, ct):
        # XLA recompute (inference-path kernel; training keeps the windowed
        # fused kernel + hand-written scatter backward, gat_bwd.py)
        x, badj, skip, elog, eself, p = res
        _, vjp = jax.vjp(
            lambda xx, sk, el, es, *pp: _reference(
                xx, badj, *pp, heads, neg_slope, self_loops,
                sk if has_skip else None, act, concat=concat,
                edge_table=el if has_edge else None,
                self_extra=es if has_edge else None,
            ),
            x, skip, elog, eself, *p,
        )
        g = vjp(ct)
        dskip = g[1] if has_skip else jnp.zeros_like(skip)
        delog = g[2] if has_edge else jnp.zeros_like(elog)
        deself = g[3] if has_edge else jnp.zeros_like(eself)
        return (g[0], jnp.zeros_like(badj), dskip, delog, deself) + tuple(
            g[4:]
        )

    f.defvjp(fwd, bwd)
    return f


def build_block_edge_logits(senders, receivers, edge_mask, a_edge,
                            num_nodes: int, block_size: int):
    """Dense per-pair edge logit table [T, H, BB, BB] from per-edge terms.

    a_edge[e, h] is the PyG edge attention term att_edge . (W_e e_ij)
    (nn/conv.GATConv._edge_logits); block packing makes (sender,
    receiver) block-local, so the table scatters like block_adj
    (core/graph.py).  Pad edges scatter 0 at the ghost position (their
    adjacency count is 0, so the kernel masks them).  Exact for simple
    graphs only: with parallel edges a single per-pair scalar cannot
    represent distinct pre-leaky terms — dispatch gates on the packer's
    ``multigraph_static`` flag."""
    BB = block_size
    T = num_nodes // BB
    H = a_edge.shape[1]
    r = receivers.astype(jnp.int32)
    sdr = senders.astype(jnp.int32)
    t = r // BB
    i = r % BB
    j = sdr % BB
    vals = jnp.where(edge_mask[:, None], a_edge, 0.0)   # [E, H]
    table = jnp.zeros((T, BB, BB, H), a_edge.dtype)
    table = table.at[t, i, j].add(vals)
    return table.transpose(0, 3, 1, 2)                  # [T, H, BB, BB]


def gat_block_layer_auto(
    x, block_adj, w, att_src, att_dst, bias, heads,
    neg_slope=0.2, self_loops=True, skip=None, act=None,
    block_size=128, tile_rows=1024, interpret=False, mm="f32",
    concat=True, edge_table=None, self_extra=None,
):
    """fused_gat_block_layer with automatic zero-padding of Fin and the
    per-head width C to MXU lanes; returns [N, heads*C] (concat) or
    [N, C] (mean, PyG concat=False head averaging).

    Pad-lane inertness: padded W columns produce zero h lanes; att pad
    entries are zero so logits are unchanged; padded output columns carry
    bias pads (zero) through the softmax-weighted sum of zero lanes and
    are sliced off.  ``edge_table``/``self_extra`` carry the PyG edge_dim
    attention terms (build_block_edge_logits) — per-pair scalars, so the
    C padding never touches them."""
    N, Fin = x.shape
    H = heads
    HC = w.shape[1]
    C = HC // H
    Fin_p = _rup(Fin)
    # pad the per-head width so heads tile the 128-lane dim exactly
    cm = 128 // int(np.gcd(H, 128))
    C_p = ((C + cm - 1) // cm) * cm
    if not concat:
        C_p = _rup(C)  # the mean-mode output is [N, C]: lane-align C
    HC_p = H * C_p
    if HC_p % 128:  # H > 128 with C_p >= 1 cannot misalign; guard anyway
        raise ValueError(f"heads*C_p must be lane-aligned, got {HC_p}")
    has_edge = edge_table is not None
    out_w = HC if concat else C
    out_wp = HC_p if concat else C_p

    def call(xp, wp, asp, adp, bp, skp):
        fn = _make_vjp_fn(H, float(neg_slope), bool(self_loops), act,
                          block_size, tile_rows, interpret, mm,
                          skip is not None, concat=bool(concat),
                          has_edge=has_edge)
        skin = (skp if skp is not None
                else jnp.zeros((N, out_wp), x.dtype))
        elog = (edge_table if has_edge
                else jnp.zeros((1, 1, 8, block_size), jnp.float32))
        eself = (self_extra if self_extra is not None
                 else jnp.zeros((N, H), jnp.float32))
        return fn(xp, block_adj, skin, elog, eself, wp, asp, adp, bp)

    if (Fin_p, C_p) != (Fin, C):
        xp = _pad_cols(x, Fin_p)
        # per-head column padding: W columns [h*C:(h+1)*C] -> width C_p
        wp = jnp.zeros((Fin_p, HC_p), w.dtype)
        asp = jnp.zeros((1, H, C_p), att_src.dtype)
        adp = jnp.zeros((1, H, C_p), att_dst.dtype)
        for hh in range(H):
            wp = wp.at[:Fin, hh * C_p : hh * C_p + C].set(
                w[:, hh * C : (hh + 1) * C]
            )
        asp = asp.at[:, :, :C].set(att_src)
        adp = adp.at[:, :, :C].set(att_dst)
        if concat:
            bp = jnp.zeros((HC_p,), bias.dtype)
            for hh in range(H):
                bp = bp.at[hh * C_p : hh * C_p + C].set(
                    bias[hh * C : (hh + 1) * C]
                )
        else:
            bp = jnp.zeros((C_p,), bias.dtype).at[:C].set(bias)
        skp = None
        if skip is not None:
            if concat:
                skp = jnp.zeros((N, HC_p), skip.dtype)
                for hh in range(H):
                    skp = skp.at[:, hh * C_p : hh * C_p + C].set(
                        skip[:, hh * C : (hh + 1) * C]
                    )
            else:
                skp = _pad_cols(skip, C_p)
        out = call(xp, wp, asp, adp, bp, skp)
        if concat:
            cols = np.concatenate(
                [np.arange(hh * C_p, hh * C_p + C) for hh in range(H)]
            )
            return out[:, cols]
        return out[:, :C]

    return call(x, w, att_src, att_dst, bias, skip)
