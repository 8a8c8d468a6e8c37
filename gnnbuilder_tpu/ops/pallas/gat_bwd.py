"""Hand-written Pallas backward for the fused GAT layer.

Completes the backward-kernel family (ell_bwd.py: linear/compare
aggregators; scatter_bwd.py: PNA): GAT's attention softmax backward as a
single forward-table scatter kernel.  The reference has no GAT at all
(``// TODO``, gnn_builder_lib.h:2343) and no training path (SURVEY.md §1).

Math per head h, receiver i with neighbors j (self loop = extra slot):

    alpha_ij = e_ij / den_i,   e_ij = exp(lrelu(a_src_j + a_dst_i) - m_i)
    out_i    = sum_j alpha_ij * h_j                       (forward)

    dalpha_ij = <dz_i, h_j>_head                          (backward)
    s_i       = sum_j alpha_ij * dalpha_ij                (incl. self slot)
    dpre_ij   = alpha_ij * (dalpha_ij - s_i) * lrelu'(pre_ij)
    dh_j     += alpha_ij * dz_i         (value scatter)
    da_src_j += dpre_ij                 (logit scatter)
    da_dst_i += sum_j dpre_ij           (receiver-local)

Unlike PNA's extrema routing, everything here is SMOOTH: alpha is
re-derived IN-KERNEL from the backward's own recomputed logits — m and
den are recomputed per receiver row over the gathered slots (plus the
self slot), NOT taken from the forward.  Mixing forward-saved stats with
XLA-recomputed logits broke the softmax gradient identity on hardware:
the forward kernel's bf16-pass projections drift from the XLA recompute
by up to ~0.1 in logit units (results_tpu/gat_bwd_debug.json), and
exp() of that mismatch showed up as O(1) relative error on att_dst
gradients (tpu_verify.py round-2 FAIL).  Self-consistent recomputation
makes the backward exact for the recomputed function; the remaining
fused-vs-XLA gradient gap is bf16-chain scale.  The recomputed (m, den)
are returned so the caller's self-slot terms use the SAME statistics.

Kernel shape (geometry identical to scatter_bwd.py): forward-table walk,
receiver rows blocked, one tall split2 gather of the payload
``[h || a_src]`` per sub-tile, softmax VJP on the VPU, then TWO transposed
one-hot scatter matmuls (separate dots — never concat+slice bf16 in VMEM,
CLAUDE.md) accumulated over the tile window; ±2·slack margins overlap-add
in XLA with static shifts.

The caller (gat_layer.py) runs the dense sender/receiver chains (dW, dx,
datt, bias) in XLA — pure MXU work XLA already does well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _BIG,
    _schedule,
    _stack_ids,
    _sub_rows,
    supports,
)

__all__ = ["fused_gat_scatter_backward", "supports_gat_scatter"]

_VMEM_BUDGET = 10 * 1024 * 1024


def supports_gat_scatter(
    num_nodes: int,
    tile_rows: int,
    window_slack: int,
    hc: int,
    heads: int,
    max_width: int,
) -> bool:
    """Static preconditions: the shared window rules, real sub-tiling,
    margin disjointness (same gates as scatter_bwd.supports_scatter), and
    a VMEM estimate for the GAT working set.  ``max_width`` is the batch's
    REAL ELL width (no default — an optimistic guess here either crashes
    training at backward trace time or over-rejects narrow batches)."""
    tn, sl = tile_rows, window_slack
    if hc % 128:
        return False
    # payload pads the per-head logits into one 128-lane block (HCP = HC+128)
    if heads > 128 or hc % heads:
        return False
    if sl <= 0 or tn % 128 or not supports(num_nodes, tn, sl):
        return False
    tns = _sub_rows(tn, sl)
    if num_nodes // tn < 2 or tns < 2 * sl or tn < 2 * sl:
        return False
    twb = tn + 4 * sl
    tws = tns + 2 * sl
    hcp = hc + 128
    w, h = max_width, heads
    est = 4 * (
        2 * twb * hcp          # double-buffered payload window
        + twb * hcp            # value + logit accumulators
        + 2 * tn * hc          # dz + h blocked
        + w * tns * tws        # slot-major one-hot
        + 3 * w * tns * hcp    # g + C_val + replicated dz
        + 4 * w * tns * h      # alpha/dalpha/dpre slot columns
    )
    return est <= _VMEM_BUDGET


def _kernel(
    offs_ref,    # scalar prefetch: [N/TNS] sub-window offset in tile window
    p_hbm,       # [N + 4*slack, HCP] ANY — padded payload [h || a_src | 0]
    dz_ref,      # [TN, HC] cotangent of the pre-bias output
    h_ref,       # [TN, HC] projected features (receiver rows)
    asrc_ref,    # [TN, H]
    adst_ref,    # [TN, H]
    deg_ref,     # [TN, 1] int32
    et_ref,      # [HC, H] constant E^T (lane -> head reduction)
    idc_ref,     # [W*TN, 1] int32 sub-window-localized ids (-1 = pad)
    ownv_ref,    # [TN, HC] out — value-scatter window rows [2s, 2s+TN)
    margv_ref,   # [1, 4*slack, HC] out — value-scatter margins
    owna_ref,    # [TN, H] out — logit-scatter own rows
    marga_ref,   # [1, 4*slack, H] out — logit-scatter margins
    dsum_ref,    # [TN, H] out — sum_w dpre (receiver rows, excl. self)
    s_ref,       # [TN, H] out — s_i incl. the self slot
    m_ref,       # [TN, H] out — recomputed softmax max (post-clamp)
    den_ref,     # [TN, H] out — recomputed denominator (pre-clamp)
    p_win,       # scratch [2*TWB, HCP]
    accv,        # scratch [TWB, HC]
    acca,        # scratch [TWB, H]
    dma_sem,     # DMA semaphores (2,)
    *,
    W: int,
    TNS: int,
    TWS: int,
    TWB: int,
    HC: int,
    H: int,
    S2: int,
    neg_slope: float,
    self_loops: bool,
):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = dz_ref.shape[0]
    KT = TN // TNS
    HCP = p_win.shape[1]

    def win_copy(t, buf):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(t * TN, TWB), :],
            p_win.at[pl.ds(buf * TWB, TWB), :],
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

    accv[:] = jnp.zeros((TWB, HC), jnp.float32)
    acca[:] = jnp.zeros((TWB, H), jnp.float32)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, TWS), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (W * TNS, 1), 0) // TNS
    bdot = lambda m_, x_: jnp.dot(m_, x_, preferred_element_type=jnp.float32)
    tdot = lambda m_, x_: jax.lax.dot_general(
        m_, x_, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def lrelu(z):
        return jnp.where(z >= 0, z, neg_slope * z)

    def dlrelu(z):
        return jnp.where(z >= 0, 1.0, neg_slope)

    def sub_tile(k):
        off = pl.multiple_of(offs_ref[i * KT + k], 8)
        rows = pl.multiple_of(k * TNS, 8)
        slot0 = pl.multiple_of(k * W * TNS, 8)

        sub = p_win[pl.ds(buf * TWB + off, TWS), :]          # [TWS, HCP]
        idc = idc_ref[pl.ds(slot0, W * TNS), :]              # [W*TNS, 1]
        rep = lambda a: jnp.concatenate([a] * W, axis=0)

        # split2 gather of the payload (values + a_src halves); smooth
        # math downstream, so ~f32-ulp reconstruction is plenty
        oh = idc == lane_g
        ohb = oh.astype(jnp.bfloat16)
        sub_h = sub.astype(jnp.bfloat16)
        sub_l = (sub - sub_h.astype(jnp.float32)).astype(jnp.bfloat16)
        g = bdot(ohb, sub_h) + bdot(ohb, sub_l)              # [W*TNS, HCP]
        g_h = g[:, :HC]
        g_as = g[:, HC : HC + H]

        dz = dz_ref[pl.ds(rows, TNS), :]                     # [TNS, HC]
        deg = deg_ref[pl.ds(rows, TNS), :]                   # [TNS, 1]
        adst = adst_ref[pl.ds(rows, TNS), :]                 # [TNS, H]

        pre = g_as + rep(adst)                               # [W*TNS, H]
        lr = lrelu(pre)
        valid = slot_iota < rep(deg)                         # [W*TNS, 1]

        # softmax stats recomputed HERE, from these logits (see module
        # docstring: forward-saved stats mix with recomputed logits and
        # break the gradient identity at exp(logit-drift) scale)
        lr_m = jnp.where(valid, lr, -_BIG)
        m = jnp.full((TNS, H), -_BIG, jnp.float32)
        for w in range(W):
            m = jnp.maximum(m, lr_m[w * TNS : (w + 1) * TNS, :])
        if self_loops:
            asrc = asrc_ref[pl.ds(rows, TNS), :]
            lr_s = lrelu(asrc + adst)
            m = jnp.maximum(m, lr_s)
        m = jnp.maximum(m, -_BIG * 0.5)  # empty rows: keep exp finite

        e = jnp.where(valid, jnp.exp(lr - rep(m)), 0.0)
        den = jnp.zeros((TNS, H), jnp.float32)
        for w in range(W):
            den = den + e[w * TNS : (w + 1) * TNS, :]
        if self_loops:
            e_s = jnp.exp(lr_s - m)
            den = den + e_s
        m_ref[pl.ds(rows, TNS), :] = m
        den_ref[pl.ds(rows, TNS), :] = den
        den_c = jnp.maximum(den, 1e-16)
        alpha = e / rep(den_c)                               # [W*TNS, H]

        dz_r = rep(dz)                                       # [W*TNS, HC]
        dalpha = bdot(g_h * dz_r, et_ref[:])                 # [W*TNS, H]

        # s_i = sum over slots (incl. self) of alpha * dalpha
        ad_prod = alpha * dalpha
        s = jnp.zeros((TNS, H), jnp.float32)
        for w in range(W):
            s = s + ad_prod[w * TNS : (w + 1) * TNS, :]
        if self_loops:
            h_sub = h_ref[pl.ds(rows, TNS), :]
            alpha_s = e_s / den_c
            dalpha_s = bdot(h_sub * dz, et_ref[:])           # [TNS, H]
            s = s + alpha_s * dalpha_s
        s_ref[pl.ds(rows, TNS), :] = s

        dpre = alpha * (dalpha - rep(s)) * dlrelu(pre)       # [W*TNS, H]
        dsum = jnp.zeros((TNS, H), jnp.float32)
        for w in range(W):
            dsum = dsum + dpre[w * TNS : (w + 1) * TNS, :]
        dsum_ref[pl.ds(rows, TNS), :] = dsum

        # value scatter payload: per-head alpha broadcast onto the HC
        # lanes via the (transposed) expansion reduction's adjoint —
        # alpha @ E == per-head columns repeated C times; build it with
        # the same constant by a matmul against et^T?  et is [HC, H];
        # alpha @ et^T needs a [H, HC] operand — use tdot(et, .) shape
        # tricks instead: (et @ alpha^T)^T is a relayout; cheaper and
        # Mosaic-friendly is a dot with the transposed dimension numbers:
        alpha_l = jax.lax.dot_general(
            alpha, et_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [W*TNS, HC]
        c_val = alpha_l * dz_r                               # [W*TNS, HC]

        # two SEPARATE transposed scatters (value lanes, logit heads);
        # gradient sums ride split2 for f32 accuracy
        cvh = c_val.astype(jnp.bfloat16)
        cvl = (c_val - cvh.astype(jnp.float32)).astype(jnp.bfloat16)
        sv = tdot(ohb, cvh) + tdot(ohb, cvl)                 # [TWS, HC]
        dph = dpre.astype(jnp.bfloat16)
        dpl = (dpre - dph.astype(jnp.float32)).astype(jnp.bfloat16)
        sa = tdot(ohb, dph) + tdot(ohb, dpl)                 # [TWS, H]

        accv[pl.ds(off, TWS), :] = accv[pl.ds(off, TWS), :] + sv
        acca[pl.ds(off, TWS), :] = acca[pl.ds(off, TWS), :] + sa

    for _k in range(KT):
        sub_tile(_k)

    ownv_ref[:] = accv[S2 : S2 + TN, :]
    margv_ref[0, :S2, :] = accv[:S2, :]
    margv_ref[0, S2:, :] = accv[S2 + TN :, :]
    owna_ref[:] = acca[S2 : S2 + TN, :]
    marga_ref[0, :S2, :] = acca[:S2, :]
    marga_ref[0, S2:, :] = acca[S2 + TN :, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "neg_slope", "self_loops", "tile_rows", "window_slack",
        "interpret",
    ),
)
def fused_gat_scatter_backward(
    dz: jax.Array,          # [N, HC] cotangent of the pre-bias output
    h: jax.Array,           # [N, HC] projected features
    a_src: jax.Array,       # [N, H]
    a_dst: jax.Array,       # [N, H]
    nbr_nodes: jax.Array,   # [N, W] FORWARD neighbor table
    in_degree: jax.Array,   # [N]
    heads: int,
    neg_slope: float = 0.2,
    self_loops: bool = True,
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
):
    """Returns (dh_val [N, HC], da_src_nbr [N, H], dsum [N, H], s [N, H],
    m [N, H], den [N, H]).

    dh_val   — the alpha-weighted value scatter (sum_i alpha_ij dz_i)
    da_src_nbr — the dpre logit scatter (sum_i dpre_ij), neighbor slots only
    dsum     — per-receiver sum_w dpre (self slot excluded)
    s        — per-receiver sum of alpha*dalpha INCLUDING the self slot
    m, den   — the softmax stats the kernel recomputed from the given
               h/a_src/a_dst; the caller's self-slot terms MUST use these
               (not forward-saved stats) to stay self-consistent.

    The caller adds the receiver-local self-slot terms and the dense
    chains (see gat_layer.py's backward)."""
    N, HC = dz.shape
    H = heads
    W = nbr_nodes.shape[1]
    TN, SL = tile_rows, window_slack
    if not supports_gat_scatter(N, TN, SL, HC, H, W) and not interpret:
        raise ValueError(
            f"fused_gat_scatter_backward preconditions failed: N={N} TN={TN}"
        )
    TNS, TWS, sws = _schedule(N, TN, SL)
    S2 = 2 * SL
    TWB = TN + 4 * SL
    nt = max(N // TN, 1)
    KT = TN // TNS
    offs = (
        sws - ((np.arange(len(sws), dtype=np.int32) // KT) * TN - S2)
    ).astype(np.int32)
    assert (offs >= 0).all() and (offs + TWS <= TWB).all()

    ids_col = _stack_ids(nbr_nodes, in_degree, sws, TNS)
    HCP = HC + 128
    payload = jnp.concatenate(
        [h.astype(jnp.float32),
         jnp.pad(a_src.astype(jnp.float32), ((0, 0), (0, 128 - H)))],
        axis=1,
    )
    p_pad = jnp.pad(payload, ((S2, S2), (0, 0)))
    from gnnbuilder_tpu.ops.pallas.gat_layer import _expand_np

    et = jnp.asarray(_expand_np(H, HC // H).T)  # [HC, H] lane -> head
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)

    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWB=TWB, HC=HC, H=H, S2=S2,
        neg_slope=float(neg_slope), self_loops=self_loops,
    )

    def blk(shape, j=0):
        return pl.BlockSpec(shape, lambda i, *_: (i, j),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # payload
            blk((TN, HC)),                                   # dz
            blk((TN, HC)),                                   # h
            blk((TN, H)),                                    # a_src
            blk((TN, H)),                                    # a_dst
            blk((TN, 1)),                                    # deg
            pl.BlockSpec(memory_space=pltpu.VMEM),           # et (whole)
            pl.BlockSpec((W * TN, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),           # ids
        ],
        out_specs=[
            blk((TN, HC)),
            pl.BlockSpec((1, 2 * S2, HC), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk((TN, H)),
            pl.BlockSpec((1, 2 * S2, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk((TN, H)),
            blk((TN, H)),
            blk((TN, H)),                                    # m (recomputed)
            blk((TN, H)),                                    # den (recomputed)
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * TWB, HCP), jnp.float32),
            pltpu.VMEM((TWB, HC), jnp.float32),
            pltpu.VMEM((TWB, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    ownv, margv, owna, marga, dsum, s, m, den = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, HC), jnp.float32),
            jax.ShapeDtypeStruct((nt, 2 * S2, HC), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((nt, 2 * S2, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * W * TWS * (HCP + HC + H) * 2,
            bytes_accessed=N * (4 * HC + 6 * H) * 4,
            transcendentals=N * W * H,
        ),
        interpret=interpret,
    )(jnp.asarray(offs), p_pad, dz, h, a_src, a_dst, deg2d,
      et, ids_col)

    def overlap_add(own, marg, width):
        zf = jnp.zeros((nt, TN - S2, width), jnp.float32)
        lpad = jnp.concatenate([marg[:, :S2], zf], axis=1).reshape(N, width)
        rpad = jnp.concatenate([zf, marg[:, S2:]], axis=1).reshape(N, width)
        z2 = jnp.zeros((S2, width), jnp.float32)
        return (
            own
            + jnp.concatenate([lpad[S2:], z2], axis=0)
            + jnp.concatenate([z2, rpad[: N - S2]], axis=0)
        )

    return (
        overlap_add(ownv, margv, HC),
        overlap_add(owna, marga, H),
        dsum,
        s,
        m,
        den,
    )
