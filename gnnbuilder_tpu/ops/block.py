"""Block-diagonal dense aggregation — the matmul fast path.

For bin-packed batches (core/graph.py ``block_size=B``) the adjacency is
a dense block tensor ``A [T, B, B]`` (``A[t, i, j]`` = #edges j->i inside
block t), so the neighbor-aggregation SpMM of the reference's conv kernels
(gcn_conv_agg gnn_builder_lib.h:1223-1289, gin_conv_agg :1401-1437,
sage_conv_agg :2172-2209, pna_conv_agg :1765-1834) becomes one MXU-native
batched matmul::

    sum_j A[i, j] * v[j]  ==  einsum('tij,tjf->tif', A, v.reshape(T,B,F))

No gather, no window DMA, no scatter; the transpose (the backward pass)
is the SAME matmul on ``A^T``, so XLA autodiff is already optimal.  This
is the TPU idiom for tiny-graph batches: molecules are ~18 nodes, the
MXU tile is 128x128, so whole graphs fit many-per-tile and the adjacency
is affordable dense (bf16 counts are exact small integers).

Precision (``mm``) mirrors the Pallas kernels' gather modes
(ops/pallas/pna_layer.py): "bf16" one-pass, "split2" exact-f32 via a
hi/lo decomposition of v (counts are bf16-exact), "highest" f32 HIGHEST.
Numerics match ops/segment.py / ops/ell.py: empty rows produce 0 for
every aggregator; std = sqrt(relu(E[x^2] - E[x]^2) + 1e-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "block_spmm",
    "block_sum",
    "block_mean",
    "block_std",
    "block_multi",
    "block_gat_attention",
]

_STD_EPS = 1e-5  # PyG StdAggregation epsilon (reference gnn_builder_lib.h:700)
_HI = jax.lax.Precision.HIGHEST


def block_spmm(block_adj, v, mm: str = "split2", transpose: bool = False):
    """out[i] = sum_j A[i, j] * v[j] (block-diagonal A).

    ``block_adj`` is [T, B, B] (bf16 counts), ``v`` is [N, F] with
    N == T * B.  ``transpose=True`` contracts over the receiver index
    instead — the VJP/scatter direction: out[j] = sum_i A[i, j] * v[i].
    """
    T, B, _ = block_adj.shape
    N, F = v.shape
    assert N == T * B, (N, T, B)
    vb = v.reshape(T, B, F)
    sub = "tji,tjf->tif" if transpose else "tij,tjf->tif"
    if mm == "highest":
        out = jnp.einsum(
            sub, block_adj.astype(jnp.float32), vb.astype(jnp.float32),
            precision=_HI,
        )
    elif mm == "bf16":
        out = jnp.einsum(
            sub, block_adj.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    elif mm == "split2":
        # near-f32 result in two bf16 passes (residual ~2^-16 relative per
        # term): counts are small integers (bf16-exact); v = hi + lo
        a = block_adj.astype(jnp.bfloat16)
        vf = vb.astype(jnp.float32)
        hi = vf.astype(jnp.bfloat16)
        lo = (vf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum(
            sub, a, hi, preferred_element_type=jnp.float32
        ) + jnp.einsum(sub, a, lo, preferred_element_type=jnp.float32)
    else:
        raise ValueError(f"unknown mm {mm!r}")
    return out.reshape(N, F).astype(v.dtype)


def block_sum(x, block_adj, mm: str = "split2"):
    return block_spmm(block_adj, x, mm=mm)


def block_mean(x, block_adj, in_degree, mm: str = "split2"):
    d = jnp.maximum(in_degree.astype(x.dtype), 1.0)
    return block_spmm(block_adj, x, mm=mm) / d[:, None]


def block_std(x, block_adj, in_degree, mm: str = "split2"):
    out = block_multi(x, block_adj, in_degree, ("std",), mm=mm)
    return out["std"]


def block_multi(x, block_adj, in_degree, aggregators, mm: str = "split2"):
    """sum / mean / std in ONE batched matmul over the stacked RHS
    [v | v^2]; max/min have no matmul form (a dense masked compare is
    O(B) more compute — measured 6x slower than per-slot gathers,
    experiments/block_spmm_probe.py) and must come from the ELL path."""
    bad = set(aggregators) - {"sum", "mean", "std"}
    if bad:
        raise ValueError(f"no block form for aggregators {sorted(bad)}")
    need_sq = "std" in aggregators
    F = x.shape[1]
    if need_sq:
        rhs = jnp.concatenate([x, x * x], axis=-1)
        both = block_spmm(block_adj, rhs, mm=mm)
        s, s2 = both[:, :F], both[:, F:]
    else:
        s = block_spmm(block_adj, x, mm=mm)
        s2 = None
    out = {}
    d = jnp.maximum(in_degree.astype(x.dtype), 1.0)[:, None]
    if "sum" in aggregators:
        out["sum"] = s
    if "mean" in aggregators or need_sq:
        mean = s / d
        if "mean" in aggregators:
            out["mean"] = mean
    if need_sq:
        var = jax.nn.relu(s2 / d - mean * mean)
        out["std"] = jnp.sqrt(var + _STD_EPS)
    return out


_BIG = 3e38  # finite -inf stand-in (matches the Pallas kernels)


def block_gat_attention(
    block_adj,      # [T, B, B] edge counts (j -> i at [t, i, j])
    h,              # [N, H, C] projected per-head features
    a_src,          # [N, H] source attention term (a_l . h_j)
    a_dst,          # [N, H] receiver attention term (a_r . h_i)
    neg_slope: float = 0.2,
    self_loops: bool = True,
    edge_table=None,   # [T, H, B, B] per-pair edge logit terms (added
                       # PRE-leaky, PyG edge_dim semantics); exact only
                       # for simple graphs — the packer's
                       # multigraph_static flag gates callers
    self_extra=None,   # [N, H] edge term of the analytic self loop
                       # (fill_value="mean" projection)
):
    """GAT as dense masked attention per block — the FlashAttention-style
    formulation the block layout unlocks (reference left GAT as
    ``// TODO``, gnn_builder_lib.h:2343).

    PyG semantics exactly: per-edge logits leaky_relu(a_src_j + a_dst_i),
    softmax over each receiver's incoming edges (+ the analytic self
    loop), attention-weighted sum.  The rank-1 logit structure makes the
    score matrix a broadcast add — no matmul — and the weighted sum is
    one batched MXU matmul per head.  Edge MULTIPLICITY is exact: k
    parallel edges contribute k identical softmax terms, which is
    ``A ⊙ exp(logits)`` with A the count matrix.
    """
    T, B, _ = block_adj.shape
    N, H, C = h.shape
    assert N == T * B, (N, T, B)
    A = block_adj.astype(jnp.float32).reshape(T, 1, B, B)
    mask = A > 0
    asrc = a_src.reshape(T, B, H).transpose(0, 2, 1)   # [T, H, B] (j)
    adst = a_dst.reshape(T, B, H).transpose(0, 2, 1)   # [T, H, B] (i)
    z = adst[:, :, :, None] + asrc[:, :, None, :]       # [T, H, Bi, Bj]
    if edge_table is not None:
        z = z + edge_table
    raw = jax.nn.leaky_relu(z, neg_slope)
    masked = jnp.where(mask, raw, -_BIG)
    m = jnp.max(masked, axis=-1)                        # [T, H, Bi]
    if self_loops:
        sl_z = a_src + a_dst
        if self_extra is not None:
            sl_z = sl_z + self_extra
        self_logit = jax.nn.leaky_relu(
            sl_z.reshape(T, B, H).transpose(0, 2, 1), neg_slope
        )                                               # [T, H, B]
        m = jnp.maximum(m, self_logit)
    w = jnp.where(mask, A * jnp.exp(raw - m[..., None]), 0.0)
    denom = jnp.sum(w, axis=-1)                         # [T, H, Bi]
    hb = h.reshape(T, B, H, C).transpose(0, 2, 1, 3)    # [T, H, B, C]
    # XLA-default dot precision (bf16-ish passes on TPU, exact f32 on
    # CPU) — the same contract as every other XLA-path matmul here
    num = jnp.einsum("thij,thjc->thic", w, hb)
    if self_loops:
        es = jnp.exp(self_logit - m)                    # [T, H, B]
        denom = denom + es
        num = num + es[..., None] * hb
    out = num / jnp.maximum(denom, 1e-16)[..., None]    # [T, H, B, C]
    return out.transpose(0, 2, 1, 3).reshape(N, H, C)
