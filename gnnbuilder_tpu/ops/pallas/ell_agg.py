"""Fused ELL multi-aggregate Pallas kernel — the framework's hot kernel.

Replaces the XLA chain  gather [N,W,F] -> (+u broadcast) -> 4 masked
reduces  with ONE pass per node tile that keeps the message table entirely
in VMEM.  Measured on TPU v5e, the XLA chain moves ~800 MB of HBM for a
batch-1024 QM9 PNA layer (each masked ``where`` materializes its own
[N,W,F] copy and the row gather is re-fused per consumer); the fused kernel
moves the information-theoretic minimum: read u,v [N,F], neighbor table
[N,W], write agg concat [N,A*F].

This is the TPU counterpart of the reference's streaming aggregation loop
(gather_node_neighbors + incremental max/min/mean/std aggregators,
gnn_builder_lib.h:1168-1207 and :642-802, driven per node by pna_conv_agg
:1765-1834) — same dataflow idea (messages never round-trip to main
memory), realized as a tiled MXU/VPU kernel instead of an HLS pipeline.

Gather strategy.  Mosaic has no dynamic row gather, so neighbor rows are
selected with a one-hot MXU matmul against a *windowed* slice of ``v``:

* the packer lays graphs out contiguously and edges never cross graphs, so
  every neighbor id of node-tile ``t`` (rows [t*TN, (t+1)*TN)) lies in
  ``[t*TN - maxg, t*TN + TN + maxg)`` where maxg = largest graph in the
  batch.  The window schedule is therefore a HOST-SIDE CONSTANT — scalar-
  prefetched, no data-dependent control flow;
* pad slots hold the ghost id, which simply misses the window for most
  tiles -> all-zero one-hot row -> contributes 0, and is masked anyway;
* a one-hot f32 matmul selects exactly one row per slot (products are
  0*x or 1*x), so the gather is numerically exact.

p_in/p_out analog: ``tile_rows`` (TN) and ``window_slack`` are this
kernel's parallelism knobs, exposed to the DSE autotuner the way the
reference exposes unroll factors (models.py:30-314).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.ell import _STD_EPS  # single source of truth

__all__ = ["fused_ell_aggregate", "fused_ell_aggregate_vjp", "supports"]


def supports(num_nodes: int, tile_rows: int, window_slack: int) -> bool:
    """Whether the fused kernel's static preconditions hold for this batch."""
    tw = tile_rows + 2 * window_slack
    return (
        num_nodes % tile_rows == 0
        and num_nodes >= tw
        and tw % 8 == 0
        and tile_rows % 8 == 0
        # the kernel asserts pl.multiple_of(window_start, 8); interior
        # windows start at t*TN - slack, so slack itself must be 8-aligned
        and window_slack % 8 == 0
    )


def _window_starts(n: int, tile_rows: int, window: int, slack: int) -> np.ndarray:
    t = np.arange(n // tile_rows, dtype=np.int32)
    ws = np.clip(t * tile_rows - slack, 0, n - window)
    return ws.astype(np.int32)


def _kernel(
    ws_ref,  # scalar prefetch
    *refs,   # ([u_tile], v_hbm, nbr_tile, deg_tile, out, v_win, dma_sem)
    aggregators: Sequence[str],
    W: int,
    TW: int,
    has_u: bool,
    gather_mode: str,
):
    # the u input exists only when the caller passes one — no zeros array
    # is materialized/streamed for plain aggregations (GIN/SAGE/GCN/...)
    if has_u:
        u_ref, v_hbm, nbr_ref, deg_ref, out_ref, v_win, dma_sem = refs
    else:
        v_hbm, nbr_ref, deg_ref, out_ref, v_win, dma_sem = refs
        u_ref = None
    i = pl.program_id(0)
    start = pl.multiple_of(ws_ref[i], 8)

    copy = pltpu.make_async_copy(
        v_hbm.at[pl.ds(start, TW), :], v_win, dma_sem
    )
    copy.start()

    TN = nbr_ref.shape[0]
    F = v_win.shape[1]
    # accumulate in f32 regardless of the input dtype (the gather matmuls
    # emit f32 via preferred_element_type); the store casts to the output
    # dtype, so a bf16 precision policy gets bf16 out without a dtype
    # mismatch at the swap (round-1 advisor finding, high)
    dtype = jnp.float32

    ids_local = nbr_ref[:] - start  # [TN, W]
    deg = deg_ref[:]  # [TN, 1]
    u = u_ref[:] if has_u else None

    copy.wait()
    vwin = v_win[:]
    if gather_mode == "split2":
        v_hi = vwin.astype(jnp.bfloat16)
        v_lo = (vwin - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    elif gather_mode == "bf16":
        v_bf = vwin.astype(jnp.bfloat16)

    need_sum = "sum" in aggregators or "mean" in aggregators or "std" in aggregators
    need_sq = "std" in aggregators
    need_max = "max" in aggregators
    need_min = "min" in aggregators

    neg = jnp.full((TN, F), -jnp.inf, dtype)
    pos = jnp.full((TN, F), jnp.inf, dtype)
    zero = jnp.zeros((TN, F), dtype)
    s_acc = zero
    sq_acc = zero
    mx_acc = neg
    mn_acc = pos

    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, TW), 1)
    for w in range(W):
        # gather precision: Mosaic's default matmul is one-pass bf16, so
        # "highest" (default, exact), "split2" (hi/lo bf16, ~1e-5 rel), or
        # "bf16" (one pass, for the bf16 precision policy)
        if gather_mode == "highest":
            onehot = (ids_local[:, w][:, None] == lane).astype(vwin.dtype)
            g = jnp.dot(
                onehot,
                vwin,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        elif gather_mode == "split2":
            onehot = (ids_local[:, w][:, None] == lane).astype(jnp.bfloat16)
            g = jnp.dot(
                onehot, v_hi, preferred_element_type=jnp.float32
            ) + jnp.dot(onehot, v_lo, preferred_element_type=jnp.float32)
        elif gather_mode == "bf16":
            onehot = (ids_local[:, w][:, None] == lane).astype(jnp.bfloat16)
            g = jnp.dot(onehot, v_bf, preferred_element_type=jnp.float32)
        else:
            raise ValueError(f"unknown gather_mode {gather_mode}")
        # aggregate over g alone; the constant per-row shift u is applied
        # after the reduction (commutes for sum/mean/max/min, std is
        # shift-invariant) — avoids u-induced cancellation amplified by the
        # sqrt-eps in std for low-degree rows
        valid = (w < deg)  # [TN, 1] bool, broadcasts over F
        if need_sum:
            s_acc = s_acc + jnp.where(valid, g, 0.0)
        if need_sq:
            sq_acc = sq_acc + jnp.where(valid, g * g, 0.0)
        if need_max:
            mx_acc = jnp.maximum(mx_acc, jnp.where(valid, g, neg))
        if need_min:
            mn_acc = jnp.minimum(mn_acc, jnp.where(valid, g, pos))

    degf = deg.astype(dtype)
    denom = jnp.maximum(degf, 1.0)
    nonempty = deg > 0  # [TN, 1]

    outs = []
    for a in aggregators:
        if a == "sum":
            s = s_acc + degf * u if has_u else s_acc
            outs.append(s)
        elif a == "mean":
            m = s_acc / denom
            if has_u:
                m = jnp.where(nonempty, u + m, 0.0)
            outs.append(m)
        elif a == "std":
            mean_g = s_acc / denom
            var = jnp.maximum(sq_acc / denom - mean_g * mean_g, 0.0)
            outs.append(jnp.sqrt(var + _STD_EPS))
        elif a == "max":
            m = mx_acc
            if has_u:
                m = u + m
            outs.append(jnp.where(nonempty, m, 0.0))
        elif a == "min":
            m = mn_acc
            if has_u:
                m = u + m
            outs.append(jnp.where(nonempty, m, 0.0))
        else:
            raise ValueError(f"unknown aggregator {a}")
    out_ref[:] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "aggregators", "tile_rows", "window_slack", "interpret",
        "gather_mode",
    ),
)
def fused_ell_aggregate(
    v: jax.Array,                 # [N, F] neighbor-side values
    nbr_nodes: jax.Array,         # [N, W] int32 ELL table
    in_degree: jax.Array,         # [N] int32
    aggregators: tuple,
    u: Optional[jax.Array] = None,  # [N, F] receiver-side shift (PNA's u_i)
    tile_rows: int = 256,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "highest",
):
    """All ``aggregators`` of ``(u_i +) v_j`` over each node's ELL slots,
    concatenated [N, len(aggregators)*F] in aggregator order.

    Preconditions (checked): N divisible by tile_rows, window fits, and —
    guaranteed by the packer, asserted by the caller — every neighbor id of
    rows [t*TN,(t+1)*TN) lies within ``t*TN ± window_slack`` (graphs are
    contiguous and smaller than window_slack).
    """
    N, F = v.shape
    W = nbr_nodes.shape[1]
    TN = tile_rows
    TW = TN + 2 * window_slack
    if not supports(N, TN, window_slack):
        raise ValueError(
            f"fused_ell_aggregate preconditions failed: N={N} TN={TN} TW={TW}"
        )
    A = len(aggregators)
    ws = jnp.asarray(_window_starts(N, TN, TW, window_slack))
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)
    has_u = u is not None

    kern = functools.partial(
        _kernel, aggregators=tuple(aggregators), W=W, TW=TW, has_u=has_u,
        gather_mode=gather_mode,
    )

    # index maps receive (grid idx, scalar-prefetch ref)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM, DMA'd
        pl.BlockSpec((TN, W), lambda i, ws: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TN, 1), lambda i, ws: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [ws, v, nbr_nodes, deg2d]
    if has_u:
        in_specs.insert(
            0,
            pl.BlockSpec(
                (TN, F), lambda i, ws: (i, 0), memory_space=pltpu.VMEM
            ),
        )
        inputs.insert(1, u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TN, A * F), lambda i, ws: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TW, F), v.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    flops = N * W * TW * F * 2  # one-hot gather matmuls dominate
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, A * F), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * N * F + N * A * F) * v.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper.
#
# Forward: the fused Pallas kernel above.  Backward: when the batch carries
# reverse (out-neighbor) tables and there is no receiver shift ``u``, a
# hand-written Pallas backward (ops/pallas/ell_bwd.py) — the transpose of the
# in-neighbor aggregation walked over the reverse table, no scatter and no
# [N, W, F] materialization.  Otherwise (no reverse tables / PNA's u path)
# the backward re-derives gradients through the ops/ell.py XLA reference.
# ---------------------------------------------------------------------------


def _reference(v, u, nbr_nodes, in_degree, aggregators):
    from gnnbuilder_tpu.ops import ell

    table = ell.ell_gather(v, nbr_nodes)
    if u is not None:
        table = u[:, None, :] + table
    mask = ell.ell_mask(nbr_nodes, in_degree)
    d = ell.ell_multi_table(table, in_degree, aggregators, mask)
    return jnp.concatenate([d[a] for a in aggregators], axis=-1)


def _count_ties(v_t, extremum, nbr_nodes, in_degree, gather_mode, cfg):
    """Per-receiver tie counts: #{valid slots w : transform(v)[nbr] == ext}.

    Runs the generic gather kernel over the FORWARD table with local rows =
    the extremum and one compare pair (ref = transformed v, coef = 1) —
    ties arrive without materializing the [N, W, F] table.
    """
    from gnnbuilder_tpu.ops.pallas.ell_bwd import fused_gather_backward

    ones = jnp.ones_like(v_t)
    return fused_gather_backward(
        jnp.concatenate([v_t, ones], axis=-1),
        nbr_nodes,
        in_degree,
        v=extremum,
        has_lin=False,
        n_cmp=1,
        # locals (the extremum) and refs (v_t) are already g-domain values;
        # split2 re-gathers them exactly (idempotency) and the re-transform
        # of the extremum is a no-op
        fwd_gather_mode=gather_mode,
        **cfg,
    )


def _pallas_bwd(v, nbr_nodes, in_degree, rev_nbr, out_degree, out, ct,
                aggregators, gather_mode, cfg):
    """Hand-written backward for the u-free multi-aggregate: assemble
    per-receiver coefficient arrays in XLA, then one reverse-table kernel
    pass (+ tie-count passes when extrema are present)."""
    from gnnbuilder_tpu.ops.pallas.ell_bwd import (
        fused_gather_backward,
        transform_like_gather,
    )

    F = v.shape[1]
    deg = in_degree.astype(jnp.float32)[:, None]
    denom = jnp.maximum(deg, 1.0)
    nonempty = deg > 0

    sl = {a: i for i, a in enumerate(aggregators)}
    col = lambda arr, a: arr[:, sl[a] * F : (sl[a] + 1) * F]

    c_lin = jnp.zeros_like(v)
    has_lin = False
    if "sum" in sl:
        c_lin = c_lin + col(ct, "sum")
        has_lin = True
    if "mean" in sl:
        c_lin = c_lin + col(ct, "mean") / denom
        has_lin = True

    # v in the g-domain: only the tie counter needs it precomputed (as the
    # ref column of its compare pair); the main kernel transforms in-kernel
    v_t = (
        transform_like_gather(v, gather_mode)
        if ("max" in sl or "min" in sl)
        else None
    )

    blocks = []
    has_dev = False
    if "std" in sl:
        has_dev = True
        std_out = col(out, "std")
        # mean in the g-domain: reuse the mean output when present, else
        # one extra fused forward pass (bit-identical gather path)
        if "mean" in sl:
            mean_raw = col(out, "mean")
        else:
            mean_raw = fused_ell_aggregate(
                v, nbr_nodes, in_degree, ("mean",),
                gather_mode=gather_mode, **cfg,
            )
        c_a = col(ct, "std") / (denom * std_out)
        blocks += [c_a, c_a * mean_raw]

    n_cmp = 0
    for name in ("max", "min"):
        if name in sl:
            ext = col(out, name)  # raw extremum (nonempty rows); 0 if empty
            ties = _count_ties(v_t, ext, nbr_nodes, in_degree, gather_mode,
                               cfg)
            coef = jnp.where(nonempty, col(ct, name), 0.0) / jnp.maximum(
                ties, 1.0
            )
            blocks += [ext, coef]
            n_cmp += 1

    cstk = jnp.concatenate(([c_lin] if has_lin else []) + blocks, axis=-1)
    # pass raw v + the forward's gather mode: the kernel re-applies the
    # transform (idempotent on already-transformed values) and picks the
    # matching — cheapest exact — cmp gather precision
    return fused_gather_backward(
        cstk, rev_nbr, out_degree,
        v=v,
        has_lin=has_lin,
        has_dev=has_dev,
        n_cmp=n_cmp,
        fwd_gather_mode=gather_mode,
        **cfg,
    )


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(aggregators, tile_rows, window_slack, has_u, has_rev,
                 interpret, gather_mode):
    cfg = dict(tile_rows=tile_rows, window_slack=window_slack,
               interpret=interpret)

    @jax.custom_vjp
    def f(v, u, nbr_nodes, in_degree, rev_nbr, out_degree):
        return fused_ell_aggregate(
            v,
            nbr_nodes,
            in_degree,
            aggregators,
            u=u if has_u else None,
            gather_mode=gather_mode,
            **cfg,
        )

    def fwd(v, u, nbr_nodes, in_degree, rev_nbr, out_degree):
        out = f(v, u, nbr_nodes, in_degree, rev_nbr, out_degree)
        return out, (v, u, nbr_nodes, in_degree, rev_nbr, out_degree, out)

    def bwd(res, ct):
        v, u, nbr_nodes, in_degree, rev_nbr, out_degree, out = res
        if has_rev and not has_u:
            dv = _pallas_bwd(
                v, nbr_nodes, in_degree, rev_nbr, out_degree, out, ct,
                aggregators, gather_mode, cfg,
            )
            du = jnp.zeros_like(u)
        elif has_u:
            _, vjp = jax.vjp(
                lambda vv, uu: _reference(
                    vv, uu, nbr_nodes, in_degree, aggregators
                ),
                v,
                u,
            )
            dv, du = vjp(ct)
        else:
            _, vjp = jax.vjp(
                lambda vv: _reference(
                    vv, None, nbr_nodes, in_degree, aggregators
                ),
                v,
            )
            (dv,) = vjp(ct)
            du = jnp.zeros_like(u)
        zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (dv, du, zero_i(nbr_nodes), zero_i(in_degree),
                zero_i(rev_nbr), zero_i(out_degree))

    f.defvjp(fwd, bwd)
    return f


def fused_ell_aggregate_vjp(
    v,
    nbr_nodes,
    in_degree,
    aggregators,
    u=None,
    rev_nbr_nodes=None,
    out_degree=None,
    tile_rows: int = 256,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "highest",
):
    """Differentiable fused aggregate.

    Pallas forward always; Pallas backward when ``rev_nbr_nodes`` /
    ``out_degree`` (core/packing.build_reverse_ell) are given and ``u`` is
    None, else the XLA-reference backward.
    """
    has_u = u is not None
    has_rev = rev_nbr_nodes is not None and out_degree is not None
    fn = _make_vjp_fn(
        tuple(aggregators), tile_rows, window_slack, has_u, has_rev,
        interpret, gather_mode,
    )
    u_in = u if has_u else jnp.zeros_like(v)
    if not has_rev:
        rev_nbr_nodes = jnp.zeros((1, 1), jnp.int32)
        out_degree = jnp.zeros((1,), jnp.int32)
    return fn(v, u_in, nbr_nodes, in_degree, rev_nbr_nodes,
              out_degree.astype(jnp.int32))
