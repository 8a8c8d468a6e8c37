"""Fully-fused PNA layer kernel — "SpMM + MLP in one pass" (the flagship).

One Pallas kernel computes an entire PNA convolution per node tile:

    u = x @ W_i + b_pre                  (pre_nn, receiver half)
    v = x_window @ W_j                   (pre_nn, neighbor half — computed
                                          on the DMA'd window, so v never
                                          exists in HBM)
    table[w] = u + onehot_gather(v, w)   (MXU one-hot selection)
    max/min/mean/std over valid slots    (VPU, accumulators in registers)
    y  = agg_cat @ Ks                    (all 3 scaler blocks, one matmul)
    out = (x @ K0 + b_post + y_id + amp*y_amp + att*y_att) @ W_lin + b_lin

HBM traffic per layer = read x + read weights + write out — nothing else.
The XLA pipeline for the same math moves ~800 MB per batch-1024 QM9 layer
(see ops/pallas/ell_agg.py); this kernel moves ~20 MB.

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.ell import _STD_EPS  # single source of truth
from gnnbuilder_tpu.ops.pallas.ell_agg import _window_starts, supports

__all__ = ["fused_pna_layer", "fused_pna_layer_vjp", "pna_layer_supported"]

_HI = jax.lax.Precision.HIGHEST


def pna_layer_supported(num_nodes, f_in, f_out, tile_rows, window_slack):
    return (
        f_in % 128 == 0
        and f_out % 128 == 0
        and supports(num_nodes, tile_rows, window_slack)
    )


def _kernel(
    ws_ref,
    x_hbm,       # [N, Fin] ANY — windowed neighbor reads
    x_ref,       # [TN, Fin] VMEM — receiver rows
    nbr_ref,     # [TN, W] int32
    deg_ref,     # [TN, 1] int32
    w_i_ref,     # [Fin, F] pre_nn receiver half
    w_j_ref,     # [Fin, F] pre_nn neighbor half
    b_pre_ref,   # [1, F]
    k0_ref,      # [Fin, Fout] post_nn self block
    ks_ref,      # [4F, 3*Fout] post_nn scaler blocks (id | amp | att)
    b_post_ref,  # [1, Fout]
    w_lin_ref,   # [Fout, Fout]
    b_lin_ref,   # [1, Fout]
    out_ref,     # [TN, Fout]
    x_win,       # scratch [TW, Fin]
    dma_sem,
    *,
    W: int,
    TW: int,
    delta: float,
    gather_mode: str = "split2",
):
    i = pl.program_id(0)
    start = pl.multiple_of(ws_ref[i], 8)
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, TW), :], x_win, dma_sem
    )
    copy.start()

    TN = x_ref.shape[0]
    F = w_i_ref.shape[1]
    Fout = k0_ref.shape[1]
    xt = x_ref[:]
    deg = deg_ref[:]

    u = (
        jnp.dot(xt, w_i_ref[:], preferred_element_type=jnp.float32)
        + b_pre_ref[:]
    )

    copy.wait()
    vwin = jnp.dot(
        x_win[:], w_j_ref[:], preferred_element_type=jnp.float32
    )  # [TW, F]

    ids_local = nbr_ref[:] - start
    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, TW), 1)
    neg = jnp.full((TN, F), -jnp.inf, jnp.float32)
    pos = jnp.full((TN, F), jnp.inf, jnp.float32)
    zero = jnp.zeros((TN, F), jnp.float32)
    s_acc, sq_acc, mx_acc, mn_acc = zero, zero, neg, pos

    # one-hot gather precision (see module docstring): Mosaic's default
    # matmul is one-pass bf16.  "split2" = hi/lo bf16 split, 2 passes,
    # ~1e-5 rel (v_hi+v_lo recover ~16 mantissa bits); "highest" = 6-pass
    # exact; "bf16" = 1 pass (bf16 precision mode).
    if gather_mode == "split2":
        v_hi = vwin.astype(jnp.bfloat16)
        v_lo = (vwin - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    for w in range(W):
        if gather_mode == "highest":
            onehot = (ids_local[:, w][:, None] == lane).astype(jnp.float32)
            g = jnp.dot(onehot, vwin, preferred_element_type=jnp.float32,
                        precision=_HI)
        elif gather_mode == "split2":
            onehot = (ids_local[:, w][:, None] == lane).astype(jnp.bfloat16)
            g = jnp.dot(
                onehot, v_hi, preferred_element_type=jnp.float32
            ) + jnp.dot(onehot, v_lo, preferred_element_type=jnp.float32)
        elif gather_mode == "bf16":
            onehot = (ids_local[:, w][:, None] == lane).astype(jnp.bfloat16)
            g = jnp.dot(
                onehot,
                vwin.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            raise ValueError(f"unknown gather_mode {gather_mode}")
        # aggregate over g alone and shift by u AFTER the reduction:
        # mean/max/min commute with the constant per-row shift and std is
        # shift-invariant, so no u-induced cancellation — in particular
        # deg-1 rows get variance exactly 0 (same product subtracted from
        # itself) instead of sqrt-eps-amplified gather noise
        valid = w < deg
        s_acc = s_acc + jnp.where(valid, g, 0.0)
        sq_acc = sq_acc + jnp.where(valid, g * g, 0.0)
        mx_acc = jnp.maximum(mx_acc, jnp.where(valid, g, neg))
        mn_acc = jnp.minimum(mn_acc, jnp.where(valid, g, pos))

    degf = deg.astype(jnp.float32)
    denom = jnp.maximum(degf, 1.0)
    nonempty = deg > 0
    mean_g = s_acc / denom
    var = jnp.maximum(sq_acc / denom - mean_g * mean_g, 0.0)
    std = jnp.sqrt(var + _STD_EPS)
    mean = jnp.where(nonempty, u + mean_g, 0.0)
    mx = jnp.where(nonempty, u + mx_acc, 0.0)
    mn = jnp.where(nonempty, u + mn_acc, 0.0)
    # aggregator order fixed: (max, min, mean, std) == PNA_AGGREGATORS
    agg_cat = jnp.concatenate([mx, mn, mean, std], axis=-1)  # [TN, 4F]

    y = jnp.dot(agg_cat, ks_ref[:], preferred_element_type=jnp.float32)
    # [TN, 3*Fout]
    log_deg = jnp.log(jnp.maximum(degf, 1.0) + 1.0)  # [TN, 1]
    amp = log_deg / delta
    att = delta / log_deg
    mid = (
        jnp.dot(xt, k0_ref[:], preferred_element_type=jnp.float32)
        + b_post_ref[:]
        + y[:, :Fout]
        + amp * y[:, Fout : 2 * Fout]
        + att * y[:, 2 * Fout :]
    )
    out_ref[:] = (
        jnp.dot(mid, w_lin_ref[:], preferred_element_type=jnp.float32)
        + b_lin_ref[:]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "delta", "tile_rows", "window_slack", "interpret", "gather_mode",
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
    tile_rows: int = 256,
    window_slack: int = 64,
    interpret: bool = False,
    gather_mode: str = "split2",
):
    N, Fin = x.shape
    F = w_pre.shape[1]
    Fout = w_lin.shape[1]
    W = nbr_nodes.shape[1]
    TN = tile_rows
    TW = TN + 2 * window_slack
    if not pna_layer_supported(N, Fin, Fout, TN, window_slack) and not interpret:
        raise ValueError(f"fused_pna_layer preconditions failed: N={N}")

    ws = jnp.asarray(_window_starts(N, TN, TW, window_slack))
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)
    w_i, w_j = w_pre[:Fin], w_pre[Fin:]
    k0 = k_post[:Fin]
    ks = jnp.concatenate(
        [k_post[Fin + i * 4 * F : Fin + (i + 1) * 4 * F] for i in range(3)],
        axis=1,
    )  # [4F, 3*Fout]

    kern = functools.partial(
        _kernel, W=W, TW=TW, delta=float(delta), gather_mode=gather_mode
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, s: (i, 0), memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(
            shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x (windowed)
            blk((TN, Fin)),                      # x (tile)
            blk((TN, W)),
            blk((TN, 1)),
            rep((Fin, F)),
            rep((Fin, F)),
            rep((1, F)),
            rep((Fin, Fout)),
            rep((4 * F, 3 * Fout)),
            rep((1, Fout)),
            rep((Fout, Fout)),
            rep((1, Fout)),
        ],
        out_specs=blk((TN, Fout)),
        scratch_shapes=[
            pltpu.VMEM((TW, Fin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    flops = N * (2 * Fin * F + W * TW * F + 4 * F * 3 * Fout
                 + Fin * Fout + Fout * Fout) * 2
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, Fout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (Fin + Fout)) * 4,
            transcendentals=N,
        ),
        interpret=interpret,
    )(
        ws, x, x, nbr_nodes, deg2d,
        w_i, w_j, b_pre.reshape(1, -1),
        k0, ks, b_post.reshape(1, -1),
        w_lin, b_lin.reshape(1, -1),
    )


# --------------------------------------------------------------------------
# XLA reference (for the custom VJP backward and for tests)
# --------------------------------------------------------------------------


def pna_layer_reference(
    x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    delta,
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
    return mid @ w_lin + b_lin


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(delta, tile_rows, window_slack, interpret, gather_mode):
    @jax.custom_vjp
    def f(x, nbr, deg, w_pre, b_pre, k_post, b_post, w_lin, b_lin):
        return fused_pna_layer(
            x, nbr, deg, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
            delta, tile_rows, window_slack, interpret, gather_mode,
        )

    def fwd(x, nbr, deg, *p):
        return f(x, nbr, deg, *p), (x, nbr, deg, p)

    def bwd(res, ct):
        x, nbr, deg, p = res
        _, vjp = jax.vjp(
            lambda xx, *pp: pna_layer_reference(xx, nbr, deg, *pp, delta),
            x, *p,
        )
        grads = vjp(ct)
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return (grads[0], zero_i(nbr), zero_i(deg)) + grads[1:]

    f.defvjp(fwd, bwd)
    return f


def fused_pna_layer_vjp(
    x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
    delta, tile_rows=256, window_slack=64, interpret=False,
    gather_mode="split2",
):
    fn = _make_vjp_fn(
        float(delta), tile_rows, window_slack, interpret, gather_mode
    )
    return fn(
        x, nbr_nodes, in_degree.astype(jnp.int32),
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
    delta, tile_rows=256, window_slack=64, interpret=False,
    gather_mode="split2",
):
    """fused_pna_layer_vjp with automatic zero-padding of unaligned feature
    dims to MXU lanes (128).

    Zero pad lanes are inert end to end: padded x lanes produce zero v
    lanes; aggregator pad lanes feed zero rows of the (padded) post_nn
    kernel; the padded output columns are sliced off.  This lets the raw
    11-dim molecular input layer and the 64-dim output layer run fused
    instead of falling back to the slow XLA path.  Padding happens outside
    the custom VJP, so gradients slice back automatically.
    """
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
        out = fused_pna_layer_vjp(
            xp, nbr_nodes, in_degree, w_pre_p, b_pre_p, k_post_p, b_post_p,
            w_lin_p, b_lin_p, delta, tile_rows, window_slack, interpret,
            gather_mode,
        )
        return out[:, :Fout]

    return fused_pna_layer_vjp(
        x, nbr_nodes, in_degree, w_pre, b_pre, k_post, b_post, w_lin, b_lin,
        delta, tile_rows, window_slack, interpret, gather_mode,
    )
