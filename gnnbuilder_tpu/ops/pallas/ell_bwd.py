"""Generic reverse-ELL gather kernel — the hand-written Pallas backward.

The transpose of "aggregate over in-neighbors" is "aggregate cotangents
over out-neighbors": with the reverse neighbor table
(core/packing.build_reverse_ell), every aggregator's backward becomes the
SAME windowed, scatter-free gather kernel as the forward — the round-1
XLA-recompute VJPs (which re-materialized the whole [N, W, F] message
table plus its masked copies in HBM) collapse into one pass that moves
read coeffs [N, K*F] + write dv [N, F].

Per output row j (a sender), over j's out-neighbor slots i:

    dv[j]  =  SUM_i  c_lin[i]                                (sum/mean/...)
           +  v_cmp[j] * SUM_i d1[i]  -  SUM_i d2[i]         (std; d1 =
                         c_a, d2 = c_a * mean — both sums ride the exact
                         count-SpMM, see "dev" below)
           +  SUM_i  [v_cmp[j] == ref_c[i]] * coef_c[i]      (max / min)

where all the bracketed per-receiver arrays are precomputed in XLA by the
calling VJP (ell_agg / mp_layer / pna_layer) and stacked column-wise into
one ``cstk`` operand.

Cost model (why three term classes, measured on v5e):

* ``lin`` rides the count-matrix SpMM (one-hots summed over slots BEFORE
  the matmul): W-independent, 2 bf16 passes — ~free.
* ``dev`` (std) also rides the count-SpMM but with ``Precision.HIGHEST``
  (6 passes on a [TNS, TWS] operand — still W-times cheaper than a
  per-slot gather).  Exactness argument: gathered c_a / c_a*mean arrive
  bit-exact, so a degree-1 receiver's contribution cancels to the same
  f32 products on both sides (v_cmp == mean bitwise there, and f32
  multiply is deterministic), matching XLA's exact-zero gradient through
  relu'(0) at var == 0; multi-edge sums cancel at f32-ulp.
* ``cmp`` (max/min) must gather per slot (the compare against v_cmp
  cannot be pre-summed).  It uses the split2 hi/lo gather (2 bf16
  passes): reconstruction s(y) = f32(bf16(y)) + f32(bf16(y - bf16(y)))
  is IDEMPOTENT on values (verified exhaustively over 7M samples incl.
  rounding-boundary adversaries), and the reference values are already
  in the s-domain (they came out of a forward split2/bf16 gather), so
  the re-gather is bit-exact and ``v_cmp == ref`` reproduces the
  forward's argmax decisions.  When the forward gathered with
  ``highest`` the refs are raw f32 and the cmp gather uses HIGHEST too.

Numerics contracts (load-bearing):

* The local rows ``v`` are first pushed through the same rounding the
  forward gather applied (``fwd_gather_mode``), so compares and std
  deviations happen in the forward's message-table domain.
* Tie semantics match XLA's reduce-max VJP (gradient split evenly among
  tied slots): callers divide the extrema cotangent by the forward tie
  count; this kernel can itself COUNT ties by running over the *forward*
  table with (ref=s(v), coef=1) pairs — see
  ell_agg.fused_ell_aggregate_vjp.

Validity needs no masks anywhere: pad slots carry id -1 (never matching
the lane iota), so their one-hot rows are zero, gathered rows are zero,
and zero coefficients contribute zero through every term.

Reference counterpart: the reference has no training path at all (its
backward is PyTorch autograd on the CPU model, SURVEY.md §1); this kernel
is what makes the fused TPU layers trainable at fused-forward speeds.
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
    _HI,
    _norm_window_mode,
    _schedule,
    _stack_ids,
    _tile_schedule,
    supports,
)

__all__ = ["fused_gather_backward", "transform_like_gather"]


def transform_like_gather(v: jax.Array, gather_mode: str) -> jax.Array:
    """Apply, in XLA, the exact rounding a fused forward gather applied to
    ``v``: the forward's message table held these values, so comparisons
    and deviations against forward-saved results must use them."""
    if gather_mode == "highest":
        return v
    vh = v.astype(jnp.bfloat16)
    if gather_mode == "bf16":
        return vh.astype(jnp.float32)
    if gather_mode == "split2":
        lo = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return vh.astype(jnp.float32) + lo.astype(jnp.float32)
    raise ValueError(f"unknown gather_mode {gather_mode!r}")


def _kernel(
    sws_ref,     # scalar prefetch: [N/TNS] window start per sub-tile
    tsw_ref,     # scalar prefetch: [N/TN] tile window start (tile mode)
    c_hbm,       # [N, K*F] ANY — stacked coefficients, windowed DMA
    ids_ref,     # [W*TN, 1] int32 localized stacked slot ids (-1 = pad)
    *rest,       # ([v_ref], out_ref, c_win[2,TWS,K*F], dma_sem[2])
    W: int,
    TNS: int,
    TWS: int,
    TWL: int,
    window_mode: str,
    F: int,
    has_lin: bool,
    has_dev: bool,
    n_cmp: int,
    fwd_gather_mode: str,
):
    needs_v = has_dev or n_cmp > 0
    if needs_v:
        v_ref, out_ref, c_win, dma_sem = rest
    else:
        out_ref, c_win, dma_sem = rest
        v_ref = None

    i = pl.program_id(0)
    nt = pl.num_programs(0)
    TN = out_ref.shape[0]
    KT = TN // TNS
    LF = F if has_lin else 0                  # linear block width
    DF = 2 * F if has_dev else 0              # dev block width (d1 | d2)
    PF = 2 * n_cmp * F                        # per-slot cmp block width
    tile_win = window_mode == "tile"

    def win_copy(j, buf, rows_n, starts_ref):
        start = pl.multiple_of(starts_ref[j], 8)
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(start, rows_n), :], c_win.at[buf],
            dma_sem.at[buf],
        )

    if tile_win:
        # ONE [TWL, K*F] coefficient-window DMA per grid step; sub-tiles
        # slice their narrow TWS windows out of VMEM (same rationale as
        # the forward kernels' tile mode)
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
    bdot = lambda m, x: jnp.dot(m, x, preferred_element_type=jnp.float32)

    def split2_dot(mat_bf16, cols):
        ch = cols.astype(jnp.bfloat16)
        cl = (cols - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        return bdot(mat_bf16, ch) + bdot(mat_bf16, cl)

    def sub_tile(k, carry):
        j = i * KT + k
        if tile_win:
            woff = pl.multiple_of(sws_ref[j] - tsw_ref[i], 8)
            cw = c_win[buf_t, pl.ds(woff, TWS), :]           # [TWS, K*F]
        else:
            buf = jax.lax.rem(j, 2)
            win_copy(j, buf, TWS, sws_ref).wait()

            @pl.when(j + 1 < nt * KT)
            def _():
                win_copy(j + 1, jax.lax.rem(j + 1, 2), TWS, sws_ref).start()

            cw = c_win[buf]                                  # [TWS, K*F]
        rows = pl.multiple_of(k * TNS, 8)
        ids = ids_ref[pl.ds(pl.multiple_of(k * W * TNS, 8), W * TNS), :]
        ohb = ids == lane                                    # [W*TNS, TWS]

        acc = jnp.zeros((TNS, F), jnp.float32)

        if has_lin or has_dev:
            # count matrix: one-hots summed over slots before the matmul —
            # the W-independent SpMM form (counts are small ints, exact in
            # both bf16 and f32)
            ohf = ohb.astype(jnp.float32)
            a_cnt = (
                sum(ohf[w * TNS : (w + 1) * TNS] for w in range(W))
                if W > 1
                else ohf[:TNS]
            )                                                # [TNS, TWS]

        vc = None
        if needs_v:
            v_sub = v_ref[pl.ds(rows, TNS), :]
            # the forward's message table held transform(v); compare /
            # subtract in that domain (module docstring)
            if fwd_gather_mode == "highest":
                vc = v_sub
            elif fwd_gather_mode == "bf16":
                vc = v_sub.astype(jnp.bfloat16).astype(jnp.float32)
            elif fwd_gather_mode == "split2":
                vh = v_sub.astype(jnp.bfloat16)
                vl = (v_sub - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                vc = vh.astype(jnp.float32) + vl.astype(jnp.float32)
            else:
                raise ValueError(f"unknown gather_mode {fwd_gather_mode!r}")

        if has_lin:
            # hi/lo coefficient passes reconstruct the f32 sum to ~1e-7
            acc = acc + split2_dot(a_cnt.astype(jnp.bfloat16), cw[:, :LF])

        if has_dev:
            # exact gather-sums (module docstring: deg-1 cancellation)
            D = jnp.dot(
                a_cnt, cw[:, LF : LF + DF],
                preferred_element_type=jnp.float32, precision=_HI,
            )                                                # [TNS, 2F]
            acc = acc + vc * D[:, :F] - D[:, F:]

        if n_cmp:
            # per-slot gather of (ref, coef) pairs; refs are s-domain so
            # the split2 re-gather is bit-exact (idempotency)
            if fwd_gather_mode == "highest":
                G = jnp.dot(
                    ohb.astype(jnp.float32), cw[:, LF + DF :],
                    preferred_element_type=jnp.float32, precision=_HI,
                )
            else:
                G = split2_dot(ohb.astype(jnp.bfloat16), cw[:, LF + DF :])
            for w in range(W):
                g = G[w * TNS : (w + 1) * TNS, :]            # [TNS, PF/W…]
                for c in range(n_cmp):
                    ref = g[:, 2 * c * F : (2 * c + 1) * F]
                    coef = g[:, (2 * c + 1) * F : (2 * c + 2) * F]
                    # pad slots: g row is all-zero -> coef = 0 -> term 0
                    acc = acc + jnp.where(vc == ref, coef, 0.0)

        out_ref[pl.ds(rows, TNS), :] = acc
        return carry

    jax.lax.fori_loop(0, KT, sub_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "has_lin", "has_dev", "n_cmp", "fwd_gather_mode",
        "tile_rows", "window_slack", "interpret", "window_mode",
    ),
)
def fused_gather_backward(
    cstk: jax.Array,                  # [N, K*F] stacked coefficients
    nbr_nodes: jax.Array,             # [N, W] neighbor table (usually reverse)
    in_degree: jax.Array,             # [N] valid-slot count for that table
    v: Optional[jax.Array] = None,    # [N, F] local rows (dev/cmp terms)
    has_lin: bool = True,
    has_dev: bool = False,
    n_cmp: int = 0,
    fwd_gather_mode: str = "split2",
    tile_rows: int = 512,
    window_slack: int = 64,
    interpret: bool = False,
    window_mode: str = "sub",
):
    """Accumulate gathered coefficient terms over each row's table slots.

    See the module docstring for the term semantics.  ``cstk`` column
    layout (each block F wide): ``[c_lin? | d1, d2? |
    (ref_1, coef_1) .. (ref_C, coef_C)]``.  Returns [N, F] f32.
    """
    N = cstk.shape[0]
    K = (1 if has_lin else 0) + 2 * int(has_dev) + 2 * n_cmp
    if K == 0:
        raise ValueError("no terms requested")
    F = cstk.shape[1] // K
    if cstk.shape[1] != K * F:
        raise ValueError(f"cstk width {cstk.shape[1]} not divisible into "
                         f"{K} blocks")
    needs_v = has_dev or n_cmp > 0
    if needs_v and v is None:
        raise ValueError("dev/cmp terms need the local rows `v`")
    W = nbr_nodes.shape[1]
    TN = tile_rows
    SL = window_slack
    if not supports(N, TN, SL) and not interpret:
        raise ValueError(f"fused_gather_backward preconditions failed: N={N}")

    TNS, TWS, sws = _schedule(N, TN, SL)
    window_mode = _norm_window_mode(window_mode, TN, TNS, SL)
    if window_mode == "tile":
        TWL, tsws = _tile_schedule(N, TN, SL)
    else:
        TWL, tsws = TWS, np.zeros(1, np.int32)
    ids_stack = _stack_ids(nbr_nodes, in_degree, sws, TNS)

    kern = functools.partial(
        _kernel, W=W, TNS=TNS, TWS=TWS, TWL=TWL, window_mode=window_mode,
        F=F, has_lin=has_lin,
        has_dev=has_dev, n_cmp=n_cmp, fwd_gather_mode=fwd_gather_mode,
    )

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # cstk (windowed, manual DMA)
        blk((W * TN, 1)),                    # stacked localized ids
    ]
    inputs = [jnp.asarray(sws), jnp.asarray(tsws), cstk, ids_stack]
    if needs_v:
        in_specs.append(blk((TN, F)))
        inputs.append(v)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max(N // TN, 1),),
        in_specs=in_specs,
        out_specs=blk((TN, F)),
        scratch_shapes=[
            pltpu.VMEM((2, TWL, K * F), cstk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops = N * TWS * 2 * (
        (F if has_lin else 0) + (2 * F if has_dev else 0)
        + W * 2 * n_cmp * F
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N * (K + 2) * F) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
