"""Block-local fused conv STACK kernel for the mp family (gcn/gin/sage).

The round-4 PNA stack kernel (pna_block.py) proved the structure: block
bin-packing makes multi-layer fusion halo-free, so the ENTIRE conv stack
runs per tile with the hidden state resident in VMEM — the per-layer
[N, F] HBM round trips between layers disappear.  The simpler convs are
MORE memory-bound than PNA (1-2 dots per layer vs 6), so the round-trip
elimination is worth relatively more.

Per tile (TN = KB*128 rows), per layer l (static unroll):

    gcn   p = (h @ W[l]) * dis;  s = A @ p;   o = dis*(s + p) + b[l]
          (dis = rsqrt(deg+1) — PyG renormalized self-loop; identical to
          the per-layer windowed/block formulation in mp_layer.py)
    gin   s = A @ h;  o = W1[l] @ relu(W0[l] @ ((1+eps_l) h + s) + b0) + b1
    sage  s = A @ h;  o = (s/max(deg,1)) @ W0[l] + b0[l] + h @ W1[l]

    o += h_in (skip, pre-activation);  h = act(o)

Aggregation is KB dense [BB, BB] @ [BB, F] MXU matmuls straight from the
shipped block adjacency (split2 hi/lo keeps f32-exact sums — adjacency
counts are exact in bf16).  Backward: jax.vjp over the XLA reference
chain (inference/serving path; training keeps the per-layer fused VJP
kernels — dispatch.inference_mode gates this out there).

Reference equivalents: gcn_conv / gin_conv / sage_conv HLS regions
(gnn_builder_lib.h:1213-1387, :1389-1549, :2159-2341) iterated by the
model container (models.py:551-566) — unfusable across layers there
because each HLS stage owns static buffers.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnbuilder_tpu.ops.pallas.mp_layer import _qdot
from gnnbuilder_tpu.ops.pallas.pna_layer import (
    _ACTS,
    _dot_mm,
    _HI,
    _pad_cols,
    _pad_rows,
    _rup,
)

__all__ = [
    "mp_block_stack",
    "mp_block_stack_vjp",
    "mp_block_stack_auto",
    "mp_stack_reference",
    "MP_STACK_CONVS",
]

MP_STACK_CONVS = ("gcn", "gin", "sage")


def _agg_block(adj, v, gather_mode):
    """[BB, BB] @ [BB, F] exact block aggregation (same numerics contract
    as mp_layer._block_kernel)."""
    if gather_mode == "highest":
        return jnp.dot(adj.astype(jnp.float32), v,
                       preferred_element_type=jnp.float32, precision=_HI)
    bdot = lambda m, x: jnp.dot(m, x, preferred_element_type=jnp.float32)
    vh = v.astype(jnp.bfloat16)
    if gather_mode == "split2":
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return bdot(adj, vh) + bdot(adj, vl)
    return bdot(adj, vh)  # bf16 single pass


def _kernel(
    x_ref,       # [TN, F] VMEM — layer-0 h
    adj_ref,     # [TN, BB] bf16 — block adjacency rows ([T,BB,BB]->[N,BB])
    deg_ref,     # [TN, 1] int32
    w0_ref,      # [L, F, F] (int8 when quant)
    b0_ref,      # [L, 1, F]
    w1_ref,      # [L, F, F] (int8 when quant)
    b1_ref,      # [L, 1, F]
    sw0_ref,     # [L, 1, F] f32 per-channel weight scales (quant) / dummy
    sw1_ref,     # [L, 1, F] f32 (quant) / dummy
    out_ref,     # [TN, F]
    h_scr,       # [TN, F] f32 — VMEM-resident hidden state
    s_scr,       # [TN, F] f32 — aggregation target
    t_scr,       # [TN, F] f32 — per-layer transformed values (gcn p)
    *,
    conv: str,
    L: int,
    BB: int,
    epss: tuple,
    skips: tuple,
    act: Optional[str],
    gather_mode: str,
    mm: str,
    quant: bool = False,
):
    TN = x_ref.shape[0]
    KB = TN // BB
    _dot = _dot_mm(mm)
    # int8 serving epilogue: the in-kernel mirror of ops/quant.int8_matmul
    # (mp_layer._qdot) — aggregation stays exact (adjacency matmul, the
    # XLA int8 policy also leaves it unquantized); only the Linear dots
    # quantize, reproducing the XLA policy's numerics
    d0 = (lambda h, l: _qdot(h, w0_ref[l], sw0_ref[l])) if quant else (
        lambda h, l: _dot(h, w0_ref[l]))
    d1 = (lambda h, l: _qdot(h, w1_ref[l], sw1_ref[l])) if quant else (
        lambda h, l: _dot(h, w1_ref[l]))
    degf = deg_ref[:].astype(jnp.float32)
    if conv == "gcn":
        dis = jax.lax.rsqrt(degf + 1.0)          # [TN, 1], +1 self loop
    denom = jnp.maximum(degf, 1.0)

    h_scr[:] = x_ref[:].astype(jnp.float32)

    for l in range(L):
        # aggregation source: gcn aggregates the transformed+scaled p,
        # gin/sage aggregate h directly
        if conv == "gcn":
            t_scr[:] = d0(h_scr[:], l) * dis
            src = t_scr
        else:
            src = h_scr
        for k in range(KB):  # static unroll: KB <= 8 by dispatch policy
            rows = pl.multiple_of(k * BB, 8)
            a = adj_ref[pl.ds(rows, BB), :]                  # [BB, BB]
            s_scr[pl.ds(rows, BB), :] = _agg_block(
                a, src[pl.ds(rows, BB), :], gather_mode
            )
        if conv == "gcn":
            o = dis * (s_scr[:] + t_scr[:]) + b0_ref[l]
        elif conv == "gin":
            hh = (1.0 + epss[l]) * h_scr[:] + s_scr[:]
            o = d1(jax.nn.relu(d0(hh, l) + b0_ref[l]), l) + b1_ref[l]
        else:  # sage
            mean = s_scr[:] / denom
            o = d0(mean, l) + b0_ref[l] + d1(h_scr[:], l)
        if skips[l]:
            o = o + h_scr[:]
        h_scr[:] = _ACTS[act](o)

    out_ref[:] = h_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "conv", "epss", "skips", "act", "block_size", "tile_rows",
        "interpret", "gather_mode", "mm", "quant",
    ),
)
def mp_block_stack(
    x,            # [N, F] (F 128-aligned; N a multiple of tile_rows)
    block_adj,    # [N/BB, BB, BB] dense block adjacency (GraphBatch)
    in_degree,    # [N] int32
    w0, b0, w1, b1,   # [L, F, F] / [L, 1, F] stacked padded operands
    conv: str,
    epss: tuple,
    skips: tuple,
    act: Optional[str] = None,
    block_size: int = 128,
    tile_rows: int = 1024,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    quant: bool = False,    # int8 serving epilogue (ops/quant formulas)
):
    from gnnbuilder_tpu.ops.pallas.pna_block import block_stack_supported

    N, F = x.shape
    L = w0.shape[0]
    BB = block_size
    TN = tile_rows
    if conv not in MP_STACK_CONVS:
        raise ValueError(f"unsupported stack conv {conv!r}")
    if not block_stack_supported(N, BB, TN, F, F) and not interpret:
        raise ValueError(
            f"mp block stack preconditions failed: N={N} TN={TN} BB={BB}"
        )
    if act not in _ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")
    assert len(epss) == L and len(skips) == L

    adj2d = block_adj.reshape(N, BB).astype(jnp.bfloat16)
    deg2d = in_degree.astype(jnp.int32).reshape(N, 1)
    wdt = jnp.bfloat16 if mm == "bf16" and gather_mode != "highest" else (
        jnp.float32
    )
    if quant:
        from gnnbuilder_tpu.ops.quant import quantize_weight

        q0s, s0s, q1s, s1s = [], [], [], []
        for l in range(L):
            q, sc = quantize_weight(w0[l])
            q0s.append(q), s0s.append(sc.reshape(1, -1))
            q, sc = quantize_weight(w1[l])
            q1s.append(q), s1s.append(sc.reshape(1, -1))
        w0_in = jnp.stack(q0s)
        w1_in = jnp.stack(q1s)
        sw0 = jnp.stack(s0s)
        sw1 = jnp.stack(s1s)
    else:
        w0_in, w1_in = w0.astype(wdt), w1.astype(wdt)
        sw0 = sw1 = jnp.zeros((L, 1, F), jnp.float32)

    kern = functools.partial(
        _kernel, conv=conv, L=L, BB=BB,
        epss=tuple(float(e) for e in epss), skips=tuple(skips), act=act,
        gather_mode=gather_mode, mm=mm, quant=quant,
    )

    def blk(shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(max(N // TN, 1),),
        in_specs=[
            blk((TN, F)), blk((TN, BB)), blk((TN, 1)),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=blk((TN, F)),
        scratch_shapes=[
            pltpu.VMEM((TN, F), jnp.float32),
            pltpu.VMEM((TN, F), jnp.float32),
            pltpu.VMEM((TN, F), jnp.float32),
        ],
    )
    npass = 2 if gather_mode == "split2" else 1
    ndots = {"gcn": 1, "gin": 2, "sage": 2}[conv]
    per_node = ndots * F * F + npass * BB * F
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=N * L * per_node * 2,
            bytes_accessed=N * (2 * F + BB) * 4,
            transcendentals=N * L,
        ),
        interpret=interpret,
    )(x, adj2d, deg2d, w0_in, b0, w1_in, b1, sw0, sw1)


def mp_stack_reference(x, block_adj, in_degree, conv, layers, epss, skips,
                       act=None):
    """XLA golden chain — the exact per-layer math of nn/conv.py's
    block-aggregation fallback paths, iterated (models.py:551-566)."""
    BB = block_adj.shape[1]
    N = x.shape[0]
    degf = in_degree.astype(jnp.float32)[:, None]
    h = x.astype(jnp.float32)
    adj = block_adj.astype(jnp.float32).reshape(N, BB)

    def agg(v):
        vb = v.reshape(N // BB, BB, -1)
        ab = adj.reshape(N // BB, BB, BB)
        return jnp.einsum("tij,tjf->tif", ab, vb).reshape(N, -1)

    for (w0, b0, w1, b1), eps, sk in zip(layers, epss, skips):
        if conv == "gcn":
            dis = jax.lax.rsqrt(degf + 1.0)
            p = (h @ w0) * dis
            o = dis * (agg(p) + p) + b0
        elif conv == "gin":
            hh = (1.0 + eps) * h + agg(h)
            o = jax.nn.relu(hh @ w0 + b0) @ w1 + b1
        else:
            mean = agg(h) / jnp.maximum(degf, 1.0)
            o = mean @ w0 + b0 + h @ w1
        if sk:
            o = o + h
        h = _ACTS[act](o)
    return h


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(conv, epss, skips, act, block_size, tile_rows, interpret,
                 gather_mode, mm, quant=False):
    @jax.custom_vjp
    def f(x, adj, deg, w0, b0, w1, b1):
        return mp_block_stack(
            x, adj, deg, w0, b0, w1, b1, conv=conv, epss=epss, skips=skips,
            act=act, block_size=block_size, tile_rows=tile_rows,
            interpret=interpret, gather_mode=gather_mode, mm=mm,
            quant=quant,
        )

    def fwd(x, adj, deg, w0, b0, w1, b1):
        return f(x, adj, deg, w0, b0, w1, b1), (x, adj, deg, w0, b0, w1, b1)

    def bwd(res, ct):
        # CPU-parity / test-only escape hatch: recomputes through
        # mp_stack_reference at XLA default matmul precision, which on TPU
        # is one-pass bf16 — NOT the forward kernel's gather_mode/mm
        # policy.  dispatch gates this stack to inference_mode (training
        # uses the per-layer fused VJP kernels), so on-chip gradients
        # never flow through here; if that gate is ever lifted, thread
        # the forward's precision policy into the reference chain first.
        x, adj, deg, w0, b0, w1, b1 = res

        def ref(xx, _w0, _b0, _w1, _b1):
            L = _w0.shape[0]
            layers = [(_w0[i], _b0[i][0], _w1[i], _b1[i][0])
                      for i in range(L)]
            return mp_stack_reference(xx, adj, deg, conv, layers, epss,
                                      skips, act=act)

        _, vjp = jax.vjp(ref, x, w0, b0, w1, b1)
        dx, dw0, db0, dw1, db1 = vjp(ct)
        zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return (dx, jnp.zeros(adj.shape, adj.dtype), zero_i(deg),
                dw0, db0.reshape(b0.shape), dw1, db1.reshape(b1.shape))

    f.defvjp(fwd, bwd)
    return f


def mp_block_stack_vjp(x, block_adj, in_degree, w0, b0, w1, b1, conv, epss,
                       skips, act, block_size, tile_rows, interpret,
                       gather_mode, mm, quant=False):
    fn = _make_vjp_fn(conv, tuple(float(e) for e in epss),
                      tuple(bool(s) for s in skips), act, block_size,
                      tile_rows, interpret, gather_mode, mm, quant=quant)
    return fn(x, block_adj, in_degree.astype(jnp.int32), w0, b0, w1, b1)


def mp_block_stack_auto(
    x,               # [N, Fin] — any feature width (zero-padded to lanes)
    block_adj,
    in_degree,
    conv: str,
    layers: Sequence,   # [(w0, b0, w1, b1)] per layer, None entries = zeros
    epss: Sequence[float],
    skips: Sequence[bool],
    act: Optional[str] = None,
    out_dim: Optional[int] = None,
    block_size: int = 128,
    tile_rows: int = 1024,
    interpret: bool = False,
    gather_mode: str = "split2",
    mm: str = "f32",
    quant: bool = False,
):
    """Whole-stack fused mp conv on a block-packed batch with automatic
    feature padding; returns [N, out_dim].  Pad lanes are inert: padded
    weight ROWS are zero, so pad lanes of h contribute nothing to real
    lanes (same argument as pna_block._stack_params; under ``quant`` the
    zero pad rows/channels quantize to zero ints with tiny scales, still
    inert)."""
    dims = [x.shape[1]]
    for w0, b0, w1, b1 in layers:
        dims += [a.shape[1] for a in (w0, w1) if a is not None]
    F_p = max(_rup(d) for d in dims)

    def padw(w):
        if w is None:
            return jnp.zeros((F_p, F_p), jnp.float32)
        return _pad_cols(_pad_rows(w, F_p), F_p)

    def padb(b):
        if b is None:
            return jnp.zeros((1, F_p), jnp.float32)
        return jnp.pad(b, (0, F_p - b.shape[0])).reshape(1, -1)

    w0 = jnp.stack([padw(l[0]) for l in layers])
    b0 = jnp.stack([padb(l[1]) for l in layers])
    w1 = jnp.stack([padw(l[2]) for l in layers])
    b1 = jnp.stack([padb(l[3]) for l in layers])
    xp = _pad_cols(x, F_p)
    out = mp_block_stack_vjp(
        xp, block_adj, in_degree, w0, b0, w1, b1, conv, tuple(epss),
        tuple(skips), act, block_size, tile_rows, interpret, gather_mode,
        mm, quant=quant,
    )
    if out_dim is None:
        last = layers[-1]
        out_dim = (last[2] if conv == "gin" else last[0]).shape[1]
    return out[:, :out_dim]
