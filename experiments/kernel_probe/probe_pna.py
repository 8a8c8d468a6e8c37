"""Standalone fused-PNA kernel variant prober (one variant per run).
Usage: python probe_pna.py <variant>
Variants: plain | bf | agg_plain | agg_bf | agg_maskoh_bf | agg_amat_bf
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops.pallas.ell_agg import _window_starts

variant = sys.argv[1]
graphs, batches = canonical_batches("qm9", n_graphs=2048, batch_size=1024, node_multiple=256)
b = batches[0]
N = b.num_nodes; W = b.nbr_nodes.shape[1]
F = 128
TN = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SL = 32; TW = TN + 2*SL
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
w_i = jnp.asarray(rng.standard_normal((F, F))*0.05, jnp.float32)
w_j = jnp.asarray(rng.standard_normal((F, F))*0.05, jnp.float32)
ks = jnp.asarray(rng.standard_normal((4*F, 3*F))*0.05, jnp.float32)
k0 = jnp.asarray(rng.standard_normal((F, F))*0.05, jnp.float32)
w_lin = jnp.asarray(rng.standard_normal((F, F))*0.05, jnp.float32)

BIG = 3e38

def dot_bf(a, bb):
    return jnp.dot(a.astype(jnp.bfloat16), bb.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

def kern(ws_ref, x_hbm, x_ref, nbr_ref, deg_ref, wi_ref, wj_ref, ks_ref,
         k0_ref, wl_ref, out_ref, x_win, dma_sem):
    i = pl.program_id(0)
    start = pl.multiple_of(ws_ref[i], 8)
    copy = pltpu.make_async_copy(x_hbm.at[pl.ds(start, TW), :], x_win, dma_sem)
    copy.start()
    xt = x_ref[:]; deg = deg_ref[:]
    dot = dot_bf if "bf" in variant else (
        lambda a, bb: jnp.dot(a, bb, preferred_element_type=jnp.float32))
    u = dot(xt, wi_ref[:])
    copy.wait()
    vwin = dot(x_win[:], wj_ref[:])
    ids_local = nbr_ref[:] - start
    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, TW), 1)
    neg = jnp.full((TN, F), -BIG, jnp.float32)
    zero = jnp.zeros((TN, F), jnp.float32)
    s_acc, sq_acc, mx, mn = zero, zero, neg, -neg
    if "agg" in variant:
        v_hi = vwin.astype(jnp.bfloat16)
        v_lo = (vwin - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        slotv = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1) < deg  # [TN,W]
        if "amat" in variant:
            A = jnp.zeros((TN, TW), jnp.float32)
        for w in range(W):
            if "maskoh" in variant or "amat" in variant:
                oh_b = (ids_local[:, w][:, None] == lane) & slotv[:, w][:, None]
                oh = oh_b.astype(jnp.bfloat16)
            else:
                oh = (ids_local[:, w][:, None] == lane).astype(jnp.bfloat16)
            if "amat" in variant:
                A = A + oh_b.astype(jnp.float32)
            g = jnp.dot(oh, v_hi, preferred_element_type=jnp.float32) + \
                jnp.dot(oh, v_lo, preferred_element_type=jnp.float32)
            if "maskoh" in variant or "amat" in variant:
                if "amat" not in variant:
                    s_acc = s_acc + g
                    sq_acc = sq_acc + g*g
                bias = jnp.where(slotv[:, w][:, None], 0.0, -BIG)  # [TN,1]
                mx = jnp.maximum(mx, g + bias)
                mn = jnp.minimum(mn, g - bias)
            else:
                valid = w < deg
                s_acc = s_acc + jnp.where(valid, g, 0.0)
                sq_acc = sq_acc + jnp.where(valid, g*g, 0.0)
                mx = jnp.maximum(mx, jnp.where(valid, g, -BIG))
                mn = jnp.minimum(mn, jnp.where(valid, g, BIG))
        if "amat" in variant:
            A_bf = A.astype(jnp.bfloat16)  # counts <=W, exact in bf16
            s_acc = (jnp.dot(A_bf, v_hi, preferred_element_type=jnp.float32)
                     + jnp.dot(A_bf, v_lo, preferred_element_type=jnp.float32))
            sq = vwin * vwin
            sq_hi = sq.astype(jnp.bfloat16)
            sq_lo = (sq - sq_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            sq_acc = (jnp.dot(A_bf, sq_hi, preferred_element_type=jnp.float32)
                      + jnp.dot(A_bf, sq_lo, preferred_element_type=jnp.float32))
    degf = deg.astype(jnp.float32)
    denom = jnp.maximum(degf, 1.0)
    nonempty = deg > 0
    mean_g = s_acc/denom
    var = jnp.maximum(sq_acc/denom - mean_g*mean_g, 0.0)
    std = jnp.sqrt(var + 1e-5)
    mean = jnp.where(nonempty, u + mean_g, 0.0)
    mxx = jnp.where(nonempty, u + mx, 0.0)
    mnn = jnp.where(nonempty, u + mn, 0.0)
    agg_cat = jnp.concatenate([mxx, mnn, mean, std], -1)
    y = dot(agg_cat, ks_ref[:])
    log_deg = jnp.log(denom + 1.0)
    mid = (dot(xt, k0_ref[:])
           + y[:, :F] + (log_deg/2.5)*y[:, F:2*F] + (2.5/log_deg)*y[:, 2*F:])
    out_ref[:] = dot(mid, wl_ref[:])

ws = jnp.asarray(_window_starts(N, TN, TW, SL))
deg2d = b.in_degree.astype(jnp.int32).reshape(N, 1)
def blk(shape): return pl.BlockSpec(shape, lambda i, s: (i, 0), memory_space=pltpu.VMEM)
def rep(shape): return pl.BlockSpec(shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(N // TN,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk((TN, F)), blk((TN, W)),
              blk((TN, 1))] + (
        [pl.BlockSpec(memory_space=pltpu.VMEM)]*5 if "wres" in variant else
        [rep((F, F)), rep((F, F)), rep((4*F, 3*F)), rep((F, F)), rep((F, F))]),
    out_specs=blk((TN, F)),
    scratch_shapes=[pltpu.VMEM((TW, F), jnp.float32), pltpu.SemaphoreType.DMA],
)
@jax.jit
def f(xx):
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
                          )(ws, xx, xx, b.nbr_nodes, deg2d, w_i, w_j, ks, k0, w_lin)

t0 = time.time()
f(x)
print(f"compile {time.time()-t0:.1f}s", flush=True)
dt = marginal_time(f, x, n_lo=10, n_hi=40, repeats=5)
print(f"{variant:16s}: {dt*1e6:8.1f} us")
