"""Probe: block-diagonal dense SpMM as the new aggregation mechanism.

Round-2 verdict: the windowed one-hot-gather count-SpMM sits at 6.6% of
its memory roofline (results_tpu/spmm_roofline.json) and the per-sub-tile
DMA-hoist attack (window_mode=tile) measured slower.  This probes a
fundamentally different mechanism: molecular graphs are tiny (QM9 max 29
nodes), so bin-pack whole graphs into 128-node blocks (no graph crosses a
block) and the batch adjacency becomes BLOCK-DIAGONAL dense —
``A [T, 128, 128]`` — turning the SpMM into one MXU-native batched
matmul ``einsum('tij,tjf->tif', A, v)`` with no gather, no window DMA,
no Pallas, and XLA-native autodiff (the transpose is the same matmul).

Cost: node-count padding waste from bin-packing (reported) plus A traffic
(bf16 counts are exact for small integer multiplicities).

Measures (chained protocol, x = f(x)):
  * count-SpMM via batched einsum, bf16 / f32-HIGHEST / split2 variants
  * the 2-RHS variant A @ [v, v^2] that carries PNA's sum+mean+std
  * dense masked per-block max (VPU broadcast-compare) as a max/min
    candidate
against the same roofline accounting as experiments/spmm_roofline.py.

Writes results_tpu/block_spmm_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pack_blocks(graphs, block=128):
    """Order-preserving greedy bin-pack: graph -> (block id, row offset).
    Returns per-graph row starts and the padded node count."""
    starts, cur_block, cur_fill = [], 0, 0
    for g in graphs:
        n = g.num_nodes
        assert n <= block, (n, block)
        if cur_fill + n > block:
            cur_block += 1
            cur_fill = 0
        starts.append(cur_block * block + cur_fill)
        cur_fill += n
    n_pad = (cur_block + 1) * block
    return starts, n_pad


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnnbuilder_tpu.bench.roofline import chip_peaks, roofline_report
    from gnnbuilder_tpu.bench.timing import chained_marginal_time
    from gnnbuilder_tpu.data.datasets import load_dataset

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"

    B = 128
    F = 128
    graphs = load_dataset("qm9", n=1024)
    starts, n_pad = pack_blocks(graphs, B)
    T = n_pad // B
    real_nodes = sum(g.num_nodes for g in graphs)
    real_edges = sum(g.num_edges for g in graphs)
    waste = 1 - real_nodes / n_pad
    log(f"T={T} N={n_pad} real_nodes={real_nodes} waste={waste:.1%} "
        f"edges={real_edges}")

    # block adjacency counts: A[t, i, j] = # edges j->i inside block t
    A = np.zeros((T, B, B), np.float32)
    for g, s in zip(graphs, starts):
        t, off = divmod(s, B)
        src, dst = g.edge_index
        np.add.at(A[t], (dst + off, src + off), 1.0)
    deg = A.sum(axis=2).reshape(-1)  # in-degree, sanity
    assert int(deg.sum()) == real_edges

    peak_flops, peak_bw = chip_peaks()
    key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (n_pad, F), jnp.float32)
    A_f32 = jnp.asarray(A)
    A_bf16 = jnp.asarray(A, jnp.bfloat16)
    rs = jnp.asarray(1.0 / np.sqrt(1.0 + np.maximum(deg, 0)), jnp.float32)

    results = {"meta": {
        "T": T, "B": B, "N": n_pad, "F": F, "edges": real_edges,
        "node_waste": waste, "protocol": "chained",
    }}

    # traffic floor: v read + out write + A read once
    def bytes_with_A(a_bytes_per_el):
        return n_pad * F * 4 * 2 + T * B * B * a_bytes_per_el

    def run(name, f, flops, min_bytes):
        fj = jax.jit(f)
        x = fj(v0)
        x.block_until_ready()
        dt = chained_marginal_time(fj, x, n_lo=10, n_hi=60, repeats=5)
        rep = roofline_report(dt, flops=flops, min_bytes=min_bytes,
                              num_edges=real_edges)
        log(f"{name}: {dt*1e6:.1f} us, "
            f"{rep['fraction_of_roofline']*100:.0f}% of {rep['bound']} "
            f"roofline, {rep['edges_per_s']/1e6:,.0f}M edges/s")
        results[name] = {
            "latency_us": dt * 1e6,
            **{k: rep[k] for k in (
                "fraction_of_roofline", "bound", "edges_per_s",
                "roofline_edges_per_s")},
        }

    # --- count-SpMM, one-pass bf16 (the serving-precision contract):
    # epilogue rsqrt scale keeps shapes chainable and mirrors gcn
    def spmm_bf16(x):
        vb = x.reshape(T, B, F).astype(jnp.bfloat16)
        out = jnp.einsum("tij,tjf->tif", A_bf16, vb,
                         preferred_element_type=jnp.float32)
        return out.reshape(n_pad, F) * rs[:, None] + x * rs[:, None]

    run("spmm_bf16", spmm_bf16,
        flops=T * B * B * F * 2, min_bytes=bytes_with_A(2))

    # --- f32 HIGHEST (exact-parity mode)
    def spmm_hi(x):
        vb = x.reshape(T, B, F)
        out = jnp.einsum("tij,tjf->tif", A_f32, vb,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(n_pad, F) * rs[:, None] + x * rs[:, None]

    run("spmm_f32_highest", spmm_hi,
        flops=T * B * B * F * 2 * 6, min_bytes=bytes_with_A(4))

    # --- split2 (hi/lo bf16 decomposition of v; counts are exact bf16)
    def spmm_split2(x):
        vb = x.reshape(T, B, F)
        hi = vb.astype(jnp.bfloat16)
        lo = (vb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        o = jnp.einsum("tij,tjf->tif", A_bf16, hi,
                       preferred_element_type=jnp.float32)
        o = o + jnp.einsum("tij,tjf->tif", A_bf16, lo,
                           preferred_element_type=jnp.float32)
        return o.reshape(n_pad, F) * rs[:, None] + x * rs[:, None]

    run("spmm_split2", spmm_split2,
        flops=T * B * B * F * 2 * 2, min_bytes=bytes_with_A(2))

    # --- PNA linear trio in one matmul: A @ [v, v^2] -> sum, mean, std
    def spmm_pna_lin(x):
        vb = x.reshape(T, B, F).astype(jnp.bfloat16)
        rhs = jnp.concatenate([vb, vb * vb], axis=-1)
        o = jnp.einsum("tij,tjf->tif", A_bf16, rhs,
                       preferred_element_type=jnp.float32)
        o = o.reshape(n_pad, 2 * F)
        s, s2 = o[:, :F], o[:, F:]
        d = jnp.maximum(deg_dev, 1.0)
        mean = s / d[:, None]
        var = jnp.maximum(s2 / d[:, None] - mean * mean, 0.0)
        std = jnp.sqrt(var + 1e-5)
        # fold back to [N, F] so calls chain
        return (s * rs[:, None] + mean + std) / 3.0

    deg_dev = jnp.asarray(deg, jnp.float32)
    run("spmm_pna_linear3", spmm_pna_lin,
        flops=T * B * B * 2 * F * 2, min_bytes=bytes_with_A(2))

    # --- dense masked max per block (max/min candidate): out[i] =
    # max_j A[ij]>0 ? v[j] : -inf  via [T,B,B,1]*[T,1,B,F] broadcast —
    # VPU-bound O(B^2 F) per block; measures whether brute force flies
    mask = jnp.asarray(A > 0)

    def block_max(x):
        vb = x.reshape(T, B, F)
        big = jnp.where(mask[..., None], vb[:, None, :, :], -jnp.inf)
        o = jnp.max(big, axis=2).reshape(n_pad, F)
        return jnp.where(jnp.isfinite(o), o, 0.0) + x * 0.5

    run("block_max_dense", block_max,
        flops=T * B * B * F, min_bytes=bytes_with_A(1))

    out_path = os.path.join(ROOT, "results_tpu", "block_spmm_probe.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print(json.dumps({"ok": True, "on_tpu": on_tpu,
                      "bf16_us": results["spmm_bf16"]["latency_us"],
                      "frac": results["spmm_bf16"][
                          "fraction_of_roofline"]}))


if __name__ == "__main__":
    main()
