"""Kernel dispatch policy: when to run the fused Pallas path.

The compile layer's analog of the reference's per-layer template dispatch
(``call_gnn_conv`` macro, templates/model.cpp.jinja:25-148): every
aggregation has an XLA implementation (ops/ell.py, ops/segment.py) and a
fused Pallas implementation (ops/pallas/); this module decides, per batch,
which one runs — based on backend, batch geometry, and the kernel's static
preconditions.  The decision is trace-time static (shapes + metadata only).

Modes (set_fused_mode):
* "auto"   — fused kernel on TPU whenever preconditions hold (default)
* "never"  — XLA ops only
* "always" — fused kernel wherever preconditions hold, interpret-mode off
             TPU (used by tests to exercise the kernel on CPU)
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from gnnbuilder_tpu.ops.pallas.ell_agg import supports

__all__ = [
    "set_fused_mode",
    "set_kernel_overrides",
    "get_fused_mode",
    "fused_config",
    "readout_config",
    "no_fused",
    "inference_mode",
    "inference_on",
    "pna_stack_cfg",
]

_MODE = "auto"
# Staged rollout for kernels without an on-hardware verification artifact.
# The round-3 artifact results_tpu/fused_parity_tpu_r2.json (all_pass:
# true, 12 checks incl. fused readout, fused GINE, int8-vs-XLA-int8 at
# tol 0.02, window-tile, GAT head padding, fused-halo) verified the
# previously-staged kernels, so they now default INTO "auto";
# GNNB_STAGED_OK=0 force-stages them back out, and newly-written kernels
# declare staged=True at their call site until their artifact lands.
_STAGED_OK = os.environ.get("GNNB_STAGED_OK", "1") == "1"
_TILE_ROWS: Optional[int] = None   # explicit node-tile height (DSE-tunable)
_GATHER_MODE: Optional[str] = None  # explicit gather precision (DSE-tunable)
_SUB_ROWS: Optional[int] = None    # gather sub-tile height (DSE-tunable)
# block-diagonal matmul aggregation (ops/block.py) policy for block-packed
# batches: None = auto (use it and prefer it over the windowed fused
# kernels — the bin-packed adjacency turns the SpMM into batched MXU
# matmuls, measured faster than the gather realization), "off" = never,
# "fused" = windowed fused kernels keep precedence (A/B handle), or an
# explicit mm string ("split2"/"bf16"/"highest") to pin the precision
_BLOCK: Optional[str] = os.environ.get("GNNB_BLOCK_MODE") or None
if _BLOCK not in (None, "off", "fused", "split2", "bf16", "highest"):
    raise ValueError(f"bad GNNB_BLOCK_MODE {_BLOCK!r}")
# "sub" | "tile" DMA granularity override (None = the policy default,
# "tile" — see _window_mode_policy); GNNB_WINDOW_MODE overrides without
# a source edit.
_WINDOW_MODE: Optional[str] = (
    os.environ.get("GNNB_WINDOW_MODE") or None
)
if _WINDOW_MODE not in (None, "sub", "tile"):
    raise ValueError(
        f"GNNB_WINDOW_MODE must be 'sub' or 'tile', got {_WINDOW_MODE!r}"
    )
_SINGLE_TILE_MAX = 1024   # below this, one tile covers the whole batch

import contextlib as _contextlib
import contextvars as _contextvars

# pallas_call has no GSPMD partitioning rule: sharded computations
# (parallel/train.py) disable fused dispatch for their trace via this
# context rather than silently all-gathering global arrays per chip
_SUPPRESSED: _contextvars.ContextVar = _contextvars.ContextVar(
    "gnnb_fused_suppressed", default=False
)


@_contextlib.contextmanager
def no_fused():
    tok = _SUPPRESSED.set(True)
    try:
        yield
    finally:
        _SUPPRESSED.reset(tok)


# inference scope: whole-STACK kernels (ops/pallas/pna_block.py) replace
# the per-layer kernels only here — their backward is an XLA-reference
# recompute, so training paths must keep the per-layer fused VJP kernels.
# Program forward/benchmark/serving enter this scope; train steps do not.
_INFERENCE: _contextvars.ContextVar = _contextvars.ContextVar(
    "gnnb_inference", default=False
)


@_contextlib.contextmanager
def inference_mode():
    tok = _INFERENCE.set(True)
    try:
        yield
    finally:
        _INFERENCE.reset(tok)


def inference_on() -> bool:
    return _INFERENCE.get()


def set_fused_mode(mode: str, tile_rows: Optional[int] = None) -> None:
    global _MODE, _TILE_ROWS
    if mode not in ("auto", "never", "always"):
        raise ValueError(f"unknown fused mode {mode!r}")
    _MODE = mode
    if tile_rows is not None:
        _TILE_ROWS = tile_rows


_KEEP = object()  # sentinel: "leave this knob untouched"


def set_kernel_overrides(
    tile_rows=_KEEP, gather_mode=_KEEP, ell_width=_KEEP, sub_rows=_KEEP,
    window_mode=_KEEP, block_mode=_KEEP,
) -> None:
    """Pin the fused kernels' tuning knobs — the DSE autotuner's handle on
    the p_in/p_out analog (tile height), the gather precision, and the
    batch ELL layout.  Explicit ``None`` restores a knob's automatic
    policy; an OMITTED knob is left untouched (so the tuner can set
    tile_rows without silently clearing a pinned gather_mode).

    ``ell_width`` is a packing-time layout knob (core/graph.py): it sets
    the process-wide default used by ``build_graph_batch(ell_width=None)``
    and therefore only affects batches packed AFTER the call."""
    global _TILE_ROWS, _GATHER_MODE, _SUB_ROWS, _WINDOW_MODE, _BLOCK
    if block_mode is not _KEEP:
        if block_mode not in (None, "off", "fused", "split2", "bf16",
                              "highest"):
            raise ValueError(f"unknown block_mode {block_mode!r}")
        _BLOCK = block_mode
    if tile_rows is not _KEEP:
        _TILE_ROWS = tile_rows
    if gather_mode is not _KEEP:
        _GATHER_MODE = gather_mode
    if sub_rows is not _KEEP:
        _SUB_ROWS = sub_rows
    if window_mode is not _KEEP:
        if window_mode not in (None, "sub", "tile"):
            raise ValueError(f"unknown window_mode {window_mode!r}")
        _WINDOW_MODE = window_mode
    if ell_width is not _KEEP:
        from gnnbuilder_tpu.core import graph

        graph.set_default_ell_width(ell_width)


def get_fused_mode() -> str:
    return _MODE


def staged_ok() -> bool:
    """Whether staged (not-yet-hardware-verified) kernels may join the
    default policy; "always" mode bypasses (see _STAGED_OK)."""
    return _STAGED_OK or _MODE == "always"


def block_cfg(g) -> Optional[dict]:
    """{"mm": precision} when the block-diagonal matmul aggregation
    (ops/block.py) should run for this batch, else None.

    Applies only to block-packed batches (core/graph.py block_size=...).
    Pure-XLA batched einsum: works on every backend, under GSPMD sharding
    (block rows co-shard with node rows), and through jax.grad — so unlike
    fused_config there is no backend / suppression / halo-local gating
    except the explicit-halo path, whose per-shard windows do not reshape
    to [T, B, F].  ``set_fused_mode("never")`` pins the reference (flat /
    ELL) paths and disables this too."""
    if _MODE == "never" or _BLOCK == "off":
        return None
    if getattr(g, "block_adj", None) is None:
        return None
    from gnnbuilder_tpu.parallel.halo import active_halo

    if active_halo() is not None:
        return None
    if _BLOCK in ("split2", "bf16", "highest"):
        return {"mm": _BLOCK}
    from gnnbuilder_tpu.compile.precision import active_precision

    prec = active_precision()
    if prec is not None and prec.name == "bf16":
        return {"mm": "bf16"}
    # near-f32 two-pass split on the MXU; exact f32 einsum elsewhere
    on_tpu = jax.default_backend() == "tpu"
    return {"mm": "split2" if on_tpu else "highest"}


def block_preferred(g) -> bool:
    """Whether the block path outranks the windowed fused layer kernels
    for this batch ("fused" reverses precedence for A/B measurement)."""
    return block_cfg(g) is not None and _BLOCK != "fused"


# round-3 staged gate: the block-matmul fused layer kernel
# (ops/pallas/mp_layer._block_kernel).  Hardware-verified by
# results_tpu/block_verify_r3.json (all_pass: kernel fwd gin/gcn/sage,
# grad parity, train-step loss), so it defaults INTO "auto";
# GNNB_STAGED_R3=0 stages it back out.
_STAGED_R3 = os.environ.get("GNNB_STAGED_R3", "1") == "1"


def staged_r3_ok() -> bool:
    return _STAGED_R3 or _MODE == "always"


# convs whose epilogue is elementwise-only: for them the Pallas block
# kernel wins (fusing the scale/bias pass saves an [N,F] HBM round trip —
# gcn 714 -> 579us, block_model_ab.json).  Convs whose epilogue is
# matmuls (gin/sage) measured FASTER on the XLA einsum block path (XLA
# fuses the aggregation einsum into the epilogue dots better than the
# hand kernel's per-tile schedule: gin 427 vs 746us) — they get None here
# and take ops/block.py.
_BLOCK_KERNEL_CONVS = ("gcn", "lg", "simple")


def block_layer_cfg(g, int8_ok: bool = False,
                    conv: Optional[str] = None) -> Optional[dict]:
    """Kernel kwargs for the block-matmul fused layer
    (fused_mp_layer block mode) when it applies, else None — callers then
    fall back to the XLA block einsum path (ops/block.py), NOT to the
    windowed kernels (block packing already outranks those)."""
    bc = block_cfg(g)
    if bc is None or _BLOCK == "fused" or _SUPPRESSED.get():
        return None
    if conv is not None and conv not in _BLOCK_KERNEL_CONVS:
        return None
    if not staged_r3_ok():
        return None
    on_tpu = jax.default_backend() == "tpu"
    if _MODE == "auto" and not on_tpu:
        return None
    from gnnbuilder_tpu.compile.precision import active_precision

    prec = active_precision()
    int8_on = prec is not None and prec.name == "int8"
    if int8_on and not (int8_ok and staged_ok()):
        return None
    from gnnbuilder_tpu.ops.pallas.mp_layer import block_tile_rows

    BB = g.block_size_static
    tn = block_tile_rows(g.num_nodes, BB, cap=_TILE_ROWS or 1024)
    if tn is None or tn < 4 * BB:
        # a prime-ish block count forces tiny grid tiles (one block per
        # launch step) — the per-step overhead then loses to the XLA
        # einsum path (gcn/qm9 b256 grid regression, round 3); require
        # >= 4 blocks per tile, else fall back to ops/block.py
        return None
    interpret = not on_tpu
    out = dict(
        tile_rows=tn,
        gather_mode=bc["mm"],
        mm="f32" if interpret else "bf16",
        interpret=interpret,
    )
    if int8_on:
        out["int8"] = True
    return out


# round-4 staged gate: the block-local fused PNA STACK kernel
# (ops/pallas/pna_block.py — the whole conv stack in one kernel, hidden
# state VMEM-resident).  Staged until its on-chip verification artifact
# lands (tpu_verify_r4.py), then the default flips with the artifact
# commit (CLAUDE.md staged-rollout convention).
_STAGED_R4 = os.environ.get("GNNB_STAGED_R4", "1") == "1"


def staged_r4_ok() -> bool:
    return _STAGED_R4 or _MODE == "always"


# Round-4b whole-stack kernel for the mp family (ops/pallas/mp_block.py).
# Chip-verified + A/B'd within-run (results_tpu/mp_stack_ab.json,
# all_pass): gcn 1.28x, sage 2.52x over the per-layer policy -> enabled;
# gin 0.99x (the XLA per-layer einsum already fuses GIN's epilogue MLP
# into the aggregation as well as the stack does) -> stays per-layer.
# GNNB_STAGED_R4B=0 stages the stack back out.
_STAGED_R4B = os.environ.get("GNNB_STAGED_R4B", "1") == "1"
_MP_STACK_CONVS = ("gcn", "sage")


def staged_r4b_ok() -> bool:
    return _STAGED_R4B or _MODE == "always"


def mp_stack_cfg(g, conv: str, n_layers: int = 1) -> Optional[dict]:
    """Kernel kwargs for the whole-stack block-local mp kernel
    (ops/pallas/mp_block.py) when it applies, else None (the model falls
    back to the per-layer conv loop).  Same gate as the PNA stack
    (block-packed batch + inference scope) plus the round-4b staged flag
    and the per-conv A/B policy above; the int8 policy rides the
    kernel's quant epilogue (round 5) rather than falling back."""
    if conv not in (
        _MP_STACK_CONVS if _MODE != "always" else ("gcn", "gin", "sage")
    ):
        return None
    if not staged_r4b_ok():
        return None
    cfg = _r4_block_cfg(g, int8_ok=True)
    if cfg is None:
        return None
    prec_name = cfg.pop("_prec")
    cfg["gather_mode"] = _GATHER_MODE or (
        "bf16" if prec_name == "bf16" else "split2"
    )
    if cfg.pop("_int8", False):
        cfg["quant"] = True
    return cfg


# Round-5 staged gate: the PNA stack kernel's v4 schedule (statically
# unrolled block loop + hoisted one-hot + bf16 agg scratch) at tile cap
# 640.  Within-run chip A/B over 3 interleaved passes
# (results_tpu/stack_v4c_ab.json): split2 854 -> 669 us (1.28x), bf16
# 655 us; tr1024 under v4+split2 blows the 16 MB scoped-VMEM stack, so
# the cap drops to 640 (KB=5 unroll).  Chip parity artifact:
# results_tpu/r5_verify.json.  GNNB_STAGED_R5=0 stages it back out.
_STAGED_R5 = os.environ.get("GNNB_STAGED_R5", "1") == "1"


def staged_r5_ok() -> bool:
    return _STAGED_R5 or _MODE == "always"


def pna_stack_cfg(g, n_layers: int = 1) -> Optional[dict]:
    """Kernel kwargs for the whole-stack block-local PNA kernel
    (ops/pallas/pna_block.py) when it applies, else None (the model falls
    back to the per-layer conv loop).

    Preconditions: block-packed batch (neighbor ids block-local — the
    gather window IS the 128-row block), inference scope (the stack
    kernel's backward is an XLA recompute; training keeps the per-layer
    fused VJP kernels), no halo/suppression, f32/bf16 policy (int8
    epilogues not implemented in the stack kernel)."""
    if g.nbr_nodes is None:
        return None
    cfg = _r4_block_cfg(g, int8_ok=True)
    if cfg is None:
        return None
    prec_name = cfg.pop("_prec")
    cfg["gather_mode"] = _GATHER_MODE or (
        "bf16" if prec_name == "bf16" else "split2"
    )
    if cfg.pop("_int8", False):
        cfg["quant"] = True
    if staged_r5_ok():
        from gnnbuilder_tpu.ops.pallas.mp_layer import block_tile_rows

        tn = block_tile_rows(
            g.num_nodes, g.block_size_static, cap=_TILE_ROWS or 640
        )
        if tn is not None:
            cfg["tile_rows"] = tn
            cfg["sched"] = "v4"
    return cfg


def _r4_block_cfg(g, int8_ok: bool = False) -> Optional[dict]:
    """Shared gate for the round-4 block-local inference kernels
    (pna_block / gat_block / edge_block): block-packed batch + inference
    scope (their backwards are XLA recomputes; training keeps the
    per-layer fused VJP kernels), staged rollout, f32/bf16 policy, no
    halo/suppression.  ``int8_ok`` callers (the mp stack, whose kernel
    carries the int8 serving epilogue since round 5) get the config with
    a ``_int8`` marker instead of a rejection — except under an active
    calibration scope, where XLA owns the site state."""
    if _MODE == "never" or _SUPPRESSED.get() or _BLOCK == "off":
        return None
    if not staged_r4_ok():
        return None
    if not inference_on() and _MODE != "always":
        return None
    if getattr(g, "block_adj", None) is None:
        return None
    BB = g.block_size_static
    if BB % 128 != 0:
        return None
    from gnnbuilder_tpu.parallel.halo import active_halo

    if active_halo() is not None:
        return None
    from gnnbuilder_tpu.compile.precision import active_precision

    prec = active_precision()
    int8_on = prec is not None and prec.name == "int8"
    if int8_on:
        if not (int8_ok and staged_r5_ok()):
            return None
        from gnnbuilder_tpu.ops.quant import active_calibration

        if active_calibration() is not None:
            return None
    on_tpu = jax.default_backend() == "tpu"
    if _MODE == "auto" and not on_tpu:
        return None
    from gnnbuilder_tpu.ops.pallas.mp_layer import block_tile_rows

    tn = block_tile_rows(g.num_nodes, BB, cap=_TILE_ROWS or 1024)
    if tn is None:
        return None
    out = dict(
        tile_rows=tn,
        block_size=BB,
        mm="bf16" if on_tpu else "f32",
        interpret=not on_tpu,
        _prec=prec.name if prec is not None else None,
    )
    if int8_on:
        out["_int8"] = True
    return out


def gat_block_cfg(g) -> Optional[dict]:
    """Kernel kwargs for the fused block-dense GAT attention kernel
    (ops/pallas/gat_block.py) when it applies, else None (GATConv keeps
    the windowed fused kernel / XLA paths)."""
    cfg = _r4_block_cfg(g)
    if cfg is not None:
        cfg.pop("_prec")
    return cfg


def edge_block_cfg(g) -> Optional[dict]:
    """Kernel kwargs for the fused block-local EdgeConv layer
    (ops/pallas/edge_block.py) when it applies, else None (EdgeConv keeps
    the ELL/flat XLA paths).  gather_mode follows the precision policy
    (bf16 one-pass under the bf16 policy, exact split2 otherwise)."""
    if g.nbr_nodes is None:
        return None
    cfg = _r4_block_cfg(g)
    if cfg is None:
        return None
    prec = cfg.pop("_prec")
    cfg["gather_mode"] = _GATHER_MODE or (
        "bf16" if prec == "bf16" else "split2"
    )
    return cfg


from gnnbuilder_tpu.core.graph import _round_up


def fused_config(
    g,
    feature_dim: Optional[int] = None,
    kind: str = "agg",
    halo_local_rows: Optional[int] = None,
    int8_ok: bool = False,
    staged: bool = False,
) -> Optional[dict]:
    """Return kernel kwargs {tile_rows, window_slack, interpret, ...} if the
    fused path applies to this batch, else None (callers fall back to XLA).

    ``kind`` selects the target kernel family:
      * "agg" — the multi-aggregate kernel (ops/pallas/ell_agg.py)
      * "layer" — the whole-layer kernels (ops/pallas/pna_layer.py,
        ops/pallas/mp_layer.py): prefer LARGE grid tiles (512/1024,
        sub-tiled gather inside) and add the epilogue-matmul precision
        ("mm"): one-pass bf16 on TPU — the same numeric contract as XLA's
        default f32 matmul lowering — f32 in interpret mode so CPU parity
        tests stay exact.

    Under an active halo scope (tracing inside shard_map on edge-
    partitioned rows), whole-batch geometry is meaningless: layer-kind
    callers must pass their LOCAL row count (``halo_local_rows``) and wrap
    the kernel call in parallel/halo.halo_wrap_layer; every other caller
    gets None (the agg kernels have no per-shard adaptation).
    """
    if _MODE == "never" or g.nbr_nodes is None or _SUPPRESSED.get():
        return None
    # staged rollout: a call site whose kernel is not yet hardware-verified
    # declares staged=True and this single gate keeps it out of "auto"
    # until the verification artifact lands (see staged_ok / CLAUDE.md)
    if staged and not staged_ok():
        return None
    from gnnbuilder_tpu.parallel.halo import active_halo, halo_pad_rows

    halo_on = active_halo() is not None
    if halo_on and (kind != "layer" or halo_local_rows is None):
        return None
    from gnnbuilder_tpu.compile.precision import active_precision

    prec = active_precision()
    int8_layer = prec is not None and prec.name == "int8" and kind == "layer"
    if int8_layer and not staged_ok():
        int8_ok = False  # quant epilogues are staged kernels
    if int8_layer and not int8_ok:
        # layer kernels embed dense matmuls that the int8 policy must
        # quantize (ops/quant.py); a conv opts in with int8_ok when its
        # kernel honors the policy (matmul-free epilogues, or the quant
        # epilogue — the returned cfg carries int8=True so the caller
        # selects it).  The aggregation-only kernel is numerics-neutral
        # under int8 and keeps the serving path fused either way.
        return None
    # bf16 precision: single-pass bf16 one-hot gather matches the policy's
    # numeric contract (split2 is the f32 default; pna_layer honors this);
    # an explicit DSE override wins
    gather_mode = _GATHER_MODE or (
        "bf16" if prec is not None and prec.name == "bf16" else None
    )
    on_tpu = jax.default_backend() == "tpu"
    if _MODE == "auto" and not on_tpu:
        return None
    interpret = not on_tpu
    # Mosaic DMA slices need lane (feature) alignment; unaligned layers
    # (e.g. a raw 11-dim molecular input layer) use the XLA path
    if not interpret and feature_dim is not None and feature_dim % 128 != 0:
        return None

    N = g.num_nodes
    maxg = getattr(g, "max_graph_nodes_static", 0)
    if maxg <= 0:
        return None
    if halo_on:
        # per-shard extended-array geometry: pad with the SCOPE's halo
        # width (what halo_wrap_layer actually constructs — it may be set
        # wider than maxg by the caller); the gather slack below still
        # comes from maxg, which bounds id reach inside the window
        N = halo_pad_rows(halo_local_rows, active_halo()[1])

    def cfg(tile_rows, slack):
        out = dict(
            tile_rows=tile_rows, window_slack=slack, interpret=interpret
        )
        if gather_mode is not None:
            out["gather_mode"] = gather_mode
        if kind == "layer":
            out["mm"] = "bf16" if on_tpu else "f32"
            if _SUB_ROWS is not None and slack:
                out["sub_rows"] = _SUB_ROWS
            if slack:
                # policy default "tile" since round 3: the inner-chain
                # A/B (results_tpu/pna_sched_ab.json — the ~0.1ms host-
                # issue floor fitted out, tile < sub in BOTH passes,
                # ~116 vs ~169 us/layer on the fused PNA layer) reversed
                # round-2's single-call conclusion, which measured the
                # issue floor (results_tpu/dispatch_floor.json), not the
                # kernel.  Numerics identical (pure DMA schedule).
                out["window_mode"] = _WINDOW_MODE or "tile"
            if int8_layer:
                out["int8"] = True
        return out

    slack = _round_up(maxg, 8)

    if kind == "layer":
        from gnnbuilder_tpu.ops.pallas.pna_layer import (
            supports as pna_supports,
        )

        # small batch: sub-tiled single grid tile when graphs fit the
        # slack windows, else whole-array window (slack 0 disables
        # sub-tiling — see pna_layer._sub_rows)
        if N <= _SINGLE_TILE_MAX and N % 8 == 0:
            if (
                pna_supports(N, N, slack, _SUB_ROWS)
                and _sub_tile(N, slack) >= 2 * slack
            ):
                return cfg(N, slack)
            return cfg(N, 0)
        # measured preference on v5e under the round-3 "tile" window
        # default: 256 beats 512/1024 at BOTH packings (results_tpu/
        # pna_tune.json: nm256 tr256-tile 133.7us vs tr512 n/a; nm1024
        # tr256-tile 139.5us vs tr512-tile 580us — wider tiles widen the
        # per-step window DMA more than they amortize).  The round-2
        # 512-first order measured under "sub" windows; an explicit
        # set_kernel_overrides tile is tried first either way.
        tiles = ([_TILE_ROWS] if _TILE_ROWS else []) + [256, 512, 1024, 128]
        for tn in tiles:
            if (
                pna_supports(N, tn, slack, _SUB_ROWS)
                and _sub_tile(tn, slack) >= 2 * slack
            ):
                return cfg(tn, slack)
        return None

    # single tile: the window is the whole array, any graph layout is valid
    if N <= _SINGLE_TILE_MAX and N % 8 == 0 and _agg_vmem_ok(
        N, N, feature_dim
    ):
        return cfg(N, 0)

    # tiled: graphs are contiguous, so rows [t*TN,(t+1)*TN) only reference
    # ids within +-maxg of the tile bounds
    for tn in ([_TILE_ROWS] if _TILE_ROWS else []) + [256, 128, 512]:
        if (supports(N, tn, slack) and tn >= 2 * slack
                and _agg_vmem_ok(tn, tn + 2 * slack, feature_dim)):
            return cfg(tn, slack)
    return None


def readout_config(g, aggrs=None, act=None, out_act=None) -> Optional[dict]:
    """Kernel kwargs for the fused readout (pooling + MLP head,
    ops/pallas/readout.py) if it applies to this batch, else None.

    Falls back under: halo scope (pooling psums across shards), int8
    (MLP Linears quantize), no graph-contiguity metadata, batches too
    small for the graph-tile window (N < TG*maxg+8 at every tile size),
    an activation outside the kernel's fused set, or a pooling mix with
    no add/mean aggregator (the banded SpMM would be dead work — max
    pooling is computed in XLA and streamed in)."""
    if _MODE == "never" or _SUPPRESSED.get():
        return None
    if aggrs is not None and not ({"add", "mean"} & set(aggrs)):
        return None
    from gnnbuilder_tpu.ops.pallas.readout import _ACTS, _OUT_ACTS

    if act not in _ACTS or out_act not in _OUT_ACTS:
        return None
    from gnnbuilder_tpu.compile.precision import active_precision
    from gnnbuilder_tpu.parallel.halo import active_halo

    if active_halo() is not None:
        return None
    prec = active_precision()
    int8 = prec is not None and prec.name == "int8"
    if int8:
        from gnnbuilder_tpu.ops.quant import active_calibration

        if active_calibration() is not None:
            return None  # static-calib / recording: XLA owns site state
    on_tpu = jax.default_backend() == "tpu"
    if _MODE == "auto" and (not on_tpu or not staged_ok()):
        return None
    maxg = getattr(g, "max_graph_nodes_static", 0)
    if maxg <= 0 or g.n_node is None:
        return None
    blk = getattr(g, "block_size_static", 0)
    if blk and getattr(g, "graph_starts", None) is None:
        return None  # block spans need the per-graph row starts
    from gnnbuilder_tpu.ops.pallas.readout import readout_supported

    for tg in (32, 16, 8):
        if readout_supported(g.num_nodes, g.num_graphs, maxg, tg, blk):
            out = dict(
                tile_graphs=tg, interpret=not on_tpu,
                mm="bf16" if on_tpu else "f32",
            )
            if blk:
                out["block_size"] = blk
            if int8:
                out["int8"] = True
            return out
    return None


# VMEM budget for the multi-aggregate kernel's per-tile working set; the
# hardware limit is 16 MB and Mosaic needs headroom for double buffering.
_AGG_VMEM_BUDGET = 10 * 1024 * 1024


def _agg_vmem_ok(tn: int, tw: int, feature_dim: Optional[int]) -> bool:
    """Reject tile shapes whose fused-aggregate working set would blow the
    VMEM scoped allocation (seen at N=TW=1024, F=256: a 35 MB stack).
    Estimate: one-hot [TN, TW] f32 per unrolled slot + 4 aggregator
    accumulators and the output concat (A<=4) + the gather window."""
    f = feature_dim if feature_dim else 128
    est = 4 * tn * tw + 36 * tn * f + 4 * tw * f
    return est <= _AGG_VMEM_BUDGET


def _sub_tile(tn: int, slack: int) -> int:
    from gnnbuilder_tpu.ops.pallas.pna_layer import _sub_rows

    return _sub_rows(tn, slack, _SUB_ROWS)
