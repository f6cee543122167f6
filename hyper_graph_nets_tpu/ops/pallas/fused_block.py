"""Fused Pallas MP-block kernel: gather -> edge MLP -> LayerNorm -> pna.

The per-op decomposition of the train step (tools/perf_probe_block.py,
BENCHMARKS.md) shows the matmul floor is ~23 ms of the ~101 ms step; the
rest is LayerNorms (+17), sender/receiver gathers (+31) and the pna
aggregation (+31) — each a bandwidth/latency-bound XLA op chain between
HBM round trips.  This kernel fuses the entire edge half of a message-
passing block (reference src/migration/graphnet.py:22-64) into one VMEM-
resident pass:

    h   = e @ We + SP[snd] + RP[rcv] + b1        (banded one-hot gathers)
    e2  = e + LN(relu(relu(h) @ W2 + b2) @ W3 + b3)
    agg = pna(e2 -> nodes)                        (segmented scans + select)

TPU-first mechanics:

- **Banded gathers.** Edges are receiver-sorted (core/mesh.py:53) and mesh
  node numberings are banded (grid meshes natively; general meshes via
  ``ops.reorder.rcm_order``), so each 512-edge chunk's senders/receivers
  fall in a narrow node window.  The gather is then a one-hot matmul
  ``[T, W] @ [W, L]`` on the MXU — exact at DEFAULT precision (one-hot x
  bf16), no per-element addressing, no scatter in the backward.
- **Window starts** are host-precomputed per chunk (``build_band_plan``)
  and read from SMEM; window loads are dynamic *sublane* slices (aligned
  to 16 on the host), which Mosaic supports — dynamic lane indexing is
  avoided throughout via BlockSpec row/column blocks.
- **Aggregation** reuses the segmented-scan + last-edge-selection design
  of ops/pallas/segment_pna (same receiver-sorted contiguity argument),
  accumulated across chunks into a VMEM-resident ``[N, 4L]`` f32 block
  that is written back to HBM once per batch element.
- **LayerNorm** runs on the VPU with f32 statistics between the chunk's
  matmuls — no separate HBM round trip, no f32 stream blow-up.

The backward is a second hand-written kernel (same banded structure,
transposed one-hots built from the row layout) that recomputes the chunk
activations from VMEM-resident inputs (remat) and emits the edge/node
cotangents plus activation streams from which XLA computes the weight
gradients as large dense matmuls.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

T_DEFAULT = 512
_BIG = 1e30


def default_chunk() -> int:
    """Edge-chunk size for band plans: 512 when the scoped-VMEM limit
    allows it, else 256.

    Measured (TPU v5e, flag 15MP B=21): chunk 512 runs the step ~5% faster
    than 256 (fewer serialized grid steps), but its backward kernel needs
    ~17.5 MB of scoped VMEM — over the default 16 MB compiler limit.  Launch
    with ``LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768`` (bench.py
    sets this) to enable the larger chunk; chunk 1024 measures slower again
    (window width, and with it one-hot gather FLOPs, grows with the chunk).

    libtpu reads the env var ONCE at backend initialization: set it at
    process start (before importing/initializing jax) as bench.py and
    launch/tpu_train.sh do.  Setting it after the backend is up leaves the
    real limit at 16 MB while this probe sees 32 MB, and the 512-chunk
    backward then fails to compile (Mosaic scoped-VMEM error) — if that
    happens, unset the var or pass ``chunk=256`` explicitly.
    """
    import os
    import re

    m = re.search(
        r"xla_tpu_scoped_vmem_limit_kib=(\d+)",
        os.environ.get("LIBTPU_INIT_ARGS", ""),
    )
    if m and int(m.group(1)) >= 32768:
        return 512
    return 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BandPlan(NamedTuple):
    """Static banded-window plan for one receiver-sorted edge set.

    All static dimensions are encoded in array shapes so the plan can ride
    the Graph pytree (zero-size ``*_tag`` arrays carry W / WR / scan_steps).
    """

    w_s: Array  # [SB, C] int32: per-SUBCHUNK sender-window start (16-aligned).
    #   SB sender subwindows per chunk (T/SB edges each): the sender gather
    #   one-hot matmul FLOPs are 2*T*W*L regardless of SB, so SB is chosen
    #   (``_best_sb``) as the smallest split that minimizes W — on banded
    #   meshes a 512-edge chunk needs W=256 while its 128-edge quarters each
    #   fit W=128, halving the dominant gather FLOPs.
    r_lo: Array  # [1, C] int32: per-chunk receiver-window start (8-aligned)
    snd_col: Array  # [C, T, 1] int32: SUBWINDOW-local sender ids (sentinel W)
    rcv_col: Array  # [C, T, 1] int32: window-local receiver ids (sentinel WR)
    snd_row: Array  # [C, SB, Ts] int32: SUBWINDOW-local sender ids, row
    #   layout (bwd one-hots); subchunk j is sublane row j (lane slicing
    #   at subchunk offsets is avoided — Mosaic handles sublane slices)
    rcv_row: Array  # [C, 1, T] int32: receiver ids, row layout
    m_col: Array  # [C, T, 1] f32: edge validity mask
    w_tag: Array  # [W, 0] uint8 (shape-only)
    wr_tag: Array  # [WR, 0] uint8 (shape-only)
    s_tag: Array  # [scan_steps, 0] uint8 (shape-only)
    nr_tag: Array  # [max window end, 0] uint8 (shape-only; see plan_node_rows)
    # overlapped halo exchange (ops/pallas/fused_overlap): per-row-band ring
    # start schedule, [1, NB] int32, IDENTICAL on every shard (host max of
    # per-shard band completion chunks).  None on single-device plans.
    ov_sched: Optional[Array] = None

    @property
    def T(self) -> int:
        return self.snd_col.shape[1]

    @property
    def C(self) -> int:
        return self.snd_col.shape[0]

    @property
    def W(self) -> int:
        return self.w_tag.shape[0]

    @property
    def WR(self) -> int:
        return self.wr_tag.shape[0]

    @property
    def scan_steps(self) -> int:
        return self.s_tag.shape[0]

    @property
    def SB(self) -> int:
        return self.w_s.shape[0]


def _sb_candidates(chunk: int) -> Tuple[int, ...]:
    """Sender-subwindow split candidates: T/SB must stay a multiple of 128
    (sublane-dim cleanliness for the [T/SB, W] one-hots)."""
    return tuple(sb for sb in (1, 2, 4, 8) if chunk % sb == 0
                 and (chunk // sb) % 128 == 0)


def _sender_W(snd, rcv, ev, chunk: int, sb: int) -> int:
    """Max 16-aligned sender-window width at subchunk granularity T/sb."""
    ts = chunk // sb
    return max(
        (w for *_, w, _ in _chunk_windows(snd, rcv, ev, ts)), default=128
    )


def _best_sb(snd, rcv, ev, chunk: int) -> int:
    """Smallest subwindow split minimizing the sender window W.

    Gather FLOPs are 2*T*W*L independent of SB, so only a strictly
    smaller W justifies splitting."""
    best_sb, best_w = 1, None
    for sb in _sb_candidates(chunk):
        w = _sender_W(snd, rcv, ev, chunk, sb)
        if best_w is None or w < best_w:
            best_sb, best_w = sb, w
    return best_sb


def _chunk_windows(snd, rcv, ev, chunk):
    """Per-chunk aligned window starts/widths of a receiver-sorted edge
    list: yields (chunk_index, slice, ws, rl, w_need, wr_need); skips
    all-padding chunks."""
    E = snd.shape[0]
    for c in range(max(_round_up(E, chunk) // chunk, 1)):
        sl = slice(c * chunk, min((c + 1) * chunk, ev))
        if sl.start >= ev:
            continue
        cs, cr = snd[sl], rcv[sl]
        ws = (int(cs.min()) // 16) * 16
        rl = (int(cr.min()) // 8) * 8
        w_need = _round_up(int(cs.max()) - ws + 1, 128)
        wr_need = _round_up(int(cr.max()) - rl + 1, 128)
        yield c, sl, ws, rl, w_need, wr_need


def plan_dims(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_valid: Optional[int] = None,
    chunk: Optional[int] = None,
    sb: Optional[int] = None,
) -> Optional[dict]:
    """Numpy-only static dims a :func:`build_band_plan` call would get.

    Returns ``{"chunk", "sb", "W", "WR", "steps", "nr"}`` (no device
    arrays are built), or None when the receivers are unsorted.  Window
    padding is irrelevant to the dims: only valid edges enter the
    per-chunk window computation, so dims computed on an unpadded edge
    list match the padded build.
    """
    snd = np.asarray(senders, np.int64)
    rcv = np.asarray(receivers, np.int64)
    ev = snd.shape[0] if num_valid is None else int(num_valid)
    if ev and np.any(np.diff(rcv[:ev]) < 0):
        return None
    chunk = default_chunk() if chunk is None else chunk
    if sb is None:
        sb = _best_sb(snd, rcv, ev, chunk)
    W = _sender_W(snd, rcv, ev, chunk, sb)
    WR, seg_max = 128, 1
    ws_max = rl_max = 0
    for _, sl, ws, rl, w_need, wr_need in _chunk_windows(snd, rcv, ev, chunk):
        WR = max(WR, wr_need)
        rl_max = max(rl_max, rl)
        cr = rcv[sl]
        runs = np.diff(np.flatnonzero(np.r_[True, np.diff(cr) != 0, True]))
        seg_max = max(seg_max, int(runs.max()))
    ts = chunk // sb
    for _, _, ws, _, _, _ in _chunk_windows(snd, rcv, ev, ts):
        ws_max = max(ws_max, ws)
    steps = 0
    while (1 << steps) < min(seg_max, chunk):
        steps += 1
    nr = max(ws_max + W, rl_max + WR)
    return {"chunk": chunk, "sb": sb, "W": W, "WR": WR, "steps": steps,
            "nr": nr}


def check_banded(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_valid: Optional[int] = None,
    chunk: Optional[int] = None,
    max_window: int = 2048,
) -> bool:
    """Cheap numpy-only probe of the band-plan criterion.

    Matches :func:`build_band_plan`'s acceptance (receiver windows at
    chunk granularity, sender windows at the auto-picked subchunk
    granularity) without building any plan arrays — use this to decide
    whether a mesh needs RCM reordering (training/simulator._maybe_reorder).
    """
    d = plan_dims(senders, receivers, num_valid=num_valid, chunk=chunk)
    return d is not None and d["W"] <= max_window and d["WR"] <= max_window


def build_band_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_valid: Optional[int] = None,
    chunk: int = T_DEFAULT,
    max_window: int = 2048,
    force_dims: Optional[Tuple[int, ...]] = None,
    sb: Optional[int] = None,
) -> BandPlan:
    """Host: static banded-window plan for a receiver-sorted edge set.

    ``num_valid``: count of real (unmasked) edges; the tail is padding.
    Raises ``ValueError`` when any chunk's sender/receiver span exceeds
    ``max_window`` (caller falls back to the unfused path; apply
    ``ops.reorder.rcm_order`` first for general meshes).

    ``force_dims`` = (W, WR, scan_steps, nr[, sb]) lower-bounds the static
    dimensions — used to build per-shard plans with identical shapes so
    they stack across an edge-sharded mesh (build_sharded_band_plans) and
    to keep plan shapes stable across reclusters (rmp).

    ``sb``: sender subwindows per chunk (default: auto via ``_best_sb``).
    """
    snd = np.asarray(senders, np.int64)
    rcv = np.asarray(receivers, np.int64)
    E = snd.shape[0]
    ev = E if num_valid is None else int(num_valid)
    if ev and np.any(np.diff(rcv[:ev]) < 0):
        raise ValueError("receivers are not sorted; band plan needs sorting")
    C = max(_round_up(E, chunk) // chunk, 1)
    E_pad = C * chunk
    mask = np.zeros(E_pad, np.float32)
    mask[:ev] = 1.0

    if force_dims is not None and len(force_dims) >= 5:
        sb = int(force_dims[4])
    if sb is None:
        sb = _best_sb(snd, rcv, ev, chunk)
    if chunk % sb:
        raise ValueError(f"sb={sb} does not divide chunk={chunk}")
    ts = chunk // sb

    r_lo = np.zeros(C, np.int32)
    rcv_loc = np.zeros(E_pad, np.int32)
    WR = 128
    seg_max = 1
    for c, sl, ws, rl, w_need, wr_need in _chunk_windows(snd, rcv, ev, chunk):
        if wr_need > max_window:
            raise ValueError(
                f"chunk {c}: receiver window {wr_need} exceeds "
                f"max_window={max_window}; reorder the mesh (rcm_order)"
            )
        cr = rcv[sl]
        WR = max(WR, wr_need)
        r_lo[c] = rl
        rcv_loc[sl] = cr - rl
        runs = np.diff(np.flatnonzero(np.r_[True, np.diff(cr) != 0, True]))
        seg_max = max(seg_max, int(runs.max()))

    # sender subwindows at granularity ts = chunk/sb
    w_s = np.zeros(C * sb, np.int32)
    snd_loc = np.zeros(E_pad, np.int32)
    W = 128
    for c, sl, ws, rl, w_need, wr_need in _chunk_windows(snd, rcv, ev, ts):
        if w_need > max_window:
            raise ValueError(
                f"subchunk {c}: sender window {w_need} exceeds "
                f"max_window={max_window}; reorder the mesh (rcm_order)"
            )
        cs = snd[sl]
        W = max(W, w_need)
        w_s[c] = ws
        snd_loc[sl] = cs - ws

    steps = 0
    while (1 << steps) < min(seg_max, chunk):
        steps += 1
    nr_need = max(int(w_s.max()) + W, int(r_lo.max()) + WR)
    if force_dims is not None:
        fw, fwr, fsteps, fnr = force_dims[:4]
        W, WR = max(W, fw), max(WR, fwr)
        steps, nr_need = max(steps, fsteps), max(nr_need, fnr)
    # sentinels: padded edges select no window row and no agg row
    snd_loc[mask == 0] = W
    rcv_loc[mask == 0] = WR
    return BandPlan(
        # [C*sb] global subchunk order -> [SB, C] so ws_ref[j, c] is
        # subchunk j of chunk c
        w_s=jnp.asarray(w_s.reshape(C, sb).T.copy()),
        r_lo=jnp.asarray(r_lo).reshape(1, C),
        snd_col=jnp.asarray(snd_loc.reshape(C, chunk, 1)),
        rcv_col=jnp.asarray(rcv_loc.reshape(C, chunk, 1)),
        snd_row=jnp.asarray(snd_loc.reshape(C, sb, ts)),
        rcv_row=jnp.asarray(rcv_loc.reshape(C, 1, chunk)),
        m_col=jnp.asarray(mask.reshape(C, chunk, 1)),
        w_tag=jnp.zeros((W, 0), jnp.uint8),
        wr_tag=jnp.zeros((WR, 0), jnp.uint8),
        s_tag=jnp.zeros((max(steps, 1), 0), jnp.uint8),
        nr_tag=jnp.zeros((nr_need, 0), jnp.uint8),
    )


_EDGE_WEIGHT_KEYS = ("we", "w2", "w3", "b1", "b2", "b3", "lns", "lnb")


def _edge_weights(weights: dict) -> dict:
    """Restrict to the edge-side keys so custom-VJP cotangent structures
    match (callers may pass a larger per-block dict)."""
    return {k: weights[k] for k in _EDGE_WEIGHT_KEYS}


def _pad_to_plan(e3: Array, sp3: Array, rp3: Array, plan: BandPlan,
                 num_nodes: int) -> Tuple[Array, Array, Array]:
    """Pad batched inputs to the plan's edge/node row counts."""
    E = e3.shape[1]
    E_pad = plan.C * plan.T
    Nr = plan_node_rows(plan, num_nodes)
    return (
        jnp.pad(e3, ((0, 0), (0, E_pad - E), (0, 0))),
        jnp.pad(sp3, ((0, 0), (0, Nr - sp3.shape[1]), (0, 0))),
        jnp.pad(rp3, ((0, 0), (0, Nr - rp3.shape[1]), (0, 0))),
    )


def plan_node_rows(plan: BandPlan, num_nodes: int) -> int:
    """Padded node-row count the kernel windows may touch.

    Static (shape-derived via ``nr_tag``) so it is usable under tracing —
    the plan rides the Graph pytree through jit/scan/vmap.
    """
    n = max(_round_up(num_nodes, 16), plan.nr_tag.shape[0])
    return _round_up(n, 16)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    ws_ref,  # SMEM (SB, C) int32: per-subchunk sender-window starts
    rlo_ref,  # SMEM (1, C) int32
    e_ref,  # (PB, T, L) bf16/f32: edge features chunk, PB batch elements
    sp_ref,  # (PB, Nr, L): sender node parts (nodes @ Ws)
    rp_ref,  # (PB, Nr, L): receiver node parts
    sndT_ref,  # (1, T, 1) int32 window-local senders
    rcvT_ref,  # (1, T, 1) int32 window-local receivers
    rcvrow_ref,  # (1, 1, T) int32 window-local receivers, row layout
    mT_ref,  # (1, T, 1) f32 mask
    we_ref,  # (L, L)
    w2_ref,  # (L, L)
    w3_ref,  # (L, L)
    b1_ref,  # (1, L)
    b2_ref,  # (1, L)
    b3_ref,  # (1, L)
    lns_ref,  # (1, L)
    lnb_ref,  # (1, L)
    e2_ref,  # out (PB, T, L)
    agg_ref,  # out (PB, Nr, 4L) f32, VMEM-resident per batch element
    *stream_refs,  # save_streams outputs: a1 (PB,T,L) cdt, a2 (PB,T,L)
    #   cdt, mu (PB,T,1) f32, isg (PB,T,1) f32 — the activation streams
    #   + LN stats the stream-backward kernel consumes instead of
    #   rematerializing the forward chain (absent when save_streams=False)
    L: int,
    W: int,
    WR: int,
    C: int,
    scan_steps: int,
    cdt,
    finalize: bool = True,
):
    assert len(stream_refs) in (0, 4), (
        "out_shape/kernel-signature drift: expected exactly the 4 "
        "save_streams refs (a1, a2, mu, isg) after agg_ref, got "
        f"{len(stream_refs)} extras"
    )
    c = pl.program_id(1)
    PB = e_ref.shape[0]  # batch elements per grid step (grid amortization)
    Tc = e_ref.shape[1]

    @pl.when(c == 0)
    def _init():
        agg_ref[:, :, : 2 * L] = jnp.zeros_like(agg_ref[:, :, : 2 * L])
        agg_ref[:, :, 2 * L : 3 * L] = jnp.full_like(
            agg_ref[:, :, 2 * L : 3 * L], -_BIG
        )
        agg_ref[:, :, 3 * L :] = jnp.full_like(agg_ref[:, :, 3 * L :], _BIG)

    SB = ws_ref.shape[0]
    Ts = Tc // SB
    ws_j = [pl.multiple_of(ws_ref[j, c], 16) for j in range(SB)]
    rlo = pl.multiple_of(rlo_ref[0, c], 8)

    snd_col = sndT_ref[0]  # [T, 1]
    rcv_col = rcvT_ref[0]  # [T, 1]
    m_col = mT_ref[0]  # [T, 1] f32

    # --- banded one-hot gathers (exact: one-hot x bf16, f32 accumulate);
    # the one-hots are topology-derived, shared by all PB batch elements.
    # The sender side runs per SUBWINDOW ([Ts, W] one-hots against the
    # subchunk's own 16-aligned window): FLOPs are 2*T*W*L either way, but
    # subwindows let the host plan halve W on banded meshes.
    oh_s = [
        (
            jax.lax.broadcasted_iota(jnp.int32, (Ts, W), 1)
            == snd_col[j * Ts : (j + 1) * Ts]
        ).astype(cdt)
        for j in range(SB)
    ]
    oh_r = (
        jax.lax.broadcasted_iota(jnp.int32, (Tc, WR), 1) == rcv_col
    ).astype(cdt)
    sp_parts = []
    rp_parts = []
    for i in range(PB):
        rpw = rp_ref[i, pl.ds(rlo, WR), :].astype(cdt)  # [WR, L]
        # Mosaic requires 32-bit matmul accumulators; round to the compute
        # dtype after, matching XLA's bf16-out MXU semantics.
        sps = [
            jnp.dot(
                oh_s[j],
                sp_ref[i, pl.ds(ws_j[j], W), :].astype(cdt),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            for j in range(SB)
        ]
        sp_parts.append(
            jnp.concatenate(sps, axis=0) if SB > 1 else sps[0]
        )
        rp_parts.append(
            jnp.dot(oh_r, rpw, preferred_element_type=jnp.float32).astype(cdt)
        )
    sp_rows = jnp.concatenate(sp_parts, axis=0) if PB > 1 else sp_parts[0]
    rp_rows = jnp.concatenate(rp_parts, axis=0) if PB > 1 else rp_parts[0]

    # --- edge MLP on the [PB*T, L] flattened stream: one large matmul per
    # layer regardless of PB (matches nn/mlp._dense + mlp_apply_tail)
    e = e_ref[...].astype(cdt).reshape(PB * Tc, L)
    ep = jnp.dot(
        e, we_ref[...].astype(cdt), preferred_element_type=jnp.float32
    ).astype(cdt)
    h = ep + sp_rows + rp_rows + b1_ref[...].astype(cdt)
    a1 = jnp.maximum(h, 0)
    z2 = (
        jnp.dot(
            a1, w2_ref[...].astype(cdt), preferred_element_type=jnp.float32
        ).astype(cdt)
        + b2_ref[...].astype(cdt)
    )
    a2 = jnp.maximum(z2, 0)
    z3 = (
        jnp.dot(
            a2, w3_ref[...].astype(cdt), preferred_element_type=jnp.float32
        ).astype(cdt)
        + b3_ref[...].astype(cdt)
    )

    # --- LayerNorm (f32 statistics).  The row means run as ones-vector
    # matmuls on the MXU instead of cross-lane VPU reductions: the kernel
    # is bound by the serial VPU chain between its matmuls (ROADMAP 5c),
    # so every lane reduction moved onto the (underutilized) MXU shortens
    # the critical path.
    z32 = z3.astype(jnp.float32)
    ones_l = jnp.ones((L, 1), jnp.float32)
    mu = jnp.dot(z32, ones_l, preferred_element_type=jnp.float32) * (1.0 / L)
    xc = z32 - mu
    var = jnp.dot(
        xc * xc, ones_l, preferred_element_type=jnp.float32
    ) * (1.0 / L)
    isg = jax.lax.rsqrt(var + 1e-5)
    xhat = xc * isg
    o = xhat * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(
        jnp.float32
    )
    e2 = e + o.astype(cdt)  # [PB*T, L]
    e2_ref[...] = e2.reshape(PB, Tc, L).astype(e2_ref.dtype)

    if stream_refs:
        a1s_ref, a2s_ref, mu_ref, isg_ref = stream_refs
        a1s_ref[...] = a1.reshape(PB, Tc, L).astype(a1s_ref.dtype)
        a2s_ref[...] = a2.reshape(PB, Tc, L).astype(a2s_ref.dtype)
        mu_ref[...] = mu.reshape(PB, Tc, 1)
        isg_ref[...] = isg.reshape(PB, Tc, 1)

    # --- pna aggregation of e2.  SUM and COUNT are exact one-hot matmuls
    # against the full segment membership (padded edges carry the WR
    # sentinel column, so they select nothing); only MAX/MIN still need
    # the segmented scan + last-edge selection, which halves the scan's
    # serial VPU work vs scanning sum/count too.  All selection matmuls
    # contract over the EDGE dim of the same [T, WR] one-hot the gather
    # already built (dot_general with lhs-transposed dims) — no [WR, T]
    # transposed one-hot is ever materialized on the VPU, and the
    # last-edge mask applies to the [T, .] values column instead of a
    # [WR, T] selector matrix.
    valid = m_col > 0.0
    riota = jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0)
    # packed [max | -min] carry: the negated min turns the combine into a
    # single maximum, so every scan step is ONE roll + ONE maximum + ONE
    # where over a [T, PB*2L] array instead of 2*PB of each — the scan is
    # the kernel's longest serial VPU chain (ROADMAP 5c).  Negation is
    # exact in floats, so the final extrema are bit-identical.
    dmm_parts = []
    for i in range(PB):
        d = e2[i * Tc : (i + 1) * Tc].astype(jnp.float32)
        dmm_parts.append(
            jnp.where(valid, jnp.concatenate([d, -d], axis=-1), -_BIG)
        )
    dmm = jnp.concatenate(dmm_parts, axis=-1) if PB > 1 else dmm_parts[0]
    k = 1
    for _ in range(scan_steps):
        same = (rcv_col == pltpu.roll(rcv_col, k, axis=0)) & (riota >= k)
        dmm = jnp.where(
            same, jnp.maximum(dmm, pltpu.roll(dmm, k, axis=0)), dmm
        )
        k *= 2

    # last edge of each segment, column layout: receiver changes at t+1
    nxt_col = pltpu.roll(rcv_col, Tc - 1, axis=0)
    is_last_col = (
        (rcv_col != nxt_col) | (riota == Tc - 1)
    ).astype(jnp.float32)

    # ONE packed selection matmul for sum/extrema/count: contract the edge
    # dim of the forward [T, WR] one-hot against the lane-concat
    # [e2 | (max|min)*is_last | mask] instead of three serial MXU issues;
    # the sign row flips the carried -min back to min, and each output
    # column only ever sums its own lane column, so the split results are
    # bit-identical to the separate matmuls.
    sign_row = jnp.concatenate(
        [jnp.ones((1, L), jnp.float32), jnp.full((1, L), -1.0, jnp.float32)]
        * PB,
        axis=-1,
    )
    sums_in = jnp.concatenate(
        [e2[i * Tc : (i + 1) * Tc] for i in range(PB)], axis=-1
    ) if PB > 1 else e2  # [T, PB*L] (already cdt)
    vals = (dmm * sign_row * is_last_col).astype(cdt)  # [T, PB*2L]
    packed = jnp.concatenate(
        [sums_in, vals, m_col.astype(cdt)], axis=-1
    )  # [T, PB*3L + 1]
    out = jax.lax.dot_general(
        oh_r, packed, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [WR, PB*3L + 1]
    sums = out[:, : PB * L]
    sel = out[:, PB * L : 3 * PB * L]
    cnt = out[:, 3 * PB * L :]
    pres = cnt > 0.0

    for i in range(PB):
        sel_i = sel[:, i * 2 * L : (i + 1) * 2 * L]
        cur = agg_ref[i, pl.ds(rlo, WR), :]
        new_sum = cur[:, :L] + sums[:, i * L : (i + 1) * L]
        new_cnt = cur[:, L : 2 * L] + jnp.broadcast_to(cnt, (WR, L))
        new_mx = jnp.where(
            pres, jnp.maximum(cur[:, 2 * L : 3 * L], sel_i[:, :L]),
            cur[:, 2 * L : 3 * L],
        )
        new_mn = jnp.where(
            pres, jnp.minimum(cur[:, 3 * L :], sel_i[:, L :]),
            cur[:, 3 * L :],
        )
        agg_ref[i, pl.ds(rlo, WR), :] = jnp.concatenate(
            [new_sum, new_cnt, new_mx, new_mn], axis=-1
        )

    # with finalize=False the output stays [sum | count | max(-BIG) |
    # min(+BIG)] — raw partials an edge-sharded caller combines with
    # psum/pmax/pmin before finalizing (fused_edge_block_collective)
    @pl.when((c == C - 1) & bool(finalize))
    def _finalize():
        s = agg_ref[:, :, :L]
        n = agg_ref[:, :, L : 2 * L]
        mx = agg_ref[:, :, 2 * L : 3 * L]
        mn = agg_ref[:, :, 3 * L :]
        agg_ref[:, :, L : 2 * L] = s / jnp.maximum(n, 1.0)
        agg_ref[:, :, 2 * L : 3 * L] = jnp.where(mx <= -_BIG / 2, 0.0, mx)
        agg_ref[:, :, 3 * L :] = jnp.where(mn >= _BIG / 2, 0.0, mn)


def _pb_pad(x: Array, pb: int) -> Array:
    """Pad the batch dim to a multiple of ``pb`` (grid-amortization)."""
    B = x.shape[0]
    pad = _round_up(B, pb) - B
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call(
    e_pad: Array,  # [B, C*T, L]
    sp: Array,  # [B, Nr, L]
    rp: Array,  # [B, Nr, L]
    weights: dict,
    plan: BandPlan,
    interpret: bool,
    finalize: bool = True,
    pb: int = 1,
    save_streams: bool = False,
) -> Tuple[Array, ...]:
    B, E_pad, L = e_pad.shape
    pb = max(1, min(pb, B))
    if B % pb:
        e_pad, sp, rp = _pb_pad(e_pad, pb), _pb_pad(sp, pb), _pb_pad(rp, pb)
        outs = _fwd_call(
            e_pad, sp, rp, weights, plan, interpret, finalize, pb,
            save_streams,
        )
        return tuple(o[:B] for o in outs)
    Nr = sp.shape[1]
    T, C, W, WR = plan.T, plan.C, plan.W, plan.WR
    SB = plan.SB
    cdt = e_pad.dtype
    kernel = functools.partial(
        _fwd_kernel,
        L=L,
        W=W,
        WR=WR,
        C=C,
        scan_steps=plan.scan_steps,
        cdt=cdt,
        finalize=finalize,
    )
    row = lambda a: a.reshape(1, -1)
    s_es = jax.ShapeDtypeStruct((B, E_pad, L), e_pad.dtype)
    s_e1 = jax.ShapeDtypeStruct((B, E_pad, 1), jnp.float32)
    es_spec = pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0))
    e1_spec = pl.BlockSpec((pb, T, 1), lambda b, c: (b, c, 0))
    stream_shapes = (s_es, s_es, s_e1, s_e1) if save_streams else ()
    stream_specs = (es_spec, es_spec, e1_spec, e1_spec) if save_streams else ()
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            s_es,
            jax.ShapeDtypeStruct((B, Nr, 4 * L), jnp.float32),
        )
        + stream_shapes,
        grid=(B // pb, C),
        in_specs=[
            pl.BlockSpec((SB, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
        ],
        out_specs=(
            es_spec,
            pl.BlockSpec((pb, Nr, 4 * L), lambda b, c: (b, 0, 0)),
        )
        + stream_specs,
        interpret=interpret,
    )(
        plan.w_s,
        plan.r_lo,
        e_pad,
        sp,
        rp,
        plan.snd_col,
        plan.rcv_col,
        plan.rcv_row,
        plan.m_col,
        weights["we"],
        weights["w2"],
        weights["w3"],
        row(weights["b1"]),
        row(weights["b2"]),
        row(weights["b3"]),
        row(weights["lns"]),
        row(weights["lnb"]),
    )
    return outs


def fused_edge_block(
    e: Array,  # [E, L] or [B, E, L] edge features (receiver-sorted)
    sp: Array,  # [N, L] or [B, N, L] sender node parts
    rp: Array,  # receiver node parts
    weights: dict,  # we/w2/w3 [L,L], b1/b2/b3 [L], lns/lnb [L]
    plan: BandPlan,
    num_nodes: int,
    interpret: Optional[bool] = None,
    pb: int = 1,
    pb_bwd: Optional[int] = None,
    bwd: str = "remat",
) -> Tuple[Array, Array]:
    """Fused edge update + pna aggregation.

    Returns ``(e2, agg)`` where ``e2 = e + MLP_LN([x_snd, x_rcv, e])`` with
    the factored first layer already split into ``sp``/``rp``/``we`` parts
    (blocks._update_edge_features), and ``agg`` is the [.., num_nodes, 4L]
    f32 pna aggregate of ``e2``.

    ``pb`` = batch elements per FORWARD grid step (grid amortization): the
    forward grid shrinks by pb at ~pb x the per-step VMEM footprint, and
    the one-hots / packed scan / selection matmul are shared across the pb
    elements.  ``pb_bwd`` is the backward kernel's independent knob
    (default 1: the backward's per-element chains grow with pb, so
    amortizing it measures slower — ROADMAP 5c round-5).

    ``bwd`` = 'remat' (default) or 'stream'.  remat: the backward re-runs
    the forward chunk from (e, sp, rp) — no extra HBM traffic.  stream:
    the under-grad forward saves its a1/a2 activation streams + LN stats
    and the backward skips the remat chain (one z3 matmul left).
    Measured (TPU v5e, 15 blocks, B=21 flag mesh): stream LOSES at
    chunk 512/640 (64.8 vs 60.1 / 63.0 vs 59.2 ms — the kernels sit at
    an HBM-bandwidth balance point, and the ~0.5 MB/grid-step of stream
    traffic costs more than the ~9 matmuls it saves) and wins slightly
    at chunk 256 (70.3 vs 71.4), the default-VMEM-limit chunk.
    """
    if bwd not in ("remat", "stream"):
        raise ValueError(
            f"fused_bwd must be 'remat' or 'stream', got {bwd!r}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = e.ndim == 2
    e3 = e[None] if squeeze else e
    sp3 = sp[None] if squeeze else sp
    rp3 = rp[None] if squeeze else rp
    E = e3.shape[1]
    e_pad, sp_pad, rp_pad = _pad_to_plan(e3, sp3, rp3, plan, num_nodes)
    e2, agg = _fused_vjp(
        e_pad, sp_pad, rp_pad, _edge_weights(weights), plan, interpret,
        (
            max(1, min(pb, e3.shape[0])),
            max(1, min(1 if pb_bwd is None else pb_bwd, e3.shape[0])),
            bwd == "stream",
        ),
    )
    e2 = e2[:, :E, :]
    agg = agg[:, :num_nodes, :]
    if squeeze:
        e2, agg = e2[0], agg[0]
    return e2, agg


def fused_edge_block_batchable(
    e: Array,
    sp: Array,
    rp: Array,
    weights: dict,
    plan: BandPlan,
    num_nodes: int,
    interpret: Optional[bool] = None,
    pb: int = 1,
    pb_bwd: Optional[int] = None,
    bwd: str = "remat",
) -> Tuple[Array, Array]:
    """:func:`fused_edge_block` that collapses an outer ``vmap`` into the
    kernel's batch grid dimension.

    Under plain vmap, pallas_call's batching rule adds a size-1 batch block
    per sample, so ``pb`` (batch elements per grid step) never sees the
    real batch.  This wrapper's custom-vmap rule hands the whole [B, E, L]
    batch to one kernel launch, shrinking the serialized grid by ``pb``
    (forward; ``pb_bwd`` independently for the backward, default 1).
    """
    from jax import custom_batching

    @custom_batching.custom_vmap
    def call(e, sp, rp, weights, plan):
        return fused_edge_block(
            e, sp, rp, weights, plan, num_nodes, interpret, pb,
            pb_bwd=pb_bwd, bwd=bwd,
        )

    @call.def_vmap
    def rule(axis_size, in_batched, e, sp, rp, weights, plan):
        e_b, sp_b, rp_b, w_b, plan_b = in_batched

        def ensure(x, batched):
            if batched:
                return x
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (axis_size,) + a.shape), x
            )

        e = ensure(e, e_b)
        sp = ensure(sp, sp_b)
        rp = ensure(rp, rp_b)
        # weights / plan are vmap constants in every caller (closed-over
        # params, topology-derived plan); reject silently-batched cases
        if any(jax.tree.leaves(w_b)) or any(jax.tree.leaves(plan_b)):
            raise NotImplementedError(
                "fused_edge_block_batchable: batched weights/plan"
            )
        out = fused_edge_block(
            e, sp, rp, weights, plan, num_nodes, interpret, pb,
            pb_bwd=pb_bwd, bwd=bwd,
        )
        return out, (True, True)

    return call(e, sp, rp, weights, plan)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_vjp(e_pad, sp, rp, weights, plan, interpret, pb):
    # ``plan`` is formally differentiable (it rides the Graph pytree, so
    # its arrays may be tracers under jit/scan); its cotangents are zeros
    # (float0 for the integer index arrays) — see _fused_bwd.
    # ``pb`` is a static (pb_fwd, pb_bwd, stream_bwd) triple: grid
    # amortization pays off asymmetrically — the forward shares its
    # one-hots, packed scan and selection matmul across the pb elements
    # (measured −29% at pb=3), while the backward's per-element
    # routing/RMW chains and f32 residents grow with pb (measured slower
    # past 1) — so the two kernels get independent knobs.  ``stream_bwd``
    # selects the remat-free backward (and makes the under-grad forward
    # write its activation streams); see fused_edge_block.
    e2, agg = _fwd_call(e_pad, sp, rp, weights, plan, interpret, pb=pb[0])
    return e2, agg


def _fused_fwd(e_pad, sp, rp, weights, plan, interpret, pb):
    if pb[2]:
        # stream mode: the forward also writes its activation streams +
        # LN stats (a1/a2/mu/isg) and the backward skips the forward
        # rematerialization chain (ROADMAP 5c round-5: wins only where
        # compute outweighs the extra stream DMA — chunk <= 256)
        e2, agg, a1, a2, mu, isg = _fwd_call(
            e_pad, sp, rp, weights, plan, interpret, pb=pb[0],
            save_streams=True,
        )
        return (e2, agg), (
            e_pad, sp, rp, (a1, a2, mu, isg), weights, agg, plan,
        )
    e2, agg = _fwd_call(e_pad, sp, rp, weights, plan, interpret, pb=pb[0])
    return (e2, agg), (e_pad, sp, rp, None, weights, agg, plan)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _route_agg_cotangent(got_all, e2v, m_col, PB, Tc, L, tie_tol):
    """max/min winner routing shared by the remat and stream backward
    kernels: adds the max/min cotangents to the sum/mean cotangent on
    edges whose e2 matches the saved extrema within ``tie_tol`` (see
    _bwd_kernel for the tie_tol semantics)."""
    routes = []
    for i in range(PB):
        got = got_all[:, i * 5 * L : (i + 1) * 5 * L]
        e2v_i = e2v[i * Tc : (i + 1) * Tc]
        mx = got[:, L : 2 * L]
        mn = got[:, 3 * L : 4 * L]
        route = got[:, :L]
        route = route + jnp.where(
            jnp.abs(e2v_i - mx) <= tie_tol * jnp.abs(mx) + tie_tol,
            got[:, 2 * L : 3 * L],
            0.0,
        )
        route = route + jnp.where(
            jnp.abs(e2v_i - mn) <= tie_tol * jnp.abs(mn) + tie_tol,
            got[:, 4 * L :],
            0.0,
        )
        routes.append(route * m_col)
    return jnp.concatenate(routes, axis=0) if PB > 1 else routes[0]


def _ln_mlp_backward(
    de2_tot, xhat, inv_sigma, lns, relu1_src, relu2_src, weT, w2T, w3T, cdt,
):
    """LayerNorm + MLP backward shared by both backward kernels.

    ``relu1_src``/``relu2_src`` define the relu subgradient masks via
    ``> 0``: the remat kernel passes the recomputed pre-activations
    (h, z2), the stream kernel the saved activations (a1, a2) — identical
    masks since a = max(x, 0) is positive iff x is.  Returns
    (dh, dz2, dz3, de_mlp_part, do) with de_mlp_part = dh @ weT.
    """
    f32 = jnp.float32
    L = xhat.shape[-1]
    ones_l = jnp.ones((L, 1), f32)
    do = de2_tot
    dxhat = do * lns
    m1 = jnp.dot(dxhat, ones_l, preferred_element_type=f32) * (1.0 / L)
    m2 = jnp.dot(
        dxhat * xhat, ones_l, preferred_element_type=f32
    ) * (1.0 / L)
    dz3 = ((dxhat - m1 - xhat * m2) * inv_sigma).astype(cdt)
    # compare in f32: Mosaic on this target rejects bf16 comparisons
    da2 = jnp.dot(
        dz3, w3T.astype(cdt), preferred_element_type=f32
    ).astype(cdt)
    dz2 = jnp.where(relu2_src.astype(f32) > 0, da2, 0)
    da1 = jnp.dot(
        dz2, w2T.astype(cdt), preferred_element_type=f32
    ).astype(cdt)
    dh = jnp.where(relu1_src.astype(f32) > 0, da1, 0)
    de_mlp = jnp.dot(dh, weT.astype(cdt), preferred_element_type=f32)
    return dh, dz2, dz3, de_mlp, do


def _accumulate_node_cotangents(
    dsp_ref, drp_ref, dh, oh_s, oh_r, ws_j, rlo, PB, Tc, Ts, W, WR, L,
):
    """Node-part cotangent RMW shared by both backward kernels: the
    "transposed one-hot scatter" contracts the FORWARD one-hots over
    their edge dim (dot_general lhs-transposed dims) — no transposed
    one-hot is materialized on the VPU.  RMW is race-free on the
    sequential TPU grid; subwindows are serialized within the
    invocation, so overlapping sender windows accumulate correctly."""
    f32 = jnp.float32
    SB = len(oh_s)
    selT = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    for i in range(PB):
        dh_i = dh[i * Tc : (i + 1) * Tc]
        drp_w = selT(oh_r, dh_i)  # [WR, L]
        drp_ref[i, pl.ds(rlo, WR), :] = drp_ref[i, pl.ds(rlo, WR), :] + drp_w
        for j in range(SB):
            dsp_w = selT(oh_s[j], dh_i[j * Ts : (j + 1) * Ts])  # [W, L]
            dsp_ref[i, pl.ds(ws_j[j], W), :] = (
                dsp_ref[i, pl.ds(ws_j[j], W), :] + dsp_w
            )


def _accumulate_dpar(dpar_ref, dh, dz2, dz3, do, xhat, PB, Tc, L):
    """Bias / LN parameter gradients (rows 0..4 of dpar), shared by both
    backward kernels; summed over the PB elements into row-block 0 (the
    caller sums over the batch anyway).  ONE ones-vector column-sum
    matmul over the lane-concat of the five gradient streams instead of
    five serial MXU issues (ROADMAP 5c); each output column sums only
    its own lane column, so the sliced rows are bit-identical to the
    separate matmuls."""
    f32 = jnp.float32
    ones = jnp.ones((1, PB * Tc), f32)
    big = jnp.concatenate(
        [dh.astype(f32), dz2.astype(f32), dz3.astype(f32), do * xhat, do],
        axis=-1,
    )  # [PB*T, 5L]
    upd = jnp.dot(ones, big, preferred_element_type=f32)  # [1, 5L]
    rows = jnp.concatenate(
        [upd[:, r * L : (r + 1) * L] for r in range(5)]
        + [jnp.zeros((3, L), f32)],
        axis=0,
    )  # [8, L]
    dpar_ref[0] = dpar_ref[0] + rows


def _bwd_kernel(
    ws_ref,  # SMEM (SB, C) int32: per-subchunk sender-window starts
    rlo_ref,  # SMEM (1, C) int32
    e_ref,  # (1, T, L): forward edge features chunk
    sp_ref,  # (1, Nr, L)
    rp_ref,  # (1, Nr, L)
    de2_ref,  # (1, T, L): downstream cotangent of e2
    drhs_ref,  # (1, Nr, 5L) f32: [g_sum + g_mean/deg | mx | g_max | mn | g_min]
    sndT_ref,  # (1, T, 1) int32
    rcvT_ref,  # (1, T, 1) int32
    sndrow_ref,  # (1, SB, T/SB) int32: subwindow-local, row layout
    rcvrow_ref,  # (1, 1, T) int32
    mT_ref,  # (1, T, 1) f32
    we_ref,
    w2_ref,
    w3_ref,
    weT_ref,  # transposed weights (host-side)
    w2T_ref,
    w3T_ref,
    b1_ref,
    b2_ref,
    b3_ref,
    lns_ref,
    de_ref,  # out (1, T, L): cotangent to e
    dh_ref,  # out (1, T, L): stream for dWe (= e^T dh) and db1
    dz2_ref,  # out (1, T, L): stream for dW2
    dz3_ref,  # out (1, T, L): stream for dW3
    a1_ref,  # out (1, T, L): recomputed activation stream
    a2_ref,  # out (1, T, L)
    dsp_ref,  # out (1, Nr, L) f32, resident: sender-part cotangent
    drp_ref,  # out (1, Nr, L) f32, resident
    dpar_ref,  # out (1, 8, L) f32, resident: db1|db2|db3|dlns|dlnb rows
    *,
    L: int,
    W: int,
    WR: int,
    C: int,
    cdt,
    tie_tol: float,
):
    c = pl.program_id(1)
    PB = e_ref.shape[0]  # batch elements per grid step
    Tc = e_ref.shape[1]
    f32 = jnp.float32

    @pl.when(c == 0)
    def _init():
        dsp_ref[...] = jnp.zeros_like(dsp_ref)
        drp_ref[...] = jnp.zeros_like(drp_ref)
        dpar_ref[...] = jnp.zeros_like(dpar_ref)

    SB = ws_ref.shape[0]
    Ts = Tc // SB
    ws_j = [pl.multiple_of(ws_ref[j, c], 16) for j in range(SB)]
    rlo = pl.multiple_of(rlo_ref[0, c], 8)

    snd_col = sndT_ref[0]
    rcv_col = rcvT_ref[0]
    m_col = mT_ref[0]

    # --- recompute the forward chunk (remat: everything is VMEM-resident);
    # one-hots are shared by the PB batch elements, the MLP chain runs on
    # the [PB*T, L] flattened stream (one matmul per layer).  The sender
    # gathers run per subwindow (see _fwd_kernel).
    oh_s = [
        (
            jax.lax.broadcasted_iota(jnp.int32, (Ts, W), 1)
            == snd_col[j * Ts : (j + 1) * Ts]
        ).astype(cdt)
        for j in range(SB)
    ]
    oh_r = (
        jax.lax.broadcasted_iota(jnp.int32, (Tc, WR), 1) == rcv_col
    ).astype(cdt)
    sp_parts, rp_parts = [], []
    for i in range(PB):
        rpw = rp_ref[i, pl.ds(rlo, WR), :].astype(cdt)
        sps = [
            jnp.dot(
                oh_s[j],
                sp_ref[i, pl.ds(ws_j[j], W), :].astype(cdt),
                preferred_element_type=f32,
            ).astype(cdt)
            for j in range(SB)
        ]
        sp_parts.append(jnp.concatenate(sps, axis=0) if SB > 1 else sps[0])
        rp_parts.append(jnp.dot(oh_r, rpw, preferred_element_type=f32).astype(cdt))
    sp_rows = jnp.concatenate(sp_parts, axis=0) if PB > 1 else sp_parts[0]
    rp_rows = jnp.concatenate(rp_parts, axis=0) if PB > 1 else rp_parts[0]
    e = e_ref[...].astype(cdt).reshape(PB * Tc, L)
    ep = jnp.dot(
        e, we_ref[...].astype(cdt), preferred_element_type=f32
    ).astype(cdt)
    h = ep + sp_rows + rp_rows + b1_ref[...].astype(cdt)
    a1 = jnp.maximum(h, 0)
    z2 = (
        jnp.dot(
            a1, w2_ref[...].astype(cdt), preferred_element_type=f32
        ).astype(cdt)
        + b2_ref[...].astype(cdt)
    )
    a2 = jnp.maximum(z2, 0)
    z3 = (
        jnp.dot(
            a2, w3_ref[...].astype(cdt), preferred_element_type=f32
        ).astype(cdt)
        + b3_ref[...].astype(cdt)
    )
    z32 = z3.astype(f32)
    # row means as ones-vector MXU matmuls (not cross-lane VPU reductions);
    # MUST match _fwd_kernel's LN statistics bit-for-bit so the tie compare
    # and remat recomputation stay exact on the kernel-forward path
    ones_l = jnp.ones((L, 1), f32)
    mu = jnp.dot(z32, ones_l, preferred_element_type=f32) * (1.0 / L)
    xc = z32 - mu
    var = jnp.dot(xc * xc, ones_l, preferred_element_type=f32) * (1.0 / L)
    inv_sigma = jax.lax.rsqrt(var + 1e-5)
    xhat = xc * inv_sigma
    lns = lns_ref[0:1, :].astype(f32)  # lns_ref block is [2, L]: [lns; lnb]
    lnb = lns_ref[1:2, :].astype(f32)
    o = xhat * lns + lnb
    e2v = (e + o.astype(cdt)).astype(f32)  # exact forward e2 (tie compare)

    # --- aggregation cotangent routed back to this chunk's edges: one
    # selection matmul carries all PB elements' windows (lane concat)
    ohT = oh_r  # [T, WR] — same one-hot, selection direction
    rhsw = jnp.concatenate(
        [drhs_ref[i, pl.ds(rlo, WR), :] for i in range(PB)], axis=-1
    ).astype(cdt)  # [WR, PB*5L]
    got_all = jnp.dot(ohT, rhsw, preferred_element_type=f32)  # [T, PB*5L]

    # max/min winner routing.  ``tie_tol`` is a static, path-dependent
    # relative tolerance: 0 for the kernel-forward path (the saved extrema
    # came from this exact recomputation, so equality is bitwise and exact
    # ties share the subgradient as before), and dtype-scaled for the
    # hybrid XLA-forward path whose e2 differs from this recomputation in
    # the last ulps (f32: reassociation error ~1e-6 relative; bf16: up to
    # one ulp = 2^-8 relative when rounding boundaries straddle).
    route_all = _route_agg_cotangent(
        got_all, e2v, m_col, PB, Tc, L, tie_tol
    )

    de2_tot = (
        de2_ref[...].astype(f32).reshape(PB * Tc, L) + route_all
    )  # [PB*T, L] f32

    # --- LayerNorm + MLP backward (f32; row means on the MXU as above);
    # relu masks from the recomputed pre-activations (h, z2)
    dh, dz2, dz3, de_mlp, do = _ln_mlp_backward(
        de2_tot, xhat, inv_sigma, lns, h, z2,
        weT_ref[...], w2T_ref[...], w3T_ref[...], cdt,
    )
    de = (de2_tot + de_mlp).astype(cdt)

    de_ref[...] = de.reshape(PB, Tc, L).astype(de_ref.dtype)
    dh_ref[...] = dh.reshape(PB, Tc, L).astype(dh_ref.dtype)
    dz2_ref[...] = dz2.reshape(PB, Tc, L).astype(dz2_ref.dtype)
    dz3_ref[...] = dz3.reshape(PB, Tc, L).astype(dz3_ref.dtype)
    a1_ref[...] = a1.reshape(PB, Tc, L).astype(a1_ref.dtype)
    a2_ref[...] = a2.reshape(PB, Tc, L).astype(a2_ref.dtype)

    _accumulate_node_cotangents(
        dsp_ref, drp_ref, dh, oh_s, oh_r, ws_j, rlo, PB, Tc, Ts, W, WR, L,
    )
    _accumulate_dpar(dpar_ref, dh, dz2, dz3, do, xhat, PB, Tc, L)


def _bwd_call(
    e_pad: Array,
    sp: Array,
    rp: Array,
    weights: dict,
    de2_pad: Array,
    drhs: Array,  # [B, Nr, 5L] f32
    plan: BandPlan,
    interpret: bool,
    tie_tol: float,
    pb: int = 1,
):
    B, E_pad, L = e_pad.shape
    pb = max(1, min(pb, B))
    if B % pb:
        outs = _bwd_call(
            _pb_pad(e_pad, pb), _pb_pad(sp, pb), _pb_pad(rp, pb), weights,
            _pb_pad(de2_pad, pb), _pb_pad(drhs, pb), plan, interpret,
            tie_tol, pb,
        )
        return tuple(o[:B] for o in outs)
    Nr = sp.shape[1]
    T, C, W, WR = plan.T, plan.C, plan.W, plan.WR
    SB = plan.SB
    cdt = e_pad.dtype
    kernel = functools.partial(
        _bwd_kernel, L=L, W=W, WR=WR, C=C, cdt=cdt, tie_tol=tie_tol
    )
    row = lambda a: a.reshape(1, -1)
    ln2 = jnp.stack([weights["lns"], weights["lnb"]])  # [2, L]
    tr = lambda w: jnp.swapaxes(w, -1, -2)
    s_es = jax.ShapeDtypeStruct((B, E_pad, L), e_pad.dtype)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            s_es,  # de
            s_es,  # dh
            s_es,  # dz2
            s_es,  # dz3
            s_es,  # a1
            s_es,  # a2
            jax.ShapeDtypeStruct((B, Nr, L), jnp.float32),  # dsp
            jax.ShapeDtypeStruct((B, Nr, L), jnp.float32),  # drp
            jax.ShapeDtypeStruct((B, 8, L), jnp.float32),  # dpar
        ),
        grid=(B // pb, C),
        in_specs=[
            pl.BlockSpec((SB, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, Nr, 5 * L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, SB, T // SB), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((2, L), lambda b, c: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, 8, L), lambda b, c: (b, 0, 0)),
        ),
        interpret=interpret,
    )(
        plan.w_s,
        plan.r_lo,
        e_pad,
        sp,
        rp,
        de2_pad,
        drhs,
        plan.snd_col,
        plan.rcv_col,
        plan.snd_row,
        plan.rcv_row,
        plan.m_col,
        weights["we"],
        weights["w2"],
        weights["w3"],
        tr(weights["we"]),
        tr(weights["w2"]),
        tr(weights["w3"]),
        row(weights["b1"]),
        row(weights["b2"]),
        row(weights["b3"]),
        ln2,
    )
    return outs


def _bwd_stream_kernel(
    ws_ref,  # SMEM (SB, C) int32
    rlo_ref,  # SMEM (1, C) int32
    e_ref,  # (PB, T, L): forward edge features chunk
    a1_ref,  # (PB, T, L) cdt: saved forward activation stream
    a2_ref,  # (PB, T, L) cdt
    mu_ref,  # (PB, T, 1) f32: saved LN row means
    isg_ref,  # (PB, T, 1) f32: saved LN inverse sigmas
    de2_ref,  # (PB, T, L): downstream cotangent of e2
    drhs_ref,  # (PB, Nr, 5L) f32: [g_sum + g_mean/deg | mx | g_max | mn | g_min]
    sndT_ref,  # (1, T, 1) int32
    rcvT_ref,  # (1, T, 1) int32
    mT_ref,  # (1, T, 1) f32
    w3_ref,  # (L, L)
    weT_ref,  # transposed weights (host-side)
    w2T_ref,
    w3T_ref,
    b3_ref,  # (1, L)
    lns_ref,  # (2, L): [lns; lnb]
    de_ref,  # out (PB, T, L)
    dh_ref,  # out (PB, T, L): stream for dWe (= e^T dh) and db1
    dz2_ref,  # out (PB, T, L)
    dz3_ref,  # out (PB, T, L)
    dsp_ref,  # out (PB, Nr, L) f32, resident
    drp_ref,  # out (PB, Nr, L) f32, resident
    dpar_ref,  # out (PB, 8, L) f32, resident
    *,
    L: int,
    W: int,
    WR: int,
    C: int,
    cdt,
    tie_tol: float,
):
    """Stream-consuming backward: no forward rematerialization.

    The remat kernel (:func:`_bwd_kernel`) re-runs the whole forward
    chunk (gathers + 3 MLP matmuls + LN stats ≈ 9 serialized MXU issues)
    before any cotangent math.  With the forward's a1/a2 streams + LN
    stats saved (cheap bf16/f32 HBM, DMA'd alongside the chunk and
    hidden behind compute), the only recomputation left is ONE matmul
    (z3 = a2 @ w3 + b3, needed for xhat and the tie compare), cutting the
    per-grid-step serial chain roughly in half.  Bit-exactness: a1/a2
    are the forward's own post-cast values, so z3/xhat/e2v reproduce the
    forward bit-for-bit and the tie compare stays exact at tie_tol=0.
    The relu masks use the identities a1>0 ⇔ h>0 and a2>0 ⇔ z2>0
    (a = max(x, 0) is positive iff x is).
    """
    c = pl.program_id(1)
    PB = e_ref.shape[0]
    Tc = e_ref.shape[1]
    f32 = jnp.float32

    @pl.when(c == 0)
    def _init():
        dsp_ref[...] = jnp.zeros_like(dsp_ref)
        drp_ref[...] = jnp.zeros_like(drp_ref)
        dpar_ref[...] = jnp.zeros_like(dpar_ref)

    SB = ws_ref.shape[0]
    Ts = Tc // SB
    ws_j = [pl.multiple_of(ws_ref[j, c], 16) for j in range(SB)]
    rlo = pl.multiple_of(rlo_ref[0, c], 8)

    snd_col = sndT_ref[0]
    rcv_col = rcvT_ref[0]
    m_col = mT_ref[0]

    # --- reconstruct xhat / e2 from the saved streams (one matmul; must
    # match _fwd_kernel bit-for-bit for the tie compare / remat-free path)
    a1 = a1_ref[...].astype(cdt).reshape(PB * Tc, L)
    a2 = a2_ref[...].astype(cdt).reshape(PB * Tc, L)
    e = e_ref[...].astype(cdt).reshape(PB * Tc, L)
    z3 = (
        jnp.dot(
            a2, w3_ref[...].astype(cdt), preferred_element_type=f32
        ).astype(cdt)
        + b3_ref[...].astype(cdt)
    )
    z32 = z3.astype(f32)
    mu = mu_ref[...].reshape(PB * Tc, 1)
    inv_sigma = isg_ref[...].reshape(PB * Tc, 1)
    xhat = (z32 - mu) * inv_sigma
    lns = lns_ref[0:1, :].astype(f32)  # lns_ref block is [2, L]: [lns; lnb]
    lnb = lns_ref[1:2, :].astype(f32)
    o = xhat * lns + lnb
    e2v = (e + o.astype(cdt)).astype(f32)  # exact forward e2 (tie compare)

    # --- one-hots (topology-derived; needed only for the selection
    # matmuls below — the gathers themselves are gone)
    oh_s = [
        (
            jax.lax.broadcasted_iota(jnp.int32, (Ts, W), 1)
            == snd_col[j * Ts : (j + 1) * Ts]
        ).astype(cdt)
        for j in range(SB)
    ]
    oh_r = (
        jax.lax.broadcasted_iota(jnp.int32, (Tc, WR), 1) == rcv_col
    ).astype(cdt)

    # --- aggregation cotangent routed back to this chunk's edges: one
    # selection matmul carries all PB elements' windows (lane concat)
    rhsw = jnp.concatenate(
        [drhs_ref[i, pl.ds(rlo, WR), :] for i in range(PB)], axis=-1
    ).astype(cdt)  # [WR, PB*5L]
    got_all = jnp.dot(oh_r, rhsw, preferred_element_type=f32)  # [T, PB*5L]

    route_all = _route_agg_cotangent(
        got_all, e2v, m_col, PB, Tc, L, tie_tol
    )

    de2_tot = (
        de2_ref[...].astype(f32).reshape(PB * Tc, L) + route_all
    )  # [PB*T, L] f32

    # --- LayerNorm + MLP backward; relu masks from the saved streams
    # (a1 > 0 ⇔ h > 0, a2 > 0 ⇔ z2 > 0)
    dh, dz2, dz3, de_mlp, do = _ln_mlp_backward(
        de2_tot, xhat, inv_sigma, lns, a1, a2,
        weT_ref[...], w2T_ref[...], w3T_ref[...], cdt,
    )
    de = (de2_tot + de_mlp).astype(cdt)

    de_ref[...] = de.reshape(PB, Tc, L).astype(de_ref.dtype)
    dh_ref[...] = dh.reshape(PB, Tc, L).astype(dh_ref.dtype)
    dz2_ref[...] = dz2.reshape(PB, Tc, L).astype(dz2_ref.dtype)
    dz3_ref[...] = dz3.reshape(PB, Tc, L).astype(dz3_ref.dtype)

    _accumulate_node_cotangents(
        dsp_ref, drp_ref, dh, oh_s, oh_r, ws_j, rlo, PB, Tc, Ts, W, WR, L,
    )
    _accumulate_dpar(dpar_ref, dh, dz2, dz3, do, xhat, PB, Tc, L)


def _bwd_stream_call(
    e_pad: Array,
    streams: Tuple[Array, Array, Array, Array],  # (a1, a2, mu, isg)
    weights: dict,
    de2_pad: Array,
    drhs: Array,  # [B, Nr, 5L] f32
    plan: BandPlan,
    Nr: int,
    interpret: bool,
    tie_tol: float,
    pb: int = 1,
):
    B, E_pad, L = e_pad.shape
    pb = max(1, min(pb, B))
    a1, a2, mu, isg = streams
    if B % pb:
        outs = _bwd_stream_call(
            _pb_pad(e_pad, pb),
            tuple(_pb_pad(s, pb) for s in streams),
            weights, _pb_pad(de2_pad, pb), _pb_pad(drhs, pb), plan, Nr,
            interpret, tie_tol, pb,
        )
        return tuple(o[:B] for o in outs)
    T, C, W, WR = plan.T, plan.C, plan.W, plan.WR
    SB = plan.SB
    cdt = e_pad.dtype
    kernel = functools.partial(
        _bwd_stream_kernel, L=L, W=W, WR=WR, C=C, cdt=cdt, tie_tol=tie_tol
    )
    row = lambda a: a.reshape(1, -1)
    ln2 = jnp.stack([weights["lns"], weights["lnb"]])  # [2, L]
    tr = lambda w: jnp.swapaxes(w, -1, -2)
    s_es = jax.ShapeDtypeStruct((B, E_pad, L), e_pad.dtype)
    es_spec = pl.BlockSpec((pb, T, L), lambda b, c: (b, c, 0))
    e1_spec = pl.BlockSpec((pb, T, 1), lambda b, c: (b, c, 0))
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            s_es,  # de
            s_es,  # dh
            s_es,  # dz2
            s_es,  # dz3
            jax.ShapeDtypeStruct((B, Nr, L), jnp.float32),  # dsp
            jax.ShapeDtypeStruct((B, Nr, L), jnp.float32),  # drp
            jax.ShapeDtypeStruct((B, 8, L), jnp.float32),  # dpar
        ),
        grid=(B // pb, C),
        in_specs=[
            pl.BlockSpec((SB, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            es_spec,
            es_spec,
            es_spec,
            e1_spec,
            e1_spec,
            es_spec,
            pl.BlockSpec((pb, Nr, 5 * L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((2, L), lambda b, c: (0, 0)),
        ],
        out_specs=(
            es_spec,
            es_spec,
            es_spec,
            es_spec,
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, Nr, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((pb, 8, L), lambda b, c: (b, 0, 0)),
        ),
        interpret=interpret,
    )(
        plan.w_s,
        plan.r_lo,
        e_pad,
        a1,
        a2,
        mu,
        isg,
        de2_pad,
        drhs,
        plan.snd_col,
        plan.rcv_col,
        plan.m_col,
        weights["w3"],
        tr(weights["we"]),
        tr(weights["w2"]),
        tr(weights["w3"]),
        row(weights["b3"]),
        ln2,
    )
    return outs


def _plan_degrees(plan: BandPlan, Nr: int) -> Array:
    """Per-node valid in-degree from the static plan (f32, [Nr])."""
    C, T = plan.C, plan.T
    local = plan.rcv_row.reshape(C * T)
    base = jnp.repeat(plan.r_lo.reshape(C), T)
    m = plan.m_col.reshape(C * T)
    gl = jnp.where(m > 0, local + base, 0).astype(jnp.int32)
    return jax.ops.segment_sum(m, gl, Nr)


def _zero_plan_cotangent(plan: BandPlan) -> BandPlan:
    def zero(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree.map(zero, plan)


def _bwd_core(
    e_pad, sp, rp, weights, agg, plan, de2_bar, dagg_bar, interpret,
    tie_tol=0.0, pb: int = 1, streams=None,
):
    """Shared backward: Pallas kernel + dense weight-grad matmuls.

    All inputs padded to the plan's edge/node row counts ([B, E_pad, L] /
    [B, Nr, ...]); ``agg`` is the *finalized* padded aggregate.  Returns
    (de, dsp, drp, dweights) at padded shapes.  With ``streams`` (the
    forward-saved (a1, a2, mu, isg)) the remat-free stream kernel runs
    instead of the forward-rematerializing one; callers whose forward
    did not run the Pallas kernel (hybrid XLA forward, spmd shards)
    pass None and keep the remat path.
    """
    B, E_pad, L = e_pad.shape
    Nr = sp.shape[1]
    de2_bar = jnp.where(jnp.isnan(de2_bar), 0, de2_bar)  # defensive: none expected

    deg = _plan_degrees(plan, Nr)
    inv_deg = (1.0 / jnp.maximum(deg, 1.0))[None, :, None]
    dagg32 = dagg_bar.astype(jnp.float32)
    g1 = dagg32[:, :, :L] + dagg32[:, :, L : 2 * L] * inv_deg
    drhs = jnp.concatenate(
        [
            g1,
            agg[:, :, 2 * L : 3 * L],  # mx (tie compare)
            dagg32[:, :, 2 * L : 3 * L],  # g_max
            agg[:, :, 3 * L :],  # mn
            dagg32[:, :, 3 * L :],  # g_min
        ],
        axis=-1,
    )
    if streams is not None:
        a1, a2 = streams[0], streams[1]
        de, dh, dz2, dz3, dsp, drp, dpar = _bwd_stream_call(
            e_pad, streams, weights, de2_bar.astype(e_pad.dtype), drhs,
            plan, Nr, interpret, tie_tol, pb,
        )
    else:
        de, dh, dz2, dz3, a1, a2, dsp, drp, dpar = _bwd_call(
            e_pad, sp, rp, weights, de2_bar.astype(e_pad.dtype), drhs, plan,
            interpret, tie_tol, pb,
        )
    f32 = jnp.float32
    dweights = {
        "we": jnp.einsum(
            "bei,bej->ij", e_pad.astype(f32), dh.astype(f32)
        ),
        "w2": jnp.einsum("bei,bej->ij", a1.astype(f32), dz2.astype(f32)),
        "w3": jnp.einsum("bei,bej->ij", a2.astype(f32), dz3.astype(f32)),
        "b1": jnp.sum(dpar[:, 0, :], axis=0),
        "b2": jnp.sum(dpar[:, 1, :], axis=0),
        "b3": jnp.sum(dpar[:, 2, :], axis=0),
        "lns": jnp.sum(dpar[:, 3, :], axis=0),
        "lnb": jnp.sum(dpar[:, 4, :], axis=0),
    }
    return (
        de.astype(e_pad.dtype),
        dsp.astype(sp.dtype),
        drp.astype(rp.dtype),
        dweights,
    )


def _fused_bwd(interpret, pb, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e_pad, sp, rp, streams, weights, agg, plan = res
    de2_bar, dagg_bar = g
    de, dsp, drp, dweights = _bwd_core(
        e_pad, sp, rp, weights, agg, plan, de2_bar, dagg_bar, interpret,
        pb=pb[1], streams=streams,
    )
    return (de, dsp, drp, dweights, _zero_plan_cotangent(plan))


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# hybrid variant: XLA forward + Pallas backward
# ---------------------------------------------------------------------------
#
# The forward kernel is serialized-grid-step bound and measures slightly
# slower than XLA's fused forward chain with CSR-gather pna (28 vs 23 ms at
# bench scale) — the fused win is almost entirely the backward (78 -> 42 ms).
# When the caller has the static gather matrices anyway, the best of both is
# an XLA forward with the remat Pallas backward.


def _xla_fwd_math(e, sp, rp, wk, snd, rcv, gidx, gvalid):
    """Unfused forward math, identical to nn.mlp/_update_edge_features
    semantics (factored first layer, f32 LayerNorm stats) + CSR-gather pna."""
    from hyper_graph_nets_tpu.core.segment_ops import gather_aggregate
    from hyper_graph_nets_tpu.nn.mlp import _dense

    cd = None if e.dtype == jnp.float32 else e.dtype
    b = lambda v: v if cd is None else v.astype(cd)
    h = (
        _dense(e, wk["we"], cd)
        + jnp.take(sp, snd, axis=-2)
        + jnp.take(rp, rcv, axis=-2)
        + b(wk["b1"])
    )
    z2 = _dense(jax.nn.relu(h), wk["w2"], cd) + b(wk["b2"])
    z3 = _dense(jax.nn.relu(z2), wk["w3"], cd) + b(wk["b3"])
    z32 = z3.astype(jnp.float32)
    mu = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mu), axis=-1, keepdims=True)
    o = (z32 - mu) * jax.lax.rsqrt(var + 1e-5) * wk["lns"] + wk["lnb"]
    e2 = e + o.astype(e.dtype)
    agg = gather_aggregate(e2, gidx, gvalid, "pna")
    return e2, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _hybrid_vjp(e, sp, rp, weights, plan, snd, rcv, gidx, gvalid, interpret):
    # snd/rcv/gidx/gvalid drive only the forward; plan only the backward.
    # All are formally differentiable (traced pytree members) with zero /
    # float0 cotangents.
    return _xla_fwd_math(e, sp, rp, weights, snd, rcv, gidx, gvalid)


def _hybrid_fwd(e, sp, rp, weights, plan, snd, rcv, gidx, gvalid, interpret):
    e2, agg = _xla_fwd_math(e, sp, rp, weights, snd, rcv, gidx, gvalid)
    return (e2, agg), (e, sp, rp, weights, agg, plan, snd, rcv, gidx, gvalid)


def _hybrid_bwd(interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, sp, rp, weights, agg, plan, snd, rcv, gidx, gvalid = res
    de2_bar, dagg_bar = g
    squeeze = e.ndim == 2
    ex = lambda a: a[None] if squeeze else a
    E = e.shape[-2]
    N = agg.shape[-2]
    E_pad = plan.C * plan.T
    Nr = plan_node_rows(plan, N)
    pe = lambda a: jnp.pad(ex(a), ((0, 0), (0, E_pad - E), (0, 0)))
    pn = lambda a: jnp.pad(ex(a), ((0, 0), (0, Nr - a.shape[-2]), (0, 0)))
    # XLA forward vs kernel recompute mismatch scale (see _bwd_kernel)
    tie_tol = 2.0 ** -8 if e.dtype == jnp.bfloat16 else 1e-5
    de, dsp, drp, dweights = _bwd_core(
        pe(e),
        pn(sp),
        pn(rp),
        weights,
        pn(agg.astype(jnp.float32)),
        plan,
        pe(de2_bar),
        pn(dagg_bar),
        interpret,
        tie_tol=tie_tol,
    )
    de = de[:, :E]
    dsp = dsp[:, : sp.shape[-2]]
    drp = drp[:, : rp.shape[-2]]
    if squeeze:
        de, dsp, drp = de[0], dsp[0], drp[0]

    def zero_any(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        de,
        dsp.astype(sp.dtype),
        drp.astype(rp.dtype),
        dweights,
        _zero_plan_cotangent(plan),
        zero_any(snd),
        zero_any(rcv),
        zero_any(gidx),
        zero_any(gvalid),
    )


_hybrid_vjp.defvjp(_hybrid_fwd, _hybrid_bwd)


def fused_edge_block_hybrid(
    e: Array,
    sp: Array,
    rp: Array,
    weights: dict,
    plan: BandPlan,
    num_nodes: int,
    senders: Array,
    receivers: Array,
    gather_idx: Array,
    gather_valid: Array,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Fused edge update + pna with XLA forward and Pallas backward.

    Same contract as :func:`fused_edge_block`; requires the CSR gather
    matrices (core.mesh.receivers_to_gather) for the forward aggregation.
    ``gather_idx`` rows define the aggregate's row count (= ``num_nodes``
    at the caller's row space).
    """
    wk = _edge_weights(weights)
    e2, agg = _hybrid_vjp(
        e, sp, rp, wk, plan, senders, receivers, gather_idx, gather_valid,
        interpret,
    )
    return e2, agg[..., :num_nodes, :]


# ---------------------------------------------------------------------------
# edge-sharded collective variant (shard_map halo forward)
# ---------------------------------------------------------------------------


def build_sharded_band_plans(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_shards: int,
    num_valid: Optional[int] = None,
    chunk: Optional[int] = None,
    overlap_bands: Optional[int] = None,
    shard_num_valid: Optional[Sequence[int]] = None,
) -> BandPlan:
    """Stacked per-shard band plans for an edge-sharded receiver-sorted set.

    The global (padded) edge list is split into ``num_shards`` contiguous
    slices — the same layout as ``parallel.sharding.shard_topology`` —
    and each slice gets its own plan, all built with identical static
    dimensions (``force_dims`` = maxima across shards) so the plan arrays
    stack: ``w_s``/``r_lo`` stack to ``[num_shards, C]`` and the chunk-
    indexed arrays concatenate to ``[num_shards * C, ...]``.  Sharding the
    leading axis with ``PartitionSpec('graph', ...)`` then hands each
    device exactly its local plan view (shapes identical to a
    single-device BandPlan, which is what the kernel sees inside
    shard_map).  NB: the stacked object's ``C`` property reads the global
    leading axis — it is only meaningful *inside* shard_map.

    ``overlap_bands``: also attach the per-row-band ring schedule for the
    compute-overlapped halo exchange (``ov_sched``; see
    ops/pallas/fused_overlap.py) with that many node-row bands.
    """
    snd = np.asarray(senders)
    rcv = np.asarray(receivers)
    E = len(snd)
    if E % num_shards:
        raise ValueError(f"edge count {E} not divisible by {num_shards}")
    ev = E if num_valid is None else int(num_valid)
    chunk = default_chunk() if chunk is None else chunk
    per = E // num_shards

    def shard_valid(s):
        lo = s * per
        # contiguous slices: validity is a global prefix; permuted layouts
        # (chunk round-robin for the overlap path) pass per-shard counts
        return (
            int(np.clip(ev - lo, 0, per))
            if shard_num_valid is None
            else int(shard_num_valid[s])
        )

    # one subwindow split for every shard (stacking needs equal [SB, C])
    sb_common, sb_w = 1, None
    for cand in _sb_candidates(chunk):
        w = max(
            _sender_W(
                snd[s * per : (s + 1) * per],
                rcv[s * per : (s + 1) * per],
                shard_valid(s),
                chunk,
                cand,
            )
            for s in range(num_shards)
        )
        if sb_w is None or w < sb_w:
            sb_common, sb_w = cand, w

    def shard_plan(s, force=None):
        lo = s * per
        return build_band_plan(
            snd[lo : lo + per],
            rcv[lo : lo + per],
            num_nodes,
            num_valid=shard_valid(s),
            chunk=chunk,
            force_dims=force,
            sb=sb_common,
        )

    first = [shard_plan(s) for s in range(num_shards)]
    dims = (
        max(p.W for p in first),
        max(p.WR for p in first),
        max(p.scan_steps for p in first),
        max(p.nr_tag.shape[0] for p in first),
    )
    plans = [shard_plan(s, force=dims) for s in range(num_shards)]
    ov_sched = None
    if overlap_bands:
        from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
            build_overlap_schedule,
        )

        ov_sched = build_overlap_schedule(
            plans, num_nodes, num_shards, n_bands=overlap_bands
        )
    cat = lambda get: jnp.concatenate([get(p) for p in plans], axis=0)
    return BandPlan(
        w_s=cat(lambda p: p.w_s),
        r_lo=cat(lambda p: p.r_lo),
        snd_col=cat(lambda p: p.snd_col),
        rcv_col=cat(lambda p: p.rcv_col),
        snd_row=cat(lambda p: p.snd_row),
        rcv_row=cat(lambda p: p.rcv_row),
        m_col=cat(lambda p: p.m_col),
        w_tag=plans[0].w_tag,
        wr_tag=plans[0].wr_tag,
        s_tag=plans[0].s_tag,
        nr_tag=plans[0].nr_tag,
        ov_sched=ov_sched,
    )


def band_plan_specs(P, plan: Optional[BandPlan] = None) -> BandPlan:
    """PartitionSpec pytree for a stacked sharded plan (leading axis =
    'graph'); the shape-tag arrays stay replicated.  Pass the plan to
    match its optional fields (``ov_sched`` is replicated when present)."""
    return BandPlan(
        w_s=P("graph", None),
        r_lo=P("graph", None),
        snd_col=P("graph", None, None),
        rcv_col=P("graph", None, None),
        snd_row=P("graph", None, None),
        rcv_row=P("graph", None, None),
        m_col=P("graph", None, None),
        w_tag=P(None, None),
        wr_tag=P(None, None),
        s_tag=P(None, None),
        nr_tag=P(None, None),
        ov_sched=(
            None if plan is None or plan.ov_sched is None else P(None, None)
        ),
    )


def fused_edge_block_collective(
    e: Array,  # [E_local, L] local edge shard (receiver-sorted slice)
    sp: Array,  # [N, L] node parts, replicated
    rp: Array,
    weights: dict,
    plan: BandPlan,  # LOCAL plan view (inside shard_map)
    num_nodes: int,
    axis_name: str,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Edge-sharded fused update + pna: local kernel partials + collectives.

    Runs the forward kernel unfinalized on the local edge shard, combines
    the pna partials over ``axis_name`` (sum/count -> psum, max -> pmax,
    min -> pmin — one ICI all-reduce each), then finalizes (mean division,
    empty-segment sentinels -> 0).  FORWARD-ONLY, matching the explicit
    halo path's contract (parallel/halo.py): for training use the GSPMD
    step, where XLA derives the backward collectives.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E, L = e.shape[-2], e.shape[-1]
    e_pad, sp_pad, rp_pad = _pad_to_plan(e[None], sp[None], rp[None], plan, num_nodes)
    e2, raw = _fwd_call(
        e_pad, sp_pad, rp_pad, _edge_weights(weights), plan, interpret,
        finalize=False,
    )
    s = jax.lax.psum(raw[0, :, :L], axis_name)
    n = jax.lax.psum(raw[0, :, L : 2 * L], axis_name)
    mx = jax.lax.pmax(raw[0, :, 2 * L : 3 * L], axis_name)
    mn = jax.lax.pmin(raw[0, :, 3 * L :], axis_name)
    agg = jnp.concatenate(
        [
            s,
            s / jnp.maximum(n, 1.0),
            jnp.where(mx <= -_BIG / 2, 0.0, mx),
            jnp.where(mn >= _BIG / 2, 0.0, mn),
        ],
        axis=-1,
    )
    return e2[0, :E], agg[:num_nodes]


# ---------------------------------------------------------------------------
# GSPMD-trainable edge-sharded region (shard_map inside pjit, custom VJP)
# ---------------------------------------------------------------------------
#
# The custom_vjp sits at the GLOBAL-array level and contains the shard_map:
# the fwd rule runs the forward kernel per edge shard (unfinalized partials
# -> psum/pmax/pmin over the 'graph' axis -> finalize), the bwd rule runs
# the remat backward kernel per shard against the saved GLOBAL aggregate and
# explicitly psums the node-part / weight cotangents.  Because the custom
# derivative is defined on global arrays, the surrounding GSPMD program
# (train step under jit with sharding constraints) differentiates through
# it with exact semantics — this is what lets band plans survive pjit and
# puts the fused kernel on the multi-chip TRAINING path (SURVEY.md §7.8).


def _spmd_prep(e, sp, rp, plan, num_nodes):
    """Rank-normalize ([.., E, L]) and pad to the local plan's rows."""
    squeeze = e.ndim == 2
    e3 = e[None] if squeeze else e
    sp3 = sp[None] if squeeze else sp
    rp3 = rp[None] if squeeze else rp
    e_pad, sp_pad, rp_pad = _pad_to_plan(e3, sp3, rp3, plan, num_nodes)
    return squeeze, e3.shape[1], e_pad, sp_pad, rp_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _spmd_vjp(e, sp, rp, weights, plan, num_nodes, mesh, axis_name, interpret):
    return _spmd_fwd(
        e, sp, rp, weights, plan, num_nodes, mesh, axis_name, interpret
    )[0]


def _spmd_fwd(e, sp, rp, weights, plan, num_nodes, mesh, axis_name, interpret):
    from jax.sharding import PartitionSpec as P

    L = e.shape[-1]
    mesh_axes = tuple((a, mesh.shape[a]) for a in mesh.axis_names)

    def body(e_l, sp_l, rp_l, w, plan_l):
        squeeze, E_loc, e_pad, sp_pad, rp_pad = _spmd_prep(
            e_l, sp_l, rp_l, plan_l, num_nodes
        )
        if plan_l.ov_sched is not None:
            # compute-overlapped path: ONE kernel runs the compute grid and
            # the banded RDMA ring (band partials ride ICI while later
            # chunks compute) — the stacked plan was built with
            # overlap_bands (chunk-round-robin edge sharding); returns the
            # finalized global aggregate directly
            from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
                _overlap_fwd_call,
            )

            e2, agg = _overlap_fwd_call(
                e_pad, sp_pad, rp_pad, w, plan_l, num_nodes, axis_name,
                interpret, mesh_axes,
            )
        else:
            e2, raw = _fwd_call(
                e_pad, sp_pad, rp_pad, w, plan_l, interpret, finalize=False
            )
            s = jax.lax.psum(raw[..., :L], axis_name)
            n = jax.lax.psum(raw[..., L : 2 * L], axis_name)
            mx = jax.lax.pmax(raw[..., 2 * L : 3 * L], axis_name)
            mn = jax.lax.pmin(raw[..., 3 * L :], axis_name)
            agg = jnp.concatenate(
                [
                    s,
                    s / jnp.maximum(n, 1.0),
                    jnp.where(mx <= -_BIG / 2, 0.0, mx),
                    jnp.where(mn >= _BIG / 2, 0.0, mn),
                ],
                axis=-1,
            )
        e2 = e2[:, :E_loc]
        agg = agg[:, :num_nodes]
        if squeeze:
            e2, agg = e2[0], agg[0]
        return e2, agg

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis_name),  # edge shard
            P(),  # node parts replicated
            P(),
            P(),  # weights replicated
            band_plan_specs(P, plan),  # stacked plan -> local view
        ),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )
    e2, agg = shard(e, sp, rp, weights, plan)
    return (e2, agg), (e, sp, rp, weights, plan, agg)


def _spmd_bwd(num_nodes, mesh, axis_name, interpret, res, g):
    from jax.sharding import PartitionSpec as P

    e, sp, rp, weights, plan, agg = res
    de2_bar, dagg_bar = g

    def body(e_l, sp_l, rp_l, w, plan_l, agg_l, de2_l, dagg_l):
        squeeze, E_loc, e_pad, sp_pad, rp_pad = _spmd_prep(
            e_l, sp_l, rp_l, plan_l, num_nodes
        )
        Nr = sp_pad.shape[1]
        pad_n = lambda a: jnp.pad(
            a[None] if squeeze else a,
            ((0, 0), (0, Nr - num_nodes), (0, 0)),
        )
        de2_3 = de2_l[None] if squeeze else de2_l
        de2_pad = jnp.pad(
            de2_3, ((0, 0), (0, e_pad.shape[1] - E_loc), (0, 0))
        )
        # the saved aggregate's extrema are GLOBAL; the kernel recomputes
        # this shard's e2 exactly (same kernel, same inputs), so an edge
        # matches the global max/min iff it produced it — tie_tol 0
        de, dsp, drp, dw = _bwd_core(
            e_pad, sp_pad, rp_pad, w, pad_n(agg_l), plan_l,
            de2_pad, pad_n(dagg_l), interpret,
        )
        de = de[:, :E_loc]
        dsp = dsp[:, :num_nodes]
        drp = drp[:, :num_nodes]
        if squeeze:
            de, dsp, drp = de[0], dsp[0], drp[0]
        # node-part / weight cotangents: every shard contributes through
        # its own edges — sum the partials over the edge-shard axis
        dsp = jax.lax.psum(dsp, axis_name)
        drp = jax.lax.psum(drp, axis_name)
        dw = jax.lax.psum(dw, axis_name)
        return de, dsp, drp, dw

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(), P(), P(), band_plan_specs(P, plan),
            P(),  # saved global aggregate (replicated)
            P(axis_name),  # de2 cotangent (edge-sharded)
            P(),  # dagg cotangent (one global array from the GSPMD consumer)
        ),
        out_specs=(P(axis_name), P(), P(), P()),
        check_vma=False,
    )
    de, dsp, drp, dw = shard(e, sp, rp, weights, plan, agg, de2_bar, dagg_bar)
    return (
        de.astype(e.dtype),
        dsp.astype(sp.dtype),
        drp.astype(rp.dtype),
        dw,
        _zero_plan_cotangent(plan),
    )


def _spmd_fwd_rule(e, sp, rp, weights, plan, num_nodes, mesh, axis_name, interpret):
    out, res = _spmd_fwd(
        e, sp, rp, weights, plan, num_nodes, mesh, axis_name, interpret
    )
    return out, res


_spmd_vjp.defvjp(_spmd_fwd_rule, _spmd_bwd)


def fused_edge_block_spmd(
    e: Array,  # [E_global, L] GLOBAL edge features (receiver-sorted, padded)
    sp: Array,  # [N, L] sender node parts (replicated layout)
    rp: Array,
    weights: dict,
    plan: BandPlan,  # STACKED sharded plan (build_sharded_band_plans)
    num_nodes: int,
    mesh,
    axis_name: str = "graph",
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Trainable fused edge block for edge-sharded GSPMD programs.

    Same contract as :func:`fused_edge_block` but callable INSIDE a pjit
    train step whose edges shard over ``mesh``'s ``axis_name``: forward and
    backward both run the Pallas kernels per shard under an internal
    shard_map, with psum/pmax/pmin carrying the pna partials and psums
    carrying the node/weight cotangents.  The edge count must be divisible
    by the axis size and the plan must be the stacked per-shard plan.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = mesh.shape[axis_name]
    if plan.w_s.shape[0] % g:
        raise ValueError(
            f"stacked plan has {plan.w_s.shape[0]} chunk rows, not divisible "
            f"by axis {axis_name!r} size {g}"
        )
    return _spmd_vjp(
        e, sp, rp, _edge_weights(weights), plan, num_nodes, mesh, axis_name,
        interpret,
    )
