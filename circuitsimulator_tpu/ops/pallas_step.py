"""Fused Pallas transient-chunk kernel: whole timesteps in VMEM.

The XLA hot path (analysis/transient.py "woodbury" + the Pallas k x k LU
of ops/pallas_lu.py) re-reads the per-lane constants (G0inv, Y, Y_cols)
from HBM every step — ~100 MB/step at B=8192 on dbmixer, ~45% of HBM
speed-of-light on a v5e.  This kernel instead grids over 128-lane blocks
and advances a whole CHUNK of timesteps per block with every per-lane
constant resident in VMEM (G0inv block = 492 KB at N=31), so HBM traffic
collapses to the carry in/out per chunk.

Round-1 version of this kernel was 3.2x SLOWER than the XLA path; the two
blockers identified then are fixed here:

1. Mosaic could not vectorize strided middle-axis slices (`G0inv[:, m, :]`,
   `Y[:, j, :]`) — every per-lane constant is now stored CONTRACTION-MAJOR
   (G0invT (N,N,B) indexed [m,n,lane], YT (k,N,B), Yc3 (3,k,k,B), vcoef
   (3,k,TB)), so every slice inside the loops is a static LEADING-axis
   slice: a contiguous (rows, 128) VMEM tile.
2. The in-kernel Newton loop exited per 128-lane block without freezing
   converged lanes; it now carries a per-lane `done` mask with exactly the
   masked-update semantics of the vmapped XLA loop (including the
   reference's alpha damping, clamp, and failed-lane freezing), and the
   fixed-iteration fast-Newton configuration (tran_unrolled_iters > 0)
   unrolls with the same per-lane gating.

Measured (v5e, B=8192 dbmixer, fast-Newton config, BENCH_FUSED=1):
**65.2M aggregate steps/s** vs 28.1M for the hybrid XLA+Pallas-LU path —
2.3x, ~6,860x the reference's single-core rate.  Chunk compile ~11 s
(cached across runs by the persistent compile cache).

Hardware-numerics hazard found during validation: in-kernel `jnp.dot`
defaults to the MXU's bf16 multiply passes, so the selection-matrix reads
(terminal voltages, RHS scatter, state extraction) rounded every operand
to an 8-bit mantissa — measured 1.5e-2 absolute error on a single
selection read, which integrated to ~0.4 V of trajectory divergence vs
the reference golden over the 50k-step run.  All in-kernel dots now pin
`precision=HIGHEST` (exact for 0/±1 selection operands; isolated-kernel
test shows 0.0 error).  Interpret mode matches the XLA path to 8e-5 over
200 steps (the XLA path's own f32-vs-golden drift is 3.4e-5 over the
same span); fused-vs-golden accuracy on hardware is measured by
benchmarks/validate_accuracy.py VAL_FUSED=1 (boundary-sampled, since the
kernel keeps no per-step waveform memory).

Scope (`supported()`): Backward Euler, Woodbury-eligible circuits made of
R/C/L/V/I + ALL FIVE nonlinear classes — Level-1 MOS and JFETs (no body
effect / reverse-region option), diodes (Shockley + linearized-exp
continuation + reverse breakdown), Ebers-Moll BJTs (optional Early
voltage, two interleaved V^T rows per device, parity-mask selected so no
strided slices), and smooth-transition switches (S/W elements: the
width-4 V^T row (node pair x control pair) rides the W=4 plan of
ops/woodbury.py; the log-smoothstep conductance evaluates in-kernel) —
PLUS behavioral B-sources: the compiled jnp expression and its vjp trace
INTO the kernel (per-lane gradients from a ones-cotangent pull; lanes
are independent), each source one rank-1 row over its probe pairs
(row width <= 8; CSIM_FUSED_B=0 is the safety hatch for expressions
Mosaic cannot lower) — PLUS transmission lines: the Branin delay ring
lives in VMEM as part of the chunk carry, the per-step shift is a static
leading-axis concatenate and the delayed-wave reads are STATIC slot
indices (slot ticks-1 always holds the wave from `ticks` steps ago), so
eligibility is dt-dependent (supported(engine, dt); ring block bounded
at Dmax * 2nT <= 1024 rows) — INCLUDING fully linear decks (k == 0: the
step is the exact solve x = G0inv @ b(t), no Newton machinery compiled
at all) — V AND I sources with every waveform kind
(PULSE/SIN/PWL/EXP/SFFM, mirrored formula-for-formula from
models/sources.py with static per-kind masks; PWL tables unroll
statically, <= 8 breakpoints), rank k <= 32 plus a VMEM-budget
estimate over (N, k) — `_vmem_estimate` <= 10 MB at TB=128, which
admits N=96 at k=32 and keeps the old N<=64/k<=16 envelope strictly
inside (round 4 widened the round-3 hard gate so real analog cells
ride the fused path: the 22-MOS instrumentation amp of
tests/netlists/inamp.sp is rank 22).  EVERY device class of the
engine is in scope; out-of-budget decks stay on the general XLA path.

MOSCAP=CHARGE decks run fused too (round 4): the Ward-Dutton gate +
SPICE depletion charge functions (models/moscap.py — the same single
source of truth every consumer differentiates) trace into the kernel
with their Jacobians via three in-kernel jvp passes, contributing the
plan's 5 dev-major rank-1 rows per MOS; q_prev needs NO extra chunk
carry — it is a pure function of the previous accepted x, recomputed
at step start from the incoming x (exactly update_state's qm).

TRNOISE decks run fused too (noisy Monte-Carlo at fused speed): the
per-step source-noise values are precomputed OUTSIDE the kernel by
Engine.trnoise_stream — one batched call per chunk issuing the exact
threefry draws of the XLA scan's state carry (white realizations
bitwise; the flicker AR(1) recursion to f32 fusion order, its bank
states riding the chunk carry) — and streamed in as a (chunk, nN, TB)
VMEM block whose rows scatter onto their source rows via a static
one-hot (noise_block_ok bounds it to ~4 MB).  In-kernel PRNG was
rejected: pltpu.prng_* has no interpret-mode lowering (untestable off
TPU) and a different generator would break realization parity with the
XLA path; streaming costs ~nN*B*4 bytes/step of HBM — at B=8192, nN=2
that is ~1/1500th of the XLA path's per-step constant traffic.

Validation note (tests/test_pallas_step.py): exponential-device decks
must be compared from the DC operating point — from x = 0 with full
rails the damped Newton hits the 50-iteration cap on some lanes, and a
non-converged junction iterate at ~1e5 S is chaotic, so any f32 ULP
difference between two algebraically identical implementations amplifies
to O(volts).  Every kernel piece (nl_vals per segment, the unrolled
pivoted solve, RHS/z0 assembly) was verified bitwise against the XLA
path in isolation.

Numerics match analysis/transient.py bit-for-bit in interpret mode
(tests/test_pallas_step.py) and to f32 resolution on hardware.

Reference behavior replicated: tanalisis.cpp:241-376 (fixed alpha, tol on
the damped step, max-50 NR, freeze-not-throw on non-finite per lane).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.diode import EXP_LIMIT
from ..models.moscap import mos_all_charges
from .woodbury import WoodburySolver

import os as _os

# Minimum lanes per grid block (the TPU lane width).  The runner widens
# blocks to LANE_BLOCK_TARGET when the batch divides evenly and the
# VMEM estimate fits (N <= 48): measured on v5e dbmixer B=8192,
# TB=256 runs 96.2M steps/s vs 70.8M at TB=128 (+36% — twice the work
# per VPU instruction stream amortizes the per-step scalar overhead);
# TB=512 blows the Mosaic compile budget.  CSIM_LANE_BLOCK overrides.
LANE_BLOCK = 128
LANE_BLOCK_TARGET = int(_os.environ.get("CSIM_LANE_BLOCK", "256"))


def _pick_tb(B: int, N: int, k: int = 0) -> int:
    # k > 16: the unrolled pivoted solve's Mosaic scoped-stack temporaries
    # scale with k^2 * TB — measured 19.6 MB (> the 16 MB core limit) at
    # k=22, TB=256 on v5e (inamp.sp); TB=128 keeps high-rank decks inside.
    tb = LANE_BLOCK_TARGET
    if tb > LANE_BLOCK and (B % tb or N > 48 or k > 16):
        tb = LANE_BLOCK
    return tb


def supported(engine, dt=None) -> bool:
    """Exact eligibility gate — every device/option whose stamps the kernel
    does not implement must force the general path.

    `dt` enables transmission lines: their delay ring length is
    ticks = round(TD/dt) slots, carried in VMEM, so eligibility is
    dt-dependent (without dt, T-line decks conservatively stay on the
    general path)."""
    t = engine.topo
    # behavioral B-sources trace their compiled jnp expression (and its
    # vjp) INTO the kernel; bound the row width they contribute.
    # CSIM_FUSED_B=0 falls back to the XLA Woodbury path (safety hatch
    # for expressions Mosaic cannot lower).
    if engine.b_sources:
        if _os.environ.get("CSIM_FUSED_B", "1") == "0":
            return False
        if any(2 * len(bs.pairs) > 8 for bs in engine.b_sources):
            return False
    nT = len(getattr(t, "tl_k1", ()))
    if nT:
        if dt is None or nT > 8:
            return False
        ticks = engine.tl_ticks(dt)
        # ring block = Dmax * 2nT * TB * 4 bytes in VMEM; bound it
        if int(ticks.max()) * 2 * nT > 1024:
            return False
    if engine.mos_body or engine.opts.mos_reverse_region:
        return False
    # TRNOISE decks are eligible both noise-free (no noise_key) and noisy:
    # callers precompute the per-step source-noise values with
    # Engine.trnoise_stream (the XLA path's own threefry draws) and
    # stream them in via run_chunk(noise=...) — the call sites gate on
    # noise_block_ok (VMEM bound for the per-chunk noise block)
    if engine.opts.tran_method != "be":
        return False
    # all waveform kinds evaluate in-kernel (PULSE/SIN/PWL/EXP/SFFM, V
    # and I sources); PWL tables are unrolled statically, so bound them
    if (np.any(engine.vs_kinds == 3) or np.any(engine.is_kinds == 3)) \
            and engine.pwl_width > 8:
        return False
    # Woodbury rank (1 per MOS/JFET/diode/switch/B-source, 2 per BJT,
    # +5 per MOS under MOSCAP=CHARGE — ops/woodbury.py).  k == 0 (fully
    # linear deck) is IN scope: the step degenerates to the exact solve
    # x = G0inv @ b(t), no Newton compiled.  Charge decks (round 4): the
    # Ward-Dutton + depletion charges and their jvp Jacobians evaluate
    # in-kernel; q_prev is recomputed from the incoming x each step (q is
    # a pure function of x — matches update_state), so no extra carry.
    nCq = (5 * len(t.mos_ed) if getattr(engine, "mos_charge", False)
           else 0)
    k = (len(t.mos_ed) + len(t.jf_ed) + len(t.dio_ep) + 2 * len(t.bjt_ec)
         + len(t.sw_ep) + len(engine.b_sources) + nCq)
    # static-unroll budget for the in-kernel k x k pivoted solve (the
    # elimination unrolls k column steps of O(k) traced ops each) and a
    # VMEM budget for the per-lane-block constants at TB=128 — round 3
    # hard-gated N <= 64, k <= 16; round 4 widened it to the measured
    # budget so real analog cells (a 22-MOS instrumentation amp is
    # rank 22, tests/netlists/inamp.sp) ride the fused path.
    if k > MAX_K:
        return False
    # W must match WoodburySolver's plan exactly (ops/woodbury.py:78-81):
    # behavioral sources widen it to 2*max(probe pairs) — up to 8 under
    # the 4-pair gate above.  Estimating with a capped W=4 under-counted
    # the Yc3 block by up to 2x near the budget edge.
    W = 4 if (len(t.sw_ep) or engine.b_sources) else 3
    if engine.b_sources:
        W = max(W, max(2 * len(bs.pairs) for bs in engine.b_sources))
    if _vmem_estimate(engine.N, k, W) > VMEM_BUDGET:
        return False
    return True


# In-kernel k x k pivoted-solve rank cap (round-4 widening; see
# docs/performance.md).  k <= UNROLL_K_MAX uses the fully-unrolled
# elimination (compile-time-constant masks — fastest, but its A-update
# temporaries grow the Mosaic scoped VMEM stack ~2k buffers); above it
# the same elimination runs as a lax.fori_loop whose (A, bb) carries
# keep the stack O(1), trading constant-folded masks for runtime ones.
MAX_K = 32
UNROLL_K_MAX = 16
# Per-lane-block VMEM budget at TB=128 (v5e has ~16 MB/core; leave
# headroom for Mosaic temporaries, the ring/noise/probe blocks, and the
# shared selection matrices).
VMEM_BUDGET = 10 * 1024 * 1024


def _vmem_estimate(N: int, k: int, W: int, TB: int = LANE_BLOCK) -> int:
    """Bytes of per-lane-block VMEM for the resident constants + work
    tiles: G0invT (N,N,TB), YT (k,N,TB), Yc3 (W,k,k,TB), plus ~24 N-row
    and ~8 k-row f32 work tiles (x/xprev/vc/il/z/rhs/nl state...)."""
    return 4 * TB * (N * N + k * N + W * k * k + 24 * N + 8 * max(k, 1))


def noise_block_ok(n_noisy: int, chunk_steps: int) -> bool:
    """VMEM bound for the fused TRNOISE path's per-chunk noise input
    block: (chunk, nN, TB) f32 resident per lane block — keep it under
    ~4 MB at TB=128 (8192 step-rows)."""
    return 0 < n_noisy * chunk_steps <= 8192


class PallasStepRunner:
    """Builds per-batch constants (contraction-major, lane-minor) and the
    fused chunk kernel."""

    def __init__(self, engine, bparams, dt: float, max_nr: int = 50,
                 probe_mat=None, noise_idx=None):
        """probe_mat: optional (P, N) selection matrix — when given, every
        step ALSO writes the P probe values (probe_mat @ x) to a
        (n_steps, P, B) output, so the fused path yields streaming
        waveforms (measure accumulation, yield analysis) without ever
        materializing the (B, T, N) state history.

        noise_idx: optional index array into the combined source rows
        (V rows 0..nV-1 then I rows nV..nV+nI-1) enabling TRNOISE decks
        on the fused path: run_chunk then takes a noise=(n_steps, nN, B)
        block of per-step source-noise values (precomputed OUTSIDE the
        kernel by Engine.trnoise_stream with the exact XLA-path threefry
        draws — the realization is the XLA path's, bitwise for white
        noise) and each step adds M_tn @ noise[i] to the source values,
        mirroring assemble.py terms_of's `vval + tn_v` / `ival + tn_i`."""
        assert supported(engine, dt)
        self.engine = engine
        t = engine.topo
        opts = engine.opts
        self.N = N = engine.N
        self.dt = float(dt)
        self.max_nr = int(opts.tran_max_newton_iters or max_nr)
        self.tol = float(opts.tran_tol)
        self.alpha = float(opts.tran_alpha)
        self.clamp = float(opts.tran_newton_clamp)
        self.predictor = bool(opts.tran_predictor)
        self.unrolled = int(opts.tran_unrolled_iters)
        dtype = engine.dtype

        # Woodbury factorization per lane, then lane-minor contraction-major
        G_static = jax.vmap(
            lambda p: engine.tran_static_G(p, jnp.asarray(dt, dtype),
                                           opts.tran_gmin))(bparams)
        solver = WoodburySolver(engine, jax.tree.map(lambda a: a[0], bparams),
                                G_static[0, :N, :N])
        self.k = k = solver.plan.k

        def per_lane(p, G):
            s = WoodburySolver(engine, p, G[:N, :N])
            return s.G0inv, s.Y, s.Y_cols

        G0inv, Y, Ycols = jax.vmap(per_lane)(bparams, G_static)
        B = G0inv.shape[0]
        self.B = B
        if B % LANE_BLOCK:
            raise ValueError("batch must be a multiple of 128")
        self.TB = _pick_tb(B, N, k)
        self.n_blocks = B // self.TB
        f32 = jnp.float32

        def lm(x):  # batch axis 0 -> lane-minor last axis
            return jnp.moveaxis(x, 0, -1).astype(f32)

        # G0invT[m, n, lane] = G0inv[n, m, lane]: z0 accumulation slices the
        # LEADING (contraction) axis only — Mosaic lowers those as plain
        # (N, 128) VMEM tiles, unlike the round-1 middle-axis strides.
        self.W = W = solver.plan.W                        # V^T row width
        self.G0invT = lm(G0inv).transpose(1, 0, 2)        # (N, N, B) [m,n,:]
        self.YT = lm(Y).transpose(1, 0, 2)                # (k, N, B) [j,n,:]
        self.Yc3 = lm(Ycols).transpose(1, 0, 2, 3)        # (W, k, k, B)
        self.kP = max(k, 1)
        if k == 0:
            # linear deck: dummy one-row tiles (never read in-kernel —
            # the k == 0 nr_iter accepts z0 directly)
            self.YT = jnp.zeros((1, N, B), f32)
            self.Yc3 = jnp.zeros((W, 1, 1, B), f32)

        # Nonlinear-row parameters in Woodbury plan order
        # [mos..., jfet..., diode..., bjt interleaved (Ic row, Ib row)].
        # MOS + JFET share the Level-1 linearization (the JFET is the same
        # model with VTO/2*BETA — see models/jfet.py, reference
        # element.cpp:289-304); diodes are the Shockley model with
        # linearized-exponential continuation and optional reverse
        # breakdown (models/diode.py); BJTs are Ebers-Moll with optional
        # Early voltage (models/bjt.py), two V^T rows per device.
        nM, nJ = solver.plan.nM, solver.plan.nJ
        nD, nQ = solver.plan.nD, solver.plan.nQ
        nSw = solver.plan.nS
        nB = solver.plan.nB
        nCq = solver.plan.nCq
        self.nMJ = nM + nJ
        self.nM = nM
        self.nD, self.nQ, self.nSw, self.nB = nD, nQ, nSw, nB
        self.nCq = nCq
        # static per-source metadata for the in-kernel expression trace
        self.b_meta = [(bs.fn, len(bs.pairs), bs.const_off, bs.n_consts,
                        bool(bs.is_v)) for bs in solver.plan.b_sources]
        assert self.nMJ + nD + 2 * nQ + nSw + nB + nCq == k

        def cat(a, b):
            return jnp.concatenate([a.T.astype(f32), b.T.astype(f32)], 0)

        def pad1(arr, rows):
            # zero-size parameter blocks would make degenerate VMEM tiles;
            # pad the row axis to 1 (sliced away statically in-kernel)
            if arr.shape[1]:
                return arr
            return jnp.zeros((rows, 1, arr.shape[2]), f32)

        vt = jnp.asarray(bparams["vt_thermal"], f32).reshape(-1)   # (B,)
        self.mosp = pad1(jnp.stack([
            cat(bparams["mos_vth"], bparams["jf_vto"]),
            cat(bparams["mos_k"], 2.0 * bparams["jf_beta"]),
            cat(bparams["mos_lam"], bparams["jf_lam"]),
            cat(bparams["mos_p"], bparams["jf_p"]),
        ], axis=0), 4)                                    # (4, nMJ|1, B)

        self.diop = pad1(jnp.stack([
            bparams["dio_is"].T.astype(f32),
            (bparams["dio_n"] * vt[:, None]).T.astype(f32),
            bparams["dio_bv"].T.astype(f32),
            bparams["dio_ibv"].T.astype(f32),
            jnp.broadcast_to(vt[None, :], (nD, B)).astype(f32),
        ], axis=0) if nD else jnp.zeros((5, 0, B), f32), 5)  # (5, nD|1, B)

        def rep2(a):                                      # (B, nQ) -> (2nQ, B)
            return jnp.repeat(a.T.astype(f32), 2, axis=0)

        self.bjtp = pad1(jnp.stack([
            rep2(bparams["bjt_is"]), rep2(bparams["bjt_bf"]),
            rep2(bparams["bjt_br"]), rep2(bparams["bjt_p"]),
            rep2(bparams["bjt_vaf"]),   # all-zero when bjt_early is off

            jnp.broadcast_to(vt[None, :], (2 * nQ, B)),
        ], axis=0) if nQ else jnp.zeros((6, 0, B), f32), 6)  # (6, 2nQ|1, B)

        # smooth-transition switches (models/switch.py): per-lane RON/
        # ROFF/VT/VH — the log-smoothstep conductance evaluates in-kernel
        self.swp = pad1(jnp.stack([
            bparams["sw_ron"].T.astype(f32),
            bparams["sw_roff"].T.astype(f32),
            bparams["sw_vt"].T.astype(f32),
            bparams["sw_vh"].T.astype(f32),
        ], axis=0) if nSw else jnp.zeros((4, 0, B), f32), 4)  # (4, nSw|1, B)

        # charge cap model (MOSCAP=CHARGE): per-lane charge params for the
        # in-kernel Ward-Dutton/depletion evaluation (models/moscap.py)
        self.mqp = pad1(jnp.stack([
            bparams["mos_vth"].T.astype(f32),
            bparams["mos_coxwl"].T.astype(f32),
            bparams["mos_cj0"].T.astype(f32),
            bparams["mos_p"].T.astype(f32),
        ], axis=0) if nCq else jnp.zeros((4, 0, B), f32), 4)  # (4, nM|1, B)

        # behavioral-source referenced .PARAM values, lane-minor
        # (Monte-Carlo / .STEP re-binding without recompiling the kernel)
        bc = bparams["b_consts"]
        self.bconsts = (bc.T.astype(f32) if bc.shape[-1]
                        else jnp.zeros((1, B), f32))      # (nc|1, B)

        # transmission lines: Branin delay ring in VMEM.  Ring layout
        # (Dmax, 2nT, TB), slot 0 = newest wave; the shift is a static
        # leading-axis concatenate and the delayed reads are STATIC slot
        # indices (ring shifts every step, so slot ticks-1 is always the
        # wave from `ticks` steps ago).  Mirrors assemble.tl_emfs /
        # make_update_state's ring push formula-for-formula.
        self.nT = nT = engine.n_tl
        if nT:
            ticks = engine.tl_ticks(dt)
            self.tl_read = np.asarray(ticks - 1, np.int32)   # per line
            self.Dmax = int(ticks.max())
            # wave build: w1 = (ep1 - em1) + z0 * x[k1] (and port 2);
            # pm-difference and branch reads as one-hot matmuls
            pm_rows, k_rows = [], []
            for j in range(nT):
                pm_rows.append((t.tl_ep1[j], t.tl_em1[j]))
                k_rows.append(t.tl_k1[j])
            for j in range(nT):
                pm_rows.append((t.tl_ep2[j], t.tl_em2[j]))
                k_rows.append(t.tl_k2[j])
            Mpm = np.zeros((2 * nT, N), np.float32)
            for r, (a, b) in enumerate(pm_rows):
                if a < N:
                    Mpm[r, a] += 1.0
                if b < N:
                    Mpm[r, b] -= 1.0
            Mk = np.zeros((2 * nT, N), np.float32)
            for r, kk_ in enumerate(k_rows):
                Mk[r, kk_] = 1.0
            self.M_tl_pm = Mpm
            self.M_tl_k = Mk
            z0v = bparams["tl_z0"].T.astype(f32)             # (nT, B)
            self.tl_z0 = jnp.concatenate([z0v, z0v], axis=0)  # (2nT, B)
        else:
            self.Dmax = 1
            self.tl_read = np.zeros((0,), np.int32)
            self.M_tl_pm = np.zeros((1, N), np.float32)
            self.M_tl_k = np.zeros((1, N), np.float32)
            self.tl_z0 = jnp.zeros((1, B), f32)
        self.nTP2 = max(2 * nT, 1)

        # Zero-size device classes (no V sources / caps / inductors) would
        # make degenerate VMEM tiles and zero-width block shapes; every
        # such block is padded to ONE all-zero dummy row (a zero gc/gl and
        # an all-zero M_rhs column / M_state row contribute exactly
        # nothing), and run_chunk slices the dummy rows back off.
        #
        # Independent sources — V then I in ONE combined block so the
        # waveform formulas (models/sources.py eval_tran_static_kinds)
        # evaluate every source of the circuit in one (nS, TB) tile pass.
        # PULSE/SIN/PWL/EXP/SFFM all supported; static per-kind masks let
        # unused formulas compile away, and the PWL table (<= 8
        # breakpoints, supported() gate) unrolls statically.
        nV, nI = len(t.vs_ep), len(t.is_ep)
        self.nV, self.nI = nV, nI
        nS = nV + nI
        self.nSP = nSP = max(nS, 1)

        def catsrc(key):                              # (R, nSP, B)
            a, b = bparams["vs_" + key], bparams["is_" + key]
            if a.ndim == 2:                           # (B, n) scalar packs
                a, b = a[..., None], b[..., None]
            P = max(a.shape[-1], b.shape[-1], 1)

            def padP(x):
                if x.shape[-1] < P:
                    x = jnp.concatenate(
                        [x, jnp.zeros(x.shape[:-1] + (P - x.shape[-1],),
                                      x.dtype)], axis=-1)
                return x
            cat = jnp.concatenate([padP(a), padP(b)], axis=1)  # (B, nS, P)
            out = jnp.moveaxis(cat, 0, -1).transpose(1, 0, 2)  # (P, nS, B)
            return pad1(out.astype(f32), P)

        self.src_dc = catsrc("dc")[0]                 # (nSP, B)
        self.src_pulse = catsrc("pulse")              # (7, nSP, B)
        self.src_sin = catsrc("sin")                  # (5, nSP, B)
        self.src_pwlt = catsrc("pwl_t")               # (Pp, nSP, B)
        self.src_pwlv = catsrc("pwl_v")
        self.src_pwln = catsrc("pwl_n")[0]            # (nSP, B)
        kinds = (np.concatenate([engine.vs_kinds, engine.is_kinds])
                 if nS else np.zeros((1,), np.int64))
        self.src_kinds = kinds                        # static (nSP,)
        self.kind_masks = np.stack(
            [(kinds == w).astype(np.float32) for w in (1, 2, 3, 4, 5)],
            axis=0)[:, :, None]                       # (5, nSP, 1)

        # cap-like conductances and inductor R, lane-minor
        C = jax.vmap(engine._caplike_C)(bparams)       # (B, nCap)
        gc = jnp.where(C > 0, C / dt, 0.0).T.astype(f32)   # (nCap, B)
        L = bparams["ind_l"]
        gl = jnp.where(L > 0, L / dt, 0.0).T.astype(f32)   # (nL, B)
        self.nCap = nCap = gc.shape[0]
        self.nL = nL = gl.shape[0]
        self.nCapP = nCapP = max(nCap, 1)
        self.nLP = nLP = max(nL, 1)
        self.gc = gc if nCap else jnp.zeros((1, B), f32)
        self.gl = gl if nL else jnp.zeros((1, B), f32)

        # static one-hot operators (constants baked into the kernel).
        # RHS columns: [sources (V rows +1 at vs_k, I rows -/+1 at the
        # terminals) | inductor history | cap history | T-line E1 | E2]
        M = np.zeros((N, nSP + nLP + nCapP + 2 * nT), np.float32)
        for j in range(nV):
            M[t.vs_k[j], j] = 1.0
        for j in range(nI):
            if t.is_ep[j] < N:
                M[t.is_ep[j], nV + j] -= 1.0
            if t.is_em[j] < N:
                M[t.is_em[j], nV + j] += 1.0
        for j in range(nL):
            M[t.ind_k[j], nSP + j] = 1.0
        for j in range(nCap):
            a, b = engine.cap_a[j], engine.cap_b[j]
            if a < N:
                M[a, nSP + nLP + j] += 1.0
            if b < N:
                M[b, nSP + nLP + j] -= 1.0
        for j in range(nT):
            M[t.tl_k1[j], nSP + nLP + nCapP + j] += 1.0
            M[t.tl_k2[j], nSP + nLP + nCapP + nT + j] += 1.0
        self.M_rhs = M                                  # (N, nterms)

        # terminal-read / column-read / state operators.  Rows are grouped
        # TERMINAL-MAJOR ([all d, all g, all s]) so the in-kernel reshape
        # (3, k, TB) puts the terminal index on the LEADING axis.
        def onehot_rows(idx):
            O = np.zeros((len(idx), N), np.float32)
            for j, r in enumerate(idx):
                if r < N:
                    O[j, r] = 1.0
            return O

        # one matrix serves both the terminal-voltage reads (x at each
        # row's width-3 column layout — exactly the voltages every device
        # linearization needs: (d,g,s) MOS/JFET, (p,m,·) diode, (c,b,e)
        # BJT rows) and the V^T z reads of the Woodbury solve
        Mzc = onehot_rows(solver.cols.T.ravel())        # (3k, N) term-major
        self.M_zc = Mzc if Mzc.shape[0] else np.zeros((1, N), np.float32)
        Sm = np.zeros((self.nCapP + self.nLP, N), np.float32)
        for j in range(self.nCap):
            a, b = engine.cap_a[j], engine.cap_b[j]
            if a < N:
                Sm[j, a] += 1.0
            if b < N:
                Sm[j, b] -= 1.0
        for j in range(self.nL):
            Sm[self.nCapP + j, t.ind_k[j]] = 1.0
        self.M_state = Sm                               # (nCapP+nLP, N)
        # charge model: MOS terminal reads of the INCOMING x at step
        # start (q_prev re-evaluation), terminal-major [all d, g, s]
        if nCq:
            self.M_mosq = onehot_rows(
                np.concatenate([t.mos_ed, t.mos_eg, t.mos_es]))
        else:
            self.M_mosq = np.zeros((1, N), np.float32)
        self.off_gds = float(opts.mos_off_gds)

        if probe_mat is not None:
            pm = np.asarray(probe_mat, np.float32)
            assert pm.ndim == 2 and pm.shape[1] == N
            self.nProbe = pm.shape[0]
            self.M_probe = pm if self.nProbe else np.zeros((1, N), np.float32)
        else:
            self.nProbe = None
            self.M_probe = None

        # TRNOISE row scatter: noise tile row c adds to source row
        # noise_idx[c] (V rows then I rows — the src_val layout)
        if noise_idx is not None:
            ni = np.asarray(noise_idx, np.int32).reshape(-1)
            assert ni.size and (ni >= 0).all() and (ni < nS).all()
            self.nNoise = int(ni.size)
            Mtn = np.zeros((nSP, self.nNoise), np.float32)
            for c, r in enumerate(ni):
                Mtn[int(r), c] = 1.0
            self.M_tn = Mtn
        else:
            self.nNoise = None
            self.M_tn = np.zeros((nSP, 1), np.float32)

    # ------------------------------------------------------------------
    def _kernel(self, n_steps: int):
        N, k = self.N, self.k
        nMJ, nD, nQ = self.nMJ, self.nD, self.nQ
        nSw, W = self.nSw, self.W
        nB = self.nB
        nCq, nM = self.nCq, self.nM
        b_meta = self.b_meta
        nT, Dmax, tl_read = self.nT, self.Dmax, self.tl_read
        nCapP = self.nCapP
        dt = self.dt
        tol2 = self.tol * self.tol
        alpha = self.alpha
        clamp = self.clamp
        max_nr = self.max_nr
        off_gds = self.off_gds
        predictor = self.predictor
        unrolled = self.unrolled
        probe = self.nProbe is not None
        noise = self.nNoise is not None
        kinds = self.src_kinds                         # static (nSP,)
        has_pulse = bool((kinds == 1).any())
        has_sin = bool((kinds == 2).any())
        has_pwl = bool((kinds == 3).any())
        has_exp = bool((kinds == 4).any())
        has_sffm = bool((kinds == 5).any())
        nPwl = self.src_pwlt.shape[0]

        def kern(step0_ref, Mr_ref, Mz_ref, Ms_ref, Mp_ref, Mq_ref,
                 kmask_ref,
                 G0invT_ref, YT_ref, Yc3_ref, mosp_ref, diop_ref, bjtp_ref,
                 swp_ref, mqp_ref, bconsts_ref, Mtlpm_ref, Mtlk_ref,
                 tlz0_ref,
                 dc_ref, pulse_ref, sin_ref, pwlt_ref, pwlv_ref, pwln_ref,
                 Mtn_ref, nz_ref,
                 gc_ref, gl_ref, x0_ref, xp0_ref, vc0_ref, il0_ref,
                 tlw0_ref,
                 f0_ref, xo_ref, xpo_ref, vco_ref, ilo_ref, tlwo_ref,
                 fo_ref, it_ref,
                 *maybe_yo_ref):
            G0invT = G0invT_ref[:]
            YT = YT_ref[:]
            Yc3 = Yc3_ref[:]
            vth = mosp_ref[0]
            kk = mosp_ref[1]
            lam = mosp_ref[2]
            pp = mosp_ref[3]
            gc = gc_ref[:]
            gl = gl_ref[:]
            step0 = step0_ref[0]

            if nCq:
                # charge cap model: the Ward-Dutton + depletion charge
                # functions (models/moscap.py — the SAME single source
                # of truth every consumer differentiates) trace into the
                # kernel; Jacobians via three in-kernel jvp passes.
                vth_q = mqp_ref[0]
                cox_q = mqp_ref[1]
                cj_q = mqp_ref[2]
                p_q = mqp_ref[3]

                def qfun(vd_, vg_, vs_):
                    return mos_all_charges(vd_, vg_, vs_, vth_q, cox_q,
                                           cj_q, p_q)

                def devmaj(tup):          # 5-tuple of (nM,TB) -> (5nM,TB)
                    return jnp.stack(tup, axis=1).reshape(5 * nM, TB)

                def rep5(v):              # (nM,TB) -> (5nM,TB) dev-major
                    return jnp.broadcast_to(
                        v[:, None, :], (nM, 5, TB)).reshape(5 * nM, TB)

            Mr = Mr_ref[:]
            Mz = Mz_ref[:]
            Ms = Ms_ref[:]
            TB = gc.shape[-1]
            if k:
                ridk0 = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
                cidk0 = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
                eye_k = (ridk0 == cidk0).astype(jnp.float32)
                ridk = jax.lax.broadcasted_iota(jnp.int32, (k, TB), 0)

            def _dot(M, v):
                # HIGHEST precision: the MXU's default f32 path multiplies
                # in bf16 passes, which rounds every terminal-voltage /
                # RHS read to an 8-bit mantissa per Newton iteration —
                # measured as mV-level per-step noise that integrates to
                # ~0.4 V of trajectory divergence over the 50k-step run.
                return jnp.dot(M, v, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

            u_max = jnp.asarray(EXP_LIMIT, jnp.float32)
            exp_umax = jnp.exp(u_max)

            def _exp_lim(u):
                """Linearized-exponential continuation (models/diode.py):
                value and derivative, continuous at u = EXP_LIMIT."""
                e = jnp.exp(jnp.minimum(u, u_max))
                val = jnp.where(u <= u_max, e,
                                exp_umax * (1.0 + (u - u_max)))
                der = jnp.where(u <= u_max, e, exp_umax)
                return val, der

            def _clamp01(x):
                return jnp.clip(x, 0.0, 1.0)

            def _safe_div(num, den):
                """models/sources.py _safe_div: IEEE x/0 -> +/-inf by the
                sign of num (0/0 -> +inf, NaN-free for the clamps)."""
                inf = jnp.asarray(jnp.inf, jnp.float32)
                zero_den = jnp.where(num < 0.0, -inf, inf)
                return jnp.where(den != 0.0,
                                 num / jnp.where(den != 0.0, den, 1.0),
                                 zero_den)

            def src_val(tt):
                """All independent sources (V then I) at time tt: dc +
                waveform, mirroring models/sources.py
                eval_tran_static_kinds formula-for-formula.  Static
                per-kind masks; unused kinds compile away."""
                out = dc_ref[:]                       # (nSP, TB)
                if has_pulse:
                    v1 = pulse_ref[0]
                    v2 = pulse_ref[1]
                    ptd = pulse_ref[2]
                    tr = pulse_ref[3]
                    tf = pulse_ref[4]
                    ton = pulse_ref[5]
                    per = pulse_ref[6]
                    tau1 = tt - ptd
                    rise1 = v1 + _clamp01(_safe_div(tau1, tr)) * (v2 - v1)
                    tfall1 = tau1 - (tr + ton)
                    fall1 = v2 + _clamp01(_safe_div(tfall1, tf)) * (v1 - v2)
                    single = jnp.where(
                        tau1 <= 0.0, v1,
                        jnp.where(tau1 < tr, rise1,
                                  jnp.where(tau1 < tr + ton, v2, fall1)))
                    safe_per = jnp.where(per > 0.0, per, 1.0)
                    tau2 = jnp.mod(tt - ptd, safe_per)
                    rise2 = v1 + (v2 - v1) * _clamp01(_safe_div(tau2, tr))
                    tfall2 = tau2 - (tr + ton)
                    fall2 = v2 + (v1 - v2) * _clamp01(_safe_div(tfall2, tf))
                    periodic = jnp.where(
                        tt < ptd, v1,
                        jnp.where(tau2 < tr, rise2,
                                  jnp.where(tau2 < tr + ton, v2,
                                            jnp.where(tau2 < tr + ton + tf,
                                                      fall2, v1))))
                    out = out + kmask_ref[0] * jnp.where(per <= 0.0, single,
                                                         periodic)
                if has_sin:
                    v0 = sin_ref[0]
                    va = sin_ref[1]
                    w = (2.0 * jnp.pi) * sin_ref[2]
                    std = sin_ref[3]
                    phi = sin_ref[4]
                    tau = tt - std
                    sv = jnp.where(tt < std, v0,
                                   v0 + va * jnp.sin(w * tau + phi))
                    out = out + kmask_ref[1] * sv
                if has_pwl:
                    pwln = pwln_ref[:]                 # (nSP, TB) f32 count
                    big = jnp.asarray(3.0e38, jnp.float32)
                    cnt = jnp.zeros_like(out)
                    for j in range(nPwl):
                        valid = jnp.asarray(float(j), jnp.float32) < pwln
                        ttj = jnp.where(valid, pwlt_ref[j], big)
                        cnt = cnt + jnp.where((ttj < tt) & valid, 1.0, 0.0)
                    i0 = jnp.clip(cnt - 1.0, 0.0, float(nPwl - 1))
                    i1 = jnp.clip(cnt, 0.0, float(nPwl - 1))
                    lastidx = jnp.clip(pwln - 1.0, 0.0, float(nPwl - 1))
                    t_i = jnp.zeros_like(out)
                    t_i1 = jnp.zeros_like(out)
                    v_i = jnp.zeros_like(out)
                    v_i1 = jnp.zeros_like(out)
                    last_t = jnp.zeros_like(out)
                    last_v = jnp.zeros_like(out)
                    for j in range(nPwl):
                        jj = jnp.asarray(float(j), jnp.float32)
                        s0 = jnp.where(i0 == jj, 1.0, 0.0)
                        s1 = jnp.where(i1 == jj, 1.0, 0.0)
                        sl = jnp.where(lastidx == jj, 1.0, 0.0)
                        t_i = t_i + s0 * pwlt_ref[j]
                        v_i = v_i + s0 * pwlv_ref[j]
                        t_i1 = t_i1 + s1 * pwlt_ref[j]
                        v_i1 = v_i1 + s1 * pwlv_ref[j]
                        last_t = last_t + sl * pwlt_ref[j]
                        last_v = last_v + sl * pwlv_ref[j]
                    kfr = _safe_div(tt - t_i, t_i1 - t_i)
                    mid = v_i + (v_i1 - v_i) * kfr
                    first_t = pwlt_ref[0]
                    first_v = pwlv_ref[0]
                    pv = jnp.where(tt <= first_t, first_v,
                                   jnp.where(tt >= last_t, last_v, mid))
                    pv = jnp.where(pwln == 0.0, 0.0, pv)
                    out = out + kmask_ref[2] * pv
                if has_exp:
                    v1 = pulse_ref[0]
                    v2 = pulse_ref[1]
                    td1 = pulse_ref[2]
                    tau1_ = pulse_ref[3]
                    td2 = pulse_ref[4]
                    tau2_ = pulse_ref[5]
                    dv = v2 - v1

                    def seg(td_, tau_, amp):
                        full = jnp.where(tt > td_, amp, 0.0)
                        decay = amp * (1.0 - jnp.exp(
                            -jnp.maximum(tt - td_, 0.0)
                            / jnp.where(tau_ > 0.0, tau_, 1.0)))
                        return jnp.where(tau_ > 0.0,
                                         jnp.where(tt > td_, decay, 0.0),
                                         full)

                    out = out + kmask_ref[3] * (v1 + seg(td1, tau1_, dv)
                                                + seg(td2, tau2_, -dv))
                if has_sffm:
                    vo = sin_ref[0]
                    va = sin_ref[1]
                    fc = sin_ref[2]
                    mdi = sin_ref[3]
                    fs = sin_ref[4]
                    two_pi = 2.0 * jnp.pi
                    sv = vo + va * jnp.sin(two_pi * fc * tt
                                           + mdi * jnp.sin(two_pi * fs * tt))
                    out = out + kmask_ref[4] * sv
                return out

            def nl_vals(x, tt, qprev=None):
                """Per-V^T-row linearization coefficients at x — MOS/JFET,
                diode, BJT, switch, behavioral, and charge-cap segments in
                Woodbury plan order.  Mirrors WoodburySolver.nl_coeffs
                (ops/woodbury.py) formula-for-formula so trajectories
                match the XLA path bitwise in interpret mode.  All slices
                are static leading-axis slices of (k, TB) tiles.  `tt`
                only matters for time-dependent behavioral expressions.
                qprev (charge decks): 5-tuple of (nM, TB) accepted charges
                of the previous step (engine.mosq_linearize, BE form)."""
                xm = _dot(Mz, x)
                xm = xm.reshape(W, k, TB)               # terminal-major

                def stackW(rows):
                    """Width-3 coefficient rows padded to plan width W
                    (the padded slot maps to the dump column)."""
                    if W > len(rows):
                        rows = list(rows) + [jnp.zeros_like(rows[0])] \
                            * (W - len(rows))
                    return jnp.stack(rows, axis=0)

                vparts, cparts = [], []
                if nMJ:
                    vd = xm[0][:nMJ]
                    vg = xm[1][:nMJ]
                    vs = xm[2][:nMJ]
                    vgs = pp * (vg - vs)
                    vds = pp * (vd - vs)
                    on = (vgs > vth) & (vds >= 0.0)
                    vov = vgs - vth
                    tri = vds < vov
                    ids0 = jnp.where(
                        on, jnp.where(tri,
                                      kk * (vov * vds - 0.5 * vds * vds),
                                      0.5 * kk * vov * vov), 0.0)
                    gds0 = jnp.where(on,
                                     jnp.where(tri, kk * (vov - vds), 0.0),
                                     off_gds)
                    gm0 = jnp.where(on, jnp.where(tri, kk * vds, kk * vov),
                                    0.0)
                    fac = jnp.maximum(1.0 + lam * vds, 0.0)
                    gd = gds0 * fac + ids0 * lam
                    gg = gm0 * fac
                    gs_ = -(gd + gg)
                    cst = pp * ids0 * fac - gd * vd - gg * vg - gs_ * vs
                    vparts.append(stackW([gd, gg, gs_]))
                    cparts.append(cst)
                if nD:
                    vp = xm[0][nMJ:nMJ + nD]
                    vm_ = xm[1][nMJ:nMJ + nD]
                    isat = diop_ref[0]
                    nvt = diop_ref[1]
                    bv = diop_ref[2]
                    ibv = diop_ref[3]
                    vt_d = diop_ref[4]
                    v = vp - vm_
                    u = v / nvt
                    exp_u, dexp_u = _exp_lim(u)
                    i = isat * (exp_u - 1.0)
                    g = isat * dexp_u / nvt
                    # reverse breakdown (zener; no-op at bv == 0)
                    bd_on = bv > 0.0
                    ub = jnp.where(bd_on, -(v + bv) / vt_d,
                                   jnp.asarray(-jnp.inf, jnp.float32))
                    exp_b, dexp_b = _exp_lim(ub)
                    i = i - jnp.where(bd_on, ibv * exp_b, 0.0)
                    g = g + jnp.where(bd_on, ibv * dexp_b / vt_d, 0.0)
                    cst = i - g * v
                    vparts.append(stackW([g, -g, jnp.zeros_like(g)]))
                    cparts.append(cst)
                if nQ:
                    # both Ebers-Moll current rows evaluated on all 2nQ
                    # (row-duplicated) lanes, then parity-selected — no
                    # strided slices (even rows = Ic, odd rows = Ib)
                    vc_ = xm[0][nMJ + nD:nMJ + nD + 2 * nQ]
                    vb_ = xm[1][nMJ + nD:nMJ + nD + 2 * nQ]
                    ve_ = xm[2][nMJ + nD:nMJ + nD + 2 * nQ]
                    isat = bjtp_ref[0]
                    bf = bjtp_ref[1]
                    br = bjtp_ref[2]
                    pq = bjtp_ref[3]
                    vaf = bjtp_ref[4]
                    vt_q = bjtp_ref[5]
                    vbe = pq * (vb_ - ve_)
                    vbc = pq * (vb_ - vc_)
                    ef, def_ = _exp_lim(vbe / vt_q)
                    er, der_ = _exp_lim(vbc / vt_q)
                    i_f = isat * (ef - 1.0)
                    i_r = isat * (er - 1.0)
                    gf = isat * def_ / vt_q
                    gr = isat * der_ / vt_q
                    # Early voltage (models/bjt.py; kq == 1 at vaf == 0)
                    ea_on = vaf > 0.0
                    safe_vaf = jnp.where(ea_on, vaf, 1.0)
                    raw = 1.0 - vbc / safe_vaf
                    kq = jnp.where(ea_on, jnp.maximum(raw, 0.05), 1.0)
                    dkq = jnp.where(ea_on & (raw > 0.05),
                                    -1.0 / safe_vaf, 0.0)
                    ic_eff = (i_f - i_r) * kq - i_r / br
                    ib_eff = i_f / bf + i_r / br
                    dic_dvbe = gf * kq
                    dic_dvbc = -gr * kq + (i_f - i_r) * dkq - gr / br
                    dib_dvbe = gf / bf
                    dib_dvbc = gr / br
                    gc_b = dic_dvbe + dic_dvbc
                    gc_e = -dic_dvbe
                    gc_c = -dic_dvbc
                    gb_b = dib_dvbe + dib_dvbc
                    gb_e = -dib_dvbe
                    gb_c = -dib_dvbc
                    ic = pq * ic_eff
                    ib = pq * ib_eff
                    cst_c = ic - gc_c * vc_ - gc_b * vb_ - gc_e * ve_
                    cst_b = ib - gb_c * vc_ - gb_b * vb_ - gb_e * ve_
                    par = (jax.lax.broadcasted_iota(jnp.int32,
                                                    (2 * nQ, TB), 0)
                           % 2) == 0                      # even -> Ic row
                    g0 = jnp.where(par, gc_c, gb_c)
                    g1 = jnp.where(par, gc_b, gb_b)
                    g2 = jnp.where(par, gc_e, gb_e)
                    vparts.append(stackW([g0, g1, g2]))
                    cparts.append(jnp.where(par, cst_c, cst_b))
                if nSw:
                    # smooth-transition switch (models/switch.py
                    # switch_conductance, mirrored formula-for-formula):
                    # i = G(vc)*vd, width-4 row [gd, -gd, gc, -gc] at
                    # columns (p, m, cp, cm)
                    o = nMJ + nD + 2 * nQ
                    vp_s = xm[0][o:]
                    vm_s = xm[1][o:]
                    vcp_s = xm[2][o:]
                    vcm_s = xm[3][o:]
                    ron = swp_ref[0]
                    roff = swp_ref[1]
                    svt = swp_ref[2]
                    svh = swp_ref[3]
                    vd_s = vp_s - vm_s
                    vc_s = vcp_s - vcm_s
                    g_on = 1.0 / ron
                    g_off = 1.0 / roff
                    l_on = jnp.log(g_on)
                    l_off = jnp.log(g_off)
                    has_win = svh > 0.0
                    width_s = jnp.where(has_win, 2.0 * svh, 1.0)
                    u_s = jnp.clip((vc_s - (svt - svh)) / width_s, 0.0, 1.0)
                    u_s = jnp.where(has_win, u_s,
                                    (vc_s > svt).astype(jnp.float32))
                    s_s = u_s * u_s * (3.0 - 2.0 * u_s)
                    Gs = jnp.exp(l_off + (l_on - l_off) * s_s)
                    dsdu = 6.0 * u_s * (1.0 - u_s)
                    dGs = jnp.where(has_win,
                                    Gs * (l_on - l_off) * dsdu / width_s,
                                    0.0)
                    gd_s = Gs
                    gc_s = dGs * vd_s
                    i0_s = Gs * vd_s
                    cst_s = i0_s - gd_s * vd_s - gc_s * vc_s
                    sw_rows = jnp.stack([gd_s, -gd_s, gc_s, -gc_s], axis=0)
                    if W > 4:
                        sw_rows = jnp.concatenate(
                            [sw_rows, jnp.zeros((W - 4,) + sw_rows.shape[1:],
                                                sw_rows.dtype)], axis=0)
                    vparts.append(sw_rows)
                    cparts.append(cst_s)
                if nB:
                    # behavioral sources: the compiled jnp expression (and
                    # its vjp) trace INTO the kernel.  Each source is one
                    # rank-1 row over its probe pairs; per-lane gradients
                    # come from a vjp pull with a ones cotangent (lanes
                    # are independent, so this IS the per-lane dfn/dvals).
                    ob = nMJ + nD + 2 * nQ + nSw
                    for j, (fn, m, coff, ncst, is_v) in enumerate(b_meta):
                        row = ob + j
                        vals = jnp.stack(
                            [xm[2 * i][row] - xm[2 * i + 1][row]
                             for i in range(m)], axis=0)      # (m, TB)
                        consts = bconsts_ref[:][coff:coff + ncst]
                        e0, pull = jax.vjp(
                            lambda v: fn(v, tt, consts), vals)
                        (grads,) = pull(jnp.ones_like(e0))
                        cst = e0 - jnp.sum(grads * vals, axis=0)
                        sig = -1.0 if is_v else 1.0
                        rows = []
                        for i in range(m):
                            rows += [sig * grads[i], -sig * grads[i]]
                        rows += [jnp.zeros_like(e0)] * (W - 2 * m)
                        vparts.append(jnp.stack(rows, axis=0)[:, None, :])
                        cparts.append((-cst if is_v else cst)[None, :])
                if nCq:
                    # charge cap rows (engine.mosq_linearize, BE):
                    # g = (dq/dv)/dt, cst = (q(v) - q_prev)/dt - g·v —
                    # 5 dev-major rows per MOS reading (vd, vg, vs)
                    vd_q = xm[0][:nM]
                    vg_q = xm[1][:nM]
                    vs_q = xm[2][:nM]
                    ones_q = jnp.ones((nM, TB), jnp.float32)
                    zer_q = jnp.zeros((nM, TB), jnp.float32)
                    prim = (vd_q, vg_q, vs_q)
                    q_now = qfun(*prim)
                    _, Jd = jax.jvp(qfun, prim, (ones_q, zer_q, zer_q))
                    _, Jg = jax.jvp(qfun, prim, (zer_q, ones_q, zer_q))
                    _, Js = jax.jvp(qfun, prim, (zer_q, zer_q, ones_q))
                    inv_dt = 1.0 / dt
                    gd_q = devmaj(Jd) * inv_dt
                    gg_q = devmaj(Jg) * inv_dt
                    gs_q = devmaj(Js) * inv_dt
                    cst_q = ((devmaj(q_now) - devmaj(qprev)) * inv_dt
                             - gd_q * rep5(vd_q) - gg_q * rep5(vg_q)
                             - gs_q * rep5(vs_q))
                    vparts.append(stackW([gd_q, gg_q, gs_q]))
                    cparts.append(cst_q)
                if len(vparts) == 1:
                    return vparts[0], cparts[0]
                return (jnp.concatenate(vparts, axis=1),
                        jnp.concatenate(cparts, axis=0))

            def accept(xx, done, failed, x_raw):
                """The XLA loop's exact per-lane masked-update semantics
                (analysis/transient.py body): clamp, damping, tolerance
                test, freeze of done/failed lanes.

                `done`/`failed` are float32 0/1 masks, NOT bools: Mosaic
                cannot legalize i1 vectors carried through scf.for/while
                (bool vectors are fine as local values, just not as loop
                carries)."""
                finite = jnp.all(jnp.isfinite(x_raw), axis=0)   # (TB,) bool
                upd_vec = x_raw - xx
                if clamp > 0.0:
                    upd_vec = jnp.clip(upd_vec, -clamp, clamp)
                x_new = xx + alpha * upd_vec
                err2 = jnp.sum((x_new - xx) ** 2, axis=0)       # (TB,)
                upd = finite & (done < 0.5)
                xx = jnp.where(upd[None, :], x_new, xx)
                newly_done = (upd & (err2 < tol2)) | jnp.logical_not(finite)
                done = jnp.maximum(done, jnp.where(newly_done, 1.0, 0.0))
                failed = jnp.maximum(failed,
                                     jnp.where(finite, 0.0, 1.0))
                return xx, done, failed

            def nr_iter_linear(xx, done, failed, z0, tt, qprev=None):
                """k == 0 (no nonlinear V^T rows): G x = b is already
                solved by z0 = G0inv @ b — each 'iteration' just runs the
                shared accept semantics, matching the XLA loop's
                trajectory (WoodburySolver.solve returns z0 at k == 0)
                under every alpha/clamp/tolerance configuration."""
                return accept(xx, done, failed, z0)

            def nr_iter(xx, done, failed, z0, tt, qprev=None):
                """One Newton iteration: rank-k Woodbury correction of z0
                followed by the shared accept semantics."""
                vcoef, cst = nl_vals(xx, tt, qprev)
                # z = z0 - YT^T @ cst (leading-axis slices only)
                z = z0
                for j in range(k):
                    z = z - YT[j] * cst[j:j + 1, :]
                # S = I + sum_s vcoef[s][:, None, :] * Yc3[s]
                S = eye_k[:, :, None]
                for s_ in range(W):
                    S = S + vcoef[s_][:, None, :] * Yc3[s_]
                zc3 = _dot(Mz, z)
                zc3 = zc3.reshape(W, k, TB)
                vz = vcoef[0] * zc3[0]
                for s_ in range(1, W):
                    vz = vz + vcoef[s_] * zc3[s_]        # (k, TB)
                if k <= UNROLL_K_MAX:
                    # unrolled pivoted k x k solve (lane-minor): every
                    # column step's masks are compile-time constants, so
                    # Mosaic folds them — fastest at small k, but the
                    # per-step A-update temporaries live on the scoped
                    # VMEM stack (~2k buffers of k*k*TB*4 B: 19.6 MB at
                    # k=22/TB=256, past the 16 MB core limit)
                    A = S
                    bb = vz
                    for c_ in range(k):
                        col = A[:, c_, :]
                        absc = jnp.where(ridk >= c_, jnp.abs(col), -1.0)
                        p_ = jnp.argmax(absc, axis=0)
                        onep = (ridk == p_[None, :]).astype(jnp.float32)
                        rowp = jnp.sum(A * onep[:, None, :], axis=0)
                        rowk = A[c_, :, :]
                        isp = (ridk == p_[None, :])[:, None, :]
                        isk = (ridk == c_)[:, None, :]
                        A = jnp.where(isp, rowk[None], A)
                        A = jnp.where(isk, rowp[None], A)
                        bp = jnp.sum(bb * onep, axis=0)
                        bk = bb[c_, :]
                        bb = jnp.where(ridk == p_[None, :], bk[None], bb)
                        bb = jnp.where(ridk == c_, bp[None], bb)
                        piv = rowp[c_, :]
                        safe = jnp.where(piv != 0.0, piv, 1.0)
                        fac = jnp.where(ridk > c_, A[:, c_, :] / safe, 0.0)
                        A = A - fac[:, None, :] * rowp[None]
                        bb = bb - fac * bp[None]
                    ww = jnp.zeros_like(bb)
                    for j in range(k - 1, -1, -1):
                        s = bb[j, :] - jnp.sum(A[j, :, :] * ww, axis=0)
                        d = A[j, j, :]
                        wj = s / jnp.where(d != 0.0, d, 1.0)
                        ww = jnp.where(ridk == j, wj[None], ww)
                else:
                    # k > UNROLL_K_MAX (high-rank decks admitted by the
                    # round-4 gate): column-pivoted GAUSS-JORDAN as a
                    # lax.fori_loop.  The body compiles once and (A, bb)
                    # are loop carries, so the Mosaic scoped stack stays
                    # O(1) buffers instead of the unrolled path's O(k)
                    # (19.6 MB at k=22/TB=256 — past the 16 MB core
                    # limit; the k=22 unrolled compile also ran past 14
                    # minutes).  Gauss-Jordan needs no row swaps and no
                    # back-substitution — ~4 (k,k,TB) passes per column
                    # vs ~9 for a masked-swap GE (measured 0.73x of the
                    # XLA hybrid on v5e; GJ recovers the fused lead).
                    # Per-lane pivoting (argmax per lane) forces masked
                    # reductions — a dynamic row slice cannot vary by
                    # lane.  Pivot choice differs from the LU's partial
                    # pivoting, so trajectories agree with the XLA path
                    # to f32 resolution, not bitwise (same bar as the
                    # exp-device decks; tests/test_pallas_step.py).
                    cid3 = jax.lax.broadcasted_iota(jnp.int32,
                                                    (k, k, TB), 1)

                    def gj_body(c_, carry):
                        A, bb, used, colof = carry
                        col = jnp.sum(jnp.where(cid3 == c_, A, 0.0),
                                      axis=1)                    # (k,TB)
                        absc = jnp.where(used < 0.5, jnp.abs(col), -1.0)
                        p_ = jnp.argmax(absc, axis=0)            # (TB,)
                        onep = (ridk == p_[None, :]).astype(jnp.float32)
                        rowp = jnp.sum(A * onep[:, None, :], axis=0)
                        bp = jnp.sum(bb * onep, axis=0)
                        piv = jnp.sum(
                            rowp * (ridk == c_).astype(jnp.float32),
                            axis=0)
                        safe = jnp.where(piv != 0.0, piv, 1.0)
                        fac = jnp.where(ridk == p_[None, :], 0.0,
                                        col / safe)
                        A = A - fac[:, None, :] * rowp[None]
                        bb = bb - fac * bp[None]
                        used = jnp.maximum(used, onep)
                        colof = colof + onep.astype(jnp.int32) * c_
                        return (A, bb, used, colof)

                    A, bb, _, colof = lax.fori_loop(
                        0, k, gj_body,
                        (S, vz, jnp.zeros((k, TB), jnp.float32),
                         jnp.zeros((k, TB), jnp.int32)))
                    # each row p ends with a single surviving entry at
                    # its pivot column c(p): w[c(p)] = bb[p] / A[p,c(p)]
                    P3 = (cid3 == colof[:, None, :])
                    pivd = jnp.sum(jnp.where(P3, A, 0.0), axis=1)
                    wrow = bb / jnp.where(pivd != 0.0, pivd, 1.0)
                    ww = jnp.sum(
                        jnp.where(P3, wrow[:, None, :], 0.0), axis=0)
                x_raw = z
                for j in range(k):
                    x_raw = x_raw - YT[j] * ww[j:j + 1, :]
                return accept(xx, done, failed, x_raw)

            if k == 0:
                nr_iter = nr_iter_linear

            def step_body(i, carry):
                x, xprev, vc, il, ring, failed, it_acc = carry
                t = (step0 + i.astype(jnp.float32) + 1.0) * dt
                # source values at t (V rows then I rows) + history terms
                sv = src_val(t)
                if noise:
                    # TRNOISE: this step's precomputed per-source noise
                    # values scatter onto their source rows (terms_of's
                    # vval+tn_v / ival+tn_i) — one (nN, TB) tile per step
                    nz = nz_ref[pl.ds(i, 1)][0]
                    sv = sv + _dot(Mtn_ref[:], nz)
                parts = [sv, -(gl * il), gc * vc]
                if nT:
                    # delayed-wave Thevenin EMFs: slot ticks-1 is the wave
                    # from `ticks` steps ago (ring shifts every step, so
                    # the read indices are STATIC).  E1 <- w2, E2 <- w1
                    # (assemble.tl_emfs)
                    e1 = jnp.stack([ring[tl_read[j], nT + j]
                                    for j in range(nT)], axis=0)
                    e2 = jnp.stack([ring[tl_read[j], j]
                                    for j in range(nT)], axis=0)
                    parts += [e1, e2]
                terms = jnp.concatenate(parts, axis=0)
                b0 = _dot(Mr, terms)
                # z0 = G0inv @ b0 per lane: accumulate over the CONTRACTION
                # index m with leading-axis slices of the pre-transposed
                # G0invT — each term is a full (N, TB) vector FMA.
                z0 = G0invT[0] * b0[0:1, :]
                for m in range(1, N):
                    z0 = z0 + G0invT[m] * b0[m:m + 1, :]

                x_init = 2.0 * x - xprev if predictor else x

                if nCq:
                    # charge decks: q_prev = q(x of the previous step) —
                    # q is a pure function of x, so recomputing it here
                    # IS update_state's qm (no extra chunk carry needed)
                    vq = _dot(Mq_ref[:], x).reshape(3, nM, TB)
                    q_prev = qfun(vq[0], vq[1], vq[2])
                else:
                    q_prev = None

                if unrolled > 0:
                    xx, done, fl = x_init, failed, failed
                    for _ in range(unrolled):
                        xx, done, fl = nr_iter(xx, done, fl, z0, t,
                                               q_prev)
                    iters = jnp.asarray(unrolled, jnp.int32)
                else:
                    def nr_cond(c):
                        xx, done, fl, it = c
                        return jnp.logical_and(jnp.min(done) < 0.5,
                                               it < max_nr)

                    def nr_body(c):
                        xx, done, fl, it = c
                        xx, done, fl = nr_iter(xx, done, fl, z0, t,
                                               q_prev)
                        return xx, done, fl, it + 1

                    xx, done, fl, iters = lax.while_loop(
                        nr_cond, nr_body,
                        (x_init, failed, failed, jnp.asarray(0, jnp.int32)))
                # state updates from the accepted x (tanalisis.cpp:379-417)
                st = _dot(Ms, xx)
                vc = st[:nCapP, :]
                il = st[nCapP:, :]
                if nT:
                    # push this step's outgoing waves into slot 0
                    # (make_update_state's ring shift)
                    w = (_dot(Mtlpm_ref[:], xx)
                         + tlz0_ref[:] * _dot(Mtlk_ref[:], xx))
                    ring = jnp.concatenate([w[None], ring[:-1]], axis=0)
                if probe:
                    # streaming probe write: one (P, TB) tile per step
                    maybe_yo_ref[0][pl.ds(i, 1)] = _dot(Mp_ref[:], xx)[None]
                return xx, x, vc, il, ring, fl, it_acc + iters

            failed0 = f0_ref[:][0]                          # (TB,) f32 0/1
            x, xprev, vc, il, ring, failed, iters = lax.fori_loop(
                0, n_steps, step_body,
                (x0_ref[:], xp0_ref[:], vc0_ref[:], il0_ref[:],
                 tlw0_ref[:], failed0, jnp.asarray(0, jnp.int32)))
            xo_ref[:] = x
            xpo_ref[:] = xprev
            vco_ref[:] = vc
            ilo_ref[:] = il
            tlwo_ref[:] = ring
            fo_ref[:] = failed[None, :]
            it_ref[pl.program_id(0)] = iters

        return kern

    def run_chunk(self, x, x_prev, vc, il, failed, step0, n_steps: int,
                  interpret: bool = False, tlw=None, noise=None):
        """Advance n_steps.  x/x_prev (B, N), vc (B, nCap), il (B, nL)
        lane-major; failed (B,) bool; step0 may be traced (jit arg) so
        consecutive chunks share one compilation.  For T-line decks pass
        tlw (B, Dmax, 2nT), the delay ring from Engine.init_state.
        With noise_idx set, pass noise (n_steps, nN, B): per-step source
        noise values from Engine.trnoise_stream (lane-minor last).
        Returns the advanced carry (x, x_prev, vc, il, failed, per-block
        iteration counts); with probe_mat set, also the (n_steps, P, B)
        raw probe waveform block; for T-line decks the advanced ring
        (B, Dmax, 2nT) is the LAST element."""
        B = self.B
        N, nCap, nL = self.N, self.nCap, self.nL
        nCapP, nLP = self.nCapP, self.nLP
        TB = self.TB
        grid = (B // TB,)
        f32 = jnp.float32
        probe = self.nProbe is not None
        xt = x.T.astype(f32)
        xpt = x_prev.T.astype(f32)
        vct = vc.T.astype(f32) if nCap else jnp.zeros((1, B), f32)
        ilt = il.T.astype(f32) if nL else jnp.zeros((1, B), f32)
        nT = self.nT
        if nT:
            assert tlw is not None, "T-line deck needs the delay ring"
            # (B, Dmax, 2nT) -> (Dmax, 2nT, B); Engine rings may be
            # longer than Dmax (vmapped init pads to the batch max) —
            # slots beyond Dmax are never read at this dt
            tlt = jnp.moveaxis(tlw, 0, -1).astype(f32)[:self.Dmax]
        else:
            tlt = jnp.zeros((1, 1, B), f32)
        ft = failed.astype(f32)[None, :]
        step0_arr = jnp.asarray(step0, f32).reshape(1)
        noise_on = self.nNoise is not None
        if noise_on:
            assert noise is not None and noise.shape == (
                n_steps, self.nNoise, B), (noise is not None
                                           and noise.shape)
            nzt = noise.astype(f32)
            nz_rows = n_steps
        else:
            assert noise is None
            nzt = jnp.zeros((1, 1, B), f32)
            nz_rows = 1

        lane = lambda *lead: pl.BlockSpec(lead + (TB,),
                                          lambda i: tuple([0] * len(lead)) + (i,))
        shared = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)))
        DmaxP = self.Dmax if nT else 1
        nTP2 = self.nTP2 if nT else 1
        out_shapes = [
            jax.ShapeDtypeStruct((N, B), f32),
            jax.ShapeDtypeStruct((N, B), f32),
            jax.ShapeDtypeStruct((nCapP, B), f32),
            jax.ShapeDtypeStruct((nLP, B), f32),
            jax.ShapeDtypeStruct((DmaxP, nTP2, B), f32),
            jax.ShapeDtypeStruct((1, B), f32),
            jax.ShapeDtypeStruct((B // TB,), jnp.int32),
        ]
        out_specs = [
            lane(N), lane(N), lane(nCapP), lane(nLP),
            lane(DmaxP, nTP2), lane(1),
            pl.BlockSpec((B // TB,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ]
        Mp = self.M_probe if probe else np.zeros((1, N), np.float32)
        if probe:
            PP = Mp.shape[0]
            out_shapes.append(jax.ShapeDtypeStruct((n_steps, PP, B), f32))
            out_specs.append(pl.BlockSpec((n_steps, PP, TB),
                                          lambda i: (0, 0, i)))
        outs = pl.pallas_call(
            self._kernel(n_steps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,),
                             memory_space=pltpu.SMEM),
                shared(self.M_rhs.shape),
                shared(self.M_zc.shape), shared(self.M_state.shape),
                shared(Mp.shape), shared(self.M_mosq.shape),
                shared(self.kind_masks.shape),
                lane(N, N), lane(self.kP, N),
                lane(self.W, self.kP, self.kP),
                lane(*self.mosp.shape[:2]), lane(*self.diop.shape[:2]),
                lane(*self.bjtp.shape[:2]), lane(*self.swp.shape[:2]),
                lane(*self.mqp.shape[:2]),
                lane(self.bconsts.shape[0]),
                shared(self.M_tl_pm.shape), shared(self.M_tl_k.shape),
                lane(self.tl_z0.shape[0]),
                lane(self.nSP), lane(7, self.nSP), lane(5, self.nSP),
                lane(*self.src_pwlt.shape[:2]),
                lane(*self.src_pwlv.shape[:2]), lane(self.nSP),
                shared(self.M_tn.shape),
                lane(nz_rows, self.nNoise if noise_on else 1),
                lane(nCapP), lane(nLP),
                lane(N), lane(N), lane(nCapP), lane(nLP),
                lane(DmaxP, nTP2), lane(1),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(step0_arr, jnp.asarray(self.M_rhs),
          jnp.asarray(self.M_zc), jnp.asarray(self.M_state),
          jnp.asarray(Mp), jnp.asarray(self.M_mosq),
          jnp.asarray(self.kind_masks),
          self.G0invT, self.YT, self.Yc3, self.mosp, self.diop, self.bjtp,
          self.swp, self.mqp, self.bconsts,
          jnp.asarray(self.M_tl_pm), jnp.asarray(self.M_tl_k), self.tl_z0,
          self.src_dc, self.src_pulse, self.src_sin,
          self.src_pwlt, self.src_pwlv, self.src_pwln,
          jnp.asarray(self.M_tn), nzt,
          self.gc, self.gl, xt, xpt, vct, ilt, tlt, ft)
        xo, xpo, vco, ilo, tlo, fo, iters = outs[:7]
        base = (xo.T, xpo.T, vco.T[:, :nCap], ilo.T[:, :nL],
                fo[0] > 0.5, iters)
        if probe:
            base = base + (outs[7],)
        if nT:
            base = base + (jnp.moveaxis(tlo, -1, 0),)
        return base
