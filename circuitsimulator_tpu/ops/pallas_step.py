"""Fused Pallas transient-step kernel — EXPERIMENTAL, not wired into any
default path.

Hypothesis: the XLA hot path (analysis/transient.py, "woodbury") compiles
each timestep into ~40 small device kernels, so fusing a whole chunk of
timesteps per 128-lane block into one Pallas program should remove dispatch
overhead.  The kernel below is correct (validated against the XLA path in
interpret mode and on hardware), but MEASURED SLOWER on the v5e:
5.2 ms/step vs 1.6 ms/step for the XLA path at B=256 (200 dbmixer steps,
f32, tol 1e-5).  Two causes observed:

1. Mosaic does not vectorize the strided middle-axis slices
   (G0inv[:, m, :] etc.) and large loop carries efficiently — per-op cost
   in the unrolled z0/Newton algebra came out ~2 us instead of ~VPU-rate;
2. the in-kernel Newton loop exits per 128-lane block without freezing
   converged lanes, costing ~2x the iterations of the masked XLA loop.

Kept as a documented experiment (with its correctness test) so the next
optimization round starts from a working kernel rather than from scratch;
the production Pallas win is the batched LU (ops/pallas_lu.py, 42x).

Round-2 follow-up on the two blockers, measured on the v5e (B=8192):
- replacing the `.at[k].set` row writes in ops/lu.py's unrolled
  elimination (profiled at ~47% of step time as dynamic-update-slice +
  copy pairs) with constant-mask where-selects: 21.4M -> 22.4M steps/s;
- dispatching the vmapped k x k Woodbury solve to the VMEM-resident
  Pallas LU kernel via jax.custom_batching.custom_vmap
  (ops/lu.py make_lu_solve_auto): 22.4M -> 28.1M steps/s fast-Newton,
  and 7.0M -> 12.3M in the damped reference-parity while_loop config —
  i.e. the hybrid "XLA orchestrates, Pallas solves" split beats both the
  all-XLA path and this all-Pallas fused step.  The remaining gap to a
  fused chunk kernel is the per-step z0 matvec + state update, < 40% of
  the step; revisit only if Mosaic gains strided middle-axis slices.

Scope: Backward Euler + Woodbury, MOSFET nonlinearities only, V sources
with NONE/SIN waveforms, DC-only I sources (the dbmixer class).  Layout is
lane-minor; all writes are where-masked (Mosaic cannot lower scatter, and
inline-`None` indexing must be avoided — it routes through gather).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .woodbury import WoodburySolver

LANE_BLOCK = 128


def supported(engine) -> bool:
    t = engine.topo
    if len(t.dio_ep) or len(t.bjt_ec):
        return False
    if engine.opts.tran_method != "be":
        return False
    if np.any((engine.vs_kinds != 0) & (engine.vs_kinds != 2)):
        return False  # PULSE/PWL V sources unsupported in-kernel
    if np.any(engine.is_kinds != 0):
        return False
    return True


class PallasStepRunner:
    """Builds per-batch constants and the fused chunk kernel."""

    def __init__(self, engine, bparams, dt: float, max_nr: int = 50):
        assert supported(engine)
        self.engine = engine
        t = engine.topo
        opts = engine.opts
        self.N = N = engine.N
        self.dt = float(dt)
        self.max_nr = max_nr
        self.tol = float(opts.tran_tol)
        self.alpha = float(opts.tran_alpha)
        dtype = engine.dtype

        # Woodbury factorization per lane, then transpose to lane-minor
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
        f32 = jnp.float32

        def lm(x):  # batch axis 0 -> lane-minor last axis
            return jnp.moveaxis(x, 0, -1).astype(f32)

        self.G0inv = lm(G0inv)          # (N, N, B)
        self.Y = lm(Y)                  # (N, k, B)
        self.Ycols = lm(Ycols)          # (k, 3, k, B)

        nM = len(t.mos_ed)
        self.nM = nM
        self.mosp = jnp.stack(
            [bparams["mos_vth"].T, bparams["mos_k"].T,
             bparams["mos_lam"].T, bparams["mos_p"].T], axis=0).astype(f32)
        # (4, nM, B)

        nV = len(t.vs_ep)
        self.nV = nV
        sin5 = bparams["vs_sin"]        # (B, nV, 5): v0 va freq td phi
        self.vsp = jnp.stack([
            bparams["vs_dc"].T,
            sin5[..., 0].T, sin5[..., 1].T,
            (2.0 * jnp.pi) * sin5[..., 2].T,
            sin5[..., 3].T, sin5[..., 4].T], axis=0).astype(f32)
        # (6, nV, B): dc, v0, va, w, td, phi
        self.sin_mask = (engine.vs_kinds == 2).astype(np.float32)[:, None]

        # cap-like conductances and inductor R, lane-minor
        C = jax.vmap(engine._caplike_C)(bparams)       # (B, nCap)
        self.gc = jnp.where(C > 0, C / dt, 0.0).T.astype(f32)   # (nCap, B)
        L = bparams["ind_l"]
        self.gl = jnp.where(L > 0, L / dt, 0.0).T.astype(f32)   # (nL, B)
        self.nCap = self.gc.shape[0]
        self.nL = self.gl.shape[0]

        # static one-hot operators (constants baked into the kernel)
        M = np.zeros((N, nV + self.nL + self.nCap), np.float32)
        for j in range(nV):
            M[t.vs_k[j], j] = 1.0
        for j in range(self.nL):
            M[t.ind_k[j], nV + j] = 1.0
        for j in range(self.nCap):
            a, b = engine.cap_a[j], engine.cap_b[j]
            if a < N:
                M[a, nV + self.nL + j] += 1.0
            if b < N:
                M[b, nV + self.nL + j] -= 1.0
        self.M_rhs = M                                  # (N, nterms)

        # DC-only I sources: constant RHS, precomputed lane-minor
        self.b0_static = jnp.zeros((N, B), f32)
        if len(t.is_ep):
            idc = bparams["is_dc"].T.astype(f32)        # (nI, B)
            Mi = np.zeros((N, len(t.is_ep)), np.float32)
            for j in range(len(t.is_ep)):
                if t.is_ep[j] < N:
                    Mi[t.is_ep[j], j] -= 1.0
                if t.is_em[j] < N:
                    Mi[t.is_em[j], j] += 1.0
            self.b0_static = jnp.asarray(Mi) @ idc

        # MOS terminal / Woodbury-column / state selection operators
        def onehot_rows(idx):
            O = np.zeros((len(idx), N), np.float32)
            for j, r in enumerate(idx):
                if r < N:
                    O[j, r] = 1.0
            return O

        mos_terms = np.stack([t.mos_ed, t.mos_eg, t.mos_es], 1).ravel()
        self.M_mos = onehot_rows(mos_terms)             # (3nM, N)
        self.M_zc = onehot_rows(solver.cols.ravel())    # (3k, N)
        Sm = np.zeros((self.nCap + self.nL, N), np.float32)
        for j in range(self.nCap):
            a, b = engine.cap_a[j], engine.cap_b[j]
            if a < N:
                Sm[j, a] += 1.0
            if b < N:
                Sm[j, b] -= 1.0
        for j in range(self.nL):
            Sm[self.nCap + j, t.ind_k[j]] = 1.0
        self.M_state = Sm                               # (nCap+nL, N)
        self.off_gds = float(opts.mos_off_gds)

    # ------------------------------------------------------------------
    def _kernel(self, n_steps: int):
        N, k, nM, nV = self.N, self.k, self.nM, self.nV
        nCap, nL = self.nCap, self.nL
        dt = self.dt
        tol2 = self.tol * self.tol
        alpha = self.alpha
        max_nr = self.max_nr
        off_gds = self.off_gds

        def kern(step0_ref, Mr_ref, Mm_ref, Mz_ref, Ms_ref, smask_ref,
                 G0inv_ref, Y_ref, Yc_ref, mosp_ref, vsp_ref,
                 gc_ref, gl_ref, b0s_ref, x0_ref, vc0_ref, il0_ref,
                 xo_ref, vco_ref, ilo_ref, it_ref):
            G0inv = G0inv_ref[:]
            Y = Y_ref[:]
            Yc = Yc_ref[:]
            vth = mosp_ref[0]
            kk = mosp_ref[1]
            lam = mosp_ref[2]
            pp = mosp_ref[3]
            dcv = vsp_ref[0]
            v0 = vsp_ref[1]
            va = vsp_ref[2]
            w = vsp_ref[3]
            td = vsp_ref[4]
            phi = vsp_ref[5]
            gc = gc_ref[:]
            gl = gl_ref[:]
            b0s = b0s_ref[:]
            step0 = step0_ref[0]

            Mr = Mr_ref[:]
            Mm = Mm_ref[:]
            Mz = Mz_ref[:]
            Ms = Ms_ref[:]
            smask = smask_ref[:]
            ridk0 = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            cidk0 = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            eye_k = (ridk0 == cidk0).astype(jnp.float32)
            TB = gc.shape[-1]

            def mos_vals(x):
                xm = jnp.dot(Mm, x, preferred_element_type=jnp.float32)
                xm = xm.reshape(nM, 3, TB)
                vd, vg, vs = xm[:, 0], xm[:, 1], xm[:, 2]
                vgs = pp * (vg - vs)
                vds = pp * (vd - vs)
                on = (vgs > vth) & (vds >= 0.0)
                vov = vgs - vth
                tri = vds < vov
                ids0 = jnp.where(
                    on, jnp.where(tri, kk * (vov * vds - 0.5 * vds * vds),
                                  0.5 * kk * vov * vov), 0.0)
                gds0 = jnp.where(on, jnp.where(tri, kk * (vov - vds), 0.0),
                                 off_gds)
                gm0 = jnp.where(on, jnp.where(tri, kk * vds, kk * vov), 0.0)
                fac = jnp.maximum(1.0 + lam * vds, 0.0)
                gd = gds0 * fac + ids0 * lam
                gg = gm0 * fac
                gs_ = -(gd + gg)
                cst = pp * ids0 * fac - gd * vd - gg * vg - gs_ * vs
                vcoef = jnp.stack([gd, gg, gs_], axis=1)   # (nM, 3, TB)
                return vcoef, cst

            def step_body(i, carry):
                x, vc, il, it_acc = carry
                t = (step0 + i.astype(jnp.float32) + 1.0) * dt
                # V-source values: dc + SIN waveform (masked by static kind)
                tau = t - td
                sinv = v0 + jnp.where(tau >= 0.0,
                                      va * jnp.sin(w * tau + phi), 0.0)
                vval = dcv + smask * sinv
                terms = jnp.concatenate([vval, -(gl * il), gc * vc], axis=0)
                b0 = b0s + jnp.dot(Mr, terms,
                                   preferred_element_type=jnp.float32)
                # z0 = G0inv @ b0 per lane (unrolled batched matvec)
                z0 = G0inv[:, 0, :] * b0[0:1, :]
                for m in range(1, N):
                    z0 = z0 + G0inv[:, m, :] * b0[m:m + 1, :]

                def nr_cond(c):
                    xx, done, it = c
                    return jnp.logical_and(jnp.logical_not(done), it < max_nr)

                def nr_body(c):
                    xx, done, it = c
                    vcoef, cst = mos_vals(xx)
                    # z = z0 - Y @ cst
                    z = z0
                    for j in range(k):
                        z = z - Y[:, j, :] * cst[j:j + 1, :]
                    # S = I + sum_s vcoef[:, s, None, :] * Ycols[:, s, :, :]
                    # note: vcoef[:, s, None, :] would be *advanced*
                    # indexing -> a gather Mosaic can't lower; slice then
                    # expand instead
                    S = (eye_k[:, :, None]
                         + jnp.expand_dims(vcoef[:, 0], 1) * Yc[:, 0]
                         + jnp.expand_dims(vcoef[:, 1], 1) * Yc[:, 1]
                         + jnp.expand_dims(vcoef[:, 2], 1) * Yc[:, 2])
                    zc3 = jnp.dot(Mz, z, preferred_element_type=jnp.float32)
                    zc3 = zc3.reshape(k, 3, TB)
                    vz = jnp.sum(vcoef * zc3, axis=1)      # (k, TB)
                    # unrolled pivoted k x k solve (lane-minor)
                    A = S
                    bb = vz
                    ridk = jax.lax.broadcasted_iota(jnp.int32, (k, TB), 0)
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
                        piv = A[c_, c_, :]
                        safe = jnp.where(piv != 0.0, piv, 1.0)
                        fac = jnp.where(ridk > c_, A[:, c_, :] / safe, 0.0)
                        A = A - fac[:, None, :] * A[c_, :, :][None]
                        bb = bb - fac * bb[c_, :][None]
                    ww = jnp.zeros_like(bb)
                    for j in range(k - 1, -1, -1):
                        s = bb[j, :] - jnp.sum(A[j, :, :] * ww, axis=0)
                        d = A[j, j, :]
                        wj = s / jnp.where(d != 0.0, d, 1.0)
                        ww = jnp.where(ridk == j, wj[None], ww)
                    x_raw = z
                    for j in range(k):
                        x_raw = x_raw - Y[:, j, :] * ww[j:j + 1, :]
                    x_new = xx + alpha * (x_raw - xx)
                    # per-lane damped-step convergence; the block exits once
                    # every lane is converged (same semantics as the vmapped
                    # while_loop in analysis/transient.py)
                    errl = jnp.sum((x_new - xx) ** 2, axis=0)   # (TB,)
                    all_done = jnp.all(errl < tol2)
                    return x_new, all_done, it + 1

                x, _, iters = lax.while_loop(
                    nr_cond, nr_body,
                    (x, jnp.asarray(False), jnp.asarray(0, jnp.int32)))
                st = jnp.dot(Ms, x, preferred_element_type=jnp.float32)
                vc = st[:nCap, :]
                il = st[nCap:, :]
                return x, vc, il, it_acc + iters

            x, vc, il, iters = lax.fori_loop(
                0, n_steps, step_body,
                (x0_ref[:], vc0_ref[:], il0_ref[:],
                 jnp.asarray(0, jnp.int32)))
            xo_ref[:] = x
            vco_ref[:] = vc
            ilo_ref[:] = il
            it_ref[pl.program_id(0)] = iters

        return kern

    def run_chunk(self, x, vc, il, step0: int, n_steps: int,
                  interpret: bool = False):
        """Advance n_steps; x (B, N), vc (B, nCap), il (B, nL) lane-major."""
        B = self.B
        N, nCap, nL = self.N, self.nCap, self.nL
        TB = LANE_BLOCK
        grid = (B // TB,)
        f32 = jnp.float32
        xt = x.T.astype(f32)
        vct = vc.T.astype(f32) if nCap else jnp.zeros((0, B), f32)
        ilt = il.T.astype(f32) if nL else jnp.zeros((0, B), f32)
        step0_arr = jnp.asarray([float(step0)], f32)

        lane = lambda *lead: pl.BlockSpec(lead + (TB,),
                                          lambda i: tuple([0] * len(lead)) + (i,))
        shared = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)))
        out_shapes = (
            jax.ShapeDtypeStruct((N, B), f32),
            jax.ShapeDtypeStruct((nCap, B), f32),
            jax.ShapeDtypeStruct((nL, B), f32),
            jax.ShapeDtypeStruct((B // TB,), jnp.int32),
        )
        xo, vco, ilo, iters = pl.pallas_call(
            self._kernel(n_steps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,),
                             memory_space=pltpu.SMEM),
                shared(self.M_rhs.shape), shared(self.M_mos.shape),
                shared(self.M_zc.shape), shared(self.M_state.shape),
                shared(self.sin_mask.shape),
                lane(N, N), lane(N, self.k), lane(self.k, 3, self.k),
                lane(4, self.nM), lane(6, self.nV),
                lane(nCap), lane(nL), lane(N),
                lane(N), lane(nCap), lane(nL),
            ],
            out_specs=(
                lane(N), lane(nCap), lane(nL),
                pl.BlockSpec((B // TB,), lambda i: (0,),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(step0_arr, jnp.asarray(self.M_rhs), jnp.asarray(self.M_mos),
          jnp.asarray(self.M_zc), jnp.asarray(self.M_state),
          jnp.asarray(self.sin_mask),
          self.G0inv, self.Y, self.Ycols, self.mosp, self.vsp,
          self.gc, self.gl, self.b0_static, xt, vct, ilt)
        return xo.T, vco.T, ilo.T, iters
