// csim_solver.cpp — native (C++) reference-scope solver tier.
//
// The deployment environment's Python interpreter pays a multi-second
// site-hook cost at EVERY start (the axon JAX platform is imported by a
// sitecustomize hook), so a Python CLI can never approach the reference
// binary's ~24 ms whole-run latency (src/main.cpp:15-112) no matter how
// warm the compilation cache is.  This translation unit adds a native
// solver tier behind the existing native frontend (csim_frontend.cpp):
// a standalone executable `csim_native <netlist.sp> [tran_out.csv]`
// covering exactly the reference's analysis scope —
//
//   devices  R / C / L / V / I / Level-1 MOS (element.cpp semantics,
//            including the quirks: lambda-derivative omission in gm,
//            off-state gds = 1e-12, negative-CLM clamp, bulk ignored)
//   DC       10-step source ramp x damped Newton with the ConvController
//            schedule (dcanalysis.cpp:95-163, 264-307): update damping
//            ALWAYS clamp(0.35) [the reference's re-clamp bug], step-size
//            convergence test ||xNew - x|| < 1e-9, gmin base
//            1e-6 -> 3.35e-7 over the ramp, x2 growth capped 1e-4, x10
//            on non-finite capped 1e-2, warn-and-continue at 50 iters
//   TRAN     fixed-step Backward Euler, alpha = 0.45, tol = 1e-6,
//            gmin = 1e-6, BE companions for C/L and the 4 lumped MOS
//            junction caps Cgs = Cgd = 0.5*CJ0, Csb = Cdb = CJ0
//            (tanalisis.cpp:59-80, 294-353)
//   output   the reference CLI stdout format and the byte-compatible
//            %.9e transient CSV (tanalisis.cpp:182-231)
//
// Decks outside this scope (any extension device/card that changes the
// solve) exit with code 3 so the Python CLI falls back to the JAX engine.
// The numerics mirror the parity-tested JAX implementation
// (analysis/dc.py, analysis/transient.py, models/mosfet.py) — this file
// is an independent C++ expression of the same contract, not a copy of
// the reference.

#include "csim_frontend.cpp"

#include <cmath>
#include <cstdio>
#include <vector>

namespace nsolve {

using std::vector;

// ---------------------------------------------------------------------
// dense LU with partial pivoting (contract of ops/lu.py: pivot floor
// 1e-15; any column whose best pivot is below it fails the solve to the
// zero vector; tiny back-substitution diagonals zero that component)
// ---------------------------------------------------------------------
static bool lu_solve(vector<double> A, vector<double> b, int n,
                     vector<double>& x, double floor_ = 1e-15) {
    x.assign(n, 0.0);
    vector<int> perm(n);
    for (int i = 0; i < n; ++i) perm[i] = i;
    for (int k = 0; k < n; ++k) {
        int p = k;
        double best = std::fabs(A[k * n + k]);
        for (int i = k + 1; i < n; ++i) {
            double v = std::fabs(A[i * n + k]);
            if (v > best) { best = v; p = i; }
        }
        if (best < floor_) return false;
        if (p != k) {
            for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
            std::swap(b[k], b[p]);
        }
        double piv = A[k * n + k];
        for (int i = k + 1; i < n; ++i) {
            double f = A[i * n + k] / piv;
            if (f == 0.0) continue;
            for (int j = k; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
            b[i] -= f * b[k];
        }
    }
    for (int j = n - 1; j >= 0; --j) {
        double s = b[j];
        for (int m = j + 1; m < n; ++m) s -= A[j * n + m] * x[m];
        double d = A[j * n + j];
        x[j] = (std::fabs(d) < floor_) ? 0.0 : s / d;
    }
    for (double v : x)
        if (!std::isfinite(v)) return false;
    return true;
}

static double norm2(const vector<double>& a, const vector<double>& b) {
    double s = 0.0;
    for (size_t i = 0; i < a.size(); ++i) {
        double d = a[i] - b[i];
        s += d * d;
    }
    return std::sqrt(s);
}

// ---------------------------------------------------------------------
// waveform evaluators (sim.hpp:75-143 semantics; models/sources.py)
// ---------------------------------------------------------------------
static double clamp01(double v) {
    return v < 0.0 ? 0.0 : (v > 1.0 ? 1.0 : v);
}

static double eval_pulse(const double* p, double t) {
    double v1 = p[0], v2 = p[1], td = p[2], tr = p[3], tf = p[4],
           ton = p[5], per = p[6];
    auto sdiv = [](double a, double b) { return b != 0.0 ? a / b : 0.0; };
    if (per <= 0.0) {
        double tau = t - td;
        if (tau <= 0.0) return v1;
        if (tau < tr) return v1 + clamp01(sdiv(tau, tr)) * (v2 - v1);
        if (tau < tr + ton) return v2;
        return v2 + clamp01(sdiv(tau - (tr + ton), tf)) * (v1 - v2);
    }
    if (t < td) return v1;
    double tau = std::fmod(t - td, per);
    if (tau < 0.0) tau += per;
    if (tau < tr) return v1 + (v2 - v1) * clamp01(sdiv(tau, tr));
    if (tau < tr + ton) return v2;
    if (tau < tr + ton + tf)
        return v2 + (v1 - v2) * clamp01(sdiv(tau - (tr + ton), tf));
    return v1;
}

static double eval_sin(const double* s, double t) {
    double v0 = s[0], va = s[1], freq = s[2], td = s[3], phi = s[4];
    if (t < td) return v0;
    return v0 + va * std::sin(2.0 * M_PI * freq * (t - td) + phi);
}

static double eval_pwl(const double* pool, int off, int npts, double t) {
    if (npts <= 0) return 0.0;
    const double* tv = pool + off;   // interleaved (t, v)
    if (t <= tv[0]) return tv[1];
    if (t >= tv[2 * (npts - 1)]) return tv[2 * (npts - 1) + 1];
    int i = 0;
    while (i + 1 < npts && tv[2 * (i + 1)] < t) ++i;
    double t0 = tv[2 * i], v0 = tv[2 * i + 1];
    double t1 = tv[2 * (i + 1)], v1 = tv[2 * (i + 1) + 1];
    double k = (t1 != t0) ? (t - t0) / (t1 - t0) : 0.0;
    return v0 + (v1 - v0) * k;
}

struct Src {
    const ElementRec* e;
    double eval_tran(const vector<double>& pwl_pool, double t) const {
        double v = e->dc;
        switch (e->wave_kind) {
            case 1: v += eval_pulse(e->pulse, t); break;
            case 2: v += eval_sin(e->sin5, t); break;
            case 3: v += eval_pwl(pwl_pool.data(), e->pwl_off,
                                  e->pwl_n, t); break;
            default: break;
        }
        return v;
    }
    double eval_dc(double scale) const {
        double base = e->dc + (e->wave_kind == 2 ? e->sin5[0] : 0.0);
        return base * scale;
    }
};

// ---------------------------------------------------------------------
// circuit view over the frontend Result
// ---------------------------------------------------------------------
struct Ckt {
    const Result* r;
    int N = 0, n_node_eq = 0;
    vector<int> mos;                 // element indices, kind 5
    vector<int> caps;                // kind 1
    vector<int> inds;                // kind 2
    vector<int> res;                 // kind 0
    vector<int> vsrc;                // kind 3
    vector<int> isrc;                // kind 4
    vector<int> dio;                 // kind 6
    vector<int> vcvs, vccs, cccs, ccvs;  // kinds 8/9/10/11
    vector<int> mut;                 // kind 12 (K card)
    // resolved control branch eqs (F/H) and inductor pairs (K)
    vector<int> ctrl_k;              // parallel to cccs then ccvs
    vector<std::pair<int,int>> mut_ab;   // element indices of (La, Lb)

    int eq(int node_id) const {
        return node_id < 0 ? -1 : r->nodes[node_id].eq_index;
    }
    const char* nm(int off) const { return r->str_pool.c_str() + off; }
};

// supported scope: exit-3 fallback for anything else
static bool scope_ok(const Result& r, std::string& why) {
    for (const auto& e : r.elements) {
        if (e.kind > 12) { why = "extension device"; return false; }
        if (e.kind == 7) { why = "extension device"; return false; }
        if (e.kind >= 3 && e.kind <= 4 && e.wave_kind > 3) {
            why = "EXP/SFFM waveform"; return false;
        }
        if (e.kind == 5 && (e.gamma != 0.0)) {
            why = "MOS body effect"; return false;
        }
        if (e.tn_na != 0.0 || e.tn_namp != 0.0) {
            why = "TRNOISE"; return false;
        }
        if (e.has_ic) { why = "IC="; return false; }
    }
    for (const auto& o : r.options) {
        (void)o;
        why = ".OPTIONS";
        return false;   // any solver option routes to the JAX engine
    }
    if (!r.steps.empty()) { why = ".STEP"; return false; }
    if (!r.sweeps.empty()) { why = ".DC sweep"; return false; }
    if (!r.ics.empty()) { why = ".IC"; return false; }
    if (!r.measures.empty()) { why = ".MEASURE"; return false; }
    const Config& c = r.config;
    // .AC/.HB/.NOISE cards are parsed-but-not-run without CLI flags
    // (exactly the reference's behavior, parser.cpp:526/551) — only the
    // cards the CLI executes automatically disqualify the native tier
    if (c.four_enabled || c.tf_enabled || c.sens_out_off >= 0 ||
        c.pz_out_off >= 0 || c.tran_uic || c.temp_set) {
        why = "extension analysis card";
        return false;
    }
    return true;
}

// MOS Level-1 linearization (element.cpp:181-307 semantics as expressed
// in models/mosfet.py mos_linearize, strict mode)
// Junction diode (extension device — models/diode.py semantics: Shockley
// with SPICE-style linearized exponential continuation above u = 40 and
// optional reverse breakdown).  I(V) ~= g*(Vp-Vm) + cst.
static const double DIO_VT = 0.025852;   // kT/q at 300 K
static const double DIO_UMAX = 40.0;
struct DioLin { double g, cst; };
static DioLin dio_linearize(const ElementRec& e, double vp, double vm) {
    double v = vp - vm;
    double nvt = e.n_ideal * DIO_VT;
    double u = v / nvt;
    double eu, deu;
    if (u <= DIO_UMAX) {
        eu = std::exp(u);
        deu = eu;
    } else {
        double el = std::exp(DIO_UMAX);
        eu = el * (1.0 + (u - DIO_UMAX));
        deu = el;
    }
    double i = e.i_sat * (eu - 1.0);
    double g = e.i_sat * deu / nvt;
    if (e.d_bv > 0.0) {
        double ub = -(v + e.d_bv) / DIO_VT;
        double eb, deb;
        if (ub <= DIO_UMAX) {
            eb = std::exp(ub);
            deb = eb;
        } else {
            double el = std::exp(DIO_UMAX);
            eb = el * (1.0 + (ub - DIO_UMAX));
            deb = el;
        }
        i -= e.d_ibv * eb;
        g += e.d_ibv * deb / DIO_VT;
    }
    return {g, i - g * v};
}

struct MosLin { double gd, gg, gs, cst; };
static MosLin mos_linearize(const ElementRec& e, double vd, double vg,
                            double vs) {
    double p = e.is_p ? -1.0 : 1.0;
    double vgs = p * (vg - vs), vds = p * (vd - vs);
    bool on = (vgs > e.vth) && (vds >= 0.0);
    double vov = vgs - e.vth;
    bool triode = vds < vov;
    double ids0 = 0.0, gds0 = 1e-12, gm0 = 0.0;
    if (on) {
        if (triode) {
            ids0 = e.k * (vov * vds - 0.5 * vds * vds);
            gds0 = e.k * (vov - vds);
            gm0 = e.k * vds;
        } else {
            ids0 = 0.5 * e.k * vov * vov;
            gds0 = 0.0;
            gm0 = e.k * vov;
        }
    }
    double factor = 1.0 + e.lam * vds;
    if (factor < 0.0) factor = 0.0;
    double ids = p * ids0 * factor;
    double d_vds = gds0 * factor + ids0 * e.lam;   // quirk: lam term only here
    double d_vgs = gm0 * factor;
    MosLin m;
    m.gd = d_vds;
    m.gg = d_vgs;
    m.gs = -(d_vds + d_vgs);
    m.cst = ids - m.gd * vd - m.gg * vg - m.gs * vs;
    return m;
}

struct Dense {
    int n;
    vector<double> G, I;
    void reset(int n_) {
        n = n_;
        G.assign((size_t)n * n, 0.0);
        I.assign(n, 0.0);
    }
    void g(int a, int b, double v) {
        if (a >= 0 && b >= 0) G[(size_t)a * n + b] += v;
    }
    void i(int a, double v) {
        if (a >= 0) I[a] += v;
    }
};

// static (non-MOS-conduction) DC stamp at a given source scale
static void stamp_dc_static(const Ckt& c, double scale, Dense& M) {
    const Result& r = *c.r;
    for (int idx : c.res) {
        const auto& e = r.elements[idx];
        if (e.value == 0.0) continue;             // zero-R stamp skipped
        double g = 1.0 / e.value;
        int a = c.eq(e.nodes[0]), b = c.eq(e.nodes[1]);
        M.g(a, a, g); M.g(b, b, g); M.g(a, b, -g); M.g(b, a, -g);
    }
    for (int idx : c.vsrc) {
        const auto& e = r.elements[idx];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]), k = e.branch_eq;
        M.g(p, k, 1.0); M.g(m, k, -1.0);
        M.g(k, p, 1.0); M.g(k, m, -1.0);
        M.i(k, Src{&e}.eval_dc(scale));
    }
    for (int idx : c.inds) {                       // DC: 0-V source
        const auto& e = r.elements[idx];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]), k = e.branch_eq;
        M.g(p, k, 1.0); M.g(m, k, -1.0);
        M.g(k, p, 1.0); M.g(k, m, -1.0);
    }
    for (int idx : c.isrc) {
        const auto& e = r.elements[idx];
        double v = Src{&e}.eval_dc(scale);
        M.i(c.eq(e.nodes[0]), -v);
        M.i(c.eq(e.nodes[1]), v);
    }
    // capacitors: open at DC
    // linear controlled sources (extension; ops/assemble.py _ctrl_vals):
    // VCCS rows [p,p,m,m] x [cp,cm,cp,cm] vals [+g,-g,-g,+g];
    // CCCS rows [p,m] x [kc] vals [+a,-a];
    // VCVS KCL coupling + branch row with -gain on the control pair;
    // CCVS branch row with -r on the control branch
    for (int idx : c.vccs) {
        const auto& e = r.elements[idx];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]);
        int cp = c.eq(e.nodes[2]), cm = c.eq(e.nodes[3]);
        double g = e.value;
        M.g(p, cp, g); M.g(p, cm, -g); M.g(m, cp, -g); M.g(m, cm, g);
    }
    for (size_t q = 0; q < c.cccs.size(); ++q) {
        const auto& e = r.elements[c.cccs[q]];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]);
        int kc = c.ctrl_k[q];
        M.g(p, kc, e.value); M.g(m, kc, -e.value);
    }
    for (int idx : c.vcvs) {
        const auto& e = r.elements[idx];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]);
        int cp = c.eq(e.nodes[2]), cm = c.eq(e.nodes[3]);
        int k = e.branch_eq;
        M.g(p, k, 1.0); M.g(m, k, -1.0);
        M.g(k, p, 1.0); M.g(k, m, -1.0);
        M.g(k, cp, -e.value); M.g(k, cm, e.value);
    }
    for (size_t q = 0; q < c.ccvs.size(); ++q) {
        const auto& e = r.elements[c.ccvs[q]];
        int p = c.eq(e.nodes[0]), m = c.eq(e.nodes[1]);
        int k = e.branch_eq;
        int kc = c.ctrl_k[c.cccs.size() + q];
        M.g(p, k, 1.0); M.g(m, k, -1.0);
        M.g(k, p, 1.0); M.g(k, m, -1.0);
        M.g(k, kc, -e.value);
    }
}

static double mut_M(const Ckt& c, int mi) {
    const auto& e = c.r->elements[c.mut[mi]];
    double la = c.r->elements[c.mut_ab[mi].first].value;
    double lb = c.r->elements[c.mut_ab[mi].second].value;
    return e.value * std::sqrt(la * lb);
}

static void stamp_mos(const Ckt& c, const vector<double>& x, Dense& M) {
    const Result& r = *c.r;
    for (int idx : c.mos) {
        const auto& e = r.elements[idx];
        int d = c.eq(e.nodes[0]), g = c.eq(e.nodes[1]), s = c.eq(e.nodes[2]);
        double vd = d >= 0 ? x[d] : 0.0;
        double vg = g >= 0 ? x[g] : 0.0;
        double vs = s >= 0 ? x[s] : 0.0;
        MosLin m = mos_linearize(e, vd, vg, vs);
        M.g(d, d, m.gd); M.g(d, g, m.gg); M.g(d, s, m.gs);
        M.g(s, d, -m.gd); M.g(s, g, -m.gg); M.g(s, s, -m.gs);
        M.i(d, -m.cst); M.i(s, m.cst);
    }
    for (int idx : c.dio) {
        const auto& e = r.elements[idx];
        int p = c.eq(e.nodes[0]), q = c.eq(e.nodes[1]);
        double vp = p >= 0 ? x[p] : 0.0;
        double vm = q >= 0 ? x[q] : 0.0;
        DioLin dl = dio_linearize(e, vp, vm);
        M.g(p, p, dl.g); M.g(p, q, -dl.g);
        M.g(q, p, -dl.g); M.g(q, q, dl.g);
        M.i(p, -dl.cst); M.i(q, dl.cst);
    }
}

static void stamp_gmin(const Ckt& c, double gmin, Dense& M) {
    for (int i = 0; i < c.n_node_eq; ++i) M.G[(size_t)i * M.n + i] += gmin;
}

// DC operating point: dcanalysis.cpp structure with the ConvController
// quirks (see analysis/dc.py for the full annotated contract)
static vector<double> dc_solve(const Ckt& c, const vector<IcRec>& nodesets) {
    const int N = c.N;
    vector<double> x(N, 0.0);
    // .NODESET warm start + ramp hold (extension shared with the JAX path)
    vector<std::pair<int, double>> ns;
    for (const auto& rec : nodesets) {
        int nid = -1;
        for (size_t j = 0; j < c.r->nodes.size(); ++j)
            if (std::string(c.nm(c.r->nodes[j].name_off))
                == c.nm(rec.node_off)) { nid = (int)j; break; }
        int eq = nid >= 0 ? c.eq(nid) : -1;
        if (eq >= 0) { ns.push_back({eq, rec.value}); x[eq] = rec.value; }
    }
    if (c.mos.empty() && c.dio.empty()) {
        Dense M;
        M.reset(N);
        stamp_dc_static(c, 1.0, M);
        vector<double> out;
        lu_solve(M.G, M.I, N, out);
        return out;
    }
    const int RAMP = 10, MAXIT = 50;
    const double TOL = 1e-9;
    for (int step = 1; step <= RAMP; ++step) {
        double scale = (double)step / RAMP;
        double gbase = 1e-6 * (1.0 - scale) + 3.35e-7 * scale;
        double gmin = gbase, prev_err = INFINITY, alpha_log = 0.5;
        bool converged = false;
        double last_err = 0.0;
        for (int it = 0; it < MAXIT; ++it) {
            Dense M;
            M.reset(N);
            stamp_dc_static(c, scale, M);
            stamp_mos(c, x, M);
            if (!ns.empty() && step < RAMP)
                for (auto& nv : ns) {
                    M.G[(size_t)nv.first * N + nv.first] += 1.0;
                    M.I[nv.first] += nv.second;
                }
            stamp_gmin(c, gmin, M);
            vector<double> xr;
            if (!lu_solve(M.G, M.I, N, xr)) {
                gmin = std::min(gmin * 10.0, 1e-2);   // dcanalysis.cpp:135
                continue;
            }
            // strict mode: the update damping is ALWAYS clamp(0.35)
            const double alpha = 0.35;
            vector<double> xn(N);
            for (int i = 0; i < N; ++i)
                xn[i] = x[i] + alpha * (xr[i] - x[i]);
            double err = norm2(xn, x);
            bool first = (it == 0) || !std::isfinite(prev_err);
            bool slow = err > prev_err * 1.05;
            bool fast = err < prev_err * 0.7;
            // logged alpha: the reference re-derives it from the
            // CONSTANT 0.35 every call (the dcanalysis.cpp:274 re-clamp
            // bug), so it only ever reads 0.245 / 0.35 / 0.385
            if (!first) {
                if (slow) alpha_log = std::max(0.35 * 0.7, 0.1);
                else if (fast) alpha_log = std::min(0.35 * 1.1, 0.5);
                else alpha_log = 0.35;
            } else {
                alpha_log = 0.35;
            }
            if (first) gmin = gbase;
            else if (slow) gmin = std::min(gmin * 2.0, 1e-4);
            else if (fast) gmin = 0.5 * gmin + 0.5 * gbase;
            else gmin = 0.7 * gmin + 0.3 * gbase;
            x = xn;
            prev_err = err;
            last_err = err;
            if (err < TOL) { converged = true; break; }
        }
        if (!converged)
            std::fprintf(stderr,
                         "WARNING: Newton (LU) did not converge at ramp "
                         "step %d (err=%g, alpha=%g, gmin=%g)\n",
                         step, last_err, alpha_log, gmin);
    }
    return x;
}

// ---------------------------------------------------------------------
// Backward-Euler transient (tanalisis.cpp structure; analysis/transient.py
// contract: static companion G, per-step history RHS, damped NR)
// ---------------------------------------------------------------------
struct MosCapState { double vgs, vgd, vsb, vdb; };

static int run_transient(const Ckt& c, const vector<double>& x0,
                         const char* csv_path) {
    const Result& r = *c.r;
    const Config& cfg = r.config;
    const int N = c.N;
    const double dt = cfg.tstep, tstop = cfg.tstop, tstart = cfg.tstart;
    const long n_steps = (long)std::floor(tstop / dt + 1e-12);
    std::printf("[TRAN] tstep=%.6e, tstop=%.6e, tstart=%.6e\n",
                dt, tstop, tstart);
    std::printf("[TRAN] total steps = %ld\n", n_steps);

    // static part of G: R, V/L couplings, C/dt companions, gmin diag
    Dense S;
    S.reset(N);
    stamp_dc_static(c, 1.0, S);            // R + V/L/I (values replaced below)
    S.I.assign(N, 0.0);                    // RHS rebuilt per step
    for (int idx : c.inds) {               // L companion on the branch row
        const auto& e = r.elements[idx];
        if (e.value > 0.0) S.g(e.branch_eq, e.branch_eq, -e.value / dt);
    }
    auto stamp_cap = [&](int a, int b, double C) {
        if (C <= 0.0) return;
        double g = C / dt;
        S.g(a, a, g); S.g(b, b, g); S.g(a, b, -g); S.g(b, a, -g);
    };
    for (int idx : c.caps) {
        const auto& e = r.elements[idx];
        stamp_cap(c.eq(e.nodes[0]), c.eq(e.nodes[1]), e.value);
    }
    for (int idx : c.mos) {
        const auto& e = r.elements[idx];
        int d = c.eq(e.nodes[0]), g = c.eq(e.nodes[1]), s = c.eq(e.nodes[2]);
        stamp_cap(g, s, 0.5 * e.cj0);      // Cgs
        stamp_cap(g, d, 0.5 * e.cj0);      // Cgd
        stamp_cap(s, -1, e.cj0);           // Csb (bulk grounded)
        stamp_cap(d, -1, e.cj0);           // Cdb
    }
    for (int idx : c.dio) {                // diode junction CJO lump
        const auto& e = r.elements[idx];
        stamp_cap(c.eq(e.nodes[0]), c.eq(e.nodes[1]), e.cj0);
    }
    for (size_t mi = 0; mi < c.mut.size(); ++mi) {
        // mutual inductance: branch-row cross terms -(M/dt)
        double M_ = mut_M(c, (int)mi);
        int ka = r.elements[c.mut_ab[mi].first].branch_eq;
        int kb = r.elements[c.mut_ab[mi].second].branch_eq;
        S.g(ka, kb, -M_ / dt);
        S.g(kb, ka, -M_ / dt);
    }
    stamp_gmin(c, 1e-6, S);

    // state from the DC solution
    auto volt = [&](int eq, const vector<double>& x) {
        return eq >= 0 ? x[eq] : 0.0;
    };
    vector<double> cap_vprev(c.caps.size());
    for (size_t j = 0; j < c.caps.size(); ++j) {
        const auto& e = r.elements[c.caps[j]];
        cap_vprev[j] = volt(c.eq(e.nodes[0]), x0) - volt(c.eq(e.nodes[1]), x0);
    }
    vector<double> ind_iprev(c.inds.size());
    for (size_t j = 0; j < c.inds.size(); ++j)
        ind_iprev[j] = x0[r.elements[c.inds[j]].branch_eq];
    vector<MosCapState> mos_prev(c.mos.size());
    for (size_t j = 0; j < c.mos.size(); ++j) {
        const auto& e = r.elements[c.mos[j]];
        double vd = volt(c.eq(e.nodes[0]), x0), vg = volt(c.eq(e.nodes[1]), x0),
               vs = volt(c.eq(e.nodes[2]), x0);
        mos_prev[j] = {vg - vs, vg - vd, vs, vd};
    }
    vector<double> dio_vprev(c.dio.size());
    for (size_t j = 0; j < c.dio.size(); ++j) {
        const auto& e = r.elements[c.dio[j]];
        dio_vprev[j] = volt(c.eq(e.nodes[0]), x0)
                       - volt(c.eq(e.nodes[1]), x0);
    }

    FILE* f = std::fopen(csv_path, "w");
    if (!f) {
        std::fprintf(stderr, "cannot open '%s'\n", csv_path);
        return 1;
    }
    // header: node voltages (creation order, eq >= 0) then V/L branch
    // currents in element order (tanalisis.cpp:189-206)
    std::fprintf(f, "time");
    for (const auto& nd : r.nodes)
        if (nd.eq_index >= 0) std::fprintf(f, ",V(%s)", c.nm(nd.name_off));
    for (const auto& e : r.elements)
        if ((e.kind == 3 || e.kind == 2 || e.kind == 8 || e.kind == 11)
            && e.branch_eq >= 0)
            std::fprintf(f, ",I(%s)", c.nm(e.name_off));
    std::fprintf(f, "\n");
    auto dump_row = [&](double t, const vector<double>& x) {
        if (t < tstart) return;
        std::fprintf(f, "%.9e", t);
        for (const auto& nd : r.nodes)
            if (nd.eq_index >= 0) std::fprintf(f, ",%.9e", x[nd.eq_index]);
        for (const auto& e : r.elements)
            if ((e.kind == 3 || e.kind == 2 || e.kind == 8 || e.kind == 11)
                && e.branch_eq >= 0)
                std::fprintf(f, ",%.9e", x[e.branch_eq]);
        std::fprintf(f, "\n");
    };
    dump_row(0.0, x0);

    const double ALPHA = 0.45, TOL = 1e-6;
    const int MAXIT = 50;
    vector<double> x = x0;
    for (long step = 0; step < n_steps; ++step) {
        double t = (step + 1) * dt;
        // per-step static RHS: sources at t + element histories
        vector<double> I0(N, 0.0);
        auto addI = [&](int a, double v) { if (a >= 0) I0[a] += v; };
        for (int idx : c.vsrc) {
            const auto& e = r.elements[idx];
            I0[e.branch_eq] += Src{&e}.eval_tran(r.pwl_pool, t);
        }
        for (int idx : c.isrc) {
            const auto& e = r.elements[idx];
            double v = Src{&e}.eval_tran(r.pwl_pool, t);
            addI(c.eq(e.nodes[0]), -v);
            addI(c.eq(e.nodes[1]), v);
        }
        for (size_t j = 0; j < c.caps.size(); ++j) {
            const auto& e = r.elements[c.caps[j]];
            if (e.value <= 0.0) continue;
            double h = e.value / dt * cap_vprev[j];
            addI(c.eq(e.nodes[0]), h);
            addI(c.eq(e.nodes[1]), -h);
        }
        for (size_t j = 0; j < c.inds.size(); ++j) {
            const auto& e = r.elements[c.inds[j]];
            if (e.value > 0.0)
                I0[e.branch_eq] += -(e.value / dt) * ind_iprev[j];
        }
        for (size_t mi = 0; mi < c.mut.size(); ++mi) {
            // mutual history: row k_a gets -(M/dt) i_b_prev and vice versa
            double M_ = mut_M(c, (int)mi);
            int ea = c.mut_ab[mi].first, eb = c.mut_ab[mi].second;
            int ka = r.elements[ea].branch_eq, kb = r.elements[eb].branch_eq;
            double ia = x[ka], ib = x[kb];
            // previous-step currents: track via ind_iprev (inds order)
            for (size_t j = 0; j < c.inds.size(); ++j) {
                if (c.inds[j] == ea) ia = ind_iprev[j];
                if (c.inds[j] == eb) ib = ind_iprev[j];
            }
            I0[ka] += -(M_ / dt) * ib;
            I0[kb] += -(M_ / dt) * ia;
        }
        for (size_t j = 0; j < c.mos.size(); ++j) {
            const auto& e = r.elements[c.mos[j]];
            if (e.cj0 <= 0.0) continue;
            int d = c.eq(e.nodes[0]), g = c.eq(e.nodes[1]),
                s = c.eq(e.nodes[2]);
            const MosCapState& mp = mos_prev[j];
            double h;
            h = 0.5 * e.cj0 / dt * mp.vgs; addI(g, h); addI(s, -h);
            h = 0.5 * e.cj0 / dt * mp.vgd; addI(g, h); addI(d, -h);
            h = e.cj0 / dt * mp.vsb; addI(s, h);
            h = e.cj0 / dt * mp.vdb; addI(d, h);
        }
        for (size_t j = 0; j < c.dio.size(); ++j) {
            const auto& e = r.elements[c.dio[j]];
            if (e.cj0 <= 0.0) continue;
            double h = e.cj0 / dt * dio_vprev[j];
            addI(c.eq(e.nodes[0]), h);
            addI(c.eq(e.nodes[1]), -h);
        }
        // damped Newton
        for (int it = 0; it < MAXIT; ++it) {
            Dense M;
            M.n = N;
            M.G = S.G;
            M.I = I0;
            stamp_mos(c, x, M);
            vector<double> xr;
            if (!lu_solve(M.G, M.I, N, xr)) {
                std::fprintf(stderr,
                             "transient LU produced non-finite values at "
                             "t=%g\n", t);
                std::fclose(f);
                return 1;
            }
            vector<double> xn(N);
            for (int i = 0; i < N; ++i)
                xn[i] = x[i] + ALPHA * (xr[i] - x[i]);
            double err = norm2(xn, x);
            x = xn;
            if (err < TOL) break;
        }
        // accept: update element histories
        for (size_t j = 0; j < c.caps.size(); ++j) {
            const auto& e = r.elements[c.caps[j]];
            cap_vprev[j] = volt(c.eq(e.nodes[0]), x)
                           - volt(c.eq(e.nodes[1]), x);
        }
        for (size_t j = 0; j < c.inds.size(); ++j)
            ind_iprev[j] = x[r.elements[c.inds[j]].branch_eq];
        for (size_t j = 0; j < c.mos.size(); ++j) {
            const auto& e = r.elements[c.mos[j]];
            double vd = volt(c.eq(e.nodes[0]), x),
                   vg = volt(c.eq(e.nodes[1]), x),
                   vs = volt(c.eq(e.nodes[2]), x);
            mos_prev[j] = {vg - vs, vg - vd, vs, vd};
        }
        for (size_t j = 0; j < c.dio.size(); ++j) {
            const auto& e = r.elements[c.dio[j]];
            dio_vprev[j] = volt(c.eq(e.nodes[0]), x)
                           - volt(c.eq(e.nodes[1]), x);
        }
        dump_row(t, x);
    }
    std::fclose(f);
    return 0;
}

static int run(const char* path, const char* csv_path) {
    std::FILE* fp = std::fopen(path, "rb");
    if (!fp) {
        std::printf("Reading netlist: %s\n", path);
        std::fprintf(stderr, "parseNetlist() failed.\n");
        return 1;
    }
    std::string text;
    char buf[65536];
    size_t got;
    while ((got = std::fread(buf, 1, sizeof(buf), fp)) > 0)
        text.append(buf, got);
    std::fclose(fp);

    Frontend fe;
    fe.parse(text);
    const Result& r = fe.out;
    // scope check BEFORE any stdout so an exit-3 fallback leaves the
    // JAX CLI a clean slate (no duplicated banners/diagnostics)
    std::string why;
    if (!scope_ok(r, why)) {
        std::fprintf(stderr,
                     "csim_native: deck outside the native solver scope "
                     "(%s); falling back to the JAX engine\n", why.c_str());
        return 3;
    }
    std::printf("Reading netlist: %s\n", path);
    if (!r.diagnostics.empty())
        std::fputs(r.diagnostics.c_str(), stderr);

    Ckt c;
    c.r = &r;
    int maxeq = -1;
    for (const auto& nd : r.nodes) {
        if (nd.eq_index >= 0) {
            ++c.n_node_eq;
            maxeq = std::max(maxeq, nd.eq_index);
        }
    }
    for (size_t i = 0; i < r.elements.size(); ++i) {
        const auto& e = r.elements[i];
        switch (e.kind) {
            case 0: c.res.push_back((int)i); break;
            case 1: c.caps.push_back((int)i); break;
            case 2: c.inds.push_back((int)i); break;
            case 3: c.vsrc.push_back((int)i); break;
            case 4: c.isrc.push_back((int)i); break;
            case 5: c.mos.push_back((int)i); break;
            case 6: c.dio.push_back((int)i); break;
            case 8: c.vcvs.push_back((int)i); break;
            case 9: c.vccs.push_back((int)i); break;
            case 10: c.cccs.push_back((int)i); break;
            case 11: c.ccvs.push_back((int)i); break;
            case 12: c.mut.push_back((int)i); break;
        }
        if (e.branch_eq >= 0) maxeq = std::max(maxeq, e.branch_eq);
    }
    c.N = maxeq + 1;
    // resolve F/H controlling branch eqs and K inductor pairs by name
    auto find_branch = [&](const char* name) -> int {
        for (const auto& e2 : r.elements)
            if (e2.branch_eq >= 0 && std::string(c.nm(e2.name_off)) == name)
                return e2.branch_eq;
        return -1;
    };
    auto find_ind = [&](const char* name) -> int {
        for (size_t j = 0; j < r.elements.size(); ++j)
            if (r.elements[j].kind == 2
                && std::string(c.nm(r.elements[j].name_off)) == name)
                return (int)j;
        return -1;
    };
    for (int idx : c.cccs)
        c.ctrl_k.push_back(find_branch(c.nm(r.elements[idx].ctrl_off)));
    for (int idx : c.ccvs)
        c.ctrl_k.push_back(find_branch(c.nm(r.elements[idx].ctrl_off)));
    for (size_t q = 0; q < c.ctrl_k.size(); ++q) {
        if (c.ctrl_k[q] < 0) {
            std::fprintf(stderr, "csim_native: unresolved F/H control; "
                         "falling back to the JAX engine\n");
            return 3;
        }
    }
    for (int idx : c.mut) {
        const auto& e = r.elements[idx];
        int a = find_ind(c.nm(e.ctrl_off));
        int b = find_ind(c.nm(e.ctrl2_off));
        if (a < 0 || b < 0) {
            std::fprintf(stderr, "csim_native: unresolved K coupling; "
                         "falling back to the JAX engine\n");
            return 3;
        }
        c.mut_ab.push_back({a, b});
    }

    std::printf("\n==== Circuit summary ====\n");
    std::printf("Node count   : %d\n", (int)r.nodes.size());
    std::printf("Element count: %d\n", (int)r.elements.size());
    std::printf("Unknowns     : %d  (nodeEq=%d, branchEq=%d)\n",
                c.N, c.n_node_eq, c.N - c.n_node_eq);

    std::printf("\nRunning DC operating point...\n");
    vector<double> x = dc_solve(c, r.nodesets);

    std::printf("\n==== DC node voltages ====\n");
    for (const auto& nd : r.nodes) {
        if (nd.eq_index >= 0)
            std::printf("V(%s) = %.6f V   [eqIndex=%d]\n",
                        c.nm(nd.name_off), x[nd.eq_index], nd.eq_index);
        else
            std::printf("V(%s) = 0.000000 V   [GND]\n", c.nm(nd.name_off));
    }
    std::printf("\n==== DC branch currents (voltage sources / inductors) "
                "====\n");
    for (const auto& e : r.elements) {
        if (e.branch_eq < 0
            || (e.kind != 3 && e.kind != 2 && e.kind != 8 && e.kind != 11))
            continue;
        const char* np_ = c.nm(r.nodes[e.nodes[0]].name_off);
        const char* nm_ = c.nm(r.nodes[e.nodes[1]].name_off);
        if (e.kind == 3)
            std::printf("I(%s, +%s -> -%s) = %.6f A   [branchEq=%d]\n",
                        c.nm(e.name_off), np_, nm_, x[e.branch_eq],
                        e.branch_eq);
        else
            std::printf("I(%s, %s -> %s) = %.6f A   [branchEq=%d]\n",
                        c.nm(e.name_off), np_, nm_, x[e.branch_eq],
                        e.branch_eq);
    }
    std::printf("\nDC analysis finished.\n");

    if (r.config.tran_enabled) {
        std::printf("\nRunning transient analysis (Backward Euler)...\n");
        std::printf("  .TRAN: tstep=%.6e, tstop=%.6e, tstart=%.6e\n",
                    r.config.tstep, r.config.tstop, r.config.tstart);
        std::printf("  output file: %s\n", csv_path);
        int rc = run_transient(c, x, csv_path);
        if (rc != 0) {
            std::fprintf(stderr, "Transient failed.\n");
            return rc;
        }
        std::printf("Transient analysis (Backward Euler) finished. "
                    "Results written to '%s'.\n", csv_path);
    } else {
        std::printf("\nNo .TRAN card; transient analysis skipped.\n");
    }
    return 0;
}

}  // namespace nsolve

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: csim_native <netlist.sp> [tran_out.csv]\n");
        return 2;
    }
    const char* out = argc > 2 ? argv[2] : "tran_out.csv";
    return nsolve::run(argv[1], out);
}
