#!/usr/bin/env python
"""Differential fuzzing against the reference simulator.

Generates random (but well-posed) netlists within the reference's accepted
grammar (R/C/L, DC/SIN V sources, DC I sources, Level-1 MOSFETs), runs both
the reference binary and this engine, and compares DC tables and transient
CSVs.  Used to (a) hunt parity bugs and (b) mint extra golden cases
(tests/goldens/fuzz/) beyond the two bundled netlists.

Usage:
  python benchmarks/fuzz_parity.py [n_cases] [--save-goldens DIR]

Requires the reference sources (mounted at /root/reference) and g++; the
binary is built once into /tmp.
"""

import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SRC = "/root/reference"
REF_BIN = "/tmp/mysim_ref_fuzz"
SHIM = "/tmp/eigen_shim_fuzz"

SHIM_HEADER = r"""
#pragma once
#include <vector>
#include <complex>
#include <cmath>
#include <algorithm>
#include <utility>
namespace Eigen {
template <typename T> class VecT {
 public:
  std::vector<T> d;
  VecT() {}
  explicit VecT(int n) : d(n) {}
  static VecT Zero(int n) { VecT v(n); std::fill(v.d.begin(), v.d.end(), T(0)); return v; }
  void setZero() { std::fill(d.begin(), d.end(), T(0)); }
  void setZero(int n) { d.assign(n, T(0)); }
  int size() const { return (int)d.size(); }
  int rows() const { return (int)d.size(); }
  T& operator()(int i) { return d[i]; }
  const T& operator()(int i) const { return d[i]; }
  double norm() const { double s=0; for (auto& v : d) s += std::norm(std::complex<double>(v)); return std::sqrt(s); }
  bool allFinite() const { for (auto& v : d) if (!std::isfinite(std::abs(std::complex<double>(v)))) return false; return true; }
  VecT operator+(const VecT& o) const { VecT r(size()); for (int i=0;i<size();++i) r.d[i]=d[i]+o.d[i]; return r; }
  VecT operator-(const VecT& o) const { VecT r(size()); for (int i=0;i<size();++i) r.d[i]=d[i]-o.d[i]; return r; }
  friend VecT operator*(double a, const VecT& v) { VecT r(v.size()); for (int i=0;i<v.size();++i) r.d[i]=a*v.d[i]; return r; }
};
template <typename T> class MatT {
 public:
  int nr = 0, nc = 0;
  std::vector<T> d;
  class RowProxy { public: MatT& m; int r; RowProxy(MatT& m_, int r_):m(m_),r(r_){}
    void swap(RowProxy o){ for(int j=0;j<m.nc;++j) std::swap(m(r,j), o.m(o.r,j)); } };
  MatT() {}
  MatT(int r, int c) : nr(r), nc(c), d((size_t)r*c, T(0)) {}
  static MatT Zero(int r, int c) { return MatT(r, c); }
  void setZero() { std::fill(d.begin(), d.end(), T(0)); }
  int rows() const { return nr; }
  int cols() const { return nc; }
  T& operator()(int i, int j) { return d[(size_t)i*nc + j]; }
  const T& operator()(int i, int j) const { return d[(size_t)i*nc + j]; }
  RowProxy row(int i) { return RowProxy(*this, i); }
};
using VectorXd = VecT<double>;
using MatrixXd = MatT<double>;
using VectorXcd = VecT<std::complex<double>>;
using MatrixXcd = MatT<std::complex<double>>;
}
"""


def build_reference():
    if os.path.exists(REF_BIN):
        return
    os.makedirs(os.path.join(SHIM, "Eigen"), exist_ok=True)
    for name in ("Dense", "Sparse", "Core"):
        with open(os.path.join(SHIM, "Eigen", name), "w") as f:
            f.write(SHIM_HEADER)
    import glob
    srcs = glob.glob(os.path.join(REF_SRC, "src", "*.cpp"))
    subprocess.run(["g++", "-O2", "-std=c++17",
                    "-I", os.path.join(REF_SRC, "include"), "-I", SHIM]
                   + srcs + ["-o", REF_BIN],
                   check=True, capture_output=True, text=True)


def gen_netlist(rng: random.Random, step_range=(80, 250)) -> str:
    """A random well-posed circuit: V source at node 1, resistor spanning
    tree for DC paths, sprinkles of R/C/L/I/MOS."""
    n_nodes = rng.randint(3, 9)
    nodes = [str(i) for i in range(1, n_nodes + 1)]
    lines = ["* fuzz case"]
    vdc = round(rng.uniform(1.0, 5.0), 3)
    if rng.random() < 0.6:
        va = round(rng.uniform(0.1, 1.0), 3)
        fr = rng.choice(["1e6", "1e7", "5e6"])
        lines.append(f"V1 1 0 SIN {vdc} {va} {fr}")
    else:
        lines.append(f"V1 1 0 DC {vdc}")
    # resistor spanning tree: node i connects to a random earlier node/ground
    for i, n in enumerate(nodes):
        prev = rng.choice(["0"] + nodes[:i]) if i else "0"
        r = round(10 ** rng.uniform(1, 4), 2)
        lines.append(f"Rt{n} {n} {prev} {r}")
    eid = 0
    for _ in range(rng.randint(1, 5)):
        eid += 1
        a, b = rng.sample(nodes + ["0"], 2)
        kind = rng.random()
        if kind < 0.4:
            lines.append(f"Rx{eid} {a} {b} {round(10 ** rng.uniform(1, 4), 2)}")
        elif kind < 0.75:
            lines.append(f"Cx{eid} {a} {b} {rng.choice(['1p','10p','0.1p','1n'])}")
        else:
            lines.append(f"Lx{eid} {a} {b} {rng.choice(['1n','10n','0.5u'])}")
    if rng.random() < 0.5:
        a, b = rng.sample(nodes, 2)
        lines.append(f"Ix1 {a} {b} {round(rng.uniform(1e-4, 2e-3), 6)}")
    n_mos = rng.randint(0, 3)
    lines.append(".MODEL 1 VT -0.7 MU 5e-2 COX 0.3e-4 LAMBDA 0.05 CJ0 4e-14")
    lines.append(".MODEL 2 VT 0.6 MU 1.5e-1 COX 0.3e-4 LAMBDA 0.05 CJ0 4e-14")
    for q in range(n_mos):
        d, g, s = (rng.choice(nodes + ["0"]) for _ in range(3))
        model = rng.choice(["1", "2"])
        w = rng.choice(["10e-6", "30e-6", "50e-6"])
        lines.append(f"M{q+1} {d} {g} {s} x {w} 0.35e-6 {model}")
    tstep = rng.choice(["1e-9", "2e-9"])
    nsteps = rng.randint(*step_range)
    lines.append(f".TRAN {tstep} {float(tstep) * nsteps:.3e}")
    return "\n".join(lines) + "\n"


def run_reference(netlist_path, csv_path):
    out = subprocess.run([REF_BIN, netlist_path, csv_path],
                         capture_output=True, text=True, timeout=120)
    return out.stdout


def run_engine(netlist_path, csv_path):
    import io as _io
    import contextlib
    from circuitsimulator_tpu import Simulator
    sim = Simulator.from_file(netlist_path)
    x = sim.dc()
    stdout = sim.dc_report(x)
    res = sim.transient()
    sim.write_transient_csv(csv_path, res)
    return stdout


def compare_case(ref_stdout, my_stdout, ref_csv, my_csv):
    import numpy as np
    from circuitsimulator_tpu.io.table import parse_dc_table
    from circuitsimulator_tpu.io.csvout import read_csv
    rv, ra = parse_dc_table(ref_stdout)
    mv, ma = parse_dc_table(my_stdout)
    problems = []
    for name, val in rv.items():
        if abs(mv.get(name, float("nan")) - val) > 2e-6:
            problems.append(f"DC V({name}): ref {val} vs {mv.get(name)}")
    for name, val in ra.items():
        if abs(ma.get(name, float("nan")) - val) > 2e-6:
            problems.append(f"DC I({name}): ref {val} vs {ma.get(name)}")
    h1, d1 = read_csv(ref_csv)
    h2, d2 = read_csv(my_csv)
    if h1 != h2:
        problems.append(f"CSV headers differ: {h1} vs {h2}")
    elif d1.shape != d2.shape:
        problems.append(f"CSV shapes differ: {d1.shape} vs {d2.shape}")
    else:
        err = np.abs(d1 - d2)
        scale = np.maximum(np.abs(d1).max(axis=0), 1e-9)
        rel = (err.max(axis=0) / scale).max()
        # both CSVs carry 9 significant digits; agreement should sit at
        # print precision (~5e-10 column-relative).  1e-7 leaves margin
        # for ill-conditioned random circuits while still catching any
        # real trajectory divergence.
        if rel > 1e-7:
            problems.append(f"CSV max rel err {rel:.2e}")
        return problems, rel
    return problems, float("inf")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    save_dir = None
    if "--save-goldens" in sys.argv:
        save_dir = sys.argv[sys.argv.index("--save-goldens") + 1]
        os.makedirs(save_dir, exist_ok=True)
    # --long: 500-1500-step transients (golden prefix caseL) so parity
    # drift over long integrations can't hide behind short runs
    long_mode = "--long" in sys.argv
    prefix = "caseL" if long_mode else "case"
    step_range = (500, 1500) if long_mode else (80, 250)
    seed_base = 5000 if long_mode else 1000
    build_reference()
    failures = 0
    for i in range(n_cases):
        rng = random.Random(seed_base + i)
        text = gen_netlist(rng, step_range=step_range)
        base = f"/tmp/fuzz_{i:03d}"
        with open(base + ".sp", "w") as f:
            f.write(text)
        try:
            ref_out = run_reference(base + ".sp", base + "_ref.csv")
        except subprocess.TimeoutExpired:
            print(f"case {i}: reference timeout, skipped")
            continue
        my_out = run_engine(base + ".sp", base + "_mine.csv")
        problems, rel = compare_case(ref_out, my_out,
                                     base + "_ref.csv", base + "_mine.csv")
        # native C++ tier: the same deck through csim_native (r5) —
        # three-way differential (reference | JAX | native)
        nat_rel = float("nan")
        from circuitsimulator_tpu.native import solver_binary
        nb = solver_binary()
        if nb is not None:
            rn = subprocess.run([nb, base + ".sp", base + "_nat.csv"],
                                capture_output=True, text=True, timeout=120)
            if rn.returncode == 0:
                nat_problems, nat_rel = compare_case(
                    ref_out, rn.stdout, base + "_ref.csv",
                    base + "_nat.csv")
                problems += [f"[native] {q}" for q in nat_problems]
            elif rn.returncode != 3:
                problems.append(f"[native] rc={rn.returncode}")
        status = "OK" if not problems else "MISMATCH"
        print(f"case {i:3d}: {status}  (csv rel err {rel:.2e}, "
              f"native {nat_rel:.2e})")
        for p in problems:
            print("    ", p)
            failures += 1
        if save_dir and not problems:
            import shutil
            shutil.copy(base + ".sp",
                        os.path.join(save_dir, f"{prefix}{i:02d}.sp"))
            shutil.copy(base + "_ref.csv",
                        os.path.join(save_dir, f"{prefix}{i:02d}_tran.csv"))
            with open(os.path.join(save_dir,
                                   f"{prefix}{i:02d}_dc.txt"), "w") as f:
                f.write(ref_out)
    print(f"{'FAIL' if failures else 'PASS'}: {failures} mismatching checks")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
