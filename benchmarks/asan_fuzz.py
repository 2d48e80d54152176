#!/usr/bin/env python
"""AddressSanitizer/UBSan harness for the native C++ frontend.

Builds `csim_frontend.cpp` with -fsanitize=address,undefined plus a tiny
stdin->csim_parse driver, then feeds it the frontend-parity fuzz corpus
(tests/test_frontend_fuzz.gen_netlist), the bundled decks, and a set of
pathological inputs (missing .ENDS, unknown subckts, self-recursion,
unbalanced braces, huge tokens, giant PWL tables, malformed key=value
specs).  Any sanitizer report fails the run.

Last clean run: 56 decks, 0 findings (2026-08-18).

Usage: python benchmarks/asan_fuzz.py [n_fuzz_seeds=40]
"""

import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DRIVER = r"""
#include <cstdio>
#include <cstdint>
#include <string>
#include <iostream>
#include <sstream>
extern "C" {
    void* csim_parse(const char* text);
    void csim_free(void* h);
    int32_t csim_abi_version(void);
}
int main() {
    std::stringstream ss;
    ss << std::cin.rdbuf();
    std::string text = ss.str();
    void* h = csim_parse(text.c_str());
    if (!h) { std::fprintf(stderr, "parse returned null\n"); return 1; }
    csim_free(h);
    std::printf("ok abi=%d\n", csim_abi_version());
    return 0;
}
"""


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    from test_frontend_fuzz import gen_netlist

    tmp = tempfile.mkdtemp(prefix="csim_asan_")
    drv = os.path.join(tmp, "main.cpp")
    exe = os.path.join(tmp, "csim_asan")
    with open(drv, "w") as fh:
        fh.write(DRIVER)
    src = os.path.join(REPO, "circuitsimulator_tpu", "native",
                       "csim_frontend.cpp")
    subprocess.run(["g++", "-O1", "-g", "-fsanitize=address,undefined",
                    "-std=c++17", src, drv, "-o", exe], check=True)

    decks = [gen_netlist(random.Random(s)) for s in range(n_seeds)]
    for name in ("buffer.sp", "dbmixer.sp"):
        with open(os.path.join(REPO, "tests", "netlists", name)) as fh:
            decks.append(fh.read())
    decks += [
        "",
        "\n\n\n",
        ".SUBCKT a b\nR1 b 0 1k\n",
        ".ENDS\nR1 a 0 1k\n",
        "X1 a b nope\nR1 a 0 1k\n",
        ".SUBCKT s p\nX1 p s\n.ENDS\nX1 a s\nR1 a 0 1\n",
        "R1 a 0 {1+\n",
        "M1 a b c d\n.MODEL\n.PARAM x=\nV1 a 0 PULSE(\n",
        ".GLOBAL\n.GLOBAL vdd\nR1 vdd 0 1k\n",
        "C1 a 0 1u IC=zz M=%% DEV=??\nL1 a 0 1m IC=1m\n",
        "Q1 a b c qq M=0 DEV=5%%\n" * 3,
        "B1 a 0 V=" + "sin(" * 40 + "1" + ")" * 40 + "\n",
        "R" + "x" * 5000 + " a 0 1k\n",
        "V1 a 0 PWL(" + " ".join(f"{i}n {i % 2}" for i in range(500)) + ")\n",
    ]
    bad = 0
    for i, d in enumerate(decks):
        p = subprocess.run([exe], input=d.encode(), capture_output=True,
                           timeout=60)
        if p.returncode != 0:
            bad += 1
            print(f"case {i}: rc={p.returncode}")
            print(p.stderr.decode()[:4000])
    print(f"{len(decks)} decks, {bad} sanitizer failures")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
