#!/usr/bin/env python3
"""Plot transient CSV waveforms (counterpart of the reference's plot tool;
same CLI contract, reference plot_tran.py:3-9):

    python plot_tran.py tran_out.csv 'V(118)'
    python plot_tran.py tran_out.csv 'V(101)' 'V(118)'
    python plot_tran.py tran_out.csv            # all V(...) columns

Extras over the reference: --save <file.png> for headless use, and I(...)
columns plot on a twin axis when mixed with voltages.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_file")
    ap.add_argument("cols", nargs="*",
                    help="column names, e.g. 'V(118)' (default: all V(...))")
    ap.add_argument("--save", metavar="PNG", default=None,
                    help="write the figure to a file instead of showing it")
    args = ap.parse_args()

    if not os.path.exists(args.csv_file):
        print(f"File not found: {args.csv_file}")
        sys.exit(1)

    import pandas as pd
    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(args.csv_file)
    if "time" not in df.columns:
        print("No 'time' column in CSV; columns:", list(df.columns))
        sys.exit(1)
    t = df["time"]

    cols = args.cols
    if not cols:
        cols = [c for c in df.columns if c.startswith("V(")]
        if not cols:
            print("No V(...) columns found; specify columns explicitly.")
            print("Columns:", list(df.columns))
            sys.exit(1)
        print("Auto-selected voltage columns:", cols)

    missing = [c for c in cols if c not in df.columns]
    if missing:
        print("Columns not in CSV:", missing)
        print("Columns:", list(df.columns))
        sys.exit(1)

    fig, ax = plt.subplots()
    vcols = [c for c in cols if not c.startswith("I(")]
    icols = [c for c in cols if c.startswith("I(")]
    for c in vcols:
        ax.plot(t, df[c], label=c)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Voltage (V)" if vcols else "Value")
    if icols:
        ax2 = ax.twinx() if vcols else ax
        for c in icols:
            ax2.plot(t, df[c], "--", label=c)
        ax2.set_ylabel("Current (A)")
    ax.set_title(os.path.basename(args.csv_file))
    fig.legend()
    ax.grid(True)
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
