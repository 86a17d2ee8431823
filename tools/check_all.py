#!/usr/bin/env python3
"""Per-query gate sweep with a timeout: runs tools/check.py one query at a
time so a quadratic DuckDB oracle (the brute-force pair/closure class,
documented to DNF beyond sf0.01) cannot wedge the whole sweep.

usage: python3 tools/check_all.py /root/testdata/sf0.1 /tmp/vout [timeout_s]

Round-5 result at sf0.1: 158/158 PASS — the round-4 oracle-side
TIMEOUTs (x_neardup_jaccard, x_neardup_lsh, x_neardup_incr,
x_fp_winnow_pairs, x_dedup_cluster) were closed by rewriting those
oracles from brute-force cross joins to inverted-index joins
(value-identical; see ExtensionQueries.jacIdxCtes).
"""
import json, os, subprocess, sys, time

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    names = sorted(json.load(open(os.path.join(outdir, "oracle_sql.json"))).keys())
    here = os.path.dirname(os.path.abspath(__file__))
    bad = {}
    for n in names:
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "check.py"), sfdir, outdir, n],
                capture_output=True, text=True, timeout=timeout)
            ok = any(l.startswith("PASS") for l in r.stdout.splitlines())
            if not ok:
                bad[n] = ("FAIL", (r.stdout + r.stderr).strip().splitlines()[-3:])
        except subprocess.TimeoutExpired:
            bad[n] = ("TIMEOUT", timeout)
        print(f"{n}: {'PASS' if n not in bad else bad[n][0]}", flush=True)
    print(f"== {len(names) - len(bad)} pass, {len(bad)} non-pass ==")
    for n, (s, d) in bad.items():
        print(f"  {n} {s} {str(d)[:160]}")
    sys.exit(1 if any(s == "FAIL" for s, _ in bad.values()) else 0)

if __name__ == "__main__":
    main()
