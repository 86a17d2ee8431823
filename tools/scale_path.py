#!/usr/bin/env python3
"""Scale-PATH gate (r14 verdict item #5): the exact replica-parity oracle
tops out at factor 30 for the exact-jaccard family (intersection exchange
vs one box's scratch disk -- SCALING.md "Factor-100 tier"), but the
PRODUCTION dedup path, MinHash-LSH, runs beyond it, and its recall claim
is checkable without a quadratic oracle via graft.ScalePath's derived
twin truth (see ScalePath.scala header for the derivation and the
replica-0 oracle anchor).

Runs graft.ScalePath in:
  - `pairs` mode at factor 30 (verified pair emission fits one box
    there): verified twin recall vs the banded expectation + replica-0
    pair-identity anchor vs exact jaccardPairs;
  - `cand` mode at factor 100 (candidate stage only -- the stage whose
    shuffle stays corpus-linear + 16 B/colliding-pair; verified EMISSION
    at factor 100 would ship ~74M pairs x ~2 KB shingle arrays, the same
    one-box ceiling the exact family hits): twin-candidate recall vs the
    banded S-curve expectation.

Merges the combined block into CORRECTNESS_sf1.json as `scale_path`
(the block carries BOTH tiers -- factor-30 verified pairs and
factor-100 candidate stage -- so the key names the gate, not one tier;
a legacy `f100_scale_path` key from pre-r16 runs is removed on merge).
The artifact is resolved relative to the REPO ROOT, not the CWD, and a
missing artifact is a HARD ERROR (r15 verdict: the silent skip is how
two rounds of docs claimed a block that was never written).

usage: python3 tools/scale_path.py [f30dir] [f100dir] [workdir]
"""
import json
import os
import subprocess
import sys


def run(dirpath, factor, out, mode):
    here = os.path.dirname(os.path.abspath(__file__))
    timeout_s = int(os.environ.get("SPARK_GRAFT_SP_TIMEOUT", "7200"))
    r = subprocess.run(
        [os.path.join(here, "run_main.sh"), "graft.ScalePath",
         dirpath, str(factor), out, mode],
        capture_output=True, text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(f"ScalePath {mode}@f{factor} failed: {r.stderr[-2000:]}")
    return json.load(open(out))


def main():
    f30 = sys.argv[1] if len(sys.argv) > 1 else "bigdata/sf3synth"
    f100 = sys.argv[2] if len(sys.argv) > 2 else "bigdata/sf10synth"
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_path"
    os.makedirs(work, exist_ok=True)

    results = {}
    print("== ScalePath pairs @ factor 30 (verified emission) ==", flush=True)
    results["pairs_f30"] = run(f30, 30, f"{work}/pairs_f30.json", "pairs")
    print(json.dumps(results["pairs_f30"]), flush=True)
    print("== ScalePath cand @ factor 100 (candidate stage) ==", flush=True)
    results["cand_f100"] = run(f100, 100, f"{work}/cand_f100.json", "cand")
    print(json.dumps(results["cand_f100"]), flush=True)

    ok = all(r.get("recall_ge_expected") for r in results.values()) and \
        results["pairs_f30"].get("rep0_anchor_ok", False)
    block = {
        "protocol": (
            "graft.ScalePath: MinHash-LSH production-path recall vs the exact banded "
            "expectation sum_docs[(F-1)p(n/(n+1)) + C(F-1,2)p(n/(n+2))], "
            "p(s)=1-(1-s^2)^8, derived from the per-doc shingle-count histogram of the "
            "base slice (twin truth is id arithmetic, no quadratic oracle); pairs mode "
            "additionally anchors the replica-0 output restriction pair-identical to "
            "exact jaccardPairs on the base slice (DuckDB-certified shape at sf0.1). "
            "Verified emission runs at factor 30 (fits one box); factor 100 runs the "
            "candidate stage, whose exchange stays corpus-linear + 16 B per colliding "
            "pair -- verified emission there would ship ~74M x ~2 KB shingle-array rows, "
            "the same one-box scratch ceiling the exact-jaccard oracle family hits "
            "(SCALING.md 'Factor-100 tier')."),
        "results": results,
        "pass": ok,
        # run stamp (round 17): committed evidence that the gate re-ran
        # this round even when counts match the prior block byte-for-byte
        "run_utc": __import__("datetime").datetime.now(
            __import__("datetime").timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    with open(f"{work}/scale_path.json", "w") as f:
        json.dump(block, f, indent=1)
    # merge is MANDATORY (r15 verdict #2): resolve the artifact at the
    # repo root regardless of CWD, and fail loudly if it is not there --
    # the silent skip-on-absent is exactly how two rounds of docs claimed
    # a block that never landed. Path overridable for tests.
    here = os.path.dirname(os.path.abspath(__file__))
    artifact = os.environ.get(
        "SPARK_GRAFT_CORRECTNESS_ARTIFACT",
        os.path.join(os.path.dirname(here), "CORRECTNESS_sf1.json"))
    if not os.path.exists(artifact):
        sys.exit(f"FATAL: correctness artifact {artifact} not found -- the scale_path "
                 "block MUST merge into it; refusing to finish without banking evidence")
    doc = json.load(open(artifact))
    doc.pop("f100_scale_path", None)  # legacy pre-r16 key (misnamed scope)
    doc["scale_path"] = block
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged scale_path into {artifact}", flush=True)
    print(f"== scale path: {'PASS' if ok else 'FAIL'} ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
