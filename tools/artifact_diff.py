#!/usr/bin/env python3
"""Reconcile local-sweep claims against the driver's correctness artifact.

Round 6 shipped a commit claiming "417/417 oracle keys hash-exact" while
the driver's CORRECTNESS_r06.json said 416/417 (p33's libm-pow divergence
is environment-dependent, so the local sweep genuinely passed). This tool
makes that class of claim impossible to ship unchecked: run it after the
final local sweep; any key the LOCAL sweep passes but the latest DRIVER
artifact failed must be investigated (and the fix argued deterministic by
construction, not by a local re-pass) before SURVEY/commit messages claim
a number. SURVEY §8 numbers must cite the artifact they were measured
from.

Usage: artifact_diff.py --oracle <verifyOutDir>/oracle_sql.json
                        [CORRECTNESS_rNN.json ...]
  With no artifact args, picks the highest-numbered CORRECTNESS_r*.json
  in the repo root. --oracle is MANDATORY (round 7 shipped a false
  450/450 claim by running this tool bare: shipped-oracle keys whose
  driver hash failed printed as NOHASH and the tool exited 0): keys
  that HAVE an oracle but lost their hash are FLIP -> exit 1.
  ERR / row / schema failures always exit 1.
"""
import glob
import json
import os
import re
import sys


def main():
    args = sys.argv[1:]
    if "--oracle" not in args:
        print("artifact_diff.py: --oracle <outDir>/oracle_sql.json is "
              "mandatory (a bare run cannot classify FLIPs and would "
              "green-light a false claim)")
        sys.exit(2)
    i = args.index("--oracle")
    with open(args[i + 1]) as f:
        oracle_keys = set(json.load(f).keys())
    del args[i:i + 2]
    paths = args
    if not paths:
        rootdir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        allp = glob.glob(os.path.join(rootdir, "CORRECTNESS_r*.json"))
        if not allp:
            print("no CORRECTNESS_r*.json artifacts found")
            sys.exit(2)
        paths = [max(allp, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))]
    bad = 0
    for path in paths:
        with open(path) as f:
            d = json.load(f)
        n_hash = sum(1 for v in d.values() if v.get("hash_match"))
        print(f"== {os.path.basename(path)}: {len(d)} keys, "
              f"{n_hash} hash-exact ==")
        for k in sorted(d):
            v = d[k]
            if v.get("err") == "no_oracle":
                # by-design rows-only key (driver records the weaker
                # rows>0 check); only a problem if we SHIP an oracle for
                # it, which means the driver ran an older oracle set
                if oracle_keys is not None and k in oracle_keys:
                    print(f"  STALE {k}: driver saw no oracle but one is "
                          f"shipped now (new this round — fine)")
                continue
            if v.get("err"):
                print(f"  ERR  {k}: {v['err']}")
                bad += 1
            elif not v.get("rows_match") or not v.get("schema_match"):
                print(f"  FAIL {k}: rows_match={v.get('rows_match')} "
                      f"schema_match={v.get('schema_match')}")
                bad += 1
            elif not v.get("hash_match"):
                if k in oracle_keys:
                    print(f"  FLIP {k}: has an oracle but the driver's hash "
                          f"failed — a local pass does NOT clear this; the "
                          f"fix must be deterministic by construction")
                    bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
