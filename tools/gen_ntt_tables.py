#!/usr/bin/env python3
"""Offline NTT-table codegen and cross-validation.

The analog of the reference's `script/ntt_param.sage` (its L0 codegen layer,
SURVEY.md section 2.1): the sage script derives plain-form root tables from
the Falcon C `vrfy.c` Montgomery-form tables by dividing by R = 2^16 mod q =
4091 (`ntt_param.sage:132,263`).  This tool goes the other way: it generates
the tables from first principles (psi^bitrev(i) with psi = 7 the primitive
2048th root) and, when the reference tree is available, asserts equality
with the sage script's recorded C tables -- the same check as
tests/test_params.py, runnable standalone.

    python tools/gen_ntt_tables.py [--check /root/reference/script/ntt_param.sage]
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from falcon_r1cs_tpu.params import Q, inv_ntt_table, ntt_table


def extract_sage_table(path: str, name: str) -> list[int]:
    src = open(path).read()
    m = re.search(name + r"\s*=\s*\[(.*?)\]", src, re.S)
    return [int(x) for x in re.findall(r"\d+", m.group(1))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", default="/root/reference/script/ntt_param.sage")
    ap.add_argument("--emit", action="store_true",
                    help="print the generated tables as Python literals")
    args = ap.parse_args()

    fwd_1024 = ntt_table(1024)
    inv_1024 = inv_ntt_table(1024)
    print(f"generated: forward[{len(fwd_1024)}], inverse[{len(inv_1024)}]; "
          f"table_512 == table_1024[:512]: {ntt_table(512) == fwd_1024[:512]}")

    if args.check and Path(args.check).exists():
        r_inv = pow(4091, -1, Q)
        c_fwd = [x * r_inv % Q for x in extract_sage_table(args.check, "forward")]
        c_inv = [x * r_inv % Q for x in extract_sage_table(args.check, "reverse")]
        ok_f = list(fwd_1024) == c_fwd
        ok_i = list(inv_1024) == c_inv
        print(f"vs Falcon C (via sage script): forward={ok_f} inverse={ok_i}")
        if not (ok_f and ok_i):
            sys.exit(1)
    if args.emit:
        print("NTT_TABLE_1024 =", list(fwd_1024))
        print("INV_NTT_TABLE_1024 =", list(inv_1024))


if __name__ == "__main__":
    main()
