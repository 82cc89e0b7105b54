#!/usr/bin/env python
"""CLI for the deterministic fixture generator (logic in el.fixtures)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from el.fixtures import SCALES, generate  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--scale", choices=sorted(SCALES), default="t1")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(json.dumps(generate(args.outdir, args.scale, args.seed)))
