"""Proof-request CLI client (reference script/prove-block.sh POST loop).

Usage:
  python tools/prove_block.py <network> <proof_type> <block> [--host URL]
    [--poll-interval S] [--v1] [--jwt TOKEN]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import requests


def _cache():
    from raiko_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()


def main(argv=None) -> int:
    _cache()
    p = argparse.ArgumentParser("prove-block")
    p.add_argument("network")
    p.add_argument("proof_type")
    p.add_argument("block", type=int)
    p.add_argument("--host", default="http://localhost:8080")
    p.add_argument("--poll-interval", type=float, default=2.0)
    p.add_argument("--v1", action="store_true", help="use the blocking v1 API")
    p.add_argument("--jwt", default=None)
    p.add_argument("--prover", default="0x" + "00" * 20)
    p.add_argument("--graffiti", default="0x" + "00" * 32)
    args = p.parse_args(argv)

    headers = {"Content-Type": "application/json"}
    if args.jwt:
        headers["Authorization"] = f"Bearer {args.jwt}"
    body = {
        "network": args.network,
        "proof_type": args.proof_type,
        "block_number": args.block,
        "prover": args.prover,
        "graffiti": args.graffiti,
    }
    if args.v1:
        r = requests.post(
            f"{args.host}/v1/proof", json=body, headers=headers, timeout=3600
        )
        print(json.dumps(r.json(), indent=2))
        return 0 if r.ok else 1

    while True:
        r = requests.post(
            f"{args.host}/v2/proof", json=body, headers=headers, timeout=60
        )
        resp = r.json()
        if resp.get("status") != "ok":
            print(json.dumps(resp, indent=2), file=sys.stderr)
            return 1
        status = resp["data"].get("status")
        print(f"[{time.strftime('%H:%M:%S')}] {status}")
        if status == "success":
            print(json.dumps(resp["data"]["proof"], indent=2))
            return 0
        if status not in ("registered", "work_in_progress"):
            print(json.dumps(resp, indent=2), file=sys.stderr)
            return 1
        time.sleep(args.poll_interval)


if __name__ == "__main__":
    sys.exit(main())
