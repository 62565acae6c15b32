#!/usr/bin/env python3
"""
Round-5 bench sweep (VERDICT r4 item 5): break the B>=256 ceiling or rule
it out.

Sweeps bench.py over (batch, encode-chunk, decode-chunks, fused-epilogue):
  * PLAYSLOT_BENCH_ENCODE_CHUNK — streaming scan encode (engine/streaming.py)
    that removes the hoisted all-frame feats/k/v tensors (the measured
    B>=256 OOM cause, docs/PERFORMANCE.md);
  * PLAYSLOT_BENCH_FUSED_EPILOGUE — composite+clip+checksum fused into the
    decode chunk bodies (ops/chunked.py chunked_apply_reduce).

Each config runs bench.py in a fresh process (one TPU client at a time —
the relay rule), parses its one JSON line, and appends to
docs/BENCH_SWEEP_R5.json as it goes. OOM/failure is recorded as such, not
fatal. Run on TPU: python tools/bench_sweep_r5.py
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_REPO, "docs", "BENCH_SWEEP_R5.json")

# (batch, encode_chunk, decode_chunks, fused_epilogue)
CONFIGS = [
    (192, 0, 2, 0),   # round-4 default (sanity re-measure)
    (192, 0, 2, 1),   # epilogue fusion alone
    (192, 5, 2, 1),   # streaming encode at the old peak
    (256, 5, 2, 1),   # past the old OOM wall
    (256, 5, 4, 1),
    (256, 1, 4, 1),   # per-frame streaming granularity
    (288, 5, 4, 1),
    (320, 5, 4, 1),
    (320, 5, 5, 1),
    (384, 5, 4, 1),
    # refinement around the first pass's winner (256, enc=1, dec=4): the
    # PER-FRAME streaming granularity beat 5-frame groups by 6% at B=256
    (256, 1, 2, 1),
    (288, 1, 4, 1),
    (320, 1, 4, 1),
    (384, 1, 4, 1),
    (320, 1, 5, 1),
    (256, 2, 4, 1),
]


def main():
    rows = []
    if os.path.isfile(OUT):
        with open(OUT) as f:
            rows = json.load(f)["rows"]
    done = {(r["batch"], r["encode_chunk"], r["decode_chunks"],
             r["fused_epilogue"]) for r in rows}
    for cfg in CONFIGS:
        if cfg in done:
            continue
        B, enc, dec, fe = cfg
        env = dict(os.environ,
                   PLAYSLOT_BENCH_BATCH=str(B),
                   PLAYSLOT_BENCH_ENCODE_CHUNK=str(enc),
                   PLAYSLOT_BENCH_DECODE_CHUNKS=str(dec),
                   PLAYSLOT_BENCH_FUSED_EPILOGUE=str(fe))
        print(f"--- B={B} enc={enc} dec={dec} fused={fe}", flush=True)
        p = subprocess.run([sys.executable, os.path.join(_REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=1200, cwd=_REPO)
        row = {"batch": B, "encode_chunk": enc, "decode_chunks": dec,
               "fused_epilogue": fe}
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode == 0 and line:
            r = json.loads(line[-1])
            row.update(value=r["value"], step_ms=r["detail"]["step_ms"],
                       compile_s=r["detail"]["compile_s"])
            print(f"    {r['value']} f/s  ({r['detail']['step_ms']} ms)",
                  flush=True)
        else:
            tail = (p.stdout + p.stderr)[-600:]
            row.update(error="RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED"
                       in p.stdout + p.stderr else f"rc={p.returncode}",
                       tail=tail)
            print(f"    FAILED: {row['error']}", flush=True)
        rows.append(row)
        with open(OUT, "w") as f:
            json.dump({"rows": rows}, f, indent=2)
    best = max((r for r in rows if "value" in r), key=lambda r: r["value"])
    print(f"BEST: {best}")


if __name__ == "__main__":
    main()
