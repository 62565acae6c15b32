#!/usr/bin/env python3
"""
Merge per-seed study result files into one canonical multi-seed summary.

Used in round 3 to fold the seed-2 rerun (SNR-gated SAVi selection,
DET_SEED2_SNR.json) into the det+revive arm's 3-seed table
(DET_RESULTS.json) after the original seed-2 entry was diagnosed as a
SAVi-representation failure (docs/BEHAVIOR_STUDY.md round-3 forensics).

Usage:
  python tools/merge_study_results.py BASE.json PATCH.json [OUT.json]

Every seed entry in PATCH replaces the same-seed entry in BASE; aggregates
are recomputed; the replaced entries are preserved under
"superseded_per_seed" for the record.
"""

import json
import sys

import numpy as np


def merge(base_path, patch_path, out_path):
    with open(base_path) as f:
        base = json.load(f)
    with open(patch_path) as f:
        patch = json.load(f)

    patched_seeds = {r["seed"] for r in patch["per_seed"]}
    superseded = [r for r in base["per_seed"] if r["seed"] in patched_seeds]
    per_seed = sorted(
        [r for r in base["per_seed"] if r["seed"] not in patched_seeds]
        + patch["per_seed"], key=lambda r: r["seed"])

    def agg(key):
        vals = [r[key] for r in per_seed if r.get(key) is not None]
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
                "values": vals} if vals else None

    base["per_seed"] = per_seed
    base["superseded_per_seed"] = (
        base.get("superseded_per_seed", []) + superseded)
    base["aggregate"] = {k: agg(k) for k in (
        "savi_psnr", "savi_miou", "savi_dedicated_target", "savi_target_r2",
        "oracle_success", "policy_success_grounded",
        "policy_success_imagination")}
    base["config"]["patched_seeds"] = sorted(
        set(base["config"].get("patched_seeds", [])) | patched_seeds)
    base["config"]["patch_config"] = patch.get("config")
    with open(out_path, "w") as f:
        json.dump(base, f, indent=2)
    print(json.dumps(base["aggregate"], indent=1))


if __name__ == "__main__":
    out = sys.argv[3] if len(sys.argv) > 3 else sys.argv[1]
    merge(sys.argv[1], sys.argv[2], out)
