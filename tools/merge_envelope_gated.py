#!/usr/bin/env python3
"""
Assemble experiments/GridShapesStudy/ENVELOPE_RESULTS_5SEED_GATED.json
(VERDICT r4 item 3): the reference-exact recipe envelope, 5 seeds, under
the shipped recipe's gate protocol.

Gate semantics (tools/envelope_study_tpu.py):
  * SAVi gate — the committed per-seed SAVi checkpoints ARE the gated
    selections; every one passes the 0.005 slot-difference SNR bar
    (re-probed by tools/backfill_5seed_probe.py, recorded in
    PROD_RESULTS_5SEED_GATED.json).
  * predictor gate — best-of-k attempts on the latent-channel probe
    (r2_mean_to_action >= 0.5, the behavior_study_tpu.py bar), early-stop
    on first pass.

Seeds 0-2 reuse the committed round-4 envelope runs (ENVELOPE_RESULTS.json
seed 0, ENVELOPE_SEEDS12.json seeds 1-2): those runs used training seed
seed*100 — exactly the gated protocol's attempt 0 — and their final channel
probes (r2_mean 0.788 / 0.909 / 0.915) all clear the bar, so under the gate
attempt 0 is selected and the results are bit-identical by determinism; no
retraining is owed. This tool annotates them with their gate records.
Seeds 3-4 come from the live gated run (ENVELOPE_SEEDS34_GATED.json).
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(_REPO, "experiments", "GridShapesStudy")

SAVI_SNR_BAR = 0.005
CHANNEL_BAR = 0.5


def _load(name):
    with open(os.path.join(ROOT, name)) as f:
        return json.load(f)


def _final_probe(curve):
    pts = [p for p in curve if "r2_mean_to_action" in p]
    return pts[-1] if pts else {}


def main():
    snr = {r["seed"]: r.get("savi_channel_snr")
           for r in _load("PROD_RESULTS_5SEED_GATED.json")["per_seed"]}

    legacy = _load("ENVELOPE_RESULTS.json")["per_seed"] \
        + _load("ENVELOPE_SEEDS12.json")["per_seed"]
    gated34 = _load("ENVELOPE_SEEDS34_GATED.json")

    per_seed = []
    for row in legacy:
        seed = row["seed"]
        fp = _final_probe(row["curve"])
        r2 = fp.get("r2_mean_to_action")
        assert r2 is not None and r2 >= CHANNEL_BAR, \
            f"seed {seed} legacy run fails the channel bar ({r2}) — " \
            f"reuse invalid, rerun it through the gated tool"
        row = dict(row)
        row["savi_gate"] = {
            "savi_channel_snr": snr[seed], "bar": SAVI_SNR_BAR,
            "passes": snr[seed] >= SAVI_SNR_BAR,
            "source": "PROD_RESULTS_5SEED_GATED.json (backfilled probe of "
                      "the same committed checkpoint)"}
        row["pred_gate"] = {
            "channel_r2_bar": CHANNEL_BAR, "attempts_run": 1,
            "selected_attempt": 0, "selected_r2_mean": r2,
            "note": "committed round-4 run == gated attempt 0 (training "
                    "seed seed*100); passes the bar, so the gate selects "
                    "it unchanged"}
        per_seed.append(row)
    per_seed += gated34["per_seed"]
    per_seed.sort(key=lambda r: r["seed"])

    imag = [r["policy_success_imagination"] for r in per_seed]
    grnd = [r["policy_success_grounded"] for r in per_seed]
    import numpy as np
    out = {
        "config": {**gated34["config"],
                   "seeds": [r["seed"] for r in per_seed],
                   "reused_seeds": [r["seed"] for r in legacy]},
        "aggregate": {
            "policy_success_imagination": {
                "mean": float(np.mean(imag)), "std": float(np.std(imag)),
                "values": imag},
            "policy_success_grounded": {
                "mean": float(np.mean(grnd)), "std": float(np.std(grnd)),
                "values": grnd},
        },
        "per_seed": per_seed,
    }
    path = os.path.join(ROOT, "ENVELOPE_RESULTS_5SEED_GATED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps(out["aggregate"], indent=2)[:400])


if __name__ == "__main__":
    sys.exit(main())
