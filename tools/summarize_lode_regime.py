"""Summarize the latent-ODE NFE-reduction demonstration runs.

Reads every run under evidence/r4_latent_regime/latent_ode/ and prints a
seed-matched vanilla-vs-ERNODE table: final NFE, min/max NFE over the
last 20 epochs (the settled band), and final test loss (masked MSE
against sigma=0.01-scaled LL — the experiment's eval metric). One JSON
line at the end for BASELINE.md.
"""
import json
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parent.parent
RUNS = ROOT / "evidence" / "r4_latent_regime" / "latent_ode"


def main():
    rows = []
    for d in sorted(RUNS.iterdir()):
        ry = d / "results.yml"
        if not ry.exists():
            continue
        r = yaml.safe_load(ry.read_text())
        # config_effective.yml records CLI overrides (incl. --seed); the
        # raw config.yml snapshot is the pre-override file.
        eff = d / "config_effective.yml"
        cfg = yaml.safe_load(eff.read_text()) if eff.exists() else {}
        prov = r.get("provenance", {})
        nfe = r["nfe_counts"]
        tl = r["test_loss"]
        tail = nfe[-20:]
        rows.append({
            "run": d.name,
            "seed": cfg.get("seed"),
            "arm": ("ERNODE" if prov.get("regularize") else "vanilla"),
            "rtol": prov.get("rtol"),
            "nfe_epoch0": nfe[0],
            "nfe_final": nfe[-1],
            "nfe_tail_min": min(tail),
            "nfe_tail_max": max(tail),
            "test_loss_final": round(float(tl[-1]), 4),
            "cap_hits": r.get("solver_cap_hits", 0),
        })
    for row in rows:
        print(row)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
