#!/usr/bin/env python
"""Fetch and preprocess PhysioNet Challenge 2012 into the latent-ODE bundle.

The reference consumes ``data/physionet.bson`` — a preprocessed bundle of
six tensors (reference: src/dataset.jl:59-92) derived from the PhysioNet
Computing in Cardiology Challenge 2012 ICU time-series (the same dataset
as Rubanova et al.'s latent-ODE work, whose 37-attribute feature list the
bundle uses). This script reproduces that preprocessing from the public
raw records and writes ``physionet.npz`` in the batch-major layout
``regneuralde_tpu.data.load_physionet`` consumes directly (or see
tools/convert_physionet.py if you already have the BSON bundle).

Pipeline (documented assumptions where the reference's exact recipe is
not recoverable from its repo):
  1. download set-a / set-b record archives from physionet.org,
  2. parse each record's ``Time,Parameter,Value`` rows (48h window),
  3. bin observations onto 49 uniform stamps (= hourly bins incl. t=0,
     matching the bundle's 49 steps; multiple observations in a bin are
     averaged),
  4. min-max normalize each feature over the observed values,
  5. mask = 1 where a bin has at least one observation,
  6. timestamps normalized to [0, 1]; observed == predicted tensors (the
     interpolation task trains and evaluates on the same grid, reference:
     experiments/latent_ode.jl).

Usage (network required):
    python tools/fetch_physionet.py --out data/physionet.npz
    python tools/fetch_physionet.py --raw-dir /path/set-a --out data/physionet.npz

This sandbox has no egress; the download step will fail here, but the
parsing/binning/normalization functions are pure and unit-tested
(tests/test_bson.py drives the npz schema; tests/test_fetch_physionet.py
drives record parsing on synthetic records).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Rubanova et al.'s 37 PhysioNet 2012 attributes — the feature order the
# latent-ODE bundles use.
PARAMS: List[str] = [
    "Weight", "ALP", "ALT", "AST", "Albumin", "BUN", "Bilirubin",
    "Cholesterol", "Creatinine", "DiasABP", "FiO2", "GCS", "Glucose",
    "HCO3", "HCT", "HR", "K", "Lactate", "MAP", "MechVent", "Mg",
    "NIDiasABP", "NIMAP", "NISysABP", "Na", "PaCO2", "PaO2", "Platelets",
    "RespRate", "SaO2", "SysABP", "Temp", "TroponinI", "TroponinT",
    "Urine", "WBC", "pH",
]
PARAM_INDEX = {p: i for i, p in enumerate(PARAMS)}

N_STEPS = 49  # hourly bins over 48h, incl. t=0 (the bundle's grid)
WINDOW_HOURS = 48.0

URLS = [
    "https://physionet.org/files/challenge-2012/1.0.0/set-a.tar.gz",
    "https://physionet.org/files/challenge-2012/1.0.0/set-b.tar.gz",
]


def parse_record(text: str) -> List[Tuple[float, int, float]]:
    """Parse one record file ('Time,Parameter,Value' CSV with a header;
    Time is 'HH:MM') into (hours, feature_index, value) triples.
    Unknown parameters and general descriptors are skipped."""
    out = []
    for line in text.strip().splitlines()[1:]:
        parts = line.strip().split(",")
        if len(parts) != 3:
            continue
        tstr, param, vstr = parts
        if param not in PARAM_INDEX:
            continue
        try:
            hh, mm = tstr.split(":")
            hours = int(hh) + int(mm) / 60.0
            val = float(vstr)
        except ValueError:
            continue
        if val == -1.0:  # the challenge's missing-value marker
            continue
        out.append((hours, PARAM_INDEX[param], val))
    return out


def bin_record(triples: Iterable[Tuple[float, int, float]],
               n_steps: int = N_STEPS,
               window_hours: float = WINDOW_HOURS):
    """Average observations onto ``n_steps`` uniform stamps over the
    window, assigning each observation to its NEAREST stamp (bin
    boundaries sit halfway between stamps, i.e. offset half a bin from a
    floor-style hourly binning — an observation at hour 0.6 lands on
    stamp 1). Returns (data (n_steps, F), mask (n_steps, F))."""
    data = np.zeros((n_steps, len(PARAMS)), np.float64)
    count = np.zeros((n_steps, len(PARAMS)), np.int64)
    scale = (n_steps - 1) / window_hours
    for hours, fi, val in triples:
        if not (0.0 <= hours <= window_hours):
            continue
        b = int(round(hours * scale))
        b = min(max(b, 0), n_steps - 1)
        data[b, fi] += val
        count[b, fi] += 1
    mask = (count > 0).astype(np.float32)
    with np.errstate(invalid="ignore"):
        data = np.where(count > 0, data / np.maximum(count, 1), 0.0)
    return data.astype(np.float32), mask


def normalize_features(data: np.ndarray, mask: np.ndarray):
    """Min-max normalize each feature over its OBSERVED values across the
    whole dataset (masked entries stay 0). data/mask: (N, steps, F)."""
    out = data.copy()
    for f in range(data.shape[-1]):
        vals = data[..., f][mask[..., f] > 0]
        if vals.size == 0:
            continue
        lo, hi = float(vals.min()), float(vals.max())
        rng = (hi - lo) or 1.0
        out[..., f] = np.where(mask[..., f] > 0,
                               (data[..., f] - lo) / rng, 0.0)
    return out


def build_bundle(records: Iterable[str]) -> Dict[str, np.ndarray]:
    """records: iterable of record-file texts. Returns the six-tensor
    bundle in batch-major layout (N, 49, 37) / (N, 49)."""
    datas, masks = [], []
    for text in records:
        d, m = bin_record(parse_record(text))
        if m.sum() == 0:
            continue  # empty record
        datas.append(d)
        masks.append(m)
    data = np.stack(datas)  # (N, steps, F)
    mask = np.stack(masks)
    data = normalize_features(data, mask) * mask
    tp = np.tile(np.linspace(0.0, 1.0, N_STEPS, dtype=np.float32),
                 (data.shape[0], 1))
    return {
        "observed_data": data,
        "observed_mask": mask,
        "data_to_predict": data.copy(),
        "mask_predicted_data": mask.copy(),
        "observed_tp": tp,
        "tp_to_predict": tp.copy(),
    }


def _iter_raw_dir(raw_dir: Path) -> Iterable[str]:
    for p in sorted(raw_dir.glob("*.txt")):
        yield p.read_text()


def _iter_download() -> Iterable[str]:
    from urllib.request import urlopen

    for url in URLS:
        print(f"downloading {url} ...")
        blob = urlopen(url).read()
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tf:
            for member in tf.getmembers():
                if member.isfile() and member.name.endswith(".txt"):
                    yield tf.extractfile(member).read().decode("utf-8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/physionet.npz")
    ap.add_argument("--raw-dir", default=None,
                    help="directory of already-downloaded set-a/set-b "
                         "record .txt files (skips the download)")
    args = ap.parse_args()

    records = (_iter_raw_dir(Path(args.raw_dir)) if args.raw_dir
               else _iter_download())
    bundle = build_bundle(records)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **bundle)
    n, steps, feats = bundle["observed_data"].shape
    print(f"wrote {args.out}: {n} series x {steps} steps x {feats} features")


if __name__ == "__main__":
    main()
