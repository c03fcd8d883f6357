#!/usr/bin/env python
"""Convert the reference's Physionet BSON.jl bundle to the npz layout
``regneuralde_tpu.data.load_physionet`` consumes.

The reference ships ``data/physionet.bson`` and reads it with
``BSON.load(path)[:data]`` (reference: src/dataset.jl:59-92): a dict of six
tensors in Julia column-major, feature-major layout —

  observed_data / observed_mask / data_to_predict / mask_predicted_data:
      (37 feats, 49 steps, N)
  observed_tp / tp_to_predict:
      (49, N)

This tool decodes that blob without Julia (regneuralde_tpu.data.bson) and
writes a batch-major npz: data tensors (N, 49, 37), timestamps (N, 49) —
the layout every loader in this framework uses.

Usage:
    python tools/convert_physionet.py path/to/physionet.bson [out.npz]

Then point the experiment at it:
    REGNDE_DATA_DIR=$(dirname out.npz) python experiments/latent_ode.py ...
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from regneuralde_tpu.data.datasets import (  # noqa: E402
    _PHYSIONET_DATA_KEYS,
    _PHYSIONET_TP_KEYS,
    physionet_bundle_from_bson,
)


def convert(bson_path, npz_path=None) -> Path:
    bson_path = Path(bson_path)
    npz_path = Path(npz_path) if npz_path else bson_path.with_suffix(".npz")

    out = physionet_bundle_from_bson(bson_path)
    n, steps, feats = out["observed_data"].shape
    for k in _PHYSIONET_DATA_KEYS:
        if out[k].shape != (n, steps, feats):
            raise ValueError(f"{k}: inconsistent shape {out[k].shape}")
    for k in _PHYSIONET_TP_KEYS:
        if out[k].shape != (n, steps):
            raise ValueError(f"{k}: inconsistent shape {out[k].shape}")

    np.savez_compressed(npz_path, **out)
    print(
        f"wrote {npz_path}: {n} series x {steps} steps x {feats} features "
        f"({sum(v.nbytes for v in out.values()) / 1e6:.1f} MB uncompressed)"
    )
    return npz_path


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
