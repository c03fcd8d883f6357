"""Dataset construction: file-backed when available, synthetic otherwise.

Parity targets (reference: src/dataset.jl):
  * load_mnist (:1-31)            -> (B,28,28,1) images + one-hot labels
  * load_miniboone (:33-56)       -> standardized 43-D tabular data
  * load_physionet (:59-92)       -> 6-tensor irregular-series bundle
  * load_spiral2d (:95-156)       -> noisy spiral windows (synthetic)
  * load_gaussian_mixture (:159-199) -> ring of Gaussians (synthetic)

Batch-major layout everywhere ((B, ...) — transposed vs the Julia
reference's trailing batch axis).
"""

from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from regneuralde_tpu.data.loader import DataLoader


def _native_enabled() -> bool:
    """The C++ data runtime is the default; REGNDE_NATIVE_LOADER=0 opts
    out (e.g. for debugging)."""
    return os.environ.get("REGNDE_NATIVE_LOADER", "1") != "0"


def _make_loader(arrays, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 source: str = "memory"):
    """Build a minibatch loader, routing through the native C++
    prefetch-ring loader (csrc/dataloader.cpp) when its shared library is
    available; the pure-Python ``DataLoader`` is the fallback. Both follow
    the same iteration protocol, so callers never care which they got
    (``loader.source`` carries a ``[native]`` tag for observability)."""
    arrays = tuple(np.asarray(a) for a in arrays)
    if _native_enabled():
        from regneuralde_tpu.data import native

        if native.is_available():
            try:
                return native.NativeDataLoader(
                    arrays, batch_size, shuffle=shuffle, drop_last=drop_last,
                    seed=seed, source=source + " [native]")
            except (RuntimeError, ValueError):
                pass
    return DataLoader(arrays, batch_size, shuffle=shuffle,
                      drop_last=drop_last, seed=seed, source=source)


def _load_npy(path: Path) -> np.ndarray:
    """NPY read through the native parser when available (the reference
    reads MiniBooNE via NPZ.jl, src/dataset.jl:40)."""
    if _native_enabled():
        from regneuralde_tpu.data import native

        arr = native.load_npy(path) if native.is_available() else None
        if arr is not None:
            return arr
    return np.load(path)


def _search_file(name_options, data_dir: Optional[str]) -> Optional[Path]:
    roots = []
    if data_dir:
        roots.append(Path(data_dir))
    if os.environ.get("REGNDE_DATA_DIR"):
        roots.append(Path(os.environ["REGNDE_DATA_DIR"]))
    roots.append(Path("data"))
    # The mounted read-only reference checkout ships real data files
    # (data/sde_demo.bson, data/physionet.bson when present) — use them
    # by default so recorded runs exercise real ground truth.
    roots.append(Path("/root/reference/data"))
    for root in roots:
        for name in name_options:
            p = root / name
            if p.exists():
                return p
    return None


def _one_hot(labels: np.ndarray, num: int) -> np.ndarray:
    out = np.zeros((labels.shape[0], num), np.float32)
    out[np.arange(labels.shape[0]), labels] = 1.0
    return out


def _read_idx(path: Path) -> np.ndarray:
    if path.suffix != ".gz" and _native_enabled():
        from regneuralde_tpu.data import native

        arr = native.load_idx(path) if native.is_available() else None
        if arr is not None:
            return arr
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        zero, dtype, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _synthetic_mnist(n_train=4096, n_test=1024, seed=0):
    """Deterministic procedural stand-in with MNIST's shapes: each class is
    a distinct low-frequency 28x28 pattern plus pixel noise. Linearly
    separable enough that accuracy curves are meaningful, clearly labeled
    as synthetic via loader.source."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32) / 27.0
    protos = []
    for c in range(10):
        a, b = (c % 5) + 1, (c // 5) + 1
        protos.append(
            0.5 + 0.5 * np.sin(a * np.pi * xx + c) * np.cos(b * np.pi * yy - c)
        )
    protos = np.stack(protos)  # (10, 28, 28)

    def make(n, seed_off):
        r = np.random.default_rng(seed + seed_off)
        labels = r.integers(0, 10, size=n)
        imgs = protos[labels] + 0.25 * r.standard_normal((n, 28, 28)).astype(np.float32)
        return np.clip(imgs, 0, 1).astype(np.float32)[..., None], labels

    xtr, ytr = make(n_train, 1)
    xte, yte = make(n_test, 2)
    return xtr, ytr, xte, yte


def load_mnist(
    batch_size: int,
    data_dir: Optional[str] = None,
    flatten: bool = False,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader]:
    """Reference: src/dataset.jl:1-31. Images in [0,1], one-hot labels."""
    source = "synthetic"
    npz = _search_file(["mnist.npz"], data_dir)
    if npz is not None:
        with np.load(npz) as d:
            xtr, ytr = d["x_train"], d["y_train"]
            xte, yte = d["x_test"], d["y_test"]
        xtr = (xtr.astype(np.float32) / 255.0)[..., None]
        xte = (xte.astype(np.float32) / 255.0)[..., None]
        source = str(npz)
    else:
        idx = _search_file(
            ["train-images-idx3-ubyte", "train-images-idx3-ubyte.gz"], data_dir
        )
        if idx is not None:
            root = idx.parent
            sfx = ".gz" if idx.suffix == ".gz" else ""

            def rd(name):
                return _read_idx(root / (name + sfx))

            xtr = (rd("train-images-idx3-ubyte").astype(np.float32) / 255.0)[..., None]
            ytr = rd("train-labels-idx1-ubyte")
            xte = (rd("t10k-images-idx3-ubyte").astype(np.float32) / 255.0)[..., None]
            yte = rd("t10k-labels-idx1-ubyte")
            source = str(root)
        else:
            xtr, ytr, xte, yte = _synthetic_mnist(seed=seed)

    if flatten:
        xtr = xtr.reshape(xtr.shape[0], -1)
        xte = xte.reshape(xte.shape[0], -1)
    train = _make_loader(
        (xtr, _one_hot(np.asarray(ytr), 10)), batch_size, shuffle=True,
        seed=seed, source=source,
    )
    test = _make_loader(
        (xte, _one_hot(np.asarray(yte), 10)), batch_size, shuffle=False,
        source=source,
    )
    return train, test


def _synthetic_physionet(n=4096, feats=37, steps=49, seed=0):
    """Irregular multivariate series with observation masks, matching the
    physionet bundle's schema (reference: src/dataset.jl:70-77).

    ``REGNDE_SURROGATE_FREQ="lo,hi"`` overrides the latent oscillator
    frequency band (default 1..6). Clinical vitals vary over hours — far
    smoother relative to the 48h window than the default band — so
    conditioning-matched experiments use a lower band (e.g. "0.5,2").
    """
    rng = np.random.default_rng(seed)
    freq = os.environ.get("REGNDE_SURROGATE_FREQ", "1.0,6.0").split(",")
    f_lo, f_hi = float(freq[0]), float(freq[1])
    # One shared (irregularly spaced) timestamp grid across samples — the
    # physionet bundle is preprocessed onto 49 common stamps and the
    # reference uses one sample's grid as the global saveat
    # (experiments/latent_ode.jl:137).
    grid = np.sort(rng.uniform(0, 1, size=(steps,)).astype(np.float32))
    grid[0] = 0.0
    tp = np.tile(grid, (n, 1))
    # latent low-dim oscillators lifted to `feats` channels
    z = rng.standard_normal((n, 4)).astype(np.float32)
    w = rng.uniform(f_lo, f_hi, size=(4,)).astype(np.float32)
    lift = rng.standard_normal((4, feats)).astype(np.float32) * 0.7
    phase = tp[..., None] * w  # (n, steps, 4)
    latent = np.sin(2 * np.pi * phase + z[:, None, :])
    data = np.tanh(latent @ lift).astype(np.float32)  # (n, steps, feats)
    mask = (rng.uniform(size=data.shape) < 0.35).astype(np.float32)
    data = data * mask
    return {
        "observed_data": data,
        "observed_mask": mask,
        "data_to_predict": data.copy(),
        "mask_predicted_data": mask.copy(),
        "observed_tp": tp,
        "tp_to_predict": tp.copy(),
    }


_PHYSIONET_DATA_KEYS = (
    "observed_data",
    "observed_mask",
    "data_to_predict",
    "mask_predicted_data",
)
_PHYSIONET_TP_KEYS = ("observed_tp", "tp_to_predict")


def physionet_bundle_from_bson(path) -> dict:
    """Decode the reference's ``physionet.bson`` (BSON.jl blob holding a
    ``data`` dict of six Julia column-major tensors — reference:
    src/dataset.jl:65-77) into this framework's batch-major layout:
    data tensors (N, steps, feats), timestamps (N, steps)."""
    from regneuralde_tpu.data.bson import load_bson

    blob = load_bson(path)
    raw = blob.get("data", blob)
    missing = [k for k in _PHYSIONET_DATA_KEYS + _PHYSIONET_TP_KEYS if k not in raw]
    if missing:
        raise KeyError(f"physionet bundle missing keys {missing}")
    out = {}
    for k in _PHYSIONET_DATA_KEYS:
        arr = np.asarray(raw[k], np.float32)
        if arr.ndim != 3:
            raise ValueError(f"{k}: expected (feats, steps, N), got {arr.shape}")
        out[k] = np.ascontiguousarray(arr.transpose(2, 1, 0))
    for k in _PHYSIONET_TP_KEYS:
        arr = np.asarray(raw[k], np.float32)
        if arr.ndim != 2:
            raise ValueError(f"{k}: expected (steps, N), got {arr.shape}")
        out[k] = np.ascontiguousarray(arr.T)
    return out


def load_physionet(
    batch_size: int,
    path: Optional[str] = None,
    train_split: float = 0.8,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader]:
    """Reference: src/dataset.jl:59-92. Yields 6 tensors per batch:
    (observed_data, observed_mask, data_to_predict, mask_predicted_data,
    observed_tp, tp_to_predict), batch-major: data (B, 49, 37), tp (B, 49).
    Both loaders shuffle and drop partial batches, as the reference does
    (partial=false, shuffle=true for both).

    Accepts either the converted npz (tools/convert_physionet.py) or the
    reference's raw physionet.bson directly."""
    found = _search_file(
        [path] if path else ["physionet.npz", "physionet.bson"],
        None if path else None,
    )
    if path and Path(path).exists():
        found = Path(path)
    if found is not None:
        if found.suffix == ".bson":
            bundle = physionet_bundle_from_bson(found)
        else:
            with np.load(found) as d:
                bundle = {k: d[k] for k in d.files}
        source = str(found)
    else:
        bundle = _synthetic_physionet(seed=seed)
        source = "synthetic"

    n = bundle["observed_data"].shape[0]
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_train = int(n * train_split)
    keys = [
        "observed_data",
        "observed_mask",
        "data_to_predict",
        "mask_predicted_data",
        "observed_tp",
        "tp_to_predict",
    ]
    train_arrays = [bundle[k][idx[:n_train]] for k in keys]
    test_arrays = [bundle[k][idx[n_train:]] for k in keys]
    train = _make_loader(train_arrays, batch_size, shuffle=True,
                         drop_last=True, seed=seed, source=source)
    test = _make_loader(test_arrays, batch_size, shuffle=True, drop_last=True,
                        seed=seed + 1, source=source)
    return train, test


def load_miniboone(
    batch_size: int,
    path: Optional[str] = None,
    train_split: float = 0.8,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader]:
    """Reference: src/dataset.jl:33-56. Standardized per-feature; 43-D."""
    found = Path(path) if path and Path(path).exists() else _search_file(
        ["miniboone.npy"], None
    )
    if found is not None:
        data = _load_npy(found).astype(np.float32)
        if data.shape[0] == 43 and data.shape[1] != 43:
            data = data.T  # feature-major file -> sample-major
        source = str(found)
    else:
        rng = np.random.default_rng(seed)
        n = 8192
        centers = rng.standard_normal((4, 43)).astype(np.float32) * 2.0
        assign = rng.integers(0, 4, size=n)
        data = centers[assign] + rng.standard_normal((n, 43)).astype(np.float32)
        source = "synthetic"

    data = (data - data.mean(0, keepdims=True)) / (data.std(0, keepdims=True) + 1e-8)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(data.shape[0])
    n_train = int(data.shape[0] * train_split)
    train = _make_loader((data[idx[:n_train]],), batch_size, shuffle=True,
                         seed=seed, source=source)
    test = _make_loader((data[idx[n_train:]],), batch_size, shuffle=False,
                        source=source)
    return train, test


def load_spiral2d(
    batch_size: int,
    nspiral: int = 1000,
    ntotal: int = 500,
    nsample: int = 100,
    start: float = 0.0,
    stop: float = 1.0,
    noise_std: float = 0.1,
    a: float = 0.0,
    b: float = 1.0,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader]:
    """Reference: src/dataset.jl:95-156. Clockwise/counter-clockwise 2-D
    spirals (r = a + b*theta); train loader yields noisy sampled windows
    (B, nsample, 2) with their timestamps, test loader the full clean
    trajectories."""
    rng = np.random.default_rng(seed)
    orig_ts = np.linspace(start, stop, ntotal).astype(np.float32)
    samp_ts = orig_ts[:nsample]

    zs_cw = stop + 1.0 - orig_ts
    rs_cw = a + b * 50.0 / zs_cw
    traj_cw = np.stack([rs_cw * np.cos(zs_cw) - 5.0, rs_cw * np.sin(zs_cw)], -1)

    zs_cc = orig_ts
    rs_cc = a + b * zs_cc
    traj_cc = np.stack([rs_cc * np.cos(zs_cc) + 5.0, rs_cc * np.sin(zs_cc)], -1)

    samples, originals = [], []
    for _ in range(nspiral):
        t0 = rng.integers(0, ntotal - 2 * nsample) + nsample - 1
        orig = traj_cc if rng.uniform() > 0.5 else traj_cw
        originals.append(orig)
        win = orig[t0 : t0 + nsample].copy()
        win += rng.standard_normal(win.shape).astype(np.float32) * noise_std
        samples.append(win)

    sampled = np.stack(samples).astype(np.float32)  # (n, nsample, 2)
    original = np.stack(originals).astype(np.float32)  # (n, ntotal, 2)
    samp_tp = np.tile(samp_ts, (nspiral, 1))
    orig_tp = np.tile(orig_ts, (nspiral, 1))

    train = _make_loader((sampled, samp_tp), batch_size, shuffle=True,
                         seed=seed, source="synthetic")
    test = _make_loader((original, orig_tp), batch_size, shuffle=True,
                        seed=seed + 1, source="synthetic")
    return train, test


def load_gaussian_mixture(
    batch_size: int,
    train_split: float = 0.75,
    nsamples: int = 1000,
    ngaussians: int = 6,
    radius: float = 5.0,
    sigma: float = 0.1,
    noise: float = 0.3,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader]:
    """Reference: src/dataset.jl:159-199. Ring of Gaussians in 2-D."""
    rng = np.random.default_rng(seed)
    per = nsamples // ngaussians
    xs = []
    for i in range(1, ngaussians + 1):
        theta = 2 * np.pi * i / ngaussians
        mu = np.array([np.cos(theta), np.sin(theta)], np.float32) * radius
        pts = mu + rng.standard_normal((per, 2)).astype(np.float32) * sigma
        pts += rng.standard_normal((per, 2)).astype(np.float32) * noise
        xs.append(pts)
    X = np.concatenate(xs).astype(np.float32)
    idx = rng.permutation(X.shape[0])
    n_train = int(X.shape[0] * train_split)
    train = _make_loader((X[idx[:n_train]],), batch_size, shuffle=True,
                         seed=seed, source="synthetic")
    test = _make_loader((X[idx[n_train:]],), batch_size, shuffle=False,
                        source="synthetic")
    return train, test


def make_sde_demo(seed: int = 0, datasize: int = 30):
    """Ground-truth data for the toy SDE experiment (per-timestep means,
    variances, timestamps, source — reference:
    experiments/sde_toy_problem.jl:8-15).

    If the reference's actual blob ``sde_demo.bson`` is findable (data/,
    REGNDE_DATA_DIR, or the mounted reference checkout), its real ground
    truth is decoded with the BSON.jl codec and returned — exact data
    parity; the ``seed`` argument is then unused. Otherwise the truth is
    regenerated synthetically: du = f(u) dt + g(u) dW for a damped cubic
    drift over many trajectories. The returned ``source`` string states
    which path was taken (and the file used), so runs record their data
    provenance instead of silently depending on file presence."""
    found = _search_file(["sde_demo.bson"], None)
    if found is not None and datasize == 30:
        from regneuralde_tpu.data.bson import load_bson

        blob = load_bson(found)
        if "sde_data" in blob and "sde_data_vars" in blob:
            means = np.asarray(blob["sde_data"], np.float32).T  # (30, 2)
            vars_ = np.asarray(blob["sde_data_vars"], np.float32).T
            tsteps = np.linspace(0.0, 1.0, means.shape[0]).astype(np.float32)
            return means, vars_, tsteps, f"bson:{found}"
    rng = np.random.default_rng(seed)
    tsteps = np.linspace(0.0, 1.0, datasize).astype(np.float32)
    ntraj = 512
    u = np.tile(np.array([[2.0, 0.0]], np.float32), (ntraj, 1))
    true_A = np.array([[-0.1, 2.0], [-2.0, -0.1]], np.float32)
    dt = 1.0 / 300.0
    out_means, out_vars = [], []
    t = 0.0
    ti = 0
    for step in range(301):
        while ti < datasize and tsteps[ti] <= t + 1e-9:
            out_means.append(u.mean(0))
            out_vars.append(u.var(0))
            ti += 1
        drift = (u**3) @ true_A.T
        diff_ = 0.2 * u
        u = u + dt * drift + np.sqrt(dt) * diff_ * rng.standard_normal(u.shape).astype(np.float32)
        t += dt
    while ti < datasize:
        out_means.append(u.mean(0)); out_vars.append(u.var(0)); ti += 1
    return (
        np.stack(out_means).astype(np.float32),  # (datasize, 2)
        np.stack(out_vars).astype(np.float32),
        tsteps,
        "synthetic",
    )
