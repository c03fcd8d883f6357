"""Dataset loaders (reference: src/dataset.jl).

Every loader returns ``(train_loader, test_loader)`` of `DataLoader`s over
numpy arrays, batch-major. Real dataset files are used when present
(searched in ``data_dir``, ``$REGNDE_DATA_DIR``, then ``./data``); when a
file-backed dataset (MNIST / Physionet / MiniBooNE) is missing, a
deterministic synthetic surrogate with identical shapes and dtypes is
generated so every experiment runs end-to-end in a sealed environment —
the loader reports which source it used via ``loader.source``.

File formats accepted:
  * MNIST: ``mnist.npz`` with ``x_train,y_train,x_test,y_test``
    (the standard keras layout) or IDX files
    (``train-images-idx3-ubyte`` etc.).
  * Physionet: ``physionet.npz`` with the six tensors the reference's BSON
    bundle carries (src/dataset.jl:59-92), or the raw ``physionet.bson``
    itself (decoded by the pure-Python BSON.jl codec,
    ``regneuralde_tpu.data.bson``; converter: tools/convert_physionet.py).
  * MiniBooNE: ``miniboone.npy`` (feature-major or sample-major; detected).
  * Toy SDE: ``sde_demo.bson`` (the reference's actual ground-truth blob).
"""

from regneuralde_tpu.data.loader import DataLoader
from regneuralde_tpu.data.bson import dump_bson, load_bson
from regneuralde_tpu.data.datasets import (
    load_gaussian_mixture,
    load_miniboone,
    load_mnist,
    load_physionet,
    load_spiral2d,
    make_sde_demo,
    physionet_bundle_from_bson,
)

__all__ = [
    "DataLoader",
    "load_bson",
    "dump_bson",
    "load_mnist",
    "load_physionet",
    "physionet_bundle_from_bson",
    "load_miniboone",
    "load_spiral2d",
    "load_gaussian_mixture",
    "make_sde_demo",
]
