"""Experiment-CLI smoke test: the flagship script must run end-to-end.

Runs ``experiments/mnist_node.py`` as a subprocess on CPU (the real user
surface: argparse, config, data fallback, training loop, logging, results
files). One tiny epoch; asserts the results bundle lands on disk.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent


def test_mnist_node_cli_smoke(tmp_path):
    env = dict(os.environ, REGNDE_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "experiments/mnist_node.py",
         "--epochs", "1", "--limit-batches", "1", "--batch-size", "32",
         "--max-steps", "48", "--results-dir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    runs = list((tmp_path / "mnist_node").iterdir())
    assert len(runs) == 1
    results = yaml.safe_load((runs[0] / "results.yml").read_text())
    assert len(results["nfe_counts"]) == 2  # epoch 0 + epoch 1
    assert all(n > 0 for n in results["nfe_counts"])
    assert (runs[0] / "config.yml").exists()
    assert (runs[0] / "weights.npz").exists()


def test_bench_emits_json_line(tmp_path):
    # bench.py contract for the driver: ONE JSON line with the four keys.
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import bench, io, contextlib;"
        "bench.BATCH=16; bench.MAX_STEPS=32; bench.MEASURE=2; bench.WARMUP=1;"
        "buf = io.StringIO();\n"
        "with contextlib.redirect_stdout(buf): bench.main()\n"
        "print(buf.getvalue().strip().splitlines()[-1])"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    obj = json.loads(line)
    assert set(obj) == {"metric", "value", "unit", "vs_baseline"}
    assert obj["value"] > 0
