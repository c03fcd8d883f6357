"""Float64 reference oracle for adaptive RK accepted-step traces.

NFE is the paper's headline metric (reference:
experiments/mnist_node.jl:244-247), so the step controller must be
calibrated: this module is a straight-line NumPy float64 implementation of
the documented OrdinaryDiffEq Tsit5 stack — Hairer scaled-RMS norm,
``atol + max(|u_prev|, |u_new|)*rtol`` error scale, PI control with
beta1=7/50, beta2=2/25, gamma=9/10, qmin=1/5, qmax=10, qoldinit=1e-4,
Hairer automatic initial dt (II.4), FSAL accounting ``nf = 2 + 6*steps`` —
fully independent of the JAX/XLA solver loop in ``ops.ode`` (no jit, no
masking, no bounded scan).

It generates ``tests/golden/tsit5_traces.json``: accepted/rejected step
counts, the accepted-dt sequence, and final states for three canonical
problems at three tolerances, in both controller modes (qsteady_max=1.0 =
OrdinaryDiffEq's Tsit5 default; 1.2 = this repo's float32 deadband). CI
(tests/test_nfe_parity.py) fails if the production solver's accepted-step
sequences drift from these traces.

Run:  python tools/golden_traces.py   (regenerates the fixture)
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from regneuralde_tpu.ops.tableaus import TSIT5  # noqa: E402

EEST_FLOOR = 1e-10
QMIN, QMAX, GAMMA, QOLDINIT = 0.2, 10.0, 0.9, 1e-4
BETA1, BETA2 = 7.0 / 50.0, 2.0 / 25.0


def _norm(x):
    x = np.asarray(x, np.float64)
    return float(np.sqrt(np.mean(x * x)))


def _initial_dt(f, t0, y0, f0, rtol, atol, t1, order):
    span = abs(t1 - t0)
    sc = atol + np.abs(y0) * rtol
    d0 = _norm(y0 / sc)
    d1 = _norm(f0 / sc)
    dt0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
    dt0 = min(dt0, span)
    y1 = y0 + dt0 * f0
    f1 = f(t0 + dt0, y1)
    d2 = _norm((f1 - f0) / sc) / dt0
    dmax = max(d1, d2)
    if dmax <= 1e-15:
        dt1 = max(1e-6, dt0 * 1e-3)
    else:
        dt1 = (0.01 / dmax) ** (1.0 / (order + 1))
    return min(100.0 * dt0, dt1, span)


def tsit5_oracle(f, y0, t0, t1, rtol, atol, qsteady_max=1.0,
                 max_steps=100000):
    """Adaptive Tsit5 in float64. Returns the full step trace."""
    tab = TSIT5
    y = np.asarray(y0, np.float64)
    t = float(t0)
    f0 = np.asarray(f(t, y), np.float64)
    dt = _initial_dt(f, t, y, f0, rtol, atol, t1, tab.order)
    nfe = 2  # f0 + the Euler probe inside the init-dt heuristic
    qold = QOLDINIT
    naccept = nreject = 0
    accepted_dts, rejected_dts = [], []
    n_stages = tab.num_stages

    for _ in range(max_steps):
        remaining = t1 - t
        is_last = dt >= remaining
        dt_eff = remaining if is_last else dt

        ks = [f0]
        for i in range(1, n_stages):
            y_stage = y + dt_eff * sum(
                a * k for a, k in zip(tab.a[i - 1], ks) if a != 0.0
            )
            ks.append(np.asarray(f(t + tab.c[i] * dt_eff, y_stage), np.float64))
        y_new = y_stage  # FSAL: b row == last a row
        nfe += n_stages - 1
        err = dt_eff * sum(
            c * (k - ks[0]) for c, k in zip(tab.btilde[1:], ks[1:])
        )
        scale = atol + np.maximum(np.abs(y), np.abs(y_new)) * rtol
        eest = _norm(err / scale)

        accept = eest <= 1.0
        eest_safe = max(eest, EEST_FLOOR)
        q11 = eest_safe ** BETA1
        q = q11 / qold ** BETA2
        if accept:
            q_acc = min(max(q / GAMMA, 1.0 / QMAX), 1.0 / QMIN)
            if qsteady_max > 1.0 and 1.0 <= q_acc <= qsteady_max:
                q_acc = 1.0
            dt_next = dt_eff / q_acc
            qold = max(eest, QOLDINIT)
            accepted_dts.append(dt_eff)
            naccept += 1
            t = t1 if is_last else t + dt_eff
            y = y_new
            f0 = ks[-1]
            if is_last:
                break
        else:
            dt_next = dt_eff / min(1.0 / QMIN, q11 / GAMMA)
            rejected_dts.append(dt_eff)
            nreject += 1
        dt = min(dt_next, t1 - t0)  # dtmax clamp: total span
    else:
        raise RuntimeError("oracle exceeded max_steps")

    return {
        "naccept": naccept,
        "nreject": nreject,
        "nfe": nfe,
        "accepted_dts": accepted_dts,
        "rejected_dts": rejected_dts,
        "final_y": y.tolist(),
        "final_t": t,
    }


# ---------------------------------------------------------------------------
# Canonical problems (the VERDICT's calibration set)
# ---------------------------------------------------------------------------

def exp_decay(t, y):
    return -1.2 * y


def oscillator(t, y):
    return np.array([y[1], -9.0 * y[0]])


def lotka_volterra(t, y):
    x, z = y
    return np.array([1.5 * x - x * z, -3.0 * z + x * z])


PROBLEMS = {
    "exp_decay": (exp_decay, [1.5], 0.0, 2.0),
    "oscillator": (oscillator, [1.0, 0.0], 0.0, 4.0),
    "lotka_volterra": (lotka_volterra, [1.0, 1.0], 0.0, 8.0),
}
TOLS = [1e-4, 1e-6, 1e-8]


def main():
    out = {}
    for pname, (f, y0, t0, t1) in PROBLEMS.items():
        for tol in TOLS:
            for mode, qs in (("exact", 1.0), ("deadband", 1.2)):
                key = f"{pname}/{tol:g}/{mode}"
                out[key] = tsit5_oracle(f, y0, t0, t1, tol, tol,
                                        qsteady_max=qs)
                r = out[key]
                print(f"{key}: naccept={r['naccept']} nreject={r['nreject']} "
                      f"nfe={r['nfe']}")
    dest = Path(__file__).resolve().parent.parent / "tests" / "golden"
    dest.mkdir(exist_ok=True)
    with open(dest / "tsit5_traces.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {dest / 'tsit5_traces.json'}")


if __name__ == "__main__":
    main()
