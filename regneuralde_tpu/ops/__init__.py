"""Solver cores: adaptive ODE/SDE integration as XLA programs."""

from regneuralde_tpu.ops.controller import PIController, initial_step_size
from regneuralde_tpu.ops.norms import hairer_norm, norm_batched
from regneuralde_tpu.ops.ode import ODESolution, ODEStats, StepTelemetry, odeint
from regneuralde_tpu.ops.per_sample import odeint_per_sample, sdeint_per_sample
from regneuralde_tpu.ops.rosenbrock import ROSENBROCK23, make_rosenbrock23_sweep
from regneuralde_tpu.ops.tableaus import BOSH3, TSIT5, get_tableau

__all__ = [
    "ROSENBROCK23",
    "make_rosenbrock23_sweep",
    "odeint",
    "odeint_per_sample",
    "sdeint_per_sample",
    "ODESolution",
    "ODEStats",
    "StepTelemetry",
    "PIController",
    "initial_step_size",
    "hairer_norm",
    "norm_batched",
    "TSIT5",
    "BOSH3",
    "get_tableau",
]

# SDE core is appended to the public surface once imported; keep the import
# last so ODE-only consumers don't pay for it failing in stripped builds.
from regneuralde_tpu.ops.sde import SDESolution, SDEStats, sdeint  # noqa: E402

__all__ += ["sdeint", "SDESolution", "SDEStats"]
