"""tfopt: TF -> mRNA weight optimization (local + evolutionary)."""

from phoskintime_tpu.tfopt.model import (  # noqa: F401
    TfoptProblem,
    predict,
    tfopt_loss,
    violation_sq,
)
from phoskintime_tpu.tfopt.optimize import (  # noqa: F401
    TfoptResult,
    run_evolutionary,
    run_local,
)
