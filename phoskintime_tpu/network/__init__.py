"""Global network model: topology, system, vectorized RHS mechanisms,
simulation + measurement, loss, softplus packing, bio bounds, steady states."""

from phoskintime_tpu.network.bounds import calculate_bio_bounds  # noqa: F401
from phoskintime_tpu.network.kinase_input import build_kinase_matrix  # noqa: F401
from phoskintime_tpu.network.lossdata import LossData, prepare_loss_data  # noqa: F401
from phoskintime_tpu.network.objective import (  # noqa: F401
    evaluate_population,
    make_objective,
    modality_losses,
)
from phoskintime_tpu.network.params import init_raw_params, unpack_params  # noqa: F401
from phoskintime_tpu.network.simulate import (  # noqa: F401
    extract_observables,
    fold_changes,
    simulate,
    simulate_and_measure,
)
from phoskintime_tpu.network.steadystate import (  # noqa: F401
    build_y0_from_data,
    steady_state_combinatorial,
    steady_state_distributive,
    steady_state_sequential,
)
from phoskintime_tpu.network.system import GlobalSystem, default_params  # noqa: F401
from phoskintime_tpu.network.topology import NetworkTopology, build_topology  # noqa: F401
