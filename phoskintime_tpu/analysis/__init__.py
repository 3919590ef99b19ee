"""Standalone analyses (reference scripts/ equivalents): mechanism
comparison, global knockouts, accumulator detection, network readouts,
subnetworks, curve similarity, temporal Sobol sensitivity,
mechanistic discovery (refractory / lag / saturation / feedback gain)."""

from phoskintime_tpu.analysis.mechanisms import (  # noqa: F401
    MECHANISMS,
    compare_mechanisms,
    find_protein_accumulators,
    knockout_scan_global,
)
from phoskintime_tpu.analysis.insights import (  # noqa: F401
    feedback_gain,
    kinetic_lag,
    refractory_period,
    run_mechanistic_discovery,
    transcriptional_saturation,
)
from phoskintime_tpu.analysis.thermal import (  # noqa: F401
    compare_thermal_standard,
    folded_fraction,
    thermalize,
)
from phoskintime_tpu.analysis.network_tools import (  # noqa: F401
    cluster_curves,
    curve_similarity_matrix,
    export_subnetwork,
    kinopt_network_readout,
    plot_breadth_vs_load,
    plot_identity_band,
    plot_network_dag,
    temporal_sensitivity_heatmap,
    tfopt_network_readout,
)
