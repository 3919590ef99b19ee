"""Standalone analyses (reference scripts/ equivalents): mechanism
comparison, global knockouts, accumulator detection, network readouts,
subnetworks, curve similarity, temporal Sobol sensitivity."""

from phoskintime_tpu.analysis.mechanisms import (  # noqa: F401
    MECHANISMS,
    compare_mechanisms,
    find_protein_accumulators,
    knockout_scan_global,
)
from phoskintime_tpu.analysis.network_tools import (  # noqa: F401
    cluster_curves,
    curve_similarity_matrix,
    export_subnetwork,
    kinopt_network_readout,
    temporal_sensitivity_heatmap,
    tfopt_network_readout,
)
