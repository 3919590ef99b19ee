"""Host-side IO: data loading/scaling, preprocessing, result export."""

from phoskintime_tpu.io.export import (  # noqa: F401
    TableWriter,
    export_gene_results,
    export_global_params,
    export_kinase_activities,
    export_kinopt_results,
    export_pareto,
    export_param_distributions,
    export_residuals,
    export_tfopt_results,
    export_trajectories,
)
from phoskintime_tpu.io.load import (  # noqa: F401
    explode_kinase_sets,
    load_data,
    process_and_scale_raw_data,
    read_table,
)
from phoskintime_tpu.io.preprocess import (  # noqa: F401
    format_site,
    process_collecttri,
    process_msgauss,
    process_msgauss_std,
    run_cleanup,
)
