"""Reporting layer: matplotlib plot suite, HTML report, LaTeX export,
reaction diagrams."""

from phoskintime_tpu.report.diagram import illustrate  # noqa: F401
from phoskintime_tpu.report.html import create_report  # noqa: F401
from phoskintime_tpu.report.apps import (  # noqa: F401
    render_kinopt_app,
    render_tfopt_app,
)
from phoskintime_tpu.report.live import LiveMonitor  # noqa: F401
from phoskintime_tpu.report.latexit import (  # noqa: F401
    dataframe_to_latex,
    figure_to_latex,
    write_latex_report,
)
from phoskintime_tpu.report.plotter import (  # noqa: F401
    Plotter,
    plot_convergence,
    plot_parallel_coords_pareto,
    plot_pareto_3d,
)
