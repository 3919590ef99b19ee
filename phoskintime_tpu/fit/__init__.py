"""Per-gene estimation stack: batched LM multistart fitting, composite
scoring, Wald confidence intervals, Morris sensitivity, knockout scans."""

from phoskintime_tpu.fit.ci import confidence_intervals  # noqa: F401
from phoskintime_tpu.fit.normest import NormestResult, build_bounds, normest  # noqa: F401
from phoskintime_tpu.fit.score import score_fit  # noqa: F401
