from brdf_tpu.solver.lm import (  # noqa: F401
    LMOptions,
    LMResult,
    StopReason,
    fd_jacobian,
    check_jacobian,
    chkjac,
    levmar,
    levmar_bc,
    levmar_lec,
)
from brdf_tpu.solver.constrained import (  # noqa: F401
    levmar_blec,
    levmar_bleic,
    levmar_blic,
    levmar_leic,
    levmar_lic,
)
from brdf_tpu.solver.stats import (  # noqa: F401
    corcoef,
    covariance,
    fit_statistics,
    r_squared,
    stddev,
)
