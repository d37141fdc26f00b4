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
from brdf_tpu.solver.axb import (  # noqa: F401
    ax_eq_b_chol,
    ax_eq_b_ldlt,
    ax_eq_b_lu,
    ax_eq_b_qr,
    ax_eq_b_qrls,
    ax_eq_b_svd,
    ldlt_bk,
)
from brdf_tpu.solver.constrained import (  # noqa: F401
    levmar_blec,
    levmar_bleic,
    levmar_blic,
    levmar_leic,
    levmar_lic,
)
from brdf_tpu.solver.varpro import (  # noqa: F401
    VarProResult,
    varpro_fit,
    varpro_fit_fresnel,
)
from brdf_tpu.solver.varpro_joint import (  # noqa: F401
    JointVarProResult,
    varpro_fit_joint,
)
from brdf_tpu.solver.stats import (  # noqa: F401
    corcoef,
    covariance,
    fit_statistics,
    r_squared,
    stddev,
)
