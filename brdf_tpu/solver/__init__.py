from brdf_tpu.solver.lm import (  # noqa: F401
    LMOptions,
    LMResult,
    StopReason,
    fd_jacobian,
    check_jacobian,
    levmar,
    levmar_bc,
    levmar_lec,
)
