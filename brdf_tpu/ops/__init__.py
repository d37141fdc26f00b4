from brdf_tpu.ops.lm_pallas import (  # noqa: F401
    PALLAS_MODELS,
    lm_fit_pallas,
    lm_fit_pallas_chunked,
    shading_value_and_grad_pallas,
)
from brdf_tpu.ops.shading_pallas import shade_pallas, SHADING_KERNELS  # noqa: F401
