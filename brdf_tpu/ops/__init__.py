from brdf_tpu.ops.lm_pallas import lm_fit_pallas, PALLAS_MODELS  # noqa: F401
from brdf_tpu.ops.shading_pallas import shade_pallas, SHADING_KERNELS  # noqa: F401
