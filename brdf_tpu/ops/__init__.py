from brdf_tpu.ops.lm_pallas import lm_fit_pallas, PALLAS_MODELS  # noqa: F401
