from brdf_tpu.models.brdf import (  # noqa: F401
    MODELS,
    ModelSpec,
    ShadingAngles,
    ShadingGeometry,
    brdf_eval,
    shading_angles,
    shading_geometry,
)
