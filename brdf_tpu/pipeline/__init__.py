from brdf_tpu.pipeline.scene import Scene, load_reference_scene  # noqa: F401
from brdf_tpu.pipeline.fit import (  # noqa: F401
    FitReport,
    build_face_problem,
    build_pixel_problem,
    fit_joint_normalmap,
    fit_per_texel,
    fit_single_material,
)
from brdf_tpu.pipeline.render import render_image, render_pixels, relight  # noqa: F401
from brdf_tpu.pipeline.envlight import (  # noqa: F401
    env_to_lights,
    relight_env,
    sh9_irradiance,
    sh9_project,
    shade_env_samples,
)
