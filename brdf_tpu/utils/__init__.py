from brdf_tpu.utils.checkpoint import FitCheckpointer, load_fit_state, save_fit_state  # noqa: F401
from brdf_tpu.utils.logging import EventLog, log_event  # noqa: F401
from brdf_tpu.utils.profiling import Timer, rays_per_sec  # noqa: F401
