from mysteryann_tpu.utils.params import BuildConfig, SearchConfig, Parameters  # noqa: F401
from mysteryann_tpu.utils.timers import TimeMetric, Timer  # noqa: F401
