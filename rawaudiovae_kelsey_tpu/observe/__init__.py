from rawaudiovae_kelsey_tpu.observe.tb import EventWriter  # noqa: F401
from rawaudiovae_kelsey_tpu.observe.logging import Tee, tee_stdout  # noqa: F401
from rawaudiovae_kelsey_tpu.observe.timing import StepTimer, trace_capture  # noqa: F401
