from gasr_tpu.runtime.memory import MemoryMonitor  # noqa: F401
from gasr_tpu.runtime.timer import CycleTimer, Timer  # noqa: F401
