from circulantpreconditioner_tpu.models.transport import TransportEquation  # noqa: F401
from circulantpreconditioner_tpu.models.wave import WaveSystem  # noqa: F401
from circulantpreconditioner_tpu.models.runner import run_time_loop, TimeLoopResult  # noqa: F401
from circulantpreconditioner_tpu.models.diffusion import DiffusionEquation  # noqa: F401
from circulantpreconditioner_tpu.models.runner import scan_steps  # noqa: F401
