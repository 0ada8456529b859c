from circulantpreconditioner_tpu.parallel.mesh_utils import device_mesh  # noqa: F401
from circulantpreconditioner_tpu.parallel.fft_dist import SlabCirculantSolver  # noqa: F401
from circulantpreconditioner_tpu.parallel.spmv_dist import (  # noqa: F401
    HaloELLMatrix,
    ShardedELLMatrix,
)
