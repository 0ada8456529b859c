from circulantpreconditioner_tpu.parallel.mesh_utils import device_mesh, device_mesh_2d  # noqa: F401
from circulantpreconditioner_tpu.parallel.fft_dist import (  # noqa: F401
    PencilCirculantSolver,
    SlabCirculantSolver,
)
from circulantpreconditioner_tpu.parallel.spmv_dist import (  # noqa: F401
    HaloELLMatrix,
    ShardedELLMatrix,
)
from circulantpreconditioner_tpu.parallel.multihost import (  # noqa: F401
    gather_to_host0,
    global_device_mesh,
    init_multihost,
)
from circulantpreconditioner_tpu.parallel.stencil_dist import SlabStencilOperator  # noqa: F401
from circulantpreconditioner_tpu.parallel.window_dist import HaloWindowOperator  # noqa: F401
from circulantpreconditioner_tpu.parallel.pc_dist import (  # noqa: F401
    DistributedBlockCirculantPC,
    SlabBlockCirculantSolver,
    sharded_pbjacobi,
)
