from circulantpreconditioner_tpu.ops.circulant import (  # noqa: F401
    CirculantTransportOperator,
    BlockCirculantOperator,
    transport_column,
    transport_spectrum,
    eigenvalue_diagonal,
    stencil_symbol,
)
from circulantpreconditioner_tpu.ops.csr import CSRMatrix, BSRMatrix  # noqa: F401
from circulantpreconditioner_tpu.ops.window_spmv import WindowedBlockOperator  # noqa: F401
from circulantpreconditioner_tpu.ops.spectral_collapse import (  # noqa: F401
    DenseCirculantSolver,
    IdentitySolver,
    make_circulant_solver,
)
