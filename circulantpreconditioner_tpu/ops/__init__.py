from circulantpreconditioner_tpu.ops.circulant import (  # noqa: F401
    CirculantTransportOperator,
    BlockCirculantOperator,
    transport_column,
    transport_spectrum,
    eigenvalue_diagonal,
    stencil_symbol,
)
from circulantpreconditioner_tpu.ops.csr import CSRMatrix, BSRMatrix  # noqa: F401
