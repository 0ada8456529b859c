from circulantpreconditioner_tpu.solvers.gmres import gmres, make_gmres  # noqa: F401
from circulantpreconditioner_tpu.solvers.cg import cg, make_cg  # noqa: F401
from circulantpreconditioner_tpu.solvers.bicgstab import bicgstab, make_bicgstab  # noqa: F401
from circulantpreconditioner_tpu.solvers import preconditioners  # noqa: F401
from circulantpreconditioner_tpu.solvers.aggregation_pc import AggregationVCyclePC  # noqa: F401
