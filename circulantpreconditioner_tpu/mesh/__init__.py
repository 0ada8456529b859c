from circulantpreconditioner_tpu.mesh.core import Mesh, BoundaryGroup  # noqa: F401
from circulantpreconditioner_tpu.mesh.structured import cartesian_mesh  # noqa: F401
