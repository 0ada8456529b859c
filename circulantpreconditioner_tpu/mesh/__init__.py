from circulantpreconditioner_tpu.mesh.core import Mesh, BoundaryGroup  # noqa: F401
from circulantpreconditioner_tpu.mesh.structured import cartesian_mesh  # noqa: F401
from circulantpreconditioner_tpu.mesh.med import read_med, read_mesh  # noqa: F401
from circulantpreconditioner_tpu.mesh.typ3 import read_typ3  # noqa: F401
from circulantpreconditioner_tpu.mesh.unstructured import (  # noqa: F401
    build_mesh_from_cells,
    hex_mesh,
    kershaw_mesh,
    kershaw_tet_mesh,
    read_gmsh,
    tet_mesh,
)
