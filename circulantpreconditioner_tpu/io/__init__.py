from circulantpreconditioner_tpu.io.vtk import write_vtk  # noqa: F401
from circulantpreconditioner_tpu.io.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
