from circulantpreconditioner_tpu.io.vtk import write_vtk  # noqa: F401
from circulantpreconditioner_tpu.io.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from circulantpreconditioner_tpu.io.med_io import (  # noqa: F401
    med_cell_order,
    read_med_field,
    write_med,
)
