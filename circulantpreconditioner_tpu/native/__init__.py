from circulantpreconditioner_tpu.native.loader import (  # noqa: F401
    native_available,
    extract_faces,
    ilu0_factor,
    level_schedule,
)
