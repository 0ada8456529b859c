from circulantpreconditioner_tpu.utils.tpu_compat import (  # noqa: F401
    tile_scalar,
    fetch_scalar,
    retry_transient,
    enable_compile_cache,
)
