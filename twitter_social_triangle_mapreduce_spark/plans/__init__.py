from .parity import (  # noqa: F401
    APPROX_MAX,
    REPLICATED_MAX,
    TRIANGLE_RS_MAX,
)
