from .explain import assert_no_cartesian, plan_of, pushed_filters  # noqa: F401
from .motif import find  # noqa: F401
from .parity import (  # noqa: F401
    APPROX_MAX,
    REPLICATED_MAX,
    TRIANGLE_RS_MAX,
)
