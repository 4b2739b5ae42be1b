from tpusdr.utils.logging import get_logger, set_log_level  # noqa: F401
from tpusdr.utils.numerics import (  # noqa: F401
    cdiv,
    lcm,
    next_pow2,
    round_up,
)
