from .relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES  # noqa: F401
from . import relational2  # noqa: F401  (registers into the same dicts)
from . import relational3  # noqa: F401  (registers into the same dicts)
from . import relational4  # noqa: F401  (TPC-DS-shaped tranche)
from . import relational5  # noqa: F401  (Join Order Benchmark-shaped tranche)
from . import relational6  # noqa: F401  (second TPC-DS-shaped tranche)
from . import relational7  # noqa: F401  (third TPC-DS-shaped tranche)
from . import relational8  # noqa: F401  (fourth TPC-DS-shaped tranche)
from . import relational9  # noqa: F401  (fifth TPC-DS-shaped tranche)
