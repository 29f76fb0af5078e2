from .asof import asof_join  # noqa: F401
from .dedupe import exact_dedupe, replacing_dedupe  # noqa: F401
from .scd import scd1_upsert, scd2_apply, scd2_from_history  # noqa: F401
