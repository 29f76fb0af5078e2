from .migrate import MigrationPlan, SchemaMigrator, is_widening  # noqa: F401
from .checks import (  # noqa: F401
    check_freshness,
    check_not_null,
    check_schema_drift,
    check_unique_key,
    check_volume,
    run_dq_rules,
)
