from .ch_compat import (  # noqa: F401
    JAKARTA_TZ,
    day_of_week_mon1,
    iso_week,
    json_array_string,
    json_has,
    json_string,
    parse_ts_best_effort,
    surrogate_key,
    time_key,
    to_start_of_five_minute,
    to_yyyymmdd,
)
